package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text transforms of the reference's scalar functions.
  *
  * All of these are pure Catalyst expression chains (no UDFs) so they stay
  * inside whole-stage codegen and are pushable/foldable by the optimizer.
  *
  * Reference semantics ported:
  *   - clean_text: reference `src/news_nlp/preprocessing/text_cleaning.py:25-35`
  *   - normalize_entity_text: reference `src/news_nlp/ner_extractor/tables.py:8-18`
  *   - text assembly (batch): reference `src/news_nlp/ingestion/db_io.py:86-88`
  *   - text assembly (api): reference `src/news_nlp/api/app.py:67,89,111`
  */
object Text {

  /** Python `re` `\s` is Unicode-aware AND additionally matches the ASCII
    * separator controls 0x1C..0x1F (which the Unicode White_Space property —
    * what Java's `(?U)\s` maps to — excludes). This class reproduces the
    * exact Python-`re` whitespace set on the JVM.
    */
  private val PyWs = "[\\s\\x1c-\\x1f]"
  private val PyNonWs = "[^\\s\\x1c-\\x1f]"

  /** Byte-identical port of the reference `clean_text`
    * (`text_cleaning.py:25-35`). Order matters and is part of the contract:
    *   1. lowercase
    *   2. collapse any whitespace run to a single ASCII space  (`\s+` -> " ")
    *   3. (`\n` -> " " in the reference is a provable no-op after step 2 —
    *      elided here, pinned by golden-byte tests)
    *   4. strip URLs: `http\S+` -> ""   (leaves the double space the
    *      reference leaves, because collapse ran FIRST)
    *   5. strip leading/trailing whitespace
    *   6. null -> ""
    */
  def cleanText(c: Column): Column = {
    val lowered = lower(c.cast("string"))
    val collapsed = regexp_replace(lowered, s"(?U)$PyWs+", " ")
    val noUrls = regexp_replace(collapsed, s"(?U)http$PyNonWs+", "")
    // After step 2 every whitespace char is an ASCII space, so plain trim
    // reproduces Python's Unicode-aware strip().
    coalesce(trim(noUrls), lit(""))
  }

  /** `_normalize_entity_text` (`tables.py:8-18`): strip().lower().
    * The notebook variant also collapses internal whitespace; the shipped
    * pipeline does NOT (SURVEY.md P6) — we follow the shipped pipeline.
    */
  def normalizeEntity(c: Column): Column =
    lower(regexp_replace(c.cast("string"), s"(?U)^$PyWs+|$PyWs+$$", ""))

  /** Batch text assembly (P3): ALWAYS inserts ". ", even for empty title
    * (`db_io.py:88`), after null-filling both sides (`db_io.py:86-87`).
    */
  def assembleText(title: Column, content: Column): Column =
    concat(coalesce(title, lit("")), lit(". "), coalesce(content, lit("")))

  /** API text assembly (P9): skips the separator when title is null/empty
    * (`app.py:111` — `f"{title}. {text}" if title else text`).
    */
  def assembleTextApi(title: Column, text: Column): Column =
    when(title.isNotNull && length(title) > 0,
      concat(title, lit(". "), text)).otherwise(text)

  /** Deterministic content-addressed ids replacing the reference's
    * BIGSERIAL surrogates (SURVEY.md §1.4, §2.9 fix #1). Stable across
    * executors, batches and re-runs — the property incremental resume
    * depends on.
    */
  def articleId(url: Column): Column = xxhash64(url)

  def entityId(norm: Column, entityType: Column): Column =
    xxhash64(norm, entityType)

  /** P8: prompt-length truncation (`topics_naming.py:53,73`). */
  def truncateForPrompt(c: Column, n: Int = 7500): Column = substring(c, 1, n)

  private val WsPattern = java.util.regex.Pattern.compile(s"(?U)$PyWs+")
  private val UrlPattern = java.util.regex.Pattern.compile(s"(?U)http$PyNonWs+")

  /** Driver/executor-scalar twin of [[cleanText]] — MUST stay semantically
    * identical (golden-byte tests compare both against the same fixtures).
    * Used where a plain String is in hand (fixture trainer, API-path
    * single-doc analyze).
    */
  def cleanTextScala(text: String): String = {
    if (text == null) return ""
    var t = text.toLowerCase
    t = WsPattern.matcher(t).replaceAll(" ")
    t = UrlPattern.matcher(t).replaceAll("")
    t.trim
  }

  /** sklearn's default TfidfVectorizer token pattern `(?u)\b\w\w+\b`
    * (reference `topics_detector/model.py:96-102`), as a Column producing
    * the token array of an (already cleaned, lowercased) text.
    */
  def sklearnTokens(c: Column): Column =
    regexp_extract_all(c, lit("(?U)\\b\\w\\w+\\b"), lit(0))
}
