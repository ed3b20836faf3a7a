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
      // null text must not null the whole concat (scalar twin Api.assemble
      // null-fills the same way)
      concat(title, lit(". "), coalesce(text, lit("")))).otherwise(text)

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
    // Python strip() semantics AFTER the collapse pass: every reference-
    // whitespace char is already an ASCII space, and non-whitespace C0
    // controls (\u0001..\u0008, \u000e..\u001b) must be KEPT — both
    // Python strip() and the Column path's trim() keep them, while
    // String.trim (<= U+0020) would overshoot and break the byte-parity
    // contract with [[cleanText]].
    var lo = 0
    var hi = t.length
    while (lo < hi && t.charAt(lo) == ' ') lo += 1
    while (hi > lo && t.charAt(hi - 1) == ' ') hi -= 1
    t.substring(lo, hi)
  }

  /** [[cleanTextScala]] plus an offset map back into the raw input: for
    * every char of the cleaned string, the `[begin, end)` raw-char span it
    * came from. This is what lets the API report entity offsets into the
    * text the CALLER sent (reference `api/app.py:119` — spaCy runs on the
    * raw assembled full_text) while detection itself runs on the cleaned
    * text the batch pipeline uses.
    *
    * The cleaned string is built from `text.toLowerCase` through the SAME
    * regex passes as [[cleanTextScala]], so the two are byte-identical —
    * including Java's context-sensitive final sigma (fuzz-pinned in
    * ApiSpec over mixed İ/Σ inputs).
    *
    * A collapsed whitespace RUN maps to the full raw span of the run and a
    * removed URL to nothing; entities begin and end on non-whitespace, so
    * their mapped spans are always exact raw surfaces.
    */
  def cleanTextWithOffsets(text: String): (String, Array[Int], Array[Int]) = {
    if (text == null) return ("", Array.emptyIntArray, Array.emptyIntArray)
    // 1. lowercase with positional mapping
    val lowered = text.toLowerCase
    val (s1, b1, e1) =
      if (lowered.length == text.length) // 1:1 (overwhelmingly common)
        (lowered, Array.tabulate(text.length)(identity),
          Array.tabulate(text.length)(_ + 1))
      else {
        // length-changing lowercase (e.g. 'İ' → "i̇"). Context-sensitive
        // mappings (final sigma) are length-PRESERVING, so per-code-point
        // lowercase lengths partition the full-context `lowered` exactly:
        // emit `lowered`'s own chars (keeping sigma context) while mapping
        // each segment to its source code point's raw span.
        val sb = new java.lang.StringBuilder(lowered.length)
        val bs = Array.newBuilder[Int]; val es = Array.newBuilder[Int]
        var i = 0; var o = 0
        while (i < text.length) {
          val cp = text.codePointAt(i)
          val n = Character.charCount(cp)
          val lcLen = new String(Character.toChars(cp)).toLowerCase.length
          val take = math.min(lcLen, lowered.length - o)
          var j = 0
          while (j < take) { sb.append(lowered.charAt(o + j)); bs += i; es += i + n; j += 1 }
          o += take; i += n
        }
        (sb.toString, bs.result(), es.result())
      }
    // 2. collapse whitespace runs to one space (span = whole raw run)
    def regexPass(s: String, bs: Array[Int], es: Array[Int],
        p: java.util.regex.Pattern, keepSpace: Boolean)
        : (String, Array[Int], Array[Int]) = {
      val m = p.matcher(s)
      val sb = new java.lang.StringBuilder(s.length)
      val ob = Array.newBuilder[Int]; val oe = Array.newBuilder[Int]
      var last = 0
      while (m.find()) {
        var i = last
        while (i < m.start) { sb.append(s.charAt(i)); ob += bs(i); oe += es(i); i += 1 }
        if (keepSpace && m.end > m.start) {
          sb.append(' '); ob += bs(m.start); oe += es(m.end - 1)
        }
        last = m.end
      }
      var i = last
      while (i < s.length) { sb.append(s.charAt(i)); ob += bs(i); oe += es(i); i += 1 }
      (sb.toString, ob.result(), oe.result())
    }
    val (s2, b2, e2) = regexPass(s1, b1, e1, WsPattern, keepSpace = true)
    // 3. strip URLs
    val (s3, b3, e3) = regexPass(s2, b2, e2, UrlPattern, keepSpace = false)
    // 4. trim exactly the spaces (Python strip() parity — see
    // [[cleanTextScala]]: non-whitespace C0 controls stay)
    var lo = 0
    var hi = s3.length
    while (lo < hi && s3.charAt(lo) == ' ') lo += 1
    while (hi > lo && s3.charAt(hi - 1) == ' ') hi -= 1
    (s3.substring(lo, hi), b3.slice(lo, hi), e3.slice(lo, hi))
  }

  /** sklearn's default TfidfVectorizer token pattern `(?u)\b\w\w+\b`
    * (reference `topics_detector/model.py:96-102`), as a Column producing
    * the token array of an (already cleaned, lowercased) text.
    *
    * The \w class is spelled `[\p{L}\p{N}_]`: Java's `(?U)\w` includes
    * combining marks (Mn/Mc) and join controls that Python `re`'s \w
    * (str.isalnum-based) excludes, and excludes No numerics ('½') that
    * Python includes — the explicit class matches Python AND the DuckDB
    * oracle dialect (RE2) exactly. A maximal run of class chars of
    * length ≥ 2 ≡ `\b\w\w+\b` under greedy matching.
    */
  def sklearnTokens(c: Column): Column =
    regexp_extract_all(c, lit("[\\p{L}\\p{N}_]{2,}"), lit(0))
}
