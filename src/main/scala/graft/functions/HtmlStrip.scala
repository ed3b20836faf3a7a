package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic HTML→text extraction.
  *
  * Contract (the engine's "reference extractor" — the reference repo ingests
  * pre-extracted TSV text, `src/news_nlp/ingestion/db_io.py:74-88`, so the
  * web-page analogue defines its own deterministic spec):
  *
  *   - content is the text inside `<p>…</p>` elements, in document order,
  *     with the five standard entities (&amp; &lt; &gt; &quot; &#39;) and
  *     &nbsp; decoded;
  *   - consecutive `<p>` blocks are joined with a single `\n`;
  *   - `<script>`, `<style>` and `<!-- -->` blocks are skipped entirely;
  *   - everything outside `<p>` (nav, boilerplate, footers) is dropped.
  *
  * This is a single-pass scan over the raw bytes' chars — O(n), no regex —
  * and is exactly invertible against the fixture page generator, which is
  * what the "byte-identical extracted text per url" invariant is tested on.
  */
object HtmlStripper {

  def strip(html: String): String = {
    val n = html.length
    val out = new java.lang.StringBuilder(n / 2)
    var i = 0
    var pDepth = 0
    var emitted = false
    var pendingSep = false
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.regionMatches(true, i, "<!--", 0, 4)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (html.regionMatches(true, i, "<script", 0, 7)) {
          val e = indexOfIgnoreCase(html, "</script", i + 7)
          i = skipPastGt(html, if (e < 0) n else e)
        } else if (html.regionMatches(true, i, "<style", 0, 6)) {
          val e = indexOfIgnoreCase(html, "</style", i + 6)
          i = skipPastGt(html, if (e < 0) n else e)
        } else {
          val isOpenP = html.regionMatches(true, i, "<p", 0, 2) &&
            (i + 2 >= n || !Character.isLetterOrDigit(html.charAt(i + 2)))
          val isCloseP = html.regionMatches(true, i, "</p", 0, 3) &&
            (i + 3 >= n || !Character.isLetterOrDigit(html.charAt(i + 3)))
          if (isOpenP) {
            if (pDepth == 0 && emitted) pendingSep = true
            pDepth += 1
          } else if (isCloseP && pDepth > 0) pDepth -= 1
          i = skipPastGt(html, i)
        }
      } else if (pDepth > 0) {
        if (c == '&') {
          val (decoded, next) = decodeEntity(html, i)
          if (pendingSep) { out.append('\n'); pendingSep = false }
          out.append(decoded)
          emitted = true
          i = next
        } else {
          if (pendingSep) { out.append('\n'); pendingSep = false }
          out.append(c)
          emitted = true
          i += 1
        }
      } else {
        i += 1
      }
    }
    out.toString
  }

  private def skipPastGt(s: String, from: Int): Int = {
    val e = s.indexOf('>', from)
    if (e < 0) s.length else e + 1
  }

  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    val n = s.length - needle.length
    var i = math.max(from, 0)
    while (i <= n) {
      if (s.regionMatches(true, i, needle, 0, needle.length)) return i
      i += 1
    }
    -1
  }

  private def decodeEntity(s: String, i: Int): (String, Int) = {
    val semi = s.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 8) return ("&", i + 1)
    s.substring(i, semi + 1) match {
      case "&amp;"  => ("&", semi + 1)
      case "&lt;"   => ("<", semi + 1)
      case "&gt;"   => (">", semi + 1)
      case "&quot;" => ("\"", semi + 1)
      case "&#39;"  => ("'", semi + 1)
      case "&nbsp;" => (" ", semi + 1)
      case _        => ("&", i + 1)
    }
  }

  /** Entry point referenced from generated code (must be static-shaped). */
  def stripBytes(bytes: Array[Byte]): UTF8String =
    UTF8String.fromString(strip(new String(bytes, java.nio.charset.StandardCharsets.UTF_8)))

  def stripUtf8(s: UTF8String): UTF8String =
    UTF8String.fromString(strip(s.toString))
}

/** Catalyst expression wrapping [[HtmlStripper]]; participates in
  * whole-stage codegen (the generated java calls the static stripper
  * directly, no boxing / no UDF serialization on the hot path).
  * Accepts BINARY (the `html` column per the input contract) or STRING.
  */
case class HtmlToText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case BinaryType => HtmlStripper.stripBytes(input.asInstanceOf[Array[Byte]])
    case _          => HtmlStripper.stripUtf8(input.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = child.dataType match {
      case BinaryType => "stripBytes"
      case _          => "stripUtf8"
    }
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlStripper.$fn($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): HtmlToText =
    copy(child = newChild)

  override def prettyName: String = "html_to_text"
}
