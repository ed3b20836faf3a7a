package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass `clean_text` (P1) — byte-identical to the regex chain in
  * [[Text.cleanText]] (pinned by golden tests + the DuckDB oracle), but
  * one scan over a char buffer instead of three `regexp_replace` passes
  * with three intermediate strings. On the 100 TB hot path this halves
  * the allocation rate of the extract stage, which is what gates thread
  * scaling (the work is memory-bound, not ALU-bound).
  *
  * Reference semantics (`text_cleaning.py:25-35`):
  *   lower → collapse Python-`\s` runs (Unicode White_Space ∪ 0x1C..0x1F)
  *   to one ASCII space → delete `http\S+` → strip.
  */
object CleanTextImpl {

  /** Python-`re` `\s` under a lowered string: the Unicode White_Space set
    * plus the ASCII separator controls 0x1C–0x1F (Java's `(?U)\s` includes
    * them via \p{IsWhite_Space}? No — Python includes them explicitly;
    * Java (?U)\s resolves to White_Space which EXCLUDES them, so the regex
    * twin lists them in its char class too).
    */
  def isPyWs(c: Char): Boolean =
    if (c < 0x80) {
      (c >= 0x09 && c <= 0x0d) || c == 0x20 || (c >= 0x1c && c <= 0x1f)
    } else {
      c == 0x85 || c == 0xa0 || c == 0x1680 ||
        (c >= 0x2000 && c <= 0x200a) ||
        c == 0x2028 || c == 0x2029 || c == 0x202f ||
        c == 0x205f || c == 0x3000
    }

  /** Entry point referenced from generated code. Null-in → handled by the
    * expression wrapper; empty-in → empty-out. Delegates to the String
    * twin — one decode here, one encode at the end; the char passes are
    * shared with the scalar hot path.
    */
  def clean(u: UTF8String): UTF8String =
    UTF8String.fromString(cleanString(u.toString))

  /** Replicates `UTF8String.toLowerCase` EXACTLY on a String: full-ASCII
    * inputs lower bytewise A-Z (locale-independent — under e.g. a
    * Turkish default locale `String.toLowerCase` would map ASCII 'I' to
    * dotless 'ı' while the UTF8String ASCII fast path gives 'i');
    * anything non-ASCII takes the same `String.toLowerCase()` the
    * UTF8String slow path takes. Keeping this bit-identical is what lets
    * the scalar hot path skip the UTF8String container without breaking
    * Column ≡ scalar parity (fuzz-pinned).
    */
  private def lowerLikeUtf8(s: String): String = {
    var i = 0
    var ascii = true
    while (i < s.length && ascii) {
      if (s.charAt(i) >= 0x80) ascii = false
      i += 1
    }
    if (!ascii) s.toLowerCase()
    else {
      val buf = new Array[Char](s.length)
      var j = 0
      while (j < s.length) {
        val c = s.charAt(j)
        buf(j) = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
        j += 1
      }
      new String(buf)
    }
  }

  /** String→String scalar twin used by the fused analyzer
    * ([[graft.pipeline.KgPipeline.analyze]]) — skips the two UTF-8
    * encode/decode round trips the UTF8String container cost on a path
    * whose input and consumers (trie NER, topic scoring) are Strings.
    * Char-identical to [[clean]] by construction (clean delegates here).
    */
  def cleanString(s: String): String = {
    val lowered = lowerLikeUtf8(s)
    val n = lowered.length
    val buf = new Array[Char](n)
    // pass 1: collapse whitespace runs to single ASCII space
    var o = 0
    var i = 0
    var prevSpace = false
    while (i < n) {
      val c = lowered.charAt(i)
      if (isPyWs(c)) {
        if (!prevSpace) { buf(o) = ' '; o += 1; prevSpace = true }
      } else {
        buf(o) = c; o += 1; prevSpace = false
      }
      i += 1
    }
    // pass 2 (same buffer): delete http\S+ = "http" followed by ≥1
    // non-space (after collapse the only whitespace char is ' ')
    var q = 0
    var p = 0
    while (p < o) {
      if (buf(p) == 'h' && p + 4 < o &&
          buf(p + 1) == 't' && buf(p + 2) == 't' && buf(p + 3) == 'p' &&
          buf(p + 4) != ' ') {
        p += 4
        while (p < o && buf(p) != ' ') p += 1
      } else {
        buf(q) = buf(p); q += 1; p += 1
      }
    }
    // strip (only ' ' can remain at the edges)
    var st = 0
    var e = q
    while (st < e && buf(st) == ' ') st += 1
    while (e > st && buf(e - 1) == ' ') e -= 1
    new String(buf, st, e - st)
  }
}

/** Codegen wrapper; null → "" (the reference's None → "" contract), so the
  * expression is non-nullable and downstream predicates simplify.
  */
case class CleanText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) UTF8String.EMPTY_UTF8
    else CleanTextImpl.clean(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val childGen = child.genCode(ctx)
    val resultCode =
      code"""
        ${childGen.code}
        UTF8String ${ev.value} = ${childGen.isNull}
          ? UTF8String.EMPTY_UTF8
          : graft.functions.CleanTextImpl.clean(${childGen.value});
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): CleanText =
    copy(child = newChild)

  override def prettyName: String = "clean_text_fast"
}
