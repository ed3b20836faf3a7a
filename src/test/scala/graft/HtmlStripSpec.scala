package graft

import org.apache.spark.sql.functions._
import graft.fixtures.PageGen
import graft.functions.{HtmlStripper, Registry}

/** The engine's deterministic HTML→text extractor: unit semantics plus the
  * input_hint invariant — byte-identical extracted text per url — over the
  * full fixture corpus, both driver-side and through the Catalyst
  * expression (codegen path).
  */
class HtmlStripSpec extends SparkSpec {

  test("keeps only <p> content, in document order") {
    assert(HtmlStripper.strip("<html><body>nav<p>hello</p>tail</body>") === "hello")
    assert(HtmlStripper.strip("<p>a</p><div>skip</div><p>b</p>") === "a\nb")
  }

  test("decodes the five standard entities plus &nbsp; (to U+00A0)") {
    val html = "<p>a &amp; b &lt;x&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</p>"
    assert(HtmlStripper.strip(html) === "a & b <x> \"q\" 's' end")
  }

  test("unknown entities pass through literally") {
    assert(HtmlStripper.strip("<p>&bogus; &amp;</p>") === "&bogus; &")
    assert(HtmlStripper.strip("<p>a & b</p>") === "a & b") // bare ampersand
  }

  test("script, style and comments are skipped entirely") {
    val html = "<style>p{}</style><script>var p = '<p>no</p>';</script>" +
      "<!-- <p>also no</p> --><p>yes</p>"
    assert(HtmlStripper.strip(html) === "yes")
  }

  test("nested <p> concatenates without separator; <pre>/<param> are not <p>") {
    assert(HtmlStripper.strip("<p>a<p>b</p>c</p>") === "abc")
    assert(HtmlStripper.strip("<pre>x</pre><p>y</p>") === "y")
  }

  test("truncated html does not throw") {
    assert(HtmlStripper.strip("<p>a") === "a")
    assert(HtmlStripper.strip("<script>never closed") === "")
    assert(HtmlStripper.strip("<p>a &amp") === "a &amp")
  }

  test("byte-identical extraction over the full fixture corpus (driver-side)") {
    (0L until 300L).foreach { i =>
      val p = PageGen.generate(i)
      val got = HtmlStripper.strip(
        new String(p.html, java.nio.charset.StandardCharsets.UTF_8))
      assert(got === p.text, s"page $i url=${p.url}")
    }
  }

  test("byte-identical extraction through the Catalyst expression (codegen path)") {
    Registry.ensure(spark)
    val pages = PageGen.pages(spark, 300L).toDF()
    val mismatches = pages
      .withColumn("extracted", Registry.htmlToText(col("html")))
      .filter(col("extracted") =!= col("text"))
      .count()
    assert(mismatches === 0L)
  }
}
