package graft

import org.apache.spark.sql.functions._

import graft.api.Api
import graft.fixtures.PageGen
import graft.ner.FixtureGazetteer
import graft.pipeline.KgPipeline
import graft.schema.Pred

/** Single-text analyze surface (reference `api/app.py:100-124`): one call
  * returns topic + entities(+offsets) and must agree with the full batch
  * pipeline's triples for the same page.
  */
class ApiSpec extends SparkSpec {

  private lazy val trie = FixtureGazetteer.trie
  private lazy val params = SparkEntry.fixtureModel

  test("analyzeText equals the batch pipeline's triples for that page") {
    import spark.implicits._
    val bTrie = spark.sparkContext.broadcast(trie)
    val bParams = spark.sparkContext.broadcast(params)
    val pages = PageGen.pages(spark, 25L).toDF()
    val triples = KgPipeline.run(pages, bTrie, bParams, None,
      KgPipeline.Config(cacheAnalysis = false))
      .filter(col("pred").isin(Pred.HasTopic, Pred.Mentions))
      .select("subj", "pred", "obj", "weight")
      .as[(String, String, String, Long)].collect()
      .groupBy(_._1)
    // NOTE the batch pipeline cleans EXTRACTED html text; the API path
    // assembles (title, text). PageGen's text IS the extracted text, so
    // analyzing (null, page.text) must reproduce the page's triples.
    PageGen.pages(spark, 25L).collect().foreach { p =>
      val a = Api.analyzeText(trie, params, null, p.text, p.url,
        Some(FixtureGazetteer.keepLabels))
      val expected = triples(p.url)
      val expTopic = expected.find(_._2 == Pred.HasTopic).get._3
      assert(s"topic_${a.id_topic}" === expTopic, s"topic for ${p.url}")
      val expMentions = expected.filter(_._2 == Pred.Mentions)
        .map(t => (t._3, t._4)).sorted.toSeq
      val gotMentions = a.entities
        .groupBy(e => s"${e.entity_text_norm}|${e.entity_type}")
        .map { case (k, es) => (k, es.size.toLong) }.toSeq.sorted
      assert(gotMentions === expMentions, s"mentions for ${p.url}")
    }
  }

  test("P9 assembly: title skipped when empty; non-empty title shifts offsets") {
    // P9: no leading ". " when the title is empty (app.py:111)
    val noTitle = Api.analyzeText(trie, params, "", "erik larsen scored")
    assert(noTitle === Api.analyzeText(trie, params, null, "erik larsen scored")
      .copy(url = noTitle.url))
    val base = Api.analyzeText(trie, params, null, "erik larsen scored")
    val shifted = Api.analyzeText(trie, params, "Derby", "erik larsen scored")
    assert(base.entities.nonEmpty)
    assert(shifted.entities.map(_.begin_char) ===
      base.entities.map(_.begin_char + "derby".length + 2))
  }

  test("offsets point at the surface form in the CLEANED text") {
    // whitespace-tokenized NER: keep entity tokens punctuation-free
    val text = "Erik  Larsen   visited   France today https://x.io/a"
    val a = Api.analyzeText(trie, params, null, text)
    val clean = graft.functions.Text.cleanTextScala(text)
    assert(a.entities.map(_.entity_text_norm).sorted === Seq("erik larsen", "france"))
    a.entities.foreach { e =>
      assert(clean.substring(e.begin_char, e.end_char) === e.entity_text)
    }
  }

  test("analyzePages (Dataset variant) equals driver-side analyzeText") {
    import spark.implicits._
    val bTrie = spark.sparkContext.broadcast(trie)
    val bParams = spark.sparkContext.broadcast(params)
    val data = Seq(
      ("u1", "Transfer window", "erik larsen joined hooli"),
      ("u2", null, "the senate raised rates in france"),
      ("u3", "", ""))
    val rows = data.toDF("url", "title", "text")
    val got = Api.analyzePages(rows, bTrie, bParams).collect()
      .map(a => a.url -> a).toMap
    data.foreach { case (u, t, x) =>
      val exp = Api.analyzeText(trie, params, t, x, u)
      assert(got(u) === exp, u)
    }
  }
}
