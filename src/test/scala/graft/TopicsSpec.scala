package graft

import graft.fixtures.PageGen
import graft.functions.Text
import graft.topics.{FixtureTrainer, TopicModelParams, TopicScorer}

/** Topic scoring (M1-M3): exact sklearn-formula TF-IDF given frozen
  * params, deterministic training, and distributed == driver-side scoring.
  */
class TopicsSpec extends SparkSpec {

  test("sklearn tokenizer: (?u)\\b\\w\\w+\\b drops 1-char tokens and punctuation") {
    assert(TopicScorer.tokenize("a bb ccc d-e f.g 42 x").toSeq ===
      Seq("bb", "ccc", "42")) // "d-e"→ d,e both 1-char; "f.g" same
  }

  test("tfidfVector: exact tf*idf with L2 norm over uni+bigrams") {
    val params = TopicModelParams(
      vocab = Array("alpha", "alpha beta", "beta"),
      idf = Array(2.0, 3.0, 1.0),
      components = Array(Array(1.0), Array(1.0), Array(1.0)),
      centroids = Array(Array(0.0)))
    val (idx, vals) = TopicScorer.tfidfVector(params, "alpha beta alpha")
    // counts: alpha=2, beta=1, "alpha beta"=1, "beta alpha"=1 (not in vocab)
    val raw = Map(0 -> 2.0 * 2.0, 1 -> 1.0 * 3.0, 2 -> 1.0 * 1.0)
    val norm = math.sqrt(raw.values.map(v => v * v).sum)
    assert(idx.toSeq === Seq(0, 1, 2))
    vals.zip(Seq(4.0 / norm, 3.0 / norm, 1.0 / norm)).foreach {
      case (got, want) => assert(math.abs(got - want) < 1e-12)
    }
  }

  test("unknown-vocab text projects to zero vector and assigns topic 0 deterministically") {
    val params = TopicModelParams(
      vocab = Array("alpha"), idf = Array(1.0),
      components = Array(Array(1.0, 0.0)),
      centroids = Array(Array(0.0, 0.0), Array(1.0, 0.0)))
    val a = TopicScorer.score(params, "u", "zz yy xx")
    assert(a.id_topic === 0) // zero vector: centroid 0 at distance 0
    assert(a.dist_centroid === 0.0)
  }

  test("assign: argmin with ties to the lowest topic id (numpy argmin semantics)") {
    val params = TopicModelParams(
      vocab = Array("x"), idf = Array(1.0),
      components = Array(Array(1.0)),
      centroids = Array(Array(2.0), Array(0.0))) // x=[1.0] equidistant
    val (topic, dist) = TopicScorer.assign(params, Array(1.0))
    assert(topic === 0)
    assert(math.abs(dist - 1.0) < 1e-12)
  }

  test("fixture training is fully deterministic (same corpus → identical params)") {
    val texts = (0L until 60L).map(i => Text.cleanTextScala(PageGen.generate(i).text))
    val p1 = FixtureTrainer.train(texts)
    val p2 = FixtureTrainer.train(texts)
    assert(p1.vocab.toSeq === p2.vocab.toSeq)
    assert(p1.idf.toSeq === p2.idf.toSeq)
    assert(p1.components.map(_.toSeq).toSeq === p2.components.map(_.toSeq).toSeq)
    assert(p1.centroids.map(_.toSeq).toSeq === p2.centroids.map(_.toSeq).toSeq)
    assert(p1.vocab.toSeq === p1.vocab.sorted.toSeq) // sklearn: sorted vocab
  }

  test("distributed scoring equals driver-side scoring (broadcast params, mapPartitions)") {
    import spark.implicits._
    val n = 60L
    val params = SparkEntry.fixtureModel
    val bc = spark.sparkContext.broadcast(params)
    val cleaned = PageGen.genPages(spark, n)
      .map(g => (g.url, Text.cleanTextScala(g.text)))
      .toDF("url", "clean")
    val dist = TopicScorer.assignTopics(cleaned, bc, textCol = "clean")
      .collect().map(a => a.url -> (a.id_topic, a.dist_centroid)).toMap
    (0L until n).foreach { i =>
      val g = PageGen.generate(i)
      val local = TopicScorer.score(params, g.url, Text.cleanTextScala(g.text))
      val (t, d) = dist(g.url)
      assert(t === local.id_topic, s"url=${g.url}")
      assert(math.abs(d - local.dist_centroid) < 1e-12)
    }
  }

  test("fixture model shape: 6 clusters × 8 components over the pinned corpus") {
    val m = SparkEntry.fixtureModel
    assert(m.k === 6)
    assert(m.nComponents === 8)
    assert(m.vocab.nonEmpty && m.vocab.length <= 512)
  }
}
