package graft.topics

import java.util.Random

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Hashing

/** Frozen topic-model parameters — the Spark-side equivalent of the
  * reference's fitted sklearn pipeline artifact
  * (`src/news_nlp/topics_detector/model.py:54-68`). Loaded on the driver,
  * broadcast to executors, consumed in `mapPartitions` (SURVEY.md M1-M3).
  *
  * components: vocabSize × nComponents (the SVD V matrix; transform is
  * x·V), centroids: k × nComponents.
  */
final case class TopicModelParams(
    vocab: Array[String],
    idf: Array[Double],
    components: Array[Array[Double]],
    centroids: Array[Array[Double]],
    ngramMax: Int = 2) extends Serializable {

  @transient lazy val vocabIndex: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](vocab.length * 2)
    var i = 0
    while (i < vocab.length) { m.put(vocab(i), Integer.valueOf(i)); i += 1 }
    m
  }

  /** First words of vocabulary bigrams — the scoring hot loop only pays
    * the bigram StringBuilder + map probe when the current token can
    * actually START a vocab bigram (typically a small fraction).
    */
  @transient lazy val bigramFirstWords: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    var i = 0
    while (i < vocab.length) {
      val t = vocab(i)
      val sp = t.indexOf(' ')
      if (sp > 0) s.add(t.substring(0, sp))
      i += 1
    }
    s
  }

  def nComponents: Int = if (components.isEmpty) 0 else components(0).length
  def k: Int = centroids.length
}

final case class TopicAssignment(
    url: String,
    article_id: Long,
    id_topic: Int,
    dist_centroid: Double)

object TopicScorer {

  /** sklearn default token pattern `(?u)\b\w\w+\b` (`model.py:96-102`) —
    * spelled as the explicit class (Python-\w and oracle-RE2 exact; see
    * [[graft.functions.Text.sklearnTokens]]); MUST stay identical to it.
    */
  private val TokenPattern = java.util.regex.Pattern.compile("[\\p{L}\\p{N}_]{2,}")

  def tokenize(text: String): Array[String] = {
    val m = TokenPattern.matcher(text)
    val out = Array.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  /** Exact sklearn TfidfVectorizer.transform semantics for frozen params:
    * raw term counts over unigrams+bigrams, tf * idf, then L2 normalize.
    * (smooth-idf is baked into params.idf at train time.)
    */
  def tfidfVector(params: TopicModelParams, text: String): (Array[Int], Array[Double]) = {
    val toks = tokenize(text)
    val counts = new java.util.HashMap[Integer, Integer]()
    val idx = params.vocabIndex
    require(params.ngramMax <= 2, "ngramMax > 2 unsupported (reference uses (1,2))")
    val useBigrams = params.ngramMax >= 2
    val bgFirst = params.bigramFirstWords
    var i = 0
    while (i < toks.length) {
      val t1: Integer = idx.get(toks(i))
      if (t1 != null) counts.merge(t1, 1, (a, b) => a + b)
      // build the bigram string only when toks(i) can start a vocab
      // bigram — skips the allocation + probe on most positions
      if (useBigrams && i + 1 < toks.length && bgFirst.contains(toks(i))) {
        val sb = new java.lang.StringBuilder(
          toks(i).length + 1 + toks(i + 1).length)
        sb.append(toks(i)).append(' ').append(toks(i + 1))
        val t2: Integer = idx.get(sb.toString)
        if (t2 != null) counts.merge(t2, 1, (a, b) => a + b)
      }
      i += 1
    }
    val indices = new Array[Int](counts.size())
    val it = counts.keySet().iterator()
    var p = 0
    while (it.hasNext) { indices(p) = it.next(); p += 1 }
    java.util.Arrays.sort(indices)
    val values = new Array[Double](indices.length)
    var norm = 0.0
    p = 0
    while (p < indices.length) {
      val v = counts.get(indices(p)).toDouble * params.idf(indices(p))
      values(p) = v
      norm += v * v
      p += 1
    }
    if (norm > 0) {
      val inv = 1.0 / math.sqrt(norm)
      p = 0
      while (p < values.length) { values(p) *= inv; p += 1 }
    }
    (indices, values)
  }

  /** M2: project sparse tfidf by the broadcast V (x·V), then L2-normalize
    * (sklearn `make_pipeline(TruncatedSVD, Normalizer)`, `model.py:104-111`).
    */
  def project(params: TopicModelParams, indices: Array[Int], values: Array[Double]): Array[Double] = {
    val d = params.nComponents
    val out = new Array[Double](d)
    var p = 0
    while (p < indices.length) {
      val row = params.components(indices(p))
      val v = values(p)
      var j = 0
      while (j < d) { out(j) += v * row(j); j += 1 }
      p += 1
    }
    var norm = 0.0
    var j = 0
    while (j < d) { norm += out(j) * out(j); j += 1 }
    if (norm > 0) {
      val inv = 1.0 / math.sqrt(norm)
      j = 0
      while (j < d) { out(j) *= inv; j += 1 }
    }
    out
  }

  /** M3: nearest centroid (squared euclidean; ties → lowest topic id,
    * matching numpy argmin).
    */
  def assign(params: TopicModelParams, x: Array[Double]): (Int, Double) = {
    var best = -1
    var bestDist = Double.MaxValue
    var c = 0
    while (c < params.centroids.length) {
      val cen = params.centroids(c)
      var d = 0.0
      var j = 0
      while (j < x.length) { val t = x(j) - cen(j); d += t * t; j += 1 }
      if (d < bestDist) { bestDist = d; best = c }
      c += 1
    }
    (best, math.sqrt(bestDist))
  }

  def score(params: TopicModelParams, url: String, text: String): TopicAssignment = {
    val (idx, vals) = tfidfVector(params, text)
    val x = project(params, idx, vals)
    val (topic, dist) = assign(params, x)
    // null url must not NPE the executor (text is defaulted the same way
    // by every caller); a null-url row scores with an empty article id key
    val u = if (url == null) "" else url
    TopicAssignment(u, Hashing.xxhash64(u), topic, dist)
  }

  /** Distributed scoring: broadcast params + narrow mapPartitions — the
    * replacement for `predict_topics_for_texts`
    * (`src/news_nlp/topics_detector/inference.py:11-43`).
    */
  def assignTopics(
      pages: DataFrame,
      params: Broadcast[TopicModelParams],
      urlCol: String = "url",
      textCol: String = "text"): Dataset[TopicAssignment] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.select(col(urlCol).as("url"), col(textCol).as("text"))
      .as[(String, String)]
      .mapPartitions { it =>
        val p = params.value
        it.map { case (url, text) => score(p, url, if (text == null) "" else text) }
      }
  }
}

/** Deterministic driver-side trainer for fixture-scale models
  * (FIXTURES.md §4). Mirrors sklearn's formulas exactly where they are
  * deterministic (TF-IDF vocab selection, smooth idf) and substitutes
  * deterministic algorithms where sklearn is randomized (power-iteration
  * SVD with fixed start, k-means++ with a fixed LCG) — training parity is
  * tolerance-only per SURVEY.md §7.4 #6; INFERENCE given frozen params is
  * exact.
  */
object FixtureTrainer {

  def train(
      texts: Seq[String],
      vocabSize: Int = 512,
      minDf: Int = 2,
      maxDfRatio: Double = 0.7,
      nComponents: Int = 8,
      k: Int = 6,
      seed: Long = 31415L): TopicModelParams = {
    val n = texts.length
    // --- vocabulary (sklearn: df bounds, then top max_features by corpus
    // term count; ties alphabetical) ---
    val df = new java.util.HashMap[String, Int]()
    val cf = new java.util.HashMap[String, Long]()
    val docTokens = texts.map { t =>
      val toks = TopicScorer.tokenize(t)
      val grams = (toks ++ toks.sliding(2).filter(_.length == 2).map(_.mkString(" "))).toArray
      grams.foreach(g => cf.merge(g, 1L, (a, b) => a + b))
      grams.distinct.foreach(g => df.merge(g, 1, (a, b) => a + b))
      grams
    }
    val maxDf = (maxDfRatio * n).toInt
    import scala.jdk.CollectionConverters._
    val vocab = df.entrySet().asScala.toSeq
      .filter(e => e.getValue >= minDf && e.getValue <= maxDf)
      .map(e => (e.getKey, cf.get(e.getKey)))
      .sortBy { case (term, c) => (-c, term) }
      .take(vocabSize)
      .map(_._1).sorted.toArray
    val vIndex = vocab.zipWithIndex.toMap
    val idf = vocab.map(t => math.log((1.0 + n) / (1.0 + df.get(t))) + 1.0)

    // --- dense tfidf matrix (fixture scale only) ---
    val X = Array.ofDim[Double](n, vocab.length)
    docTokens.zipWithIndex.foreach { case (grams, row) =>
      grams.foreach { g =>
        vIndex.get(g).foreach { j => X(row)(j) += 1.0 }
      }
      var norm = 0.0
      var j = 0
      while (j < vocab.length) {
        X(row)(j) *= idf(j)
        norm += X(row)(j) * X(row)(j)
        j += 1
      }
      if (norm > 0) {
        val inv = 1.0 / math.sqrt(norm)
        j = 0
        while (j < vocab.length) { X(row)(j) *= inv; j += 1 }
      }
    }

    // --- truncated SVD via breeze (deterministic full SVD of X^T X) ---
    val bm = breeze.linalg.DenseMatrix(X: _*)
    val gram = bm.t * bm // vocab × vocab
    val es = breeze.linalg.eigSym(gram)
    // top nComponents eigenvectors by eigenvalue desc
    val order = (0 until es.eigenvalues.length)
      .sortBy(i => -es.eigenvalues(i)).take(nComponents)
    val components = Array.tabulate(vocab.length, nComponents) { (i, c) =>
      es.eigenvectors(i, order(c))
    }

    // --- reduced, normalized docs ---
    val reduced = X.map { row =>
      val out = new Array[Double](nComponents)
      var i = 0
      while (i < row.length) {
        if (row(i) != 0.0) {
          var j = 0
          while (j < nComponents) { out(j) += row(i) * components(i)(j); j += 1 }
        }
        i += 1
      }
      val nrm = math.sqrt(out.map(x => x * x).sum)
      if (nrm > 0) out.map(_ / nrm) else out
    }

    // --- deterministic k-means++ + Lloyd ---
    val centroids = kmeans(reduced, k, seed)
    TopicModelParams(vocab, idf, components, centroids)
  }

  def kmeans(points: Array[Array[Double]], k: Int, seed: Long, iters: Int = 100): Array[Array[Double]] = {
    val rng = new Random(seed)
    val n = points.length
    val d = points(0).length
    val cents = new Array[Array[Double]](k)
    cents(0) = points(rng.nextInt(n)).clone()
    val d2 = Array.fill(n)(Double.MaxValue)
    var c = 1
    while (c < k) {
      var i = 0
      var sum = 0.0
      while (i < n) {
        val dist = sqDist(points(i), cents(c - 1))
        if (dist < d2(i)) d2(i) = dist
        sum += d2(i)
        i += 1
      }
      var target = rng.nextDouble() * sum
      var pick = 0
      i = 0
      var acc = 0.0
      while (i < n && acc + d2(i) < target) { acc += d2(i); i += 1 }
      pick = math.min(i, n - 1)
      cents(c) = points(pick).clone()
      c += 1
    }
    var it = 0
    var moved = true
    while (it < iters && moved) {
      val sums = Array.ofDim[Double](k, d)
      val counts = new Array[Int](k)
      var i = 0
      while (i < n) {
        var best = 0
        var bd = Double.MaxValue
        var cc = 0
        while (cc < k) {
          val dist = sqDist(points(i), cents(cc))
          if (dist < bd) { bd = dist; best = cc }
          cc += 1
        }
        counts(best) += 1
        var j = 0
        while (j < d) { sums(best)(j) += points(i)(j); j += 1 }
        i += 1
      }
      moved = false
      var cc = 0
      while (cc < k) {
        if (counts(cc) > 0) {
          var j = 0
          while (j < d) {
            val nv = sums(cc)(j) / counts(cc)
            if (math.abs(nv - cents(cc)(j)) > 1e-12) moved = true
            cents(cc)(j) = nv
            j += 1
          }
        }
        cc += 1
      }
      it += 1
    }
    cents
  }

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }
    s
  }
}
