package graft.topics

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Topic dictionary tables — the Spark re-expression of the reference's
  * `topics` + `terms_per_topic` materialization:
  *
  *   - A4 topic sizes (`topics_detector/tables.py:52-58`)
  *   - A5 mean TF-IDF per topic (`topics_detector/model.py:175-215`)
  *   - W1 rank assignment 1..N (`tables.py:87-99`)
  *   - W2 top-k terms per topic (`model.py:209-213`), deterministic
  *     tie-break (weight DESC, term ASC)
  *   - W3 top-k representative docs per topic by distance-to-centroid
  *     (`topics_naming.py:64-70`)
  *
  * Scale shape: ONE narrow mapPartitions pass emits sparse
  * (topic, term, weight) contributions plus a per-doc size marker; the
  * only shuffle is the (topic, term) aggregation, whose key space is
  * bounded by k × vocab — map-side partial agg makes the wire tiny.
  */
object TopicTerms {

  private val SizeMarker = -1

  /** (id_topic, term_idx, w) contributions + (id_topic, -1, 1.0) doc
    * markers, all from a single scoring pass.
    */
  private def contributions(
      cleaned: DataFrame,
      params: Broadcast[TopicModelParams],
      urlCol: String,
      textCol: String): DataFrame = {
    val spark = cleaned.sparkSession
    import spark.implicits._
    cleaned.select(col(urlCol).cast("string"), col(textCol).cast("string"))
      .as[(String, String)]
      .mapPartitions { it =>
        val p = params.value
        it.flatMap { case (_, text) =>
          val t = if (text == null) "" else text
          val (idx, vals) = TopicScorer.tfidfVector(p, t)
          val x = TopicScorer.project(p, idx, vals)
          val (topic, _) = TopicScorer.assign(p, x)
          Iterator.single((topic, SizeMarker, 1.0)) ++
            idx.indices.iterator.map(i => (topic, idx(i), vals(i)))
        }
      }.toDF("id_topic", "term_idx", "w")
  }

  /** A4: docs per topic. */
  def topicSizes(
      cleaned: DataFrame,
      params: Broadcast[TopicModelParams],
      urlCol: String = "url",
      textCol: String = "clean"): DataFrame =
    contributions(cleaned, params, urlCol, textCol)
      .filter(col("term_idx") === SizeMarker)
      .groupBy(col("id_topic"))
      .agg(count(lit(1)).as("topic_size"))

  /** A5 + W1/W2: top-N terms per topic by mean TF-IDF (mean over ALL docs
    * of the topic, zeros included — `X_tfidf[mask].mean(axis=0)`).
    * Output: (id_topic, rank, term, weight), rank 1..N.
    */
  def topTerms(
      cleaned: DataFrame,
      params: Broadcast[TopicModelParams],
      topN: Int = 50,
      urlCol: String = "url",
      textCol: String = "clean"): DataFrame = {
    val spark = cleaned.sparkSession
    import spark.implicits._
    // ONE aggregation over (id_topic, term_idx) covers both the term sums
    // and the size markers; the two branches below are canonically
    // identical subtrees, so ReuseExchange computes the shuffle once —
    // no persist, no JVM-lifetime cache leak (round-1 ADVICE).
    val agg = contributions(cleaned, params, urlCol, textCol)
      .groupBy($"id_topic", $"term_idx").agg(sum($"w").as("w_sum"))
    val sizes = agg.filter($"term_idx" === SizeMarker)
      .select($"id_topic", $"w_sum".cast("long").as("topic_size"))
    val sums = agg.filter($"term_idx" =!= SizeMarker)
    val vocab = params.value.vocab.zipWithIndex
      .map { case (t, i) => (i, t) }.toSeq.toDF("term_idx", "term")
    // rank on the ROUNDED weight (ties → term asc): makes the ordering
    // restatable by a SQL oracle without double-summation-order hazards
    val w = Window.partitionBy($"id_topic")
      .orderBy(round($"weight", 6).desc, $"term".asc)
    sums
      .join(broadcast(sizes), Seq("id_topic"))
      .withColumn("weight", $"w_sum" / $"topic_size")
      .join(broadcast(vocab), Seq("term_idx"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= topN)
      .select($"id_topic", $"rank".cast("long").as("rank"), $"term",
        $"weight")
  }

  /** W3: top-k representative docs per topic (nearest to centroid,
    * deterministic tie-break on url).
    */
  def representativeDocs(
      cleaned: DataFrame,
      params: Broadcast[TopicModelParams],
      k: Int = 3,
      urlCol: String = "url",
      textCol: String = "clean"): DataFrame = {
    val assigned = TopicScorer.assignTopics(cleaned, params, urlCol, textCol).toDF()
    val w = Window.partitionBy(col("id_topic"))
      .orderBy(col("dist_centroid").asc, col("url").asc)
    assigned
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("id_topic"), col("rank"), col("url"), col("dist_centroid"))
  }

  /** W3 + M5 naming input: the representative docs WITH their
    * prompt-truncated texts — exactly what the reference feeds its LLM
    * namer (`topics_naming.py:62-79`: top-3 per topic by dist_centroid
    * asc, text sliced to `maxLen` = 7500 chars).
    *
    * Scale shape: [[representativeDocs]] is k × topics rows — broadcast
    * it and semi-join the corpus, so the text fetch is one pruned pass,
    * never a shuffle of the corpus.
    */
  def representativeTexts(
      cleaned: DataFrame,
      params: Broadcast[TopicModelParams],
      k: Int = 3,
      maxLen: Int = 7500,
      urlCol: String = "url",
      textCol: String = "clean"): DataFrame = {
    val reps = representativeDocs(cleaned, params, k, urlCol, textCol)
    cleaned.select(col(urlCol).as("url"), col(textCol).cast("string").as("text"))
      .join(broadcast(reps), Seq("url"))
      .select(col("id_topic"), col("rank"), col("url"),
        substring(col("text"), 1, maxLen).as("text"))
  }
}

/** M5: topic naming — driver-side, out of the dataflow (the reference
  * calls OpenAI per topic, `topics_naming.py:41-125`, with a deterministic
  * fallback `f"Topic {id}"`, `tables.py:59`). The LLM seam is a trait; the
  * engine ships two deterministic namers.
  */
trait TopicNamer extends Serializable {
  def name(idTopic: Int, topTerms: Seq[String], representativeTexts: Seq[String]): String

  /** Whether this namer consumes representative texts. The reference only
    * gathers the top-3 texts for the LLM path (`topics_naming.py:62-79`);
    * the deterministic fallbacks never touch them — so [[TopicNaming
    * .nameTopics]] skips the text fetch entirely unless this is true.
    */
  def needsTexts: Boolean = false
}

/** The reference's deterministic fallback (`tables.py:59`). */
object DefaultTopicNamer extends TopicNamer {
  override def name(idTopic: Int, terms: Seq[String], texts: Seq[String]): String =
    s"Topic $idTopic"
}

/** Deterministic descriptive namer: top-3 terms joined. */
object TermTopicNamer extends TopicNamer {
  override def name(idTopic: Int, terms: Seq[String], texts: Seq[String]): String =
    terms.take(3).mkString(" / ")
}

object TopicNaming {
  /** Build the `topics` table: (id_topic, topic_name, topic_size).
    * Naming runs on the DRIVER over k rows (k ≪ data; the reference's
    * per-topic LLM call has the same shape).
    *
    * `repTexts` (schema of [[TopicTerms.representativeTexts]]: id_topic,
    * rank, url, text) supplies the reference LLM prompt's second input —
    * the top-3 nearest-to-centroid documents, prompt-truncated
    * (`topics_naming.py:62-79` + `config/prompts.yaml:16-38`). It is only
    * COLLECTED when `namer.needsTexts` (the reference fetches texts for
    * the LLM path alone); the collected set is bounded by
    * k × topics × maxLen chars.
    */
  def nameTopics(
      topTerms: DataFrame,
      sizes: DataFrame,
      namer: TopicNamer = DefaultTopicNamer,
      repTexts: Option[DataFrame] = None): DataFrame = {
    val spark = topTerms.sparkSession
    import spark.implicits._
    val byTopic = topTerms.select($"id_topic", $"rank", $"term")
      .as[(Int, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    // a topic whose member docs ALL project to the zero vector has size
    // markers but no term rows — it must still appear in the topics
    // table (named from empty terms), not silently vanish
    val sizeIds = sizes.select($"id_topic").as[Int].collect().toSet
    val allIds = (byTopic.keySet ++ sizeIds).toSeq.sorted
    val textsByTopic: Map[Int, Seq[String]] =
      if (!namer.needsTexts) Map.empty
      else repTexts match {
        case None => Map.empty
        case Some(rt) => rt.select($"id_topic", $"rank", $"text")
          .as[(Int, Long, String)].collect()
          .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
      }
    val named = allIds.map { id =>
      (id, namer.name(id, byTopic.getOrElse(id, Seq.empty),
        textsByTopic.getOrElse(id, Seq.empty)))
    }.toDF("id_topic", "topic_name")
    named.join(sizes, Seq("id_topic"), "left")
      .select($"id_topic", $"topic_name",
        coalesce($"topic_size", lit(0L)).as("topic_size"))
  }
}
