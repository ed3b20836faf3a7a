package graft.pipeline

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.canon.ConnectedComponents
import graft.functions.{Registry, Text}
import graft.link.EntityLink
import graft.ner.{FixtureGazetteer, NerExtractor, TokenTrie}
import graft.schema.{Mention, Pred, Triple}
import graft.topics.{TopicModelParams, TopicScorer}

/** The end-to-end knowledge-graph construction pipeline (north_star):
  *
  *   pages(url, warc_ts, html, text, lang)
  *     → (1) deterministic HTML→text (byte-identity checked vs `text`)
  *     → clean_text (P1)
  *     → (2) batched NER (broadcast trie, mapPartitions)  + topic scoring
  *     → (3) entity linking (broadcast / salted join)
  *     → (4) connected-components canonicalization
  *     → triples (article hasTopic topic | article mentions entity |
  *                entity sameAs canonical)
  *
  * Stages (1)-(2) are NARROW (no shuffle); the only shuffles are the
  * dictionary aggregation, the CC rounds, and — if the dictionary outgrows
  * broadcast — the salted link join.
  */
object KgPipeline {

  final case class Config(
      keepTypes: Option[Set[String]] = Some(FixtureGazetteer.keepLabels),
      saltedLink: Boolean = false,
      saltFactor: Int = 16,
      hotThreshold: Long = 100000L)

  /** Extract text from html and verify byte-identity against the `text`
    * column (the input_hint invariant). Returns pages with `clean` column
    * added; rows violating identity are counted via an accumulator-free
    * metric column (callers assert in tests).
    */
  def withCleanText(pages: DataFrame): DataFrame = {
    val spark = pages.sparkSession
    Registry.ensure(spark)
    pages
      .withColumn("extracted_text", Registry.htmlToText(col("html")))
      .withColumn("text_identical", col("extracted_text") === col("text"))
      .withColumn("clean", Registry.cleanTextFast(col("extracted_text")))
  }

  /** Mentions triple path: NER → dictionary → canonical sameAs edges. */
  def mentionTriples(
      cleaned: DataFrame,
      trie: Broadcast[TokenTrie],
      cfg: Config): (Dataset[Mention], DataFrame, DataFrame) = {
    val spark = cleaned.sparkSession
    import spark.implicits._
    // Mentions feed THREE consumers (surface counts, exact news_count,
    // per-article counts) — persist so the NER scan runs once, not 3×.
    // At 100 TB mentions ≪ pages (only matched spans survive), so this is
    // the cheap thing to keep, not the input.
    val mentions = NerExtractor.extractMentions(
      cleaned, trie, cfg.keepTypes, textCol = "clean")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the dictionary is consumed twice by canonicalization (edge build and
    // key render) and optionally by the salted link — persist it too
    val dict = EntityLink.buildEntityDict(mentions).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val perArticle = EntityLink.mentionsPerArticle(mentions)
    val linked =
      if (cfg.saltedLink)
        EntityLink.linkSalted(
          perArticle.drop("id_entity"), dict, cfg.saltFactor, cfg.hotThreshold)
      else perArticle // id already deterministic: xxhash64(norm, type)
    val mentionTriples = linked.select(
      $"url".as("subj"),
      lit(Pred.Mentions).as("pred"),
      concat($"entity_text_norm", lit("|"), $"entity_type").as("obj"),
      $"entity_mentions_count".cast("long").as("weight"))
    (mentions, dict, mentionTriples)
  }

  /** sameAs triples via connected components over alias edges.
    * Edge source: entities sharing the SAME normalized text with different
    * types are NOT merged (type is part of identity, as in the reference
    * dictionary key `(norm, type)`, tables.py:59-79); edges come from an
    * alias table (e.g. "u.s."→"united states") — at fixture scale the
    * generator provides none, so this canonicalizes each entity to itself
    * unless aliases are supplied.
    */
  def sameAsTriples(dict: DataFrame, aliases: DataFrame): DataFrame = {
    val spark = dict.sparkSession
    import spark.implicits._
    // nodes are entity ids; alias edges join through normalized text
    val idByNorm = dict.select($"entity_text_norm", $"entity_type", $"id_entity")
    val edges = aliases // (norm_a, norm_b, entity_type)
      .join(idByNorm.withColumnRenamed("entity_text_norm", "norm_a")
        .withColumnRenamed("id_entity", "src"), Seq("norm_a", "entity_type"))
      .join(idByNorm.withColumnRenamed("entity_text_norm", "norm_b")
        .withColumnRenamed("id_entity", "dst"), Seq("norm_b", "entity_type"))
      .select($"src", $"dst")
    // runAuto handles the empty/small/large regimes (alias graphs are
    // dictionary-sized → usually the driver union-find path); empty labels
    // fall through to an empty join result, no extra isEmpty job.
    val labels = ConnectedComponents.runAuto(edges)
    val idToKey = dict.select($"id_entity",
      concat($"entity_text_norm", lit("|"), $"entity_type").as("key"))
    labels.filter($"node" =!= $"comp")
      .join(idToKey.withColumnRenamed("id_entity", "node")
        .withColumnRenamed("key", "subj_key"), Seq("node"))
      .join(idToKey.withColumnRenamed("id_entity", "comp")
        .withColumnRenamed("key", "obj_key"), Seq("comp"))
      .select($"subj_key".as("subj"), lit(Pred.SameAs).as("pred"),
        $"obj_key".as("obj"), lit(1L).as("weight"))
  }

  def topicTriples(cleaned: DataFrame, params: Broadcast[TopicModelParams]): DataFrame = {
    val spark = cleaned.sparkSession
    import spark.implicits._
    TopicScorer.assignTopics(cleaned, params, textCol = "clean")
      .select($"url".as("subj"), lit(Pred.HasTopic).as("pred"),
        concat(lit("topic_"), $"id_topic").as("obj"), lit(1L).as("weight"))
  }

  /** Full run over a pages DataFrame; returns the complete triple set.
    * `aliases` may be empty (schema: norm_a, norm_b, entity_type).
    */
  def run(
      pages: DataFrame,
      trie: Broadcast[TokenTrie],
      params: Broadcast[TopicModelParams],
      aliases: Option[DataFrame] = None,
      cfg: Config = Config()): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val cleaned = withCleanText(pages)
      .select("url", "clean") // prune early: nothing downstream needs html
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (_, dict, mt) = mentionTriples(cleaned, trie, cfg)
    val tt = topicTriples(cleaned, params)
    val sa = aliases.map(a => sameAsTriples(dict, a)).getOrElse(
      Seq.empty[(String, String, String, Long)].toDF("subj", "pred", "obj", "weight"))
    val out = mt.unionByName(tt).unionByName(sa)
    out
  }

  /** Incremental run against a TripleStore: process only urls without a
    * committed `processedIn` lineage marker (J2 — the checkpoint/resume
    * primitive), then commit data triples + one marker per input page
    * atomically. A killed run leaves no manifest entry, so retrying
    * reprocesses exactly the uncommitted pages; a completed run is an
    * exact no-op on retry (including zero-mention pages, which the
    * reference's output-presence anti-join would re-run forever).
    * Returns number of triples committed (markers included).
    */
  def runIncremental(
      store: TripleStore,
      batchId: String,
      pages: DataFrame,
      trie: Broadcast[TokenTrie],
      params: Broadcast[TopicModelParams],
      cfg: Config = Config()): Long = {
    val todo = store.unprocessed(pages, Pred.Processed)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (todo.isEmpty) 0L
      else {
        val markers = todo.select(
          col("url").as("subj"), lit(Pred.Processed).as("pred"),
          lit(batchId).as("obj"), lit(1L).as("weight"))
        store.commit(batchId, run(todo, trie, params, None, cfg).unionByName(markers))
      }
    } finally todo.unpersist(blocking = false)
  }
}
