package graft.pipeline

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.canon.ConnectedComponents
import graft.functions.{Registry, Text}
import graft.link.EntityLink
import graft.ner.{FixtureGazetteer, NerExtractor, TokenTrie}
import graft.schema.{Mention, PageAnalysis, Pred, SurfaceCount, Triple}
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
      hotThreshold: Long = 100000L,
      /** Cache intermediate datasets (cleaned/mentions/dict). Caching
        * saves 2-3 recomputes of the narrow scalar work but serializes
        * every row through the block manager; when the whole pipeline
        * materializes as ONE job, concurrent branch stages contend on
        * cache writes and recompute racing partitions anyway. The narrow
        * work is ~30µs/page, so recomputing scales better than caching
        * at high parallelism — measured 4× faster at local[32].
        */
      cache: Boolean = false,
      /** Cache the COMPACT PageAnalysis (~100 B/page — unlike the raw
        * text, always worth caching when there are 2+ consumers). Callers
        * of the lazy [[run]] own the unpersist; [[runManaged]] and
        * [[runIncremental]] release it in a finally.
        */
      cacheAnalysis: Boolean = true)

  private def maybePersist[T](ds: org.apache.spark.sql.Dataset[T], on: Boolean) =
    if (on)
      ds.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else ds

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
    // per-article counts); caching is governed by cfg.cache — see Config.
    val mentions = maybePersist(NerExtractor.extractMentions(
      cleaned, trie, cfg.keepTypes, textCol = "clean"), cfg.cache)
    // the dictionary is consumed twice by canonicalization (edge build and
    // key render) and optionally by the salted link
    val dict = maybePersist(EntityLink.buildEntityDict(mentions).toDF(), cfg.cache)
    val perArticle = EntityLink.mentionsPerArticle(mentions)
    val linked =
      if (cfg.saltedLink)
        // prune the dict to the join key + id: its stats columns collide
        // with perArticle's entity_mentions_count (AMBIGUOUS_REFERENCE in
        // the select below) — same pruning as pageTriplesSalted. Hot keys
        // from the cached dict's own stats (hotKeysFromDict).
        EntityLink.linkSalted(
          perArticle.drop("id_entity"),
          dict.select(col("entity_text_norm"), col("entity_type"), col("id_entity")),
          cfg.saltFactor, cfg.hotThreshold,
          hotKeys = Some(EntityLink.hotKeysFromDict(dict, cfg.hotThreshold)))
      else perArticle // id already deterministic: xxhash64(norm, type)
    val mentionTriples = linked.select(
      $"url".as("subj"),
      lit(Pred.Mentions).as("pred"),
      concat($"entity_text_norm", lit("|"), $"entity_type").as("obj"),
      $"entity_mentions_count".cast("long").as("weight"),
      $"lang")
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
        $"obj_key".as("obj"), lit(1L).as("weight"),
        lit("und").as("lang")) // entity nodes are cross-language
  }

  def topicTriples(cleaned: DataFrame, params: Broadcast[TopicModelParams]): DataFrame = {
    val spark = cleaned.sparkSession
    import spark.implicits._
    // narrow scoring pass that carries lang through (no join back to pages)
    val langExpr =
      if (cleaned.columns.contains("lang")) col("lang") else lit("und")
    cleaned.select($"url", langExpr.as("lang"), $"clean")
      .as[(String, String, String)]
      .mapPartitions { it =>
        val p = params.value
        it.map { case (url, lang, text) =>
          val a = TopicScorer.score(p, url, if (text == null) "" else text)
          (url, Pred.HasTopic, s"topic_${a.id_topic}", 1L, lang)
        }
      }
      .toDF("subj", "pred", "obj", "weight", "lang")
  }

  /** THE fused narrow pass — the 100 TB-shaped core of the engine: ONE
    * scan of the pages table does html→text (with the byte-identity
    * check), clean_text, trie NER with in-page per-surface counting
    * (A3 is a within-page aggregation, so it is FREE here — no shuffle),
    * and topic scoring. Output is ~100 B/page, which is what downstream
    * consumers re-read; the 1-2 KB/page of html/text is touched exactly
    * once. Mention and hasTopic triples derive from this with ZERO
    * shuffles; only the entity dictionary (for canonicalization)
    * aggregates across pages — over these pre-reduced rows.
    */
  def analyze(
      pages: DataFrame,
      trie: Broadcast[TokenTrie],
      params: Broadcast[TopicModelParams],
      cfg: Config = Config()): Dataset[PageAnalysis] = {
    val spark = pages.sparkSession
    import spark.implicits._
    val langExpr =
      if (pages.columns.contains("lang")) col("lang") else lit("und")
    // html may arrive binary (the input_hint contract) or string (staged
    // text fixtures) — cast("binary") accepts both, matching HtmlToText's
    // binary-or-string contract on the staged path
    pages.select(col("url"), langExpr.as("lang"),
        col("html").cast("binary").as("html"), col("text"))
      .as[(String, String, Array[Byte], String)]
      .mapPartitions { it =>
        val t = trie.value
        val p = params.value
        val keep = cfg.keepTypes
        it.map { case (url, lang, html, text) =>
          // null html must not NPE the task — the staged path's HtmlToText
          // Expression is null-safe, and run ≡ runStaged is a pinned
          // contract
          val extracted = graft.functions.HtmlStripper.strip(
            if (html == null) ""
            else new String(html, java.nio.charset.StandardCharsets.UTF_8))
          // String-twin clean: skips the UTF8String encode/decode round
          // trips (2 full-text copies/page) the Column container costs —
          // char-identical to the CleanText expression (clean() delegates
          // to cleanString(); Column ≡ scalar stays fuzz-pinned)
          val clean = graft.functions.CleanTextImpl.cleanString(extracted)
          val counts =
            scala.collection.mutable.HashMap.empty[(String, String, String), Long]
          NerExtractor.detect(t, url, clean, keep, lang).foreach { m =>
            val k = (m.entity_text_norm, m.entity_type, m.entity_text)
            counts.update(k, counts.getOrElse(k, 0L) + 1L)
          }
          val surfaces = counts.iterator
            .map { case ((norm, tpe, surf), n) => SurfaceCount(norm, tpe, surf, n) }
            .toSeq
            .sortBy(s => (s.entity_text_norm, s.entity_type, s.entity_text))
          val a = TopicScorer.score(p, url, clean)
          PageAnalysis(url, lang, a.article_id, a.id_topic,
            extracted == text, surfaces)
        }
      }
  }

  /** Per-page surface rows from the compact analysis — the batch delta
    * the [[EntityStore]] merges and the dict builds from.
    */
  def surfaceRows(analyzed: Dataset[PageAnalysis]): DataFrame = {
    val spark = analyzed.sparkSession
    import spark.implicits._
    analyzed.flatMap { a =>
      a.surfaces.map(s =>
        (a.url, s.entity_text_norm, s.entity_type, s.entity_text, s.n))
    }.toDF("url", "entity_text_norm", "entity_type", "entity_text", "n")
  }

  /** Per-(url, entity) aggregated mention rows from the compact analysis —
    * the salted link's input shape, derived narrowly (no extra NER pass).
    */
  def perArticleFromAnalysis(analyzed: Dataset[PageAnalysis]): DataFrame = {
    val spark = analyzed.sparkSession
    import spark.implicits._
    analyzed.flatMap { a =>
      a.surfaces.groupBy(s => (s.entity_text_norm, s.entity_type))
        .toSeq.sortBy(_._1)
        .map { case ((norm, tpe), ss) =>
          (a.url, norm, tpe, ss.map(_.n).sum, a.lang)
        }
    }.toDF("url", "entity_text_norm", "entity_type",
      "entity_mentions_count", "lang")
  }

  /** [[pageTriples]]' mention rows via the SALTED dictionary join (J4's
    * skew-safe variant) over the SAME cached analysis — value-identical
    * output (q14 pins salted ≡ broadcast), for corpora whose hot entities
    * overwhelm a broadcast/plain shuffle join. Topic rows stay narrow.
    */
  def pageTriplesSalted(
      analyzed: Dataset[PageAnalysis],
      dict: DataFrame,
      cfg: Config): DataFrame = {
    val spark = analyzed.sparkSession
    import spark.implicits._
    // prune the dict to the join's needs (key + id): its stats columns
    // would collide with the per-article entity_mentions_count
    val dictKeys = dict.select(
      col("entity_text_norm"), col("entity_type"), col("id_entity"))
    // hot keys from the cached dict's own stats — the dominant share of
    // the salted path's +39% wall was re-aggregating them from the full
    // mention set (VERDICT r04 #1; see EntityLink.hotKeysFromDict)
    val linked = EntityLink.linkSalted(
      perArticleFromAnalysis(analyzed), dictKeys, cfg.saltFactor,
      cfg.hotThreshold,
      hotKeys = Some(EntityLink.hotKeysFromDict(dict, cfg.hotThreshold)))
    val mt = linked.select(
      $"url".as("subj"),
      lit(Pred.Mentions).as("pred"),
      concat($"entity_text_norm", lit("|"), $"entity_type").as("obj"),
      $"entity_mentions_count".cast("long").as("weight"),
      $"lang")
    val tt = analyzed.map(a =>
      (a.url, Pred.HasTopic, s"topic_${a.id_topic}", 1L, a.lang))
      .toDF("subj", "pred", "obj", "weight", "lang")
    tt.unionByName(mt)
  }

  /** Mention + hasTopic triples in ONE narrow pass over the compact
    * analysis — per page: one topic row + one row per distinct entity.
    */
  def pageTriples(analyzed: Dataset[PageAnalysis]): DataFrame = {
    val spark = analyzed.sparkSession
    import spark.implicits._
    analyzed.flatMap { a =>
      val byEntity = a.surfaces.groupBy(s => (s.entity_text_norm, s.entity_type))
      val mt = byEntity.toSeq.sortBy(_._1).map { case ((norm, tpe), ss) =>
        (a.url, Pred.Mentions, s"$norm|$tpe", ss.map(_.n).sum, a.lang)
      }
      (a.url, Pred.HasTopic, s"topic_${a.id_topic}", 1L, a.lang) +: mt
    }.toDF("subj", "pred", "obj", "weight", "lang")
  }

  /** Entity dictionary from the compact analysis — the analysis-aware
    * fast path of [[EntityLink.dictFromSurfaceRows]] (row-identical,
    * pinned by EntityLinkSpec). Because a PageAnalysis's surfaces are
    * in-page unique by construction, news_count needs NO url-level
    * distinct (the generic path shuffles ~3 string-rows/page for it —
    * measured 150+ executor-seconds at 8M pages): one flatMap emits the
    * surface rows plus one null-surface marker per (page, entity), and a
    * single dict-key shuffle with map-side combine aggregates both.
    */
  def dictFromAnalysis(analyzed: Dataset[PageAnalysis]): DataFrame = {
    val spark = analyzed.sparkSession
    import spark.implicits._
    val tagged = analyzed.flatMap { a =>
      val per = a.surfaces.iterator
        .map(s => (s.entity_text_norm, s.entity_type, s.entity_text, s.n))
      val marks = a.surfaces.iterator
        .map(s => (s.entity_text_norm, s.entity_type)).distinct
        .map { case (n, t) => (n, t, null: String, 1L) }
      (per ++ marks).toSeq
    }.toDF("entity_text_norm", "entity_type", "entity_text", "n")
    // ONE linear chain — no branch, no join (branching on the null tag
    // pushes the filters below the aggregate and defeats exchange reuse,
    // doubling the cache scan): agg1 totals per surface (marker rows
    // aggregate under null), agg2 folds surfaces into the dict row with
    // conditional aggregates; null-tag rows get the worst modal order.
    val agg = tagged
      .groupBy($"entity_text_norm", $"entity_type", $"entity_text")
      .agg(sum($"n").as("c"))
    agg
      .groupBy($"entity_text_norm", $"entity_type")
      .agg(
        min_by($"entity_text",
          struct(
            when($"entity_text".isNull, lit(Long.MaxValue)).otherwise(-$"c").as("nc"),
            coalesce($"entity_text", lit("￿")).as("t")))
          .as("entity_text"),
        sum(when($"entity_text".isNotNull, $"c").otherwise(0L))
          .as("entity_mentions_count"),
        sum(when($"entity_text".isNull, $"c").otherwise(0L))
          .as("news_count"))
      .select(
        graft.functions.Text.entityId($"entity_text_norm", $"entity_type").as("id_entity"),
        $"entity_text", $"entity_text_norm", $"entity_type",
        $"entity_mentions_count", $"news_count")
  }

  /** Triples from an already-analyzed Dataset. Callers that consume
    * `analyzed` more than once (this derives 1-2 passes) own its caching
    * lifecycle — see [[runManaged]]/[[runIncremental]]. `preparedDict`
    * lets a lifecycle-owning caller supply a CACHED dictionary: the
    * sameAs path otherwise re-aggregates the full analysis once per
    * dictionary consumer (edge build, key render ×2 — measured 4 extra
    * full-cache scans per run at 8M pages).
    */
  def triplesFromAnalysis(
      analyzed: Dataset[PageAnalysis],
      aliases: Option[DataFrame] = None,
      preparedDict: Option[DataFrame] = None,
      cfg: Config = Config()): DataFrame = {
    val spark = analyzed.sparkSession
    import spark.implicits._
    lazy val dict = preparedDict.getOrElse(
      EntityLink.dictFromSurfaceRows(surfaceRows(analyzed)).toDF())
    // the salted link rides the SAME compact analysis (no staged re-run —
    // VERDICT r02 #10); value-identical to the direct path, q14-pinned
    val pt =
      if (cfg.saltedLink) pageTriplesSalted(analyzed, dict, cfg)
      else pageTriples(analyzed)
    val sa = aliases.map(al => sameAsTriples(dict, al)).getOrElse(
      Seq.empty[(String, String, String, Long, String)]
        .toDF("subj", "pred", "obj", "weight", "lang"))
    pt.unionByName(sa)
  }

  /** Full run over a pages DataFrame; returns the complete triple set
    * (subj, pred, obj, weight, lang). `aliases` may be empty
    * (schema: norm_a, norm_b, entity_type).
    *
    * NOTE the result is lazy and (with cfg.cacheAnalysis) holds a cached
    * Dataset for the JVM's lifetime; prefer [[runManaged]] when the
    * caller materializes once — it unpersists in a finally AND
    * eager-materializes the caches in dependency order (a lazy plan over
    * an unfilled cache lets concurrent broadcast-exchange jobs recompute
    * the narrow pass for not-yet-cached partitions).
    */
  def run(
      pages: DataFrame,
      trie: Broadcast[TokenTrie],
      params: Broadcast[TopicModelParams],
      aliases: Option[DataFrame] = None,
      cfg: Config = Config()): DataFrame = {
    // the compact analysis is the ONLY thing worth caching: multiple
    // consumers, ~100 B/page. cfg.saltedLink routes the mention link
    // through the skew-safe salted join over this same cache (it no
    // longer bypasses the fused analyzer via runStaged — VERDICT r02 #10)
    val analyzed = maybePersist(analyze(pages, trie, params, cfg), cfg.cacheAnalysis)
    triplesFromAnalysis(analyzed, aliases, cfg = cfg)
  }

  /** [[run]] with owned cache lifecycle: persist the compact analysis,
    * hand the lazy triples to `use` (which must materialize them), then
    * unpersist — no JVM-lifetime cache leak.
    */
  def runManaged[T](
      pages: DataFrame,
      trie: Broadcast[TokenTrie],
      params: Broadcast[TopicModelParams],
      aliases: Option[DataFrame] = None,
      cfg: Config = Config())(use: DataFrame => T): T = {
    val analyzed = analyze(pages, trie, params, cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // EAGER materialization, in dependency order. Handing `use` a lazy
    // plan over unfilled caches lets its broadcast-exchange jobs run
    // CONCURRENTLY with the main job and recompute the analysis for
    // every not-yet-cached partition (measured: +297 executor-seconds of
    // duplicated work at 8M pages — the whole narrow pass again).
    analyzed.count()
    // the dictionary is corpus-aggregated but dictionary-SIZED (≪ data);
    // caching it spares the sameAs path's 3-4 consumers a full re-scan
    // of the analysis each
    val dict =
      if (aliases.nonEmpty || cfg.saltedLink) {
        // dictionary-SIZED cache; consumers: sameAs path (3-4 reads)
        // and/or the salted link join
        val d = dictFromAnalysis(analyzed)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        d.count()
        Some(d)
      } else None
    try use(triplesFromAnalysis(analyzed, aliases, preparedDict = dict, cfg = cfg))
    finally {
      dict.foreach(_.unpersist(blocking = false))
      analyzed.unpersist(blocking = false)
    }
  }

  /** The stage-composed variant (operators individually reusable /
    * testable; exercises the salted link join). Triple-set equal to the
    * fused [[run]] — pinned by PipelineSpec.
    */
  def runStaged(
      pages: DataFrame,
      trie: Broadcast[TokenTrie],
      params: Broadcast[TopicModelParams],
      aliases: Option[DataFrame] = None,
      cfg: Config = Config()): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    // same missing-lang fallback as analyze()/topicTriples() — the two
    // run() variants must accept the same input schemas
    val langExpr =
      (if (pages.columns.contains("lang")) col("lang") else lit("und")).as("lang")
    val cleaned = maybePersist(withCleanText(pages)
      .select(col("url"), langExpr, col("clean")), cfg.cache) // prune early: html not needed
    val (_, dict, mt) = mentionTriples(cleaned, trie, cfg)
    val tt = topicTriples(cleaned, params)
    val sa = aliases.map(a => sameAsTriples(dict, a)).getOrElse(
      Seq.empty[(String, String, String, Long, String)]
        .toDF("subj", "pred", "obj", "weight", "lang"))
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
      cfg: Config = Config(),
      entityStore: Option[EntityStore] = None,
      aliases: Option[DataFrame] = None): Long = {
    val todo = store.unprocessed(pages, Pred.Processed)
    val analyzed = analyze(todo, trie, params, cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // batch-dictionary cache, same lifecycle as runManaged's: the salted
    // link consumes the dict twice (hot-key scan + join build) and the
    // store-less sameAs path 3-4 times — without preparedDict each
    // consumer re-ran the FULL two-shuffle dictionary aggregation over
    // the analysis, once per micro-batch on the streaming path (the exact
    // regression preparedDict exists to prevent). Built lazily only for
    // the configs that consume it; dict.count() materializes the analyzed
    // cache in dependency order first (its aggregation scans every
    // partition), so no later broadcast-exchange job races a cold cache.
    val needDict = cfg.saltedLink || (aliases.nonEmpty && entityStore.isEmpty)
    val dict =
      if (needDict) {
        val d = dictFromAnalysis(analyzed)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        d.count()
        Some(d)
      } else None
    try {
      if (analyzed.isEmpty) 0L
      else {
        // MERGE the entity dictionary BEFORE committing triples+markers:
        // the pair is idempotent under kill-anywhere retry (markers absent
        // → retry recomputes the identical batch → merge() no-ops on the
        // recorded batch id → commit proceeds). Invariant: dictionary
        // state always covers at least the committed batches.
        entityStore.foreach(_.merge(batchId, surfaceRows(analyzed)))
        val markers = analyzed.toDF().select(
          col("url").as("subj"), lit(Pred.Processed).as("pred"),
          lit(batchId).as("obj"), lit(1L).as("weight"), col("lang"))
        // per-page triples come from THIS batch; sameAs edges are
        // CORPUS-level facts: derive them from the cumulative dictionary
        // when one exists (an edge whose two surface forms arrive in
        // different batches materializes as soon as both are known), and
        // anti-join against the already-committed sameAs partition so an
        // edge is committed exactly ONCE across batches (committing the
        // per-batch rebuild verbatim duplicated every recurring edge).
        val pageT = triplesFromAnalysis(analyzed, None, preparedDict = dict, cfg = cfg)
        val sa = aliases.map { al =>
          entityStore match {
            case Some(es) =>
              // CUMULATIVE dict (merged above → covers this batch): the
              // current canonicalization is authoritative, and a
              // component that MERGES across batches CHANGES its
              // canonical (the min entity id). Committing only the new
              // edges would leave the old canonical's edges alongside —
              // two canonical targets for one entity, diverging from a
              // batch run over the same corpus. So: RETRACT committed
              // edges no longer in the current set (COW delete of the
              // affected subjects' sameAs rows), then anti-join against
              // the post-delete store, which recommits every current
              // edge those subjects lost plus the genuinely new ones.
              // Kill-anywhere safe: a crash after the retraction finds
              // an identical current set on retry (merge() no-ops), no
              // stale edges, and the anti-join still recommits the
              // deleted-but-current rows. All frames are dict-scale; the
              // COW rewrite runs only when a component actually merged.
              val current = sameAsTriples(es.dict().toDF(), al)
              val stale = store.committedForPred(Pred.SameAs)
                .select(col("subj"), col("obj"))
                .join(current.select(col("subj"), col("obj")),
                  Seq("subj", "obj"), "left_anti")
                .select(col("subj")).distinct()
                .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
              try {
                if (!stale.isEmpty)
                  store.deleteScoped(col("pred") === Pred.SameAs, stale)
              } finally stale.unpersist(blocking = false)
              // committedForPred called AFTER the retraction: its batch
              // listing is eager, so the anti-join binds the post-delete
              // snapshot
              current.join(
                store.committedForPred(Pred.SameAs).select(col("subj"), col("obj")),
                Seq("subj", "obj"), "left_anti")
            case None =>
              // batch-local dict: an edge materializes only when both
              // endpoints appear in ONE batch, and no cumulative
              // canonicalization exists to retract against (documented
              // limitation of the store-less incremental mode)
              sameAsTriples(dict.get, al).join(
                store.committedForPred(Pred.SameAs).select(col("subj"), col("obj")),
                Seq("subj", "obj"), "left_anti")
          }
        }
        val triples = sa.foldLeft(pageT)(_ unionByName _)
        store.commit(batchId, triples.unionByName(markers))
      }
    } finally {
      dict.foreach(_.unpersist(blocking = false))
      analyzed.unpersist(blocking = false)
    }
  }

  /** Run-scoped incremental topic assignment (J1's `id_run` dimension —
    * reference `topics_detector/db_io.py:389-413`, job
    * `jobs/topics_detector_inference_job.py:18-72`): assign topics only
    * to pages with no `processedIn:<idRun>` marker, so activating a NEW
    * model run re-assigns every page exactly once while an old run's
    * assignments stay committed and queryable (PK `(id_news, id_run)`,
    * `db/schema.sql:106-119`).
    *
    * `assign` maps (url, lang, clean) → (url, lang, id_topic) — pass
    * [[modelAssign]] for real model scoring; tests pass SQL-expressible
    * functions so the scoping semantics get a DuckDB oracle.
    */
  def assignTopicsIncremental(
      store: TripleStore,
      batchId: String,
      idRun: String,
      pagesWithClean: DataFrame,
      assign: DataFrame => DataFrame): Long = {
    val todo = store.unprocessed(pagesWithClean, Pred.processedFor(idRun))
    val langExpr =
      (if (todo.columns.contains("lang")) col("lang") else lit("und")).as("lang")
    val input = todo.select(col("url"), langExpr, col("clean"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (input.isEmpty) 0L
      else {
        val topicT = assign(input).select(
          col("url").as("subj"), lit(Pred.hasTopicFor(idRun)).as("pred"),
          concat(lit("topic_"), col("id_topic").cast("string")).as("obj"),
          lit(1L).as("weight"), col("lang"))
        val markers = input.select(
          col("url").as("subj"), lit(Pred.processedFor(idRun)).as("pred"),
          lit(batchId).as("obj"), lit(1L).as("weight"), col("lang"))
        store.commit(batchId, topicT.unionByName(markers))
      }
    } finally input.unpersist(blocking = false)
  }

  /** Model-backed `assign` for [[assignTopicsIncremental]]. */
  def modelAssign(params: Broadcast[TopicModelParams])(input: DataFrame): DataFrame = {
    val spark = input.sparkSession
    import spark.implicits._
    input.select($"url", $"lang", $"clean")
      .as[(String, String, String)]
      .mapPartitions { it =>
        val p = params.value
        it.map { case (url, lang, text) =>
          (url, lang, TopicScorer.score(p, url, if (text == null) "" else text).id_topic)
        }
      }.toDF("url", "lang", "id_topic")
  }

  /** Overwrite mode for one run (reference
    * `jobs/topics_detector_inference_job.py:18-72`: scoped DELETE → full
    * recompute): drop the run's assignments + markers for the given pages
    * (a semi-join scope, `db_io.py:334-345`), then re-assign them
    * incrementally. Pages OUTSIDE the scope keep their old assignments.
    */
  def overwriteTopics(
      store: TripleStore,
      batchId: String,
      idRun: String,
      pagesWithClean: DataFrame,
      assign: DataFrame => DataFrame): Long = {
    val scope = pagesWithClean.select(col("url").as("subj"))
    store.deleteScoped(
      col("pred").isin(Pred.hasTopicFor(idRun), Pred.processedFor(idRun)), scope)
    assignTopicsIncremental(store, batchId, idRun, pagesWithClean, assign)
  }
}
