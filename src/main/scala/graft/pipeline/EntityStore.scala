package graft.pipeline

import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.link.EntityLink
import graft.schema.EntityRecord

/** Persistent entity dictionary with cross-batch MERGE — the Spark
  * re-expression of the reference's `entities` table maintenance
  * (`src/news_nlp/ner_extractor/db_io.py:64-94` insert of new entities,
  * `:97-121` mapping rebuild; job wiring
  * `jobs/ner_extractor_inference_job.py:67-83`), with the SURVEY §2.9 #1
  * fix: deterministic `id_entity = xxhash64(norm, type)` + additive MERGE
  * instead of BIGSERIAL ids + driver-side dict rebuild.
  *
  * State is kept at SURFACE granularity, because that is the finest thing
  * the merge must be associative over:
  *   - `surfaces`: (entity_text_norm, entity_type, entity_text,
  *     surface_count) — summed across batches; the modal surface form (A2)
  *     is DERIVED at read time, so late batches can flip the modal form
  *     exactly as a full recompute would.
  *   - `news`: (entity_text_norm, entity_type, news_count) — summed across
  *     batches. Additivity is EXACT (not approximate) because incremental
  *     batches are url-disjoint by construction: `runIncremental`'s
  *     anti-join on `processedIn` markers guarantees each url contributes
  *     to exactly one merged batch.
  *
  * Scale shape (MERGE cost ∝ batch, not ∝ dictionary): state is
  * hash-bucketed on `entity_text_norm` ([[EntityStore.dictBuckets]] dirs,
  * a Hive partition column, so reads prune). A merge
  *   1. buckets the batch delta,
  *   2. re-aggregates ONLY the dirty buckets (partition-pruned read of
  *      current ∪ delta, one dict-key shuffle),
  *   3. HARD-LINKS every clean bucket's files from the previous version
  *      (metadata-only; copy fallback for cross-device),
  *   4. atomically renames the `_latest` pointer.
  * This is Iceberg MERGE-on-read-free copy-on-write bounded to dirty
  * partitions — the same shape `TripleStore.deleteWhere` uses.
  *
  * Concurrency/crash model (single writer, like the TripleStore): merged
  * batch ids are recorded IN the version, so a retried merge of an
  * already-merged batch is a no-op — `runIncremental` orders (merge dict)
  * BEFORE (commit triples+markers), which makes the pair idempotent under
  * kill-anywhere retry:
  *   - crash before merge: nothing happened;
  *   - crash between merge and triple-commit: markers absent → retry
  *     recomputes the identical batch (same anti-join input) → merge sees
  *     the batch id → skips → commit proceeds;
  *   - crash mid-merge (version dir written, pointer not swapped): the
  *     retry overwrites the same version dir and swaps.
  *
  * Version GC: after each pointer swap, version dirs older than
  * `retainVersions` are deleted — a stream merging one batch per
  * micro-batch forever keeps O(retainVersions) dirs, not O(batches).
  * Hard-linked clean-bucket files survive through the newer versions'
  * links (deleting an old dir only unlinks).
  *
  * READER CONTRACT: a lazy `dict()`/`surfaces()` plan binds the version
  * current at CALL time and stays readable only while that version
  * survives — i.e. for the next `retainVersions - 1` merges. Materialize
  * (collect/write/cache+count) promptly, or raise `retainVersions` to
  * cover the longest reader window; a pruned-underneath reader fails
  * loudly (FileNotFoundException), never silently wrong.
  */
final class EntityStore(val root: String, spark: SparkSession,
    retainVersions: Int = 2,
    /** How many of the most recent merged batch ids each version
      * remembers — the REPLAY-IDEMPOTENCE WINDOW. A replayed merge of a
      * batch inside the window is a no-op; older ids are forgotten, so
      * an orchestrator must never replay a batch more than
      * `batchHistory` merges old (runIncremental callers are safe: a
      * completed batch has `processedIn` markers and is never replayed
      * at all — only in-flight retries re-enter merge, always within a
      * few versions). Bounding the history keeps the per-merge
      * `_batches` read/rewrite O(window), not O(stream lifetime).
      */
    batchHistory: Int = 100000) {
  require(retainVersions >= 1, "retainVersions must be >= 1")
  require(batchHistory >= 1, "batchHistory must be >= 1")

  import spark.implicits._
  import EntityStore.dictBuckets

  /** Version/pointer I/O through the Hadoop FileSystem API
    * ([[graft.util.StoreFs]]): the store root may be file://, hdfs://,
    * etc. — the clean-bucket forward keeps its hard-link fast path on
    * the local scheme and degrades to a FileSystem copy elsewhere.
    */
  private val sfs = new graft.util.StoreFs(root, spark.sessionState.newHadoopConf())

  sfs.mkdirs(sfs.rootPath)

  private def latestPtr: HPath = sfs.path("_latest")
  private def versionDir(v: Long): HPath = sfs.path(s"v=$v")

  private def currentVersion(): Long =
    if (sfs.exists(latestPtr)) sfs.readString(latestPtr).trim.toLong else 0L

  /** Batch ids remembered by the current version, NEWEST FIRST (the
    * `batchHistory` window — see the constructor param).
    */
  private def mergedBatchesOrdered(): Seq[String] = {
    val v = currentVersion()
    if (v == 0L) Seq.empty
    else sfs.readString(new HPath(versionDir(v), "_batches"))
      .split("\n").iterator.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Batch ids already merged, within the replay window. */
  def mergedBatches(): Set[String] = mergedBatchesOrdered().toSet

  private def table(v: Long, name: String, schemaDDL: String): DataFrame = {
    val dir = new HPath(versionDir(v), name)
    if (v == 0L || !sfs.exists(dir))
      graft.util.Frames.empty(spark, schemaDDL)
    else spark.read
      .schema(org.apache.spark.sql.types.StructType.fromDDL(schemaDDL))
      .parquet(dir.toString)
  }

  private val surfacesDDL =
    "entity_text_norm STRING, entity_type STRING, entity_text STRING, surface_count BIGINT, bucket INT"
  private val newsDDL =
    "entity_text_norm STRING, entity_type STRING, news_count BIGINT, bucket INT"

  /** Current surface-granularity state (bucket column dropped). */
  def surfaces(): DataFrame =
    table(currentVersion(), "surfaces", surfacesDDL).drop("bucket")

  private def news(): DataFrame =
    table(currentVersion(), "news", newsDDL).drop("bucket")

  private def withBucket(df: DataFrame): DataFrame =
    df.withColumn("bucket",
      pmod(xxhash64($"entity_text_norm"), lit(dictBuckets)).cast("int"))

  /** MERGE one batch of per-page surface rows
    * (url, entity_text_norm, entity_type, entity_text, n) into the store.
    * Returns false (no-op) if `batchId` was already merged.
    */
  def merge(batchId: String, surfaceRows: DataFrame): Boolean = {
    val alreadyOrdered = mergedBatchesOrdered()
    if (alreadyOrdered.contains(batchId)) return false
    val v = currentVersion()
    val batchSurf = withBucket(surfaceRows
      .groupBy($"entity_text_norm", $"entity_type", $"entity_text")
      .agg(sum($"n").as("surface_count")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val batchNews = withBucket(surfaceRows
        .select($"entity_text_norm", $"entity_type", $"url").distinct()
        .groupBy($"entity_text_norm", $"entity_type")
        .agg(count(lit(1)).as("news_count")))
      // dirty buckets: only these are re-aggregated and rewritten; the
      // dict-key shuffle is over (current-dirty ∪ delta), not the corpus
      val dirty = batchSurf.select($"bucket").distinct()
        .as[Int].collect().sorted
      val next = v + 1L
      val nextDir = versionDir(next)
      if (sfs.exists(nextDir)) sfs.delete(nextDir, recursive = true) // crashed retry
      val mergedSurf = table(v, "surfaces", surfacesDDL)
        .filter($"bucket".isin(dirty.map(Int.box): _*)) // partition-pruned
        .unionByName(batchSurf)
        .groupBy($"entity_text_norm", $"entity_type", $"entity_text", $"bucket")
        .agg(sum($"surface_count").as("surface_count"))
      val mergedNews = table(v, "news", newsDDL)
        .filter($"bucket".isin(dirty.map(Int.box): _*))
        .unionByName(batchNews)
        .groupBy($"entity_text_norm", $"entity_type", $"bucket")
        .agg(sum($"news_count").as("news_count"))
      writeBuckets(mergedSurf, new HPath(nextDir, "surfaces"))
      writeBuckets(mergedNews, new HPath(nextDir, "news"))
      // clean buckets ride forward as hard links (local) / copies (remote)
      linkCleanBuckets(v, nextDir, "surfaces", dirty.toSet)
      linkCleanBuckets(v, nextDir, "news", dirty.toSet)
      // newest-first, truncated to the replay window (constructor doc)
      sfs.writeString(new HPath(nextDir, "_batches"),
        (batchId +: alreadyOrdered).take(batchHistory)
          .mkString("", "\n", "\n"))
      sfs.writeStringAtomic(latestPtr, next.toString,
        tmpName = s"_latest.tmp$next")
      pruneVersions(next)
      true
    } finally batchSurf.unpersist(blocking = false)
  }

  /** Delete version dirs older than `retainVersions` behind `current`.
    * Crash-safe: only already-superseded snapshots are touched; a retry
    * just re-prunes. LISTS the actual `v=*` dirs instead of walking
    * downward from the cutoff — a walk that stops at the first missing
    * dir would strand anything below a gap (crash between two deletes)
    * unreachable by GC forever.
    */
  private def pruneVersions(current: Long): Unit =
    sfs.listNames(sfs.rootPath)
      .filter(_.startsWith("v="))
      .flatMap(n => scala.util.Try(n.stripPrefix("v=").toLong).toOption)
      .filter(v => v >= 1L && v <= current - retainVersions)
      .foreach(v => sfs.delete(versionDir(v), recursive = true))

  private def writeBuckets(df: DataFrame, dir: HPath): Unit =
    df.repartition($"bucket") // one file per bucket dir
      .write.mode(SaveMode.Overwrite).partitionBy("bucket")
      .parquet(dir.toString)

  private def linkCleanBuckets(
      prevVersion: Long, nextDir: HPath, name: String, dirty: Set[Int]): Unit = {
    if (prevVersion == 0L) return
    val prev = new HPath(versionDir(prevVersion), name)
    if (!sfs.exists(prev)) return
    sfs.listNames(prev).foreach { dn =>
      if (dn.startsWith("bucket=") &&
          !dirty.contains(dn.stripPrefix("bucket=").toInt)) {
        val src = new HPath(prev, dn)
        val target = new HPath(new HPath(nextDir, name), dn)
        sfs.mkdirs(target)
        sfs.listNames(src).foreach { fn =>
          sfs.linkOrCopy(new HPath(src, fn), new HPath(target, fn))
        }
      }
    }
  }

  /** The queryable entity dictionary (≙ reference `entities` table,
    * `db/schema.sql:130-138`): deterministic id, DERIVED modal surface
    * form (A2 tie-break: count DESC, text ASC), merged counts.
    */
  def dict(): Dataset[EntityRecord] =
    EntityLink.dictFromStats(surfaces(), news())
}

object EntityStore {
  /** Hash-bucket count for the dictionary partition dimension. 32 at
    * test scale; a production store would use 256-4096 so a typical
    * batch dirties a fraction of the dictionary.
    */
  val dictBuckets = 32
}
