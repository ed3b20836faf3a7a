package graft.pipeline

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

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
  * Concurrency/crash model (single writer, like the TripleStore): each
  * merge writes a full new version directory, then atomically renames the
  * `_latest` pointer. Merged batch ids are recorded IN the version, so a
  * retried merge of an already-merged batch is a no-op — `runIncremental`
  * orders (merge dict) BEFORE (commit triples+markers), which makes the
  * pair idempotent under kill-anywhere retry:
  *   - crash before merge: nothing happened;
  *   - crash between merge and triple-commit: markers absent → retry
  *     recomputes the identical batch (same anti-join input) → merge sees
  *     the batch id → skips → commit proceeds;
  *   - crash mid-merge (version dir written, pointer not swapped): the
  *     retry overwrites the same version dir and swaps.
  *
  * Scale shape: a merge rewrites dictionary-sized state (≪ corpus — the
  * reference's full dict is ~10⁵ rows for 10⁵ articles), unioned with the
  * batch delta and re-aggregated in ONE shuffle on (norm, type[, surface]).
  * At 10⁹+ entities this is Iceberg MERGE copy-on-write; partitioning the
  * version by hash-bucket(norm) would bound each rewrite to dirty buckets.
  */
final class EntityStore(val root: String, spark: SparkSession) {

  import spark.implicits._

  Files.createDirectories(Paths.get(root))

  private def latestPtr = Paths.get(root, "_latest")
  private def versionDir(v: Long): String = s"$root/v=$v"

  private def currentVersion(): Long =
    if (Files.exists(latestPtr)) Files.readString(latestPtr).trim.toLong else 0L

  /** Batch ids already merged into the current version. */
  def mergedBatches(): Set[String] = {
    val v = currentVersion()
    if (v == 0L) Set.empty
    else Files.readAllLines(Paths.get(versionDir(v), "_batches"))
      .asScala.filter(_.nonEmpty).toSet
  }

  /** Current surface-granularity state. */
  def surfaces(): DataFrame = {
    val v = currentVersion()
    if (v == 0L)
      Seq.empty[(String, String, String, Long)]
        .toDF("entity_text_norm", "entity_type", "entity_text", "surface_count")
    else spark.read.parquet(s"${versionDir(v)}/surfaces")
  }

  private def news(): DataFrame = {
    val v = currentVersion()
    if (v == 0L)
      Seq.empty[(String, String, Long)]
        .toDF("entity_text_norm", "entity_type", "news_count")
    else spark.read.parquet(s"${versionDir(v)}/news")
  }

  /** MERGE one batch of per-page surface rows
    * (url, entity_text_norm, entity_type, entity_text, n) into the store.
    * Returns false (no-op) if `batchId` was already merged.
    */
  def merge(batchId: String, surfaceRows: DataFrame): Boolean = {
    val already = mergedBatches()
    if (already.contains(batchId)) return false
    val batchSurf = surfaceRows
      .groupBy($"entity_text_norm", $"entity_type", $"entity_text")
      .agg(sum($"n").as("surface_count"))
    val batchNews = surfaceRows
      .select($"entity_text_norm", $"entity_type", $"url").distinct()
      .groupBy($"entity_text_norm", $"entity_type")
      .agg(count(lit(1)).as("news_count"))
    val mergedSurf = surfaces().unionByName(batchSurf)
      .groupBy($"entity_text_norm", $"entity_type", $"entity_text")
      .agg(sum($"surface_count").as("surface_count"))
    val mergedNews = news().unionByName(batchNews)
      .groupBy($"entity_text_norm", $"entity_type")
      .agg(sum($"news_count").as("news_count"))
    val next = currentVersion() + 1L
    mergedSurf.write.mode(SaveMode.Overwrite).parquet(s"${versionDir(next)}/surfaces")
    mergedNews.write.mode(SaveMode.Overwrite).parquet(s"${versionDir(next)}/news")
    Files.write(Paths.get(versionDir(next), "_batches"),
      (already + batchId).toSeq.sorted.asJava)
    val tmp = Paths.get(root, s"_latest.tmp$next")
    Files.writeString(tmp, next.toString)
    Files.move(tmp, latestPtr, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    true
  }

  /** The queryable entity dictionary (≙ reference `entities` table,
    * `db/schema.sql:130-138`): deterministic id, DERIVED modal surface
    * form (A2 tie-break: count DESC, text ASC), merged counts.
    */
  def dict(): Dataset[EntityRecord] =
    EntityLink.dictFromStats(surfaces(), news())
}
