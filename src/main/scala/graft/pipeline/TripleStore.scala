package graft.pipeline

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-committed triple store over parquet.
  *
  * Production target is an Iceberg table (atomic snapshot commits,
  * partition spec `(lang, bucket(N, url_hash))` — SURVEY.md §1.4); the
  * Iceberg runtime is not on this sandbox's classpath, so the same
  * SEMANTICS are provided with parquet + a manifest directory:
  *
  *   - each batch writes to `data/batch=<id>/` then appends one line to
  *     `_manifest/<id>.commit` via atomic rename — readers only see fully
  *     committed batches (a killed job leaves a dangling data dir that is
  *     invisible and overwritten on retry);
  *   - `committed()` reads ONLY manifested batches → the anti-join resume
  *     (J1/J2) reprocesses exactly the uncommitted urls;
  *   - per-batch lineage + row metrics live in the manifest line
  *     (north rule: per-partition lineage + metrics).
  */
final class TripleStore(val root: String, spark: SparkSession) {

  private def manifestDir: Path = Paths.get(root, "_manifest")
  private def dataDir(batch: String): String = s"$root/data/batch=$batch"

  Files.createDirectories(manifestDir)

  def committedBatches(): Seq[String] =
    Files.list(manifestDir).toArray.toSeq.map(_.toString)
      .map(p => Paths.get(p).getFileName.toString)
      .filter(_.endsWith(".commit")).map(_.stripSuffix(".commit")).sorted

  /** Atomically commit one batch of triples. The manifest line carries
    * per-partition lineage + metrics (north rule): one (file, rows) entry
    * per task output file, plus per-predicate row counts.
    * Returns total row count.
    */
  /** Hash-bucket count for the url-hash partition dimension (north_star:
    * triples "partitioned by lang and url-hash"). 16 buckets × languages
    * at test scale; a production Iceberg spec would use bucket(256, url).
    */
  val urlBuckets = 16

  def commit(batch: String, triples: DataFrame): Long = {
    val dir = dataDir(batch)
    val withPartCols = triples
      .withColumn("lang",
        if (triples.columns.contains("lang")) coalesce(col("lang"), lit("und"))
        else lit("und"))
      .withColumn("bucket", pmod(xxhash64(col("subj")), lit(urlBuckets)))
    withPartCols.write.mode(SaveMode.Overwrite)
      .partitionBy("lang", "bucket")
      .parquet(dir)
    val written = spark.read.parquet(dir)
    val perPart = written
      .groupBy(input_file_name().as("file")).count()
      .collect()
      .map(r => s"""{"file":"${r.getString(0).replace("\"", "")}","rows":${r.getLong(1)}}""")
      .sorted
    val perPred = written.groupBy(col("pred")).count().collect()
      .map(r => s""""${r.getString(0)}":${r.getLong(1)}""").sorted
    val n = perPart.length match {
      case 0 => 0L
      case _ => written.count()
    }
    val tmp = manifestDir.resolve(s"$batch.tmp")
    val fin = manifestDir.resolve(s"$batch.commit")
    Files.writeString(tmp,
      s"""{"batch":"$batch","rows":$n,"path":"$dir",""" +
        s""""preds":${perPred.mkString("{", ",", "}")},""" +
        s""""partitions":${perPart.mkString("[", ",", "]")}}""" + "\n")
    Files.move(tmp, fin, StandardCopyOption.ATOMIC_MOVE)
    n
  }

  /** All committed triples (subj, pred, obj, weight, lang, bucket, batch —
    * the last three are partition columns usable for pruning: a reader
    * filtering on lang or url-bucket scans only matching directories).
    */
  def committed(): DataFrame = {
    val batches = committedBatches()
    if (batches.isEmpty) {
      import spark.implicits._
      Seq.empty[(String, String, String, Long)]
        .toDF("subj", "pred", "obj", "weight")
    } else {
      spark.read
        .option("basePath", s"$root/data")
        .parquet(batches.map(dataDir): _*)
    }
  }

  /** The incremental anti-join (J1/J2): pages whose url has NO committed
    * triple with `pred` — Spark's first-class left_anti replaces the
    * reference's LEFT-JOIN-IS-NULL (`ner_extractor/db_io.py:37-55`).
    */
  def unprocessed(pages: DataFrame, pred: String, urlCol: String = "url"): DataFrame = {
    val done = committed().filter(col("pred") === pred)
      .select(col("subj").as(urlCol)).distinct()
    pages.join(done, Seq(urlCol), "left_anti")
  }

  /** Predicated delete (S7) — the reference's `overwrite` mode support:
    * drop all batches' rows matching the predicate by rewriting committed
    * data (copy-on-write, like Iceberg DELETE FROM).
    */
  def deleteWhere(condition: org.apache.spark.sql.Column): Unit = {
    val remaining = committed().filter(!condition)
      .drop("batch", "bucket") // re-derived on commit
    val batches = committedBatches()
    val staged = s"$root/data_staged"
    remaining.write.mode(SaveMode.Overwrite).parquet(staged)
    batches.foreach { b =>
      Files.delete(manifestDir.resolve(s"$b.commit"))
    }
    val reborn = spark.read.parquet(staged)
    commit("00000-rewrite", reborn)
  }
}
