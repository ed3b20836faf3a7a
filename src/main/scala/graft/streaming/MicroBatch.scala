package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.Trigger

/** Deterministic micro-batch feed semantics (the reference's simulated
  * ingestion, `src/news_nlp/ingestion/simulated_ingestion.py:49-82`),
  * plus optional Structured Streaming sugar — the reference's semantics
  * are fundamentally micro-batch (SURVEY.md §2.8).
  */
object MicroBatch {

  /** P12 slice math — exact port:
    *   batch_size = max(1, ceil(total * fraction))
    *   num_batches = ceil(total / batch_size)
    *   eff = if loop then runIndex % num_batches else runIndex
    *   slice = [eff * batch_size, min(start + batch_size, total))
    * Returns (startRow, endRow) — endRow exclusive; (0,0) when exhausted.
    */
  def sliceBounds(total: Long, fraction: Double, runIndex: Long, loop: Boolean): (Long, Long) = {
    require(fraction > 0.0 && fraction <= 1.0, "fraction_per_run must be in (0, 1]")
    if (total == 0 || runIndex < 0) return (0L, 0L)
    val batchSize = math.max(1L, math.ceil(total * fraction).toLong)
    val numBatches = math.ceil(total.toDouble / batchSize).toLong
    val eff = if (loop) runIndex % numBatches else runIndex
    val start = eff * batchSize
    if (!loop && start >= total) (0L, 0L)
    else (start, math.min(start + batchSize, total))
  }

  /** runIndex from timestamps: floor(Δseconds / period)
    * (`simulated_ingestion.py:49-53`).
    */
  def runIndex(startEpochSec: Long, nowEpochSec: Long, periodSeconds: Long): Long =
    math.floor((nowEpochSec - startEpochSec).toDouble / periodSeconds).toLong

  /** Distributed slice selector: deterministic global order (orderCol must
    * be unique), row_number window, range filter. The window is a single
    * global sort — acceptable because feed slices are tiny by construction
    * (fraction ≪ 1); at scale the input would be pre-sorted/bucketed on
    * orderCol and this becomes a metadata-only range scan.
    */
  def slice(df: DataFrame, orderCol: String, fraction: Double, runIdx: Long, loop: Boolean): DataFrame = {
    val total = df.count()
    val (start, end) = sliceBounds(total, fraction, runIdx, loop)
    if (start == end) df.limit(0)
    else df
      .withColumn("_rn", row_number().over(Window.orderBy(col(orderCol))).cast("long") - 1)
      .filter(col("_rn") >= start && col("_rn") < end)
      .drop("_rn")
  }

  /** Structured Streaming ingestion of a parquet directory with
    * Trigger.AvailableNow into an in-memory sink; returns the result table.
    * Used to evidence that the batch windowed aggregation and the
    * streaming one produce identical results on the same data.
    */
  def streamHourlyEventAgg(spark: SparkSession, parquetPath: String, queryName: String): DataFrame = {
    val schema = spark.read.parquet(parquetPath).schema
    // the streaming file source requires a DIRECTORY; stage the single
    // parquet file into a temp dir (zero-copy irrelevant at demo scale)
    val src = java.nio.file.Paths.get(parquetPath)
    val dir = {
      if (java.nio.file.Files.isDirectory(src)) src
      else {
        val d = java.nio.file.Files.createTempDirectory("graft_stream_")
        java.nio.file.Files.copy(src, d.resolve("part-00000.parquet"))
        d
      }
    }
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
      // parquet stores TIMESTAMP_NTZ; watermarks require TIMESTAMP (session
      // TZ is pinned UTC, so the cast is value-preserving vs the oracle)
      .withColumn("ts", col("ts").cast("timestamp"))
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), round(col("sum_value"), 2).as("sum_value"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
