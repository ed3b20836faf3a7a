package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming first-seen-only pass-through: emit each key's FIRST row ever
  * (across all micro-batches), drop every later occurrence — the
  * Structured-Streaming analogue of the incremental anti-join (J2,
  * reference `ner_extractor/db_io.py:37-55`): "process a url once".
  *
  * State is one boolean per key in the state store (RocksDB/HDFS-backed
  * on a cluster), checkpointed with the query — a killed stream resumes
  * with its dedup memory intact, which is exactly the kill/resume
  * contract of the batch TripleStore path.
  *
  * Scale: state is partitioned by key hash across executors; an optional
  * TTL (processing-time timeout) bounds state size for unbounded key
  * spaces (set `ttlMs` > 0 — expired keys may be re-emitted, the standard
  * watermark-style tradeoff).
  */
object StreamingDedup {

  def firstSeen[V](
      ds: Dataset[(String, V)],
      ttlMs: Long = 0L)(implicit
      ev: Encoder[V],
      etup: Encoder[(String, V)]): Dataset[(String, V)] = {
    import org.apache.spark.sql.Encoders
    implicit val stateEnc: Encoder[Boolean] = Encoders.scalaBoolean
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    val timeout =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (String, V)](
        OutputMode.Append(), timeout) {
        (key: String, rows: Iterator[(String, V)], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            Iterator.empty // key seen in an earlier batch
          } else {
            state.update(true)
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            rows.take(1).map { case (_, v) => (key, v) }
          }
      }
  }

  /** First-seen pass-through that emits each key's MIN value within the
    * first micro-batch that contains the key — the [[firstSeen]] contract
    * specialized to ordered values so that a trigger may carry SEVERAL
    * chronological input files and stay value-deterministic:
    * `rows.take(1)` picks an arbitrary row when a batch mixes buckets,
    * `rows.min` does not. With chronologically-staged input (earlier
    * buckets never arrive in later triggers), the first batch containing
    * a key contains its earliest bucket, so the emitted value is exactly
    * the key's global min — independent of how many files each trigger
    * absorbs. That turns `maxFilesPerTrigger` into a pure
    * throughput/latency knob (optimization guide §1: per-trigger fixed
    * costs — offset log, state-store commit, checkpoint — amortize over
    * the batch) instead of a correctness requirement.
    */
  def firstSeenMin[V: Ordering](
      ds: Dataset[(String, V)])(implicit
      ev: Encoder[V],
      etup: Encoder[(String, V)]): Dataset[(String, V)] = {
    import org.apache.spark.sql.Encoders
    implicit val stateEnc: Encoder[Boolean] = Encoders.scalaBoolean
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (String, V)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, V)], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty // key seen in an earlier batch
          else {
            state.update(true)
            Iterator.single(key -> rows.map(_._2).min)
          }
      }
  }

  /** Deterministic end-to-end first-seen run over a parquet events
    * table, oracle-expressible as `GROUP BY user_id → min(bucket)`.
    *
    * Events are staged one file per coarse time bucket
    * (`floor(epoch(ts) / bucketSeconds)`), file mtimes strictly increase
    * in bucket order, and the file source processes oldest-mtime first —
    * micro-batches arrive in chronological bucket order and the emitted
    * value per key is exactly `min(bucket)` ([[firstSeenMin]]). This is
    * the J2 "process a url once" contract made observable: which batch
    * first saw the key.
    *
    * Scale: the per-bucket staging loop is bounded by time-span /
    * bucketSeconds (independent of row count); a production deployment
    * reads an already-time-partitioned stream and skips staging entirely.
    */
  def streamFirstSeenBucket(
      spark: SparkSession,
      parquetPath: String,
      queryName: String,
      scratchDir: String,
      bucketSeconds: Long = 604800L): DataFrame =
    streamFirstSeenStaged(spark,
      stageFirstSeenInput(spark, parquetPath, scratchDir, bucketSeconds),
      queryName)

  /** Staging half of [[streamFirstSeenBucket]]: one parquet file per
    * coarse time bucket via [[StreamStage.stageChronological]]. Fixture
    * prep, not the measured operator — callers that time the streaming
    * half (Bench) stage this untimed, same as the ANN index builds.
    * Returns the stream input dir.
    */
  def stageFirstSeenInput(
      spark: SparkSession,
      parquetPath: String,
      scratchDir: String,
      bucketSeconds: Long = 604800L): String = {
    import spark.implicits._
    // rows with NULL ts carry no event time and are DROPPED (an oracle
    // restating this run must add WHERE ts IS NOT NULL — min() skipping
    // NULLs still EMITS a group whose every ts is NULL, this does not)
    val ev = spark.read.parquet(parquetPath)
      .select(col("user_id").cast("long").as("user_id"),
        // session TZ pinned UTC: the NTZ→TZ cast is value-preserving
        floor(unix_timestamp(col("ts").cast("timestamp")) / bucketSeconds)
          .cast("long").as("bucket"))
      .filter(col("bucket").isNotNull)
      .persist() // one source scan; the per-bucket loop reads the cache
    val base = java.nio.file.Paths.get(scratchDir)
    val streamDir = base.resolve("stream")
    try {
      val buckets = ev.select(col("bucket")).distinct()
        .orderBy(col("bucket")).as[Long].collect()
      StreamStage.stageChronological(
        buckets.toSeq.map(b => ev.filter(col("bucket") === b)),
        streamDir, base, "events")
    } finally ev.unpersist()
    streamDir.toString
  }

  /** Streaming half of [[streamFirstSeenBucket]] over an already-staged
    * input dir ([[stageFirstSeenInput]]).
    */
  def streamFirstSeenStaged(
      spark: SparkSession,
      streamDir: String,
      queryName: String): DataFrame = {
    import spark.implicits._
    // maxFilesPerTrigger=4: a throughput knob, not a correctness one —
    // firstSeenMin keeps the emitted value ≡ min(bucket) whatever the
    // trigger grouping (see its doc). One-file triggers paid ~20 trigger
    // fixed costs (offset log + state commit + checkpoint each) for this
    // table's week count; 4 keeps several CROSS-batch state lookups in
    // play (the thing the operator demonstrates) at a quarter the cost.
    val stream = spark.readStream
      .schema(StructType.fromDDL("user_id BIGINT, bucket BIGINT"))
      .option("maxFilesPerTrigger", "4")
      .parquet(streamDir)
    val deduped = firstSeenMin(
      stream.select(col("user_id").cast("string"), col("bucket")).as[(String, Long)])
    val q = deduped.toDF("user_key", "first_bucket")
      .writeStream.outputMode("append").format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // resolve the result BEFORE dropping the memory-sink view (Dataset
    // analysis is eager, so the plan keeps the sink data alive) — without
    // the drop every invocation retains its full result set in the
    // catalog for the session's lifetime
    val out = spark.table(queryName)
      .select(col("user_key").cast("long").as("user_id"), col("first_bucket"))
    spark.catalog.dropTempView(queryName)
    out
  }
}
