package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
}
