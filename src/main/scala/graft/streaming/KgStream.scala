package graft.streaming

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ner.TokenTrie
import graft.pipeline.{EntityStore, KgPipeline, TripleStore}
import graft.topics.TopicModelParams

/** Structured Streaming front-end of the incremental KG pipeline — the
  * scale-native replacement for the reference's polling feed (DAG 03,
  * `airflow_dags/03_..._dag.py:28-30` at 0.17 docs/s): a `readStream` of
  * pages drives `foreachBatch` → [[KgPipeline.runIncremental]], so every
  * micro-batch lands with the SAME atomic-commit + anti-join semantics
  * as a batch run.
  *
  * Exactly-once story (end to end):
  *   - the streaming checkpoint replays an unacknowledged micro-batch
  *     after a crash with the SAME epoch id;
  *   - `runIncremental` keys the triple-store commit AND the entity-store
  *     merge on that id — a replayed batch no-ops whatever already
  *     committed, and the `processedIn` anti-join drops pages that an
  *     earlier batch already covered (duplicate input across micro-batches
  *     is processed exactly once).
  */
object KgStream {

  def start(
      pages: DataFrame, // streaming source with the Page schema
      store: TripleStore,
      trie: Broadcast[TokenTrie],
      params: Broadcast[TopicModelParams],
      checkpointDir: String,
      entityStore: Option[EntityStore] = None,
      aliases: Option[DataFrame] = None,
      cfg: KgPipeline.Config = KgPipeline.Config(),
      trigger: Trigger = Trigger.AvailableNow(),
      queryName: String = "kg-stream",
      compactMaxLive: Int = 16,
      compactFanIn: Int = 8): StreamingQuery = {
    // Batch ids are NAMESPACED by the checkpoint location: a stream
    // restarted with a FRESH checkpoint restarts epoch ids at 0, and a
    // bare "stream-00000000" may already be dead (superseded by
    // auto-compaction) — commit() rightly rejects dead ids, which would
    // wedge the restarted stream forever. Same checkpoint → same ids →
    // replay no-ops exactly as before.
    val streamNs = java.lang.Long.toHexString(
      graft.util.Hashing.xxhash64(checkpointDir)).take(8)
    val handle: (Dataset[Row], Long) => Unit = { (batch, epochId) =>
      KgPipeline.runIncremental(
        store, f"stream-$streamNs-$epochId%08d", batch.toDF(), trie, params, cfg,
        entityStore, aliases)
      // maintenance rides the trigger: one-manifest-per-micro-batch
      // forever would make every committed() read list unbounded dirs —
      // size-tiered folding keeps the live manifest count ~compactMaxLive
      // while rewriting each row only O(log) times (compactMaxLive <= 0
      // disables). Crash-safe: compaction is an atomic supersede-swap,
      // and a crash between commit and compaction just defers it one
      // trigger.
      if (compactMaxLive > 0) store.autoCompact(compactMaxLive, compactFanIn)
      ()
    }
    pages.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch(handle)
      .start()
  }
}
