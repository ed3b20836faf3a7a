package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamingDedup

/** flatMapGroupsWithState first-seen dedup across micro-batches. */
class StreamingDedupSpec extends SparkSpec {

  test("keys pass through once, duplicates in later batches are dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val out = StreamingDedup.firstSeen(input.toDS())
    val q = out.writeStream
      .format("memory").queryName("dedup_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      input.addData(("u1", "a"), ("u2", "b"), ("u1", "a2"))
      q.processAllAvailable()
      input.addData(("u1", "again"), ("u3", "c"))
      q.processAllAvailable()
      val got = spark.table("dedup_out").as[(String, String)]
        .collect().toMap
      assert(got.keySet === Set("u1", "u2", "u3"))
      assert(got("u3") === "c")
      // u1 emitted exactly once (from the first batch)
      assert(spark.table("dedup_out").count() === 3L)
    } finally q.stop()
  }
}
