package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.TopK

/** Two-phase skew-free top-k must be row-identical to the single-window
  * formulation for any k/fanout.
  */
class TopKSpec extends SparkSpec {

  test("perGroup equals the plain window top-k (random data, ties included)") {
    import spark.implicits._
    val rng = new java.util.Random(13)
    val rows = (0 until 5000).map { i =>
      (s"g${rng.nextInt(3)}", s"item$i", rng.nextInt(40).toLong)
    }
    val df = rows.toDF("grp", "item", "score")
    val w = Window.partitionBy($"grp").orderBy($"score".desc, $"item".asc)
    val plain = df.withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= 7)
      .select("grp", "item", "score", "rnk")
      .as[(String, String, Long, Long)].collect().toSet
    Seq(1, 4, 64).foreach { fanout =>
      val got = TopK.perGroup(df, Seq("grp"),
          Seq($"score".desc, $"item".asc), k = 7, fanout = fanout)
        .select("grp", "item", "score", "rnk")
        .as[(String, String, Long, Long)].collect().toSet
      assert(got === plain, s"fanout=$fanout")
    }
  }

  test("perGroup with k larger than group size returns whole groups") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("grp", "v")
    val got = TopK.perGroup(df, Seq("grp"), Seq($"v".asc), k = 10)
      .select("grp", "v", "rnk").as[(String, Long, Long)].collect().toSet
    assert(got === Set(("a", 1L, 1L), ("a", 2L, 2L), ("b", 3L, 1L)))
  }
}
