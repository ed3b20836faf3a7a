package graft
import org.apache.spark.sql.SparkSession

/** Round benchmark: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line (the driver's BENCH_r{N}.json contract).
  *
  * Each query is materialized through the `noop` datasource sink — unlike
  * `count()`, which lets Catalyst prune away every projected column, noop
  * evaluates the full result rows, so the measured time covers the real
  * work (regex chains, vector math, window sorts), not just row counting.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // force the fixture model to train OUTSIDE the timed region (it is a
    // frozen artifact in production — cf. reference model.py:54-68)
    SparkEntry.fixtureModel
    // ANN index builds are amortized batch jobs, not probe cost: stage
    // them untimed so q22/q42 measure the probe (VERDICT r02 #6); report
    // the build seconds as a separate top-level field
    val tIdx0 = System.nanoTime()
    SparkEntry.prepareAnnIndexes(spark, sfDir)
    val idxBuildSec = (System.nanoTime() - tIdx0) / 1e9
    // untimed warm-up: JIT + codegen + parquet reader init, so per-query
    // numbers measure the operator, not first-touch JVM costs
    import org.apache.spark.sql.functions._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(xxhash64(regexp_replace(lower(col("text")), "\\s+", " ")))
      .groupBy().count().write.format("noop").mode("overwrite").save()
    val failed = Seq.newBuilder[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case scala.util.control.NonFatal(e) =>
        // a failure must be VISIBLE in the JSON: elapsed-until-throw read
        // as a speedup in round-over-round comparison otherwise
        failed += name
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failedJson = failed.result().map(n => s"\"$n\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"index_build_sec":$idxBuildSec,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
