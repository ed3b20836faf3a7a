package graft.bench

import org.apache.spark.sql.SparkSession
import graft.SparkEntry
import graft.fixtures.PageGen
import graft.ner.{FixtureGazetteer, NerExtractor}
import graft.link.EntityLink
import graft.pipeline.KgPipeline

/** Dev tool: per-stage wall times of the KG pipeline at a chosen
  * parallelism (env CORES) and input size (env PAGES). Run EXCLUSIVELY —
  * co-located load invalidates the numbers.
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("CORES", "32").toInt
    val n = sys.env.getOrElse("PAGES", "100000").toLong
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val dir = java.nio.file.Files.createTempDirectory("prof_pages_").toString
    time("stage pages")(PageGen.pages(spark, n).toDF()
      .repartition(cores * 4).write.mode("overwrite").parquet(dir))
    val params = spark.sparkContext.broadcast(SparkEntry.fixtureModel)
    val trie = spark.sparkContext.broadcast(FixtureGazetteer.trie)
    val pages = spark.read.parquet(dir)

    val cleaned = KgPipeline.withCleanText(pages)
      .select("url", "clean")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("clean+persist")(cleaned.count())
    val mentions = NerExtractor.extractMentions(cleaned, trie,
      Some(FixtureGazetteer.keepLabels), textCol = "clean")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("ner+persist")(mentions.count())
    val dict = EntityLink.buildEntityDict(mentions).toDF()
    time("dict")(dict.count())
    val perArticle = EntityLink.mentionsPerArticle(mentions)
    time("perArticle")(perArticle.count())
    val tt = KgPipeline.topicTriples(cleaned, params)
    time("topics noop")(tt.write.format("noop").mode("overwrite").save())
    val aliases = FixtureGazetteer.aliasPairs.toDF("norm_a", "norm_b", "entity_type")
    val sa = KgPipeline.sameAsTriples(dict, aliases)
    time("sameAs")(sa.count())
    time("full run noop") {
      KgPipeline.run(pages, trie, params, Some(aliases))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
