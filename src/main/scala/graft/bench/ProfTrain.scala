package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic: phase timing of the q45 retrain path (round 6). */
object ProfTrain {
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
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[train] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy().count().write.format("noop").mode("overwrite").save()
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val root = graft.SparkEntry.scratchDir("graft_ptrain_")
      val store = new graft.pipeline.TripleStore(s"$root/store", spark)
      val reg = new graft.pipeline.RunRegistry(s"$root/registry", spark)
      val pages = spark.read.parquet(s"$sfDir/documents.parquet").select(
        col("doc_id").cast("string").as("url"), col("lang"),
        col("text").as("clean"))
      def assign(m: Int)(in: org.apache.spark.sql.DataFrame) =
        in.select(col("url"), col("lang"),
          pmod(col("url").cast("long"), lit(m)).cast("int").as("id_topic"))
      timed("register+activate run1")({
        reg.register("run1", "topics_detector", 512, 8, 6, 0.0)
        reg.activate("run1")
      })
      timed("assign run1 (commit b1)")(
        graft.pipeline.KgPipeline.assignTopicsIncremental(
          store, "b1", "run1", pages, assign(5)))
      // decomposed re-run of the trainer phases (same math as train())
      timed("  t: fit phases")({
        import org.apache.spark.ml.feature.{CountVectorizer, IDF, NGram, RegexTokenizer}
        import org.apache.spark.mllib.linalg.{Vectors => OldVectors}
        import org.apache.spark.mllib.linalg.distributed.RowMatrix
        import org.apache.spark.storage.StorageLevel
        val tok = new RegexTokenizer().setInputCol("clean").setOutputCol("_toks")
          .setPattern("[\\p{L}\\p{N}_]{2,}").setGaps(false).setToLowercase(false)
        val bi = new NGram().setN(2).setInputCol("_toks").setOutputCol("_bi")
        val grams = timed("  t: grams persist")(bi.transform(tok.transform(pages.select(col("clean"))))
          .withColumn("_grams", concat(col("_toks"), col("_bi")))
          .persist(StorageLevel.MEMORY_AND_DISK))
        val cvModel = timed("  t: CV fit")(new CountVectorizer()
          .setInputCol("_grams").setOutputCol("_counts")
          .setVocabSize(512).setMinDF(2.0).setMaxDF(0.7).fit(grams))
        val counts = cvModel.transform(grams)
        val idfSk = timed("  t: IDF fit")(new IDF().setInputCol("_counts").setOutputCol("_x")
          .fit(counts).idf.toArray.map(_ + 1.0))
        val idfBc = spark.sparkContext.broadcast(idfSk)
        val tfidf = counts.select("_counts").rdd.map { row =>
          val v = row.getAs[org.apache.spark.ml.linalg.SparseVector](0)
          val idf = idfBc.value
          val vals = new Array[Double](v.indices.length)
          var norm = 0.0
          var i = 0
          while (i < v.indices.length) {
            vals(i) = v.values(i) * idf(v.indices(i)); norm += vals(i)*vals(i); i += 1
          }
          if (norm > 0) { val inv = 1.0/math.sqrt(norm); i = 0
            while (i < vals.length) { vals(i) *= inv; i += 1 } }
          OldVectors.sparse(v.size, v.indices, vals)
        }.persist(StorageLevel.MEMORY_AND_DISK)
        timed("  t: tfidf count")(tfidf.count())
        grams.unpersist(blocking = false)
        val svd = timed("  t: SVD")(new RowMatrix(tfidf).computeSVD(8, computeU = false))
        val rank = svd.V.numCols
        val components = Array.tabulate(cvModel.vocabulary.length, 8)(
          (i, j) => if (j < rank) svd.V(i, j) else 0.0)
        val compsBc = spark.sparkContext.broadcast(components)
        val reduced = tfidf.map { v =>
          val sv = v.asInstanceOf[org.apache.spark.mllib.linalg.SparseVector]
          val comps = compsBc.value
          val out = new Array[Double](8)
          var p = 0
          while (p < sv.indices.length) {
            val row = comps(sv.indices(p)); val x = sv.values(p)
            var j = 0; while (j < 8) { out(j) += x*row(j); j += 1 }; p += 1 }
          var norm = 0.0; var j = 0
          while (j < 8) { norm += out(j)*out(j); j += 1 }
          if (norm > 0) { val inv = 1.0/math.sqrt(norm); j = 0
            while (j < 8) { out(j) *= inv; j += 1 } }
          Tuple1(org.apache.spark.ml.linalg.Vectors.dense(out))
        }
        val redDf = timed("  t: reduced persist+count")({
          val d = spark.createDataFrame(reduced).toDF("features")
            .persist(StorageLevel.MEMORY_AND_DISK)
          d.count(); d })
        val kmModel = timed("  t: KMeans fit")(new org.apache.spark.ml.clustering.KMeans()
          .setK(6).setSeed(31415L).setFeaturesCol("features").fit(redDf))
        timed("  t: silhouette")(new org.apache.spark.ml.evaluation.ClusteringEvaluator()
          .setFeaturesCol("features").setPredictionCol("prediction")
          .evaluate(kmModel.transform(redDf)))
        tfidf.unpersist(blocking=false); redDf.unpersist(blocking=false)
      })
      val (params, sil) = timed("trainer.train TOTAL")(
        graft.topics.DistributedTrainer.train(pages))
      println(s"[train]   (vocab=${params.vocab.length}, sil=$sil)")
      timed("register run2")(
        reg.register("run2", "topics_detector", params.vocab.length, 8, 6, sil))
      timed("modelIO.save")(
        graft.topics.ModelIO.save(spark, params, s"$root/model"))
      timed("activate run2")(reg.activate("run2"))
      timed("assign run2 (commit b2)")(
        graft.pipeline.KgPipeline.assignTopicsIncremental(
          store, "b2", "run2", pages, assign(3)))
      timed("read-back+noop")({
        val regRows = reg.table().select(
          col("id_run").as("subj"), lit("is_active").as("pred"),
          col("is_active").cast("string").as("obj"))
        store.committed().select(col("subj"), col("pred"), col("obj"))
          .unionByName(regRows)
          .orderBy(col("subj"), col("pred"))
          .write.format("noop").mode("overwrite").save()
      })
    }
    spark.stop()
  }
}
