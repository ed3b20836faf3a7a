package graft.topics

import org.apache.spark.sql.SparkSession

/** S9: model-artifact persistence — the Spark-native replacement for the
  * reference's `joblib.dump/load` of the fitted pipeline per run dir
  * (`src/news_nlp/topics_detector/model.py:54-68,218-248`).
  *
  * Artifacts are a single-row parquet with array columns (portable,
  * schema-checked, readable by any engine); load happens on the DRIVER and
  * the caller broadcasts the params — the reference's load-once singleton
  * (`api/dependencies.py:91-112`) becomes `sparkContext.broadcast`.
  */
object ModelIO {

  def save(spark: SparkSession, params: TopicModelParams, dir: String): Unit = {
    import spark.implicits._
    Seq((
      params.vocab.toSeq,
      params.idf.toSeq,
      params.components.map(_.toSeq).toSeq,
      params.centroids.map(_.toSeq).toSeq,
      params.ngramMax))
      .toDF("vocab", "idf", "components", "centroids", "ngram_max")
      .coalesce(1)
      .write.mode("overwrite").parquet(dir)
  }

  def load(spark: SparkSession, dir: String): TopicModelParams = {
    val row = spark.read.parquet(dir).head()
    TopicModelParams(
      vocab = row.getSeq[String](row.fieldIndex("vocab")).toArray,
      idf = row.getSeq[Double](row.fieldIndex("idf")).toArray,
      components = row.getSeq[scala.collection.Seq[Double]](
        row.fieldIndex("components")).map(_.toArray).toArray,
      centroids = row.getSeq[scala.collection.Seq[Double]](
        row.fieldIndex("centroids")).map(_.toArray).toArray,
      ngramMax = row.getInt(row.fieldIndex("ngram_max")))
  }
}
