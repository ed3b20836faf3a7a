package graft.pipeline

import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Model-run registry ≙ reference `topics_model_training_runs`
  * (`db/schema.sql:33-50`) with the "at most one active run" invariant the
  * reference enforces via a partial unique index (`schema.sql:53-55`) and
  * the deactivate-all-then-activate transaction (S6,
  * `topics_detector/db_io.py:115-144`).
  *
  * Run ids are deterministic keys supplied by the caller (S5: no
  * INSERT…RETURNING — BIGSERIAL does not distribute; SURVEY.md §1.4).
  * Registry versions are immutable parquet snapshots; `_latest` is an
  * atomically-renamed pointer file, so readers always see a consistent
  * registry and a killed writer leaves the previous version active —
  * exactly Iceberg's snapshot-pointer semantics, minus the runtime dep.
  */
final class RunRegistry(val root: String, spark: SparkSession) {

  import spark.implicits._

  /** Pointer I/O through the Hadoop FileSystem API ([[graft.util
    * .StoreFs]]) — the registry root may be file://, hdfs://, etc.
    */
  private val sfs = new graft.util.StoreFs(root, spark.sessionState.newHadoopConf())

  sfs.mkdirs(sfs.rootPath)

  final private def latestPtr: HPath = sfs.path("_latest")
  private def versionDir(v: Long): String = s"$root/v=$v"

  private def currentVersion(): Long =
    if (sfs.exists(latestPtr)) sfs.readString(latestPtr).trim.toLong else 0L

  /** Current registry table — full schema parity with the reference's
    * `topics_model_training_runs` (`db/schema.sql:33-50`): the complete
    * hyperparameter set rides with the run so frozen-param inference is
    * reproducible from the registry row alone.
    * (id_run, model_name, vocab_size, n_components, k, silhouette,
    * tfidf_max_features, tfidf_max_df, tfidf_min_df, ngram_min, ngram_max,
    * top_terms_per_topic, random_state, id_mlflow_run, created_seq,
    * is_active).
    */
  def table(): DataFrame = {
    val v = currentVersion()
    if (v == 0L) {
      Seq.empty[(String, String, Int, Int, Int, Double, Int, Double, Int,
          Int, Int, Int, Long, String, Long, Boolean)]
        .toDF("id_run", "model_name", "vocab_size", "n_components", "k",
          "silhouette", "tfidf_max_features", "tfidf_max_df", "tfidf_min_df",
          "ngram_min", "ngram_max", "top_terms_per_topic", "random_state",
          "id_mlflow_run", "created_seq", "is_active")
    } else spark.read.parquet(versionDir(v))
  }

  private def publish(df: DataFrame): Unit = {
    val next = currentVersion() + 1L
    df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(versionDir(next))
    sfs.writeStringAtomic(latestPtr, next.toString,
      tmpName = s"_latest.tmp$next")
  }

  import RunRegistry.RunParams

  /** S5: register a run (inactive). Re-registering an id_run replaces its
    * row (idempotent retries).
    */
  def register(
      idRun: String,
      modelName: String,
      vocabSize: Int,
      nComponents: Int,
      k: Int,
      silhouette: Double,
      params: RunParams = RunParams()): Unit = {
    val seq = currentVersion() + 1L
    val row = Seq((idRun, modelName, vocabSize, nComponents, k, silhouette,
      params.tfidfMaxFeatures, params.tfidfMaxDf, params.tfidfMinDf,
      params.ngramMin, params.ngramMax, params.topTermsPerTopic,
      params.randomState, params.idMlflowRun, seq, false))
      .toDF("id_run", "model_name", "vocab_size", "n_components", "k",
        "silhouette", "tfidf_max_features", "tfidf_max_df", "tfidf_min_df",
        "ngram_min", "ngram_max", "top_terms_per_topic", "random_state",
        "id_mlflow_run", "created_seq", "is_active")
    publish(table().filter($"id_run" =!= idRun).unionByName(row))
  }

  /** S6: deactivate-all-then-activate, one atomic publish. */
  def activate(idRun: String): Unit = {
    val t = table()
    require(t.filter($"id_run" === idRun).count() == 1L,
      s"unknown id_run: $idRun")
    publish(t.withColumn("is_active", $"id_run" === idRun))
  }

  /** W4 analogue: the single active run, if any. */
  def active(): Option[String] = {
    val rows = table().filter($"is_active")
      .select($"id_run").as[String].collect()
    require(rows.length <= 1, s"registry invariant violated: ${rows.toSeq}")
    rows.headOption
  }

  /** Latest registered run by registration order (`ORDER BY created_at
    * DESC LIMIT 1`, db_io.py:230-238).
    */
  def latest(): Option[String] =
    table().orderBy($"created_seq".desc, $"id_run")
      .select($"id_run").as[String].collect().headOption
}

object RunRegistry {
  /** Training hyperparameters carried with each run (reference
    * `db/schema.sql:33-50`: tfidf_max_features/max_df/min_df,
    * ngram_range, top_terms_per_topic, random_state, id_mlflow_run).
    * Defaults mirror the reference's shipped config
    * (`topics_detector/model.py:23-35`).
    */
  final case class RunParams(
      tfidfMaxFeatures: Int = 30000,
      tfidfMaxDf: Double = 0.7,
      tfidfMinDf: Int = 5,
      ngramMin: Int = 1,
      ngramMax: Int = 2,
      topTermsPerTopic: Int = 50,
      randomState: Long = 31415L,
      idMlflowRun: String = "")
}
