package graft.pipeline

import java.nio.file.{Files, Paths, StandardCopyOption}

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

  Files.createDirectories(Paths.get(root))

  final private def latestPtr = Paths.get(root, "_latest")
  private def versionDir(v: Long): String = s"$root/v=$v"

  private def currentVersion(): Long =
    if (Files.exists(latestPtr)) Files.readString(latestPtr).trim.toLong else 0L

  /** Current registry table:
    * (id_run, model_name, vocab_size, n_components, k, silhouette,
    * created_seq, is_active).
    */
  def table(): DataFrame = {
    val v = currentVersion()
    if (v == 0L) {
      Seq.empty[(String, String, Int, Int, Int, Double, Long, Boolean)]
        .toDF("id_run", "model_name", "vocab_size", "n_components", "k",
          "silhouette", "created_seq", "is_active")
    } else spark.read.parquet(versionDir(v))
  }

  private def publish(df: DataFrame): Unit = {
    val next = currentVersion() + 1L
    df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(versionDir(next))
    val tmp = Paths.get(root, s"_latest.tmp$next")
    Files.writeString(tmp, next.toString)
    Files.move(tmp, latestPtr, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** S5: register a run (inactive). Re-registering an id_run replaces its
    * row (idempotent retries).
    */
  def register(
      idRun: String,
      modelName: String,
      vocabSize: Int,
      nComponents: Int,
      k: Int,
      silhouette: Double): Unit = {
    val seq = currentVersion() + 1L
    val row = Seq((idRun, modelName, vocabSize, nComponents, k, silhouette,
      seq, false))
      .toDF("id_run", "model_name", "vocab_size", "n_components", "k",
        "silhouette", "created_seq", "is_active")
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
