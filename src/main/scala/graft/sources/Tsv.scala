package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S2: TSV ingestion with the reference's required-column contract
  * (`src/news_nlp/ingestion/db_io.py:74-83` — `pd.read_csv(sep="\t")`
  * plus a hard failure listing missing columns).
  */
object Tsv {

  /** Read a TSV with header; fail fast if required columns are missing.
    * Scale note: schema inference is a separate pass over the data — pass
    * `schemaDDL` in production so the read is single-pass and the scan
    * prunes/pushes down like any DSv2 source.
    */
  def read(
      spark: SparkSession,
      path: String,
      required: Seq[String],
      schemaDDL: Option[String] = None): DataFrame = {
    val base = spark.read
      .option("sep", "\t")
      .option("header", "true")
    val df = schemaDDL match {
      case Some(ddl) => base.schema(ddl).csv(path)
      case None      => base.option("inferSchema", "true").csv(path)
    }
    val missing = required.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"Input TSV is missing required columns: ${missing.mkString(", ")} " +
        s"(present: ${df.columns.mkString(", ")})") // db_io.py:77-83 contract
    df
  }

  /** Write a DataFrame as TSV with header (notebook-era round-trip aid). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("sep", "\t")
      .option("header", "true")
      .csv(path)
}
