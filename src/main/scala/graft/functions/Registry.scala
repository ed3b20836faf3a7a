package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Registration of the engine's custom Catalyst expressions so they are
  * usable both from SQL and from the Column API (via `call_function`,
  * which is stable across Spark 4's Column internals).
  */
object Registry {
  @volatile private var registered = false

  def ensure(spark: SparkSession): Unit = if (!registered) synchronized {
    if (!registered) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "html_to_text", exprs => HtmlToText(exprs.head), "scala_udf")
      registered = true
    }
  }

  /** html (binary or string) -> extracted text. Requires ensure(spark). */
  def htmlToText(c: Column): Column = call_function("html_to_text", c)
}
