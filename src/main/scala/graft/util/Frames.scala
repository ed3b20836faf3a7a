package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-bearing empty DataFrames — ONE definition. Hand-rolled
  * `createDataFrame(emptyRDD, fromDDL(...))` copies drift from their
  * non-empty twins by eye and only surface as join/union analysis errors
  * at runtime.
  */
object Frames {
  def empty(spark: SparkSession, ddl: String): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(ddl))
}
