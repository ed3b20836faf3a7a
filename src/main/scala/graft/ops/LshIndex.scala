package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized hyperplane-LSH index for ANN — the 100 TB query shape
  * that [[Similarity.lshTopK]] (one-shot, re-hashes the corpus per query)
  * is not: signatures are computed ONCE and written partitioned by
  * `(tbl, kb)` where kb = key mod [[keyBuckets]], so a probe reads only
  * the query's ≤`tables` bucket directories (partition pruning — asserted
  * in PlanSpec) instead of scanning the corpus.
  *
  * Same plane family/seed as [[Similarity]], so probe results are
  * candidate-identical to the one-shot path.
  */
object LshIndex {

  final case class Params(bits: Int = 10, tables: Int = 8, seed: Long = 11L)

  /** Partition fan-out guard: 2^bits keys per table would explode the
    * directory count, so keys are grouped into key-buckets for the
    * PHYSICAL layout; the exact key stays a data column and is filtered
    * after pruning. tables × keyBuckets dirs total.
    */
  val keyBuckets = 16

  def signatures(embeddings: DataFrame, p: Params,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val dim = embeddings.select(size(col(vecCol))).head().getInt(0)
    val planes = Similarity.randomPlanes(p.tables * p.bits, dim, p.seed)
    val bc = spark.sparkContext.broadcast(planes)
    val tables = p.tables
    val bits = p.bits
    embeddings
      .select(col(idCol).cast("long").as("id"), col(vecCol).cast("array<double>").as("v"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val pl = bc.value
        it.flatMap { case (id, v) =>
          (0 until tables).iterator.map { t =>
            var key = 0L
            var b = 0
            while (b < bits) {
              if (Similarity.dot(pl(t * bits + b), v) >= 0) key |= (1L << b)
              b += 1
            }
            (t, key, id, v)
          }
        }
      }.toDF("tbl", "key", "id", "v")
  }

  /** Build (or rebuild) the index at `dir`. One narrow pass + one write;
    * at scale this is the batch-indexing job that amortizes over all
    * subsequent probes.
    */
  def build(embeddings: DataFrame, dir: String, p: Params = Params(),
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    signatures(embeddings, p, idCol, vecCol)
      .withColumn("kb", pmod(col("key"), lit(keyBuckets)))
      // hash-distribute on the partition columns (Iceberg's
      // write.distribution-mode=hash): ONE file per (tbl, kb) dir instead
      // of every input task writing a sliver into every dir
      .repartition(col("tbl"), col("kb"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("tbl", "kb")
      .parquet(dir)

  def queryKeys(query: Array[Double], p: Params): Seq[(Int, Long)] = {
    val planes = Similarity.randomPlanes(p.tables * p.bits, query.length, p.seed)
    (0 until p.tables).map { t =>
      var key = 0L
      var b = 0
      while (b < p.bits) {
        if (Similarity.dot(planes(t * p.bits + b), query) >= 0) key |= (1L << b)
        b += 1
      }
      (t, key)
    }
  }

  /** Probe: prune to the query's (tbl, kb) partitions, filter the exact
    * keys, exact-rank candidates by cosine. The scan touches ≤ tables
    * bucket dirs of the index — never the corpus.
    */
  def topK(spark: SparkSession, dir: String, query: Array[Double],
      k: Int = 10, p: Params = Params(),
      excludeId: Option[Long] = None,
      idCol: String = "vec_id"): DataFrame = {
    val keys = queryKeys(query, p)
    val pruned = keys.map { case (t, key) =>
      col("tbl") === t && col("kb") === (((key % keyBuckets) + keyBuckets) % keyBuckets) &&
        col("key") === key
    }.reduce(_ || _)
    val base = spark.read.parquet(dir).filter(pruned)
    val cands = excludeId.map(id => base.filter(col("id") =!= id)).getOrElse(base)
      .select(col("id"), col("v")).dropDuplicates("id")
    cands
      .withColumn("cosine", round(Similarity.cosineToQuery(col("v"), query), 4))
      .select(col("id").as(idCol), col("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }
}
