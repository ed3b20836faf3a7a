package graft.util

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Scalar-side hashes that agree bit-for-bit with the corresponding
  * Catalyst expressions, so ids computed inside `mapPartitions` join
  * against ids computed with `functions.xxhash64` (seed 42, the Spark
  * default) without reshuffling or recomputation.
  */
object Hashing {

  /** == `functions.xxhash64(lit(s))` for a non-null string column. */
  def xxhash64(s: String, seed: Long = 42L): Long = {
    val u = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, seed)
  }

  /** == `functions.xxhash64(lit(a), lit(b))` (Spark chains the seed). */
  def xxhash64(a: String, b: String): Long =
    xxhash64(b, xxhash64(a, 42L))

  /** SplitMix64 — used to derive independent per-row RNG seeds in the
    * deterministic fixture generator (stable across JVMs/partitionings).
    */
  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }
}
