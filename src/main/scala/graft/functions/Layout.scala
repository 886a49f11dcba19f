package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering keys for the
  * write path. At 100 TB the dominant cost of a selective query is
  * which files/row-groups its predicate can SKIP; sorting by a
  * Z-order (Morton) key before writing makes parquet min/max stats
  * selective on EVERY interleaved dimension at once, where a plain
  * sort helps only its leading column.
  */
object Layout {

  /** Morton / Z-order key over pre-normalized dimension columns: each
    * input must already be an integer in [0, 2^bits); bit i of column
    * j lands at position i·n + j of the key. Pure
    * shiftleft/shiftright/& arithmetic — whole-stage codegen, no UDF.
    * bits · #cols must fit in 63 key bits.
    */
  def zorderKey(dims: Seq[Column], bits: Int = 8): Column = {
    require(dims.nonEmpty && bits * dims.size <= 63,
      s"${dims.size} dims × $bits bits exceeds a long key")
    val n = dims.size
    val terms = for {
      (d, j) <- dims.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(d.cast("long"), i).bitwiseAND(lit(1L)),
      i * n + j)
    terms.reduce(_ + _) // disjoint bit positions: + == |
  }

  /** Clamp an arbitrary long column into [0, 2^bits) by range-mapping
    * against provided (min, max) bounds — the normalization step for
    * zorderKey. Bounds come from a stats pass (or catalog metadata);
    * passing them as literals keeps the expression fully codegen'd.
    */
  def normalizeDim(c: Column, minV: Long, maxV: Long, bits: Int = 8): Column = {
    val buckets = 1L << bits
    val span = math.max(1L, maxV - minV + 1)
    least(lit(buckets - 1),
      greatest(lit(0L),
        ((c.cast("long") - minV) * buckets / span).cast("long")))
  }

  /** Z-order write layout: range-partition by the z-key (so files
    * cover disjoint key ranges), sort within partitions, and hand
    * back the frame ready for a parquet write. Every interleaved
    * dimension then prunes at row-group granularity via min/max
    * stats.
    */
  def zorderLayout(df: DataFrame, key: Column, numFiles: Int): DataFrame =
    df.withColumn("__zkey", key)
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
}
