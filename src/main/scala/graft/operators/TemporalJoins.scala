package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark's built-in join strategies don't
  * express directly: as-of (point-in-time) join and keyless interval
  * join. Both are composed from shuffle-friendly primitives — a
  * window over a union, and an equi-join on time buckets — rather
  * than inequality join conditions, which Catalyst can only execute
  * as a broadcast nested loop (O(|L|·|R|) comparisons; a
  * cross-product at 100 TB).
  *
  * Reference point: the reference engine has no temporal joins — its
  * event pipeline (graph/views/src/stream_pipeline.rs) only windows a
  * single stream. These operators are part of the beyond-reference
  * training-data surface (event attribution, co-occurrence mining).
  */
object TemporalJoins {

  /** As-of join: for each left row, the single right row with the
    * same key and the greatest `rightTs` ≤ `leftTs` (direction
    * "backward", the default) or the least `rightTs` ≥ `leftTs`
    * ("forward"). Unmatched left rows keep null payloads — left-join
    * semantics, every left row survives exactly once.
    *
    * Implementation: tag and union both sides, then propagate the
    * most recent payload values with `last(ignoreNulls)` over a
    * (key, ts) window — ONE shuffle on the key, no inequality join.
    * At equal timestamps the right row sorts first, so ties match
    * (the ASOF `<=` / `>=` convention). Wall-clock scale shape: the
    * union never materializes wide rows beyond key + ts + payload,
    * and the window is rows-between-unbounded-preceding — a running
    * state of one value per payload column, no buffering.
    *
    * `right` must be unique per (rightKey, rightTs) — pre-aggregate
    * duplicates (e.g. `max_by` a survivor) or the tie among them is
    * plan-order nondeterministic. Payload column names must not
    * collide with left columns.
    */
  def asOfJoin(left: DataFrame, right: DataFrame,
      leftKey: String, leftTs: String,
      rightKey: String, rightTs: String,
      payload: Seq[String],
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val rightSchema = right.schema
    val leftSchema = left.schema
    val leftCols = left.columns.toSeq

    val lTagged = left.select(
      Seq(col(leftKey).as("__k"), col(leftTs).as("__t"), lit(1).as("__side")) ++
        leftCols.map(col) ++
        payload.map(c =>
          lit(null).cast(rightSchema(c).dataType).as(s"__p_$c")): _*)
    val rTagged = right.select(
      Seq(col(rightKey).as("__k"), col(rightTs).as("__t"), lit(0).as("__side")) ++
        leftCols.map(c => lit(null).cast(leftSchema(c).dataType).as(c)) ++
        payload.map(c => col(c).as(s"__p_$c")): _*)

    val ordered =
      if (direction == "backward") Seq(col("__t").asc, col("__side").asc)
      else Seq(col("__t").desc, col("__side").asc)
    val w = Window.partitionBy("__k").orderBy(ordered: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = payload.foldLeft(lTagged.unionByName(rTagged)) { (d, c) =>
      d.withColumn(s"__p_$c", last(col(s"__p_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ payload.map(c => col(s"__p_$c").as(c)): _*)
  }

  /** Keyless interval join: all (left, right) row pairs with
    * `rightTs` ∈ [`leftTs` + loSeconds, `leftTs` + hiSeconds].
    * Returns the inner-joined pairs (left columns + right columns;
    * names must be disjoint) for the caller to aggregate.
    *
    * Implementation: quantize time into `bucketSeconds` buckets;
    * each left row explodes to the (few) buckets its window overlaps,
    * the right side maps to its single bucket, and the pair space is
    * an EQUI-join on the bucket id with the exact interval check as a
    * residual filter. Work is O(|L|·w/b + matches) instead of the
    * O(|L|·|R|) broadcast nested loop Catalyst plans for a raw
    * inequality condition. Pick `bucketSeconds` ≈ the window width:
    * ≤ 2 buckets per left row, and per-bucket row counts — not
    * corpus size — bound the fan-out. Skewed buckets (event storms)
    * are AQE skew-join territory, same as any hot equi-key.
    */
  def rangeJoinBinned(left: DataFrame, leftTs: String,
      right: DataFrame, rightTs: String,
      loSeconds: Long, hiSeconds: Long,
      bucketSeconds: Long): DataFrame = {
    require(hiSeconds >= loSeconds, s"empty interval [$loSeconds, $hiSeconds]")
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val bucketMicros = bucketSeconds * 1000000L
    // exact floor division: Spark's `/` on longs is double division,
    // whose rounding could flip a boundary bucket at large epochs —
    // subtract the remainder first so the quotient is an exact integer
    def bucketOf(ts: Column, offsetSeconds: Long): Column = {
      val x = unix_micros(ts) + lit(offsetSeconds * 1000000L)
      ((x - pmod(x, lit(bucketMicros))) / lit(bucketMicros)).cast("long")
    }
    val lBucketed = left.withColumn("__bucket",
      explode(sequence(bucketOf(col(leftTs), loSeconds),
        bucketOf(col(leftTs), hiSeconds))))
    val rBucketed = right.withColumn("__bucket", bucketOf(col(rightTs), 0L))
    lBucketed.join(rBucketed, Seq("__bucket"))
      .filter(unix_micros(col(rightTs))
        .between(unix_micros(col(leftTs)) + lit(loSeconds * 1000000L),
          unix_micros(col(leftTs)) + lit(hiSeconds * 1000000L)))
      .drop("__bucket")
  }
}
