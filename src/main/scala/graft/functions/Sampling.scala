package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / corpus-mixing operators.
  *
  * Training-data pipelines re-weight sources ("2 parts wiki, 0.3
  * parts web crawl") by SAMPLING, and the sample must be
  * reproducible run-to-run and machine-to-machine — `df.sample()`'s
  * seed is partition-dependent, so the selection is keyed on a hash
  * of the row's stable id instead: a row is kept iff
  * hash(id) mod 10^4 < rate·10^4. Per-row decision, no shuffle, no
  * state; the filter pushes down next to the scan, and the same id
  * always lands on the same side of the cut at any scale and any
  * partitioning.
  */
object Sampling {

  /** Fixed-point denominator for sampling rates: rates quantize to
    * 1/10000ths.
    */
  val Denominator = 10000L

  /** Knuth multiplicative hash of a non-negative integral id column.
    * NOT xxhash64 (which would be the production choice for string
    * or high-cardinality keys) — this form is reproducible in ANSI
    * SQL (`((id % 1000000007) * 2654435761) % 10000`), which keeps
    * the sampling decision oracle-checkable across engines. The id
    * reduces mod 1e9+7 before the multiply so the product stays
    * within Long range in both engines (ids above ~3.47e9 — routine
    * at 100 TB — would otherwise wrap in Spark and raise in ANSI
    * engines); a no-op below 1e9+7. Swap in `xxhash64(id)` when
    * cross-engine reproducibility stops mattering before id-space
    * regularity does.
    */
  def idHash(id: Column): Column =
    pmod((id.cast("long") % lit(1000000007L)) * lit(2654435761L),
      lit(Denominator))

  /** The keep predicate: hash(id) mod 10^4 under the stratum's
    * quantized rate (`rates`, falling back to `defaultRate`).
    */
  def keepPredicate(strataCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double): Column = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      s"rates must be in [0,1]: $rates / $defaultRate")
    val threshold = rates.toSeq.sortBy(_._1).foldRight(
      lit((defaultRate * Denominator).toLong)) { case ((k, r), acc) =>
      when(col(strataCol) === k, lit((r * Denominator).toLong)).otherwise(acc)
    }
    idHash(col(idCol)) < threshold
  }

  /** Stratified deterministic sample: keep each row with its
    * stratum's rate. Rates are fractions in [0, 1].
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame =
    df.filter(keepPredicate(strataCol, idCol, rates, defaultRate))

  /** Temperature-based source mixing — the standard pretraining
    * recipe for damping head sources and upweighting tail ones:
    * target mixture weight w_s ∝ n_s^alpha, so with a target sample
    * of `targetRows` the per-stratum keep rate is
    * min(1, targetRows · w_s / n_s). alpha = 1 keeps every stratum
    * at the same uniform rate (proportional mixing), alpha = 0 aims
    * the same ROW COUNT at every stratum (maximal tail upweighting),
    * values between interpolate.
    *
    * The rate arithmetic rounds to 6 dp BEFORE quantizing to the
    * 1/10000 hash threshold, so any engine whose pow() agrees to
    * ~1e-7 (all of them) derives the identical integer threshold —
    * the sample stays oracle-checkable and partitioning-independent
    * like every other sampler here. Cost: one per-stratum count
    * aggregate, a single-row weight sum, a broadcast rate join, and
    * the scan-side hash filter.
    */
  def temperatureSample(df: DataFrame, strataCol: String, idCol: String,
      alpha: Double, targetRows: Long): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"alpha in [0,1]: $alpha")
    val counts = df.groupBy(strataCol).agg(count(lit(1)).as("__n"))
    val wsum = counts.agg(sum(pow(col("__n"), alpha)).as("__wsum"))
    val thresholds = counts.crossJoin(broadcast(wsum))
      .select(col(strataCol),
        floor(least(lit(1.0),
          round(lit(targetRows.toDouble) * pow(col("__n"), alpha)
            / col("__wsum") / col("__n"), 6)) * Denominator)
          .cast("long").as("__thr"))
    df.join(broadcast(thresholds), strataCol)
      .filter(idHash(col(idCol)) < col("__thr"))
      .drop("__thr")
  }

  /** Mixing report for a stratified sample: per-stratum total rows,
    * kept rows, and the realized rate — the audit a mixing pass logs
    * so weight drift is visible. One conditional aggregate over a
    * single scan of the pre-sample frame.
    */
  def mixStats(df: DataFrame, strataCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val keep = keepPredicate(strataCol, idCol, rates, defaultRate)
    df.groupBy(strataCol)
      .agg(count(lit(1)).as("n_total"), count(when(keep, 1)).as("n_kept"))
      .withColumn("realized_rate",
        round(col("n_kept").cast("double") / col("n_total").cast("double"), 4))
  }
}
