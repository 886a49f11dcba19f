package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded-memory frequency sketches with EXACT verification — the
  * sketch proposes, a cheap exact pass disposes, and the result
  * certifies its own exactness (the same candidates-then-verify
  * discipline the MinHash-LSH dedup path uses).
  *
  * Why not just groupBy().count(): partial aggregation holds one
  * hash-map entry per DISTINCT key per task. At 100 TB a high-card
  * column (URLs, user ids, raw tokens) makes those partial maps spill
  * long before the shuffle even starts, and the shuffle itself
  * carries the full distinct vocabulary. Misra-Gries holds a FIXED
  * `capacity` counters per partition regardless of cardinality, and
  * the verify pass shuffles only rows whose key survived — bounded by
  * capacity × partitions candidates, not by |vocabulary|.
  *
  * Reference point (capability, not code): the reference's windowed
  * top-k surfaces (graph/algorithms/src/basic.rs:25-31) are exact
  * heap scans; this is the scale path it lacks.
  */
object Sketches {

  /** Per-partition Misra-Gries summary keys (Misra & Gries 1982).
    * The classic decrement-all step: a full table meeting a new key
    * decrements every counter and evicts zeros, so any key occurring
    * more than n_p / capacity times in a partition MUST survive that
    * partition's table — by pigeonhole, any key with GLOBAL count
    * > N / capacity survives in at least one partition. Runs in one
    * `mapPartitions` with O(capacity) memory; emits candidate keys
    * only (MG counts are lower bounds — the exact pass recounts).
    */
  def misraGriesCandidates(keys: Dataset[String],
      capacity: Int): Dataset[String] = {
    import keys.sparkSession.implicits._
    misraGriesSummary(keys, capacity).map(_._1)
  }

  /** Per-partition Misra-Gries summaries WITH their residual counts —
    * the mergeable form (counts are lower bounds; StreamSketch merges
    * partition/batch summaries with the counter-add + prune rule).
    * Emits up to `capacity` (key, count) pairs per partition.
    *
    * `lossAcc`, when supplied, accumulates the number of
    * DECREMENT-ALL events across partitions: each event lowers every
    * live counter (and the arriving key) by exactly 1, so a key's
    * true partition count exceeds its emitted count by at most that
    * partition's event tally — summing tallies over partitions gives
    * a sound per-key error bound for the whole pass. Read it only
    * AFTER the action that consumed this Dataset (task retries can
    * over-add — the safe direction for an error BOUND).
    */
  def misraGriesSummary(keys: Dataset[String], capacity: Int,
      lossAcc: Option[org.apache.spark.util.LongAccumulator] = None)
      : Dataset[(String, Long)] = {
    require(capacity > 0, "capacity must be positive")
    import keys.sparkSession.implicits._
    keys.mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      var decrements = 0L
      while (it.hasNext) {
        val k = it.next()
        counters.get(k) match {
          case Some(c) => counters.update(k, c + 1)
          case None =>
            if (counters.size < capacity) counters.update(k, 1L)
            else {
              decrements += 1
              counters.mapValuesInPlace((_, c) => c - 1)
              counters.filterInPlace((_, c) => c > 0)
            }
        }
      }
      lossAcc.foreach(_.add(decrements))
      counters.iterator
    }
  }

  /** Exact-verified top-k by frequency. Phase 1 sketches candidates
    * (fixed memory per partition); phase 2 recounts EXACTLY but only
    * rows whose key is a candidate (broadcast semi-join — the shuffle
    * carries candidate keys' partial counts, never the vocabulary).
    *
    * Self-certifying: the MG guarantee covers every key with count
    * > N / capacity, so if the returned k-th count clears that bar,
    * no missed key could displace the result and it IS the exact
    * top-k (total order: count desc, key asc). If the bar is not
    * cleared — capacity too small for this distribution — the
    * operator falls back to the full exact aggregation rather than
    * return silently-approximate rows (logged; at scale the caller
    * raises capacity instead).
    */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int,
      capacity: Int = 4096): DataFrame = {
    require(k > 0 && capacity >= k,
      s"need capacity >= k > 0 (got k=$k capacity=$capacity)")
    import df.sparkSession.implicits._
    val keys = graft.TransientCache.persist(
      df.select(col(keyCol).cast("string").as("key"))
        .filter(col("key").isNotNull))
    val n = keys.count()
    val exactBar = n.toDouble / capacity
    val cands = misraGriesCandidates(keys.as[String], capacity)
      .toDF("key").distinct()
    // k rows on the driver is the certification cost (top-k IS
    // driver-sized by definition); everything heavy stayed distributed
    val top = keys.join(broadcast(cands), Seq("key"), "left_semi")
      .groupBy("key").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("key"))
      .limit(k)
      .collect()
    val certified = top.length == k && top.last.getLong(1) > exactBar
    val rows =
      if (certified) top.toSeq
      else {
        // fall back to the unconditionally exact path (full partial
        // aggregation) — correctness over cleverness when the sketch
        // cannot certify this distribution at this capacity. Also the
        // small-data path: fewer than k candidates proves nothing.
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"heavyHitters: cannot certify (k-th count vs N/capacity " +
            s"= $exactBar); falling back to full exact aggregation")
        keys.groupBy("key").agg(count(lit(1)).as("cnt"))
          .orderBy(desc("cnt"), asc("key"))
          .limit(k).collect().toSeq
      }
    import scala.jdk.CollectionConverters._
    df.sparkSession.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("key",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("cnt",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  // ---- HLL distinct-count sketch index ----------------------------

  /** At-rest DISTINCT-COUNT sketch index: one Datasketches HLL
    * sketch per fine-grained group (e.g. (day, event_type)), built in
    * a single pass with Spark's codegen'd `hll_sketch_agg`. The index
    * is tiny (≤ 2^lgK registers per group ≈ KBs) and is the 100 TB
    * answer to "distinct users per X over an arbitrary time range":
    * COUNT(DISTINCT) over a raw 100 TB table shuffles the full key
    * universe per query, while this index is built ONCE and every
    * later range/rollup query merges a handful of sketch rows —
    * [[hllRollup]] never touches the base table again. The frequency
    * twin is Misra-Gries above; HLL covers the cardinality question
    * MG cannot (and vice versa).
    */
  def hllIndex(df: DataFrame, keyCol: String, groupCols: Seq[String],
      lgK: Int = 12): DataFrame =
    df.filter(col(keyCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(keyCol), lgK).as("hll"),
        count(lit(1)).as("rows"))

  /** Serve approximate distinct counts at any COARSER grouping (or
    * globally with `groupCols = Nil`) by merging index sketches —
    * `hll_union_agg` max-merges registers/coupon sets, so the served
    * estimate carries the SAME error envelope as a sketch built
    * directly over the union of the underlying rows (the two are not
    * always bit-identical — datasketches' sparse LIST/SET modes can
    * promote differently under union than under single-pass building,
    * measured a ~0.5% divergence at 1.5k distinct — but both sit
    * inside the lgK envelope), and merging is IDEMPOTENT: re-merging
    * data a sketch already absorbed changes nothing, register max and
    * coupon-set union alike — which is what makes the streaming
    * twin's re-delivery window benign (StreamHll).
    */
  def hllRollup(index: DataFrame, groupCols: Seq[String]): DataFrame = {
    val merged = hll_sketch_estimate(hll_union_agg(col("hll")))
      .as("approx_distinct")
    if (groupCols.isEmpty) index.agg(merged)
    else index.groupBy(groupCols.map(col): _*).agg(merged)
  }

  // ---- ε-approximate quantile coreset ------------------------------

  /** Mergeable ε-approximate QUANTILE summary — the third leg of the
    * sketch family (MG: frequency, HLL: cardinality, this:
    * distribution). Built by per-partition sorted subsampling, the
    * simplest of the classic mergeable quantile-summary
    * constructions: each partition sorts locally (Tungsten spillable
    * sort, NO shuffle) and one streaming pass keeps every t-th
    * element with weight t, plus the partition's last element
    * carrying the remainder so weights sum EXACTLY to N.
    *
    * Error contract, proven not assumed: for any value x, the merged
    * coreset's cumulative weight obeys
    * `cumw(x) <= count(<= x) <= cumw(x) + P·(t−1)` — each
    * partition's kept points are at most t−1 elements stale. A
    * value's rank is an INTERVAL under duplicates, so the quantile
    * answer v* (smallest kept value with cumw >= target) certifies
    * two-sided as: `count(<= v*) >= target` (immediate from the
    * selection) and `count(< v*) <= target + 2·P·t` (the elements
    * below v* are those at or below the previous kept value —
    * < target + P(t−1) — plus the strictly-between stragglers, < t
    * per partition). With t = floor(ε·N / (2·(P+1))) the whole
    * envelope is ≤ ε·N. Coreset size ≤ N/t + P ≈ 2(P+1)/ε rows:
    * PARTITION-count-bounded, never data-bounded — which is what
    * licenses the driver-side quantile extraction, the same way
    * MG's top-k collect is k-bounded. Returns (v, w) rows plus the
    * scalars the bound needs.
    */
  def quantileCoreset(values: DataFrame, valueCol: String,
      eps: Double = 0.01): (DataFrame, Long, Long, Int) = {
    require(eps > 0 && eps < 1, s"eps in (0,1), got $eps")
    import values.sparkSession.implicits._
    val v = graft.TransientCache.persist(
      values.select(col(valueCol).cast("double").as("v"))
        .filter(col("v").isNotNull))
    val n = v.count()
    val p = math.max(1, v.rdd.getNumPartitions)
    val t = math.max(1L, math.floor(eps * n / (2.0 * (p + 1))).toLong)
    val coreset = v.sortWithinPartitions("v").as[Double]
      .mapPartitions { it =>
        // one streaming pass: every t-th element with weight t, then
        // the partition's last element with the remainder weight so
        // Σw = m_p exactly
        new scala.collection.AbstractIterator[(Double, Long)] {
          private var sinceEmit = 0L
          private var last = 0.0
          private var closed = false
          private var pending: (Double, Long) = _
          private def advance(): Unit = {
            pending = null
            while (pending == null && it.hasNext) {
              val x = it.next(); last = x; sinceEmit += 1
              if (sinceEmit == t) { pending = (x, t); sinceEmit = 0 }
            }
            if (pending == null && !closed) {
              closed = true
              if (sinceEmit > 0) pending = (last, sinceEmit)
            }
          }
          advance()
          override def hasNext: Boolean = pending != null
          override def next(): (Double, Long) = {
            val r = pending; advance(); r
          }
        }
      }.toDF("v", "w")
    (coreset, n, t, p)
  }

  /** Quantile answers from a collected coreset: for each q, the
    * smallest coreset value whose cumulative weight reaches
    * ceil(q·n). The collect is (P+1)/ε-bounded by construction (see
    * [[quantileCoreset]]); extraction is a sort + prefix walk.
    */
  def coresetQuantiles(coreset: Array[(Double, Long)], n: Long,
      qs: Seq[Double]): Seq[(Double, Double)] = {
    require(qs.forall(q => q >= 0 && q <= 1), "quantiles in [0,1]")
    val sorted = coreset.sortBy(_._1)
    qs.map { q =>
      val target = math.max(1L, math.ceil(q * n).toLong)
      var cum = 0L
      var i = 0
      var ans = if (sorted.nonEmpty) sorted.last._1 else Double.NaN
      var found = false
      while (i < sorted.length && !found) {
        cum += sorted(i)._2
        if (cum >= target) { ans = sorted(i)._1; found = true }
        i += 1
      }
      (q, ans)
    }
  }

  /** GROUPED ε-quantile coresets — per-key distribution summaries in
    * one pass (per-domain length percentiles, per-tenant latency
    * bands …). Each key is hash-repartitioned to ONE partition and
    * its sorted run subsampled at a fixed stride `t`: the per-key
    * staleness is then < t (single partition — no P factor), so any
    * per-key rank answered from the coreset is within ±2t under the
    * duplicates interval. The stride is ABSOLUTE (rank error ≤ 2t
    * rows per key) rather than relative: per-key relative ε needs
    * per-key counts before sampling — a second pass the absolute
    * contract avoids, and at 100 TB "percentiles within ±1000 rows"
    * is the natural per-group promise anyway. Output (k, v, w) rows,
    * ≤ m_key/t + 1 per key; the partition sort is Tungsten spillable
    * and the shuffle is the one hash exchange on the key.
    */
  def groupedQuantileCoreset(df: DataFrame, keyCol: String,
      valueCol: String, t: Long): DataFrame = {
    require(t >= 1, s"stride t must be >= 1, got $t")
    import df.sparkSession.implicits._
    df.select(col(keyCol).cast("string").as("k"),
        col(valueCol).cast("double").as("v"))
      .filter(col("k").isNotNull && col("v").isNotNull)
      .repartition(col("k"))
      .sortWithinPartitions("k", "v")
      .as[(String, Double)]
      .mapPartitions { it =>
        new scala.collection.AbstractIterator[(String, Double, Long)] {
          private var curKey: String = null
          private var sinceEmit = 0L
          private var last = 0.0
          private var pending: (String, Double, Long) = _
          private var carry: (String, Double) = _
          private def advance(): Unit = {
            pending = null
            while (pending == null) {
              val elem: (String, Double) =
                if (carry != null) { val c = carry; carry = null; c }
                else if (it.hasNext) it.next()
                else {
                  // input exhausted: close the final run's remainder
                  if (curKey != null && sinceEmit > 0) {
                    pending = (curKey, last, sinceEmit)
                    sinceEmit = 0L
                  }
                  curKey = null
                  return
                }
              val (k, x) = elem
              if (curKey == null) curKey = k
              if (k != curKey) {
                // key change: close the previous run's remainder (if
                // any) and re-deliver this element on the next call
                if (sinceEmit > 0) pending = (curKey, last, sinceEmit)
                curKey = k; sinceEmit = 0L; carry = (k, x)
              } else {
                last = x; sinceEmit += 1
                if (sinceEmit == t) { pending = (k, x, t); sinceEmit = 0L }
              }
            }
          }
          advance()
          override def hasNext: Boolean = pending != null
          override def next(): (String, Double, Long) = {
            val r = pending; advance(); r
          }
        }
      }.toDF("k", "v", "w")
  }

  /** Per-key quantile answers from a grouped coreset with in-plan
    * certification: for each key and each q, the smallest coreset
    * value whose within-key cumulative weight reaches ceil(q·m_key),
    * then ONE exact recount of every estimate's rank interval —
    * `count(<=est) >= target − 2t AND count(<est) <= target + 2t`
    * is the single-partition-per-key envelope. The estimates frame
    * is (keys × qs)-sized — the answer's own size — and broadcasts
    * to the recount join. Returns (k, q, estimate, m, certified).
    */
  def groupedCertifiedQuantiles(df: DataFrame, keyCol: String,
      valueCol: String, qs: Seq[Double], t: Long): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1),
      "quantiles in [0,1]")
    import df.sparkSession.implicits._
    val core = groupedQuantileCoreset(df, keyCol, valueCol, t)
    val w = Window.partitionBy("k").orderBy("v")
    // ONE coreset pass for every q: explode the quantile literal
    // onto the cum frame (a per-q union would re-run the whole
    // repartition+sort+window lineage per quantile — observed as
    // three parallel scan chains in the plan before this)
    val cum = core.select(col("k"), col("v"),
        sum(col("w")).over(w).as("cum"),
        sum(col("w")).over(Window.partitionBy("k")).as("m"))
      .select(col("k"), col("v"), col("cum"), col("m"),
        explode(lit(qs.toArray)).as("q"))
    val ests = cum.filter(col("cum") >=
        greatest(lit(1L), ceil(col("m") * col("q")).cast("long")))
      .groupBy("k", "q").agg(min(col("v")).as("estimate"),
        first(col("m")).as("m"))
      .select(col("k"), col("q"), col("estimate"), col("m"))
    val v = df.select(col(keyCol).cast("string").as("k"),
        col(valueCol).cast("double").as("v"))
      .filter(col("k").isNotNull && col("v").isNotNull)
    v.join(broadcast(ests), Seq("k"))
      .groupBy("k", "q", "estimate", "m")
      .agg(sum(when(col("v") <= col("estimate"), 1L).otherwise(0L)).as("le"),
        sum(when(col("v") < col("estimate"), 1L).otherwise(0L)).as("lt"))
      .select(col("k"), col("q"), col("estimate"), col("m"),
        (col("le") >= greatest(lit(1L),
            ceil(col("m") * col("q")).cast("long")) - lit(2L * t) &&
          col("lt") <= greatest(lit(1L),
            ceil(col("m") * col("q")).cast("long")) + lit(2L * t))
          .as("certified"))
  }

  /** Sketch-estimated quantiles WITH an in-plan exactness
    * certificate: one distributed pass builds the coreset, the
    * estimates come from the collected (bounded) coreset, and a
    * single exact aggregation recounts every estimate's true rank
    * INTERVAL (a value's rank is [count(<v), count(<=v)] under
    * duplicates) — the certificate
    * `count(<= est) >= target − B  AND  count(< est) <= target + B`
    * with B = 2·(P+1)·t ≤ ε·n is the construction's proven
    * envelope, so a false row is a bug, not noise (same
    * sketch-proposes / exact-disposes discipline as
    * [[heavyHitters]]). Returns (q, estimate, rank_le, n,
    * certified).
    */
  def certifiedQuantiles(values: DataFrame, valueCol: String,
      qs: Seq[Double], eps: Double = 0.01): DataFrame = {
    import values.sparkSession.implicits._
    val (coreset, n, t, p) = quantileCoreset(values, valueCol, eps)
    // n == 0 (empty or all-null input): the exact-rank aggregation
    // below would return null sums (getLong NPE) after the coreset
    // walk already produced NaN estimates — answer uncertified rows
    // directly instead of running a pass that cannot certify anything
    if (n == 0L)
      return qs.map(q => (q, Double.NaN, 0L, 0L, false))
        .toDF("q", "estimate", "rank_le", "n", "certified")
    val core = coreset.as[(Double, Long)].collect()
    val ests = coresetQuantiles(core, n, qs)
    val v = values.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    // every estimate's exact rank interval in ONE aggregation pass
    val rankCols = ests.zipWithIndex.flatMap { case ((_, est), i) =>
      Seq(sum(when(col("v") <= est, 1L).otherwise(0L)).as(s"le$i"),
        sum(when(col("v") < est, 1L).otherwise(0L)).as(s"lt$i"))
    }
    val ranks = v.agg(rankCols.head, rankCols.tail: _*).head()
    val bound = 2L * (p + 1) * t
    ests.zipWithIndex.map { case ((q, est), i) =>
      val le = ranks.getLong(2 * i)
      val lt = ranks.getLong(2 * i + 1)
      val target = math.max(1L, math.ceil(q * n).toLong)
      (q, est, le, n, le >= target - bound && lt <= target + bound)
    }.toDF("q", "estimate", "rank_le", "n", "certified")
  }
}
