package graft.views

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import scala.collection.mutable

/** Materialized-view subsystem (SURVEY §2.10): catalog, refresh
  * policies, change-impact analysis, dependency DAG, incremental
  * maintenance, and the view-based query router that the reference
  * uses in place of a planner (graph/views/src/query_router.rs:1-5).
  *
  * Division of labor: all control logic (catalog, DAG, routing
  * scores) is driver-side plain Scala over tiny metadata; all DATA
  * movement is DataFrame plans — view contents are DataFrames/parquet
  * and incremental merges are joins/aggs that scale with the delta,
  * not the base table.
  */
object Views {

  // ---- V1: view types ---------------------------------------------

  sealed trait ViewType
  /** Point-lookup view over key column values (empty ⇒ all rows). */
  case class Lookup(keyCol: String, keys: Seq[Long]) extends ViewType
  /** count/sum/avg/min/max over a numeric column grouped by keys. */
  case class Aggregation(aggregateType: String, valueCol: String,
      groupCols: Seq[String]) extends ViewType
  /** Graph-algorithm product (pagerank, connected_components, …). */
  case class Analytics(algorithm: String, params: Map[String, String]) extends ViewType
  /** Free-form SQL over registered tables (V9: table whitelist). */
  case class SqlQuery(sql: String, tables: Seq[String]) extends ViewType
  case class Hybrid(parts: Seq[ViewType]) extends ViewType

  // ---- V2: refresh policies ---------------------------------------

  sealed trait RefreshPolicy {
    /** needs_refresh (view_types.rs:159-190). */
    def needsRefresh(lastRefreshMs: Long, nowMs: Long, dirty: Boolean): Boolean =
      this match {
        case FixedInterval(ms) => nowMs - lastRefreshMs >= ms
        case EventDriven(debounceMs) => dirty && nowMs - lastRefreshMs >= debounceMs
        case OnDemand(ttlMs) => nowMs - lastRefreshMs >= ttlMs
        case HybridPolicy(_, intervalMs) => dirty || nowMs - lastRefreshMs >= intervalMs
      }
  }
  case class FixedInterval(intervalMs: Long) extends RefreshPolicy
  case class EventDriven(debounceMs: Long) extends RefreshPolicy
  case class OnDemand(ttlMs: Long) extends RefreshPolicy
  case class HybridPolicy(eventDriven: Boolean, intervalMs: Long) extends RefreshPolicy

  case class ViewDefn(name: String, viewType: ViewType, policy: RefreshPolicy,
      sourceTables: Seq[String])

  // ---- V4: dependency DAG -----------------------------------------

  /** Driver-side DAG over view names: topo order for cascade updates,
    * cycle detection (differential_dataflow.rs:303-477).
    */
  final class DependencyDag {
    private val deps = mutable.Map[String, mutable.Set[String]]() // view -> prerequisites

    def addDependency(view: String, dependsOn: String): Unit = {
      deps.getOrElseUpdate(view, mutable.Set()) += dependsOn
      deps.getOrElseUpdate(dependsOn, mutable.Set())
      require(!hasCycle, s"dependency $view -> $dependsOn creates a cycle")
    }

    def hasCycle: Boolean = topoOrder.isEmpty && deps.nonEmpty

    /** Kahn topo order (prerequisites first); empty on cycle. */
    def topoOrder: Seq[String] = {
      val inDeg = mutable.Map[String, Int]().withDefaultValue(0)
      deps.foreach { case (v, ds) => inDeg(v) = ds.size }
      val queue = mutable.Queue(deps.keys.filter(inDeg(_) == 0).toSeq.sorted: _*)
      val out = mutable.ArrayBuffer[String]()
      val dependents = deps.toSeq.flatMap { case (v, ds) => ds.map(_ -> v) }
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      while (queue.nonEmpty) {
        val v = queue.dequeue()
        out += v
        dependents.getOrElse(v, Nil).sorted.foreach { w =>
          inDeg(w) -= 1
          if (inDeg(w) == 0) queue += w
        }
      }
      if (out.size == deps.size) out.toSeq else Nil
    }

    /** Dirty view set closed over downstream dependents, in update
      * order (incremental_engine.rs:449-461).
      */
    def updateOrder(dirty: Set[String]): Seq[String] = {
      val dependents = deps.toSeq.flatMap { case (v, ds) => ds.map(_ -> v) }
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val closed = mutable.Set[String]()
      def visit(v: String): Unit = if (closed.add(v))
        dependents.getOrElse(v, Set()).foreach(visit)
      dirty.foreach(visit)
      topoOrder.filter(closed)
    }
  }

  // ---- V3: change-impact analysis ---------------------------------

  /** Which views does a change batch affect? The reference inspects
    * per-view-type rules (incremental_engine.rs:464-648); here a view
    * is affected when the change feed touches one of its source
    * tables — derived from the view definition, the moral equivalent
    * of reading table deps off the Catalyst plan.
    */
  def affectedViews(defns: Seq[ViewDefn], changedTables: Set[String]): Set[String] =
    defns.filter(_.sourceTables.exists(changedTables)).map(_.name).toSet

  // ---- V5-ish storage (S8/S9) -------------------------------------

  /** View catalog: definitions as JSON lines (driver-side), data as
    * parquet per view (view_registry.rs:100-334).
    */
  final class ViewCatalog(spark: SparkSession, dir: String) {
    private val defns = mutable.Map[String, ViewDefn]()
    private val data = mutable.Map[String, DataFrame]()
    private val lastRefresh = mutable.Map[String, Long]()

    // ---- batch journal (r11, advisor-flagged): a streaming
    // maintainer wraps its per-micro-batch fold in begin/commit/
    // rollback so an in-JVM foreachBatch retry restarts from the
    // PRE-batch view state instead of double-folding a half-applied
    // delta or permanently losing the batch. The journal records the
    // first-replaced frame per key; because every put installs a NEW
    // immutable frame, restoring the old references IS the rollback.
    // While a batch is open, put() DEFERS unpersisting the journaled
    // originals — an unpersisted localCheckpoint frame is unreadable
    // (truncated lineage), and rollback must hand them back readable.
    // Single-writer by contract, like foreachBatch itself.
    private var journal: Option[mutable.Map[String, (Option[DataFrame], Option[Long])]] = None
    private val deferredUnpersist = mutable.ArrayBuffer[DataFrame]()
    // scalar side-state per key (e.g. a reach core's row count,
    // `<key>!coreCnt`) — journal-covered like data/lastRefresh so a
    // rollback restores the count that matches the restored frame.
    // NOT persisted by save(): a parquet-reloaded catalog falls back
    // to recounting once (metaOf → None).
    private val meta = mutable.Map[String, Long]()
    private var metaJournal: Option[mutable.Map[String, Option[Long]]] = None

    def beginBatch(): Unit = {
      require(journal.isEmpty, "a catalog batch is already open")
      journal = Some(mutable.Map())
      metaJournal = Some(mutable.Map())
    }
    def commitBatch(): Unit = {
      require(journal.nonEmpty, "no catalog batch is open")
      deferredUnpersist.foreach(_.unpersist(false))
      deferredUnpersist.clear()
      journal = None
      metaJournal = None
    }
    def rollbackBatch(): Unit = {
      journal.foreach(_.foreach { case (name, (oldDf, oldTs)) =>
        oldDf match {
          case Some(old) =>
            data.get(name).filter(_ ne old).foreach(_.unpersist(false))
            data(name) = old
          case None =>
            data.remove(name).foreach(_.unpersist(false))
        }
        oldTs match {
          case Some(ts) => lastRefresh(name) = ts
          case None => lastRefresh.remove(name)
        }
      })
      metaJournal.foreach(_.foreach {
        case (name, Some(v)) => meta(name) = v
        case (name, None) => meta.remove(name)
      })
      deferredUnpersist.clear()
      journal = None
      metaJournal = None
    }

    def putMeta(name: String, v: Long): Unit = {
      metaJournal.foreach(j =>
        if (!j.contains(name)) j(name) = meta.get(name))
      meta(name) = v
    }
    def metaOf(name: String): Option[Long] = meta.get(name)

    def register(d: ViewDefn): Unit = defns(d.name) = d
    def definitions: Seq[ViewDefn] = defns.values.toSeq
    def get(name: String): Option[ViewDefn] = defns.get(name)

    def put(name: String, df: DataFrame, persist: Boolean = true): Unit = {
      journal.foreach(j => if (!j.contains(name))
        j(name) = (data.get(name), lastRefresh.get(name)))
      data.get(name).foreach { old =>
        // the pre-batch original must stay readable for rollback;
        // frames replaced WITHIN the open batch are rollback-garbage
        // and can release immediately
        if (journal.exists(_.get(name).exists(_._1.exists(_ eq old))))
          deferredUnpersist += old
        else old.unpersist(false)
      }
      val stored = if (persist) df.persist(StorageLevel.MEMORY_AND_DISK) else df
      data(name) = stored
      lastRefresh(name) = System.currentTimeMillis()
    }
    def dataOf(name: String): Option[DataFrame] = data.get(name)
    def lastRefreshMs(name: String): Long = lastRefresh.getOrElse(name, 0L)

    def save(name: String): Unit =
      data.get(name).foreach(_.write.mode("overwrite").parquet(s"$dir/$name.parquet"))
    def load(name: String): DataFrame = {
      val df = spark.read.parquet(s"$dir/$name.parquet")
      // journal-covered like put()/putMeta() (r13 ADVICE): a load
      // inside an open batch must roll back — both the replaced frame
      // and the purged derived counters — or a foreachBatch retry
      // restarts from a half-loaded catalog.
      journal.foreach(j => if (!j.contains(name))
        j(name) = (data.get(name), lastRefresh.get(name)))
      data(name) = df
      // Loading an older snapshot over a live entry must drop the
      // derived counters of the frame it replaces (r12 ADVICE): a
      // stale '!coreCnt'/'!ccCnt' would mis-gate compaction and the
      // recompute switch. Scope: the name's own meta, meta namespaced
      // under it ("x" -> "x!cc!ccCnt"), and the sibling-counter form
      // ("x!core" -> "x!coreCnt") — NOT a bare prefix match, which
      // would purge an unrelated frame sharing a name prefix
      // ("peers" vs "peers2") and force the state-sized recount this
      // meta exists to avoid.
      meta.keys.filter(k => k == name || k.startsWith(name + "!") ||
          k == name + "Cnt").toSeq
        .foreach { k =>
          metaJournal.foreach(j => if (!j.contains(k)) j(k) = meta.get(k))
          meta.remove(k)
        }
      df
    }
  }

  // ---- V5: incremental maintenance --------------------------------

  /** Incremental aggregation-state merge. State schema:
    * groupCols…, cnt, sum — and min/max recomputed exactly for
    * groups touched by deletions (the reference knowingly keeps
    * stale min/max on removal, incremental_engine.rs:885-892; we fix
    * that by re-aggregating ONLY affected groups against the base).
    *
    * changes: (op ∈ add|remove, groupCols…, value). Cost scales with
    * the delta + touched groups, not the base table.
    */
  /** ±1 sign for a delta `op` column, validated IN-PLAN: any value
    * outside {add, remove} (a typo'd "delete", a null) fails the
    * batch instead of silently signing as an add and drifting the
    * maintained view. Shared by the agg and join IVM paths.
    */
  private def validatedSign: Column =
    when(col("op") === "remove", -1)
      .when(col("op") === "add", 1)
      .otherwise(raise_error(concat(
        lit("IVM delta: op must be add|remove, got '"),
        col("op"), lit("'"))).cast("int"))

  def mergeAggDelta(state: DataFrame, changes: DataFrame,
      groupCols: Seq[String], base: Option[DataFrame] = None,
      valueCol: String = "value"): DataFrame = {
    val gc = groupCols.map(col)
    val sign = validatedSign
    val delta = changes.groupBy(gc: _*).agg(
      sum(sign).as("d_cnt"),
      sum(sign * col(valueCol)).as("d_sum"))
    val touchedMinMax = base.map { b =>
      val removedGroups = changes.filter(col("op") === "remove")
        .select(gc: _*).distinct()
      b.join(removedGroups, groupCols, "left_semi")
        .groupBy(gc: _*)
        .agg(min(col(valueCol)).as("new_min"), max(col(valueCol)).as("new_max"))
    }
    val merged = state.join(delta, groupCols, "full_outer")
      .select(
        groupCols.map(col) ++ Seq(
          (coalesce(col("cnt"), lit(0L)) + coalesce(col("d_cnt"), lit(0L))).as("cnt"),
          (coalesce(col("sum"), lit(0.0)) + coalesce(col("d_sum"), lit(0.0))).as("sum"),
          col("min"), col("max")): _*)
    val addsOnly = changes.filter(col("op") === "add")
      .groupBy(gc: _*).agg(min(col(valueCol)).as("a_min"), max(col(valueCol)).as("a_max"))
    val withAddMinMax = merged.join(addsOnly, groupCols, "left_outer")
      .select(groupCols.map(col) ++ Seq(col("cnt"), col("sum"),
        least(col("min"), col("a_min")).as("min"),
        greatest(col("max"), col("a_max")).as("max")): _*)
    val fixed = touchedMinMax match {
      case None => withAddMinMax
      case Some(t) =>
        withAddMinMax.join(t, groupCols, "left_outer")
          .select(groupCols.map(col) ++ Seq(col("cnt"), col("sum"),
            coalesce(col("new_min"), col("min")).as("min"),
            coalesce(col("new_max"), col("max")).as("max")): _*)
    }
    fixed.filter(col("cnt") > 0)
  }

  /** Bootstrap aggregation state from a base table. */
  def initAggState(base: DataFrame, groupCols: Seq[String],
      valueCol: String = "value"): DataFrame =
    base.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("cnt"),
      sum(col(valueCol)).as("sum"),
      min(col(valueCol)).as("min"),
      max(col(valueCol)).as("max"))

  /** Final agg compute (A2, incremental_engine.rs:931-946): expose
    * count/sum/avg/min/max off the maintained state.
    */
  def finalizeAgg(state: DataFrame): DataFrame =
    state.select(state.columns.filterNot(Seq("cnt", "sum", "min", "max").contains)
      .map(col) ++ Seq(
      col("cnt"),
      round(col("sum"), 4).as("sum"),
      round(round(col("sum") * 100).cast("long") / (col("cnt") * 100.0)
        + lit(1e-9), 4).as("avg"),
      round(col("min"), 4).as("min"),
      round(col("max"), 4).as("max")): _*)

  // ---- V5b: incremental JOIN views --------------------------------

  /** Bootstrap join-view state for `a ⋈keys b`: the joined rows with
    * a multiplicity column (multiset semantics — duplicates are
    * counted, not lost). Non-key columns of the two sides must be
    * disjoint (standard view-schema hygiene; `keys` appear once).
    */
  def initJoinState(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    val joined = a.join(b, keys)
    joined.groupBy(joined.columns.map(col): _*)
      .agg(count(lit(1)).as("__mult"))
  }

  /** Signed delta of an inner equi-join view under base-table deltas
    * — the classic incremental view maintenance rule:
    *
    *   (A+ΔA) ⋈ (B+ΔB) = A⋈B + ΔA⋈B + A⋈ΔB + ΔA⋈ΔB
    *
    * with removals as −1-signed rows and signs multiplying through
    * the join. `dA`/`dB` carry (op ∈ add|remove, cols…); either may
    * be empty. Returns (view cols…, __sign).
    *
    * Cost scales with the DELTAS: both big-side terms are equi-joins
    * whose delta side is small enough to broadcast, so A and B are
    * scanned but never shuffled, and the view itself (often far
    * bigger than either base) is never recomputed. That is the whole
    * point — the reference recomputes joins on refresh.
    */
  def joinViewDelta(aOld: DataFrame, dA: DataFrame,
      bOld: DataFrame, dB: DataFrame, keys: Seq[String]): DataFrame = {
    // op validated in-plan (validatedSign): a typo'd op must fail
    // the batch, not silently insert rows into the maintained view.
    // A delta may instead arrive PRE-WEIGHTED with a `__sign` column
    // (r11: the var-length walk folds net each level's delta to
    // per-pair counts, whose magnitudes are legitimately > 1 — op
    // rows cannot carry them without re-exploding walk counts).
    def signed(d: DataFrame, s: String) =
      if (d.columns.contains("__sign")) d.withColumnRenamed("__sign", s)
      else d.withColumn(s, validatedSign).drop("op")
    val sA = signed(dA, "__sa")
    val sB = signed(dB, "__sb")
    // the DELTA side broadcasts in every term — deltas have no stats,
    // so without the hint Catalyst would sort-merge and shuffle the
    // whole base, the exact cost this operator exists to avoid
    val t1 = broadcast(sA).join(weighted(bOld, "__sb"), keys)
    val t2 = weighted(aOld, "__sa").join(broadcast(sB), keys)
    val t3 = broadcast(sA).join(sB, keys)
    t1.unionByName(t2).unionByName(t3)
      .withColumn("__sign", col("__sa") * col("__sb"))
      .drop("__sa", "__sb")
  }

  /** A base relation may arrive as a WEIGHTED bag — a state frame
    * whose `__mult` column is the row's multiplicity (r11: prefix
    * and walk states flow into the delta algebra directly instead of
    * being exploded row-per-count, which for walk counts could mean
    * degree^h rows per pair). The weight becomes the old side's sign
    * factor, which is exactly what explosion would have summed to.
    * Unit-weight relations (no `__mult`) behave as before.
    */
  private def weighted(rel: DataFrame, signCol: String): DataFrame =
    if (rel.columns.contains("__mult"))
      rel.withColumn(signCol, col("__mult").cast("long")).drop("__mult")
    else rel.withColumn(signCol, lit(1L))

  /** LAZY localCheckpoint + count fused into ONE driver job (r12
    * verdict #4): the family's eager checkpoint-then-count idiom paid
    * two scheduler round-trips per fixpoint round — the checkpoint
    * job materialized the frame, then the count re-read it. The first
    * action on a lazily-marked checkpoint materializes it, so the
    * count IS the materialization. On a real cluster each saved job
    * is a driver→executor round-trip; at view-catalog scale (hundreds
    * of views per batch) the job count is the refresh latency floor.
    *
    * Lazy-checkpoint discipline for frames WITHOUT a fused count
    * ([[lazyCut]]): safe exactly when some later action in the same
    * fold touches the frame before its INPUTS are unpersisted —
    * inside a fold every input is a materialized checkpoint, so a
    * deferred materialization never re-derives through the catalog's
    * replaced state. Frames handed to `catalog.put` stay EAGER (the
    * put boundary is the state's materialization contract).
    */
  private def cutCount(df: DataFrame): (DataFrame, Long) = {
    val c = df.localCheckpoint(false)
    (c, c.count())
  }

  private def lazyCut(df: DataFrame): DataFrame = df.localCheckpoint(false)

  /** AQE-off scope for creating PARTITION-CARRYING checkpoints.
    * Dataset.localCheckpoint captures the physical plan's
    * outputPartitioning/outputOrdering into the returned LogicalRDD —
    * but only usefully with AQE off at CREATION time: under AQE the
    * captured partitioning degrades to unknown (measured,
    * PartitionProbe r12 — consumers plan an ENSURE_REQUIREMENTS
    * exchange over the checkpointed scan with AQE on at creation,
    * and no exchange / no sort with it off). The scope covers only
    * the checkpoint's own planning; consumer queries keep AQE.
    */
  private val aqeLock = new Object
  private def aqeOff[A](spark: SparkSession)(f: => A): A =
    // the conf is SESSION-global: two concurrent maintainers (the
    // batch journal's foreachBatch use case) racing on set/restore
    // could capture an AQE-degraded layout into a checkpoint or
    // leave AQE off session-wide. Serialized under one monitor —
    // callers scope `f` to PLANNING only (a lazy localCheckpoint
    // builds its LogicalRDD at call time; materialization happens
    // outside the lock), so the critical section holds no jobs.
    aqeLock.synchronized {
      val key = "spark.sql.adaptive.enabled"
      val prev = spark.conf.get(key, "true")
      spark.conf.set(key, "false")
      try f finally spark.conf.set(key, prev)
    }

  /** One state-sized shuffle that buys shuffle-free membership joins
    * for every later fold round and refresh: hash-partition + sort on
    * `keyCols`, checkpoint eagerly with the layout carried into the
    * LogicalRDD ([[aqeOff]]). EnsureRequirements then plans every
    * equi/semi/anti join on these keys with NO exchange and NO sort
    * on this side — only the window-sized probe side shuffles.
    */
  private def partitionedCkpt(df: DataFrame, keyCols: Seq[String])
      : (DataFrame, Long) = {
    // lazy checkpoint planned under the AQE-off lock, then ONE count
    // job (outside the lock) that both materializes it and yields
    // the row count — the count rides the job the eager checkpoint
    // already paid, so callers get the core's cardinality for free
    // (carried across refreshes as `!coreCnt` meta; finish()'s
    // compaction test then needs no state scan)
    val c = aqeOff(df.sparkSession) {
      df.repartition(keyCols.map(col): _*)
        .sortWithinPartitions(keyCols.map(col): _*)
        .localCheckpoint(false)
    }
    (c, c.count())
  }

  /** Lazy checkpoint of a frame DERIVED from a partitioned core by
    * layout-preserving operators (broadcast joins, filters, alias
    * projections) — the carried partitioning/ordering survives into
    * the new checkpoint (PartitionProbe case 3), so a filtered core
    * keeps serving exchange-free joins.
    */
  private def preservedCkpt(df: DataFrame): DataFrame =
    aqeOff(df.sparkSession) { df.localCheckpoint(false) }

  /** Rows of `df`'s shape that fit the session broadcast budget:
    * `spark.sql.autoBroadcastJoinThreshold` divided by the schema's
    * estimated row width — the byte-derived stand-in for the old
    * fixed 4M-row cap (r11 verdict: 4M rows of a 3-long delta is
    * ~100 MB, an order past the 10 MB default the rest of the plan
    * broadcasts under; a row count must track the row SHAPE). A
    * disabled threshold (-1/0) or an unparsable value falls back to
    * the byte budget of the Spark default (10 MB).
    */
  private[graft] def broadcastRowBudget(df: DataFrame): Long = {
    val raw = try df.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    catch { case _: Throwable => "10485760" }
    val m = "(?i)^(-?\\d+)\\s*(b|kb?|mb?|gb?|tb?|pb?)?$".r
      .findFirstMatchIn(raw.trim)
    val bytes = m.map { mm =>
      val n = mm.group(1).toLong
      Option(mm.group(2)).map(_.toLowerCase.head) match {
        case Some('k') => n << 10
        case Some('m') => n << 20
        case Some('g') => n << 30
        case Some('t') => n << 40
        case Some('p') => n << 50
        case _ => n
      }
    }.filter(_ > 0).getOrElse(10L << 20)
    math.max(1L, bytes / math.max(df.schema.defaultSize.toLong, 8L))
  }

  /** THE broadcast license (r13): `rows` fits when it is under both
    * the caller's policy row ceiling and the byte budget derived from
    * this frame's row shape. One definition so a budget-policy change
    * lands once (previously restated at three call sites).
    */
  private[graft] def fitsBudget(df: DataFrame, rows: Long,
      ceiling: Long): Boolean =
    rows <= math.min(ceiling, broadcastRowBudget(df))

  /** Fold a signed join delta into multiset state: merge on the view
    * columns, sum multiplicities, drop rows whose net count reaches
    * zero.
    *
    * SHUFFLE-FREE on the state side (r11): the old form unioned
    * state ∪ delta and re-grouped — a STATE-sized shuffle on every
    * refresh, the one per-refresh network cost that would not be
    * window-bounded at cluster scale (ViewScaleProbe's shuffle
    * column measured it as the dominant refresh shuffle). Now the
    * delta nets to per-key sums first (delta-sized shuffle), and the
    * state is only SCANNED: a broadcast left-outer merges matched
    * keys in place, and the unmatched delta keys append through a
    * broadcast anti-join against the (≤ delta-sized) matched-key
    * frame. Costs one extra delta-sized action (the net count) and
    * one extra state scan; removes the state shuffle entirely.
    * Windows too wide to broadcast fall back to the classic
    * union-regroup, which is the right plan when the delta is
    * state-sized anyway. The cap is BYTE-derived by default
    * ([[broadcastRowBudget]]: autoBroadcastJoinThreshold over the
    * netted delta's row width); pass an explicit `broadcastCap` to
    * override (0 forces the regroup path).
    */
  def mergeJoinDelta(state: DataFrame, delta: DataFrame,
      broadcastCap: Long = -1L): DataFrame = {
    val cols = state.columns.filterNot(_ == "__mult")
    val (dAgg, dCnt) = cutCount(delta
      .select(cols.map(col) :+ col("__sign").cast("long").as("__m"): _*)
      .groupBy(cols.map(col): _*)
      .agg(sum("__m").as("__dm")))
    val cap = if (broadcastCap >= 0) broadcastCap else broadcastRowBudget(dAgg)
    if (dCnt > cap)
      return state.select(cols.map(col) :+ col("__mult").as("__m"): _*)
        .unionByName(dAgg.select(cols.map(col) :+ col("__dm").as("__m"): _*))
        .groupBy(cols.map(col): _*)
        .agg(sum("__m").as("__mult"))
        .filter(col("__mult") > 0)
    val merged = state.join(broadcast(dAgg), cols.toSeq, "left_outer")
      .select(cols.map(col) :+
        (col("__mult") + coalesce(col("__dm"), lit(0L))).as("__mult"): _*)
      .filter(col("__mult") > 0)
    // keys present in BOTH — ≤ |delta| rows off one state scan; the
    // (lazy) checkpoint keeps the anti-join below from re-scanning
    // the state once the consumer's first action materializes it
    val matched = lazyCut(state.join(broadcast(dAgg), cols.toSeq, "left_semi")
      .select(cols.map(col): _*))
    val inserts = dAgg.join(broadcast(matched), cols.toSeq, "left_anti")
      .select(cols.map(col) :+ col("__dm").as("__mult"): _*)
      .filter(col("__mult") > 0)
    merged.unionByName(inserts)
  }

  /** [[mergeJoinDelta]] fused with the MEMBERSHIP ops its fold
    * implies (the keys whose net count crosses zero) — a sub-state's
    * consumer (the composed-chain fold) needs both, and deriving the
    * ops as `new-state ANTI old-state` both ways shuffled two
    * state-sized frames per refresh (ViewScaleProbe measured that
    * anti-join pair as the dominant composed-class refresh shuffle
    * once the walk bases were stored — r11 stage D). One netted
    * delta (delta-sized shuffle) and ONE extra state scan (the
    * `touched` inner probe) serve merge AND ops: `remove` where an
    * existing key's count reaches zero, `add` where a positive net
    * lands on an absent key; keys whose count moves but stays
    * positive emit nothing. Windows too wide to broadcast fall back
    * to union-regroup + the anti-join diff, proportionate when the
    * delta is state-sized. Returns (merged state, ±op key rows) —
    * both lazy on the broadcast path (callers checkpoint), the
    * fallback's merged state checkpointed so the diff does not
    * re-execute it.
    */
  def mergeJoinDeltaWithOps(state: DataFrame, delta: DataFrame,
      broadcastCap: Long = -1L): (DataFrame, DataFrame) = {
    val cols = state.columns.filterNot(_ == "__mult")
    val (dAgg, dCnt) = cutCount(delta
      .select(cols.map(col) :+ col("__sign").cast("long").as("__m"): _*)
      .groupBy(cols.map(col): _*)
      .agg(sum("__m").as("__dm"))
      .filter(col("__dm") =!= 0))
    val cap = if (broadcastCap >= 0) broadcastCap else broadcastRowBudget(dAgg)
    if (dCnt > cap) {
      val s1 = state
        .select(cols.map(col) :+ col("__mult").as("__m"): _*)
        .unionByName(dAgg.select(cols.map(col) :+ col("__dm").as("__m"): _*))
        .groupBy(cols.map(col): _*)
        .agg(sum("__m").as("__mult"))
        .filter(col("__mult") > 0)
        .localCheckpoint()
      val k0 = state.select(cols.map(col): _*)
      val k1 = s1.select(cols.map(col): _*)
      return (s1, k1.join(k0, cols.toSeq, "left_anti")
        .select(cols.map(col) :+ lit("add").as("op"): _*)
        .unionByName(k0.join(k1, cols.toSeq, "left_anti")
          .select(cols.map(col) :+ lit("remove").as("op"): _*)))
    }
    // keys present in BOTH state and delta, with both counts — one
    // state scan feeds the merge, the inserts, and the ops (lazy:
    // the consumer's first action materializes it once)
    val touched = lazyCut(state.join(broadcast(dAgg), cols.toSeq)
      .select(cols.map(col) ++ Seq(col("__mult"), col("__dm")): _*))
    val merged = state.join(broadcast(dAgg), cols.toSeq, "left_outer")
      .select(cols.map(col) :+
        (col("__mult") + coalesce(col("__dm"), lit(0L))).as("__mult"): _*)
      .filter(col("__mult") > 0)
    val freshKeys = dAgg.join(broadcast(touched.select(cols.map(col): _*)),
      cols.toSeq, "left_anti")
    val inserts = freshKeys
      .select(cols.map(col) :+ col("__dm").as("__mult"): _*)
      .filter(col("__mult") > 0)
    val removes = touched.filter(col("__mult") + col("__dm") <= 0)
      .select(cols.map(col) :+ lit("remove").as("op"): _*)
    val adds = freshKeys.filter(col("__dm") > 0)
      .select(cols.map(col) :+ lit("add").as("op"): _*)
    (merged.unionByName(inserts), removes.unionByName(adds))
  }

  /** Just the membership ops of [[mergeJoinDeltaWithOps]] — for
    * callers that fold the state elsewhere.
    */
  def stateMembershipOps(state: DataFrame, delta: DataFrame,
      broadcastCap: Long = -1L): DataFrame =
    mergeJoinDeltaWithOps(state, delta, broadcastCap)._2

  /** The maintained join view as plain rows (multiplicity expanded). */
  def finalizeJoin(state: DataFrame): DataFrame = {
    val cols = state.columns.filterNot(_ == "__mult")
    state.select(cols.map(col) :+
        explode(sequence(lit(1L), col("__mult"))).as("__i"): _*)
      .drop("__i")
  }

  // ---- V5c: incremental GQL pattern views -------------------------

  /** Signed delta of a single-hop label-filtered MATCH-pattern view
    * `(a:srcLabel)-[:edgeLabel]->(b:dstLabel)` between two versions
    * of an (immutable) GraphStore, derived from its change feed —
    * so a REGISTERED pattern view refreshes at delta cost instead of
    * re-running the MATCH (the reference recomputes pattern views on
    * refresh; its incremental engine covers only aggregates,
    * incremental_engine.rs:464-648).
    *
    * The three-way Δ(V⋈E⋈V) composes the two-way signed rule twice:
    * Δ(A⋈E) feeds as the delta side of Δ((A⋈E)⋈B), with signs
    * multiplying through — the ΔΔ cross terms are exactly what keeps
    * simultaneous vertex+edge changes (e.g. remove_vertex cascading
    * its edges) from double-counting.
    *
    * Deltas are NET per key: membership of every feed-touched key is
    * compared between the two stores (add = gained, remove = lost),
    * so arbitrary chained windows (add then remove, cascaded edge
    * removal the feed does not spell out, re-add of a removed id,
    * a prop update that flips a predicate) resolve to their end
    * state. Patterns may carry per-position VERTEX PREDICATES
    * (deterministic Column filters over the vertex frame —
    * `(a:Person {active: true})` shapes): update_vertex_props ops
    * join the touched set, and the membership compare evaluates the
    * predicate on both stores, so prop flips enter and leave the
    * view incrementally like any other delta.
    *
    * Cost: base tables are SCANNED with broadcast semi-joins on the
    * feed-touched keys and never shuffled; every join in the
    * composed rule broadcasts a delta side ([[joinViewDelta]]), so
    * refresh cost scales with the change window, not V or E.
    *
    * `undirected = true` maintains `(a:L1)-[:e]-(b:L2)` — the hop
    * relation is the BAG E ∪ Eᵀ exactly like the executor's
    * Undirected orientation union (GqlExecutor.matchPattern), so a
    * reciprocal pair contributes multiplicity 2 and a self-loop
    * matches (v, v) twice; the multiset state absorbs both.
    */
  def patternViewDelta(oldStore: graft.graph.GraphStore,
      newStore: graft.graph.GraphStore, srcLabel: String,
      edgeLabel: String, dstLabel: String,
      srcPred: Option[Column] = None,
      dstPred: Option[Column] = None,
      edgePred: Option[Column] = None,
      undirected: Boolean = false): DataFrame =
    patternChainViewDelta(oldStore, newStore,
      Seq(srcLabel, dstLabel), Seq(edgeLabel), Seq(srcPred, dstPred),
      Seq(edgePred), Seq(undirected))
      .withColumnRenamed("c0", "src").withColumnRenamed("c1", "dst")

  /** K-HOP generalization: signed delta of the chain view
    * `(c0:l0)-[:e1]->(c1:l1)-...-[:ek]->(ck:lk)` — column `ci` is the
    * position-i vertex id. The two-level composition folds once per
    * hop by induction: ΔP_i (as ±1 op rows) feeds the next hop's
    * first level, so Δ(P_{i-1}⋈E_i⋈V_i) stays exact for arbitrary
    * simultaneous vertex+edge windows at every depth; the old chain
    * prefix P_{i-1} is a lazy join of label-filtered base scans that
    * each delta term reads with the delta side broadcast (bases
    * scanned, never shuffled — the joinViewDelta economics at every
    * level). A registered multi-hop MATCH view therefore refreshes
    * at change-window cost too, with per-hop constant work.
    *
    * `undirectedHops(i)` makes hop i+1 undirected: that hop's edge
    * base AND edge delta are symmetrized to the bag E ∪ Eᵀ (each
    * edge op contributes ±1 in both orientations), which is exactly
    * the executor's Undirected orientation union — per-hop, so
    * chains may mix `->` and `-` positions.
    *
    * `hopOverrides(i)` substitutes hop i+1's relation entirely: the
    * provider receives the hop's (srcCol, dstCol) names and returns
    * (oldRelation, ±1 op rows) — the composed var-length machinery
    * ([[refreshComposedChainView]]) injects a counting sub-state's
    * DISTINCT-pair membership this way, and the algebra is
    * indifferent to where a hop relation comes from as long as
    * old + ops = new.
    *
    * SHUFFLE POSTURE (r11): the second level of each hop folds
    * through [[level2Delta]], which reassociates the old-side probe
    * term to P_old ⋈ (E_old ⋈ broadcast(ΔV)) — so the prefix
    * relation is only ever SCANNED with a window-sized broadcast
    * probe, never re-joined against the vertex delta. With
    * `prefixOld` supplied (the catalog refreshers pass their stored
    * per-level prefix bags, maintained under `name!p<i>`), every
    * big frame in the whole fold is a stored scan and the only
    * shuffles are delta-sized: ViewScaleProbe measured the lazy
    * prefix re-joins as the dominant refresh shuffle once the
    * state-merge shuffle was removed. Stateless callers (no
    * `prefixOld`) keep the lazy prefix join — correct, and still one
    * association level cheaper than the pre-r11 form.
    * `onLevelDelta(i, signedCut, cnt)` fires once per interior level
    * with the (checkpointed) level delta and its fused row count so
    * the caller can fold its prefix state forward without spending
    * an isEmpty action.
    */
  def patternChainViewDelta(oldStore: graft.graph.GraphStore,
      newStore: graft.graph.GraphStore, vertexLabels: Seq[String],
      edgeLabels: Seq[String],
      vertexPreds: Seq[Option[Column]] = Nil,
      edgePreds: Seq[Option[Column]] = Nil,
      undirectedHops: Seq[Boolean] = Nil,
      hopOverrides: Map[Int, (String, String) => (DataFrame, DataFrame)] =
        Map.empty,
      prefixOld: Map[Int, DataFrame] = Map.empty,
      onLevelDelta: (Int, DataFrame, Long) => Unit = (_, _, _) => ())
      : DataFrame = {
    require(vertexLabels.size == edgeLabels.size + 1 && edgeLabels.nonEmpty,
      s"chain wants k+1 vertex labels for k>=1 edge labels, got " +
        s"${vertexLabels.size}/${edgeLabels.size}")
    val preds = if (vertexPreds.isEmpty)
      Seq.fill(vertexLabels.size)(None: Option[Column]) else vertexPreds
    require(preds.size == vertexLabels.size,
      s"vertexPreds wants one entry per vertex label")
    val epreds = if (edgePreds.isEmpty)
      Seq.fill(edgeLabels.size)(None: Option[Column]) else edgePreds
    require(epreds.size == edgeLabels.size,
      s"edgePreds wants one entry per edge label")
    val undir = if (undirectedHops.isEmpty)
      Seq.fill(edgeLabels.size)(false) else undirectedHops
    require(undir.size == edgeLabels.size,
      s"undirectedHops wants one entry per edge label")
    val feed = newStore.changes.filter(col("version") > oldStore.version)
    // Every intermediate here is DELTA-sized, and each is read by
    // several downstream joins/broadcasts; left UNCHECKPOINTED, the
    // tree re-executes multiplicatively (the level-1 delta re-runs
    // the edge delta up to 3×, which runs touched-keys 2×, which runs
    // the incident scans 3× — measured 32 s for a 9-op window at
    // sf0.1, ~3 s once cut). A LAZY checkpoint mark (r12) keeps the
    // compute-exactly-once property — the first consumer job
    // materializes the frame, later consumers read blocks — while
    // dropping the standalone eager-materialization job each frame
    // used to pay: the chain fold's per-refresh driver-job count
    // roughly halves (ViewScaleProbe's jobsRefresh column).
    def cut(df: DataFrame): DataFrame = lazyCut(df)
    // update_vertex_props joins the touched set: for a predicated
    // position the update can flip membership; for label-only
    // positions the NET compare below yields no delta row, so the
    // wider set costs nothing but a few extra probe keys
    val touchedV = feedTouchedV(oldStore, newStore)
    def vFilter(label: String, pred: Option[Column]): Column =
      pred.foldLeft(col("label") === label)(_ && _)
    def members(store: graft.graph.GraphStore, label: String,
        pred: Option[Column]) =
      touchedV.semi(store.vertices.filter(vFilter(label, pred)), "id")
        .select("id")
    def vDelta(pos: Int, keyName: String): DataFrame = {
      val o = members(oldStore, vertexLabels(pos), preds(pos))
      val n = members(newStore, vertexLabels(pos), preds(pos))
      cut(n.join(o, Seq("id"), "left_anti")
        .select(lit("add").as("op"), col("id").as(keyName))
        .unionByName(o.join(n, Seq("id"), "left_anti")
          .select(lit("remove").as("op"), col("id").as(keyName))))
    }
    // edge keys the window could have changed: explicit edge ops
    // (incl. prop updates, which can flip a predicated edge's
    // membership) on this label + every old/new edge of this label
    // incident to a touched vertex (cascades are not spelled out in
    // the feed)
    def eDelta(edgeLabel: String, pred: Option[Column], srcName: String,
        dstName: String, sym: Boolean): DataFrame = {
      val explicitE = feed.filter(
          col("op").isin("add_edge", "remove_edge", "update_edge_props")
            && col("elabel") === edgeLabel)
        .select(col("src"), col("dst")).distinct()
      def incident(store: graft.graph.GraphStore) = {
        val e = store.edges.filter(col("label") === edgeLabel)
        touchedV.semi(e, "src").unionByName(touchedV.semi(e, "dst"))
          .select(col("src"), col("dst"))
      }
      val touchedE = cut(explicitE.unionByName(incident(oldStore))
        .unionByName(incident(newStore)).distinct())
      def eMembers(store: graft.graph.GraphStore) =
        store.edges.filter(
            pred.foldLeft(col("label") === edgeLabel)(_ && _))
          .join(broadcast(touchedE), Seq("src", "dst"), "left_semi")
          .select("src", "dst")
      val eo = eMembers(oldStore)
      val en = eMembers(newStore)
      // membership nets on the STORED orientation; symmetrization
      // happens after, so an undirected hop's op contributes ±1 in
      // both orientations (bag semantics — reciprocal edges and
      // self-loops keep their multiplicities)
      val net = en.join(eo, Seq("src", "dst"), "left_anti")
        .select(lit("add").as("op"), col("src"), col("dst"))
        .unionByName(eo.join(en, Seq("src", "dst"), "left_anti")
          .select(lit("remove").as("op"), col("src"), col("dst")))
      val netSym = if (!sym) net else net.unionByName(
        net.select(col("op"), col("dst").as("src"), col("src").as("dst")))
      cut(netSym)
        .select(col("op"), col("src").as(srcName), col("dst").as(dstName))
    }
    def vOld(pos: Int, name: String) =
      oldStore.vertices.filter(vFilter(vertexLabels(pos), preds(pos)))
        .select(col("id").as(name))
    def opify(signed: DataFrame): DataFrame =
      cut(signed.withColumn("op",
        when(col("__sign") > 0, lit("add")).otherwise(lit("remove")))
        .drop("__sign"))
    // fold the two-level rule across hops: chainOld/deltaOps always
    // describe the prefix view P_{i-1} over columns c0..c_{i-1}
    var chainOld = vOld(0, "c0")
    var deltaOps = vDelta(0, "c0")
    var signed: DataFrame = null
    for (i <- 1 to edgeLabels.size) {
      val s = s"c${i - 1}"
      val d = s"c$i"
      val (e, eOps) = hopOverrides.get(i - 1) match {
        case Some(provider) => provider(s, d)
        case None =>
          val eBase = oldStore.edges.filter(
              epreds(i - 1).foldLeft(col("label") === edgeLabels(i - 1))(_ && _))
            .select(col("src"), col("dst"))
          val sym = (if (!undir(i - 1)) eBase
            else eBase.unionByName(
              eBase.select(col("dst").as("src"), col("src").as("dst"))))
            .select(col("src").as(s), col("dst").as(d))
          (sym, eDelta(edgeLabels(i - 1), epreds(i - 1), s, d, undir(i - 1)))
      }
      val d1 = joinViewDelta(chainOld, deltaOps, e, eOps, Seq(s))
      // re-expressed as op rows so the next level's sign validation
      // and broadcasts apply unchanged (each row is exactly ±1)
      val v = vOld(i, d)
      signed = level2Delta(chainOld, e, v, opify(d1), vDelta(i, d), s, d)
      if (i < edgeLabels.size) {
        // fused: one job materializes the level delta AND yields the
        // count the prefix-state fold branches on
        val (sc, scCnt) = cutCount(signed)
        signed = sc
        onLevelDelta(i, sc, scCnt)
        chainOld = prefixOld.getOrElse(i, chainOld.join(e, s).join(v, d))
        deltaOps = opify(signed)
      }
    }
    signed
  }

  /** Second-level chain delta Δ((P ⋈ E) ⋈ V), REASSOCIATED so both
    * big relations are scanned with broadcast probes instead of the
    * old-side term re-executing the lazy P ⋈ E join:
    *
    *   t1 = ΔA ⋈ V_old          (ΔA = Δ(P⋈E) op rows, broadcast)
    *   t2 = P_old ⋈ (E_old ⋈ ΔV) (equi-join associativity — the
    *        window-sized E-slice broadcasts into the prefix scan)
    *   t3 = ΔA ⋈ ΔV             (the simultaneous-window cross term)
    *
    * Identical bag to joinViewDelta(P ⋈ E, ΔA, V, ΔV) — same three
    * terms, same sign products — with P ⋈ E never materialized on
    * the probe path.
    */
  private def level2Delta(pOld: DataFrame, eOld: DataFrame,
      vOld: DataFrame, dA: DataFrame, dV: DataFrame,
      joinP: String, joinV: String): DataFrame = {
    val sA = dA.withColumn("__sa", validatedSign).drop("op")
    val sV = dV.withColumn("__sb", validatedSign).drop("op")
    val t1 = broadcast(sA).join(vOld.withColumn("__sb", lit(1)), joinV)
    val eTouched = eOld.join(broadcast(sV), joinV)
    val t2 = pOld.withColumn("__sa", lit(1))
      .join(broadcast(eTouched), joinP)
    val t3 = broadcast(sA).join(sV, joinV)
    t1.unionByName(t2).unionByName(t3)
      .withColumn("__sign", col("__sa") * col("__sb"))
      .drop("__sa", "__sb")
  }

  /** Bootstrap pattern-view state: the matched (src, dst) pairs with
    * multiplicity (1 by store construction — ids and edge keys are
    * unique — but kept as multiset state so [[mergeJoinDelta]]'s
    * net-zero drop applies unchanged).
    */
  def initPatternState(store: graft.graph.GraphStore, srcLabel: String,
      edgeLabel: String, dstLabel: String,
      srcPred: Option[Column] = None,
      dstPred: Option[Column] = None,
      edgePred: Option[Column] = None,
      undirected: Boolean = false): DataFrame =
    initPatternChainState(store, Seq(srcLabel, dstLabel), Seq(edgeLabel),
      Seq(srcPred, dstPred), Seq(edgePred), Seq(undirected))
      .withColumnRenamed("c0", "src").withColumnRenamed("c1", "dst")

  /** Chain-state bootstrap: the matched (c0..ck) tuples with
    * multiplicity.
    */
  def initPatternChainState(store: graft.graph.GraphStore,
      vertexLabels: Seq[String], edgeLabels: Seq[String],
      vertexPreds: Seq[Option[Column]] = Nil,
      edgePreds: Seq[Option[Column]] = Nil,
      undirectedHops: Seq[Boolean] = Nil,
      hopOverrides: Map[Int, (String, String) => DataFrame] =
        Map.empty): DataFrame = {
    val preds = if (vertexPreds.isEmpty)
      Seq.fill(vertexLabels.size)(None: Option[Column]) else vertexPreds
    val epreds = if (edgePreds.isEmpty)
      Seq.fill(edgeLabels.size)(None: Option[Column]) else edgePreds
    val undir = if (undirectedHops.isEmpty)
      Seq.fill(edgeLabels.size)(false) else undirectedHops
    def vF(pos: Int, name: String) =
      store.vertices.filter(
        preds(pos).foldLeft(col("label") === vertexLabels(pos))(_ && _))
        .select(col("id").as(name))
    val joined = (1 to edgeLabels.size).foldLeft(vF(0, "c0")) { (acc, i) =>
      val hop = hopOverrides.get(i - 1) match {
        case Some(provider) => provider(s"c${i - 1}", s"c$i")
        case None =>
          val eBase = store.edges.filter(
              epreds(i - 1).foldLeft(col("label") === edgeLabels(i - 1))(_ && _))
            .select(col("src"), col("dst"))
          val e = if (!undir(i - 1)) eBase
            else eBase.unionByName(
              eBase.select(col("dst").as("src"), col("src").as("dst")))
          e.select(col("src").as(s"c${i - 1}"), col("dst").as(s"c$i"))
      }
      acc.join(hop, s"c${i - 1}").join(vF(i, s"c$i"), s"c$i")
    }
    joined.groupBy(joined.columns.map(col): _*)
      .agg(count(lit(1)).as("__mult"))
  }

  /** Per-level PREFIX states for a catalog-backed k-hop chain view
    * (r11): the prefix bags P_1..P_{k-1} live under `name!p<i>` so
    * every refresh reads them as stored scans instead of lazily
    * re-joining the prefix pipeline once per level — ViewScaleProbe
    * measured those re-joins as the dominant refresh shuffle.
    * Returns (prefixOld relations for the delta fold, the fold
    * callback that merges each level's delta forward — skipping the
    * state rewrite entirely when a level's delta is empty).
    * Bootstrap of an absent prefix state joins once on the OLD store
    * (the same work the lazy path did per refresh, paid once).
    */
  private def chainPrefixHooks(catalog: ViewCatalog, name: String,
      oldStore: graft.graph.GraphStore,
      vertexLabels: Seq[String], edgeLabels: Seq[String],
      preds: Seq[Option[Column]], epreds: Seq[Option[Column]],
      undir: Seq[Boolean],
      bootOverrides: Map[Int, (String, String) => DataFrame] = Map.empty)
      : (Map[Int, DataFrame], (Int, DataFrame, Long) => Unit) = {
    val oldStates = (1 until edgeLabels.size).map { i =>
      i -> catalog.dataOf(s"$name!p$i").getOrElse(
        initPatternChainState(oldStore,
          vertexLabels.take(i + 1), edgeLabels.take(i),
          preds.take(i + 1), epreds.take(i), undir.take(i),
          bootOverrides.filter(_._1 < i)).localCheckpoint())
    }.toMap
    val fold = (i: Int, signed: DataFrame, cnt: Long) => {
      // the fused level count replaces the old isEmpty action (r12)
      if (cnt > 0) {
        val s1 = mergeJoinDelta(oldStates(i), signed).localCheckpoint()
        catalog.put(s"$name!p$i", s1)
      } else if (catalog.dataOf(s"$name!p$i").isEmpty)
        catalog.put(s"$name!p$i", oldStates(i)) // persist the bootstrap
    }
    (oldStates.map { case (i, st) => i -> finalizeJoin(st) }, fold)
  }

  /** Catalog-driven refresh of a registered k-hop chain view — the
    * multi-hop form of [[refreshPatternView]], same materialize-state
    * contract, plus per-level prefix states ([[chainPrefixHooks]]).
    */
  def refreshPatternChainView(catalog: ViewCatalog, name: String,
      oldStore: graft.graph.GraphStore, newStore: graft.graph.GraphStore,
      vertexLabels: Seq[String], edgeLabels: Seq[String],
      vertexPreds: Seq[Option[Column]] = Nil,
      edgePreds: Seq[Option[Column]] = Nil,
      undirectedHops: Seq[Boolean] = Nil): DataFrame = {
    val preds = if (vertexPreds.isEmpty)
      Seq.fill(vertexLabels.size)(None: Option[Column]) else vertexPreds
    val epreds = if (edgePreds.isEmpty)
      Seq.fill(edgeLabels.size)(None: Option[Column]) else edgePreds
    val undir = if (undirectedHops.isEmpty)
      Seq.fill(edgeLabels.size)(false) else undirectedHops
    val state0 = catalog.dataOf(s"$name!state").getOrElse(
      initPatternChainState(oldStore, vertexLabels, edgeLabels,
        preds, epreds, undir))
    val (prefixOld, fold) = chainPrefixHooks(catalog, name, oldStore,
      vertexLabels, edgeLabels, preds, epreds, undir)
    val delta = patternChainViewDelta(oldStore, newStore,
      vertexLabels, edgeLabels, preds, epreds, undir,
      prefixOld = prefixOld, onLevelDelta = fold)
    val state1 = mergeJoinDelta(state0, delta).localCheckpoint()
    catalog.put(s"$name!state", state1)
    val view = finalizeJoin(state1)
    catalog.put(name, view)
    view
  }

  // ---- V5d: var-length pattern views (counting maintenance) -------

  private def requireHops(minHops: Int, maxHops: Int): Unit =
    require(minHops >= 1 && minHops <= maxHops && maxHops <= 6,
      s"var-length views maintain hop ranges within [1, 6], got " +
        s"*$minHops..$maxHops — each refresh folds one delta level per " +
        "length, so a wide bounded range has per-length refresh cost; " +
        "for UNBOUNDED reach register `*1..` (maintained as a " +
        "reachability view — refreshReachabilityView), or use " +
        "Algorithms.multiSourceBfs as a recomputed view")

  /** Signed WALK-COUNT delta of the var-length pattern view
    * `(a:srcLabel)-[:edgeLabel*min..max]->(b:dstLabel)` between two
    * store versions. A bounded var-length segment is a NON-RECURSIVE
    * union of fixed-length chains, so the classic counting algorithm
    * applies and no DRed-style recursive re-derivation is ever
    * needed — that class starts at UNbounded reachability, which
    * [[requireHops]] rejects.
    *
    * The state the deltas fold into counts WALKS (per-length chain
    * multiplicities summed over h): an endpoint pair is in the view
    * iff its total walk count is positive, which matches the GQL
    * executor's non-path-tracked var-length semantics exactly —
    * including the interior treatment: like the executor's seeded
    * expansion (which walks the EDGE frame and never joins interior
    * vertices), interior positions are edge-implied, with cascades
    * arriving through the edge delta's incident scan. Counting is
    * what makes DELETION exact without recompute: removing one edge
    * subtracts exactly the walks that crossed it, and the pair
    * leaves the view only when its LAST supporting walk dies
    * (mergeJoinDelta's net-zero drop) — a membership-only state
    * could not tell "one of two paths died" from "the only path
    * died".
    *
    * Cost: ONE shared-prefix fold, not one chain delta per length —
    * every hop wears the same edge label, so the edge delta is
    * computed once and reused at every level, and length h's prefix
    * IS length h+1's (the per-length formulations only differ in
    * where the dst-label restriction lands, applied here as one
    * delta-sized join per emitted length). maxHops edge levels +
    * (max−min+1) dst restrictions total, every join broadcasting a
    * delta side, bases scanned never shuffled. Walk counts can grow
    * like degree^max on dense graphs — a long holds degree^6 for any
    * realistic degree, and the range cap also bounds the state
    * multiplicities.
    *
    * SHUFFLE POSTURE (r11, stage D): the walk bases are COMPRESSED
    * COUNTED PAIRS — level i's base is the bag W_i(c0, c_i, __mult) =
    * number of i-hop walks c0⇝c_i, which is all any later join reads
    * (interiors are never referenced again), and each level's delta
    * nets to per-pair signed counts before it broadcasts into the
    * next level. With `walkOld` supplied (the catalog refreshers pass
    * their stored per-level walk bags, maintained under `name!w<i>`
    * by [[walkHooks]]), every walk base is a STORED SCAN instead of a
    * lazy join pipeline re-executed once per downstream term — the
    * residual refresh shuffle ViewScaleProbe measured in the composed
    * class after the chain-level r11 fixes ("the same disease, one
    * layer down"). The emission's dst-delta term is reassociated like
    * [[level2Delta]]: W_{h-1} ⋈ (E ⋈ broadcast(ΔV_dst)) — so no
    * W_max state is ever needed. `onWalkDelta(i, netted)` fires once
    * per interior level for the caller's state fold; stateless
    * callers (no `walkOld`) keep lazy pair-compressed bases, still
    * strictly cheaper than the pre-r11 full-tuple pipelines.
    *
    * `undirected = true` maintains the UNDIRECTED form
    * `(a)-[:e*m..n]-(b)` — the executor's own `gql_varlength` shape:
    * walks run over the symmetrized relation E ∪ Eᵀ, realized by
    * symmetrizing the edge base and the edge delta (each edge op
    * contributes ±1 in BOTH orientations), which is exactly the hop
    * set the executor's expansion unions. Walk counting stays exact —
    * including back-and-forth walks like a–b–a, which the executor's
    * revisit-allowing semantics include as (a, a).
    */
  def varLengthViewDelta(oldStore: graft.graph.GraphStore,
      newStore: graft.graph.GraphStore, srcLabel: String,
      edgeLabel: String, dstLabel: String, minHops: Int, maxHops: Int,
      srcPred: Option[Column] = None,
      dstPred: Option[Column] = None,
      undirected: Boolean = false,
      walkOld: Map[Int, DataFrame] = Map.empty,
      onWalkDelta: (Int, DataFrame, Long) => Unit = (_, _, _) => ())
      : DataFrame = {
    requireHops(minHops, maxHops)
    val touchedV = feedTouchedV(oldStore, newStore)
    val dstOld = oldStore.vertices.filter(
      dstPred.foldLeft(col("label") === dstLabel)(_ && _))
    val dstDelta = windowVertexDelta(oldStore, newStore, dstLabel,
      dstPred, "__d", Some(touchedV))
    // shared-prefix fold over COUNTED PAIR bags: W_i(c0, c_i[, __mult])
    // = i-hop walk counts; emit Δ(W_h ⋈ V_dst) at each h ∈ [min, max]
    val emitted = scala.collection.mutable.Buffer[DataFrame]()
    walkFoldLevels(oldStore, newStore, srcLabel, edgeLabel, maxHops,
      srcPred, undirected, walkOld, (i, wPrev, e, dW, dwCnt, s, d) => {
        if (i >= minHops)
          emitted += walkEmitDelta(wPrev, e,
            dstOld.select(col("id").as(d)), dW,
            dstDelta.select(col("op"), col("__d").as(d)), s, d)
        if (i < maxHops) onWalkDelta(i, dW, dwCnt)
      }, Some(touchedV))
    emitted.reduce(_ unionByName _)
  }

  /** The feed-touched vertex-id set every window brick probes —
    * computed ONCE per refresh and passed as `sharedTouchedV` to
    * [[windowVertexDelta]] / [[walkFoldLevels]] / [[reachEdgeDelta]].
    *
    * Probe shape (r12): a normal change window is a HANDFUL of ids,
    * yet the old broadcast-semi-join form paid one broadcast-build
    * job per consumer query — JobTraceProbe attributed 52 of a
    * composed refresh's 76 jobs to broadcast builds, many of them
    * this frame over and over. [[IdProbe]] collects the set once
    * (one driver job) when it fits `collectCap` and probes as an
    * InSet FILTER pushed into each scan — zero per-consumer build
    * jobs, tighter codegen; an oversized window falls back to the
    * broadcast semi-join.
    */
  private[views] final class IdProbe(val df: DataFrame,
      ids: Option[Array[Long]]) {
    /** rows of `x` whose column `on` is in the touched set */
    def semi(x: DataFrame, on: String): DataFrame = ids match {
      case Some(a) if a.isEmpty => x.filter(lit(false))
      case Some(a) => x.filter(col(on).isInCollection(a))
      case None =>
        x.join(broadcast(df.select(col("id").as(on))), Seq(on), "left_semi")
    }
  }

  private val collectCap = 1 << 16

  /** Wrap a single-column id frame as an [[IdProbe]] — one bounded
    * collect; oversize sets stay as broadcast semi-joins.
    */
  private def idProbe(df: DataFrame): IdProbe = {
    val head = df.limit(collectCap + 1).collect()
    new IdProbe(df,
      if (head.length > collectCap) None
      else Some(head.map(_.getLong(0))))
  }

  private def feedTouchedV(oldStore: graft.graph.GraphStore,
      newStore: graft.graph.GraphStore): IdProbe =
    idProbe(newStore.changes.filter(col("version") > oldStore.version)
      .filter(col("op").isin("add_vertex", "remove_vertex",
        "update_vertex_props"))
      .select(col("id")).distinct().localCheckpoint(false))

  /** Net ±op membership delta of the `label`-filtered (optionally
    * predicated) vertex set between two store versions, restricted
    * to feed-touched ids — the vertex-delta brick every walk/chain
    * fold uses, extracted (r11) so folds that need several label
    * deltas share it.
    */
  private def windowVertexDelta(oldStore: graft.graph.GraphStore,
      newStore: graft.graph.GraphStore, label: String,
      pred: Option[Column], keyName: String,
      sharedTouchedV: Option[IdProbe] = None): DataFrame = {
    val touchedV = sharedTouchedV.getOrElse(
      feedTouchedV(oldStore, newStore))
    def members(store: graft.graph.GraphStore) =
      touchedV.semi(store.vertices.filter(
        pred.foldLeft(col("label") === label)(_ && _)), "id").select("id")
    val o = members(oldStore)
    val n = members(newStore)
    n.join(o, Seq("id"), "left_anti")
      .select(lit("add").as("op"), col("id").as(keyName))
      .unionByName(o.join(n, Seq("id"), "left_anti")
        .select(lit("remove").as("op"), col("id").as(keyName)))
      .localCheckpoint(false)
  }

  /** The counted-pair walk fold shared by [[varLengthViewDelta]] and
    * the lower-bounded reach composition: advances the walk bags
    * W_0..W_maxLevel through the change window, firing
    * `onLevel(i, wPrevOld, e, dW, dwCnt, s, d)` at every level with
    * the netted signed pair-count delta ΔW_i (checkpointed, row count
    * fused with its materialization — r12) (`wPrevOld` is
    * W_{i-1}'s old bag, `e` the old edge relation aliased (s, d)).
    * One edge delta serves every level (all hops share the label);
    * cascades arrive through the incident scans. `walkOld` substitutes
    * stored bags for the lazy prefix joins level by level.
    */
  private def walkFoldLevels(oldStore: graft.graph.GraphStore,
      newStore: graft.graph.GraphStore, srcLabel: String,
      edgeLabel: String, maxLevel: Int, srcPred: Option[Column],
      undirected: Boolean, walkOld: Map[Int, DataFrame],
      onLevel: (Int, DataFrame, DataFrame, DataFrame, Long, String,
        String) => Unit,
      sharedTouchedV: Option[IdProbe] = None): Unit = {
    val feed = newStore.changes.filter(col("version") > oldStore.version)
    val touchedV = sharedTouchedV.getOrElse(
      feedTouchedV(oldStore, newStore))
    // explicit edge ops + old/new edges incident to touched vertices
    // (cascades are not spelled out in the feed)
    val explicitE = feed.filter(
        col("op").isin("add_edge", "remove_edge", "update_edge_props")
          && col("elabel") === edgeLabel)
      .select(col("src"), col("dst")).distinct()
    def incident(store: graft.graph.GraphStore) = {
      val e = store.edges.filter(col("label") === edgeLabel)
      touchedV.semi(e, "src").unionByName(touchedV.semi(e, "dst"))
        .select(col("src"), col("dst"))
    }
    val touchedE = lazyCut(explicitE.unionByName(incident(oldStore))
      .unionByName(incident(newStore)).distinct())
    def eMembers(store: graft.graph.GraphStore) =
      store.edges.filter(col("label") === edgeLabel)
        .join(broadcast(touchedE), Seq("src", "dst"), "left_semi")
        .select("src", "dst")
    val eo = eMembers(oldStore)
    val en = eMembers(newStore)
    def sym(df: DataFrame): DataFrame =
      if (!undirected) df
      else df.unionByName(df.select(df.columns.map {
        case "src" => col("dst").as("src")
        case "dst" => col("src").as("dst")
        case c => col(c)
      }: _*))
    val eDelta = lazyCut(sym(en.join(eo, Seq("src", "dst"), "left_anti")
      .select(lit("add").as("op"), col("src"), col("dst"))
      .unionByName(eo.join(en, Seq("src", "dst"), "left_anti")
        .select(lit("remove").as("op"), col("src"), col("dst")))))
    val eOld = sym(oldStore.edges.filter(col("label") === edgeLabel)
      .select("src", "dst"))
    var wPrev = oldStore.vertices.filter(
        srcPred.foldLeft(col("label") === srcLabel)(_ && _))
      .select(col("id").as("c0"))
    var dPrev: DataFrame = windowVertexDelta(oldStore, newStore,
      srcLabel, srcPred, "c0", Some(touchedV))
    for (i <- 1 to maxLevel) {
      val s = s"c${i - 1}"
      val d = s"c$i"
      val e = eOld.select(col("src").as(s), col("dst").as(d))
      val dE = eDelta.select(col("op"), col("src").as(s), col("dst").as(d))
      // ΔW_i netted to signed per-pair counts — the one delta-sized
      // shuffle per level; downstream terms broadcast it. Count fused
      // with the checkpoint (one job), and passed to the callback so
      // state folds skip empty levels without an isEmpty action.
      val (dW, dwCnt) = cutCount(joinViewDelta(wPrev, dPrev, e, dE, Seq(s))
        .groupBy(col("c0"), col(d))
        .agg(sum("__sign").as("__sign"))
        .filter(col("__sign") =!= 0))
      onLevel(i, wPrev, e, dW, dwCnt, s, d)
      if (i < maxLevel) {
        // stateless fallback pair-compresses too: the lazy bag would
        // re-enumerate degree^h walk rows at every level and in every
        // downstream term — the blow-up the counted-pair form removes
        wPrev = walkOld.getOrElse(i, {
          val ext = wPrev.join(e, s)
          val m = if (ext.columns.contains("__mult"))
            sum("__mult").as("__mult") else count(lit(1)).as("__mult")
          ext.groupBy(col("c0"), col(d)).agg(m)
        })
        dPrev = dW
      }
    }
  }

  /** Emission term of the var-length fold: Δ(W_h ⋈_{d} V_dst) with
    * the old-side middle term REASSOCIATED (the [[level2Delta]]
    * move): W_h^old = W_{h-1}^old ⋈ E never materializes on the
    * probe path — the window-sized E-slice into touched dst vertices
    * broadcasts into the stored walk scan. ΔW_h arrives netted
    * (`__sign` counts, magnitude = net walk count), ΔV_dst as ±1 op
    * rows; returns (src, dst, __sign). Posture note: `eTouched`'s
    * size is the hop relation's fan-in to the touched dst set — for
    * an edge base that is per-vertex-degree bounded, so the default
    * path broadcasts without a measuring action; when the
    * lower-bounded composition passes the CLOSURE as `eOld`, a
    * touched hub dst can pull its whole reach-set slice into the
    * broadcast even while the closure itself is quiet (the recompute
    * switch one level up only fires on closure churn) — those
    * callers pass `gateETouched = true`, which spends one count on
    * the materialized slice and downgrades to a SHUFFLE_HASH join
    * when it exceeds the session broadcast budget
    * ([[broadcastRowBudget]]): a skew-safe shuffle instead of a
    * driver/executor OOM.
    */
  private def walkEmitDelta(wPrevOld: DataFrame, eOld: DataFrame,
      dstOld: DataFrame, dWalk: DataFrame, dDst: DataFrame,
      s: String, d: String, gateETouched: Boolean = false): DataFrame = {
    val sA = dWalk.withColumnRenamed("__sign", "__sa")
    val sV = dDst.withColumn("__sb", validatedSign).drop("op")
    val t1 = broadcast(sA).join(dstOld.withColumn("__sb", lit(1)), d)
      .select(col("c0"), col(d), col("__sa"), col("__sb"))
    val eTouched = {
      val raw = eOld.join(broadcast(sV), d)
      if (!gateETouched) broadcast(raw)
      else {
        val (eT, eTCnt) = cutCount(raw)
        if (eTCnt <= broadcastRowBudget(eT)) broadcast(eT)
        else eT.hint("shuffle_hash")
      }
    }
    val t2 = weighted(wPrevOld, "__sa").join(eTouched, s)
      .select(col("c0"), col(d), col("__sa"), col("__sb"))
    val t3 = broadcast(sA).join(sV, d)
      .select(col("c0"), col(d), col("__sa"), col("__sb"))
    t1.unionByName(t2).unionByName(t3)
      .select(col("c0").as("src"), col(d).as("dst"),
        (col("__sa") * col("__sb")).as("__sign"))
  }

  /** Per-level WALK states for a catalog-backed var-length view
    * (r11, stage D — the composed-class residual ViewScaleProbe
    * named): W_1..W_{maxHops−1} persist under `prefix!w<i>` as
    * counted pair bags, so every refresh reads them as stored scans
    * instead of lazily re-joining the walk pipeline once per level
    * per term. Bootstrap of an absent level extends the previous
    * level's bag by one edge join (cumulative — stored lower levels
    * are reused), paid once. Returns (walk bags keyed by level, the
    * fold callback that merges each level's netted delta forward —
    * skipping the state rewrite when a level's delta is empty).
    */
  private def walkHooks(catalog: ViewCatalog, prefix: String,
      oldStore: graft.graph.GraphStore, srcLabel: String,
      edgeLabel: String, maxHops: Int, srcPred: Option[Column],
      undirected: Boolean)
      : (Map[Int, DataFrame], (Int, DataFrame, Long) => Unit) = {
    val e1 = oldStore.edges.filter(col("label") === edgeLabel)
      .select("src", "dst")
    val e = if (!undirected) e1 else e1.unionByName(
      e1.select(col("dst").as("src"), col("src").as("dst")))
    var w = oldStore.vertices
      .filter(srcPred.foldLeft(col("label") === srcLabel)(_ && _))
      .select(col("id").as("c0"), lit(1L).as("__mult"))
    val oldStates = (1 until maxHops).map { i =>
      val s = s"c${i - 1}"
      val d = s"c$i"
      w = catalog.dataOf(s"$prefix!w$i").getOrElse(
        w.join(e.select(col("src").as(s), col("dst").as(d)), s)
          .groupBy(col("c0"), col(d)).agg(sum("__mult").as("__mult"))
          .localCheckpoint())
      i -> w
    }.toMap
    val fold = (i: Int, dW: DataFrame, dwCnt: Long) => {
      // the fused level count replaces the old isEmpty action (r12)
      if (dwCnt > 0) {
        val s1 = mergeJoinDelta(oldStates(i), dW).localCheckpoint()
        catalog.put(s"$prefix!w$i", s1)
      } else if (catalog.dataOf(s"$prefix!w$i").isEmpty)
        catalog.put(s"$prefix!w$i", oldStates(i)) // persist the bootstrap
    }
    (oldStates, fold)
  }

  /** Bootstrap var-length state: (src, dst, __mult = total walk count
    * across lengths). The finalized view is the distinct pairs — but
    * the state keeps the counts, because counts are what make the
    * deltas compose (see [[varLengthViewDelta]]). Same shared-prefix
    * shape as the delta, over COUNTED PAIR bags (r11): each level
    * compresses to (c0, c_h, walk count) before the next join, so
    * bootstrap never enumerates degree^h walk tuples — counts are
    * summed where the tuples would have multiplied.
    */
  def initVarLengthState(store: graft.graph.GraphStore, srcLabel: String,
      edgeLabel: String, dstLabel: String, minHops: Int, maxHops: Int,
      srcPred: Option[Column] = None,
      dstPred: Option[Column] = None,
      undirected: Boolean = false): DataFrame = {
    requireHops(minHops, maxHops)
    val e1 = store.edges.filter(col("label") === edgeLabel)
      .select("src", "dst")
    val e = if (!undirected) e1
      else e1.unionByName(e1.select(col("dst").as("src"), col("src").as("dst")))
    val dstV = store.vertices.filter(
      dstPred.foldLeft(col("label") === dstLabel)(_ && _))
    var walk = store.vertices.filter(
        srcPred.foldLeft(col("label") === srcLabel)(_ && _))
      .select(col("id").as("c0"), lit(1L).as("__mult"))
    val emitted = scala.collection.mutable.Buffer[DataFrame]()
    for (h <- 1 to maxHops) {
      val s = s"c${h - 1}"
      val d = s"c$h"
      walk = walk.join(e.select(col("src").as(s), col("dst").as(d)), s)
        .groupBy(col("c0"), col(d)).agg(sum("__mult").as("__mult"))
      if (h >= minHops)
        emitted += walk.join(dstV.select(col("id").as(d)), d)
          .select(col("c0").as("src"), col(d).as("dst"), col("__mult"))
    }
    emitted.reduce(_ unionByName _)
      .groupBy("src", "dst").agg(sum("__mult").as("__mult"))
  }

  /** Catalog-driven refresh of a registered var-length pattern view —
    * same two-frame contract as [[refreshPatternView]] (`name` serves
    * rows, `name!state` folds), except the served rows are the
    * DISTINCT endpoint pairs (state keys, multiplicity suppressed):
    * that is the executor's var-length answer shape, and it is the
    * counting state that keeps it maintainable.
    */
  def refreshVarLengthPatternView(catalog: ViewCatalog, name: String,
      oldStore: graft.graph.GraphStore, newStore: graft.graph.GraphStore,
      srcLabel: String, edgeLabel: String, dstLabel: String,
      minHops: Int, maxHops: Int,
      srcPred: Option[Column] = None,
      dstPred: Option[Column] = None,
      undirected: Boolean = false): DataFrame = {
    val state0 = catalog.dataOf(s"$name!state").getOrElse(
      initVarLengthState(oldStore, srcLabel, edgeLabel, dstLabel,
        minHops, maxHops, srcPred, dstPred, undirected))
    val (wOld, wFold) = walkHooks(catalog, name, oldStore,
      srcLabel, edgeLabel, maxHops, srcPred, undirected)
    val delta = varLengthViewDelta(oldStore, newStore,
      srcLabel, edgeLabel, dstLabel, minHops, maxHops, srcPred, dstPred,
      undirected, walkOld = wOld, onWalkDelta = wFold)
    val state1 = mergeJoinDelta(state0, delta).localCheckpoint()
    catalog.put(s"$name!state", state1)
    // state keys are unique by mergeJoinDelta's groupBy, all __mult>0:
    // the distinct pairs are exactly the state's key columns
    val view = state1.select("src", "dst")
    catalog.put(name, view)
    view
  }

  /** Catalog-driven refresh of a CROSS-VARIABLE-predicated single-hop
    * view `(a)-[e]->(b) WHERE P(a.props, e.props, b.props)` — the
    * WHERE class the per-position predicate split cannot carry
    * (r9's ledger: "cross-variable WHERE in view definitions").
    *
    * Maintained by TUPLE-level net compare instead of the composed
    * per-position rule: a tuple's membership depends only on its
    * edge's existence, both endpoints' label/props, and the edge's
    * props — so every tuple the window could have flipped has its
    * edge in the touched-edge set (explicit edge ops + old/new edges
    * incident to feed-touched vertices, the same incident scan the
    * chain deltas use), and comparing the predicated MATCH membership
    * between the two stores restricted to that set yields the exact
    * signed delta, prop-flip windows included. Bases are scanned with
    * the touched set broadcast — never shuffled; the MATCH itself
    * runs only at bootstrap.
    *
    * `tuplePred` evaluates against the tuple frame, whose props
    * columns are named `srcPropsCol` / `edgePropsCol` / `dstPropsCol`
    * (the GQL front door passes `<var>__props` names so
    * GqlExecutor.whereCol-compiled expressions bind directly).
    * Chains whose WHERE decomposes into ADJACENT-variable conjuncts
    * are maintained by [[refreshWhereChainView]] (r11); the general
    * cross-position form stays out of contract (each extra hop
    * multiplies the touched-tuple frontier): split into single-hop
    * views and join downstream.
    */
  def refreshWherePatternView(catalog: ViewCatalog, name: String,
      oldStore: graft.graph.GraphStore, newStore: graft.graph.GraphStore,
      srcLabel: String, edgeLabel: String, dstLabel: String,
      srcPropsCol: String, edgePropsCol: String, dstPropsCol: String,
      tuplePred: Column,
      srcPred: Option[Column] = None,
      dstPred: Option[Column] = None,
      edgePred: Option[Column] = None): DataFrame = {
    val (oldMembers, ops) = whereHopMembers(oldStore, newStore,
      srcLabel, edgeLabel, dstLabel,
      srcPropsCol, edgePropsCol, dstPropsCol, tuplePred,
      srcPred, dstPred, edgePred)
    val state0 = catalog.dataOf(s"$name!state").getOrElse(
      oldMembers.groupBy("src", "dst")
        .agg(count(lit(1)).as("__mult")))
    val delta = ops.select(col("src"), col("dst"),
      when(col("op") === "add", lit(1L)).otherwise(lit(-1L)).as("__sign"))
    val state1 = mergeJoinDelta(state0, delta).localCheckpoint()
    catalog.put(s"$name!state", state1)
    val view = finalizeJoin(state1)
    catalog.put(name, view)
    view
  }

  /** One WHERE-predicated hop's (full OLD-store member pairs, netted
    * ±op rows): the tuple-level compare [[refreshWherePatternView]]
    * introduced, shared since r11 with the adjacent-conjunct chain
    * maintainer ([[refreshWhereChainView]]). A tuple's membership
    * depends only on its edge's existence, both endpoints'
    * label/props, and the edge's props — so every tuple the window
    * could have flipped has its edge in the touched set (explicit
    * edge ops + old/new edges incident to feed-touched vertices),
    * and the old/new member compare restricted to that set is the
    * exact delta, prop-flip windows included. The member frame is a
    * LAZY join of label-filtered base scans (read with the delta
    * side broadcast wherever the chain algebra consumes it); only
    * the op rows are materialized.
    */
  private def whereHopMembers(
      oldStore: graft.graph.GraphStore, newStore: graft.graph.GraphStore,
      srcLabel: String, edgeLabel: String, dstLabel: String,
      srcPropsCol: String, edgePropsCol: String, dstPropsCol: String,
      tuplePred: Column, srcPred: Option[Column],
      dstPred: Option[Column], edgePred: Option[Column],
      sharedTouchedV: Option[IdProbe] = None)
      : (DataFrame, DataFrame) = {
    def cut(df: DataFrame): DataFrame = df.localCheckpoint()
    def members(store: graft.graph.GraphStore): DataFrame =
      store.vertices.filter(
          srcPred.foldLeft(col("label") === srcLabel)(_ && _))
        .select(col("id").as("src"), col("props").as(srcPropsCol))
        .join(store.edges.filter(
            edgePred.foldLeft(col("label") === edgeLabel)(_ && _))
          .select(col("src"), col("dst"), col("props").as(edgePropsCol)),
          "src")
        .join(store.vertices.filter(
            dstPred.foldLeft(col("label") === dstLabel)(_ && _))
          .select(col("id").as("dst"), col("props").as(dstPropsCol)),
          "dst")
        .filter(tuplePred)
        .select("src", "dst")
    val feed = newStore.changes.filter(col("version") > oldStore.version)
    // a multi-hop caller computes the touched set ONCE and shares it
    // across its predicated hops (it is hop-independent)
    val touchedV = sharedTouchedV.getOrElse(idProbe(lazyCut(feed
      .filter(col("op").isin("add_vertex", "remove_vertex",
        "update_vertex_props"))
      .select(col("id")).distinct())))
    val explicitE = feed.filter(
        col("op").isin("add_edge", "remove_edge", "update_edge_props")
          && col("elabel") === edgeLabel)
      .select(col("src"), col("dst")).distinct()
    def incident(store: graft.graph.GraphStore) = {
      val e = store.edges.filter(col("label") === edgeLabel)
      touchedV.semi(e, "src").unionByName(touchedV.semi(e, "dst"))
        .select(col("src"), col("dst"))
    }
    val touchedE = lazyCut(explicitE.unionByName(incident(oldStore))
      .unionByName(incident(newStore)).distinct())
    // restrict the EDGE SCAN first and broadcast the window-sized
    // slice outward — the members(store)-then-semi-join form left
    // Catalyst to re-plan the three-way props-carrying join, and
    // without post-semi stats it shuffled all three base frames
    // (ViewScaleProbe: the where-chain class's dominant refresh
    // shuffle). Every frame here is scanned once; every join side
    // that crosses is window-sized and hinted.
    def touchedMembers(store: graft.graph.GraphStore) = {
      val eT = store.edges.filter(
          edgePred.foldLeft(col("label") === edgeLabel)(_ && _))
        .select(col("src"), col("dst"), col("props").as(edgePropsCol))
        .join(broadcast(touchedE), Seq("src", "dst"), "left_semi")
      val withSrc = store.vertices.filter(
          srcPred.foldLeft(col("label") === srcLabel)(_ && _))
        .select(col("id").as("src"), col("props").as(srcPropsCol))
        .join(broadcast(eT), "src")
      store.vertices.filter(
          dstPred.foldLeft(col("label") === dstLabel)(_ && _))
        .select(col("id").as("dst"), col("props").as(dstPropsCol))
        .join(broadcast(withSrc), "dst")
        .filter(tuplePred)
        .select("src", "dst")
    }
    val o = touchedMembers(oldStore)
    val n = touchedMembers(newStore)
    val ops = lazyCut(n.join(o, Seq("src", "dst"), "left_anti")
      .select(lit("add").as("op"), col("src"), col("dst"))
      .unionByName(o.join(n, Seq("src", "dst"), "left_anti")
        .select(lit("remove").as("op"), col("src"), col("dst"))))
    (members(oldStore), ops)
  }

  /** Catalog-driven refresh of a CHAIN view whose WHERE decomposes
    * into ADJACENT-variable conjuncts — each top-level AND conjunct
    * binds only variables of one hop window (node j, edge j,
    * node j+1), e.g. `(a)-[e1]->(b)-[e2]->(c) WHERE a.x > b.y AND
    * b.z < c.w` (the shape r10's ledger rejected wholesale: "WHERE
    * on chains").
    *
    * Why the adjacency scope is the maintainable one: an
    * adjacent-scoped conjunct is a property of ONE hop's tuple, so
    * the chain equals a plain chain over per-hop PREDICATED
    * relations R_j = σ_{P_j}(V_j ⋈ E_j ⋈ V_{j+1}) projected to
    * (src, dst) — and each R_j's delta is the single-hop tuple-level
    * net compare ([[whereHopMembers]]) over its own touched-edge
    * set, bounded per hop by the change window exactly like an edge
    * delta. The deltas feed [[patternChainViewDelta]]'s hopOverrides
    * (the composed var-length machinery's injection point — the
    * algebra is indifferent to where a hop relation comes from as
    * long as old + ops = new). A CROSS-POSITION conjunct
    * (`a.x > c.y`) has no such per-hop relation: any prop flip on a
    * could retest every chain tuple through a — the multiplied
    * touched-tuple frontier the r10 rejection named — so that form
    * still rejects with the split-and-join-downstream remedy.
    *
    * Each predicated hop keeps its member bag as a sub-state under
    * `name!wh<j>` (src, dst, mult): the chain fold then reads R_j as
    * a STORED SCAN instead of re-executing the three-way
    * props-carrying member join once per delta term — ViewScaleProbe
    * measured those lazy re-joins (shuffling the props maps each
    * time) as the reason this class shuffled MORE on refresh than on
    * recompute. The sub-state folds forward by the same ±op rows
    * that feed the chain. Endpoint labels/preds apply both inside
    * R_j and at the chain's vertex joins — double-filtering is
    * algebraically idempotent. Directed single-hop positions only
    * (the GQL front door enforces this).
    */
  def refreshWhereChainView(catalog: ViewCatalog, name: String,
      oldStore: graft.graph.GraphStore, newStore: graft.graph.GraphStore,
      vertexLabels: Seq[String], edgeLabels: Seq[String],
      vertexPropsCols: Seq[String], edgePropsCols: Seq[String],
      hopPreds: Seq[Option[Column]],
      vertexPreds: Seq[Option[Column]] = Nil,
      edgePreds: Seq[Option[Column]] = Nil): DataFrame = {
    require(edgeLabels.size >= 2,
      "single-hop WHERE views use refreshWherePatternView")
    require(hopPreds.size == edgeLabels.size &&
        vertexPropsCols.size == vertexLabels.size &&
        edgePropsCols.size == edgeLabels.size,
      "per-hop predicate/props-column seqs must align with the chain")
    val preds = if (vertexPreds.isEmpty)
      Seq.fill(vertexLabels.size)(None: Option[Column]) else vertexPreds
    val epreds = if (edgePreds.isEmpty)
      Seq.fill(edgeLabels.size)(None: Option[Column]) else edgePreds
    val sharedTouchedV = feedTouchedV(oldStore, newStore)
    val overrides = hopPreds.zipWithIndex.collect {
      case (Some(p), j) =>
        val (oldMembers, ops) = whereHopMembers(oldStore, newStore,
          vertexLabels(j), edgeLabels(j), vertexLabels(j + 1),
          vertexPropsCols(j), edgePropsCols(j), vertexPropsCols(j + 1),
          p, preds(j), preds(j + 1), epreds(j), Some(sharedTouchedV))
        val sub = s"$name!wh$j"
        val s0 = catalog.dataOf(sub).getOrElse(
          oldMembers.groupBy("src", "dst")
            .agg(count(lit(1)).as("__mult")).localCheckpoint())
        val s1 = mergeJoinDelta(s0, ops.select(col("src"), col("dst"),
          when(col("op") === "add", lit(1L)).otherwise(lit(-1L))
            .as("__sign"))).localCheckpoint()
        catalog.put(sub, s1)
        val rOld = finalizeJoin(s0)
        j -> ((s: String, d: String) => (
          rOld.select(col("src").as(s), col("dst").as(d)),
          ops.select(col("op"), col("src").as(s), col("dst").as(d))))
    }.toMap
    val bootOverrides = overrides.map { case (j, provider) =>
      j -> ((s: String, d: String) => provider(s, d)._1)
    }
    val undir = Seq.fill(edgeLabels.size)(false)
    val state0 = catalog.dataOf(s"$name!state").getOrElse(
      initPatternChainState(oldStore, vertexLabels, edgeLabels,
        preds, epreds, undir, bootOverrides))
    val (prefixOld, fold) = chainPrefixHooks(catalog, name, oldStore,
      vertexLabels, edgeLabels, preds, epreds, undir, bootOverrides)
    val delta = patternChainViewDelta(oldStore, newStore, vertexLabels,
      edgeLabels, preds, epreds, undir, overrides,
      prefixOld = prefixOld, onLevelDelta = fold)
    val state1 = mergeJoinDelta(state0, delta).localCheckpoint()
    catalog.put(s"$name!state", state1)
    val view = finalizeJoin(state1)
    catalog.put(name, view)
    view
  }

  /** Catalog-driven refresh of a COMPOSED chain view — a MATCH chain
    * in which any hop may be a BOUNDED var-length segment, e.g.
    * `(a:N)-[:link*1..2]->(b:N)-[:owns]->(c:M)` (the shape r9's
    * ledger left open: "var-length composed with further hops").
    *
    * How it maintains: each var-length hop keeps its own COUNTING
    * sub-state under `name!vl<i>` (walk counts — exactly
    * [[refreshVarLengthPatternView]]'s state, folded by the same
    * [[varLengthViewDelta]]), and the hop's relation in the chain is
    * that sub-state's DISTINCT-pair MEMBERSHIP — the executor's own
    * mid-chain var-length semantics (seeded expansion distincts its
    * (from, to) pairs before the next join). Membership deltas come
    * from [[stateMembershipOps]] — the netted delta probed into one
    * state scan; a pair enters when its first walk appears, leaves
    * when its last walk dies — and the chain folds them through the
    * signed two-level rule as any edge delta — the algebra is
    * indifferent to where a hop relation comes from as long as
    * old + ops = new ([[patternChainViewDelta]]'s hopOverrides).
    * Endpoint labels/preds are applied both inside the sub-state and
    * by the chain's vertex joins; double-filtering is algebraically
    * idempotent (each factor relation stays accurate).
    *
    * Cost: one counting-sub-state fold per var-length hop (bounded
    * [1, 6] like the standalone form) + the chain fold — all deltas
    * broadcast, bases scanned never shuffled.
    *
    * UNBOUNDED `*1..` segments compose too (r11, closing the r10
    * ledger's last view-shape gap): the segment's relation is the
    * reachability view's closure, maintained as its own sub-state
    * under `name!tc<i>` by the SAME fold the standalone view uses
    * ([[foldReachState]]: semi-naive insertion, DRed deletion,
    * measured recompute switch) — closure membership is distinct
    * pairs, exactly the relation contract the var-length sub-states
    * already feed through hopOverrides, so the chain algebra is
    * unchanged. State cost is O(|TC|) per unbounded segment — the
    * standalone view's documented posture, inherited, not worsened
    * (the chain state multiplies only by the OTHER hops' fan-out).
    */
  def refreshComposedChainView(catalog: ViewCatalog, name: String,
      oldStore: graft.graph.GraphStore, newStore: graft.graph.GraphStore,
      vertexLabels: Seq[String], edgeLabels: Seq[String],
      ranges: Seq[Option[(Int, Int)]],
      vertexPreds: Seq[Option[Column]] = Nil,
      edgePreds: Seq[Option[Column]] = Nil,
      undirectedHops: Seq[Boolean] = Nil,
      recomputeRatio: Double = 0.3): DataFrame = {
    require(ranges.size == edgeLabels.size,
      "ranges wants one entry per edge label")
    require(ranges.exists(_.isDefined) && edgeLabels.size >= 2,
      "composed chains need >= 2 hops with >= 1 var-length segment — " +
        "use refreshPatternChainView / refreshVarLengthPatternView for " +
        "the simple shapes")
    require(ranges.forall(_.forall(r =>
        r._2 != Int.MaxValue || (r._1 >= 1 && r._1 <= 6))),
      "an unbounded segment composes as *1.. (closure sub-state) or " +
        "*m.. with m in [2, 6] (walk x closure composition — the walk " +
        "factor inherits the bounded family's hop cap)")
    def cut(df: DataFrame): DataFrame = df.localCheckpoint()
    val preds = if (vertexPreds.isEmpty)
      Seq.fill(vertexLabels.size)(None: Option[Column]) else vertexPreds
    val epreds = if (edgePreds.isEmpty)
      Seq.fill(edgeLabels.size)(None: Option[Column]) else edgePreds
    val undir = if (undirectedHops.isEmpty)
      Seq.fill(edgeLabels.size)(false) else undirectedHops
    ranges.zipWithIndex.foreach { case (r, j) =>
      require(r.isEmpty || epreds(j).isEmpty,
        "edge props cannot predicate a var-length segment")
      require(!r.exists(_._2 == Int.MaxValue) || !undir(j),
        "unbounded segments are directed-only (undirected unbounded " +
          "reachability is connected-component membership)")
    }
    // fold every var-length hop's sub-state FIRST; its membership
    // delta feeds the chain fold below. Two sub-state kinds: an
    // UNBOUNDED segment keeps the closure (foldReachState under
    // !tc<j> — set semantics, ops are the state diff), a BOUNDED one
    // keeps walk counts (!vl<j> — a pair enters on its first walk,
    // leaves with its last)
    val overrides = ranges.zipWithIndex.collect {
      case (Some((1, Int.MaxValue)), j) =>
        // ops accumulate from the fold's own DRed/insertion work —
        // no closure-sized anti-join on the refresh path
        val (k0, _, ops) = foldReachState(catalog, s"$name!tc$j",
          oldStore, newStore, edgeLabels(j),
          recomputeRatio = recomputeRatio)
        j -> ((s: String, dn: String) => (
          k0.select(col("src").as(s), col("dst").as(dn)),
          ops.select(col("op"), col("src").as(s), col("dst").as(dn))))
      case (Some((mn, Int.MaxValue)), j) =>
        // *m.. (m >= 2): the walk x closure composition sub-state
        // ([[foldLowerBoundedState]]) under `name!lb<j>` — its
        // counting state's membership ops feed the chain like any
        // other sub-state relation
        val (s0, _, ops) = foldLowerBoundedState(catalog, s"$name!lb$j",
          oldStore, newStore, vertexLabels(j), edgeLabels(j),
          vertexLabels(j + 1), mn, preds(j), preds(j + 1),
          recomputeRatio = recomputeRatio)
        val k0 = s0.select("src", "dst")
        j -> ((s: String, dn: String) => (
          k0.select(col("src").as(s), col("dst").as(dn)),
          ops.select(col("op"), col("src").as(s), col("dst").as(dn))))
      case (Some((mn, mx)), j) =>
        val sub = s"$name!vl$j"
        val s0 = catalog.dataOf(sub).getOrElse(cut(
          initVarLengthState(oldStore, vertexLabels(j), edgeLabels(j),
            vertexLabels(j + 1), mn, mx, preds(j), preds(j + 1),
            undir(j))))
        val (wOld, wFold) = walkHooks(catalog, sub, oldStore,
          vertexLabels(j), edgeLabels(j), mx, preds(j), undir(j))
        val d = lazyCut(varLengthViewDelta(oldStore, newStore,
          vertexLabels(j), edgeLabels(j), vertexLabels(j + 1), mn, mx,
          preds(j), preds(j + 1), undir(j), walkOld = wOld,
          onWalkDelta = wFold))
        // fused fold: one netted delta + one state scan serve the
        // merge AND the membership ops — the old `new ANTI old`
        // both-ways diff shuffled two walk-state-sized frames
        val (s1Raw, opsRaw) = mergeJoinDeltaWithOps(s0, d)
        val s1 = s1Raw.localCheckpoint()
        catalog.put(sub, s1)
        val k0 = s0.select("src", "dst")
        val ops = cut(opsRaw)
        j -> ((s: String, dn: String) => (
          k0.select(col("src").as(s), col("dst").as(dn)),
          ops.select(col("op"), col("src").as(s), col("dst").as(dn))))
    }.toMap
    val bootOverrides = overrides.map { case (j, provider) =>
      j -> ((s: String, dn: String) => provider(s, dn)._1)
    }
    val state0 = catalog.dataOf(s"$name!state").getOrElse(
      initPatternChainState(oldStore, vertexLabels, edgeLabels,
        preds, epreds, undir, bootOverrides))
    val (prefixOld, fold) = chainPrefixHooks(catalog, name, oldStore,
      vertexLabels, edgeLabels, preds, epreds, undir, bootOverrides)
    val delta = patternChainViewDelta(oldStore, newStore, vertexLabels,
      edgeLabels, preds, epreds, undir, overrides,
      prefixOld = prefixOld, onLevelDelta = fold)
    val state1 = mergeJoinDelta(state0, delta).localCheckpoint()
    catalog.put(s"$name!state", state1)
    val view = finalizeJoin(state1)
    catalog.put(name, view)
    view
  }

  // ---- V5e: UNBOUNDED reachability views (semi-naive + DRed) ------

  /** Transitive closure of the `edgeLabel` subgraph as membership
    * pairs (src, dst) — semi-naive: the frontier (pairs first derived
    * last round) composes with the edge set once per round, so rounds
    * are bounded by the subgraph diameter and every join's delta side
    * is the frontier. Cycle vertices yield their (v, v) self-pairs
    * like any fixpoint closure. Scale posture: the closure IS the
    * view's answer, so O(|TC|) state is intrinsic to this view class
    * — it is meant for sparse, DAG-ish labeled subgraphs
    * (hierarchies, dependency/feeds graphs), not the social graph.
    */
  def initReachState(store: graft.graph.GraphStore, edgeLabel: String,
      maxRounds: Int = 60): DataFrame = {
    val (e, eCnt) = cutCount(store.edges
      .filter(col("label") === edgeLabel).select("src", "dst"))
    var r = e
    var frontier = e
    var cnt = eCnt
    var rounds = 0
    while (cnt > 0 && rounds < maxRounds) {
      // renamed-column joins throughout this family: alias-qualified
      // self-join branches UNIONED together trip Catalyst's
      // union-constraint rewrite (AttributeMap key-not-found)
      // (one fused job per round: the count materializes the lazy
      // checkpoint; r's lazy union materializes inside the next
      // round's count through its checkpointed inputs)
      val (next, c) = cutCount(frontier
        .select(col("src").as("__a"), col("dst").as("__m"))
        .join(e.select(col("src").as("__m"), col("dst").as("__b")), "__m")
        .select(col("__a").as("src"), col("__b").as("dst")).distinct()
        .join(r, Seq("src", "dst"), "left_anti"))
      cnt = c
      if (cnt > 0) { r = lazyCut(r.unionByName(next)); frontier = next }
      rounds += 1
    }
    require(cnt == 0L,
      s"reachability closure did not converge in $maxRounds rounds; " +
        "raise maxRounds")
    r
  }

  /** Netted (adds, removes) of the `edgeLabel` edge set between two
    * store versions, cascades included — the same
    * feed-touched-incident-membership compare the pattern-view deltas
    * use, shared here by the reachability refresher.
    */
  private def reachEdgeDelta(oldStore: graft.graph.GraphStore,
      newStore: graft.graph.GraphStore,
      edgeLabel: String,
      sharedTouchedV: Option[IdProbe] = None): (DataFrame, DataFrame) = {
    val feed = newStore.changes.filter(col("version") > oldStore.version)
    val touchedV = sharedTouchedV.getOrElse(
      feedTouchedV(oldStore, newStore))
    val explicitE = feed.filter(
        col("op").isin("add_edge", "remove_edge", "update_edge_props")
          && col("elabel") === edgeLabel)
      .select(col("src"), col("dst")).distinct()
    def incident(store: graft.graph.GraphStore) = {
      val e = store.edges.filter(col("label") === edgeLabel)
      touchedV.semi(e, "src").unionByName(touchedV.semi(e, "dst"))
        .select(col("src"), col("dst"))
    }
    // the touched-edge frame stays an EAGER checkpoint — it feeds
    // two broadcast builds, which collect on the driver outside any
    // counted consumer job. The returned add/remove frames are lazy:
    // the fold's first count on each IS its materialization (one
    // job, not two).
    val touchedE = explicitE.unionByName(incident(oldStore))
      .unionByName(incident(newStore)).distinct().localCheckpoint()
    def eMembers(store: graft.graph.GraphStore) =
      store.edges.filter(col("label") === edgeLabel)
        .join(broadcast(touchedE), Seq("src", "dst"), "left_semi")
        .select("src", "dst")
    val eo = eMembers(oldStore)
    val en = eMembers(newStore)
    (lazyCut(en.join(eo, Seq("src", "dst"), "left_anti")),
      lazyCut(eo.join(en, Seq("src", "dst"), "left_anti")))
  }

  private def serveReach(store: graft.graph.GraphStore, state: DataFrame,
      srcLabel: String, dstLabel: String, srcPred: Option[Column],
      dstPred: Option[Column]): DataFrame = {
    def vSet(label: String, pred: Option[Column], as: String) =
      store.vertices.filter(pred.foldLeft(col("label") === label)(_ && _))
        .select(col("id").as(as))
    state.join(vSet(srcLabel, srcPred, "src"), Seq("src"), "left_semi")
      .join(vSet(dstLabel, dstPred, "dst"), Seq("dst"), "left_semi")
      .select("src", "dst")
  }

  /** Catalog-driven refresh of an UNBOUNDED reachability view
    * `(a:srcLabel)-[:edgeLabel*1..]->(b:dstLabel)` — the one view
    * class walk counting cannot maintain (cycle walk counts are
    * infinite), handled by the classic recursive-view pair:
    *
    *  - INSERTION: semi-naive — the new pairs seeded from the added
    *    edges compose with the (already-closed) state on both sides
    *    until no new pair appears; rounds grow with the log-ish chain
    *    depth THROUGH new edges, every join's delta side is the
    *    frontier.
    *  - DELETION: DRed (Gupta/Mumick/Subrahmanian 1993) — over-delete
    *    every member pair with a removed-edge straddle witness
    *    (a ⇒ u, v ⇒ b in the OLD closure, endpoint coincidences
    *    included), then re-derive from the certainly-kept pairs and
    *    the surviving edges, restricted to the over-deleted
    *    candidates; pairs that never re-derive are truly gone.
    *  - FALLBACK: when the deletion wavefront (`|candidates|`)
    *    exceeds `recomputeRatio · |state|`, re-derivation would churn
    *    most of the state and a fresh semi-naive closure of the NEW
    *    edge set is strictly cheaper — recompute, fold, and record
    *    the same contract (end state identical by construction). The
    *    switch is MEASURED, not static (r11, was a fixed 2²⁰ row
    *    cap): both counts fall out of work DRed does anyway, and
    *    ReachCrossoverProbe's clustered-closure sweep (1× and 10×
    *    graph, wavefront 1%→51% of state — table in ROUND11.md)
    *    reads DRed ahead through 26% at both scales and a toss-up
    *    by 51% (10× flips to recompute, 1× ties within 3%); 0.3 is
    *    the conservative edge — below it DRed won every measured
    *    point, above it the two are within noise while recompute
    *    bounds the worst case.
    *    The ratio is scale-free where a row cap is not — at a 100 TB
    *    closure a 2²⁰ wavefront is far below any sane recompute
    *    point, and on a small view it could exceed the whole state.
    *
    * `rederiveCap` keeps only its BROADCAST-licensing role: frames
    * counted at or below it may hash-broadcast inside the rounds.
    *
    * State under `name!state` is the label-free closure; endpoint
    * labels/predicates are SERVE-time semi-joins against the current
    * store (so a vertex prop flip re-serves without touching the
    * closure). Served rows under `name`: distinct (src, dst).
    */
  def refreshReachabilityView(catalog: ViewCatalog, name: String,
      oldStore: graft.graph.GraphStore, newStore: graft.graph.GraphStore,
      srcLabel: String, edgeLabel: String, dstLabel: String,
      srcPred: Option[Column] = None, dstPred: Option[Column] = None,
      rederiveCap: Long = 1L << 20, maxRounds: Int = 60,
      recomputeRatio: Double = 0.3): DataFrame = {
    val (_, s1, _) = foldReachState(catalog, s"$name!state",
      oldStore, newStore, edgeLabel, rederiveCap, maxRounds,
      recomputeRatio, needOps = false)
    val view = serveReach(newStore, s1, srcLabel, dstLabel,
      srcPred, dstPred)
    catalog.put(name, view)
    view
  }

  /** The closure-state fold behind [[refreshReachabilityView]] —
    * split out (r11) so a COMPOSED chain can maintain an unbounded
    * segment's closure as a sub-state under its own key and feed the
    * membership diff through the chain fold. Bootstraps `stateKey`
    * from `oldStore` when absent, folds the edge window (DRed or
    * measured recompute, then semi-naive insertion), stores the new
    * state, and returns (pre-fold state, post-fold state, ±op rows).
    *
    * STATE LAYOUT (r12): `stateKey!core` is the closure
    * hash-partitioned + sorted on (src, dst) with the layout carried
    * across refreshes ([[partitionedCkpt]]); `stateKey!tail` is the
    * window-accumulated remainder; the plain `stateKey` serves their
    * union. Every membership anti/semi inside the fold plans with NO
    * exchange on the core side and a broadcast tail side — refresh
    * shuffle is window-bounded; the tail folds into the core at
    * COMPACTION (tail > core/4 or past the broadcast license), one
    * amortized state-sized shuffle.
    *
    * The ops are ACCUMULATED FROM THE FOLD'S OWN WORK (r11 stage D):
    * DRed's truly-underivable candidates are exactly the removed
    * pairs, and the insertion rounds' frontier unions are exactly
    * the added ones — netting the two window-bounded frames costs
    * two broadcast anti-joins. The old form (`new ANTI old` both
    * ways) shuffled two closure-sized frames per refresh, which
    * ViewScaleProbe measured as a dominant composed-class refresh
    * shuffle. Only the measured-recompute fallback keeps the
    * state-diff anti-join — proportionate there, since recompute
    * fires when the wavefront is a large fraction of the state.
    */
  private[views] def foldReachState(catalog: ViewCatalog,
      stateKey: String,
      oldStore: graft.graph.GraphStore, newStore: graft.graph.GraphStore,
      edgeLabel: String,
      rederiveCap: Long = 1L << 20, maxRounds: Int = 60,
      recomputeRatio: Double = 0.3,
      sharedTouchedV: Option[IdProbe] = None,
      needOps: Boolean = true)
      : (DataFrame, DataFrame, DataFrame) = {
    def cut(df: DataFrame): DataFrame = df.localCheckpoint()
    def hinted(df: DataFrame, cnt: Long): DataFrame =
      if (cnt <= rederiveCap) broadcast(df) else df
    val keys = Seq("src", "dst")
    // CORE + TAIL state layout (r12): the closure lives as a
    // hash-partitioned, pair-sorted CORE carried across refreshes
    // ([[partitionedCkpt]] — the layout rides the checkpoint into
    // join planning) plus a window-accumulated TAIL. Every
    // membership anti/semi join inside the fold then shuffles ONLY
    // the window-sized probe side: the core side plans with no
    // exchange and no sort, the tail side broadcasts. Before this,
    // each fixpoint round's anti/semi against the closure shuffled
    // the whole state — ViewScaleProbe r12 measured a w=64 refresh
    // shuffling 116 MB on the 1× dep fixture, the same as recompute,
    // i.e. the class was NOT window-bounded in shuffle terms.
    // the core's row count rides along as catalog meta so finish()'s
    // compaction test needs no state scan (r12 review: the old
    // `core.count()` per nonempty-tail refresh re-added one
    // state-sized driver job per view per batch); a reloaded catalog
    // without meta recounts once here
    val (core0, tail0, tailBound0, coreCnt0) =
      (catalog.dataOf(s"$stateKey!core"),
        catalog.dataOf(s"$stateKey!tail")) match {
      case (Some(c), Some(t)) =>
        (c, t, t.count(),
          catalog.metaOf(s"$stateKey!coreCnt").getOrElse(c.count()))
      case _ =>
        // bootstrap (or a parquet-reloaded catalog): compact the
        // whole closure into a fresh partitioned core — the one
        // state-sized shuffle this layout ever pays outside
        // compaction
        val boot = catalog.dataOf(stateKey).getOrElse(
          initReachState(oldStore, edgeLabel, maxRounds))
        val (c, n) = partitionedCkpt(boot, keys)
        (c, boot.limit(0).localCheckpoint(), 0L, n)
    }
    val s0 = core0.unionByName(tail0)
    val (eAdd, eRem) = reachEdgeDelta(oldStore, newStore, edgeLabel,
      sharedTouchedV)
    // `needOps = false` callers (standalone reachability refresh)
    // discard the ±op frame, so the recompute fallback must not pay
    // its both-ways closure-sized state-diff anti-join for them —
    // they get an empty frame instead (the fold paths' own ops are
    // byproducts of work already done and stay as-is).
    def finish(core: DataFrame, tail: DataFrame, tailBound: Long,
        coreCnt: Long, ops: Option[DataFrame])
        : (DataFrame, DataFrame, DataFrame) = {
      // COMPACTION: fold the tail into the partitioned core when it
      // outgrows a quarter of the core or the broadcast license —
      // one state-sized shuffle amortized over ~core/window
      // refreshes; between compactions the state-side shuffle is
      // zero. The core count is CARRIED (meta + the counted
      // partitionedCkpt), never re-scanned.
      val (coreF, tailF, coreCntF) =
        if (tailBound == 0L) (core, tail, coreCnt)
        else if (tailBound > rederiveCap || tailBound * 4 > coreCnt) {
          val (c, n) = partitionedCkpt(core.unionByName(tail), keys)
          (c, tail.limit(0).localCheckpoint(), n)
        } else (core, cut(tail), coreCnt)
      val state = coreF.unionByName(tailF)
      catalog.put(s"$stateKey!core", coreF)
      catalog.put(s"$stateKey!tail", tailF)
      catalog.putMeta(s"$stateKey!coreCnt", coreCntF)
      // the union is served under the plain key (compat: save/load,
      // direct readers); persist = false — its blocks live in the
      // two checkpoints just stored
      catalog.put(stateKey, state, persist = false)
      val o = ops.getOrElse {
        if (!needOps)
          s0.limit(0).withColumn("op", lit("add"))
        else cut(
          state.join(s0, keys, "left_anti")
            .withColumn("op", lit("add"))
            .unionByName(s0.join(state, keys, "left_anti")
              .withColumn("op", lit("remove"))))
      }
      (s0, state, o)
    }
    var core = core0
    var tail = tail0
    var tailBound = tailBound0
    var coreCnt = coreCnt0
    var removedPend: DataFrame = eRem.limit(0)
    var removedCnt = 0L
    var added: DataFrame = eAdd.limit(0)
    var addedCnt = 0L
    val remCnt = eRem.count()
    if (remCnt > 0) {
      // over-delete candidates: the removed pair itself and every
      // member pair reaching AROUND it (a ⇒ u and/or v ⇒ b, with
      // a = u / b = v coincidences as their own shapes); the R scans
      // stream against the broadcast removal set — no state shuffle
      val remUV = hinted(
        eRem.select(col("src").as("__u"), col("dst").as("__v")), remCnt)
      val r0 = s0
      val rToU = r0.select(col("src").as("__a"), col("dst").as("__u"))
      val rFromV = r0.select(col("src").as("__v"), col("dst").as("__b"))
      val shape2 = rToU.join(remUV, "__u")
        .select(col("__a").as("src"), col("__v").as("dst"))
      // (u, b) pairs with u→v removed and v ⇒ b — computed ONCE and
      // shared by shapes 3 and 4. Counted + re-hinted: composing it
      // into shape4 with a second raw join would strand the broadcast
      // hint on the inner frame and SMJ the closure-sized rFromV on
      // __v (LowerShuffleProbe r12: a 74 MB refresh exchange on a
      // w=64 window — the state-sized shuffle this fold must not pay)
      val (remReach, remReachCnt) = cutCount(remUV.join(rFromV, "__v")
        .select(col("__u"), col("__b")))
      val shape3 = remReach
        .select(col("__u").as("src"), col("__b").as("dst"))
      val shape4 = rToU.join(hinted(remReach, remReachCnt), "__u")
        .select(col("__a").as("src"), col("__b").as("dst"))
      // every shape row is in R BY CONSTRUCTION — each composes
      // R-paths with an E_old edge (a⇒u, u→v ∈ E_old, v⇒b gives
      // a⇒b in TC(E_old)) — so no membership semi-join against the
      // (closure-sized) R is needed; distinct() is the only dedup
      val (cands, aCnt) = cutCount(eRem.unionByName(shape2)
        .unionByName(shape3).unionByName(shape4).distinct())
      // core and tail are disjoint by construction (additions pass
      // antiState, re-derived rows are anti-joined out of both
      // first), so the state size is the sum — no s0 scan
      val stateCnt = coreCnt + tailBound
      if (aCnt > recomputeRatio * stateCnt) {
        // deletion wavefront churns too much of the closure for
        // candidate-restricted re-derivation to pay: recompute over
        // the new edge set (additions folded in for free). Both
        // counts are work DRed needs anyway (cands drives the rounds,
        // the state is checkpointed), so the measured switch costs
        // one count. Ops fall back to the state-diff anti-join —
        // proportionate, the wavefront IS a large fraction of the
        // state here.
        val (rc, rcCnt) = partitionedCkpt(
          initReachState(newStore, edgeLabel, maxRounds), keys)
        return finish(rc, eRem.limit(0), 0L, rcCnt, None)
      }
      // lazy cuts throughout the loop: each round's single count
      // materializes that round's derived frame AND (through the
      // join lineage) the previous round's lazy union — one driver
      // job per round where the eager form paid three
      val eMid = lazyCut(oldStore.edges.filter(col("label") === edgeLabel)
        .select("src", "dst")
        .join(hinted(eRem, remCnt), Seq("src", "dst"), "left_anti"))
      // kept = state minus candidates, SPLIT: the core side keeps its
      // carried layout through the broadcast-anti ([[preservedCkpt]]),
      // so the per-round membership semi below shuffles only the
      // probe; re-derived rows accumulate in the window-sized tail
      val keptCore = preservedCkpt(core.join(hinted(cands, aCnt), keys,
        "left_anti"))
      // counting keptCore fuses into the materialization the fold
      // pays anyway (first round's action would have done it) and
      // keeps the carried core count exact through deletions
      val keptCoreCnt = keptCore.count()
      // EXACT tail bound (r12 review: carrying the pre-deletion
      // tailBound across the anti-join overestimates — a wavefront
      // that guts the tail then triggers premature compaction and
      // can skip a broadcast that would have fit)
      var (keptTail, keptTailBound) =
        if (tailBound == 0L) (tail, 0L)
        else cutCount(tail.join(hinted(cands, aCnt), keys, "left_anti"))
      var pending = cands
      var pendCnt = aCnt
      var rounds = 0
      var derivedCnt = -1L
      while (pendCnt > 0 && derivedCnt != 0 && rounds < maxRounds) {
        val p = hinted(pending, pendCnt)
        // R(a,b) ← E(a,b) | E(a,x) ∧ R(x,b), restricted to candidates;
        // semi against (keptCore ∪ keptTail) in split form —
        // semi(x, A∪B) = semi(x, A) ∪ semi(anti(x, A), B) — so the
        // core side never shuffles and the tail side broadcasts
        // pending ∩ E, oriented so the hinted window frame is the
        // BUILD side: a semi join can only broadcast its RIGHT input,
        // so `p.join(eMid, semi)` strands the hint and SMJs — which
        // exchanged + rebroadcast the corpus-sized eMid EVERY round
        // (LowerShuffleProbe r12: 11 × (6.1 MB exchange + 8 MB
        // broadcast build) on a w=64 window)
        val direct = eMid.join(p, Seq("src", "dst"), "left_semi")
        val probe = p.join(eMid.select(col("src"), col("dst").as("__x")),
          "src")
        val keptCoreR = keptCore.select(col("src").as("__x"), col("dst"))
        val keptTailR = keptTail.select(col("src").as("__x"), col("dst"))
        val step = probe.join(keptCoreR, Seq("__x", "dst"), "left_semi")
          .unionByName(probe.join(keptCoreR, Seq("__x", "dst"), "left_anti")
            .join(hinted(keptTailR, keptTailBound), Seq("__x", "dst"),
              "left_semi"))
          .select("src", "dst")
        val (derived, dc) = cutCount(direct.unionByName(step).distinct())
        derivedCnt = dc
        if (derivedCnt > 0) {
          keptTail = lazyCut(keptTail.unionByName(derived))
          keptTailBound += derivedCnt
          pending = lazyCut(pending.join(hinted(derived, derivedCnt),
            Seq("src", "dst"), "left_anti"))
          pendCnt -= derivedCnt
        }
        rounds += 1
      }
      // a round that derives nothing proves the remaining candidates
      // are truly underivable — anything else is a budget cut
      require(derivedCnt == 0L || pendCnt == 0L,
        s"DRed re-derivation did not converge in $maxRounds rounds " +
          s"($pendCnt candidates still open); raise maxRounds")
      core = keptCore
      coreCnt = keptCoreCnt
      tail = keptTail
      tailBound = keptTailBound
      removedPend = pending // truly-underivable candidates = removals
      removedCnt = pendCnt
    }
    val addCnt0 = eAdd.count()
    if (addCnt0 > 0) {
      // anti(x, core ∪ tail) in split form: anti(anti(x, core), tail)
      // — core exchange-free, tail broadcast; new pairs accumulate in
      // the tail, so the relation scans below read core ∪ tail
      def antiState(x: DataFrame): DataFrame =
        x.join(core, keys, "left_anti")
          .join(hinted(tail, tailBound), keys, "left_anti")
      var (delta, dCnt) = cutCount(antiState(eAdd))
      var rounds = 0
      while (dCnt > 0 && rounds < maxRounds) {
        tail = lazyCut(tail.unionByName(delta))
        tailBound += dCnt
        added = lazyCut(added.unionByName(delta))
        addedCnt += dCnt
        val rAll = core.unionByName(tail)
        val dL = hinted(
          delta.select(col("src").as("__a"), col("dst").as("__m")), dCnt)
        val dR = hinted(
          delta.select(col("src").as("__m"), col("dst").as("__b")), dCnt)
        val left = dL
          .join(rAll.select(col("src").as("__m"), col("dst").as("__b")),
            "__m")
          .select(col("__a").as("src"), col("__b").as("dst"))
        val right = rAll
          .select(col("src").as("__a"), col("dst").as("__m"))
          .join(dR, "__m")
          .select(col("__a").as("src"), col("__b").as("dst"))
        val (d2, c2) = cutCount(antiState(
          left.unionByName(right).distinct()))
        delta = d2
        dCnt = c2
        rounds += 1
      }
      require(dCnt == 0L,
        s"insertion closure did not converge in $maxRounds rounds; " +
          "raise maxRounds")
    }
    // net the two window-bounded frames: a DRed-removed pair that the
    // insertion re-derived was present before AND after — no op.
    // Lazy: the consumer's first action (the chain fold's own counted
    // delta, or foldLowerBoundedState's tcOps count) materializes it
    // off checkpointed inputs.
    val ops = if (!needOps) None else Some(lazyCut(
      added.join(hinted(removedPend, removedCnt), Seq("src", "dst"),
          "left_anti")
        .withColumn("op", lit("add"))
      .unionByName(removedPend.join(hinted(added, addedCnt),
          Seq("src", "dst"), "left_anti")
        .withColumn("op", lit("remove")))))
    finish(core, tail, tailBound, coreCnt, ops)
  }

  /** Counting state + signed delta for a LOWER-BOUNDED unbounded reach
    * segment `-[:e*m..]->` with m ≥ 2 — the view shape the r10/r11
    * ledgers left under a remedy ("per-length counting the closure
    * cannot carry"). It CAN be carried as a COMPOSITION: a walk of
    * length ≥ m from a to b is exactly an (m−1)-hop walk a ⇝ x
    * followed by reachability x ⇝ b, so the relation is
    *
    *   R(a, b) = Σ_x W_{m−1}(a, x) · TC(x, b)   (membership: R > 0)
    *
    * with W_{m−1} the bounded walk-count bag the var-length family
    * already maintains ([[walkHooks]], stored under `prefix!w<i>`)
    * and TC the closure sub-state [[foldReachState]] maintains
    * (`prefix!tc`). Both factors' deltas fall out of their own folds
    * (ΔW netted pair counts; ΔTC ops from DRed/insertion work), and
    * the three-relation delta Δ(W ⋈ TC ⋈ V_dst) composes the same
    * two-level rule as a bounded emission — [[walkEmitDelta]] with
    * the closure as the "edge" relation, so every big frame is a
    * stored scan and every crossing side is window-sized. Counting
    * keeps deletion exact: a pair leaves only when its last
    * (walk, closure-pair) support dies. State under `prefix!state`:
    * (src, dst, __mult); src label/pred is baked into W's level-0,
    * dst label/pred into the final factor — both maintained through
    * their own vertex deltas, prop flips included.
    *
    * When the closure fold fell back to its measured RECOMPUTE (its
    * ops are then state-diff-sized — `> rederiveCap` — and the delta
    * path would broadcast them), the composition recomputes too:
    * one join over the post-fold factors, ops from the counting-state
    * diff — proportionate, the closure itself just churned.
    *
    * Returns (state0, state1, membership ±op rows) — ops fall out of
    * the fused state fold ([[mergeJoinDeltaWithOps]]), checkpointed.
    */
  private[views] def foldLowerBoundedState(catalog: ViewCatalog,
      prefix: String,
      oldStore: graft.graph.GraphStore, newStore: graft.graph.GraphStore,
      srcLabel: String, edgeLabel: String, dstLabel: String,
      minHops: Int,
      srcPred: Option[Column] = None, dstPred: Option[Column] = None,
      rederiveCap: Long = 1L << 20, maxRounds: Int = 60,
      recomputeRatio: Double = 0.3)
      : (DataFrame, DataFrame, DataFrame) = {
    require(minHops >= 2 && minHops <= 6,
      s"lower-bounded reach views maintain *m.. for m in [2, 6], got " +
        s"*$minHops.. — *1.. is the plain reachability view " +
        "(refreshReachabilityView), and the walk factor inherits the " +
        "bounded family's [1, 6] hop discipline")
    val lvl = minHops - 1
    def cut(df: DataFrame): DataFrame = df.localCheckpoint()
    val touchedV = feedTouchedV(oldStore, newStore)
    // (delta-path frames below are LAZY cuts — each materializes
    // inside the state fold's own counted job; see cutCount's doc)
    val (tc0, tc1, tcOps) = foldReachState(catalog, s"$prefix!tc",
      oldStore, newStore, edgeLabel, rederiveCap, maxRounds,
      recomputeRatio, Some(touchedV))
    val (wOld, wFold) = walkHooks(catalog, prefix, oldStore,
      srcLabel, edgeLabel, lvl + 1, srcPred, undirected = false)
    var dWL: DataFrame = null
    walkFoldLevels(oldStore, newStore, srcLabel, edgeLabel, lvl,
      srcPred, undirected = false, wOld, (i, _, _, dW, dwCnt, _, _) => {
        wFold(i, dW, dwCnt)
        if (i == lvl) dWL = dW
      }, Some(touchedV))
    val x = "__x"
    val b = "__b"
    def dstV(store: graft.graph.GraphStore) = store.vertices.filter(
        dstPred.foldLeft(col("label") === dstLabel)(_ && _))
      .select(col("id").as(b))
    def composed(walk: DataFrame, tc: DataFrame, dst: DataFrame) =
      cut(walk.join(tc, x).join(dst, b)
        .groupBy(col("c0").as("src"), col(b).as("dst"))
        .agg(sum("__mult").as("__mult")))
    val wl = wOld(lvl).select(col("c0"), col(s"c$lvl").as(x), col("__mult"))
    val tcRel = tc0.select(col("src").as(x), col("dst").as(b))
    val state0 = catalog.dataOf(s"$prefix!state").getOrElse(
      composed(wl, tcRel, dstV(oldStore)))
    if (tcOps.count() > rederiveCap) {
      // closure ops are state-diff-sized (the reach fold recomputed):
      // recompute the composition from the POST-fold factors instead
      // of broadcasting them through the delta path
      val wlNew = catalog.dataOf(s"$prefix!w$lvl").get
        .select(col("c0"), col(s"c$lvl").as(x), col("__mult"))
      val state1 = composed(wlNew,
        tc1.select(col("src").as(x), col("dst").as(b)), dstV(newStore))
      val k0 = state0.select("src", "dst")
      val k1 = state1.select("src", "dst")
      val ops = cut(k1.join(k0, Seq("src", "dst"), "left_anti")
        .select(col("src"), col("dst"), lit("add").as("op"))
        .unionByName(k0.join(k1, Seq("src", "dst"), "left_anti")
          .select(col("src"), col("dst"), lit("remove").as("op"))))
      catalog.put(s"$prefix!state", state1)
      return (state0, state1, ops)
    }
    val dJ = lazyCut(joinViewDelta(wl,
        dWL.select(col("c0"), col(s"c$lvl").as(x), col("__sign")),
        tcRel, tcOps.select(col("op"), col("src").as(x), col("dst").as(b)),
        Seq(x))
      .groupBy(col("c0"), col(b))
      .agg(sum("__sign").as("__sign"))
      .filter(col("__sign") =!= 0))
    val dstDelta = windowVertexDelta(oldStore, newStore, dstLabel,
      dstPred, "__d", Some(touchedV)).select(col("op"), col("__d").as(b))
    val delta = lazyCut(walkEmitDelta(wl, tcRel, dstV(oldStore), dJ,
      dstDelta, x, b, gateETouched = true))
    val (s1Raw, opsRaw) = mergeJoinDeltaWithOps(state0, delta)
    // the state stays an EAGER checkpoint (put-boundary contract) —
    // its job also materializes the fold's lazy `touched`/`matched`
    // probes, which the lazy ops then read as stored blocks
    val state1 = s1Raw.localCheckpoint()
    catalog.put(s"$prefix!state", state1)
    (state0, state1, lazyCut(opsRaw))
  }

  /** Catalog-driven refresh of a registered lower-bounded reach view
    * `(a:srcLabel)-[:edgeLabel*m..]->(b:dstLabel)`, m ≥ 2 — serves
    * the distinct endpoint pairs off [[foldLowerBoundedState]]'s
    * counting state (state keys are unique, all __mult > 0).
    */
  def refreshLowerBoundedReachView(catalog: ViewCatalog, name: String,
      oldStore: graft.graph.GraphStore, newStore: graft.graph.GraphStore,
      srcLabel: String, edgeLabel: String, dstLabel: String,
      minHops: Int,
      srcPred: Option[Column] = None, dstPred: Option[Column] = None,
      rederiveCap: Long = 1L << 20, maxRounds: Int = 60,
      recomputeRatio: Double = 0.3): DataFrame = {
    val (_, state1, _) = foldLowerBoundedState(catalog, name,
      oldStore, newStore, srcLabel, edgeLabel, dstLabel, minHops,
      srcPred, dstPred, rederiveCap, maxRounds, recomputeRatio)
    val view = state1.select("src", "dst")
    catalog.put(name, view)
    view
  }

  /** Min-id component labels over the UNDIRECTED view of `edges`
    * ((src, dst) pairs, orientation ignored): min-label propagation
    * with POINTER SHORTCUTTING (r13) — every vertex starts as its own
    * label; each round takes the min over neighbors (relax) and then
    * replaces its label by its label's label (shortcut, the classic
    * pointer-jumping step). Labels are always ids inside the own
    * component and per-vertex non-increasing, so a fixpoint of the
    * combined operator is a fixpoint of plain relaxation — per-
    * component min everywhere — while the shortcut halves the
    * remaining label-chain depth per round: O(log diameter) rounds
    * instead of O(diameter). Rounds are the serialized driver→cluster
    * round-trips a 100 TB refresh pays, and they dominated the local
    * wall too (ViewScaleProbe r13: a w=64 CC fold spent 22 s in ~27
    * diameter-bound rounds over chain-of-32 clusters, 1.7 MB
    * shuffle). The convergence count rides the round's own
    * materialization; the change test fuses into the round's
    * aggregate (old label carried through the union — no per-round
    * state join). `hintSmall` broadcasts the relation inside the
    * rounds — the component merge-graph caller's frames are
    * window-sized by construction. Self-loops seed their vertex but
    * propagate nothing.
    */
  private def ccLabels(edges: DataFrame, maxRounds: Int,
      hintSmall: Boolean = false): DataFrame = {
    val sym0 = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst")).distinct().localCheckpoint()
    val sym = if (hintSmall) broadcast(sym0) else sym0
    var lbl = edges.select(col("src").as("id"))
      .unionByName(edges.select(col("dst").as("id")))
      .distinct().withColumn("comp", col("id")).localCheckpoint()
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < maxRounds) {
      val msgs = sym.join(lbl.select(col("id").as("src"), col("comp")), "src")
        .select(col("dst").as("id"), col("comp"),
          lit(null).cast("long").as("__c0"))
      // relax: min over self + neighbor labels; the old label rides
      // the union (exactly one non-null __c0 per id), so the change
      // test below needs no join against the previous state
      val relaxed = lbl
        .select(col("id"), col("comp"), col("comp").as("__c0"))
        .unionByName(msgs)
        .groupBy("id").agg(min("comp").as("comp"), min("__c0").as("__c0"))
        .localCheckpoint(false)
      // shortcut: comp := comp(comp) — label chains halve every round
      val next = relaxed.join(
          relaxed.select(col("id").as("__cid"), col("comp").as("__cc")),
          col("comp") === col("__cid"), "left")
        .select(col("id"), coalesce(col("__cc"), col("comp")).as("comp"),
          col("__c0"))
        .localCheckpoint(false)
      changed = next.filter(col("comp") =!= col("__c0")).count()
      lbl = next.select("id", "comp")
      rounds += 1
    }
    require(changed == 0L,
      s"component labels did not converge in $maxRounds rounds; " +
        "raise maxRounds")
    lbl
  }

  /** Bootstrap label state for [[refreshUndirectedReachView]]:
    * (id, comp) over every vertex incident to a live `edgeLabel`
    * edge, comp = the component's minimum vertex id (deterministic,
    * stable across refreshes that do not change the component).
    */
  def initCcState(store: graft.graph.GraphStore, edgeLabel: String,
      maxRounds: Int = 60): DataFrame =
    ccLabels(store.edges.filter(col("label") === edgeLabel)
      .select("src", "dst"), maxRounds)

  /** The component-label fold behind [[refreshUndirectedReachView]]:
    * bootstraps `stateKey` from `oldStore` when absent, folds the
    * netted edge window, stores and returns (pre-fold, post-fold)
    * label states. Both directions of incremental connectivity are
    * window-proportionate:
    *
    *  - DELETION: only a component that LOST an edge can split, so
    *    labels re-derive inside the affected components only — one
    *    label propagation over the affected members' surviving old
    *    edges (an edge touching an affected component lies within it;
    *    components are closed under edges). Vertices left with no
    *    incident edge drop out of the state. The same MEASURED switch
    *    as [[foldReachState]]: when the affected membership exceeds
    *    `recomputeRatio · |state|`, one fresh propagation over the
    *    new edge set is strictly cheaper (additions fold in free).
    *  - INSERTION: an added edge can only MERGE components — map its
    *    endpoints to current labels (absent endpoints are their own
    *    provisional component), propagate min labels over the
    *    window-sized component merge-graph, and apply the resulting
    *    (old comp → new comp) map as one broadcast relabel over a
    *    state SCAN. No state shuffle on either path.
    *
    * `rederiveCap` keeps its broadcast-licensing role: frames counted
    * at or below it may hash-broadcast inside the fold.
    */
  private[views] def foldCcState(catalog: ViewCatalog, stateKey: String,
      oldStore: graft.graph.GraphStore, newStore: graft.graph.GraphStore,
      edgeLabel: String, rederiveCap: Long = 1L << 20,
      maxRounds: Int = 60, recomputeRatio: Double = 0.3)
      : (DataFrame, DataFrame) = {
    // broadcast license: row count against min(policy cap, the BYTE
    // budget for this frame's row shape) — r12 verdict #6: a row
    // count alone is row-width blind; fitsBudget derives
    // rows-from-bytes off autoBroadcastJoinThreshold exactly as
    // mergeJoinDelta already does
    def hinted(df: DataFrame, cnt: Long): DataFrame =
      if (fitsBudget(df, cnt, rederiveCap)) broadcast(df) else df
    val s0 = catalog.dataOf(stateKey).getOrElse(
      initCcState(oldStore, edgeLabel, maxRounds))
    // the state's cardinality is journal-covered catalog meta carried
    // from the counted deltas (r12 verdict #3: the old per-deletion
    // `s.count()` was one state-sized driver job per refresh per view
    // — the exact defect class the r12 review fixed via `!coreCnt` in
    // foldReachState); a fresh or reloaded catalog recounts once
    var stateCnt = catalog.metaOf(s"$stateKey!ccCnt").getOrElse(s0.count())
    val (eAdd, eRem) = reachEdgeDelta(oldStore, newStore, edgeLabel)
    def finish(s1: DataFrame): (DataFrame, DataFrame) = {
      catalog.put(stateKey, s1)
      catalog.putMeta(s"$stateKey!ccCnt", stateCnt)
      (s0, s1)
    }
    var s = s0
    val remCnt = eRem.count()
    if (remCnt > 0) {
      val remV = eRem.select(col("src").as("id"))
        .unionByName(eRem.select(col("dst").as("id"))).distinct()
      val affected = lazyCut(s.join(hinted(remV, 2 * remCnt), Seq("id"),
          "left_semi")
        .select("comp").distinct())
      val (memb, membCnt) = cutCount(s.join(hinted(affected, 2 * remCnt),
        Seq("comp"), "left_semi"))
      if (membCnt > recomputeRatio * stateCnt) {
        // the split wavefront churns most of the state — recompute
        // (additions are part of newStore's edge set, so the fold is
        // complete here); the count rides the recompute's own
        // materialization
        val (rc, rcCnt) = cutCount(initCcState(newStore, edgeLabel, maxRounds))
        stateCnt = rcCnt
        return finish(rc)
      }
      val eMid = oldStore.edges.filter(col("label") === edgeLabel)
        .select("src", "dst")
        .join(hinted(eRem, remCnt), Seq("src", "dst"), "left_anti")
        .join(hinted(memb.select(col("id").as("src")), membCnt),
          Seq("src"), "left_semi")
      // the re-derivation propagation shuffles the affected
      // subgraph's edges, which membCnt (a vertex count) does not
      // bound in a dense component — so no broadcast hint here; the
      // shuffle is proportionate to the wavefront by construction.
      // The carried cardinality rides the fold's own materialization:
      // cutCount's count IS the checkpoint job (no extra driver
      // action vs the old eager cut) — members with no surviving
      // edge drop out of the union here.
      val (s1, s1Cnt) = cutCount(
        s.join(hinted(affected, 2 * remCnt), Seq("comp"), "left_anti")
          .unionByName(ccLabels(eMid, maxRounds)))
      s = s1
      stateCnt = s1Cnt
    }
    val addCnt = eAdd.count()
    if (addCnt > 0) {
      val endpoints = lazyCut(eAdd.select(col("src").as("id"))
        .unionByName(eAdd.select(col("dst").as("id"))).distinct())
      // current labels of the touched endpoints: known off one state
      // scan; endpoints the state has never seen are their own
      // provisional component
      val known = lazyCut(s.join(hinted(endpoints, 2 * addCnt), Seq("id"),
        "left_semi"))
      val fresh = lazyCut(endpoints.join(
          hinted(known.select("id"), 2 * addCnt), Seq("id"), "left_anti")
        .withColumn("comp", col("id")))
      val epLbl = hinted(known.unionByName(fresh), 2 * addCnt)
      // component merge-graph: one node per touched label, one edge
      // per added edge — window-sized, so the propagation broadcasts
      val mgEdges = eAdd
        .join(epLbl.select(col("id").as("src"), col("comp").as("__cs")),
          "src")
        .join(epLbl.select(col("id").as("dst"), col("comp").as("__cd")),
          "dst")
        .select(col("__cs").as("src"), col("__cd").as("dst"))
      val mapping = ccLabels(mgEdges, maxRounds, hintSmall = true)
        .filter(col("id") =!= col("comp"))
        .select(col("id").as("__oc"), col("comp").as("__nc"))
      // one broadcast relabel over a state scan; fresh endpoints join
      // the state under their merged label. The count rides the
      // relabel's own materialization (cutCount — one fused job, like
      // the deletion branch) and maintains the carried `!ccCnt`.
      val (s2, s2Cnt) = cutCount(s.unionByName(fresh)
        .join(broadcast(mapping), col("comp") === col("__oc"), "left_outer")
        .select(col("id"), coalesce(col("__nc"), col("comp")).as("comp")))
      s = s2
      stateCnt = s2Cnt
    }
    finish(s)
  }

  /** Same-component endpoint pairs off a label state: the served rows
    * of an undirected unbounded view. Label/pred filters are serve-
    * time semi-joins (a vertex prop flip re-serves without touching
    * the labels); the comp self-join is the one place the output is
    * inherently quadratic IN COMPONENT SIZE — the query asks for all
    * same-component pairs, so that is the answer's own cardinality,
    * not maintenance state (the state stays O(V)).
    */
  private def serveCcPairs(store: graft.graph.GraphStore,
      state: DataFrame, srcLabel: String, dstLabel: String,
      srcPred: Option[Column], dstPred: Option[Column]): DataFrame = {
    def vSet(label: String, pred: Option[Column]) =
      store.vertices.filter(pred.foldLeft(col("label") === label)(_ && _))
        .select("id")
    val a = state.join(vSet(srcLabel, srcPred), Seq("id"), "left_semi")
      .select(col("id").as("src"), col("comp"))
    val b = state.join(vSet(dstLabel, dstPred), Seq("id"), "left_semi")
      .select(col("id").as("dst"), col("comp"))
    a.join(b, "comp").select("src", "dst")
  }

  /** Catalog-driven refresh of an UNDIRECTED unbounded reach view
    * `(a:srcLabel)-[:edgeLabel*m..]-(b:dstLabel)` — exactly
    * incremental CONNECTED COMPONENTS (the reference's G3/G4,
    * graph/algorithms/src/basic.rs:158-206, maintained instead of
    * recomputed): under the executor's walk semantics over the
    * symmetrized edge bag, reachability is same-component membership,
    * and every lower bound m serves the SAME rows — a pair with a
    * length-k walk has walks of length k+2j for all j (bounce on any
    * incident edge), so "length ≥ m" never excludes a connected pair.
    * The closure pair-set the directed family stores would be
    * Σ|comp|² here; the label state is O(V) and the pairs are a
    * serve-time comp self-join ([[serveCcPairs]]).
    *
    * State under `name!cc`: (id, comp), comp = component min id.
    * Served rows under `name`: distinct (src, dst) — self-pairs
    * included, exactly the executor's orientation-union expansion.
    */
  def refreshUndirectedReachView(catalog: ViewCatalog, name: String,
      oldStore: graft.graph.GraphStore, newStore: graft.graph.GraphStore,
      srcLabel: String, edgeLabel: String, dstLabel: String,
      srcPred: Option[Column] = None, dstPred: Option[Column] = None,
      rederiveCap: Long = 1L << 20, maxRounds: Int = 60,
      recomputeRatio: Double = 0.3): DataFrame = {
    val (_, s1) = foldCcState(catalog, s"$name!cc", oldStore, newStore,
      edgeLabel, rederiveCap, maxRounds, recomputeRatio)
    val view = serveCcPairs(newStore, s1, srcLabel, dstLabel,
      srcPred, dstPred)
    catalog.put(name, view)
    view
  }

  /** Catalog-driven refresh of a registered single-hop MATCH-pattern
    * view: first call bootstraps from `oldStore`, later calls fold
    * the change feed's signed delta into the maintained state —
    * never re-running the MATCH. Returns the view as plain rows.
    *
    * The catalog holds TWO frames: the finalized row view under
    * `name` (what the router SERVES — no `__mult` bookkeeping leaks
    * to consumers) and the multiset state under `name!state` (what
    * the next refresh folds into).
    */
  def refreshPatternView(catalog: ViewCatalog, name: String,
      oldStore: graft.graph.GraphStore, newStore: graft.graph.GraphStore,
      srcLabel: String, edgeLabel: String, dstLabel: String,
      srcPred: Option[Column] = None,
      dstPred: Option[Column] = None,
      edgePred: Option[Column] = None,
      undirected: Boolean = false): DataFrame = {
    val state0 = catalog.dataOf(s"$name!state").getOrElse(
      initPatternState(oldStore, srcLabel, edgeLabel, dstLabel,
        srcPred, dstPred, edgePred, undirected))
    val delta = patternViewDelta(oldStore, newStore,
      srcLabel, edgeLabel, dstLabel, srcPred, dstPred, edgePred,
      undirected)
    // a refresh MATERIALIZES its state (localCheckpoint — eager,
    // lineage-cut): the state IS the view, and leaving it lazy makes
    // refresh chains compose every prior round's delta plan into one
    // nest the analyzer re-walks per action (measured 51 s → ~2 s for
    // a two-round chain at sf0.1, almost all of it driver-side
    // planning). Same discipline as GraphStore.truncated().
    val state1 = mergeJoinDelta(state0, delta).localCheckpoint()
    catalog.put(s"$name!state", state1)
    val view = finalizeJoin(state1)
    catalog.put(name, view)
    view
  }

  /** G2/V5 analytics refresh: maintain a PageRank view through the
    * catalog — the first refresh computes cold (reference-exact fixed
    * iterations); every later refresh WARM-STARTS power iteration
    * from the prior materialization (Algorithms.pageRankIncremental),
    * so post-delta refresh cost tracks the perturbation, not the
    * graph. The reference re-runs from scratch on every refresh
    * (incremental_engine.rs G2 path); this is the incremental form.
    */
  def refreshPageRankView(catalog: ViewCatalog, name: String,
      vertices: DataFrame, edges: DataFrame, damping: Double = 0.85,
      coldIters: Int = 20, tol: Double = 1e-7, maxIter: Int = 50): DataFrame = {
    val scores = catalog.dataOf(name) match {
      case Some(prior) => graft.algorithms.Algorithms.pageRankIncremental(
        vertices, edges, prior, damping, tol, maxIter)
      case None => graft.algorithms.Algorithms.pageRank(
        vertices, edges, damping, coldIters)
    }
    catalog.put(name, scores)
    scores
  }

  /** Exactly-once view maintenance under foreachBatch retries: Spark
    * re-delivers a batch with the SAME batchId after restarts, so the
    * merge must be idempotent per id (SURVEY §7 watch list — the
    * reference's WAL/OCC has no Spark analogue; batch-id dedup is the
    * Spark-native equivalent). `appliedIds` should be persisted
    * alongside the view data in production (same parquet commit).
    */
  final class IdempotentMerge(initial: DataFrame) {
    @volatile var state: DataFrame = initial
    private var applied: Set[Long] = Set.empty
    def appliedIds: Set[Long] = applied

    def apply(batch: DataFrame, batchId: Long)(
        merge: (DataFrame, DataFrame) => DataFrame): Unit = synchronized {
      if (!applied.contains(batchId)) {
        state = merge(state, batch).localCheckpoint()
        applied += batchId
      }
    }
  }

  // ---- V6: query router -------------------------------------------

  sealed trait QueryPattern
  case class LookupPattern(keys: Seq[Long]) extends QueryPattern
  case class AggPattern(aggregateType: String) extends QueryPattern
  case class AnalyticsPattern(algorithm: String) extends QueryPattern
  case class TraversalPattern(kind: String) extends QueryPattern
  case class SqlPattern(sql: String) extends QueryPattern

  /** Match score (query_router.rs:192-260): Lookup = key coverage %,
    * Aggregation equality 95, Analytics equality 90, traversal via a
    * graph_traversal view 75, Hybrid = max over parts, SQL catch-all
    * 50. Ties broken by the per-type latency estimate
    * (query_router.rs:263-285).
    */
  def score(pattern: QueryPattern, vt: ViewType): Double = (pattern, vt) match {
    case (LookupPattern(qk), Lookup(_, vk)) =>
      if (vk.isEmpty) 100.0
      else if (qk.isEmpty) 0.0
      else 100.0 * qk.count(vk.contains).toDouble / qk.size
    case (AggPattern(a), Aggregation(b, _, _)) if a == b => 95.0
    case (AnalyticsPattern(a), Analytics(b, _)) if a == b => 90.0
    case (TraversalPattern(_), Analytics("graph_traversal", _)) => 75.0
    case (p, Hybrid(parts)) => parts.map(score(p, _)).maxOption.getOrElse(0.0)
    case (_, SqlQuery(_, _)) => 50.0
    case _ => 0.0
  }

  def latencyEstimateMs(vt: ViewType): Double = vt match {
    case _: Lookup => 1.0
    case _: Aggregation => 2.0
    case _: Analytics => 5.0
    case _: Hybrid => 3.0
    case _: SqlQuery => 10.0
  }

  final class QueryRouter(catalog: ViewCatalog) {
    /** Best view: max score, then min latency (query_router.rs:183-188);
      * None below the 50-score routability floor.
      */
    def route(pattern: QueryPattern): Option[String] = {
      val scored = catalog.definitions.map { d =>
        (d.name, score(pattern, d.viewType), latencyEstimateMs(d.viewType))
      }.filter(_._2 >= 50.0)
      scored.sortBy { case (n, s, l) => (-s, l, n) }.headOption.map(_._1)
    }

    /** V7: routed read — view data on hit, else caller computes. */
    def routedData(pattern: QueryPattern): Option[DataFrame] =
      route(pattern).flatMap(catalog.dataOf)
  }
}
