package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

import graft.graph.GraphStore
import graft.model.PropValue
import graft.views.Views

/** Dev probe: the r10/r11 pattern-view family's second measured scale
  * decade — incremental refresh vs full recompute for the UNDIRECTED,
  * COMPOSED (var-length + hop), CHAIN-WHERE, and (r12) the
  * LOWER-BOUNDED *m.. classes (standalone and composed — their
  * windows churn the closure itself, over a clustered-DAG `dep`
  * graph whose chain depth stays under the reach fold's maxRounds),
  * at 1× and 10× graph size with mutation windows from tiny to 2% of
  * edges. Each cell also reports DRIVER JOBS per refresh (r12 —
  * scheduler round-trips are the cluster latency floor at
  * view-catalog scale). (The UNBOUNDED class has its own dedicated
  * sweep — [[ReachCrossoverProbe]] — because its switch is
  * intra-refresh.)
  *
  * Fixture: n "N" vertices carrying a float prop, n/10 "M" vertices;
  * `link` a DAG (i→i+1 except every 97th, plus i→i+2 every 5th),
  * `peer` an undirected sparse graph (3j —— 3j+13), `owns` a fan-in
  * to the M layer (even i → M[i mod n/10]). Each class registers its
  * GQL definition, bootstraps on the base store (untimed), then for
  * each window size w: build a store with w removes + w adds (plus,
  * for the WHERE class, w prop flips — the delta source unique to
  * it), time the INCREMENTAL refresh against that window, and time a
  * RECOMPUTE (fresh catalog bootstrapped directly on the end state).
  *
  * Each cell also reports SHUFFLE WRITE BYTES, and that column — not
  * wall-clock — is the cluster-scale signal: on local[32] a shuffle
  * costs the same as a scan (both hit the page cache), so recompute's
  * corpus-sized joins and the refresh's broadcast-probed scans time
  * alike; on a 1000-executor cluster the shuffle crosses the network
  * and the scan does not. Wall-clock here measures job-count overhead
  * and scan multiplicity; shuffle bytes measure what 100 TB would pay.
  *
  * Usage: runMain graft.tools.ViewScaleProbe [scaleList]
  * (scale 100 needs SPARK_DRIVER_MEM=48g — one JVM holds the base
  * store, both catalogs' states, and the fixpoint checkpoints)
  */
object ViewScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val shuffleW = new java.util.concurrent.atomic.AtomicLong
    val jobsN = new java.util.concurrent.atomic.AtomicLong
    val bcastN = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val m = s.stageInfo.taskMetrics
          if (m != null)
            shuffleW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
        // jobs per refresh = driver actions = scheduler round-trips:
        // on a real cluster each is a driver→executors latency floor,
        // so at view-catalog scale (hundreds of views per batch) the
        // count matters independently of data volume (r12 verdict #4).
        // Split out BROADCAST-build jobs — they are intrinsic to the
        // broadcast-everything delta design (one per exchange), run
        // concurrently with their parent action on a cluster, and are
        // not the serialized count()/checkpoint round-trips the
        // verdict targets.
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobsN.incrementAndGet()
          // broadcast builds run on the exchange thread pool; their
          // jobs' stages all carry the withThreadLocalCaptured
          // callsite (measured via JobTraceProbe) — the description
          // property does not mark them in this Spark version
          if (j.stageInfos.lastOption.exists(
              _.name.contains("withThreadLocalCaptured")))
            bcastN.incrementAndGet()
        }
      })
    val scales = args.headOption.getOrElse("1,10")
      .split(",").map(_.trim.toInt).toSeq
    val noProps = lit(null).cast(PropValue.mapType)

    for (scale <- scales) {
      val n = 50000L * scale
      val m = n / 10
      val nV = spark.range(n).select(col("id"), lit("N").as("label"),
        map(lit("w"), PropValue.ofFloat(col("id").cast("double")))
          .as("props"))
      val mV = spark.range(m).select((col("id") + n).as("id"),
        lit("M").as("label"),
        map(lit("v"), PropValue.ofFloat(col("id").cast("double")))
          .as("props"))
      val ids = spark.range(n)
      val link = ids.filter(col("id") % 97 =!= 0 && col("id") < n - 1)
        .select(col("id").as("src"), (col("id") + 1).as("dst"))
        .unionByName(ids.filter(col("id") % 5 === 0 && col("id") < n - 2)
          .select(col("id").as("src"), (col("id") + 2).as("dst")))
        .withColumn("label", lit("link"))
      val peer = ids.filter(col("id") % 3 === 0 && col("id") < n - 13)
        .select(col("id").as("src"), (col("id") + 13).as("dst"))
        .withColumn("label", lit("peer"))
      val owns = ids.filter(col("id") % 2 === 0)
        .select(col("id").as("src"), (col("id") % m + n).as("dst"))
        .withColumn("label", lit("owns"))
      // `dep`: C clustered DAGs of 32 (chain + j→j+7 skips every
      // 5th) — the closure-backed classes need chain depth under the
      // reach fold's maxRounds, same fixture shape as
      // [[ReachCrossoverProbe]]; closure ≈ 560 pairs per cluster
      val cSize = 32L
      val clusters = n / cSize
      val dep = ids.filter(col("id") % cSize =!= (cSize - 1))
        .select(col("id").as("src"), (col("id") + 1).as("dst"))
        .unionByName(ids.filter(
            col("id") % cSize < (cSize - 7) && col("id") % 5 === 0)
          .select(col("id").as("src"), (col("id") + 7).as("dst")))
        .withColumn("label", lit("dep"))
      val base = GraphStore(
        nV.unionByName(mV).localCheckpoint(),
        link.unionByName(peer).unionByName(owns).unionByName(dep)
          .withColumn("props", noProps).localCheckpoint())
      val eCnt = base.edges.count()
      println(s"PROBE scale=${scale}x n=$n edges=$eCnt")

      // (sec, shuffle write bytes, action jobs, broadcast-build jobs)
      // — the listener is async, so drain ~settled events on both
      // edges of the block
      def timed[A](f: => A): (Double, Long, Long, Long) = {
        Thread.sleep(300)
        val w0 = shuffleW.get
        val j0 = jobsN.get
        val b0 = bcastN.get
        val t0 = System.nanoTime(); f
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        val b = bcastN.get - b0
        (sec, shuffleW.get - w0, jobsN.get - j0 - b, b)
      }
      def newCat() = new Views.ViewCatalog(spark,
        java.nio.file.Files.createTempDirectory("graft_vsp").toString)

      // one store per window size: w link/peer/owns removes + w adds
      // in a disjoint id range, plus w N-prop flips (doubling every
      // flipped vertex's w — membership churn for the WHERE class,
      // harmless label-only touches for the others)
      def mutate(w: Long): GraphStore = {
        val r = spark.range(w)
        val dels = r.select((col("id") * 2 + 1).as("src"),
            (col("id") * 2 + 2).as("dst"), lit("link").as("label"))
          .filter((col("src") % 97 =!= 0) && col("src") < n - 1)
          .unionByName(r.select((col("id") * 3).as("src"),
            (col("id") * 3 + 13).as("dst"), lit("peer").as("label"))
            .filter(col("src") < n - 13))
          .unionByName(r.select((col("id") * 2).as("src"),
            (col("id") * 2 % m + n).as("dst"), lit("owns").as("label")))
        val adds = r.select((col("id") + n / 2).as("src"),
            (col("id") + n / 2 + 3).as("dst"), lit("link").as("label"))
          .filter(col("dst") < n)
          .unionByName(r.select((col("id") * 3 + 1).as("src"),
            (col("id") * 3 + 24).as("dst"), lit("peer").as("label"))
            .filter(col("dst") < n))
          .unionByName(r.select((col("id") * 2 + 1).as("src"),
            ((col("id") * 2 + 1) % m + n).as("dst"),
            lit("owns").as("label")))
          .withColumn("props", noProps)
        val flips = r.select((col("id") + n / 4).as("id"),
          map(lit("w"), PropValue.ofFloat(
            (col("id") + n / 4).cast("double") * 2.0)).as("props"))
        base.removeEdges(dels).addEdges(adds).updateVertexProps(flips)
          .truncated().truncatedEdges()
      }

      // dep-churn windows for the closure-backed classes: remove the
      // mid-chain edge of the first w clusters (the j→j+7 skip at
      // offset 15 keeps straddling pairs alive, so DRed genuinely
      // re-derives), add a fresh skip in the next w, plus the same
      // owns churn for the composed tail hop
      def mutateDep(w: Long): GraphStore = {
        val r = spark.range(math.min(w, clusters))
        val depDels = r.select((col("id") * cSize + 16).as("src"),
          (col("id") * cSize + 17).as("dst"), lit("dep").as("label"))
        val depAdds = r.select(
            ((col("id") + w) % clusters * cSize + 3).as("src"),
            ((col("id") + w) % clusters * cSize + 10).as("dst"),
            lit("dep").as("label"))
        val ownsDels = r.select((col("id") * 2).as("src"),
          (col("id") * 2 % m + n).as("dst"), lit("owns").as("label"))
        val ownsAdds = r.select((col("id") * 2 + 1).as("src"),
          ((col("id") * 2 + 1) % m + n).as("dst"), lit("owns").as("label"))
        base.removeEdges(depDels.unionByName(ownsDels))
          .addEdges(depAdds.unionByName(ownsAdds)
            .withColumn("props", noProps))
          .truncated().truncatedEdges()
      }

      val allClasses = Seq(
        "undirected" -> "MATCH (a:N)-[:peer]-(b:N)",
        "composed" -> "MATCH (a:N)-[:link*1..2]->(b:N)-[:owns]->(c:M)",
        "where_chain" -> ("MATCH (a:N)-[:link]->(b:N)-[:owns]->(c:M) " +
          "WHERE a.w < b.w AND c.v >= 0"),
        // r12: the two r11-new classes, previously argued from shared
        // machinery — *m.. lower-bounded (walk ⋈ closure) standalone
        // and composed with a further hop; their windows churn the
        // dep closure itself (mutateDep)
        "lower_bounded" -> "MATCH (a:N)-[:dep*2..]->(b:N)",
        "composed_lower" -> "MATCH (a:N)-[:dep*2..]->(b:N)-[:owns]->(c:M)")
      // the third decade is about the recompute-side join growth, and
      // the composed class is where the crossover showed at 10× —
      // bound the runtime by probing only it past 10×
      val classes =
        if (scale >= 100) allClasses.filter(_._1 == "composed")
        else allClasses
      // untimed warmup refresh: the very first refresh JIT-compiles
      // the whole delta machinery (measured ~2 s of the first cell)
      locally {
        val warm = newCat()
        graft.gql.GqlViews.register(warm, "warm", allClasses.head._2)
        graft.gql.GqlViews.refresh(warm, "warm", base, mutate(1)).count()
      }
      val only = args.drop(1).headOption
        .map(_.split(",").map(_.trim).toSet)
      for ((cls, defn) <- classes if only.forall(_.contains(cls))) {
        val depCls = cls == "lower_bounded" || cls == "composed_lower"
        for (w <- Seq(64L, n / 1000, n / 50)) {
          val m1 = if (depCls) mutateDep(w) else mutate(w)
          val cat = newCat()
          graft.gql.GqlViews.register(cat, cls, defn)
          graft.gql.GqlViews.refresh(cat, cls, base, base).count() // boot
          val (tInc, sInc, jInc, bInc) = timed(
            graft.gql.GqlViews.refresh(cat, cls, base, m1).count())
          val cat2 = newCat()
          graft.gql.GqlViews.register(cat2, cls, defn)
          val (tRec, sRec, jRec, bRec) = timed(
            graft.gql.GqlViews.refresh(cat2, cls, m1, m1).count())
          println(f"PROBE scale=${scale}x class=$cls w=$w " +
            f"tRefresh=$tInc%.2fs shfRefresh=${sInc / 1e6}%.1fMB " +
            f"jobsRefresh=$jInc bcastRefresh=$bInc " +
            f"tRecompute=$tRec%.2fs shfRecompute=${sRec / 1e6}%.1fMB " +
            f"jobsRecompute=$jRec bcastRecompute=$bRec " +
            f"shfRatio=${sRec.toDouble / math.max(1L, sInc)}%.1fx")
        }
      }

      // r13 (r12 verdict #2): decade rows for the CC class
      // (undirected unbounded = incremental connected components) —
      // the one maintained class with no measured refresh-shuffle
      // table. Undirected CC over the clustered `dep` graph: each
      // 32-vertex cluster is one component. SPLIT-heavy windows cut
      // w clusters at offset 27→28 (no skip straddles it: the only
      // candidate j=25 fails j%32<25, so the removal genuinely
      // splits — the risky re-derivation path); MERGE-heavy windows
      // bridge w adjacent cluster pairs. FOLD and SERVE are timed
      // separately: the fold (foldCcState) is the maintenance cost
      // whose window-boundedness is under test — its jobs run
      // eagerly inside the refresh call; the serve materializes the
      // all-pairs view, whose size is the ANSWER's own cardinality
      // (quadratic in component size by definition), not state.
      if (scale < 100 &&
          only.forall(o => o.exists(t => t == "cc" || t.startsWith("cc_")))) {
        def ccStore(split: Boolean, w: Long): GraphStore =
          if (split) {
            // cut the 27→28 chain edge AND every skip that could
            // bridge it (skips live on ABSOLUTE ids ≡ 0 mod 5, so
            // per cluster exactly one of offsets 21..24 may carry a
            // bridging j→j+7 — removing all four candidate offsets
            // guarantees EVERY windowed cluster genuinely splits
            // into {0..27} and {28..31}; the remaining skips end ≤ 27
            // and stay inside the parts)
            val r = spark.range(math.min(w, clusters))
            val cuts = (Seq(27L -> 28L) ++
              (21L to 24L).map(k => k -> (k + 7)))
              .map { case (a, b) =>
                r.select((col("id") * cSize + a).as("src"),
                  (col("id") * cSize + b).as("dst"), lit("dep").as("label"))
              }.reduce(_ unionByName _)
            base.removeEdges(cuts).truncated().truncatedEdges()
          } else {
            // bridge i→i+1 within GROUPS of 8 clusters: the merge
            // graph is a depth-8 component chain (exercises the
            // shortcut's multi-round convergence — pre-r13 this path
            // FAILED outright past 60 chained components) while the
            // merged components stay 256 vertices, so the all-pairs
            // serve stays countable (an unbounded chain merged the
            // whole window into ONE component whose answer is
            // quadratic in w — 1B served rows at w=1000)
            val r = spark.range(math.min(w, clusters - 1))
              .filter(col("id") % 8 =!= 7)
            base.addEdges(r.select((col("id") * cSize + 31).as("src"),
                ((col("id") + 1) * cSize).as("dst"), lit("dep").as("label"))
                .withColumn("props", noProps))
              .truncated().truncatedEdges()
          }
        for (kind <- Seq("cc_split", "cc_merge");
             w <- Seq(64L, n / 1000, n / 50)) {
          val m1 = ccStore(kind == "cc_split", w)
          val cat = newCat()
          Views.refreshUndirectedReachView(cat, "ccv", base, base,
            "N", "dep", "N") // boot (fold jobs run eagerly inside)
          val (tFold, sFold, jFold, bFold) = timed(
            Views.refreshUndirectedReachView(cat, "ccv", base, m1,
              "N", "dep", "N"))
          val (tSrv, sSrv, _, _) = timed(cat.dataOf("ccv").get.count())
          val cat2 = newCat()
          val (tRec, sRec, jRec, bRec) = timed(
            Views.refreshUndirectedReachView(cat2, "ccv", m1, m1,
              "N", "dep", "N"))
          println(f"PROBE scale=${scale}x class=$kind w=$w " +
            f"tFold=$tFold%.2fs shfFold=${sFold / 1e6}%.1fMB " +
            f"jobsFold=$jFold bcastFold=$bFold " +
            f"tServe=$tSrv%.2fs shfServe=${sSrv / 1e6}%.1fMB " +
            f"tRecompute=$tRec%.2fs shfRecompute=${sRec / 1e6}%.1fMB " +
            f"jobsRecompute=$jRec bcastRecompute=$bRec " +
            f"shfRatio=${sRec.toDouble / math.max(1L, sFold)}%.1fx")
        }
      }
    }
    spark.stop()
  }
}
