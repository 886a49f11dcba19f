package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

import graft.graph.GraphStore
import graft.model.PropValue
import graft.views.Views

/** Dev probe: where does DRed candidate-restricted re-derivation stop
  * paying versus a fresh semi-naive recompute for the unbounded
  * reachability view — i.e., what should `recomputeRatio` default to?
  *
  * Fixture: C independent cluster DAGs of 32 vertices (a chain plus
  * j→j+7 skip bypasses every 5th vertex), so the closure is the sum
  * of per-cluster closures and a deletion batch touching k clusters
  * produces a deletion wavefront of ≈ k/C of the state — a direct,
  * controllable sweep of the aCnt/|state| ratio. Each sweep point
  * deletes the mid-chain edge in k clusters (bypasses keep some
  * candidate pairs alive, so re-derivation genuinely re-derives),
  * then times BOTH branches of Views.refreshReachabilityView from an
  * identical pre-built state: recomputeRatio = ∞ forces DRed,
  * recomputeRatio = 0 forces the recompute fallback. Run at 1× and
  * 10× (C = 200 / 2000; |state| ≈ 0.12M / 1.2M pairs) to check the
  * crossover RATIO is scale-stable — the reason the r11 switch is a
  * ratio and not the old fixed 2²⁰ row cap.
  *
  * Usage: runMain graft.tools.ReachCrossoverProbe [scaleList]
  */
object ReachCrossoverProbe {
  private val S = 32 // cluster size; chain depth 31 < maxRounds

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val scales = args.headOption.getOrElse("1,10")
      .split(",").map(_.trim.toInt).toSeq
    val noProps = lit(null).cast(PropValue.mapType)

    for (scale <- scales) {
      val clusters = 200 * scale
      val n = clusters.toLong * S
      val verts = spark.range(n)
        .select(col("id"), lit("N").as("label"), noProps.as("props"))
      val ids = spark.range(n).select(col("id"))
      val chain = ids.filter(col("id") % S =!= (S - 1))
        .select(col("id").as("src"), (col("id") + 1).as("dst"))
      val skips = ids.filter(col("id") % S < (S - 7) && col("id") % 5 === 0)
        .select(col("id").as("src"), (col("id") + 7).as("dst"))
      val edges = chain.unionByName(skips)
        .withColumn("label", lit("dep")).withColumn("props", noProps)
      val base = GraphStore(verts.localCheckpoint(),
        edges.localCheckpoint())
      val state = Views.initReachState(base, "dep")
      val stateCnt = state.count()
      println(s"PROBE scale=${scale}x clusters=$clusters " +
        s"edges=${base.edges.count()} state=$stateCnt")

      def timed(f: => DataFrame): (Double, DataFrame) = {
        val t0 = System.nanoTime()
        val df = f
        ((System.nanoTime() - t0) / 1e9, df)
      }
      for (frac <- Seq(0.02, 0.10, 0.25, 0.50, 1.00)) {
        val k = math.max(1, (clusters * frac).toInt)
        // the mid-chain edge of the first k clusters
        val dels = spark.range(k.toLong)
          .select((col("id") * S + S / 2).as("src"),
            (col("id") * S + S / 2 + 1).as("dst"), lit("dep").as("label"))
        val m1 = base.removeEdges(dels).truncatedEdges()
        // the wavefront the refresh will measure, replicated here
        // (outside the timers) so the table reports the ratio the
        // switch actually sees
        val remUV = dels.select(col("src").as("__u"), col("dst").as("__v"))
        val rToU = state.select(col("src").as("__a"), col("dst").as("__u"))
        val rFromV = state.select(col("src").as("__v"), col("dst").as("__b"))
        val aCnt = dels.select("src", "dst")
          .unionByName(rToU.join(remUV, "__u")
            .select(col("__a").as("src"), col("__v").as("dst")))
          .unionByName(remUV.join(rFromV, "__v")
            .select(col("__u").as("src"), col("__b").as("dst")))
          .unionByName(rToU.join(remUV, "__u").join(rFromV, "__v")
            .select(col("__a").as("src"), col("__b").as("dst")))
          .distinct().count()
        def run(ratio: Double): (Double, DataFrame) = {
          val cat = new Views.ViewCatalog(spark,
            java.nio.file.Files.createTempDirectory("graft_rxp").toString)
          cat.put("tc!state", state)
          timed(Views.refreshReachabilityView(cat, "tc", base, m1,
            "N", "dep", "N", recomputeRatio = ratio))
        }
        val (tDred, vD) = run(Double.MaxValue)
        val (tRec, vR) = run(0.0)
        // parity guard: both branches must land the same view
        val diff = vD.unionByName(vR).groupBy("src", "dst")
          .agg(count(lit(1)).as("c")).filter(col("c") =!= 2).count()
        require(diff == 0, s"branch parity broke at frac=$frac")
        println(f"PROBE scale=${scale}x frac=$frac%.2f delEdges=$k " +
          f"aCnt=$aCnt ratio=${aCnt.toDouble / stateCnt}%.3f " +
          f"tDRed=$tDred%.2fs tRecompute=$tRec%.2fs " +
          f"winner=${if (tDred < tRec) "DRed" else "recompute"}")
      }
    }
    spark.stop()
  }
}
