package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Dev probe: is g32_temporal_reach's round count intrinsic?
  *
  * The min-date frontier relaxation settles all ≤ k-hop earliest
  * arrivals by round k (Bellman-Ford semantics), so its round count
  * IS the temporal-arrival hop diameter + 1 (the final empty round).
  * What could still be shaved is CHURN: if (seed, v) entries improve
  * many times before settling, ascending date-BUCKET processing
  * (Dijkstra-in-bulk: arrivals below the current bucket are final)
  * would cut wasted improvements — at the price of Σ within-bucket
  * chains ≥ the global chain in ROUND count. This probe measures
  * both sides: per-round improvement counts, total improvements vs
  * distinct settled entries (churn ratio), and the wall clock of the
  * shipped plan. Churn ≈ 1 means every entry is written ~once — no
  * headroom for bucket ordering, record FINAL.
  *
  * Usage: runMain graft.tools.TemporalReachProbe [sfDir]
  */
object TemporalReachProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sources.Tables

    // the g32 fixture graph
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o"), col("l_suppkey").cast("long").as("sk"))
      .distinct()
    val b = li.select(col("o").as("o2"), col("sk").as("sk2"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("o"), col("o_orderdate").as("d"))
    val te = li.join(b, col("o") === col("o2") && col("sk") =!= col("sk2"))
      .join(ord, Seq("o"))
      .select(col("sk").as("src"), col("sk2").as("dst"), col("d"))
    val seeds = Tables.supplier(spark, dir)
      .select(col("s_suppkey").cast("long").as("id")).filter(col("id") <= 3)
    val sentinel = java.sql.Timestamp.valueOf("1990-01-01 00:00:00")

    // instrumented copy of Algorithms.temporalReachability's loop
    val e = te.select(col("src"), col("dst"), col("d").as("ed"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def cut(df: DataFrame): DataFrame = df.localCheckpoint()
    // warm the shared edge cache OUTSIDE both timers so neither
    // variant pays the fixture materialization
    val eCnt = e.count()
    println(s"PROBE temporalEdges=$eCnt")
    val t0 = System.nanoTime()
    var arrival = cut(seeds.select(col("id").as("seed"), col("id"),
      lit(sentinel).as("d")))
    var frontier = arrival
    var frontierCnt = frontier.count()
    var rounds = 0
    var totalImprovements = 0L
    val perRound = scala.collection.mutable.Buffer[Long]()
    while (frontierCnt > 0 && rounds < 100) {
      val candidates = frontier.join(e,
          frontier("id") === e("src") && e("ed") >= frontier("d"))
        .select(col("seed"), col("dst").as("id"), col("ed").as("d"))
        .groupBy("seed", "id").agg(min(col("d")).as("d"))
      val improved = cut(candidates
        .join(arrival.select(col("seed"), col("id"), col("d").as("old")),
          Seq("seed", "id"), "left")
        .filter(col("old").isNull || col("d") < col("old"))
        .select("seed", "id", "d"))
      frontierCnt = improved.count()
      if (frontierCnt > 0) {
        perRound += frontierCnt
        totalImprovements += frontierCnt
        arrival = cut(arrival.unionByName(improved)
          .groupBy("seed", "id").agg(min(col("d")).as("d")))
        frontier = improved
      }
      rounds += 1
    }
    val secs = (System.nanoTime() - t0) / 1e9
    val settled = arrival.count()
    println(s"PROBE rounds=$rounds (incl. final empty) " +
      s"improvementsPerRound=${perRound.mkString(",")}")
    println(f"PROBE settledEntries=$settled totalImprovements=" +
      f"$totalImprovements churn=${totalImprovements.toDouble / settled}%.3f " +
      f"wall=$secs%.1f s")

    // VARIANT: ascending date-bucket processing (Dijkstra-in-bulk).
    // Arrivals below the current bucket are final, so cross-bucket
    // churn vanishes — at the price of per-bucket mini-fixpoints
    // (Σ within-bucket chains ≥ the global chain in round count).
    val years = (1992 to 1998).map(y =>
      java.sql.Timestamp.valueOf(s"$y-12-31 23:59:59"))
    val t1 = System.nanoTime()
    var arr2 = cut(seeds.select(col("id").as("seed"), col("id"),
      lit(sentinel).as("d")))
    var rounds2 = 0
    var improvements2 = 0L
    var lo = sentinel
    for (hi <- years) {
      val eb = cut(e.filter(col("ed") > lo && col("ed") <= hi))
      var fCnt = -1L
      var frontier2 = arr2.filter(col("d") <= hi)
      while (fCnt != 0) {
        val cands = frontier2.join(eb,
            frontier2("id") === eb("src") && eb("ed") >= frontier2("d"))
          .select(col("seed"), col("dst").as("id"), col("ed").as("d"))
          .groupBy("seed", "id").agg(min(col("d")).as("d"))
        val improved = cut(cands
          .join(arr2.select(col("seed"), col("id"), col("d").as("old")),
            Seq("seed", "id"), "left")
          .filter(col("old").isNull || col("d") < col("old"))
          .select("seed", "id", "d"))
        fCnt = improved.count()
        rounds2 += 1
        if (fCnt > 0) {
          improvements2 += fCnt
          arr2 = cut(arr2.unionByName(improved)
            .groupBy("seed", "id").agg(min(col("d")).as("d")))
          frontier2 = improved
        }
      }
      lo = hi
    }
    val secs2 = (System.nanoTime() - t1) / 1e9
    val settled2 = arr2.count()
    val parity = arrival.join(arr2, Seq("seed", "id", "d")).count()
    println(f"PROBE bucketed(years=7): rounds=$rounds2 " +
      f"improvements=$improvements2 churn=${improvements2.toDouble / settled2}%.3f " +
      f"settled=$settled2 wall=$secs2%.1f s parity=${parity == settled &&
        settled == settled2}")
    e.unpersist(blocking = false)
    spark.stop()
  }
}
