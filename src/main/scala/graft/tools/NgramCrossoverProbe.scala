package graft.tools

import org.apache.spark.sql.functions._
import graft.functions.Dedup

/** Dev probe: candidate-volume estimates vs measured wall time for
  * the two exact-Jaccard formulations across thresholds — calibrates
  * [[Dedup.NgramPrefixOverhead]] (the per-candidate cost ratio of the
  * prefix path's dedup+set-move+verify vs the plain join's in-stage
  * partial aggregate) on the current corpus.
  */
object NgramCrossoverProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val d = graft.sources.Tables.documents(spark, dir)
    println("PROBE docs=" + d.count())
    // df histogram of kept bigram shingles (the bench queries'
    // shingleSize = 2, maxDf = 5000)
    val hist = graft.functions.TextFunctions.shingleRows(d, "doc_id", "text", 2)
      .dropDuplicates("id", "s")
      .groupBy("s").agg(count(lit(1)).as("sdf"))
      .filter(col("sdf") <= 5000)
      .groupBy("sdf").agg(count(lit(1)).as("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val fullVol = hist.iterator.map { case (df, k) => k.toDouble * df * df }.sum
    val totOcc = hist.iterator.map { case (df, k) => k.toDouble * df }.sum
    println(f"PROBE distinct_dfs=${hist.length} totOcc=$totOcc%.0f fullVol=$fullVol%.3e")
    for (t <- Seq(0.3, 0.45, 0.6, 0.8)) {
      val mass = (1.0 - t) * totOcc
      var acc = 0.0; var pVol = 0.0
      hist.foreach { case (df, k) =>
        if (acc < mass) { acc += k.toDouble * df; pVol += k.toDouble * df * df }
      }
      def time(f: => Long): (Long, Double) = {
        val t0 = System.nanoTime(); val n = f
        (n, (System.nanoTime() - t0) / 1e9)
      }
      val (np, tp) = time(Dedup.ngramJaccardPairs(
        d, "text", "doc_id", 2, t, 5000).count())
      val (nx, tx) = time(Dedup.ngramJaccardPairsPrefix(
        d, "text", "doc_id", 2, t, 5000).count())
      println(f"PROBE t=$t pVol=$pVol%.3e ratio=${pVol / fullVol}%.4f " +
        f"plain=$tp%.1fs prefix=$tx%.1fs rows=$np/$nx")
      graft.TransientCache.releaseAll()
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
