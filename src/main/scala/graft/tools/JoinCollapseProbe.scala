package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: does count() over the coalesce-projection left join
  * collapse the join (the dedup_span_strip hazard) for range_join?
  */
object JoinCollapseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $tag n=$n t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    val q = graft.SparkEntry.queries("range_join")
    // warm
    q(spark, dir).count(); graft.TransientCache.releaseAll()
    time("count_asis") { q(spark, dir).count() }
    graft.TransientCache.releaseAll()
    time("count_forced") {
      q(spark, dir).filter(col("n_near") >= 0).count()
    }
    graft.TransientCache.releaseAll()
    spark.stop()
  }
}
