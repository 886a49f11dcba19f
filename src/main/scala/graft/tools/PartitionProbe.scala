package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe (r12): does a localCheckpoint carry the physical plan's
  * outputPartitioning/outputOrdering into later join planning? The
  * closure-state LSM layout rests on it — a hash-partitioned+sorted
  * checkpointed core must join/semi/anti against window-sized probes
  * with NO exchange and NO sort on the core side.
  */
object PartitionProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    if (args.contains("noaqe"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    def aqeOff[A](f: => A): A = {
      val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try f finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    }
    val big = aqeOff(spark.range(1000000L)
      .select(col("id").as("src"), (col("id") * 7 % 999983L).as("dst"))
      .repartition(col("src"), col("dst"))
      .sortWithinPartitions("src", "dst")
      .localCheckpoint())
    val small = spark.range(100L)
      .select((col("id") * 31L).as("src"), (col("id") * 217L % 999983L).as("dst"))
    println("=== anti: small LEFT vs partitioned core RIGHT ===")
    small.join(big, Seq("src", "dst"), "left_anti").explain()
    println("=== anti: core LEFT vs broadcast small RIGHT (preserve?) ===")
    val kept = aqeOff {
      val k = big.join(broadcast(small), Seq("src", "dst"), "left_anti")
        .localCheckpoint(false)
      k.count()
      k
    }
    println("=== semi: small probe vs kept (alias-projected) ===")
    small.select(col("src").as("__x"), col("dst"))
      .join(kept.select(col("src").as("__x"), col("dst")),
        Seq("__x", "dst"), "left_semi").explain()
    spark.stop()
  }
}
