package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage timing of the sketch_quantiles plan at a
  * given SF dir (arg 0). Not part of the driver surface.
  */
object QuantileProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("quantile-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - s) / 1e9}%.2f s"); r
    }
    val li = graft.sources.Tables.lineitem(spark, dir)
      .select(col("l_extendedprice"))
    t("warm scan count")(li.count())
    val v = graft.TransientCache.persist(
      li.select(col("l_extendedprice").cast("double").as("v"))
        .filter(col("v").isNotNull))
    t("persist+count")(v.count())
    t("rdd.getNumPartitions")(v.rdd.getNumPartitions)
    import spark.implicits._
    t("sort+subsample collect") {
      v.sortWithinPartitions("v").as[Double].mapPartitions { it =>
        var c = 0L; var kept = List.empty[(Double, Long)]
        while (it.hasNext) { it.next(); c += 1; if (c % 93 == 0) kept ::= (0.0, 93L) }
        kept.iterator
      }.collect().length
    }
    t("ranks agg") {
      v.agg(sum(when(col("v") <= 1000.0, 1L).otherwise(0L)),
        sum(when(col("v") <= 2000.0, 1L).otherwise(0L))).head()
    }
    t("exact percentile x5") {
      li.agg(expr("percentile(l_extendedprice, 0.1)"),
        expr("percentile(l_extendedprice, 0.25)"),
        expr("percentile(l_extendedprice, 0.5)"),
        expr("percentile(l_extendedprice, 0.75)"),
        expr("percentile(l_extendedprice, 0.9)")).head()
    }
    t("exact percentile array form") {
      li.agg(expr(
        "percentile(l_extendedprice, array(0.1D, 0.25D, 0.5D, 0.75D, 0.9D))"))
        .head()
    }
    t("exact percentile x1") {
      li.agg(expr("percentile(l_extendedprice, 0.5)")).head()
    }
    t("full driver query") {
      graft.SparkEntry.queries("sketch_quantiles")(spark, dir).collect().length
    }
    graft.TransientCache.releaseAll()
    spark.stop()
  }
}
