package graft.tools

import org.apache.spark.sql.functions._

import graft.graph.GraphStore
import graft.model.PropValue
import graft.views.Views

/** Dev probe (r12): print every Spark job fired by ONE composed-class
  * view refresh — callsite + description — to attribute the
  * jobs-per-refresh count to actions vs broadcast builds vs
  * checkpoints.
  */
object JobTraceProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val trace = new java.util.concurrent.ConcurrentLinkedQueue[String]
    @volatile var on = false
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          if (on) {
            val stages = j.stageInfos.map(_.name.takeWhile(_ != ' '))
              .mkString("+")
            val last = j.stageInfos.lastOption.map(_.name).getOrElse("")
            trace.add(s"stages=${j.stageInfos.size} root=[$last] [$stages]")
          }
      })
    val noProps = lit(null).cast(PropValue.mapType)
    val n = 50000L
    val m = n / 10
    val nV = spark.range(n).select(col("id"), lit("N").as("label"),
      map(lit("w"), PropValue.ofFloat(col("id").cast("double"))).as("props"))
    val mV = spark.range(m).select((col("id") + n).as("id"),
      lit("M").as("label"),
      map(lit("v"), PropValue.ofFloat(col("id").cast("double"))).as("props"))
    val ids = spark.range(n)
    val link = ids.filter(col("id") % 97 =!= 0 && col("id") < n - 1)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
      .unionByName(ids.filter(col("id") % 5 === 0 && col("id") < n - 2)
        .select(col("id").as("src"), (col("id") + 2).as("dst")))
      .withColumn("label", lit("link"))
    val owns = ids.filter(col("id") % 2 === 0)
      .select(col("id").as("src"), (col("id") % m + n).as("dst"))
      .withColumn("label", lit("owns"))
    val base = GraphStore(nV.unionByName(mV).localCheckpoint(),
      link.unionByName(owns).withColumn("props", noProps).localCheckpoint())
    val w = 64L
    val r = spark.range(w)
    val dels = r.select((col("id") * 2 + 1).as("src"),
        (col("id") * 2 + 2).as("dst"), lit("link").as("label"))
      .filter((col("src") % 97 =!= 0) && col("src") < n - 1)
    val adds = r.select((col("id") + n / 2).as("src"),
        (col("id") + n / 2 + 3).as("dst"), lit("link").as("label"))
      .filter(col("dst") < n).withColumn("props", noProps)
    val m1 = base.removeEdges(dels).addEdges(adds)
      .truncated().truncatedEdges()
    val cat = new Views.ViewCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft_jtp").toString)
    graft.gql.GqlViews.register(cat, "c",
      "MATCH (a:N)-[:link*1..2]->(b:N)-[:owns]->(c:M)")
    graft.gql.GqlViews.refresh(cat, "c", base, base).count() // boot
    Thread.sleep(500)
    on = true
    graft.gql.GqlViews.refresh(cat, "c", base, m1).count()
    Thread.sleep(500)
    on = false
    trace.forEach(s => println(s"TRACE $s"))
    println(s"TRACE total=${trace.size}")
    spark.stop()
  }
}
