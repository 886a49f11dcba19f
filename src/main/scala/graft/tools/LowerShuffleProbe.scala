package graft.tools

import org.apache.spark.sql.functions._

import graft.graph.GraphStore
import graft.model.PropValue
import graft.views.Views

/** Dev probe (r12): per-stage shuffle-write attribution for ONE
  * lower-bounded-class refresh on the 10× dep fixture —
  * ViewScaleProbe measured 152 MB of refresh shuffle on a w=64
  * window there (state-sized, not window-sized); this prints every
  * stage that wrote > 256 KB with its callsite so the frame
  * responsible can be named instead of guessed.
  *
  * Usage: runMain graft.tools.LowerShuffleProbe [scale] [class]
  */
object LowerShuffleProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var on = false
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[String]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = if (on) {
          val m = s.stageInfo.taskMetrics
          val w = if (m == null) 0L else m.shuffleWriteMetrics.bytesWritten
          if (w > 256 * 1024) {
            val graftFrames = s.stageInfo.details.linesIterator
              .filter(l => l.contains("graft.") || l.contains("Views.scala"))
              .take(4).mkString(" <- ")
            rows.add(f"${w / 1e6}%9.1fMB  ${s.stageInfo.name}  [$graftFrames]")
          }
        }
      })
    val scale = args.headOption.getOrElse("10").toInt
    val cls = args.drop(1).headOption.getOrElse("lower_bounded")
    val noProps = lit(null).cast(PropValue.mapType)
    val n = 50000L * scale
    val m = n / 10
    val nV = spark.range(n).select(col("id"), lit("N").as("label"),
      map(lit("w"), PropValue.ofFloat(col("id").cast("double"))).as("props"))
    val mV = spark.range(m).select((col("id") + n).as("id"),
      lit("M").as("label"),
      map(lit("v"), PropValue.ofFloat(col("id").cast("double"))).as("props"))
    val ids = spark.range(n)
    val cSize = 32L
    val clusters = n / cSize
    val dep = ids.filter(col("id") % cSize =!= (cSize - 1))
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
      .unionByName(ids.filter(
          col("id") % cSize < (cSize - 7) && col("id") % 5 === 0)
        .select(col("id").as("src"), (col("id") + 7).as("dst")))
      .withColumn("label", lit("dep"))
    val owns = ids.filter(col("id") % 2 === 0)
      .select(col("id").as("src"), (col("id") % m + n).as("dst"))
      .withColumn("label", lit("owns"))
    val base = GraphStore(nV.unionByName(mV).localCheckpoint(),
      dep.unionByName(owns).withColumn("props", noProps).localCheckpoint())
    val w = 64L
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
    val m1 = base.removeEdges(depDels.unionByName(ownsDels))
      .addEdges(depAdds.unionByName(ownsAdds).withColumn("props", noProps))
      .truncated().truncatedEdges()
    val defn = cls match {
      case "lower_bounded" => "MATCH (a:N)-[:dep*2..]->(b:N)"
      case "composed_lower" =>
        "MATCH (a:N)-[:dep*2..]->(b:N)-[:owns]->(c:M)"
      case other => other // raw GQL
    }
    val cat = new Views.ViewCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft_lsp").toString)
    graft.gql.GqlViews.register(cat, "v", defn)
    graft.gql.GqlViews.refresh(cat, "v", base, base).count() // boot
    Thread.sleep(800)
    on = true
    val t0 = System.nanoTime()
    graft.gql.GqlViews.refresh(cat, "v", base, m1).count()
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(800)
    on = false
    rows.forEach(s => println(s"SHUF $s"))
    println(f"SHUF total refresh $sec%.1fs")
    // per-exchange attribution from the SQL status store: every
    // exchange node that wrote > 1 MB, with enough of its child plan
    // to name the frame being shuffled
    val store = spark.sharedState.statusStore
    val wallT0 = System.currentTimeMillis() - (sec * 1000).toLong - 900
    for (e <- store.executionsList()
         if e.submissionTime >= wallT0) {
      val mVals = store.executionMetrics(e.executionId)
      val g = store.planGraph(e.executionId)
      for (node <- g.allNodes if node.name.contains("Exchange")) {
        val written = node.metrics
          .filter(m => m.name.contains("bytes written") ||
            m.name.contains("data size"))
          .flatMap(m => mVals.get(m.accumulatorId).map(v =>
            s"${m.name}=${v.replace('\n', ' ')}"))
        val big = written.exists(v => v.contains("MiB") || v.contains("GiB"))
        if (big)
          println(s"EXCH exec=${e.executionId} ${written.mkString("|")} " +
            s":: ${node.desc.linesIterator.take(6).mkString(" / ").take(700)}")
      }
    }
    spark.stop()
  }
}
