package graft.tools

/** Print the formatted physical plan of SparkEntry queries (dev-only):
  * `sbt "runMain graft.tools.ExplainQuery <sfDir> <name> [<name>…]"`.
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = graft.GraftSession.local(8)
    names.foreach { n =>
      println(s"\n===== $n =====")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
      graft.TransientCache.releaseAll()
    }
    spark.stop()
  }
}
