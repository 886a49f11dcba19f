package graft.tools

import org.apache.spark.sql.functions._
import graft.algorithms.Algorithms
import graft.graph.GraphStore
import graft.sources.Tables

/** Dev probe: round/level behavior and wall split of g29_louvain. */
object LouvainProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    sys.props("graft.louvain.trace") = "1"
    val s = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    s.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $name t=${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }
    val e = GraphStore.fromTpch(s, dir).edges
      .filter(col("label") === "supplied_by")
      .select(col("src").as("o"), (col("dst") - GraphStore.SupplierOff).as("sk"))
    val b = e.select(col("o").as("o2"), col("sk").as("sk2"))
    val pairs = e.join(b, col("o") === col("o2") && col("sk") < col("sk2"))
      .groupBy(col("sk").as("s1"), col("sk2").as("s2"))
      .agg(count(lit(1)).as("w"))
    val thr = pairs.agg(ceil(max("w") * 0.7)).head().getLong(0)
    val edges = t("co-order edges")(graft.TransientCache.persist(
      pairs.filter(col("w") >= thr)
        .select(col("s1").as("src"), col("s2").as("dst"), col("w"))))
    println(s"PROBE edges=${edges.count()}")
    val vertices = Tables.supplier(s, dir)
      .select(col("s_suppkey").cast("long").as("id"))
    println(s"PROBE vertices=${vertices.count()}")
    val comm = t("louvain")(graft.TransientCache.persist(
      Algorithms.louvain(vertices, edges.select("src", "dst"))))
    println(s"PROBE communities=" +
      comm.select("community").distinct().count())
    val viol = t("violations")(
      Algorithms.modularityMoveViolations(edges.select("src", "dst"),
        comm.select(col("id"), col("community").as("comm"))).count())
    println(s"PROBE violations=$viol")
    s.stop()
  }
}
