package graft.tools

import org.apache.spark.sql.functions._
import graft.graph.{GraphStore}
import graft.model.PropValue
import graft.views.Views

/** Dev probe: per-stage timing of the v6_pattern_view driver query. */
object PatternViewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    s.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $name t=${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }
    val base = t("fromTpch+count")(
      { val b = GraphStore.fromTpch(s, dir); b.edges.count(); b })
    val noProps = lit(null).cast(PropValue.mapType)
    val newCust = GraphStore.CustomerOff + 900000L
    val m1 = t("m1 chain") {
      base.removeVertices(
        base.vertices.filter(col("label") === "Nation" &&
          col("id") < GraphStore.NationOff + 5L).select("id"))
      .addVertices(s.range(1).select(lit(newCust).as("id"),
        lit("Customer").as("label"),
        map(lit("name"), PropValue.ofString(lit("Graft Test"))).as("props")))
      .addEdges(s.range(1).select(lit(newCust).as("src"),
        lit(GraphStore.NationOff + 7L).as("dst"),
        lit("located_in").as("label"), noProps.as("props")))
      .truncated().truncatedEdges()
    }
    val cat = new Views.ViewCatalog(s,
      java.nio.file.Files.createTempDirectory("graft_pvp").toString)
    // inline replica of patternViewDelta's stages, individually timed
    locally {
      val oldStore = base; val newStore = m1
      val srcLabel = "Customer"; val edgeLabel = "located_in"
      val dstLabel = "Nation"
      val feed = newStore.changes.filter(col("version") > oldStore.version)
      val touchedV = feed
        .filter(col("op").isin("add_vertex", "remove_vertex"))
        .select(col("id")).distinct()
      t("p_touchedV")(touchedV.count())
      def members(store: GraphStore, label: String) =
        store.vertices.filter(col("label") === label)
          .join(broadcast(touchedV), Seq("id"), "left_semi").select("id")
      def vDelta(label: String, keyName: String) = {
        val o = members(oldStore, label)
        val n = members(newStore, label)
        n.join(o, Seq("id"), "left_anti")
          .select(lit("add").as("op"), col("id").as(keyName))
          .unionByName(o.join(n, Seq("id"), "left_anti")
            .select(lit("remove").as("op"), col("id").as(keyName)))
      }
      t("p_vDeltaA")(vDelta(srcLabel, "src").count())
      t("p_vDeltaB")(vDelta(dstLabel, "dst").count())
      val explicitE = feed.filter(col("op").isin("add_edge", "remove_edge")
          && col("elabel") === edgeLabel)
        .select(col("src"), col("dst")).distinct()
      def incident(store: GraphStore) = {
        val e = store.edges.filter(col("label") === edgeLabel)
        e.join(broadcast(touchedV.select(col("id").as("src"))),
            Seq("src"), "left_semi")
          .unionByName(e.join(broadcast(touchedV.select(col("id").as("dst"))),
            Seq("dst"), "left_semi").select(col("src"), col("dst"),
              col("label"), col("props")))
          .select(col("src"), col("dst"))
      }
      val touchedE = explicitE.unionByName(incident(oldStore))
        .unionByName(incident(newStore)).distinct()
      t("p_touchedE")(touchedE.count())
      def eMembers(store: GraphStore) =
        store.edges.filter(col("label") === edgeLabel)
          .join(broadcast(touchedE), Seq("src", "dst"), "left_semi")
          .select("src", "dst")
      val eo = eMembers(oldStore)
      val en = eMembers(newStore)
      val dE = en.join(eo, Seq("src", "dst"), "left_anti")
        .select(lit("add").as("op"), col("src"), col("dst"))
        .unionByName(eo.join(en, Seq("src", "dst"), "left_anti")
          .select(lit("remove").as("op"), col("src"), col("dst")))
      t("p_dE")(dE.count())
      val aOld = oldStore.vertices.filter(col("label") === srcLabel)
        .select(col("id").as("src"))
      val bOld = oldStore.vertices.filter(col("label") === dstLabel)
        .select(col("id").as("dst"))
      val eOld = oldStore.edges.filter(col("label") === edgeLabel)
        .select("src", "dst")
      val d1 = Views.joinViewDelta(aOld, vDelta(srcLabel, "src"), eOld, dE,
        Seq("src"))
      t("p_d1")(d1.count())
      val d1op = d1.select(
        when(col("__sign") > 0, lit("add")).otherwise(lit("remove")).as("op"),
        col("src"), col("dst"))
      val lvl2 = Views.joinViewDelta(aOld.join(eOld, "src"), d1op,
        bOld, vDelta(dstLabel, "dst"), Seq("dst"))
      t("p_lvl2")(lvl2.count())
    }
    t("init_state")(Views.initPatternState(base,
      "Customer", "located_in", "Nation").count())
    t("delta_only")(Views.patternViewDelta(base, m1,
      "Customer", "located_in", "Nation").count())
    t("refresh1")(Views.refreshPatternView(cat, "cn", base, m1,
      "Customer", "located_in", "Nation").count())
    val m2 = t("m2 chain") {
      m1.addVertices(s.range(1).select(
          lit(GraphStore.NationOff + 2L).as("id"), lit("Nation").as("label"),
          map(lit("name"), PropValue.ofString(lit("REBORN"))).as("props")))
        .addEdges(s.range(1, 6).select(
          (col("id") + GraphStore.CustomerOff).as("src"),
          lit(GraphStore.NationOff + 2L).as("dst"),
          lit("located_in").as("label"), noProps.as("props")))
        .removeEdges(m1.edges.filter(
          col("src") === GraphStore.CustomerOff + 1L &&
            col("label") === "located_in")
          .select("src", "dst", "label"))
        .truncated().truncatedEdges()
    }
    t("refresh2")(Views.refreshPatternView(cat, "cn", m1, m2,
      "Customer", "located_in", "Nation").count())
    s.stop()
  }
}
