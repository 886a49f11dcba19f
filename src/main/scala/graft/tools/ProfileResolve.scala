package graft.tools

import org.apache.spark.sql.functions._

/** Scratch profiler for the cluster-resolve pipeline (dev-only). */
object ProfileResolve {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.GraftSession.local(8)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.sources.Tables.documents(spark, dir)
    // warm the session
    docs.count()
    for (i <- 1 to 2) {
      println(s"[profile] === pass $i ===")
      val pairs = time("minhash pairs build+count") {
        val p = graft.TransientCache.persist(
          graft.functions.Dedup.minHashDedupPairsExact(
            docs, "text", "doc_id", shingleSize = 2, threshold = 0.8,
            numHashes = 32, bands = 16))
        p.count()
        p
      }
      time("resolveDupClusters") {
        graft.functions.Dedup.resolveDupClusters(docs, "doc_id", pairs)
          .orderBy("id").count()
      }
      graft.TransientCache.releaseAll()
    }
    spark.stop()
  }
}
