package graft.tools

import org.apache.spark.sql.functions._

/** Stage-level profiler for the dedup resolve pipeline (the two
  * heaviest bench queries, `dedup_cluster_resolve` and
  * `dedup_best_survivor`, share its front half). Runs each stage in
  * isolation, twice (min-of-2, same methodology as Bench), so a
  * drift in the full query can be attributed to sketch+verify,
  * CC resolve, or the survivor pick rather than guessed at.
  *
  * Usage: sbt "runMain graft.tools.ProfileResolve [sfDir]"
  */
object ProfileResolve {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // the shared factory, so the profiler's environment can't drift
    // from the engine defaults it exists to attribute time within
    val spark = graft.GraftSession.local(cpus)

    def timed(name: String)(body: => Long): Unit = {
      val runs = (0 until 2).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        val dt = (System.nanoTime() - t0) / 1e9
        graft.TransientCache.releaseAll()
        System.gc()
        (dt, n)
      }
      println(f"[profile] $name%-28s min=${runs.map(_._1).min}%7.3f s  " +
        f"passes=${runs.map(r => f"${r._1}%.3f").mkString("/")}  rows=${runs.head._2}")
    }

    val docs = graft.sources.Tables.documents(spark, sfDir)
    docs.count() // warm footers

    // stage A: quality scoring alone (one scan + codegen expressions)
    timed("quality_scan") {
      docs.select(col("doc_id"),
        graft.functions.TextFunctions.qualityScore(col("text")).as("quality"))
        .agg(count(lit(1))).collect().head.getLong(0)
    }

    // stage B: sketch + banding + exact verify (the shared pair front)
    timed("pairs_sketch_verify") {
      graft.functions.Dedup.minHashDedupPairsExact(docs, "text", "doc_id",
        shingleSize = 2, threshold = 0.8, numHashes = 32, bands = 16).count()
    }

    // stage C: pairs + CC resolve (== dedup_cluster_resolve)
    timed("resolve_min_id") {
      val pairs = graft.functions.Dedup.minHashDedupPairsExact(docs, "text",
        "doc_id", shingleSize = 2, threshold = 0.8, numHashes = 32, bands = 16)
      graft.functions.Dedup.resolveDupClusters(docs, "doc_id", pairs).count()
    }

    // stage D: the full best-survivor query (== dedup_best_survivor)
    timed("resolve_best_survivor") {
      val scored = docs.select(col("doc_id"),
        graft.functions.TextFunctions.qualityScore(col("text")).as("quality"))
      val pairs = graft.functions.Dedup.minHashDedupPairsExact(docs, "text",
        "doc_id", shingleSize = 2, threshold = 0.8, numHashes = 32, bands = 16)
      graft.functions.Dedup.resolveDupClustersByScore(
        scored, "doc_id", "quality", pairs).count()
    }

    spark.stop()
  }
}
