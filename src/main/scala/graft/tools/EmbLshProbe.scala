package graft.tools

import graft.functions.Similarity

/** Dev probe: separates the embedding-dedup RECALL harness's two
  * components — the exact n²/2 reference (ground truth, intrinsic to
  * validation) vs the LSH-bucketed production branch — so scale
  * slopes attribute to the right plan.
  */
object EmbLshProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.sources.Tables.embeddings(spark, dir)
    println("PROBE vecs=" + emb.count())
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $name rows=$n t=${(System.nanoTime() - t0) / 1e9}%.1fs")
      graft.TransientCache.releaseAll()
    }
    time("lsh_branch")(Similarity.embeddingDedupPairs(emb, 0.4,
      exact = Some(false), tables = 16, bits = 8, probes = 1).count())
    time("exact_reference")(Similarity.embeddingDedupPairs(emb, 0.4,
      exact = Some(true)).count())
    spark.stop()
  }
}
