package graft.tools

import org.apache.spark.sql.functions._
import graft.functions.Similarity

/** Dev probe: SemDeDup's nlist ∝ corpus scale contract, measured.
  *
  * The design bounds the quadratic term by Σ over cells of |cell|²;
  * the scaladoc contract says "at 100 TB pick nlist so cells stay
  * partition-sized". This probe turns that sentence into numbers: it
  * runs the DEDUP PASS ALONE (no exact-n² validation harness — that
  * harness dominated the r9 10× reading and masked the within-cell
  * term) at (sf0.1, nlist=8), (10×, nlist=8 — contract VIOLATED) and
  * (10×, nlist=64 — contract HELD), reporting wall time, cell count,
  * max cell, and the within-cell candidate pair volume Σ n·(n−1)/2.
  * Expected shape: candidate volume grows ~×100 when nlist is frozen
  * across a ×10 corpus and ~×10 when nlist scales with it.
  *
  * Usage: runMain graft.tools.SemDedupScaleProbe [sfDir] [bigDir]
  * (bigDir from graft.tools.ScaleCorpus).
  */
object SemDedupScaleProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val big = args.lift(1).getOrElse("/tmp/graft_sf1x10")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def run(tag: String, dir: String, nlist: Int): Unit = {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      // cell statistics from the same deterministic training pass
      val centDF = Similarity.ivfCentroids(emb, nlist, iters = 5)
        .toSeq.toDF("cid", "cvec")
      val cellRow = emb.join(Similarity.ivfAssign(emb, centDF), "vec_id")
        .groupBy("cid").agg(count(lit(1)).as("m"))
        .agg(count(lit(1)).as("cells"), max(col("m")).as("maxCell"),
          sum(col("m") * (col("m") - 1) / 2).as("pairVolume"))
        .head()
      val t0 = System.nanoTime()
      val out = Similarity.semanticDedup(emb, 0.4, nlist = nlist)
      val merged = out.filter(col("vec_id") =!= col("canonical_id")).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $tag%-14s n=$n%7d nlist=$nlist%3d " +
        f"cells=${cellRow.getLong(0)}%3d maxCell=${cellRow.getLong(1)}%7d " +
        f"pairVolume=${cellRow.getDouble(2).toLong}%12d " +
        f"merged=$merged%6d dedup_t=$secs%7.1f")
    }

    run("sf0.1/nl8", sf, 8)
    run("10x/nl8", big, 8)
    run("10x/nl64", big, 64)
    spark.stop()
  }
}
