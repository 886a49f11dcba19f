package graft.tools

import org.apache.spark.sql.functions._
import graft.functions.{Dedup, TextFunctions}

/** Dev probe: candidate volume through the simhash hamming prefilter
  * on the current corpus (the n² verify cost driver).
  */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val d = graft.sources.Tables.documents(spark, dir)
    println("PROBE docs=" + d.count())
    val sigs = Dedup.simHashSignatures(d, "text", "doc_id")
    val a = sigs.select(col("id").as("ida"), col("sig").as("siga"))
    val b = sigs.select(col("id").as("idb"), col("sig").as("sigb"))
    for (maxD <- Seq(16)) {
      val n = a.join(broadcast(b), col("ida") < col("idb") &&
        Dedup.hamming(col("siga"), col("sigb")) <= maxD).count()
      println(s"PROBE hamming<=$maxD candidates=$n")
    }
    val sizes = TextFunctions.shingleRows(d, "doc_id", "text", 2)
      .groupBy("id").agg(count_distinct(col("s")).as("n"))
      .agg(avg("n"), max("n")).head()
    println(s"PROBE avg_set=${sizes.getDouble(0)} max_set=${sizes.getLong(1)}")
    val t0 = System.nanoTime()
    // the probe's PURPOSE is measuring the quadratic — lift the guard
    val out = Dedup.simHashDedupPairsExact(d, "text", "doc_id",
      maxBruteDocs = Long.MaxValue).count()
    println(f"PROBE true_pairs=$out full_t=${(System.nanoTime()-t0)/1e9}%.1f")
    spark.stop()
  }
}
