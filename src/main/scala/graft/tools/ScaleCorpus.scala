package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: deterministic 10× synthetic scale-up of the sf0.1
  * documents/embeddings tables, giving the text/ANN pack a SECOND
  * real scale decade for the empirical slope table (ROUND9.md §5 —
  * the driver's own text tables only span one 10× step).
  *
  * Construction (seedless — all choices are xxhash64 of stable
  * inputs, so re-runs are byte-identical):
  * - documents: `copies` perturbed replicas; copy 0 is the original.
  *   Each word of copy c ≥ 1 is kept or replaced by a copy-salted
  *   variant (`<word>v<c>`) by a fair coin on xxhash64(word, pos,
  *   copy) — ~50% replacement, so a copy's bigram Jaccard vs its
  *   original is ~0.25 (below the dedup queries' t=0.3: replicas do
  *   NOT flood the pair output; pair counts are reported per run so
  *   any residual semantic shift is visible, not silent). Shingle
  *   dfs split across the salted variants, so vocabulary grows and
  *   df mass scales sublinearly — the shape a real 10× crawl has.
  * - embeddings: `copies` jittered replicas; each component of copy
  *   c ≥ 1 moves by a deterministic ±0.19 hash offset. On these
  *   64-dim unit vectors that puts cos(copy, original) ≈ 0.75 and
  *   cos(copy, copy) ≈ 0.56 — below the near-dup/recall thresholds,
  *   so replicas do NOT form quadratic near-dup cliques (a ±0.02
  *   first cut left copies at cos ≈ 0.999 and inflated TRUE pair
  *   counts ×45 per original — measured as a phantom 1.03 slope),
  *   while staying on the data manifold rather than uniform noise.
  * - every other sf0.1 table is copied through unchanged so any
  *   query in the side run that touches TPC-H inputs still binds.
  */
object ScaleCorpus {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_sf1x10")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val maxDoc = docs.agg(max("doc_id")).head().getLong(0) + 1
    val cs = spark.range(copies).select(col("id").as("__c"))
    val words = split(col("text"), "\\s+")
    val perturbed = transform(words, (w, i) =>
      when(pmod(xxhash64(w, i, col("__c")), lit(2)) === 0, w)
        .otherwise(concat(w, lit("v"), col("__c"))))
    val bigDocs = docs.crossJoin(cs).select(
      (col("doc_id") + col("__c") * maxDoc).as("doc_id"),
      when(col("__c") === 0, col("text"))
        .otherwise(concat_ws(" ", perturbed)).as("text"),
      col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")))
    bigDocs.repartition(32).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val maxVec = emb.agg(max("vec_id")).head().getLong(0) + 1
    // the element expression re-casts to float: Spark promotes the
    // fractional division to double, which would silently widen the
    // written column to array<double> and break the float-typed
    // vec_dot/encoder paths
    val jitter = transform(col("embedding"), (x, i) =>
      (x + (pmod(xxhash64(col("vec_id"), col("__c"), i), lit(1000))
        .cast("double") - lit(500.0)) / lit(2600.0)).cast("float"))
    val bigEmb = emb.crossJoin(cs).select(
      (col("vec_id") + col("__c") * maxVec).as("vec_id"),
      when(col("__c") === 0, col("embedding")).otherwise(jitter)
        .as("embedding"),
      col("label"))
    bigEmb.repartition(32).write.mode("overwrite")
      .parquet(s"$out/embeddings.parquet")

    // pass-through for the remaining tables
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events")) {
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    println(s"SCALE docs=${bigDocs.count()} emb=${bigEmb.count()} -> $out")
    spark.stop()
  }
}
