package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over embedding columns
  * (`ARRAY<FLOAT>`).
  *
  * Scale path: brute-force cosine is the correctness baseline (one
  * broadcast of the query batch, no all-pairs shuffle when the query
  * side is small). The LSH variant buckets by random-hyperplane
  * signatures so candidate generation is an equi-join; recall is
  * tunable via tables × bits. Dot products use `zip_with` +
  * `aggregate` — codegen'd, no UDF.
  */
object Similarity {

  /** Sequential left-fold in DOUBLE (inputs are float32 — promoting
    * before the multiply keeps the value cross-engine reproducible;
    * a float-accumulated sum would drift at the 1e-7 level).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0d), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for each query id: broadcast queries ⋈
    * corpus, rank by cosine within query, keep k. Corpus never
    * shuffles — only the (nQueries × corpus) scored pairs do, and
    * row_number pushes partial top-k into each partition.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = corpus.sparkSession
    val c = corpus.select(col("vec_id").as("corpus_id"), col("embedding").as("cvec"),
      VecExpressions.vecNorm(spark, col("embedding")).as("cn"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
      VecExpressions.vecNorm(spark, col("embedding")).as("qn"))
    // Rank on the ROUNDED cosine with corpus_id tie-break: ranking on
    // raw doubles makes the k-th place depend on last-ulp summation
    // differences across engines/partitionings. Norms precomputed per
    // side, not per pair; dot product is the codegen'd FloatVecDot
    // expression (identical math to the interpreted HOF form).
    val scored = c.crossJoin(broadcast(q))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("cosine",
        round(VecExpressions.vecDot(spark, col("cvec"), col("qvec"))
          / (col("cn") * col("qn")), 4))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane component for (table,
    * bit, dim): hash → uniform in [-1, 1).
    */
  private def planeComponent(table: Int, bit: Int, dim: Column): Column =
    (xxhash64(lit(table), lit(bit), dim).cast("double")
      / lit(Long.MaxValue.toDouble))

  /** Random-hyperplane LSH signature per table: one bit per plane =
    * sign of <v, plane>.
    */
  def lshSignature(vec: Column, table: Int, bits: Int): Column = {
    val bitCols = (0 until bits).map { bit =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x * planeComponent(table, bit, i)),
        lit(0.0d), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << bit)).otherwise(lit(0L))
    }
    bitCols.reduce((a, b) => a.bitwiseOR(b))
  }

  /** ANN via multi-table hyperplane LSH: candidates share a bucket in
    * any table; exact cosine re-rank keeps top-k. At 100 TB the
    * bucket join replaces the cross join — candidate volume is
    * corpus/2^bits per table per query.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      tables: Int = 4, bits: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def bucketize(df: DataFrame, idName: String, vecName: String): DataFrame =
      df.select(col("vec_id").as(idName), col("embedding").as(vecName),
        explode(array((0 until tables).map { t =>
          struct(lit(t).as("table"),
            lshSignature(col("embedding"), t, bits).as("bucket"))
        }: _*)).as("tb"))
        .select(col(idName), col(vecName), col("tb.table"), col("tb.bucket"))

    val c = bucketize(corpus, "corpus_id", "cvec")
    val q = bucketize(queries, "query_id", "qvec")
      .withColumnRenamed("table", "table2").withColumnRenamed("bucket", "bucket2")
    val cand = c.join(q,
      col("table") === col("table2") && col("bucket") === col("bucket2") &&
        col("corpus_id") =!= col("query_id"))
      .select("query_id", "corpus_id", "cvec", "qvec")
      .dropDuplicates("query_id", "corpus_id")
    val spark = corpus.sparkSession
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("corpus_id"))
    cand.withColumn("cosine",
        round(VecExpressions.vecDot(spark, col("cvec"), col("qvec"))
          / (VecExpressions.vecNorm(spark, col("cvec"))
            * VecExpressions.vecNorm(spark, col("qvec"))), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine"), col("rank"))
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold via LSH
    * candidates (or exact for small corpora).
    */
  /** Exact path: broadcast nested loop in primitive arithmetic. The
    * exact all-pairs baseline presumes a broadcastable corpus (same
    * assumption as any broadcast join; billions of vectors take the
    * LSH path) — per-pair Catalyst evaluation of the higher-order dot
    * product runs interpreted and measured ~10× slower than the tight
    * loop. Math matches the column/oracle formulation exactly:
    * float→double per element, sequential left-to-right sums,
    * HALF_UP rounding to 6.
    */
  def embeddingDedupPairs(corpus: DataFrame, threshold: Double,
      exact: Boolean = true): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    if (exact) {
      val vecs = corpus.select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])]
      val bc = spark.sparkContext.broadcast(vecs.collect().sortBy(_._1))
      def sqNorm(v: Array[Float]): Double = {
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
        s
      }
      vecs.mapPartitions { it =>
        val all = bc.value
        val ids = all.map(_._1)
        val norms = all.map(p => math.sqrt(sqNorm(p._2)))
        it.flatMap { case (ida, va) =>
          val na = math.sqrt(sqNorm(va))
          val startIdx = {
            // all is sorted by id; pairs require idb > ida
            val i = java.util.Arrays.binarySearch(ids, ida)
            (if (i < 0) -i - 1 else i + 1)
          }
          (startIdx until all.length).iterator.flatMap { j =>
            val (idb, vb) = all(j)
            var s = 0.0; var k = 0
            while (k < va.length) { s += va(k).toDouble * vb(k).toDouble; k += 1 }
            val cos = math.floor(s / (na * norms(j)) * 1e6 + 0.5) / 1e6
            if (cos >= threshold) Some((ida, idb, cos)) else None
          }
        }
      }.toDF("ida", "idb", "cosine")
    } else {
      val normed = corpus.select(col("vec_id"), col("embedding"),
        norm(col("embedding")).as("nrm"))
      val a = normed.select(col("vec_id").as("ida"), col("embedding").as("va"),
        col("nrm").as("na"))
      val b = normed.select(col("vec_id").as("idb"), col("embedding").as("vb"),
        col("nrm").as("nb"))
      val ca = a.withColumn("sig", lshSignature(col("va"), 0, 12))
      val cb = b.withColumn("sig2", lshSignature(col("vb"), 0, 12))
      ca.join(cb, col("sig") === col("sig2") && col("ida") < col("idb"))
        .withColumn("cosine",
          round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
        .filter(col("cosine") >= threshold)
        .select("ida", "idb", "cosine")
    }
  }
}
