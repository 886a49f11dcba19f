package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-column maintenance operators: the quantization and
  * per-class statistics passes that run over an `Array[Float]` column
  * before an ANN index is built or a class-balanced corpus is cut.
  *
  * Everything is expressed relationally — posexplode → HashAggregate
  * — rather than with higher-order array lambdas: HOF lambdas run
  * interpreted (measured 3-12× slower in this repo's dedup pack), and
  * the exploded form keeps the hot path inside whole-stage codegen
  * with map-side combine.
  */
object EmbeddingOps {

  private def exploded(embeddings: DataFrame, idCol: String, vecCol: String) =
    embeddings.select(col(idCol).as("vid"),
        posexplode(col(vecCol)).as(Seq("pos", "xf")))
      .select(col("vid"), col("pos"), col("xf").cast("double").as("x"))

  /** Symmetric int8 quantization audit: per vector, the scale
    * (max|x|/127) and the worst-coordinate reconstruction error
    * |x − round(x/scale)·scale|. Two HashAggregates over one explode
    * (scale first, then the error needs it back per coordinate — the
    * rejoin is on the vector id, so it co-partitions with the first
    * aggregate's shuffle). The rounding uses floor(v+0.5), which both
    * Spark and ANSI SQL floor-div semantics reproduce bit-exactly.
    */
  def quantizeInt8Stats(embeddings: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val ex = exploded(embeddings, idCol, vecCol)
    val scale = ex.groupBy("vid").agg(max(abs(col("x"))).as("amax"))
    ex.join(scale, Seq("vid"))
      .select(col("vid"),
        col("amax"),
        // all-zero vector: amax = 0 would make the error 0/0 (NaN in
        // Spark, engine-dependent elsewhere); its true error is
        // exactly 0, so guard rather than divide
        when(col("amax") === 0.0, lit(0.0)).otherwise(
          abs(col("x") -
            floor(col("x") * 127.0 / col("amax") + 0.5) * col("amax") / 127.0))
          .as("e"))
      .groupBy("vid")
      .agg(round(max("amax") / 127.0, 6).as("scale"),
        round(max("e"), 6).as("max_err"))
      .select(col("vid").as(idCol), col("scale"), col("max_err"))
  }

  /** Per-label centroid coordinates: (label, pos, centroid, n_vecs) —
    * one explode, one HashAggregate keyed (label, pos). The output is
    * the coordinate-exploded form on purpose: it feeds a coordinate-
    * wise join (distance-to-centroid, IVF assignment) without
    * re-exploding, and it's directly value-checkable.
    */
  def labelCentroids(embeddings: DataFrame, labelCol: String,
      vecCol: String): DataFrame =
    embeddings.select(col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("pos", "xf")))
      .select(col("label"), col("pos"), col("xf").cast("double").as("x"))
      .groupBy("label", "pos")
      .agg(round(avg("x"), 6).as("centroid"), count(lit(1)).as("n_vecs"))

  /** Distance-to-own-centroid outliers: the top-k vectors per label
    * farthest (L2) from their label centroid — the mislabeled-example
    * / out-of-distribution sweep. Centroids come from
    * `labelCentroids` (UNROUNDED internally); the join is on
    * (label, pos), then one aggregate per vector and a per-label
    * rank window.
    */
  def centroidOutliers(embeddings: DataFrame, idCol: String,
      labelCol: String, vecCol: String, k: Int): DataFrame = {
    val ex = embeddings.select(col(idCol).as("vid"),
        col(labelCol).as("label"), posexplode(col(vecCol)).as(Seq("pos", "xf")))
      .select(col("vid"), col("label"), col("pos"),
        col("xf").cast("double").as("x"))
    val cent = ex.groupBy("label", "pos").agg(avg("x").as("c"))
    val dist = ex.join(cent, Seq("label", "pos"))
      .groupBy("vid", "label")
      .agg(round(sqrt(sum((col("x") - col("c")) * (col("x") - col("c")))), 4)
        .as("dist"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("label")
      .orderBy(col("dist").desc, col("vid").asc)
    dist.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("label"), col("rank"), col("vid").as(idCol), col("dist"))
  }
}
