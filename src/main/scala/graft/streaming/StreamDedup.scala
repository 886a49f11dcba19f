package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Streaming deduplication — the ingest-side twin of the batch dedup
  * pack: drop repeats AS DOCUMENTS ARRIVE, before they ever land in
  * the corpus.
  *
  * State discipline at scale: an unbounded `dropDuplicates` keeps
  * every key forever (state grows with the corpus); the watermarked
  * form keeps only keys younger than the lateness bound, so state is
  * O(ingest rate × watermark) — constant for a steady stream —
  * and re-deliveries inside the replay window (the at-least-once
  * source contract) still dedup exactly.
  */
object StreamDedup {

  /** Keep the first arrival per key-tuple within the watermark. */
  def withinWatermark(stream: DataFrame, tsCol: String,
      watermark: String, keys: Seq[String]): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Content-level streaming dedup: dedup on the normalized-text
    * fingerprint (the exact-dedup key of `Dedup.exactDedup`), so
    * re-posted identical documents collapse at ingest. The
    * fingerprint column stays in the output for downstream joins
    * against the batch dedup tables.
    */
  def byFingerprint(stream: DataFrame, tsCol: String,
      watermark: String, textCol: String): DataFrame =
    stream.withColumn("fp", TextFunctions.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq("fp"))

  /** Streaming incremental span dedup: per micro-batch, each arriving
    * document's maximal corpus-covered spans against the at-rest
    * distinct-gram index (`Dedup.buildSpanGramIndex`). The islands
    * window ranks within each arriving doc, so the operator can't run
    * directly on an unbounded stream — `foreachBatch` applies the
    * BATCH operator to each micro-batch verbatim (one definition,
    * zero semantic drift between ingest and backfill), exactly the
    * stream-static equi-join shape Spark plans for stream enrichment.
    * State is NONE beyond the source offsets: the index is static
    * input, the batch is the micro-batch — re-delivery of a batch
    * recomputes the same spans (idempotent sink contract, the
    * IdempotentMerge discipline).
    */
  def spanDedupEachBatch(stream: DataFrame, gramIndex: DataFrame,
      textCol: String, idCol: String, k: Int)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(graft.functions.Dedup.duplicatedSpansVsIndex(
        batch, gramIndex, textCol, idCol, k), batchId)
    }

  /** Streaming NEAR-dup detection with a GROWING index — the ingest
    * form of `minHashIndexPairs`, completing the index family's
    * stream side (span dedup streams against a static index; the IVF
    * index streams appends; this one does BOTH): each micro-batch's
    * docs are checked against the at-rest signature index
    * (`<path>/index`), the ≥ threshold pairs go to `sink`, and THEN
    * the batch's own signatures append — so batch N+1 dedups against
    * everything batch N ingested, exactly the arrive-once-dedup-
    * forever contract a corpus ingest pipeline needs. Work per batch
    * is batch-sized (new-vs-index banding; the index side is never
    * recomputed). The batchId high-water mark in `<path>/stream_meta`
    * makes re-delivered committed batches no-ops (StreamMeta
    * contract); `sink` runs BEFORE the append and must materialize
    * its frame inside the callback. An absent `<path>/index`
    * bootstraps as empty (first batch reports no pairs and seeds the
    * index). shingleSize/numHashes must match the index's build
    * parameters — the caller's contract, as with every saved index.
    */
  def minHashDedupEachBatch(stream: DataFrame, path: String,
      textCol: String, idCol: String, shingleSize: Int = 2,
      threshold: Double = 0.8, numHashes: Int = 32, bands: Int = 16)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      minHashApplyBatch(batch, path, batchId, textCol, idCol,
        shingleSize, threshold, numHashes, bands)(sink)
      ()
    }

  /** The per-batch body, directly callable (re-delivery tests, batch
    * backfill through the identical code path). Returns whether the
    * batch was applied.
    */
  def minHashApplyBatch(batch: DataFrame, path: String, batchId: Long,
      textCol: String, idCol: String, shingleSize: Int = 2,
      threshold: Double = 0.8, numHashes: Int = 32, bands: Int = 16)(
      sink: (DataFrame, Long) => Unit): Boolean = {
    val spark = batch.sparkSession
    val apply = batchId > StreamMeta.lastApplied(spark, path)
    if (apply) {
      import graft.functions.Dedup
      val index =
        try spark.read.parquet(s"$path/index")
        catch { case scala.util.control.NonFatal(_) =>
          Dedup.buildMinHashIndex(batch.limit(0), textCol, idCol,
            shingleSize, numHashes)
        }
      sink(Dedup.minHashIndexPairs(batch, index, textCol, idCol,
        shingleSize, threshold, numHashes, bands), batchId)
      Dedup.buildMinHashIndex(batch, textCol, idCol, shingleSize, numHashes)
        .write.mode("append").parquet(s"$path/index")
      StreamMeta.writeLastApplied(spark, path, batchId)
    }
    apply
  }
}
