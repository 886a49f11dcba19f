package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.functions.Similarity

/** Streaming IVF index maintenance — the ingest-side twin of
  * `appendToIvfIndex`, the same one-operator-for-ingest-and-backfill
  * pattern as `StreamDedup.spanDedupEachBatch`: each micro-batch
  * assigns its vectors under the FROZEN centroid model and appends
  * them into their `cid=<n>/` partitions (batch-sized work, only the
  * touched cell directories gain files), then runs the refresh
  * policy and surfaces the verdict on a SIDE CHANNEL. Retraining is
  * a corpus-sized decision the stream must never take unilaterally
  * mid-flight — the owner of the index reacts to the signal
  * (typically `retrainIvfIndex` into a new versioned path and a
  * reader swap), exactly the reference's threshold-triggered view
  * refresh posture (graph/views/src/view_types.rs:80-96) applied to
  * index maintenance.
  */
object StreamIvf {

  /** Append each micro-batch into the persisted IVF index at `path`
    * and report per-batch staleness to `onStaleness`.
    *
    * Order: the staleness check runs AFTER the append, so `grown` /
    * `imbalanced` (parquet footers, no job) describe the index as it
    * now stands — "having absorbed this batch, does the model still
    * fit?" — while `drifted` probes THIS batch's assignment quality
    * against the train-time fit (batch × nlist dots, batch-sized
    * either way).
    *
    * Re-delivery: foreachBatch is at-least-once, and a raw re-append
    * would double the re-delivered vectors, so the operator records
    * the last applied batchId in `<path>/stream_meta` and skips any
    * batch at or below it — a re-delivered committed batch is a
    * no-op (the StreamViewsSpec restart discipline). The residual
    * window (crash BETWEEN the data append and the meta write
    * re-appends that one batch) is the usual non-transactional-sink
    * caveat; an exactly-once deployment puts the index on a
    * transactional table format instead.
    */
  def ivfAppendEachBatch(stream: DataFrame, path: String)(
      onStaleness: (Similarity.IvfStaleness, Long) => Unit)
      : DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      applyBatch(batch, path, batchId)(onStaleness)
      ()
    }

  /** The per-batch body, directly callable (re-delivery tests, batch
    * backfill through the identical code path). Returns whether the
    * batch was applied — false when `batchId` is at or below the
    * recorded high-water mark. The monotonic-batchId contract holds
    * WITHIN one checkpointed query lineage (restarts resume, they
    * don't reset), so the guard assumes a single owning stream per
    * index — two concurrent writers would need the transactional
    * format anyway.
    */
  def applyBatch(batch: DataFrame, path: String, batchId: Long)(
      onStaleness: (Similarity.IvfStaleness, Long) => Unit): Boolean = {
    val spark = batch.sparkSession
    val apply = batchId > lastAppliedBatch(spark, path)
    if (apply) {
      Similarity.appendToIvfIndex(batch, path)
      StreamMeta.writeLastApplied(spark, path, batchId)
      onStaleness(Similarity.ivfStaleness(spark, path, Some(batch)), batchId)
    }
    apply
  }

  /** Last batchId applied to the index's stream side channel; -1 for
    * an index no stream has written yet.
    */
  def lastAppliedBatch(spark: SparkSession, path: String): Long =
    StreamMeta.lastApplied(spark, path)
}
