package graft.streaming

import org.apache.spark.sql.SparkSession

/** Shared batchId high-water mark for streaming index maintainers
  * (StreamIvf, StreamDedup's minhash form): foreachBatch is
  * at-least-once, and a raw re-append would double the re-delivered
  * rows, so each maintainer records the last applied batchId in
  * `<path>/stream_meta` and skips any batch at or below it. The
  * monotonic-batchId contract holds WITHIN one checkpointed query
  * lineage (restarts resume, they don't reset), so the guard assumes
  * a single owning stream per index; the crash window between the
  * data append and the meta write is the standard
  * non-transactional-sink caveat — exactly-once deployments put the
  * index on a transactional table format instead.
  */
private[streaming] object StreamMeta {

  /** Last applied batchId; -1 for an index no stream has written. */
  def lastApplied(spark: SparkSession, path: String): Long =
    try spark.read.parquet(s"$path/stream_meta").head().getLong(0)
    catch { case scala.util.control.NonFatal(_) => -1L }

  def writeLastApplied(spark: SparkSession, path: String,
      batchId: Long): Unit = {
    import spark.implicits._
    Seq(batchId).toDF("last_batch_id")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stream_meta")
  }
}
