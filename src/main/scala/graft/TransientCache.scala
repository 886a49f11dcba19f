package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Registry for persists whose useful lifetime is a single query.
  *
  * Operators persist mid-pipeline frames that are read several times
  * within one query (minhash shingle rows, simhash signatures, dedup
  * pair sets). Left alone, those blocks sit in the block manager
  * until LRU eviction — harmless on a 128 GiB test JVM, but on a
  * shared cluster they hold executor storage memory that later jobs
  * need. Registering the persist here lets the harness (Bench,
  * Verify, any batch runner) drop all of a query's transient blocks
  * the moment its action completes, exactly as a production job
  * would unpersist in a `finally`.
  *
  * Long-lived caches — the per-dir TPC-H graph projection, the
  * AlgoQueries edge set, view-store entries — deliberately do NOT
  * register; their lifetime is the session, not a query.
  */
object TransientCache {
  private val frames = new ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` at `level` and register it for the next release. */
  def persist(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    df.persist(level)
    frames.add(df)
    df
  }

  /** Unpersist every registered frame (non-blocking). Safe to call at
    * any point: frames still referenced by an unfinished plan are
    * simply recomputed if re-read, and never-materialized frames
    * no-op.
    */
  def releaseAll(): Unit = {
    var df = frames.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = frames.poll()
    }
  }
}
