package graft

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative DataFrame loops (CC rounds, BFS
  * frontiers, SCC peeling, k-core shaving). Local mode and
  * short-lived jobs use `localCheckpoint()` — fastest, but blocks
  * live in executor storage and die with an executor. A long-lived
  * cluster job passes `checkpointDir` to the owning operator, which
  * swaps in the RELIABLE `checkpoint()` (HDFS/object-store backed,
  * survives executor loss) — same plan-flattening effect, durable
  * blocks. The operator calls `setCheckpointDir` once at entry; each
  * loop site then truncates via `.cut(reliable)`.
  */
object Lineage {

  /** Point the session at a reliable checkpoint dir (no-op when None). */
  def configure(df: DataFrame, checkpointDir: Option[String]): Boolean = {
    checkpointDir.foreach(df.sparkSession.sparkContext.setCheckpointDir)
    checkpointDir.isDefined
  }

  implicit class CutOps(private val df: DataFrame) extends AnyVal {
    /** Truncate lineage: reliable `checkpoint()` when `reliable`,
      * `localCheckpoint()` otherwise. Both are eager.
      */
    def cut(reliable: Boolean): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()
  }
}
