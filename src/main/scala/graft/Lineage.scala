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

  /** Point the session at a reliable checkpoint dir (no-op when None).
    *
    * Checkpoint files are only reclaimed when the session was built
    * with `spark.cleaner.referenceTracking.cleanCheckpoints=true`
    * (GraftSession sets it; Spark's default is false and the
    * ContextCleaner reads it once at startup) — an iterative loop
    * writes one frame per round, so without cleanup a deep job leaks
    * O(rounds × frame size) of durable storage. Warn rather than
    * fail: the files are orphaned, not wrong.
    */
  def configure(df: DataFrame, checkpointDir: Option[String]): Boolean = {
    checkpointDir.foreach { d =>
      val sc = df.sparkSession.sparkContext
      if (!sc.getConf.getBoolean(
          "spark.cleaner.referenceTracking.cleanCheckpoints", false))
        System.err.println("[graft] reliable checkpointing without " +
          "spark.cleaner.referenceTracking.cleanCheckpoints=true (set at " +
          "session build): per-round checkpoint files will not be reclaimed")
      // the checkpoint dir is SESSION-GLOBAL SparkContext state: two
      // operators running concurrently in one session with different
      // dirs race, and the last caller silently redirects the
      // other's checkpoints — surface the overwrite instead.
      // getCheckpointDir returns the qualified <dir>/<uuid> path
      // setCheckpointDir created, so compare its PARENT against the
      // requested dir. Compare FULLY-QUALIFIED paths (FileSystem
      // .makeQualified fills in scheme + authority + working dir), not
      // just the path component: hdfs://nn/ckpt vs file:/ckpt must
      // warn, and the same /ckpt on two different namenodes must too.
      // Qualification needs a FileSystem lookup that can throw on an
      // unknown scheme; this is warning-only code, so fall back to the
      // raw-path comparison rather than fail the operator.
      def qualified(p: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.Path =
        scala.util.Try(p.getFileSystem(sc.hadoopConfiguration).makeQualified(p))
          .getOrElse(p)
      sc.getCheckpointDir
        .filterNot { existing =>
          val parent = new org.apache.hadoop.fs.Path(existing).getParent
          parent != null &&
            qualified(parent) == qualified(new org.apache.hadoop.fs.Path(d))
        }
        .foreach(existing => System.err.println(
          s"[graft] overwriting session checkpoint dir $existing with $d — " +
            "checkpointDir is session-global; concurrent operators with " +
            "different dirs will checkpoint into the LAST one set"))
      sc.setCheckpointDir(d)
    }
    checkpointDir.isDefined
  }

  implicit class CutOps(private val df: DataFrame) extends AnyVal {
    /** Truncate lineage: reliable `checkpoint()` when `reliable`,
      * `localCheckpoint()` otherwise. Both are eager.
      */
    def cut(reliable: Boolean): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()
  }

  /** Explicitly release the storage behind a cut frame (the
    * checkpointed RDD a `cut` left persisted). Dropping the reference
    * and waiting for the ContextCleaner works too, but only at a GC —
    * an iterative operator holding many per-round frames (betweenness
    * level frames: hops × Σ-reach rows) can OOM on the backlog first,
    * the same hazard the span fixpoint's memory rotation closes.
    * UNSAFE unless every plan that reads `df` has been materialized
    * (cut/persisted downstream): a cut frame has no lineage to
    * recompute from, so unpersisting under a live lazy reader loses
    * the data, not just the cache.
    */
  def freeCut(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
