package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Writer paths for curated corpus output.
  *
  * At 100 TB the LAYOUT of the written data decides the cost of every
  * downstream read: partitioning by a low-cardinality routing column
  * (lang, source, date) turns per-slice reads into directory prunes
  * (zero I/O outside the slice), and capping rows per file keeps file
  * counts and task sizes predictable. This is the corpus-side
  * counterpart of `GraphStore.saveBucketed` (which co-locates by join
  * key for shuffle-free joins; partitioning here prunes SCANS, not
  * joins).
  */
object Sinks {

  /** Write `df` as parquet partitioned by `partitionCols`
    * (hive-style `col=value/` directories). `maxRecordsPerFile`
    * bounds file sizes — a repartition on the partition columns
    * first means one task writes each slice contiguously instead of
    * every task writing a sliver of every slice (the small-files
    * problem at scale).
    */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String],
      maxRecordsPerFile: Long = 5000000L,
      mode: String = "overwrite"): Unit = {
    import org.apache.spark.sql.functions.col
    // mode "append" adds files only under the partition directories
    // present in df — the incremental-maintenance path (IVF index
    // appends); every other directory's files are untouched
    df.repartition(partitionCols.map(col): _*)
      .write
      .mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Read a partitioned corpus back. Filters on the partition
    * columns prune directories before any file is opened — assert
    * with `PartitionFilters` in the scan node.
    */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
