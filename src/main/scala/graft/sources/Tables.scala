package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Mirrors the reference's scan surface (SURVEY §2.1 S1/S2): a table
  * scan is just a parquet read — Catalyst handles column pruning and
  * predicate pushdown, so every downstream operator should express
  * filters/projections as Column expressions, never closures, to keep
  * them pushable into the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  /** Normalize an events frame's `ts` column to TimestampType,
    * whatever physical type the driver generated this round:
    * TIMESTAMP(NANOS) reads as LONG nanos (via
    * spark.sql.legacy.parquet.nanosAsLong, set in every session
    * builder here), TIMESTAMP(MICROS) without a timezone reads as
    * TIMESTAMP_NTZ. Both are µs-granular, so the conversion is
    * lossless; sessions run with session.timeZone=UTC so the
    * NTZ→TZ cast is a pure reinterpretation. Works on batch AND
    * streaming frames (schema dispatch only — no jobs), so the
    * streaming specs share this exact logic instead of re-deriving
    * the physical type.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        // integer `div`, NOT `/`: epoch nanos exceed 2^53, so the
        // double division `/` silently loses microseconds
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => df
      case _ => df.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeEventTs(load(spark, dir, "events"))
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
