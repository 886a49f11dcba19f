package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** S10: stream source connectors — the typed-config → stream mapping
  * of the reference's connector registry
  * (graph/views/src/stream_connectors.rs:22-100 StreamSourceConfig /
  * StreamSourceType). Where the reference hand-rolls consumer
  * threads, reconnect loops and extraction rules per source, Spark's
  * Structured Streaming sources already ARE that machinery — each
  * config maps onto `spark.readStream.format(...)` and every
  * downstream operator (windows, watermarks, stateful views) composes
  * unchanged.
  *
  * Availability note (documented, not hidden): file/rate/socket/
  * memory sources ship inside spark-sql and are exercised by
  * StreamViewsSpec (socket via a loopback server). Kafka maps to the
  * `kafka` format, which needs the spark-sql-kafka connector jar on
  * the cluster classpath — not present in this offline sandbox, so
  * the mapping is compiled but cannot be integration-tested here
  * (the reference's own kafka path, stream_connectors.rs:43-63, is
  * likewise dead code in its test suite).
  */
object StreamConnectors {

  sealed trait SourceConfig
  /** File-system watcher (StreamSourceType::FileSystem). */
  case class FileSource(path: String, schema: StructType,
      format: String = "parquet", maxFilesPerTrigger: Option[Int] = None)
    extends SourceConfig
  /** TCP socket lines (StreamSourceType::Socket). */
  case class SocketSource(host: String, port: Int) extends SourceConfig
  /** Synthetic fixed-rate ticks — the test/backpressure harness. */
  case class RateSource(rowsPerSecond: Int) extends SourceConfig
  /** Apache Kafka (StreamSourceType::Kafka). */
  case class KafkaSource(brokers: Seq[String], topics: Seq[String],
      startingOffsets: String = "latest") extends SourceConfig

  def read(spark: SparkSession, config: SourceConfig): DataFrame = config match {
    case FileSource(path, schema, fmt, maxFiles) =>
      val r = spark.readStream.schema(schema).format(fmt)
      maxFiles.fold(r)(n => r.option("maxFilesPerTrigger", n)).load(path)
    case SocketSource(host, port) =>
      spark.readStream.format("socket")
        .option("host", host).option("port", port).load()
    case RateSource(rps) =>
      spark.readStream.format("rate").option("rowsPerSecond", rps).load()
    case KafkaSource(brokers, topics, offsets) =>
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers.mkString(","))
        .option("subscribe", topics.mkString(","))
        .option("startingOffsets", offsets)
        .load()
        // kafka's (key, value) are binary; downstream operators want text
        .withColumn("value", col("value").cast("string"))
  }

  /** Extraction rules (stream_connectors.rs ExtractionRule): parse
    * line-delimited JSON events into typed columns. Malformed lines
    * become null structs the caller can route to a dead-letter sink —
    * the Spark-native form of the reference's per-rule error path.
    */
  def extractJson(lines: DataFrame, valueCol: String, schema: StructType): DataFrame =
    lines.select(from_json(col(valueCol), schema).as("event"))
      .select(col("event.*"))
}
