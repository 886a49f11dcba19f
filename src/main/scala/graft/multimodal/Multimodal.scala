package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads travel as opaque
  * `BINARY` columns with typed metadata, and per-partition batch
  * decoding happens in `mapPartitions` (the Scala analogue of a
  * batched Pandas UDF: one iterator per partition, amortized setup,
  * executor-local).
  *
  * The decode step itself is a STUB — this container has no image/
  * audio codecs — implemented as a deterministic fake that derives
  * metadata from the byte stream, so the Spark-side contract (schema,
  * binary handling, partition batching, null behavior) is fully real
  * and testable. Swap `decodeStub` for a codec call in production.
  */
object Multimodal {

  case class MediaRow(id: Long, payload: Array[Byte])
  case class MediaMeta(id: Long, width: Int, height: Int, channels: Int, n_bytes: Long)

  /** STUB decoder. Deterministic fake: dimensions derived from the
    * payload length (stands in for parsing a real image header).
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    val n = payload.length
    (32 + n % 32, 32 + (n / 32) % 32, 3)
  }

  /** Batched decode over a binary column: per-partition iterator →
    * typed metadata rows. Null payloads are dropped (a real decoder
    * would route them to a quarantine sink).
    */
  def decodeMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[MediaRow] = df
      .select(col(idCol).cast("long").as("id"), col(binCol).as("payload"))
      .as[MediaRow]
    ds.mapPartitions { rows =>
      // batch-scoped setup would go here (codec init, model load)
      rows.filter(_.payload != null).map { r =>
        val (w, h, c) = decodeStub(r.payload)
        MediaMeta(r.id, w, h, c, r.payload.length.toLong)
      }
    }.toDF()
  }

  /** Fixed-size feature vector from the payload (stand-in for an
    * embedding model): byte-value histogram over 8 buckets,
    * L1-normalized. Columnar, deterministic, schema-stable.
    */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binCol).as("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.filter(_.payload != null).map { r =>
          val hist = new Array[Double](8)
          r.payload.foreach(b => hist((b & 0xFF) / 32) += 1.0)
          val total = math.max(1.0, r.payload.length.toDouble)
          (r.id, hist.map(v => math.rint(v / total * 1e6) / 1e6).toSeq)
        }
      }.toDF("id", "features")
  }
}
