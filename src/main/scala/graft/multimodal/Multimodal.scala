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

  case class Frame(id: Long, frame_idx: Int, frame_offset: Long, n_bytes: Int)

  /** Frame sampling (the video stand-in): the payload splits into
    * fixed `frameBytes`-sized frames and every `stride`-th frame
    * becomes its OWN row — the 1→N row expansion a video pipeline
    * needs, as a per-partition iterator flatMap (schema-stable,
    * executor-local, batch-scoped decoder setup point preserved; a
    * real codec would replace the fixed-size split with keyframe
    * offsets).
    */
  def frameSample(df: DataFrame, idCol: String, binCol: String,
      stride: Int, frameBytes: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binCol).as("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.filter(_.payload != null).flatMap { r =>
          val len = r.payload.length
          val nFrames = (len + frameBytes - 1) / frameBytes
          (0 until nFrames by stride).iterator.map { i =>
            Frame(r.id, i, i.toLong * frameBytes,
              math.min(frameBytes, len - i * frameBytes))
          }
        }
      }.toDF()
  }

  /** Resize stub: deterministic stride-resample of the byte payload
    * to exactly w×h×3 bytes (stands in for a real scaler — the
    * binary-in → binary-out + refreshed-metadata contract is the
    * real part). Output metadata reflects the TARGET dimensions.
    */
  def resize(df: DataFrame, idCol: String, binCol: String,
      w: Int, h: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binCol).as("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        val outLen = w * h * 3
        rows.filter(r => r.payload != null && r.payload.nonEmpty).map { r =>
          val out = new Array[Byte](outLen)
          var i = 0
          while (i < outLen) {
            out(i) = r.payload((i.toLong * r.payload.length / outLen).toInt)
            i += 1
          }
          (r.id, out, w, h, 3)
        }
      }.toDF("id", "payload", "width", "height", "channels")
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
