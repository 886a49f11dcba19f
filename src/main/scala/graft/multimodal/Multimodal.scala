package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads travel as opaque
  * `BINARY` columns with typed metadata, and per-partition batch
  * decoding happens in `mapPartitions` (the Scala analogue of a
  * batched Pandas UDF: one iterator per partition, amortized setup,
  * executor-local).
  *
  * Metadata decoding is REAL for PNG, JPEG, and WAV payloads — a
  * pure-JVM header parse (`decodeHeader`: PNG IHDR, JPEG SOF marker
  * walk; `decodeWavHeader`: RIFF chunk walk — public format
  * knowledge, no codec dependency, and all a metadata pass needs).
  * Payloads that are not recognized media streams fall back to
  * `decodeStub`/`decodeAudioStub`, deterministic fakes keyed on
  * payload length, so the Spark-side contract (schema, binary
  * handling, partition batching, null behavior) stays exercised by
  * the synthetic test corpus. Full
  * pixel decode / resize / feature extraction remain stand-ins —
  * this container ships no codecs — with the batch-scoped setup
  * points a production codec would slot into.
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

  /** Real image-header parse, pure JVM: (width, height, channels)
    * for payloads that ARE PNG or JPEG streams, None otherwise —
    * malformed or truncated streams return None rather than throw,
    * so a mixed-quality corpus never kills a partition.
    *
    *  - PNG (RFC 2083): 8-byte signature, then the IHDR chunk —
    *    width/height as big-endian u32 at offsets 16/20, channels
    *    derived from the color-type byte at 25.
    *  - JPEG (ITU-T T.81 §B): SOI then marker segments, each
    *    FF <marker> <u16 length>; walk to the first SOF0-SOF15
    *    frame header (skipping DHT/JPG/DAC, stopping at SOS/EOI),
    *    which carries height/width as big-endian u16 and the
    *    component count = channels.
    */
  def decodeHeader(p: Array[Byte]): Option[(Int, Int, Int)] = {
    def u8(i: Int): Int = p(i) & 0xFF
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    val pngSig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
    if (p.length >= 26 && pngSig.indices.forall(i => u8(i) == pngSig(i))) {
      if (new String(p.slice(12, 16), "US-ASCII") != "IHDR") return None
      val w = u32(16); val h = u32(20)
      val channels = u8(25) match {
        case 0 => 1 // grayscale
        case 2 => 3 // truecolor
        case 3 => 1 // palette (one index per pixel)
        case 4 => 2 // gray + alpha
        case 6 => 4 // RGBA
        case _ => 0
      }
      if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue &&
        channels > 0) Some((w.toInt, h.toInt, channels))
      else None
    } else if (p.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8) {
      var i = 2
      while (i + 1 < p.length) {
        if (u8(i) != 0xFF) return None // desynced: not a marker stream
        val m = u8(i + 1)
        if (m == 0xFF) i += 1 // fill byte
        else if (m == 0x01 || (m >= 0xD0 && m <= 0xD8)) i += 2 // standalone
        else if (m == 0xD9 || m == 0xDA) return None // EOI/SOS before any SOF
        else {
          if (i + 3 >= p.length) return None
          val len = u16(i + 2)
          if (len < 2 || i + 2 + len > p.length) return None
          if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
            // SOFn: precision u8, height u16, width u16, components u8
            if (len < 8) return None
            val h = u16(i + 5); val w = u16(i + 7); val c = u8(i + 9)
            return if (w > 0 && h > 0 && c > 0) Some((w, h, c)) else None
          }
          i += 2 + len
        }
      }
      None
    } else None
  }

  /** Batched decode over a binary column: per-partition iterator →
    * typed metadata rows. Real PNG/JPEG headers parse exactly;
    * everything else takes the deterministic stub. Null payloads are
    * dropped (a real decoder would route them to a quarantine sink).
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
        val (w, h, c) = decodeHeader(r.payload).getOrElse(decodeStub(r.payload))
        MediaMeta(r.id, w, h, c, r.payload.length.toLong)
      }
    }.toDF()
  }

  case class AudioMeta(id: Long, sample_rate: Int, channels: Int,
    bits_per_sample: Int, n_samples: Long, duration_ms: Long, n_bytes: Long)

  /** Real WAV (RIFF) header parse, pure JVM — the audio counterpart
    * of `decodeHeader`: (sampleRate, channels, bitsPerSample,
    * dataBytes) for payloads that ARE canonical RIFF/WAVE streams,
    * None otherwise. Same stance as the image path: public format
    * knowledge only (RIFF 1991 spec / WAVE PCM), malformed or
    * truncated streams return None rather than throw.
    *
    * Layout walked: "RIFF" u32le "WAVE", then word-aligned chunks of
    * `<4cc> <u32le size>`; the `fmt ` chunk carries channels u16le @
    * +10, sample rate u32le @ +12, bits/sample u16le @ +22; the
    * `data` chunk's DECLARED size is the payload byte count (a
    * metadata pass reads headers, never the bulk, so a data chunk
    * larger than the in-hand slice still reports its declared size —
    * exactly what a object-store range-read of the first KB yields).
    */
  def decodeWavHeader(p: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    def u8(i: Int): Int = p(i) & 0xFF
    def u16le(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def u32le(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) |
        (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def tag(i: Int): String =
      if (i + 4 <= p.length) new String(p, i, 4, "US-ASCII") else ""
    if (p.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var fmt: Option[(Int, Int, Int)] = None
    var data: Option[Long] = None
    var i = 12L
    while (i + 8 <= p.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(i.toInt)
      val size = u32le(i.toInt + 4)
      if (id == "fmt ") {
        if (size < 16 || i + 8 + 16 > p.length) return None
        // audioFormat must be 1 (integer PCM): the derived-field math
        // below the parse (blockAlign = ch × bits/8, samples =
        // bytes / blockAlign) is PCM arithmetic, and applying it to
        // ADPCM (format 17, bits = 4 → blockAlign 0) or MP3-in-WAV
        // (format 85) would report confidently wrong sample counts
        // as "real" metadata. Non-PCM streams route to the stub like
        // any other unrecognized payload.
        if (u16le(i.toInt + 8) != 1) return None
        val channels = u16le(i.toInt + 10)
        val rate = u32le(i.toInt + 12)
        val bits = u16le(i.toInt + 22)
        if (channels <= 0 || rate <= 0 || rate > Int.MaxValue || bits <= 0)
          return None
        fmt = Some((rate.toInt, channels, bits))
      } else if (id == "data") {
        data = Some(size)
      }
      i += 8L + size + (size & 1L) // chunks are word-aligned
    }
    for { (r, c, b) <- fmt; d <- data } yield (r, c, b, d)
  }

  /** STUB audio decoder for non-WAV payloads, deterministic from the
    * payload length (the audio analogue of `decodeStub`).
    */
  def decodeAudioStub(payload: Array[Byte]): (Int, Int, Int, Long) = {
    val n = payload.length
    (8000 + (n % 8) * 1000, 1 + n % 2, 16, n.toLong)
  }

  /** Batched audio-metadata decode: real WAV headers parse exactly,
    * everything else takes the deterministic stub; null payloads are
    * dropped. Derived fields use integer arithmetic only (exact,
    * engine-portable): n_samples = dataBytes / blockAlign,
    * duration_ms = n_samples × 1000 / rate.
    */
  def decodeAudioMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binCol).as("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.filter(_.payload != null).map { r =>
          val (rate, ch, bits, dataBytes) =
            decodeWavHeader(r.payload).getOrElse(decodeAudioStub(r.payload))
          val blockAlign = ch.toLong * (bits / 8)
          val nSamples = if (blockAlign > 0) dataBytes / blockAlign else 0L
          val durMs = if (rate > 0) nSamples * 1000L / rate else 0L
          AudioMeta(r.id, rate, ch, bits, nSamples, durMs,
            r.payload.length.toLong)
        }
      }.toDF()
  }

  case class VideoMeta(id: Long, brand: String, timescale: Long,
    duration_ms: Long, traks: Int, n_bytes: Long)

  /** Real MP4 / ISO-BMFF header parse, pure JVM — the video
    * counterpart of `decodeHeader`/`decodeWavHeader`: (major brand,
    * timescale, duration in timescale units, trak count) for payloads
    * that ARE ISO base-media containers, None otherwise. Public
    * format knowledge only (ISO/IEC 14496-12 box structure);
    * malformed or truncated streams return None rather than throw.
    *
    * Layout walked: top-level boxes of `<u32be size> <4cc type>`
    * (size 1 = 64-bit largesize follows; size 0 = to-end-of-file).
    * The FIRST box must be `ftyp` (major brand at +8). The `moov`
    * box's children are walked for `mvhd` — version 0 carries
    * timescale u32/duration u32 at +12/+16, version 1 carries
    * timescale u32/duration u64 at +20/+24 — and `trak` boxes are
    * counted. A `moov` truncated mid-payload still parses the
    * children that fit (an object-store range-read of the first KB),
    * but a payload whose mvhd never appears is None.
    */
  def decodeMp4Header(p: Array[Byte]): Option[(String, Long, Long, Int)] = {
    def u8(i: Int): Int = p(i) & 0xFF
    def u32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def u64(i: Int): Long = (u32(i) << 32) | u32(i + 4)
    def tag(i: Int): String =
      if (i + 4 <= p.length) new String(p, i, 4, "US-ASCII") else ""
    // (boxStart, payloadStart, boxEnd) or None on a malformed header
    def box(i: Long, limit: Long): Option[(String, Long, Long)] = {
      if (i + 8 > limit) return None
      val size0 = u32(i.toInt)
      val t = tag(i.toInt + 4)
      val (start, end) =
        if (size0 == 1L) {
          if (i + 16 > limit) return None
          val ls = u64(i.toInt + 8)
          if (ls < 16) return None
          (i + 16, i + ls)
        }
        else if (size0 == 0L) (i + 8, limit) // box extends to EOF
        else if (size0 < 8) return None
        else (i + 8, i + size0)
      if (end <= i) None else Some((t, start, end))
    }
    if (p.length < 12) return None
    val ftyp = box(0L, p.length.toLong) match {
      case Some(("ftyp", start, _)) if start + 4 <= p.length =>
        tag(start.toInt)
      case _ => return None
    }
    // walk top-level boxes for moov
    var i = box(0L, p.length.toLong).get._3
    while (i + 8 <= p.length) {
      box(i, p.length.toLong) match {
        case Some(("moov", mStart, mEnd)) =>
          val lim = math.min(mEnd, p.length.toLong)
          var j = mStart
          var mvhd: Option[(Long, Long)] = None
          var traks = 0
          while (j + 8 <= lim) {
            box(j, lim) match {
              case Some(("mvhd", s, e)) =>
                val v = if (s.toInt < p.length) u8(s.toInt) else -1
                if (v == 0 && s + 20 <= lim)
                  mvhd = Some((u32(s.toInt + 12), u32(s.toInt + 16)))
                else if (v == 1 && s + 32 <= lim)
                  mvhd = Some((u32(s.toInt + 20), u64(s.toInt + 24)))
                else return None
                j = e
              case Some(("trak", _, e)) => traks += 1; j = e
              case Some((_, _, e)) => j = e
              case None => j = lim // truncated child: stop the walk
            }
          }
          return mvhd.collect { case (ts, dur) if ts > 0 =>
            (ftyp, ts, dur, traks)
          }
        case Some((_, _, e)) => i = e
        case None => return None
      }
    }
    None
  }

  /** STUB video decoder for non-ISO-BMFF payloads, deterministic from
    * the payload length (the video analogue of `decodeStub`).
    */
  def decodeVideoStub(payload: Array[Byte]): (String, Long, Long, Int) = {
    val n = payload.length
    ("stub", 600L + (n % 5) * 300L, n.toLong * 4L, 1 + n % 3)
  }

  /** Batched video-metadata decode: real ISO-BMFF headers parse
    * exactly, everything else takes the deterministic stub; null
    * payloads are dropped. duration_ms = duration × 1000 / timescale
    * (integer arithmetic, exact, engine-portable).
    */
  def decodeVideoMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binCol).as("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.filter(_.payload != null).map { r =>
          val (brand, ts, dur, traks) =
            decodeMp4Header(r.payload).getOrElse(decodeVideoStub(r.payload))
          VideoMeta(r.id, brand, ts, dur * 1000L / ts, traks,
            r.payload.length.toLong)
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
