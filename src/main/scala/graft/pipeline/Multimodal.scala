package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extraction /
  * resize / frame-sampling run batched per partition via `mapPartitions`
  * (the JVM analogue of `mapInPandas` batches — one decoder instance per
  * partition, amortized init, bounded memory).
  *
  * Dimension decode is REAL for PNG/BMP/GIF/JPEG payloads ([[Multimodal.ImageHeader]]
  * parses the actual header byte layouts — pure JVM, no native codecs)
  * and RIFF/WAVE metadata is REAL via [[Multimodal.extractAudioInfo]]
  * ([[Multimodal.AudioHeader]]: chunk walk to the PCM fmt/data fields,
  * exact frame count and integer duration);
  * the PIXEL stage stays stubbed (`DecoderStub` emits a deterministic
  * hash-derived feature vector) because this container ships no image
  * libraries. The Spark-side contract — schema, batching, partitioning,
  * null handling — is real and tested; swapping in a full codec is
  * replacing one pure function.
  */
object Multimodal {

  /** Output schema of feature extraction. */
  val featureSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("features", ArrayType(FloatType), nullable = true)))

  /** Honest pure-JVM image header decoder: parses width/height from the
    * REAL byte layout of PNG (8-byte signature + IHDR chunk,
    * big-endian dims at offsets 16/20), JPEG (SOI + marker-segment
    * walk to the first SOFn frame header), BMP (`BM` magic + zeroed
    * reserved words, little-endian BITMAPINFOHEADER dims at 18/22 —
    * a negative height encodes top-down row order), and GIF
    * (`GIF87a`/`GIF89a`, little-endian logical-screen dims at 6/8).
    * No native codecs, no new dependencies. Unrecognized payloads
    * return None and fall to the stub's fake-header path. The magic
    * checks are deliberately strict (PNG 8 bytes, GIF 6, BMP 2 + 4
    * zero reserved bytes) so a hash-derived synthetic payload cannot
    * false-positive (collision odds <= 2^-48 per payload).
    */
  object ImageHeader {
    final case class Info(format: String, width: Int, height: Int)

    def parse(p: Array[Byte]): Option[Info] = {
      def u8(i: Int): Int = p(i) & 0xff
      def be32(i: Int): Int =
        (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
      def le32(i: Int): Int =
        (u8(i + 3) << 24) | (u8(i + 2) << 16) | (u8(i + 1) << 8) | u8(i)
      def le16(i: Int): Int = (u8(i + 1) << 8) | u8(i)
      if (p.length >= 24 &&
          p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' &&
          p(3) == 'G' && p(4) == 0x0d && p(5) == 0x0a &&
          p(6) == 0x1a && p(7) == 0x0a &&
          p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R')
        Some(Info("png", be32(16), be32(20)))
      else if (p.length >= 26 && p(0) == 'B' && p(1) == 'M' &&
               p(6) == 0 && p(7) == 0 && p(8) == 0 && p(9) == 0) {
        // DIB header size at 14 disambiguates the two real layouts:
        // BITMAPCOREHEADER (12) carries 16-bit dims at 18/20;
        // BITMAPINFOHEADER and successors (>= 40) carry 32-bit dims at
        // 18/22 (negative height = top-down row order; width must be
        // positive in both). Anything else is not a BMP we can read —
        // fall to the stub rather than emit garbage dimensions.
        val dib = le32(14)
        if (dib == 12 && le16(18) > 0 && le16(20) > 0)
          Some(Info("bmp", le16(18), le16(20)))
        else if (dib >= 40 && le32(18) > 0 && le32(22) != 0 &&
                 le32(22) != Int.MinValue) // abs(MinValue) overflows
          Some(Info("bmp", le32(18), math.abs(le32(22))))
        else None
      }
      else if (p.length >= 10 && p(0) == 'G' && p(1) == 'I' &&
               p(2) == 'F' && p(3) == '8' &&
               (p(4) == '7' || p(4) == '9') && p(5) == 'a')
        Some(Info("gif", le16(6), le16(8)))
      else if (p.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
        // JPEG: SOI, then walk the marker-segment chain to the first
        // SOFn frame header (the REAL byte protocol — each non-
        // standalone marker is FF xx + 16-bit big-endian length
        // including itself; dims sit after the length and precision
        // bytes, height before width). C4/C8/CC are DHT/JPG/DAC, not
        // frame headers. Corrupt chains (non-FF where a marker must
        // start, length < 2, truncation) fall to the stub rather than
        // emit garbage.
        def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
        var i = 2
        var out: Option[Info] = None
        var live = true
        while (live && out.isEmpty && i + 3 < p.length) {
          if (u8(i) != 0xff) live = false
          else {
            val m = u8(i + 1)
            if (m == 0xff) i += 1 // fill byte
            else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2
            else if (m == 0xd9 || m == 0xda) live = false // EOI/SOS
            else {
              val len = be16(i + 2)
              if (len < 2) live = false
              else if (m >= 0xc0 && m <= 0xcf &&
                       m != 0xc4 && m != 0xc8 && m != 0xcc) {
                if (i + 8 < p.length && len >= 7) {
                  val h = be16(i + 5); val w = be16(i + 7)
                  if (w > 0 && h > 0) out = Some(Info("jpeg", w, h))
                }
                live = false // a malformed SOF ends the walk either way
              } else i += 2 + len
            }
          }
        }
        out
      }
      else None
    }
  }

  /** Honest pure-JVM audio header decoder: parses the REAL RIFF/WAVE
    * byte layout — `RIFF <size> WAVE`, then a word-aligned chunk walk
    * collecting the PCM `fmt ` fields (channels/sample-rate/
    * block-align/bits, all little-endian) and the `data` chunk size;
    * frames = data bytes / block align, duration = frames*1000/rate
    * (integer). Corrupt or prematurely-ended chunk chains return
    * None; a payload truncated INSIDE its data chunk clamps to the
    * bytes actually present — never the declared (inflated) size, so
    * reported durations are always backed by real bytes. The audio
    * sibling of
    * [[ImageHeader]], driven by [[extractAudioInfo]]: a real codec
    * swap replaces only the sample stage, the header protocol is
    * already exact.
    */
  object AudioHeader {
    final case class Info(format: String, sampleRate: Int,
                          channels: Int, bitsPerSample: Int,
                          nFrames: Long, durationMs: Long)

    def parse(p: Array[Byte]): Option[Info] = {
      def u8(i: Int): Int = p(i) & 0xff
      def le16(i: Int): Int = (u8(i + 1) << 8) | u8(i)
      def le32(i: Int): Long =
        ((u8(i + 3).toLong << 24) | (u8(i + 2) << 16) |
          (u8(i + 1) << 8) | u8(i)) & 0xffffffffL
      if (p.length < 12 || p(0) != 'R' || p(1) != 'I' || p(2) != 'F' ||
          p(3) != 'F' || p(8) != 'W' || p(9) != 'A' || p(10) != 'V' ||
          p(11) != 'E') None
      else {
        var i = 12L
        var rate = -1; var ch = -1; var bits = -1; var block = -1
        var dataSize = -1L
        while (i + 8 <= p.length && (rate < 0 || dataSize < 0)) {
          val ii = i.toInt
          val cid = new String(p, ii, 4, "US-ASCII")
          val sz = le32(ii + 4)
          if (cid == "fmt " && sz >= 16 && i + 8 + 16 <= p.length) {
            ch = le16(ii + 10); rate = le32(ii + 12).toInt
            block = le16(ii + 20); bits = le16(ii + 22)
          } else if (cid == "data") {
            // clamp to the bytes actually present: a WAV truncated
            // inside its data chunk must report the truncated frame
            // count, not the declared one ("return None, never
            // garbage" extends to never-inflated durations)
            dataSize = math.min(sz, math.max(0L, p.length - (i + 8L)))
          }
          i += 8L + sz + (sz & 1L) // chunks are word-aligned
        }
        if (rate > 0 && ch > 0 && block > 0 && dataSize >= 0) {
          val frames = dataSize / block
          Some(Info("wav", rate, ch, bits, frames,
                    frames * 1000L / rate))
        } else None
      }
    }
  }

  /** Decoder: REAL header parsing for recognized image payloads
    * ([[ImageHeader]]), stub fallback otherwise. The feature vector
    * remains a deterministic rolling hash of the payload — a stand-in
    * for pixel features, since this container ships no pixel codecs.
    */
  object DecoderStub {
    final case class Decoded(width: Int, height: Int,
                             features: Array[Float])

    def decode(payload: Array[Byte], featureDim: Int): Decoded = {
      val (w, h) = ImageHeader.parse(payload) match {
        case Some(info) => (info.width, info.height)
        case None =>
          // fake header: first 8 bytes = width/height if payload >= 8
          if (payload.length >= 8)
            (math.abs(
               java.nio.ByteBuffer.wrap(payload, 0, 4).getInt % 4096),
             math.abs(
               java.nio.ByteBuffer.wrap(payload, 4, 4).getInt % 4096))
          else (0, 0)
      }
      var state = 1469598103934665603L // FNV offset
      val feats = new Array[Float](featureDim)
      var i = 0
      while (i < payload.length) {
        state = (state ^ payload(i)) * 1099511628211L
        feats(i % featureDim) += (state % 1000L) / 1000.0f
        i += 1
      }
      Decoded(w, h, feats)
    }
  }

  /** Output schema of audio metadata extraction. */
  val audioInfoSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("bits_per_sample", IntegerType, nullable = true),
    StructField("n_frames", LongType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Batched audio-metadata extraction over a binary column — the
    * [[extractFeatures]] sibling that drives [[AudioHeader]]: one
    * parse per payload inside mapPartitions, null fields for null or
    * non-WAV payloads (the caller's cue to route them elsewhere).
    */
  def extractAudioInfo(df: DataFrame, idCol: String,
                       payloadCol: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(audioInfoSchema)
    df.select(col(idCol).cast(LongType).as("id"),
              col(payloadCol).as("payload"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val parsed =
            if (payload == null) None else AudioHeader.parse(payload)
          parsed match {
            case Some(a) =>
              Row(id, payload.length, a.sampleRate, a.channels,
                  a.bitsPerSample, a.nFrames, a.durationMs)
            case None =>
              Row(id, if (payload == null) 0 else payload.length,
                  null, null, null, null, null)
          }
        }
      }(enc)
  }

  /** Batched feature extraction over a binary column. Partition-parallel;
    * decoder init happens once per partition (the mapPartitions closure),
    * mirroring the per-batch model setup of a Pandas-UDF pipeline.
    */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String,
                      modality: String,
                      featureDim: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    df.select(col(idCol).cast(LongType).as("id"),
              col(payloadCol).as("payload"))
      .mapPartitions { it =>
        // per-partition decoder instance (stub is stateless; a real codec
        // would allocate native contexts here, once)
        it.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          if (payload == null)
            Row(id, modality, 0, null, null, null)
          else {
            val d = DecoderStub.decode(payload, featureDim)
            Row(id, modality, payload.length, d.width, d.height,
                d.features.toSeq)
          }
        }
      }(enc)
  }

  /** Frame sampling plumbing for video-like payloads: splits a payload
    * into `nFrames` stub frames (byte slices) and emits one row per frame
    * — the explode keeps frame rows colocated with their source partition.
    */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String,
                   nFrames: Int): DataFrame = {
    val frameIdx = sequence(lit(0), lit(nFrames - 1))
    df.select(col(idCol).as("id"), col(payloadCol).as("payload"))
      .withColumn("n", lit(nFrames))
      .select(col("id"), posexplode(frameIdx).as(Seq("frame", "_i")),
              col("payload"), col("n"))
      .withColumn("frame_bytes",
        expr("substring(payload, 1 + frame * (length(payload) div n), " +
             "greatest(1, length(payload) div n))"))
      .select("id", "frame", "frame_bytes")
  }

  /** Wrap a table with synthetic binary payloads for testing the plumbing
    * (deterministic bytes from the id; sha-256 hex so a SQL oracle can
    * reproduce the payload byte-for-byte). */
  def withFakePayload(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("payload",
      sha2(concat_ws("-", col(idCol), lit("payload")), 256).cast("binary"))
}
