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
  * The actual codec is STUBBED (`DecoderStub`): this container ships no
  * image/audio libraries, so the stub produces a deterministic fake
  * feature vector from the bytes. The Spark-side contract — schema,
  * batching, partitioning, null handling — is real and tested; swapping in
  * a real decoder is replacing one pure function.
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

  /** STUB decoder: stands in for an image/audio codec. Deterministic:
    * features are derived from a rolling hash of the payload; dimensions
    * are parsed from the fake header when present. Replace `decode` with a
    * real codec (e.g. javax.imageio / ffmpeg bindings) in production.
    */
  object DecoderStub {
    final case class Decoded(width: Int, height: Int,
                             features: Array[Float])

    def decode(payload: Array[Byte], featureDim: Int): Decoded = {
      // fake header: first 8 bytes = width/height if payload >= 8
      val (w, h) =
        if (payload.length >= 8)
          (math.abs(java.nio.ByteBuffer.wrap(payload, 0, 4).getInt % 4096),
           math.abs(java.nio.ByteBuffer.wrap(payload, 4, 4).getInt % 4096))
        else (0, 0)
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
