package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The decode step is STUBBED (this container has no image/audio
  * libraries): [[FakeDecoder]] derives deterministic metadata from the
  * bytes so the Spark-side plumbing — schema, partitioning, batch shape,
  * per-partition iteration — is real and testable. Swap [[Decoder]] for
  * a JNI/FFI decoder (or move to `mapInPandas`+PIL on a PySpark edge) in
  * production; nothing else changes.
  */
object Multimodal {

  /** Metadata extracted per media blob. */
  final case class MediaMeta(
      id: Long, byte_len: Long, width: Int, height: Int, channels: Int,
      format: String)

  val metaSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** Decoder contract: bytes → metadata (+ optionally a feature vector).
    * Implementations must be thread-safe per partition.
    */
  trait Decoder extends Serializable {
    def decode(id: Long, bytes: Array[Byte]): MediaMeta
  }

  /** Deterministic stand-in for a real image decoder: "dimensions" are
    * pure functions of the byte content, so tests (and the DuckDB
    * oracle) can pin the plumbing end to end.
    */
  object FakeDecoder extends Decoder {
    def decode(id: Long, bytes: Array[Byte]): MediaMeta = {
      val len = bytes.length.toLong
      MediaMeta(id, len,
        width = (64 + len % 577).toInt,
        height = (64 + (len * 31) % 577).toInt,
        channels = 3,
        format = "fake")
    }
  }

  /** Decode a binary column per partition (the `mapInPandas` analogue:
    * one iterator pass per partition, no per-row task overhead; a real
    * decoder would also amortize its model/codec init here).
    *
    * @param df (id: long, media: binary)
    */
  def decodeMeta(df: DataFrame, decoder: Decoder = FakeDecoder): DataFrame = {
    val spark = df.sparkSession
    val enc = org.apache.spark.sql.Encoders.product[MediaMeta]
    df.select(col("id").cast("long"), col("media"))
      .as(org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.BINARY))
      .mapPartitions { it =>
        // per-partition init happens once (codec/model warmup goes here)
        it.map { case (id, bytes) => decoder.decode(id, bytes) }
      }(enc)
      .toDF()
  }

  /** Frame-sample stub: pick every `stride`-th byte window as a "frame"
    * reference — the real operator would emit (id, frame_idx, frame_bytes).
    * Demonstrates the explode-shaped output contract for video columns.
    */
  def frameSample(df: DataFrame, stride: Int): DataFrame =
    df.select(col("id").cast("long"), col("media"))
      .withColumn("n_frames",
        greatest((length(col("media")) / stride).cast("int"), lit(1)))
      .select(col("id"), posexplode(sequence(lit(0), col("n_frames") - 1)))
      .select(col("id"), col("col").as("frame_idx"),
        (col("col") * stride).as("byte_offset"))

  /** Feature-extraction contract: bytes → fixed-width float vector
    * (what a vision/audio encoder produces). Stub derives a
    * deterministic vector from byte statistics so the schema, batch
    * iteration, and downstream similarity plumbing are real — the
    * output feeds [[Similarity]] operators directly.
    */
  trait FeatureExtractor extends Serializable {
    def dim: Int
    def extract(bytes: Array[Byte]): Array[Float]
  }

  /** Deterministic stand-in: dim histogram-ish moments of the bytes,
    * L2-normalized. A real encoder (ONNX/JNI, or mapInPandas+torch on a
    * PySpark edge) drops in without touching the pipeline.
    *
    * Buckets accumulate as exact integer byte sums (order-independent),
    * scaled and normalized in double, cast to float once at the end —
    * every step is an arithmetic op any engine reproduces bit-exactly,
    * which gives the downstream ANN query a full DuckDB oracle.
    */
  final class FakeFeatureExtractor(val dim: Int = 16) extends FeatureExtractor {
    def extract(bytes: Array[Byte]): Array[Float] = {
      val sums = new Array[Long](dim)
      var i = 0
      while (i < bytes.length) {
        sums(i % dim) += (bytes(i) & 0xff)
        i += 1
      }
      val x = new Array[Double](dim)
      var n = 0.0
      var d = 0
      while (d < dim) { x(d) = sums(d) / 255.0; n += x(d) * x(d); d += 1 }
      val inv = if (n == 0) 0.0 else 1.0 / math.sqrt(n)
      val v = new Array[Float](dim)
      d = 0
      while (d < dim) { v(d) = (x(d) * inv).toFloat; d += 1 }
      v
    }
  }

  /** Per-partition feature extraction over a binary column —
    * (id, media) → (id, embedding array<float>). Encoder init amortizes
    * per partition, exactly like [[decodeMeta]].
    */
  def extractFeatures(df: DataFrame,
                      fx: FeatureExtractor = new FakeFeatureExtractor()): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) => (id, fx.extract(bytes)) }
      }
      .toDF("id", "embedding")
  }

  /** Resize stub for image columns: the real operator transcodes
    * `media` to target dims; the stub re-derives metadata at the target
    * size and passes bytes through, keeping the (binary in → binary +
    * typed meta out) contract that a real codec plugs into.
    */
  def resize(df: DataFrame, width: Int, height: Int): DataFrame =
    df.select(col("id").cast("long"), col("media"))
      .withColumn("width", lit(width))
      .withColumn("height", lit(height))
      .withColumn("byte_len", length(col("media")).cast("long"))
}
