package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The decode, resize and frame-sample steps are REAL for the classic
  * fixed-layout containers ([[MediaCodecs]]: 24-bit BMP, P6 PPM,
  * PCM-16 WAV — genuine header parsing, padding/BGR/bottom-up
  * handling, chunk walks, nearest-neighbor resampling). For formats
  * needing external codecs (JPEG/MP4/...), swap [[Decoder]] for a
  * JNI/FFI decoder (or move to `mapInPandas`+PIL on a PySpark edge);
  * nothing else changes — [[FakeDecoder]] remains as the
  * plumbing-determinism stub for opaque byte streams.
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

  /** REAL frame sampling over the PCM audio codec: decode the WAV
    * container, keep every `every`-th frame, emit one row per kept
    * (frame, channel) with the SIGNED 16-bit sample value — the
    * explode-shaped output contract a video column would share (sample
    * along the frame axis, one row per kept frame). Non-audio or
    * corrupt blobs contribute no rows (consistent with
    * [[MediaCodecs.sniffDecode]]'s degrade-don't-throw posture).
    *
    * @param df (id: long, media: binary)
    * @return (id, frame, channel, sample) — `frame` is the ORIGINAL
    *   frame index (kept frames are `frame % every == 0`), so the
    *   sampled stream stays alignable with the source timeline
    */
  def frameSample(df: DataFrame, every: Int): DataFrame = {
    require(every > 0, s"every must be positive, got $every")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val d = MediaCodecs.sniffDecode(bytes)
          if (d.format != "wav") Iterator.empty
          else {
            // the codec-level kernel compacts kept frames; the k-th
            // kept frame was source frame k*every
            val s = MediaCodecs.sampleFrames(d, every)
            val ch = s.channels
            Iterator.range(0, s.width).flatMap { k =>
              Iterator.range(0, ch).map { c =>
                val o = (k * ch + c) * 2
                val u = (s.payload(o) & 0xff) | ((s.payload(o + 1) & 0xff) << 8)
                (id, k * every, c, if (u >= 0x8000) u - 0x10000 else u)
              }
            }
          }
        }
      }
      .toDF("id", "frame", "channel", "sample")
  }

  /** VIDEO frame sampling over AVI/MJPEG containers — the real-video
    * twin of [[frameSample]]'s PCM path: walk the RIFF container
    * ([[MediaCodecs.Avi.decodeFrames]]), keep every `every`-th frame,
    * decode each kept frame with the baseline-JPEG decoder
    * ([[Jpeg.decode]]), and emit the grayscale pixel stream. This is
    * the shape a multimodal corpus uses to turn raw video into
    * trainable (frame, pixels) rows — per-row decode, no shuffle; a
    * corrupt container or frame degrades to zero rows for that id (the
    * [[decodeMeta]] contract).
    *
    * @return (id, frame, pos, val) — `frame` is the ORIGINAL frame
    *   index; `pos` the row-major pixel position; `val` in [0, 255]
    */
  def videoFrameSample(df: DataFrame, every: Int): DataFrame = {
    require(every > 0, s"every must be positive, got $every")
    val spark = df.sparkSession
    import spark.implicits._
    Dedup.spread(df).select(col("id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val frames =
            try MediaCodecs.Avi.decodeFrames(bytes)
            catch { case _: Exception => Seq.empty[Array[Byte]] }
          frames.iterator.zipWithIndex
            .filter { case (_, f) => f % every == 0 }
            .flatMap { case (jpeg, f) =>
              val d =
                try Jpeg.decode(jpeg)
                catch { case _: Exception =>
                  MediaCodecs.Decoded(0, 0, 0, "unknown", Array.emptyByteArray)
                }
              Iterator.range(0, d.payload.length).map { i =>
                (id, f, i, d.payload(i) & 0xff)
              }
            }
        }
      }
      .toDF("id", "frame", "pos", "val")
  }

  /** Per-frame perceptual hashes of AVI/MJPEG videos: container walk →
    * every `every`-th frame → JPEG decode → grayscale dHash. The
    * video-dedup unit: a video IS its frame-hash signature.
    *
    * @return (id, frame, dhash_hi, dhash_lo)
    */
  def videoFrameHashes(df: DataFrame, every: Int): DataFrame = {
    require(every > 0)
    val spark = df.sparkSession
    import spark.implicits._
    // a small input parquet scans as one or two partitions; the
    // per-row decode is the expensive part, so spread it across cores
    // (measured 19.7 s -> core-bound on a 5000-video single-file scan)
    Dedup.spread(df).select(col("id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val frames =
            try MediaCodecs.Avi.decodeFrames(bytes)
            catch { case _: Exception => Seq.empty[Array[Byte]] }
          frames.iterator.zipWithIndex
            .filter { case (_, f) => f % every == 0 }
            .flatMap { case (jpeg, f) =>
              try {
                val (hi, lo) = ImageHash.dhash64Decoded(Jpeg.decode(jpeg))
                Iterator.single((id, f,
                  hi.toLong & 0xffffffffL, lo.toLong & 0xffffffffL))
              } catch { case _: Exception => Iterator.empty }
            }
        }
      }
      .toDF("id", "frame", "dhash_hi", "dhash_lo")
  }

  /** Video-level near-dup pairs — the composed production recipe:
    * frame hashes ([[videoFrameHashes]]) → EXACT-signature collapse
    * (identical videos keep one representative, the measured
    * q_image_neardup lesson) → representative pairs sharing at least
    * `minShared` distinct frame hashes (re-encoded or trimmed copies
    * overlap on most frames; unrelated videos on none). All joins are
    * equi-joins on hash values; signatures are md5 of the sorted
    * frame-hash list, so the collapse groups replay in any engine.
    *
    * @return (id_a, id_b, n_shared) among representatives
    */
  def videoNearDupPairs(df: DataFrame, every: Int, minShared: Int): DataFrame = {
    require(minShared >= 1)
    val fh = videoFrameHashes(df, every).localCheckpoint(eager = false)
    val sig = fh
      .select(col("id"),
        concat_ws(":", col("frame"), col("dhash_hi"), col("dhash_lo")).as("__e"))
      .groupBy("id")
      .agg(md5(concat_ws(";", sort_array(collect_list(col("__e"))))).as("__sig"))
    val reps = sig.groupBy("__sig").agg(min("id").as("id"))
    val rh = fh.join(reps.select("id"), Seq("id"), "left_semi")
      .select(col("id"), col("dhash_hi"), col("dhash_lo")).distinct()
    rh.as("a")
      .join(rh.as("b"),
        col("a.dhash_hi") === col("b.dhash_hi") &&
          col("a.dhash_lo") === col("b.dhash_lo") &&
          col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

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

  /** REAL image resize over the container codecs: decode (BMP or PPM),
    * nearest-neighbor resample ([[MediaCodecs.resizeNearest]] — pure
    * integer index map, oracle-replayable), re-encode as P6 PPM. Binary
    * in → binary + typed meta out, so the output column feeds
    * [[decodeMeta]] / [[extractFeatures]] unchanged — the normalize-to-
    * thumbnail front step of an image feature pipeline. Non-image or
    * corrupt blobs degrade to a zero-dim `unknown` row with empty
    * media rather than killing the partition.
    */
  def resize(df: DataFrame, width: Int, height: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val d = MediaCodecs.sniffDecode(bytes)
          // gate on FORMAT, not channel count — a 3-channel WAV also
          // decodes with channels == 3 but its payload is not a pixel
          // grid and must degrade, not crash; PNG joins only in its
          // RGB shape (gray/RGBA payloads are not the RGB grid the
          // resampler and the PPM re-encode expect)
          if ((d.format == "bmp" || d.format == "ppm" ||
               ((d.format == "png" || d.format == "jpeg") && d.channels == 3)) &&
              d.width > 0 && d.height > 0) {
            val r = MediaCodecs.resizeNearest(d, width, height)
            (id, MediaCodecs.Ppm.encode(width, height, i => r.payload(i) & 0xff),
              width, height, "ppm")
          } else (id, Array.emptyByteArray, 0, 0, "unknown")
        }
      }
      .toDF("id", "media", "width", "height", "format")
  }
}
