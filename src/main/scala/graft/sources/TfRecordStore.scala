package graft.sources

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import java.io.ByteArrayOutputStream
import java.util.zip.CRC32C

/** Sharded TFRecord interchange — the other boundary format trainers
  * consume (TensorFlow / JAX input pipelines address corpora as
  * `.tfrecord` shards of `tf.train.Example` records).
  *
  * Both the container framing and the payload encoding are implemented
  * from their public specifications, dependency-free:
  *
  *   - TFRecord framing (TensorFlow `io/record_writer.cc` public docs):
  *     `uint64 length (LE) · uint32 masked_crc32c(length) · byte[length]
  *     data · uint32 masked_crc32c(data)`, where
  *     `masked = rotr(crc32c, 15) + 0xa282ead8` and CRC32C is the
  *     Castagnoli CRC (JDK `java.util.zip.CRC32C`).
  *   - Payload: `tf.train.Example` in protobuf wire format (proto3
  *     encoding spec): `Example{Features features=1}` →
  *     `Features{map<string,Feature> feature=1}` → `Feature{BytesList
  *     bytes_list=1 | FloatList float_list=2 | Int64List int64_list=3}`
  *     with packed primitive lists.
  *
  * Parquet stays the processing format (predicate pushdown, column
  * pruning); this layer exists so a curated corpus can be handed to a
  * training job byte-compatible with what `tf.data.TFRecordDataset`
  * expects, and so third-party TFRecord drops can be ingested.
  *
  * Column mapping (both directions): STRING/BINARY ↔ `bytes_list`,
  * integral/BOOLEAN ↔ `int64_list`, FLOAT ↔ `float_list`,
  * ARRAY of either ↔ the corresponding packed list. `tf.train.Example`
  * has no double list, so DOUBLE columns narrow to float32 on write —
  * callers needing exactness keep doubles in parquet or pre-scale to
  * int64; the round-trip gate therefore uses integral/string columns.
  * NULL ↔ the feature is omitted from the record (the TF convention).
  */
object TfRecordStore {

  private val MaskDelta = 0xa282ead8

  /** `rotr(crc, 15) + 0xa282ead8`, everything mod 2^32 — Int arithmetic
    * wraps exactly as the spec's uint32 does.
    */
  private def mask(crc: Int): Int = ((crc >>> 15) | (crc << 17)) + MaskDelta

  private def crc32c(bytes: Array[Byte], off: Int, len: Int): Int = {
    val c = new CRC32C()
    c.update(bytes, off, len)
    c.getValue.toInt
  }

  // ---------------------------------------------------------------- proto
  /** Minimal protobuf wire-format writer: varints, tags, and
    * length-delimited fields are the whole encoding surface
    * `tf.train.Example` needs.
    */
  private final class ProtoOut {
    val buf = new ByteArrayOutputStream()
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { buf.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      buf.write(v.toInt)
    }
    def tag(field: Int, wire: Int): Unit = varint((field.toLong << 3) | wire)
    def bytes(field: Int, b: Array[Byte]): Unit = {
      tag(field, 2); varint(b.length.toLong); buf.write(b, 0, b.length)
    }
    def message(field: Int)(body: ProtoOut => Unit): Unit = {
      val inner = new ProtoOut; body(inner); bytes(field, inner.buf.toByteArray)
    }
    def toByteArray: Array[Byte] = buf.toByteArray
  }

  private[sources] sealed trait Feature
  private[sources] final case class BytesFeature(v: Seq[Array[Byte]]) extends Feature
  private[sources] final case class FloatFeature(v: Seq[Float]) extends Feature
  private[sources] final case class Int64Feature(v: Seq[Long]) extends Feature

  /** One `tf.train.Example` from named features. */
  private[sources] def encodeExample(features: Seq[(String, Feature)]): Array[Byte] = {
    val ex = new ProtoOut
    ex.message(1) { fs => // Example.features
      features.foreach { case (name, feat) =>
        fs.message(1) { entry => // Features.feature map entry
          entry.bytes(1, name.getBytes("UTF-8"))
          entry.message(2) { f =>
            feat match {
              case BytesFeature(vs) =>
                f.message(1)(bl => vs.foreach(b => bl.bytes(1, b)))
              case FloatFeature(vs) =>
                f.message(2) { fl => // packed float list
                  val p = new ProtoOut
                  vs.foreach { x =>
                    val bits = java.lang.Float.floatToIntBits(x)
                    p.buf.write(bits & 0xff); p.buf.write((bits >>> 8) & 0xff)
                    p.buf.write((bits >>> 16) & 0xff); p.buf.write((bits >>> 24) & 0xff)
                  }
                  fl.bytes(1, p.toByteArray)
                }
              case Int64Feature(vs) =>
                f.message(3) { il => // packed varint list
                  val p = new ProtoOut
                  vs.foreach(p.varint)
                  il.bytes(1, p.toByteArray)
                }
            }
          }
        }
      }
    }
    ex.toByteArray
  }

  /** Protobuf reader over a byte slice — returns (field, wire, value)
    * triples; length-delimited values surface as slices, varints as
    * longs. Unknown fields are skipped, as the wire format requires.
    */
  private final class ProtoIn(val b: Array[Byte], var pos: Int, val end: Int) {
    def hasNext: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var v = 0L
      var more = true
      while (more) {
        val x = b(pos) & 0xff; pos += 1
        v |= (x & 0x7fL) << shift; shift += 7
        more = (x & 0x80) != 0
      }
      v
    }
    /** Returns (fieldNumber, wireType); positions at the value. */
    def readTag(): (Int, Int) = {
      val t = varint()
      ((t >>> 3).toInt, (t & 7).toInt)
    }
    def slice(): ProtoIn = {
      val len = varint().toInt
      val s = new ProtoIn(b, pos, pos + len); pos += len; s
    }
    def sliceBytes(): Array[Byte] = {
      val len = varint().toInt
      val out = java.util.Arrays.copyOfRange(b, pos, pos + len); pos += len; out
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint(); ()
      case 1 => pos += 8
      case 2 => val len = varint().toInt; pos += len
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
    def readFloatLE(): Float = {
      val bits = (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8) |
        ((b(pos + 2) & 0xff) << 16) | ((b(pos + 3) & 0xff) << 24)
      pos += 4
      java.lang.Float.intBitsToFloat(bits)
    }
  }

  private[sources] def decodeExample(record: Array[Byte]): Map[String, Feature] = {
    val out = scala.collection.mutable.LinkedHashMap[String, Feature]()
    val ex = new ProtoIn(record, 0, record.length)
    while (ex.hasNext) {
      val (f, w) = ex.readTag()
      if (f == 1 && w == 2) { // Example.features
        val fs = ex.slice()
        while (fs.hasNext) {
          val (ff, fw) = fs.readTag()
          if (ff == 1 && fw == 2) { // map entry
            val entry = fs.slice()
            var name: String = null
            var feat: Feature = null
            while (entry.hasNext) {
              val (ef, ew) = entry.readTag()
              if (ef == 1 && ew == 2) name = new String(entry.sliceBytes(), "UTF-8")
              else if (ef == 2 && ew == 2) feat = decodeFeature(entry.slice())
              else entry.skip(ew)
            }
            if (name != null && feat != null) out(name) = feat
          } else fs.skip(fw)
        }
      } else ex.skip(w)
    }
    out.toMap
  }

  private def decodeFeature(f: ProtoIn): Feature = {
    var result: Feature = Int64Feature(Nil)
    while (f.hasNext) {
      val (ff, fw) = f.readTag()
      (ff, fw) match {
        case (1, 2) => // BytesList
          val bl = f.slice()
          val vs = Seq.newBuilder[Array[Byte]]
          while (bl.hasNext) {
            val (bf, bw) = bl.readTag()
            if (bf == 1 && bw == 2) vs += bl.sliceBytes() else bl.skip(bw)
          }
          result = BytesFeature(vs.result())
        case (2, 2) => // FloatList (packed or repeated fixed32)
          val fl = f.slice()
          val vs = Seq.newBuilder[Float]
          while (fl.hasNext) {
            val (vf, vw) = fl.readTag()
            if (vf == 1 && vw == 2) {
              val packed = fl.slice()
              while (packed.hasNext) vs += packed.readFloatLE()
            } else if (vf == 1 && vw == 5) vs += fl.readFloatLE()
            else fl.skip(vw)
          }
          result = FloatFeature(vs.result())
        case (3, 2) => // Int64List (packed or repeated varint)
          val il = f.slice()
          val vs = Seq.newBuilder[Long]
          while (il.hasNext) {
            val (vf, vw) = il.readTag()
            if (vf == 1 && vw == 2) {
              val packed = il.slice()
              while (packed.hasNext) vs += packed.varint()
            } else if (vf == 1 && vw == 0) vs += il.varint()
            else il.skip(vw)
          }
          result = Int64Feature(vs.result())
        case (_, w) => f.skip(w)
      }
    }
    result
  }

  // ------------------------------------------------------------- framing
  /** Frame one record: length · masked crc(length) · data · masked
    * crc(data), all little-endian.
    */
  private[sources] def frame(record: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(record.length + 16)
    val lenBytes = new Array[Byte](8)
    var v = record.length.toLong
    var i = 0
    while (i < 8) { lenBytes(i) = (v & 0xff).toByte; v >>>= 8; i += 1 }
    out.write(lenBytes, 0, 8)
    writeIntLE(out, mask(crc32c(lenBytes, 0, 8)))
    out.write(record, 0, record.length)
    writeIntLE(out, mask(crc32c(record, 0, record.length)))
    out.toByteArray
  }

  private def writeIntLE(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
  }

  private def readIntLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** Split a shard's bytes into its records, verifying both CRCs —
    * a torn or bit-flipped shard fails loudly, not as silent record
    * corruption fed to a trainer.
    */
  private[sources] def unframe(shard: Array[Byte]): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      private var pos = 0
      def hasNext: Boolean = pos < shard.length
      def next(): Array[Byte] = {
        require(pos + 12 <= shard.length, s"truncated TFRecord header at $pos")
        var len = 0L
        var i = 7
        while (i >= 0) { len = (len << 8) | (shard(pos + i) & 0xffL); i -= 1 }
        val lenCrc = readIntLE(shard, pos + 8)
        require(lenCrc == mask(crc32c(shard, pos, 8)),
          s"TFRecord length CRC mismatch at $pos")
        val dataOff = pos + 12
        require(dataOff + len + 4 <= shard.length,
          s"truncated TFRecord data at $pos (len=$len)")
        val rec = java.util.Arrays.copyOfRange(shard, dataOff, dataOff + len.toInt)
        val dataCrc = readIntLE(shard, dataOff + len.toInt)
        require(dataCrc == mask(crc32c(rec, 0, rec.length)),
          s"TFRecord data CRC mismatch at $pos")
        pos = dataOff + len.toInt + 4
        rec
      }
    }

  // ------------------------------------------------------------ row <-> ex
  private def rowToExample(row: Row, schema: StructType): Array[Byte] = {
    val feats = Seq.newBuilder[(String, Feature)]
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (!row.isNullAt(i)) {
        val feat: Feature = f.dataType match {
          case StringType => BytesFeature(Seq(row.getString(i).getBytes("UTF-8")))
          case BinaryType => BytesFeature(Seq(row.getAs[Array[Byte]](i)))
          case LongType => Int64Feature(Seq(row.getLong(i)))
          case IntegerType => Int64Feature(Seq(row.getInt(i).toLong))
          case ShortType => Int64Feature(Seq(row.getShort(i).toLong))
          case BooleanType => Int64Feature(Seq(if (row.getBoolean(i)) 1L else 0L))
          case FloatType => FloatFeature(Seq(row.getFloat(i)))
          case DoubleType => FloatFeature(Seq(row.getDouble(i).toFloat))
          case ArrayType(FloatType, _) =>
            FloatFeature(row.getSeq[Float](i))
          case ArrayType(DoubleType, _) =>
            FloatFeature(row.getSeq[Double](i).map(_.toFloat))
          case ArrayType(LongType, _) => Int64Feature(row.getSeq[Long](i))
          case ArrayType(IntegerType, _) =>
            Int64Feature(row.getSeq[Int](i).map(_.toLong))
          case ArrayType(StringType, _) =>
            BytesFeature(row.getSeq[String](i).map(_.getBytes("UTF-8")))
          case dt => throw new IllegalArgumentException(
            s"TFRecord mapping undefined for column ${f.name}: $dt")
        }
        feats += ((f.name, feat))
      }
    }
    encodeExample(feats.result())
  }

  private def exampleToRow(feats: Map[String, Feature], schema: StructType): Row = {
    val values = schema.fields.map { f =>
      feats.get(f.name) match {
        case None => null
        case Some(feat) => (f.dataType, feat) match {
          case (StringType, BytesFeature(vs)) => new String(vs.head, "UTF-8")
          case (BinaryType, BytesFeature(vs)) => vs.head
          case (LongType, Int64Feature(vs)) => vs.head
          case (IntegerType, Int64Feature(vs)) => vs.head.toInt
          case (ShortType, Int64Feature(vs)) => vs.head.toShort
          case (BooleanType, Int64Feature(vs)) => vs.head != 0L
          case (FloatType, FloatFeature(vs)) => vs.head
          case (DoubleType, FloatFeature(vs)) => vs.head.toDouble
          case (ArrayType(FloatType, _), FloatFeature(vs)) => vs
          case (ArrayType(DoubleType, _), FloatFeature(vs)) => vs.map(_.toDouble)
          case (ArrayType(LongType, _), Int64Feature(vs)) => vs
          case (ArrayType(IntegerType, _), Int64Feature(vs)) => vs.map(_.toInt)
          case (ArrayType(StringType, _), BytesFeature(vs)) =>
            vs.map(new String(_, "UTF-8"))
          case (dt, ft) => throw new IllegalArgumentException(
            s"TFRecord feature ${f.name} has ${ft.getClass.getSimpleName}, schema wants $dt")
        }
      }
    }
    Row.fromSeq(values.toIndexedSeq)
  }

  // --------------------------------------------------------------- store
  /** Write `df` as `ceil(rows / rowsPerShard)` TFRecord shards under
    * `path` (`part-NNNNN.tfrecord`). Row-count sizing for the same
    * reason as [[JsonlStore.write]]: trainers address work in records,
    * and TFRecord shards are non-splittable streams — one reader task
    * per shard, so even shards give even work units. Each task streams
    * its partition through the Hadoop `FileSystem` of `path` (local FS
    * here, HDFS/object store on a cluster) — rows never collect to the
    * driver.
    */
  def write(df: DataFrame, path: String, rowsPerShard: Long = 100000L): Unit = {
    require(rowsPerShard > 0)
    val n = math.max(1L, (df.count() + rowsPerShard - 1) / rowsPerShard).toInt
    val schema = df.schema
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs0 = dir.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    if (fs0.exists(dir)) fs0.delete(dir, true)
    fs0.mkdirs(dir)
    df.repartition(n).foreachPartition { (rows: Iterator[Row]) =>
      val pid = TaskContext.getPartitionId()
      val shard = new org.apache.hadoop.fs.Path(
        path, f"part-$pid%05d.tfrecord")
      val fs = shard.getFileSystem(new org.apache.hadoop.conf.Configuration())
      val out = fs.create(shard, true)
      try rows.foreach { row =>
        val framed = frame(rowToExample(row, schema))
        out.write(framed, 0, framed.length)
      } finally out.close()
    }
  }

  /** Read a TFRecord directory against an EXPLICIT schema (the
    * [[JsonlStore.read]] contract — a boundary format is read against
    * its contract, not inferred). One task per shard via `binaryFile`;
    * a shard must fit in one task's memory, which is exactly the
    * shard-size discipline [[write]] enforces. Both CRCs verified per
    * record.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val shards = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tfrecord").load(path)
      .select(col("content"))
    val enc = RowEncoder.encoderFor(schema)
    shards.flatMap { r: Row =>
      unframe(r.getAs[Array[Byte]](0))
        .map(rec => exampleToRow(decodeExample(rec), schema))
    }(enc)
  }
}
