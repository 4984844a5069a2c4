package graft.sources

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import java.io.ByteArrayOutputStream

/** WebDataset-style tar shard interchange — the boundary format
  * multimodal training loaders overwhelmingly consume (the public
  * WebDataset convention: a POSIX tar archive per shard; one SAMPLE is
  * the run of ADJACENT files sharing a basename key, one file per
  * modality/column, extension = field name — `1234.txt`, `1234.json`,
  * `1234.jpg` … — readable at sequential-I/O speed with zero index).
  *
  * The container is plain USTAR (POSIX 1003.1-1988 `pax`-less tar),
  * implemented from the public header layout, dependency-free:
  * 512-byte header (name[100] mode[8] uid[8] gid[8] size[12 octal]
  * mtime[12 octal] chksum[8] typeflag[1] … magic "ustar\0" "00"),
  * checksum = Σ header bytes with the chksum field read as spaces,
  * data padded to 512, archive terminated by two zero blocks. Headers
  * are written with fixed mode/uid/gid/mtime so shard bytes are a
  * DETERMINISTIC function of the rows — byte-identical re-runs, which
  * is what makes a release artifact diffable.
  *
  * Column mapping (both directions): BINARY ↔ raw bytes, STRING ↔
  * UTF-8, integral/BOOLEAN ↔ ASCII decimal (the WebDataset `.cls`
  * convention), FLOAT/DOUBLE ↔ shortest-decimal text (Java rendering
  * round-trips bit-exactly). NULL ↔ the file is omitted from the
  * sample. The key column renders as the basename; any key whose
  * rendering would overflow the 100-byte ustar name field is refused.
  *
  * Scale shape: identical to [[TfRecordStore]] — shards are sized in
  * ROWS (trainers address work in samples; tars are non-splittable
  * streams, so even shards give even reader tasks), each write task
  * streams its partition through the Hadoop FileSystem (local here,
  * HDFS/object store on a cluster), nothing collects to the driver,
  * and reading is one task per shard via `binaryFile`.
  */
object TarShardStore {

  private val Block = 512

  // --------------------------------------------------------------- ustar
  private def octal(v: Long, width: Int): Array[Byte] = {
    require(v >= 0, s"tar numeric field must be non-negative: $v")
    val s = java.lang.Long.toOctalString(v)
    require(s.length <= width - 1, s"value $v overflows a $width-byte tar field")
    val out = new Array[Byte](width)
    val pad = width - 1 - s.length
    var i = 0
    while (i < pad) { out(i) = '0'; i += 1 }
    s.getBytes("US-ASCII").copyToArray(out, pad)
    out(width - 1) = 0 // trailing NUL
    out
  }

  /** One ustar header + data + zero padding for a regular file. */
  private[sources] def tarEntry(name: String, data: Array[Byte]): Array[Byte] = {
    val nameB = name.getBytes("UTF-8")
    require(nameB.length <= 100,
      s"tar entry name exceeds the 100-byte ustar field: $name")
    val h = new Array[Byte](Block)
    nameB.copyToArray(h, 0)                       // name[100]
    octal(420L, 8).copyToArray(h, 100)            // mode 0644
    octal(0L, 8).copyToArray(h, 108)              // uid
    octal(0L, 8).copyToArray(h, 116)              // gid
    octal(data.length.toLong, 12).copyToArray(h, 124) // size
    octal(0L, 12).copyToArray(h, 136)             // mtime (deterministic)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum as spaces
    h(156) = '0'                                  // typeflag: regular file
    "ustar".getBytes("US-ASCII").copyToArray(h, 257) // magic (NUL from init)
    h(263) = '0'; h(264) = '0'                    // version "00"
    var sum = 0L
    var i = 0
    while (i < Block) { sum += h(i) & 0xff; i += 1 }
    // chksum: 6 octal digits, NUL, space (the historical format)
    val cs = java.lang.Long.toOctalString(sum)
    val csPad = 6 - cs.length
    i = 0
    while (i < csPad) { h(148 + i) = '0'; i += 1 }
    cs.getBytes("US-ASCII").copyToArray(h, 148 + csPad)
    h(154) = 0; h(155) = ' '
    val padded = (data.length + Block - 1) / Block * Block
    val out = new Array[Byte](Block + padded)
    h.copyToArray(out, 0)
    data.copyToArray(out, Block)
    out
  }

  private[sources] def terminator: Array[Byte] = new Array[Byte](2 * Block)

  /** Parse a tar shard into (name, typeflag, bytes) entries, verifying
    * every header checksum — a torn or bit-flipped shard fails loudly,
    * never as silent sample corruption fed to a trainer. The typeflag
    * rides along so the sample reassembly can SKIP non-file entries a
    * foreign GNU/bsdtar writer emits (pax extended headers 'x'/'g',
    * directories '5', GNU longname 'L') instead of parsing them as
    * samples.
    */
  private[sources] def tarEntries(shard: Array[Byte]): Iterator[(String, Byte, Array[Byte])] =
    new Iterator[(String, Byte, Array[Byte])] {
      private var pos = 0
      private def atTerminator: Boolean = {
        // a valid archive ends with two zero blocks — running out of
        // bytes WITHOUT them is a truncated shard, reported loudly
        require(pos + Block <= shard.length,
          s"truncated tar archive at $pos (no terminator)")
        var i = 0
        while (i < Block) {
          if (shard(pos + i) != 0) return false
          i += 1
        }
        true
      }
      def hasNext: Boolean = !atTerminator
      def next(): (String, Byte, Array[Byte]) = {
        require(pos + Block <= shard.length, s"truncated tar header at $pos")
        var stored = 0L
        var sum = 0L
        var i = 0
        while (i < Block) {
          val b = shard(pos + i) & 0xff
          sum += (if (i >= 148 && i < 156) ' '.toInt else b)
          i += 1
        }
        val csStr = new String(shard, pos + 148, 8, "US-ASCII")
          .takeWhile(c => c >= '0' && c <= '7')
        require(csStr.nonEmpty, s"tar header checksum unparsable at $pos")
        stored = java.lang.Long.parseLong(csStr, 8)
        require(stored == sum,
          s"tar header checksum mismatch at $pos: stored $stored, computed $sum")
        var nameEnd = 0
        while (nameEnd < 100 && shard(pos + nameEnd) != 0) nameEnd += 1
        val base = new String(shard, pos, nameEnd, "UTF-8")
        // ustar PREFIX field (offset 345, 155 bytes): foreign writers
        // split >100-byte member names as prefix + "/" + name — read
        // it back or the sample silently mis-keys under the tail
        var pfxEnd = 0
        while (pfxEnd < 155 && shard(pos + 345 + pfxEnd) != 0) pfxEnd += 1
        val magic = new String(shard, pos + 257, 5, "US-ASCII")
        val name =
          if (magic == "ustar" && pfxEnd > 0)
            new String(shard, pos + 345, pfxEnd, "UTF-8") + "/" + base
          else base
        val sizeStr = new String(shard, pos + 124, 12, "US-ASCII")
          .takeWhile(c => c >= '0' && c <= '7')
        val size = java.lang.Long.parseLong(sizeStr, 8).toInt
        val dataOff = pos + Block
        require(dataOff + size <= shard.length,
          s"truncated tar data at $pos (size=$size)")
        val data = java.util.Arrays.copyOfRange(shard, dataOff, dataOff + size)
        pos = dataOff + (size + Block - 1) / Block * Block
        (name, shard(dataOff - Block + 156), data)
      }
    }

  // ---------------------------------------------------------- row <-> files
  private def fieldToBytes(row: Row, i: Int, dt: DataType): Array[Byte] =
    dt match {
      case BinaryType => row.getAs[Array[Byte]](i)
      case StringType => row.getString(i).getBytes("UTF-8")
      case LongType => row.getLong(i).toString.getBytes("US-ASCII")
      case IntegerType => row.getInt(i).toString.getBytes("US-ASCII")
      case ShortType => row.getShort(i).toString.getBytes("US-ASCII")
      case BooleanType =>
        (if (row.getBoolean(i)) "1" else "0").getBytes("US-ASCII")
      case DoubleType => row.getDouble(i).toString.getBytes("US-ASCII")
      case FloatType => row.getFloat(i).toString.getBytes("US-ASCII")
      case dt => throw new IllegalArgumentException(
        s"tar-shard mapping undefined for $dt")
    }

  private def bytesToField(b: Array[Byte], dt: DataType): Any = dt match {
    case BinaryType => b
    case StringType => new String(b, "UTF-8")
    case LongType => new String(b, "US-ASCII").toLong
    case IntegerType => new String(b, "US-ASCII").toInt
    case ShortType => new String(b, "US-ASCII").toShort
    case BooleanType => new String(b, "US-ASCII") == "1"
    case DoubleType => new String(b, "US-ASCII").toDouble
    case FloatType => new String(b, "US-ASCII").toFloat
    case dt => throw new IllegalArgumentException(
      s"tar-shard mapping undefined for $dt")
  }

  private def keyString(row: Row, i: Int, dt: DataType): String = dt match {
    case StringType => row.getString(i)
    case LongType => row.getLong(i).toString
    case IntegerType => row.getInt(i).toString
    case dt => throw new IllegalArgumentException(
      s"tar-shard key must be string or integral, got $dt")
  }

  private def keyValue(s: String, dt: DataType): Any = dt match {
    case StringType => s
    case LongType => s.toLong
    case IntegerType => s.toInt
    case dt => throw new IllegalArgumentException(
      s"tar-shard key must be string or integral, got $dt")
  }

  // --------------------------------------------------------------- store
  /** Write `df` as WebDataset tar shards under `path`: per row, one
    * `<key>.<column>` file per non-null column, files of one sample
    * adjacent. `ceil(rows / rowsPerShard)` write tasks; with
    * `bytesPerShard = 0` each task emits ONE `part-NNNNN.tar`
    * (row-sized shards). `bytesPerShard > 0` is the BYTE-sized mode:
    * each task running-size-splits its stream into
    * `part-NNNNN-SSS.tar` files at sample boundaries whenever the
    * next sample would push the current shard past the bound —
    * multimodal rows vary by 1000× (a JPEG next to a caption), and
    * shard BYTES are what bound the `binaryFile` read memory and the
    * trainer's I/O balance, so row-sized shards go wildly uneven
    * there. A single sample larger than the bound gets a shard of its
    * own (samples never split); every other shard stays ≤
    * `bytesPerShard` + the 1 KiB terminator. The layout stays a
    * deterministic function of the rows in both modes.
    *
    * Refused at write time, loudly — each of these round-trips as
    * SILENT corruption otherwise:
    *   - a string key containing '.' (the WebDataset convention
    *     reserves the first dot for the key/field split; `a.b` would
    *     read back as key `a`, field `b.<col>`);
    *   - adjacent rows with the same key (their files would merge
    *     into ONE sample on read — rows lost);
    *   - a row whose non-key columns are all NULL (it writes zero
    *     entries and vanishes from the round trip).
    */
  def write(df: DataFrame, path: String, keyCol: String = "doc_id",
            rowsPerShard: Long = 10000L, bytesPerShard: Long = 0L): Unit = {
    require(rowsPerShard > 0)
    require(bytesPerShard >= 0)
    val schema = df.schema
    val keyIdx = schema.fieldIndex(keyCol)
    val n = math.max(1L, (df.count() + rowsPerShard - 1) / rowsPerShard).toInt
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs0 = dir.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    if (fs0.exists(dir)) fs0.delete(dir, true)
    fs0.mkdirs(dir)
    df.repartition(n).foreachPartition { (rows: Iterator[Row]) =>
      val pid = TaskContext.getPartitionId()
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(new org.apache.hadoop.conf.Configuration())
      var sub = 0
      var out: org.apache.hadoop.fs.FSDataOutputStream = null
      var written = 0L
      def open(): Unit = {
        val name =
          if (bytesPerShard > 0) f"part-$pid%05d-$sub%03d.tar"
          else f"part-$pid%05d.tar"
        out = fs.create(new org.apache.hadoop.fs.Path(path, name), true)
        written = 0L
      }
      def close(): Unit = if (out != null) {
        val t = terminator
        out.write(t, 0, t.length)
        out.close()
        out = null
      }
      open()
      try {
        var prevKey: String = null
        rows.foreach { row =>
          val key = keyString(row, keyIdx, schema(keyIdx).dataType)
          require(!key.contains('.'),
            s"tar-shard key '$key' contains '.' — the WebDataset name " +
              "convention reserves the first dot for the key/field split; " +
              "it would read back mis-keyed. Rename or escape the key.")
          require(key != prevKey,
            s"adjacent rows share tar-shard key '$key' — their files " +
              "would merge into one sample on read (rows silently lost); " +
              "deduplicate or re-key the batch.")
          prevKey = key
          val entries = schema.fields.zipWithIndex.flatMap { case (f, i) =>
            if (i != keyIdx && !row.isNullAt(i))
              Some(tarEntry(s"$key.${f.name}", fieldToBytes(row, i, f.dataType)))
            else None
          }
          require(entries.nonEmpty,
            s"tar-shard row '$key' has every non-key column NULL — it " +
              "would write zero entries and vanish from the round trip; " +
              "filter such rows or carry a non-null marker column.")
          val sampleBytes = entries.iterator.map(_.length.toLong).sum
          if (bytesPerShard > 0 && written > 0 &&
              written + sampleBytes > bytesPerShard) {
            close(); sub += 1; open()
          }
          entries.foreach(e => out.write(e, 0, e.length))
          written += sampleBytes
        }
        close() // success path: terminator then close
      } finally if (out != null) {
        // error path: close WITHOUT the terminator — the torn shard
        // then fails the reader's truncation check loudly instead of
        // parsing as a complete archive
        out.close()
        out = null
      }
    }
  }

  /** Read a tar-shard directory against an EXPLICIT schema (the
    * boundary-format contract of [[JsonlStore.read]]): `keyCol` comes
    * from the sample basename, every other schema field from the
    * matching `<key>.<field>` file; samples are the runs of adjacent
    * same-key entries, so reassembly is a sequential scan — no sort,
    * no shuffle. One task per shard; header checksums verified.
    */
  def read(spark: SparkSession, path: String, schema: StructType,
           keyCol: String = "doc_id"): DataFrame = {
    val keyIdx = schema.fieldIndex(keyCol)
    val shards = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tar").load(path)
      .select(col("content"))
    val enc = RowEncoder.encoderFor(schema)
    shards.flatMap(r => shardRows(r.getAs[Array[Byte]](0), schema, keyIdx))(enc)
  }

  /** Streaming twin of [[read]]: tar shards LANDING in a directory
    * become an unbounded stream of samples — the continuous
    * multimodal-ingest shape (a crawler drops WebDataset shards, the
    * pipeline consumes them as they arrive). Same parser, same
    * checksum discipline, one task per arriving shard.
    */
  def readStream(spark: SparkSession, path: String, schema: StructType,
                 keyCol: String = "doc_id"): DataFrame = {
    val keyIdx = schema.fieldIndex(keyCol)
    val binSchema = StructType(Seq(
      StructField("path", StringType), StructField("modificationTime", TimestampType),
      StructField("length", LongType), StructField("content", BinaryType)))
    val shards = spark.readStream.format("binaryFile")
      .option("pathGlobFilter", "*.tar").schema(binSchema).load(path)
      .select(col("content"))
    val enc = RowEncoder.encoderFor(schema)
    shards.flatMap(r => shardRows(r.getAs[Array[Byte]](0), schema, keyIdx))(enc)
  }

  /** Samples of one shard as schema rows: adjacent same-key entries
    * group into one row (shared by the batch and streaming readers).
    *
    * Foreign-writer interop: only REGULAR-file entries (typeflag '0'
    * or the historical NUL) participate — GNU/bsdtar shards carry pax
    * extended headers ('x'/'g'), directory entries ('5') and GNU
    * longnames ('L') that are metadata, not samples, and would
    * otherwise corrupt keys silently. Member names >100 bytes are
    * honored through ALL THREE foreign encodings: the pax `path`
    * record ('x' — applies to the next file), the GNU longname
    * payload ('L'), and the ustar prefix field (read in
    * [[tarEntries]]) — a long-keyed foreign sample must read back
    * under its full name, never a silent truncation. A leading `./`
    * (bsdtar's member-name prefix) strips before the key/field
    * split, and the split dots on the BASENAME (first '.' after the
    * last '/'), the WebDataset convention for path-shaped names.
    */
  private def shardRows(content: Array[Byte], schema: StructType,
                        keyIdx: Int): Iterator[Row] = {
    // pax extended header: records of "NNN key=value\n" (NNN = record
    // byte length incl. itself); the `path` value overrides the next
    // file's name. Byte-level parse — values may be multi-byte UTF-8.
    def paxPath(data: Array[Byte]): Option[String] = {
      var i = 0
      var res: Option[String] = None
      while (i < data.length) {
        var j = i
        while (j < data.length && data(j) != ' '.toByte) j += 1
        if (j >= data.length) return res
        val len =
          try new String(data, i, j - i, "US-ASCII").trim.toInt
          catch { case _: NumberFormatException => return res }
        if (len <= 0 || i + len > data.length) return res
        val rec = new String(data, j + 1, i + len - j - 2, "UTF-8")
        val eq = rec.indexOf('=')
        if (eq > 0 && rec.substring(0, eq) == "path")
          res = Some(rec.substring(eq + 1))
        i += len
      }
      res
    }
    val raw = tarEntries(content)
    val entries = new Iterator[(String, Array[Byte])] {
      private var overrideName: Option[String] = None
      private var queued: Option[(String, Array[Byte])] = None
      private def advance(): Unit =
        while (queued.isEmpty && raw.hasNext) {
          val (n, tf, b) = raw.next()
          if (tf == 'L'.toByte) { // GNU longname: NUL-terminated payload
            var e = 0
            while (e < b.length && b(e) != 0) e += 1
            overrideName = Some(new String(b, 0, e, "UTF-8"))
          } else if (tf == 'x'.toByte) {
            paxPath(b).foreach(p => overrideName = Some(p))
          } else if (tf == '0'.toByte || tf == 0.toByte) {
            val full = overrideName.getOrElse(n)
            overrideName = None
            queued = Some(
              (if (full.startsWith("./")) full.substring(2) else full, b))
          } else overrideName = None // dirs etc. consume their override
        }
      def hasNext: Boolean = { advance(); queued.isDefined }
      def next(): (String, Array[Byte]) = {
        advance(); val q = queued.get; queued = None; q
      }
    }
    new Iterator[Row] {
      private var pending: Option[(String, String, Array[Byte])] = None
      private def splitName(n: String): (String, String) = {
        val dot = n.indexOf('.', n.lastIndexOf('/') + 1)
        require(dot > n.lastIndexOf('/') && dot > 0,
          s"tar entry name without <key>.<field> shape: $n")
        (n.substring(0, dot), n.substring(dot + 1))
      }
      private def buildRow(key: String,
          files: Map[String, Array[Byte]]): Row = {
        val values = schema.fields.zipWithIndex.map { case (f, i) =>
          if (i == keyIdx) keyValue(key, f.dataType)
          else files.get(f.name).map(bytesToField(_, f.dataType)).orNull
        }
        Row.fromSeq(values.toIndexedSeq)
      }
      def hasNext: Boolean = pending.isDefined || entries.hasNext
      def next(): Row = {
        val first = pending.getOrElse {
          val (n, b) = entries.next()
          val (k, f) = splitName(n)
          (k, f, b)
        }
        pending = None
        val key = first._1
        var files = Map(first._2 -> first._3)
        var done = false
        while (!done && entries.hasNext) {
          val (n, b) = entries.next()
          val (k, f) = splitName(n)
          if (k == key) files += (f -> b)
          else { pending = Some((k, f, b)); done = true }
        }
        buildRow(key, files)
      }
    }
  }
}
