package graft.sources

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Tar shards are a boundary format: what matters is (a) byte-level
  * ustar conformance so real WebDataset/tar readers accept the shards,
  * (b) schema-true round trips including binary media and NULLs, and
  * (c) loud failure on corruption.
  */
class TarShardStoreSpec extends AnyFunSuite with SparkTest {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).resolve("out").toString

  test("ustar conformance: header fields, checksum, 512 blocking, GNU tar shape") {
    val e = TarShardStore.tarEntry("42.txt", "hello".getBytes("UTF-8"))
    // one header block + one padded data block
    assert(e.length == 1024)
    // name NUL-terminated at offset 0
    assert(new String(e, 0, 6, "UTF-8") == "42.txt" && e(6) == 0)
    // magic "ustar\0" at 257, version "00"
    assert(new String(e, 257, 5, "US-ASCII") == "ustar" && e(262) == 0)
    assert(e(263) == '0' && e(264) == '0')
    // size field: octal 5
    assert(new String(e, 124, 11, "US-ASCII") == "00000000005")
    // typeflag regular file
    assert(e(156) == '0')
    // data at 512, zero-padded to the block end
    assert(new String(e, 512, 5, "UTF-8") == "hello")
    assert((517 until 1024).forall(e(_) == 0))
    // round trip through the parser
    val back = TarShardStore.tarEntries(
      e ++ TarShardStore.terminator).toSeq
    assert(back.map { case (n, tf, b) =>
      (n, tf, new String(b, "UTF-8")) } ==
      Seq(("42.txt", '0'.toByte, "hello")))
  }

  test("a flipped header byte fails the checksum loudly; truncation detected") {
    val e = TarShardStore.tarEntry("7.bin", Array[Byte](1, 2, 3)) ++
      TarShardStore.terminator
    val torn = e.clone(); torn(3) = (torn(3) ^ 0x4).toByte // name byte
    val ex = intercept[IllegalArgumentException] {
      TarShardStore.tarEntries(torn).toSeq
    }
    assert(ex.getMessage.contains("checksum"))
    intercept[IllegalArgumentException] {
      // cut into the data region
      TarShardStore.tarEntries(e.take(600)).toSeq
    }
  }

  test("samples round-trip schema-true incl. binary media, NULLs, hostile text") {
    import spark.implicits._
    val rows = Seq(
      (1L, "päätös\n\ttabs \"quoted\"", Some(Array[Byte](0, -1, 127)), Some(7L), true),
      (2L, "", None: Option[Array[Byte]], None: Option[Long], false),
      (3L, "plain", Some(Array.empty[Byte]), Some(-42L), true)
    ).toDF("doc_id", "text", "media", "score", "flag")
    val dir = tmp("tar_rt")
    TarShardStore.write(rows, dir, keyCol = "doc_id", rowsPerShard = 2)
    val back = TarShardStore.read(spark, dir, rows.schema, keyCol = "doc_id")
      .orderBy("doc_id").collect()
    assert(back.length == 3)
    assert(back(0).getString(1) == "päätös\n\ttabs \"quoted\"")
    assert(back(0).getAs[Array[Byte]](2).toSeq == Seq[Byte](0, -1, 127))
    assert(back(0).getLong(3) == 7L && back(0).getBoolean(4))
    // NULLs come back as NULLs (files omitted from the sample)
    assert(back(1).isNullAt(2) && back(1).isNullAt(3) && !back(1).getBoolean(4))
    assert(back(1).getString(1) == "")
    // empty binary survives distinctly from NULL
    assert(back(2).getAs[Array[Byte]](2).length == 0)
    assert(back(2).getLong(3) == -42L)
  }

  test("shards are row-sized and each is a valid standalone archive") {
    import spark.implicits._
    val rows = (0L until 10L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val dir = tmp("tar_shards")
    TarShardStore.write(rows, dir, keyCol = "doc_id", rowsPerShard = 3)
    val shards = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar")).sortBy(_.getName)
    assert(shards.length == 4) // ceil(10/3)
    val total = shards.map { f =>
      TarShardStore.tarEntries(
        java.nio.file.Files.readAllBytes(f.toPath)).size
    }.sum
    assert(total == 10) // one .text file per row
  }

  test("system tar accepts the shards (real-reader interop)") {
    assume(new java.io.File("/bin/tar").exists ||
      new java.io.File("/usr/bin/tar").exists)
    import spark.implicits._
    val rows = Seq((1L, "hello", 7L), (2L, "wörld", -3L))
      .toDF("doc_id", "text", "cls")
    val dir = tmp("tar_interop")
    TarShardStore.write(rows.coalesce(1), dir, keyCol = "doc_id")
    val shard = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar")).head
    val proc = new ProcessBuilder("tar", "-tf", shard.getAbsolutePath)
      .redirectErrorStream(true).start()
    val out = scala.io.Source.fromInputStream(proc.getInputStream).mkString
    assert(proc.waitFor() == 0, s"system tar rejected the shard: $out")
    assert(out.split("\n").map(_.trim).toSet ==
      Set("1.text", "1.cls", "2.text", "2.cls"))
  }

  test("dotted string keys are refused at write; integral keys unaffected") {
    import spark.implicits._
    val dir = tmp("tar_dotkey")
    val bad = Seq(("a.b", "x")).toDF("k", "text")
    val ex = intercept[Exception] {
      TarShardStore.write(bad, dir, keyCol = "k", rowsPerShard = 10)
    }
    assert(ex.getMessage.contains("reserves the first dot") ||
      Option(ex.getCause).exists(_.getMessage.contains("reserves the first dot")))
    // undotted strings and integral keys round-trip untouched
    val ok = Seq((10L, "ten"), (11L, "eleven")).toDF("doc_id", "text")
    TarShardStore.write(ok, dir, keyCol = "doc_id", rowsPerShard = 10)
    val back = TarShardStore.read(spark, dir, ok.schema, keyCol = "doc_id")
      .orderBy("doc_id").collect()
    assert(back.map(r => r.getLong(0) -> r.getString(1)).toSeq ==
      Seq(10L -> "ten", 11L -> "eleven"))
  }

  test("adjacent duplicate keys and all-NULL rows are refused at write") {
    import spark.implicits._
    val dir = tmp("tar_dup")
    val dup = Seq((1L, "a"), (1L, "b")).toDF("doc_id", "text").coalesce(1)
    val ex = intercept[Exception] {
      TarShardStore.write(dup, dir, keyCol = "doc_id", rowsPerShard = 10)
    }
    assert(ex.getMessage.contains("merge into one sample") ||
      Option(ex.getCause).exists(_.getMessage.contains("merge into one sample")))
    val allNull = Seq((1L, Option.empty[String])).toDF("doc_id", "text")
    val ex2 = intercept[Exception] {
      TarShardStore.write(allNull, dir, keyCol = "doc_id", rowsPerShard = 10)
    }
    assert(ex2.getMessage.contains("vanish") ||
      Option(ex2.getCause).exists(_.getMessage.contains("vanish")))
  }

  test("byte-sized shards: running-size split at sample boundaries, bounded files") {
    import spark.implicits._
    // 1000x-varying samples: tiny captions next to one big blob
    val rows = (0L until 40L).map { i =>
      val body = if (i % 10 == 0) "X" * 20000 else s"t$i"
      (i, body)
    }.toDF("doc_id", "text")
    val dir = tmp("tar_sized")
    TarShardStore.write(rows, dir, keyCol = "doc_id", rowsPerShard = 20,
      bytesPerShard = 8192)
    val shards = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar")).sortBy(_.getName)
    // 2 tasks, each split into multiple sub-shards
    assert(shards.length > 2)
    assert(shards.forall(_.getName.matches("part-\\d{5}-\\d{3}\\.tar")))
    // every shard is bounded unless it holds a single oversized sample
    shards.foreach { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val n = TarShardStore.tarEntries(bytes).size
      assert(f.length <= 8192 + 1024 || n == 1,
        s"${f.getName}: ${f.length} bytes with $n entries")
    }
    // the full content survives the split
    val back = TarShardStore.read(spark, dir, rows.schema, keyCol = "doc_id")
      .orderBy("doc_id").collect()
    assert(back.length == 40)
    assert(back(0).getString(1).length == 20000)
    assert(back(1).getString(1) == "t1")
  }

  /** Re-stamp an entry's typeflag and fix its header checksum — the
    * spec's stand-in for a foreign GNU/bsdtar writer.
    */
  private def withTypeflag(entry: Array[Byte], flag: Char): Array[Byte] = {
    val e = entry.clone()
    e(156) = flag.toByte
    java.util.Arrays.fill(e, 148, 156, ' '.toByte)
    var sum = 0L
    for (i <- 0 until 512) sum += e(i) & 0xff
    val cs = java.lang.Long.toOctalString(sum)
    for (i <- 0 until (6 - cs.length)) e(148 + i) = '0'
    cs.getBytes("US-ASCII").copyToArray(e, 148 + 6 - cs.length)
    e(154) = 0; e(155) = ' '.toByte
    e
  }

  test("foreign shards: pax/global/dir entries skip, leading ./ strips") {
    // a bsdtar-style shard: pax extended header, a './'-prefixed
    // member, a directory entry, a global header — only the two real
    // files must come back, correctly keyed
    val shard =
      withTypeflag(TarShardStore.tarEntry("PaxHeaders.0/5.text",
        "30 mtime=1700000000.123456789\n".getBytes("US-ASCII")), 'x') ++
      TarShardStore.tarEntry("./5.text", "five".getBytes("UTF-8")) ++
      withTypeflag(TarShardStore.tarEntry("somedir/", Array.empty[Byte]), '5') ++
      withTypeflag(TarShardStore.tarEntry("pax_global_header",
        "17 comment=hello\n".getBytes("US-ASCII")), 'g') ++
      TarShardStore.tarEntry("7.text", "seven".getBytes("UTF-8")) ++
      TarShardStore.terminator
    val dir = java.nio.file.Files.createTempDirectory("tar_foreign")
    java.nio.file.Files.write(dir.resolve("part-00000.tar"), shard)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val back = TarShardStore.read(spark, dir.toString, schema, "doc_id")
      .orderBy("doc_id").collect()
    assert(back.map(r => r.getLong(0) -> r.getString(1)).toSeq ==
      Seq(5L -> "five", 7L -> "seven"))
  }

  test("foreign long member names: GNU 'L', pax 'x' path, and ustar prefix all read back full") {
    assume(new java.io.File("/bin/tar").exists ||
      new java.io.File("/usr/bin/tar").exists)
    // >100-byte member names arrive via three foreign encodings —
    // each must reassemble under its FULL name (a truncated key is
    // silent sample corruption)
    for (fmt <- Seq("gnu", "posix", "ustar")) {
      val work = java.nio.file.Files.createTempDirectory(s"tar_long_$fmt")
      val (fname, expectKey) = fmt match {
        case "ustar" => // needs a '/' to split into prefix + name
          val d = "d" * 120
          java.nio.file.Files.createDirectories(work.resolve(d))
          (s"$d/5.text", s"$d/5")
        case _ => // flat 124-char basename: gnu → 'L', posix → pax path
          val k = "k" * 120 + fmt.take(3)
          (s"$k.text", "k" * 120 + fmt.take(3))
      }
      java.nio.file.Files.write(work.resolve(fname),
        s"payload-$fmt".getBytes("UTF-8"))
      val shardDir = java.nio.file.Files.createTempDirectory(s"tar_longs_$fmt")
      val proc = new ProcessBuilder("tar", s"--format=$fmt", "-cf",
        shardDir.resolve("part-00000.tar").toString, "-C", work.toString,
        fname).redirectErrorStream(true).start()
      val out = scala.io.Source.fromInputStream(proc.getInputStream).mkString
      assert(proc.waitFor() == 0, s"tar --format=$fmt failed: $out")
      val schema = StructType(Seq(StructField("k", StringType),
        StructField("text", StringType)))
      val back = TarShardStore.read(spark, shardDir.toString, schema, "k")
        .collect()
      assert(back.map(r => r.getString(0) -> r.getString(1)).toSeq ==
        Seq(expectKey -> s"payload-$fmt"),
        s"format $fmt mis-keyed the long-named sample")
    }
  }

  test("deterministic bytes: same rows produce identical shard content") {
    import spark.implicits._
    val rows = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text").coalesce(1)
    val d1 = tmp("tar_det1"); val d2 = tmp("tar_det2")
    TarShardStore.write(rows, d1, keyCol = "doc_id")
    TarShardStore.write(rows, d2, keyCol = "doc_id")
    def bytes(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".tar")).sortBy(_.getName)
      .flatMap(f => java.nio.file.Files.readAllBytes(f.toPath).toSeq)
    assert(bytes(d1).toSeq == bytes(d2).toSeq)
  }
}
