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
    assert(back.map { case (n, b) => (n, new String(b, "UTF-8")) } ==
      Seq(("42.txt", "hello")))
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
