package graft.sources

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The [[StoreFs]] seam: the SAME store code must run over the
  * default java.nio substrate and over an
  * `org.apache.hadoop.fs.FileSystem` — the local-path behavior every
  * gate pins is one impl, a cluster filesystem (HDFS) is the other,
  * and the seam is what a 100 TB deployment swaps in (plus a catalog
  * CAS for object stores — see the [[StoreFs]] scaladoc).
  */
class StoreFsSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def cas(fs: StoreFs, tag: String): Unit = {
    val dir = java.nio.file.Files.createTempDirectory(s"storefs_$tag").toString
    fs.mkdirs(s"$dir/m")
    assert(fs.atomicCreateString(s"$dir/m/v1.json", """{"a":1}"""),
      "first creator must win the CAS")
    assert(!fs.atomicCreateString(s"$dir/m/v1.json", """{"a":2}"""),
      "second creator must lose the CAS")
    assert(fs.readString(s"$dir/m/v1.json") == """{"a":1}""",
      "the loser must not clobber the winner's content")
    // no tmp litter from either attempt
    assert(fs.list(s"$dir/m") == Vector("v1.json"))
    fs.deleteRecursively(dir)
  }

  test("atomicCreateString CAS: one winner, no clobber, no litter (both substrates)") {
    cas(NioStoreFs, "nio")
    cas(new HadoopStoreFs(spark.sparkContext.hadoopConfiguration,
      singleWriterCas = true), "hadoop")
  }

  test("Hadoop CAS on a replacing-rename scheme refuses without the single-writer declaration") {
    // file://'s rename replaces an existing destination, so the
    // precheck+rename fallback can silently lose a racing committer's
    // version — misuse must fail loudly at the FIRST commit, not
    // corrupt under load. Non-CAS primitives stay usable unflagged.
    val fs = new HadoopStoreFs(spark.sparkContext.hadoopConfiguration)
    val dir = java.nio.file.Files.createTempDirectory("storefs_guard").toString
    fs.mkdirs(s"$dir/m")
    fs.writeString(s"$dir/m/plain.txt", "ok") // non-CAS write: fine
    assert(fs.readString(s"$dir/m/plain.txt") == "ok")
    val e = intercept[IllegalStateException](
      fs.atomicCreateString(s"$dir/m/v1.json", "{}"))
    assert(e.getMessage.contains("singleWriterCas"))
    assert(!fs.exists(s"$dir/m/v1.json"), "refusal must write nothing")
    fs.deleteRecursively(dir)
  }

  test("primitive parity: list names sorted, move, mtime, delete on both substrates") {
    Seq[(String, StoreFs)](
      "nio" -> NioStoreFs,
      "hadoop" -> new HadoopStoreFs(spark.sparkContext.hadoopConfiguration)
    ).foreach { case (tag, fs) =>
      val dir = java.nio.file.Files.createTempDirectory(s"storefs_p_$tag").toString
      fs.mkdirs(s"$dir/d")
      fs.writeString(s"$dir/d/b.txt", "b")
      fs.writeString(s"$dir/d/a.txt", "a")
      assert(fs.list(s"$dir/d") == Vector("a.txt", "b.txt"), tag)
      assert(fs.isDir(s"$dir/d") && !fs.isFile(s"$dir/d"), tag)
      assert(fs.isFile(s"$dir/d/a.txt"), tag)
      fs.move(s"$dir/d/a.txt", s"$dir/d/c.txt")
      assert(fs.readString(s"$dir/d/c.txt") == "a", tag)
      assert(!fs.exists(s"$dir/d/a.txt"), tag)
      assert(math.abs(fs.mtimeMs(s"$dir/d/c.txt") -
        System.currentTimeMillis()) < 600000L, tag)
      assert(fs.delete(s"$dir/d/b.txt") && !fs.delete(s"$dir/d/b.txt"), tag)
      fs.deleteRecursively(dir)
      assert(!fs.exists(s"$dir/d"), tag)
    }
  }

  test("snapshot-store lifecycle over HadoopStoreFs(file://): commits, WAP, tags, MOR, vacuum") {
    val store = new SnapshotStoreOps(
      new HadoopStoreFs(spark.sparkContext.hadoopConfiguration,
        singleWriterCas = true))
    val root =
      java.nio.file.Files.createTempDirectory("snapstore_hfs").toString + "/t"
    store.init(spark,
      (0L until 200L).map(i => (i, s"v$i")).toDF("k", "payload"), root, "k") // v0
    store.tag(root, "rel", 0L)
    assertThrows[IllegalArgumentException](store.tag(root, "rel", 0L))
    store.append(spark,
      (1000L until 1050L).map(i => (i, "app")).toDF("k", "payload"), root) // v1
    store.merge(spark,
      Seq((5L, "upd"), (2000L, "new")).toDF("k", "payload"), root) // v2
    store.deleteKeys(spark, Seq(7L, 9L).toDF("k"), root) // v3 (MOR)
    val cur = store.read(spark, root)
    assert(cur.count() == 249) // 200 + 50 + 1 - 2
    assert(cur.filter(col("k") === 5L && col("payload") === "upd").count() == 1)
    assert(cur.filter(col("k").isin(7L, 9L)).count() == 0)
    // time travel + tag read over the Hadoop substrate
    assert(store.readAsOf(spark, root, 0L).count() == 200)
    assert(store.readTag(spark, root, "rel")
      .filter(col("payload") === "upd").count() == 0)
    // WAP through the seam: stage, audit, publish (file moves + CAS)
    val st = store.stageAppend(spark,
      Seq((3000L, "wap")).toDF("k", "payload"), root)
    assert(store.readStaged(spark, root, st).count() == 250)
    store.publish(root, st) // v4
    assert(store.read(spark, root).filter(col("k") === 3000L).count() == 1)
    // metadata-bounded count + key-range scan
    assert(store.countKeyRange(spark, root, 1000L, 1049L)._1 == 50L)
    // materialize deletes, compact, vacuum with AGED orphans
    store.applyDeletes(spark, root) // v5
    store.compact(spark, root, smallRows = 1000000L,
      targetRows = 1000000L) // v6: everything rewrites
    val dataDir = java.nio.file.Paths.get(root, "data")
    import scala.jdk.CollectionConverters._
    scala.util.Using.resource(java.nio.file.Files.list(dataDir))(
      _.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
        .foreach(p => java.nio.file.Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(
            System.currentTimeMillis() - 7200000L))))
    val (mDropped, fDropped) = store.vacuum(root, keepLast = 1)
    assert(mDropped == 5) // v1..v5 dropped, v0 tagged, v6 head
    assert(fDropped > 0, "aged unreferenced data files must collect")
    assert(store.versions(root) == Seq(0L, 6L))
    assert(store.read(spark, root).count() == 250)
    assert(store.readTag(spark, root, "rel").count() == 200)
    store.destroy(root)
  }
}
