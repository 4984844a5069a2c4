package graft.sources

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The object-store commit story, executable: a [[CommitCatalog]]
  * arbitrates version/tag creation while data bytes stay on a
  * substrate that cannot CAS. Covers the contract discrimination rule
  * (false = lost race ONLY; I/O throws), the two-writer race (exactly
  * one winner per version, cross-instance), crash healing (a commit
  * that died between catalog bind and object materialization is never
  * lost), and the full snapshot-store lifecycle over the decorated
  * substrate.
  */
class CommitCatalogSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("FileLockCatalog primitives: one winner, immutable until drop, prefix names, reuse after drop") {
    val cat = new FileLockCatalog(tmp("cat_prim"))
    assert(cat.tryCreate("/s/manifests/v0.json", "a"))
    assert(!cat.tryCreate("/s/manifests/v0.json", "b"),
      "second creator must lose")
    assert(cat.get("/s/manifests/v0.json").contains("a"),
      "the loser must not clobber the winner")
    assert(cat.tryCreate("/s/manifests/v1.json", "c"))
    assert(cat.tryCreate("/s/refs/rel.json", "d"))
    assert(cat.names("/s/manifests/") ==
      Vector("/s/manifests/v0.json", "/s/manifests/v1.json"))
    assert(cat.get("/nope").isEmpty && !cat.drop("/nope"))
    assert(cat.drop("/s/refs/rel.json"))
    assert(cat.tryCreate("/s/refs/rel.json", "e"),
      "a dropped name must be creatable again")
    assert(cat.get("/s/refs/rel.json").contains("e"))
  }

  test("CatalogStoreFs CAS: one winner, no clobber, loser sees winner's content on inner") {
    val catDir = tmp("cat_cas")
    val dir = tmp("cat_cas_data")
    val fs = new CatalogStoreFs(
      new HadoopStoreFs(spark.sparkContext.hadoopConfiguration),
      new FileLockCatalog(catDir))
    fs.mkdirs(s"$dir/m")
    assert(fs.atomicCreateString(s"$dir/m/v1.json", """{"a":1}"""))
    assert(!fs.atomicCreateString(s"$dir/m/v1.json", """{"a":2}"""))
    assert(fs.readString(s"$dir/m/v1.json") == """{"a":1}""")
    assert(fs.list(s"$dir/m") == Vector("v1.json"), "no litter")
    fs.deleteRecursively(dir)
  }

  test("two racing writers through separate catalog instances: exactly one winner per version") {
    val catDir = tmp("cat_race")
    val dataDir = tmp("cat_race_data")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // each writer has its OWN catalog + fs instance over the shared
    // dirs — the serialization under test is the file lock (+ the
    // per-path monitor for same-JVM racers), not a shared object
    def writer(id: String) = Future {
      val fs = new CatalogStoreFs(
        new HadoopStoreFs(spark.sparkContext.hadoopConfiguration),
        new FileLockCatalog(catDir))
      (0 until 40).map(v =>
        v -> fs.atomicCreateString(s"$dataDir/manifests/v$v.json",
          s"""{"v":$v,"by":"$id"}""")).toMap
    }
    val (wa, wb) = (writer("a"), writer("b"))
    val (ra, rb) = (Await.result(wa, 120.seconds),
      Await.result(wb, 120.seconds))
    (0 until 40).foreach { v =>
      assert(ra(v) ^ rb(v), s"version $v needs exactly one winner")
    }
    // the materialized object matches the catalog winner every time
    val fs = new CatalogStoreFs(NioStoreFs, new FileLockCatalog(catDir))
    (0 until 40).foreach { v =>
      val who = if (ra(v)) "a" else "b"
      assert(fs.readString(s"$dataDir/manifests/v$v.json") ==
        s"""{"v":$v,"by":"$who"}""")
    }
  }

  test("a crashed commit heals: catalog-bound content missing on inner is served and re-materialized") {
    val catDir = tmp("cat_heal")
    val dir = tmp("cat_heal_data")
    val inner = NioStoreFs
    val fs = new CatalogStoreFs(inner, new FileLockCatalog(catDir))
    fs.mkdirs(s"$dir/m")
    assert(fs.atomicCreateString(s"$dir/m/v3.json", "committed"))
    // simulate the writer dying between catalog bind and object
    // materialization: remove the object BEHIND the catalog's back
    assert(inner.delete(s"$dir/m/v3.json"))
    assert(fs.exists(s"$dir/m/v3.json"), "the commit of record stands")
    assert(fs.readString(s"$dir/m/v3.json") == "committed")
    assert(inner.exists(s"$dir/m/v3.json"), "read must re-materialize")
    inner.delete(s"$dir/m/v3.json")
    assert(fs.list(s"$dir/m") == Vector("v3.json"),
      "listings must heal missing committed objects")
    assert(inner.exists(s"$dir/m/v3.json"))
    // deletion unbinds both views; the name is then reusable
    assert(fs.delete(s"$dir/m/v3.json"))
    assert(!fs.exists(s"$dir/m/v3.json"))
    assert(fs.atomicCreateString(s"$dir/m/v3.json", "again"))
    fs.deleteRecursively(dir)
  }

  test("catalog I/O failure THROWS from the CAS — never reads as a lost race") {
    val broken = new CommitCatalog {
      def tryCreate(name: String, content: String): Boolean =
        throw new java.io.IOException("catalog unreachable")
      def get(name: String): Option[String] = None
      def drop(name: String): Boolean = false
      def names(prefix: String): Vector[String] = Vector.empty
    }
    val dir = tmp("cat_io")
    val fs = new CatalogStoreFs(NioStoreFs, broken)
    val e = intercept[java.io.IOException](
      fs.atomicCreateString(s"$dir/m/v1.json", "{}"))
    assert(e.getMessage.contains("unreachable"))
    assert(!NioStoreFs.exists(s"$dir/m/v1.json"),
      "a failed CAS must materialize nothing")
  }

  test("snapshot-store lifecycle over CatalogStoreFs: concurrent publishers, tags, vacuum, destroy+reinit") {
    val catDir = tmp("cat_life")
    val root = tmp("cat_life_data") + "/t"
    def storeFor() = new SnapshotStoreOps(new CatalogStoreFs(
      new HadoopStoreFs(spark.sparkContext.hadoopConfiguration),
      new FileLockCatalog(catDir)))
    val store = storeFor()
    store.init(spark,
      (0L until 300L).map(i => (i, s"v$i")).toDF("k", "payload"),
      root, "k") // v0
    store.tag(root, "rel", 0L)
    assertThrows[IllegalArgumentException](store.tag(root, "rel", 0L))
    // two publishers racing the SAME store through separate catalog
    // instances: every append lands exactly once, versions stay
    // strictly sequential (the publish loop rebases on a lost CAS)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    def publisher(base: Long) = Future {
      val s = storeFor()
      (0 until 6).foreach { i =>
        val st = s.stageAppend(spark,
          Seq((base + i, "app")).toDF("k", "payload"), root)
        s.publish(root, st)
      }
    }
    val (p1, p2) = (publisher(10000L), publisher(20000L))
    Await.result(p1, 120.seconds); Await.result(p2, 120.seconds)
    assert(store.versions(root) == (0L to 12L),
      "12 racing appends must land as versions 1..12, no gaps")
    val ks = store.read(spark, root).select("k")
      .collect().map(_.getLong(0)).toSet
    assert(ks == (0L until 300L).toSet ++
      (0 until 6).flatMap(i => Seq(10000L + i, 20000L + i)))
    store.merge(spark, Seq((5L, "upd")).toDF("k", "payload"), root) // v13
    assert(store.readTag(spark, root, "rel").count() == 300)
    // retention: vacuumed manifests unbind from the catalog too
    store.vacuum(root, keepLast = 2)
    assert(store.versions(root) == Seq(0L, 12L, 13L), // v0 tagged
      "vacuum keeps the tagged version and the last two")
    assert(store.read(spark, root)
      .filter(col("k") === 5L && col("payload") === "upd").count() == 1)
    // destroy purges catalog bindings: re-init may reuse v0.json
    store.destroy(root)
    store.init(spark, Seq((1L, "x")).toDF("k", "payload"), root, "k")
    assert(store.read(spark, root).count() == 1)
  }
}
