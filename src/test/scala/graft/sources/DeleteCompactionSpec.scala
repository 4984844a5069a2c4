package graft.sources

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Equality-delete-file compaction: merge an update-heavy table's
  * per-task-per-statement delete files into few sorted files with
  * ZERO data-file I/O. Safety is the seq-promotion rule — a merged
  * entry re-stamps at its group's max seq only when no live
  * overlapping file sits in the promoted interval; entries a later
  * statement's new rows interleave with stay separate, so reads are
  * row-identical before and after by construction (and checked).
  */
class DeleteCompactionSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"delcomp_$tag").toString + "/t"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private val base =
    (0L until 400L).map(i => (i, i * 3L, s"v$i")).toDF("k", "n", "p")

  test("same-seq per-task delete files merge to one; dangling entries drop; reads identical") {
    val root = freshRoot("merge")
    SnapshotStore.init(spark, base, root, "k", filesPerCommit = 8) // v0
    // several deleteKeys batches — one delete FILE each, different seqs,
    // but NO interleaving data commits: all promote to the last seq
    SnapshotStore.deleteKeys(spark, Seq(3L, 77L).toDF("k"), root) // v1
    SnapshotStore.deleteKeys(spark, Seq(150L, 250L).toDF("k"), root) // v2
    SnapshotStore.deleteKeys(spark, Seq(399L).toDF("k"), root) // v3
    val before = SnapshotStore.currentManifest(root)
    assert(before.deletes.size == 3)
    val expect = rows(SnapshotStore.read(spark, root))
    val dataBefore = before.files.map(_.path).sorted
    val m = SnapshotStore.compactDeletes(spark, root) // v4
    assert(m.deletes.size == 1, s"expected 1 merged entry, got ${m.deletes}")
    assert(m.files.map(_.path).sorted == dataBefore,
      "delete compaction must touch ZERO data files")
    assert(rows(SnapshotStore.read(spark, root)) == expect,
      "reads must be row-identical across delete compaction")
    // time travel still sees the uncompacted shape
    assert(SnapshotStore.manifestAsOf(root, 3L).deletes.size == 3)
    // idempotent no-op second run: no new version
    assert(SnapshotStore.compactDeletes(spark, root).version == m.version)
  }

  test("an interleaved overlapping data commit blocks cross-seq promotion") {
    val root = freshRoot("safe")
    SnapshotStore.init(spark, base, root, "k", filesPerCommit = 4) // v0
    SnapshotStore.deleteKeys(spark, Seq(10L).toDF("k"), root) // v1: d1
    // key 10 REAPPEARS via an append between the two deletes — d1
    // must never promote past this file or the new row vanishes
    SnapshotStore.append(spark, Seq((10L, 999L, "reborn")).toDF("k", "n", "p"),
      root) // v2
    SnapshotStore.deleteKeys(spark, Seq(200L).toDF("k"), root) // v3: d2
    val expect = rows(SnapshotStore.read(spark, root))
    assert(expect.exists(_.head == 10L), "fixture: key 10 must be live")
    val m = SnapshotStore.compactDeletes(spark, root)
    assert(m.deletes.size == 2,
      "entries straddling an overlapping data commit must stay separate")
    assert(rows(SnapshotStore.read(spark, root)) == expect)
    // non-overlapping interleaved file does NOT block: delete far
    // range, append far-away keys, delete again — all merge
    val root2 = freshRoot("safe2")
    SnapshotStore.init(spark, base, root2, "k", filesPerCommit = 4) // v0
    SnapshotStore.deleteKeys(spark, Seq(5L).toDF("k"), root2) // v1
    SnapshotStore.append(spark,
      Seq((900000L, 1L, "far")).toDF("k", "n", "p"), root2) // v2: disjoint
    SnapshotStore.deleteKeys(spark, Seq(6L).toDF("k"), root2) // v3
    val expect2 = rows(SnapshotStore.read(spark, root2))
    val m2 = SnapshotStore.compactDeletes(spark, root2)
    assert(m2.deletes.size == 1,
      "a disjoint interleaved file must not block the merge")
    assert(rows(SnapshotStore.read(spark, root2)) == expect2)
  }

  test("MOR update chain: per-statement files compact, SQL CALL surface, old files vacuumable") {
    val wh = java.nio.file.Files.createTempDirectory("delcomp_wh").toString
    spark.conf.set("spark.sql.catalog.dccat", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.dccat.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS dccat.db")
      base.writeTo("dccat.db.t").tableProperty("key", "k")
        .tableProperty("update.mode", "merge-on-read").create()
      val root = s"$wh/db/t"
      // a sparse MOR update (its delete's ceiling is its OWN new-rows
      // seq — that entry can never promote) followed by two key-erase
      // batches (no interleaving data → they merge with each other)
      spark.sql("UPDATE dccat.db.t SET n = n + 1 WHERE k BETWEEN 0 AND 49")
      SnapshotStore.deleteKeys(spark, Seq(310L, 311L).toDF("k"), root)
      SnapshotStore.deleteKeys(spark, Seq(350L).toDF("k"), root)
      val before = SnapshotStore.currentManifest(root)
      assert(before.deletes.nonEmpty)
      val expectRows = rows(SnapshotStore.read(spark, root))
      val res = spark.sql("CALL dccat.system.compact_deletes(" +
        "`table` => 'db.t')").collect()
      val after = SnapshotStore.currentManifest(root)
      assert(res.head.getLong(1) == after.deletes.size.toLong)
      assert(after.deletes.size <= before.deletes.size)
      assert(after.files.map(_.path).sorted ==
        before.files.map(_.path).sorted)
      assert(rows(SnapshotStore.read(spark, root)) == expectRows)
      // the superseded delete files are unreferenced → vacuum fodder
      val referenced = after.deletes.map(_.path).toSet
      val onDisk = new java.io.File(s"$root/deletes").list().toSeq
        .map(n => s"deletes/$n").toSet
      assert(referenced.subsetOf(onDisk))
    } finally spark.conf.unset("spark.sql.catalog.dccat")
  }
}
