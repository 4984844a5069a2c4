package graft.sources

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Branch refs: movable named refs with their own version-file
  * namespace (`manifests/branch-<name>/`) over the shared segment and
  * data pools. Branch commits never perturb main; fast-forward
  * publish is a metadata-only commit carrying the branch head's exact
  * entries; divergence refuses; vacuum retains branch-referenced
  * files.
  */
class SnapshotBranchSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"snapbr_$tag").toString + "/t"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private val base =
    (0L until 200L).map(i => (i, i * 3L, s"v$i")).toDF("k", "n", "p")

  test("branch commits leave main untouched; fast-forward is metadata-only") {
    val root = freshRoot("wap")
    SnapshotStore.init(spark, base, root, "k", filesPerCommit = 4) // v0
    val mainBefore = SnapshotStore.currentManifest(root)
    SnapshotStore.createBranch(root, "audit")
    val b1 = (1000L until 1050L).map(i => (i, i, "b1")).toDF("k", "n", "p")
    val b2 = (2000L until 2050L).map(i => (i, i, "b2")).toDF("k", "n", "p")
    b1.write.format("graft-snapshot").option("branch", "audit")
      .option("filesPerCommit", 2).mode("append").save(root) // branch v1
    b2.write.format("graft-snapshot").option("branch", "audit")
      .option("filesPerCommit", 2).mode("append").save(root) // branch v2
    // MAIN never moved — not even a version number
    assert(SnapshotStore.currentManifest(root) == mainBefore)
    assert(SnapshotStore.versions(root) == Seq(0L))
    assert(SnapshotStore.branches(root) == Map("audit" -> 2L))
    // the audit read sees base + both branch batches
    val expect = rows(base.unionByName(b1).unionByName(b2))
    assert(rows(SnapshotStore.readBranch(spark, root, "audit")) == expect)
    // V2 read with the branch option sees the same
    assert(rows(spark.read.format("graft-snapshot")
      .option("branch", "audit").load(root)) == expect)
    // publish: ONE metadata-only main commit with the branch head's
    // exact entries — no file moved, no byte written
    val dataFiles = new java.io.File(s"$root/data").listFiles().toSet
    val head = SnapshotStore.currentManifest(root, Some("audit"))
    val m1 = SnapshotStore.fastForward(root, "audit")
    assert(m1.version == 1L && SnapshotStore.versions(root) == Seq(0L, 1L))
    assert(new java.io.File(s"$root/data").listFiles().toSet == dataFiles)
    // exact entry carry modulo the seq RE-STAMP (branch-added entries
    // land at the new main version so later deletes/renames scope to
    // them — see the fast-forward scaladoc)
    def noSeq(fs: Vector[SnapshotStore.FileEntry]) = fs.map(_.copy(seq = 0L))
    assert(noSeq(SnapshotStore.currentManifest(root).files) ==
      noSeq(head.files))
    assert(rows(SnapshotStore.read(spark, root)) == expect)
  }

  test("post-fast-forward deletes and renames see the carried branch files") {
    // branch-added entries RE-STAMP to the landed main version: a
    // later main DELETE's entry (seq = next version) must apply to
    // them, and a later RENAME's era must post-date them — the
    // seq-aliasing bug class the fast-forward re-stamp closes
    val root = freshRoot("ffseq")
    SnapshotStore.init(spark, base, root, "k", filesPerCommit = 2) // v0
    SnapshotStore.createBranch(root, "b")
    b(root, "b", 5000L) // branch v1
    b(root, "b", 6000L) // branch v2: seqs ABOVE the landed main v1
    SnapshotStore.fastForward(root, "b") // main v1
    assert(SnapshotStore.currentManifest(root).files.forall(_.seq <= 1L))
    // a MOR delete right after the fast-forward must shadow branch rows
    SnapshotStore.deleteKeys(spark,
      Seq(5003L, 6004L, 10L).toDF("k"), root) // v2
    val got = SnapshotStore.read(spark, root)
      .filter(col("k").isin(5003L, 6004L, 10L))
    assert(got.count() == 0L,
      "a post-fast-forward delete must apply to carried branch files")
    // a rename right after the fast-forward: branch files are PRE-era
    // by seq, so the era translation must still find their columns
    SnapshotStore.renameColumn(root, "p", "label") // v3
    assert(SnapshotStore.read(spark, root)
      .filter(col("k") === 5004L).select("label")
      .collect().head.getString(0) == "b")
  }

  test("fast-forward refuses when main moved past the fork (diverged)") {
    val root = freshRoot("div")
    SnapshotStore.init(spark, base, root, "k", filesPerCommit = 2) // v0
    SnapshotStore.createBranch(root, "hot")
    b(root, "hot", 5000L)
    SnapshotStore.append(spark,
      Seq((9000L, 1L, "main")).toDF("k", "n", "p"), root) // main v1
    val e = intercept[java.util.ConcurrentModificationException] {
      SnapshotStore.fastForward(root, "hot")
    }
    assert(e.getMessage.contains("not a fast-forward"))
    // main and branch both intact after the refusal
    assert(SnapshotStore.versions(root) == Seq(0L, 1L))
    assert(SnapshotStore.branches(root)("hot") == 1L)
  }

  private def b(root: String, name: String, shift: Long): Unit =
    (shift until shift + 10L).map(i => (i, i, "b")).toDF("k", "n", "p")
      .write.format("graft-snapshot").option("branch", name)
      .option("filesPerCommit", 1).mode("append").save(root)

  test("branch name CAS, empty fast-forward, drop, and refusal guards") {
    val root = freshRoot("guards")
    SnapshotStore.init(spark, base, root, "k", filesPerCommit = 2)
    SnapshotStore.createBranch(root, "a")
    val dup = intercept[IllegalArgumentException] {
      SnapshotStore.createBranch(root, "a")
    }
    assert(dup.getMessage.contains("already exists"))
    // nothing committed on the branch: fast-forward is a no-op
    assert(SnapshotStore.fastForward(root, "a").version == 0L)
    assert(SnapshotStore.versions(root) == Seq(0L))
    // streaming sinks and CDC refuse branch targets
    val cdc = intercept[Exception] {
      spark.readStream.format("graft-cdc").option("branch", "a").load(root)
    }
    assert(cdc.getMessage.contains("MAIN chain"))
    SnapshotStore.dropBranch(root, "a")
    assert(SnapshotStore.branches(root).isEmpty)
  }

  test("vacuum retains files referenced only by a branch") {
    val root = freshRoot("vac")
    SnapshotStore.init(spark, base, root, "k", filesPerCommit = 2) // v0
    SnapshotStore.createBranch(root, "keep")
    b(root, "keep", 7000L) // branch-only data file
    // churn main so old versions drop
    for (i <- 0 until 3)
      SnapshotStore.append(spark,
        Seq((10000L + i, 1L, "m")).toDF("k", "n", "p"), root)
    SnapshotStore.vacuum(root, keepLast = 2, scratchTtlMs = 0L,
      orphanTtlMs = 0L)
    // the branch head still reads in full — its file survived the sweep
    assert(SnapshotStore.readBranch(spark, root, "keep")
      .filter(col("k") >= 7000L && col("k") < 7010L).count() == 10L)
  }
}
