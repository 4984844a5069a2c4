package graft.sources

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Row-level operations ON A BRANCH — the WAP fix-up surface: stage a
  * batch on the branch, audit it, REPAIR the bad rows with UPDATE /
  * DELETE / apply_deletes on the branch, then fast-forward the
  * converged state pointer-only. Main stays bit-identical throughout.
  * Fast-forward's order-preservation proof: post-fork deletes publish
  * unmaterialized only when they shadow no post-fork file
  * (delete-then-append and same-commit deltas); append-then-delete
  * refuses with materialize-first guidance. The SQL surface is the
  * Iceberg `db.t.branch_<name>` suffix.
  */
class BranchRowLevelSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"brrl_$tag").toString + "/t"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private val base =
    (0L until 200L).map(i => (i, i * 3L, s"v$i")).toDF("k", "n", "p")

  test("SQL UPDATE/DELETE on db.t.branch_<name> fix a staged batch; fast-forward publishes pointer-only") {
    val wh = java.nio.file.Files.createTempDirectory("brrl_wh").toString
    spark.conf.set("spark.sql.catalog.brcat", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.brcat.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS brcat.db")
      base.writeTo("brcat.db.t").tableProperty("key", "k").create()
      val root = s"$wh/db/t"
      val mainBefore = SnapshotStore.currentManifest(root)
      spark.sql("CALL brcat.system.create_branch(`table` => 'db.t', " +
        "name => 'audit')")
      // stage a batch WITH bad rows on the branch
      (1000L until 1050L).map(i => (i, i, if (i % 10 == 0) "BAD" else "b"))
        .toDF("k", "n", "p")
        .writeTo("brcat.db.t.branch_audit").append() // branch +1
      // audit finds them; FIX on the branch: a COW UPDATE
      spark.sql("UPDATE brcat.db.t.branch_audit SET p = 'fixed' " +
        "WHERE p = 'BAD'") // branch +2
      // and a row-level DELETE of a few staged keys (COW path)
      spark.sql("DELETE FROM brcat.db.t.branch_audit " +
        "WHERE k IN (1001, 1002)") // branch +3
      // main never moved — bit-identical, not even a version number
      assert(SnapshotStore.currentManifest(root) == mainBefore)
      // the branch read serves the fixed state (SQL branch reads stay
      // snapshots via VERSION AS OF)
      val branchNow = spark.sql(
        "SELECT * FROM brcat.db.t VERSION AS OF 'audit'")
      assert(branchNow.filter(col("p") === "BAD").count() == 0L)
      assert(branchNow.filter(col("k").isin(1001L, 1002L)).count() == 0L)
      val expect = rows(branchNow)
      // publish: pointer-only (no data file created/removed/renamed)
      val dataFiles = new java.io.File(s"$root/data").listFiles().toSet
      spark.sql("CALL brcat.system.fast_forward(`table` => 'db.t', " +
        "name => 'audit')")
      assert(new java.io.File(s"$root/data").listFiles().toSet == dataFiles)
      assert(rows(spark.table("brcat.db.t")) == expect)
    } finally spark.conf.unset("spark.sql.catalog.brcat")
  }

  test("merge-on-read delta on a branch + apply_deletes(branch) converge; fast-forward publishes") {
    val wh = java.nio.file.Files.createTempDirectory("brrl_wh2").toString
    spark.conf.set("spark.sql.catalog.brcat2", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.brcat2.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS brcat2.db")
      base.writeTo("brcat2.db.t").tableProperty("key", "k").create()
      val root = s"$wh/db/t"
      val mainBefore = SnapshotStore.currentManifest(root)
      SnapshotStore.createBranch(root, "fix")
      (1000L until 1040L).map(i => (i, i, "stage")).toDF("k", "n", "p")
        .writeTo("brcat2.db.t.branch_fix").append() // branch +1
      spark.conf.set("spark.graft.update.mode", "merge-on-read")
      try {
        // sparse MOR UPDATE on the branch: match-sized delete file +
        // new rows, landed on the branch chain
        spark.sql("UPDATE brcat2.db.t.branch_fix SET n = n + 7 " +
          "WHERE k % 50 = 3") // branch +2
      } finally spark.conf.unset("spark.graft.update.mode")
      val headDelta = SnapshotStore.currentManifest(root, Some("fix"))
      assert(headDelta.deletes.nonEmpty,
        "the branch MOR update must land equality-delete entries")
      assert(SnapshotStore.currentManifest(root) == mainBefore)
      // append-then-delete: the unmaterialized delete is stamped
      // ABOVE the staged append — the single-commit re-stamp would
      // un-shadow those rows, so fast-forward REFUSES with guidance
      val e = intercept[IllegalArgumentException] {
        SnapshotStore.fastForward(root, "fix")
      }
      assert(e.getMessage.contains("materialize"))
      // materialize ON THE BRANCH (SQL surface), then publish
      spark.sql("CALL brcat2.system.apply_deletes(`table` => 'db.t', " +
        "branch => 'fix')") // branch +3
      assert(SnapshotStore.currentManifest(root, Some("fix")).deletes.isEmpty)
      assert(SnapshotStore.currentManifest(root) == mainBefore)
      SnapshotStore.fastForward(root, "fix")
      val got = spark.table("brcat2.db.t")
      val expect = base.unionByName(
        (1000L until 1040L).map(i => (i, i, "stage")).toDF("k", "n", "p"))
        .withColumn("n", when(col("k") % 50 === 3, col("n") + 7)
          .otherwise(col("n")))
      assert(rows(got) == rows(expect))
    } finally spark.conf.unset("spark.sql.catalog.brcat2")
  }

  test("delete-then-append publishes unmaterialized under the order proof") {
    val root = freshRoot("ord")
    SnapshotStore.init(spark, base, root, "k", filesPerCommit = 4) // v0
    // manufacture an equality-delete FILE by running deleteKeys on
    // main (v1) and rolling main back (v2) — the file stays on disk,
    // reusable as a branch delta's delete entry
    val delFile = SnapshotStore.deleteKeys(spark, Seq(5L, 6L).toDF("k"), root)
    SnapshotStore.rollback(root, 0L)
    val mainAtFork = SnapshotStore.currentManifest(root)
    SnapshotStore.createBranch(root, "b2") // forked at main v2 (rollback)
    val base2 = SnapshotStore.currentManifest(root, Some("b2"))
    // hand-roll a delete-only delta on the branch (the delete file
    // already exists under deletes/ from the main experiment)
    val entry = delFile.deletes.head
    SnapshotStore.commitDeltaEntries(root, base2.version, Vector.empty,
      Vector(entry.copy(seq = 0L)), branch = Some("b2")) // branch +1
    // ... THEN append on the branch
    Seq((9000L, 1L, "late")).toDF("k", "n", "p")
      .write.format("graft-snapshot").option("branch", "b2")
      .mode("append").save(root) // branch +2
    // order proof holds (delete seq < file seq): publishes
    // unmaterialized, and semantics carry — inherited keys 5,6 are
    // shadowed, the appended row is not
    SnapshotStore.fastForward(root, "b2")
    assert(SnapshotStore.currentManifest(root) != mainAtFork)
    val got = SnapshotStore.read(spark, root)
    assert(got.filter(col("k").isin(5L, 6L)).count() == 0L)
    assert(got.filter(col("k") === 9000L).count() == 1L)
    assert(got.count() == base.count() - 2 + 1)
  }
}
