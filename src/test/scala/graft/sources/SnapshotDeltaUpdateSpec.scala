package graft.sources

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Merge-on-read row-level SQL (SupportsDelta): under
  * spark.graft.update.mode = merge-on-read a sparse UPDATE writes
  * match-sized delete files + new rows instead of rewriting every
  * touched file; non-key DELETEs become pure delete files; the
  * MOR-aware read serves immediately; apply_deletes converges the V2
  * path; a chained delta over still-shadowed files refuses.
  */
class SnapshotDeltaUpdateSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def freshWh(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"snapmor_$tag").toString

  private def cat(wh: String, tag: String): String = {
    val name = s"mor_$tag"
    spark.conf.set(s"spark.sql.catalog.$name",
      "graft.sources.v2.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    name
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def inMode[A](mode: String)(body: => A): A = {
    val key = "spark.graft.update.mode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, mode)
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  // wide rows make the COW amplification visible
  private val base = (0L until 2000L)
    .map(i => (i, i * 3L, "x" * 200 + i)).toDF("k", "n", "p")

  test("sparse MOR update: delete file + new rows, no file rewritten, far fewer bytes than COW") {
    val wh = freshWh("upd")
    val c = cat(wh, "upd")
    val rootM = s"$wh/db/m"
    val rootC = s"$wh/db/c"
    for (r <- Seq(rootM, rootC))
      SnapshotStore.init(spark, base, r, "k", filesPerCommit = 8)
    val before = SnapshotStore.currentManifest(rootM)
    val stmt = "SET n = n + 1000000 WHERE k % 100 = 7" // 1% of rows
    inMode("merge-on-read") { spark.sql(s"UPDATE $c.db.m $stmt") }
    spark.sql(s"UPDATE $c.db.c $stmt") // the copy-on-write twin
    val (mm, mc) = (SnapshotStore.currentManifest(rootM),
      SnapshotStore.currentManifest(rootC))
    // every original file carried by reference; only small additions
    assert(before.files.forall(f => mm.files.exists(_.path == f.path)),
      "MOR must not rewrite any existing file")
    assert(mm.deletes.nonEmpty, "MOR must land equality-delete entries")
    def newBytes(m: SnapshotStore.Manifest) =
      m.files.filter(_.seq == m.version).map(_.bytes).sum
    val cowBytes = newBytes(mc)
    assert(newBytes(mm) * 5 < cowBytes,
      s"MOR new bytes (${newBytes(mm)}) must be far below the COW " +
        s"rewrite ($cowBytes)")
    // content identical between the two modes (MOR-aware read)
    assert(rows(SnapshotStore.read(spark, rootM)) ==
      rows(SnapshotStore.read(spark, rootC)))
    // chained delta over still-shadowed files refuses with guidance
    val chained = intercept[Exception] {
      inMode("merge-on-read") {
        spark.sql(s"UPDATE $c.db.m SET n = n + 1 WHERE k % 100 = 7")
      }
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(chained).exists(_.contains("applyDeletes")))
    // apply_deletes converges: V2/SQL reads reopen, content unchanged
    spark.sql(s"CALL $c.system.apply_deletes(`table` => 'db.m')").collect()
    assert(SnapshotStore.currentManifest(rootM).deletes.isEmpty)
    assert(rows(spark.sql(s"SELECT k, n, p FROM $c.db.m")) ==
      rows(spark.sql(s"SELECT k, n, p FROM $c.db.c")))
  }

  test("non-key MOR DELETE writes a pure delete file (zero data files)") {
    val wh = freshWh("del")
    val c = cat(wh, "del")
    val root = s"$wh/db/t"
    SnapshotStore.init(spark, base, root, "k", filesPerCommit = 4)
    // a non-key predicate: the metadata-first SupportsDelete path
    // declines it, and in MOR mode the delta op takes it as a pure
    // delete-file commit
    inMode("merge-on-read") {
      spark.sql(s"DELETE FROM $c.db.t WHERE n % 400 = 3")
    }
    val m = SnapshotStore.currentManifest(root)
    assert(m.deletes.nonEmpty && m.files.forall(_.seq == 0L),
      "a MOR delete must land delete entries and zero data files")
    assert(rows(SnapshotStore.read(spark, root)) ==
      rows(base.filter(!(col("n") % 400 === 3))))
  }

  test("MOR row-level ops on an INT-keyed table (negative keys)") {
    // the rowId projection carries the key under its DECLARED type —
    // the delete path must not zero-extend an INT slot (a negative
    // key would silently target the wrong value)
    val wh = freshWh("intkey")
    val c = cat(wh, "intkey")
    val root = s"$wh/db/t"
    val intKeyed = (-50 until 50).map(i => (i, i * 2L)).toDF("k", "n")
    SnapshotStore.init(spark, intKeyed, root, "k", filesPerCommit = 2)
    inMode("merge-on-read") {
      spark.sql(s"UPDATE $c.db.t SET n = 999 WHERE k IN (-5, 7)")
    }
    val got = SnapshotStore.read(spark, root).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got(-5) == 999L && got(7) == 999L && got(-6) == -12L)
    assert(got.size == 100, "no row duplicated or lost")
  }

  test("MOR MERGE INTO: matched updates + not-matched inserts, one delta commit") {
    val wh = freshWh("merge")
    val c = cat(wh, "merge")
    val root = s"$wh/db/t"
    SnapshotStore.init(spark, base, root, "k", filesPerCommit = 4)
    (1990L until 2010L).map(i => (i, -i, "u")).toDF("k", "n", "p")
      .createOrReplaceTempView("mor_merge_src")
    val before = SnapshotStore.currentManifest(root)
    inMode("merge-on-read") {
      spark.sql(
        s"""MERGE INTO $c.db.t t USING mor_merge_src s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    val m = SnapshotStore.currentManifest(root)
    assert(m.version == before.version + 1, "one delta commit")
    assert(before.files.forall(f => m.files.exists(_.path == f.path)),
      "MERGE under MOR must not rewrite any existing file")
    assert(m.deletes.nonEmpty, "matched updates land as delete entries")
    val expect = base.filter(col("k") < 1990L)
      .unionByName((1990L until 2010L).map(i => (i, -i, "u"))
        .toDF("k", "n", "p"))
    assert(rows(SnapshotStore.read(spark, root)) == rows(expect))
  }

  test("update mode validation and COW default") {
    val wh = freshWh("mode")
    val c = cat(wh, "mode")
    val root = s"$wh/db/t"
    SnapshotStore.init(spark, base.limit(100), root, "k", filesPerCommit = 2)
    val bad = intercept[Exception] {
      inMode("sideways") {
        spark.sql(s"UPDATE $c.db.t SET n = 0 WHERE k = 1")
      }
    }
    assert(bad.getMessage.contains("update.mode") ||
      Option(bad.getCause).exists(_.getMessage.contains("update.mode")))
    // default stays copy-on-write: no delete entries appear
    // (small-file tables — the auto default resolves the same way)
    spark.sql(s"UPDATE $c.db.t SET n = 0 WHERE k = 1")
    assert(SnapshotStore.currentManifest(root).deletes.isEmpty)
  }

  test("dense-delta budget: a non-sparse MOR statement refuses with mode guidance; the boundary holds") {
    val wh = freshWh("budget")
    val c = cat(wh, "budget")
    val root = s"$wh/db/t"
    SnapshotStore.init(spark, base, root, "k", filesPerCommit = 2)
    val total = base.count()
    val budgetKey = "spark.graft.update.maxDeltaKeysPerTask"
    // budget below the statement's matched count -> loud refusal with
    // guidance, and NO delta version lands (the job aborts)
    spark.conf.set(budgetKey, "10")
    val v0 = SnapshotStore.currentManifest(root).version
    try {
      val e = intercept[Exception] {
        inMode("merge-on-read") {
          spark.sql(s"DELETE FROM $c.db.t WHERE n >= 0") // every row
        }
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      val all = msgs(e).mkString("\n")
      assert(all.contains("not sparse") || all.contains("copy-on-write"),
        s"unexpected refusal: $all")
      assert(SnapshotStore.currentManifest(root).version == v0,
        "a refused dense delta must land NO version")
      // at-or-under the budget commits fine (the boundary): matched
      // rows spread over tasks, so a per-task budget of the full
      // count always suffices
      spark.conf.set(budgetKey, total.toString)
      inMode("merge-on-read") {
        spark.sql(s"UPDATE $c.db.t SET n = n + 1 WHERE k % 20 = 1")
      }
      assert(SnapshotStore.currentManifest(root).deletes.nonEmpty)
    } finally spark.conf.unset(budgetKey)
  }
}
