package graft.sources

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL UPDATE / MERGE INTO / predicate DELETE on snapshot stores:
  * group-based copy-on-write rewrites through Spark's own
  * RewriteUpdateTable/RewriteMergeIntoTable rules, committed as a
  * replace-files manifest operation — files outside the affected
  * groups carry by REFERENCE (path-identical), non-matching rows
  * inside affected files carry verbatim, and a stale rewrite refuses
  * against a concurrent commit.
  */
class RowLevelOpsSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private var n = 0

  /** Fresh catalog+store per test: 1000 keys over 5 range files. */
  private def fixture(): (String, String) = {
    n += 1
    val wh = java.nio.file.Files.createTempDirectory(s"rlo$n").toString
    val cat = s"grlo$n"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.v2.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$wh/db"))
    val df = (0L until 1000L)
      .map(i => (i, i * 3L, if (i % 2 == 0) "even" else "odd"))
      .toDF("k", "v", "par")
    SnapshotStore.init(spark, df, s"$wh/db/t", "k", filesPerCommit = 5)
    (cat, s"$wh/db/t")
  }

  test("UPDATE with a key predicate rewrites only the affected files") {
    val (cat, root) = fixture()
    val before = SnapshotStore.currentManifest(root)
    spark.sql(s"UPDATE $cat.db.t SET v = v + 1000000 WHERE k BETWEEN 0 AND 99")
    val after = SnapshotStore.currentManifest(root)
    assert(after.version == before.version + 1)
    // files provably outside [0, 99] carry by reference
    val untouched = before.files.filter(_.minKey > 99L).map(_.path).toSet
    assert(untouched.nonEmpty)
    assert(untouched.subsetOf(after.files.map(_.path).toSet),
      "files outside the predicate must carry path-identical")
    // affected files are gone, replaced by rewritten ones
    val affected = before.files.filter(_.minKey <= 99L).map(_.path).toSet
    assert(affected.forall(p => !after.files.exists(_.path == p)))
    // content: matched rows updated, everything else byte-for-byte
    val got = spark.sql(s"SELECT k, v, par FROM $cat.db.t ORDER BY k")
      .collect().toSeq.map(_.toSeq)
    val want = (0L until 1000L).map(i =>
      Seq(i, i * 3L + (if (i <= 99L) 1000000L else 0L),
        if (i % 2 == 0) "even" else "odd"))
    assert(got == want)
  }

  test("UPDATE with a non-key predicate keeps non-matching rows intact") {
    val (cat, root) = fixture()
    spark.sql(s"UPDATE $cat.db.t SET v = -1 WHERE par = 'odd' AND k < 300")
    val got = spark.sql(s"SELECT k, v, par FROM $cat.db.t ORDER BY k")
      .collect().toSeq.map(_.toSeq)
    val want = (0L until 1000L).map(i =>
      Seq(i, if (i % 2 == 1 && i < 300) -1L else i * 3L,
        if (i % 2 == 0) "even" else "odd"))
    assert(got == want)
    assert(SnapshotStore.currentManifest(root).files.nonEmpty)
  }

  test("MERGE INTO: matched update + not-matched insert in one commit") {
    val (cat, root) = fixture()
    val v0 = SnapshotStore.currentManifest(root).version
    (Seq((50L, 777L, "upd"), (51L, 778L, "upd"),
      (5000L, 1L, "new"), (5001L, 2L, "new")))
      .toDF("k", "v", "par").createOrReplaceTempView("rlo_updates")
    spark.sql(
      s"""MERGE INTO $cat.db.t t USING rlo_updates u ON t.k = u.k
         |WHEN MATCHED THEN UPDATE SET t.v = u.v, t.par = u.par
         |WHEN NOT MATCHED THEN INSERT (k, v, par) VALUES (u.k, u.v, u.par)
         |""".stripMargin)
    assert(SnapshotStore.currentManifest(root).version == v0 + 1,
      "MERGE must land as ONE commit")
    val got = spark.sql(s"SELECT k, v, par FROM $cat.db.t ORDER BY k")
      .collect().toSeq.map(_.toSeq)
    val want = (0L until 1000L).map {
      case i @ (50L | 51L) => Seq(i, 727L + i, "upd")
      case i => Seq(i, i * 3L, if (i % 2 == 0) "even" else "odd")
    } ++ Seq(Seq(5000L, 1L, "new"), Seq(5001L, 2L, "new"))
    assert(got == want)
  }

  test("MERGE WHEN MATCHED DELETE removes only matched rows") {
    val (cat, _) = fixture()
    (0L until 1000L by 100L).toDF("k").createOrReplaceTempView("rlo_kill")
    spark.sql(
      s"""MERGE INTO $cat.db.t t USING rlo_kill u ON t.k = u.k
         |WHEN MATCHED THEN DELETE""".stripMargin)
    val got = spark.sql(s"SELECT k FROM $cat.db.t ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(got == (0L until 1000L).filterNot(_ % 100L == 0L))
  }

  test("DELETE with a non-key predicate falls back to the row-level rewrite") {
    val (cat, root) = fixture()
    val before = SnapshotStore.currentManifest(root)
    spark.sql(s"DELETE FROM $cat.db.t WHERE par = 'odd' AND k >= 800")
    val after = SnapshotStore.currentManifest(root)
    // key bound still selects groups: files below 800 carry
    val untouched = before.files.filter(_.maxKey < 800L).map(_.path).toSet
    assert(untouched.nonEmpty &&
      untouched.subsetOf(after.files.map(_.path).toSet))
    val got = spark.sql(s"SELECT k FROM $cat.db.t ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(got == (0L until 1000L).filterNot(i => i % 2 == 1 && i >= 800))
  }

  test("row-level ops refuse on unmaterialized merge-on-read deletes") {
    val (cat, root) = fixture()
    SnapshotStore.deleteKeys(spark, Seq(3L, 7L).toDF("k"), root)
    val e = intercept[Exception] {
      spark.sql(s"UPDATE $cat.db.t SET v = 0 WHERE k < 10")
    }
    assert(e.getMessage.contains("merge-on-read") ||
      Option(e.getCause).exists(_.getMessage.contains("merge-on-read")))
  }

  test("a stale replace-files commit refuses against a concurrent commit") {
    val (_, root) = fixture()
    val base = SnapshotStore.currentManifest(root).version
    // someone else commits first
    SnapshotStore.append(spark, Seq((9999L, 1L, "x")).toDF("k", "v", "par"),
      root)
    intercept[java.util.ConcurrentModificationException] {
      SnapshotStore.commitReplaceEntries(root, base, Set.empty, Vector.empty)
    }
  }

  test("UPDATE on a version-pinned table refuses") {
    val (cat, _) = fixture()
    val e = intercept[Exception] {
      spark.sql(s"UPDATE $cat.db.t VERSION AS OF 0 SET v = 0 WHERE k = 1")
    }
    assert(e != null) // Spark refuses time travel on DML targets
  }
}
