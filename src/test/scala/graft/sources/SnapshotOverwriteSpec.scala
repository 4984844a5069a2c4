package graft.sources

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Filter-scoped overwrite (`writeTo(t).overwrite(k BETWEEN a AND b)`
  * / `commitOverwriteRange`): in-range files drop manifest-only,
  * disjoint files carry path-identical, boundary files rewrite
  * keeping their out-of-range rows — one commit. Refusals: out-of-
  * range staged data (replaceWhere conformance), non-key predicates,
  * empty ranges, concurrent commits (OCC), pinned tables.
  */
class SnapshotOverwriteSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def freshWh(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"snapovw_$tag").toString

  private def cat(wh: String, tag: String): String = {
    val name = s"ovw_$tag"
    spark.conf.set(s"spark.sql.catalog.$name",
      "graft.sources.v2.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    name
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private val base =
    (0L until 400L).map(i => (i, i * 3L, s"v$i")).toDF("k", "n", "p")

  test("range overwrite: drop inside, carry disjoint, rewrite boundary") {
    val wh = freshWh("range")
    val c = cat(wh, "range")
    val root = s"$wh/db/t"
    SnapshotStore.init(spark, base, root, "k", filesPerCommit = 8) // 50/file
    val before = SnapshotStore.currentManifest(root)
    // [120, 260) replacement: straddles file boundaries at 150/200/250
    val repl = (120L until 260L by 2L).map(i => (i, -i, "new"))
      .toDF("k", "n", "p")
    repl.writeTo(s"$c.db.t").overwrite(col("k") >= 120L && col("k") < 260L)
    val after = SnapshotStore.currentManifest(root)
    assert(after.version == 1L)
    val disjoint = before.files.filter(f => f.maxKey < 120L || f.minKey > 259L)
    assert(disjoint.nonEmpty &&
      disjoint.forall(f => after.files.exists(_.path == f.path)))
    val inside = before.files.filter(f => f.minKey >= 120L && f.maxKey <= 259L)
    assert(inside.nonEmpty &&
      inside.forall(f => !after.files.exists(_.path == f.path)))
    // content: everything outside [120, 260) kept, evens inside replaced
    val expect = base.filter(col("k") < 120L || col("k") >= 260L)
      .unionByName(repl)
    assert(rows(SnapshotStore.read(spark, root)) == rows(expect))
    // boundary rows carried: odd keys in the straddling files' kept
    // halves are exactly the out-of-range rows (none inside survive)
    assert(SnapshotStore.read(spark, root)
      .filter(col("k").between(120L, 259L) && col("k") % 2 === 1L).count() == 0L)
  }

  test("out-of-range staged data refuses and leaves the table untouched") {
    val wh = freshWh("leak")
    val c = cat(wh, "leak")
    val root = s"$wh/db/t"
    SnapshotStore.init(spark, base, root, "k", filesPerCommit = 4)
    val e = intercept[Exception] {
      base.filter(col("k") < 300L).writeTo(s"$c.db.t")
        .overwrite(col("k").between(100L, 199L))
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("inside the replaced key range")))
    assert(SnapshotStore.currentManifest(root).version == 0L)
    assert(rows(SnapshotStore.read(spark, root)) == rows(base))
    // nothing litters staging
    assert(!new java.io.File(s"$root/data").listFiles()
      .exists(_.getName.startsWith(".staged-")))
  }

  test("non-key predicates and empty ranges refuse at analysis") {
    val wh = freshWh("refuse")
    val c = cat(wh, "refuse")
    val root = s"$wh/db/t"
    SnapshotStore.init(spark, base, root, "k", filesPerCommit = 2)
    val nonKey = intercept[Exception] {
      base.limit(1).writeTo(s"$c.db.t").overwrite(col("p") === "v1")
    }
    assert(nonKey.getMessage.contains("ONE key range") ||
      Option(nonKey.getCause).exists(_.getMessage.contains("ONE key range")))
    val empty = intercept[Exception] {
      base.limit(1).writeTo(s"$c.db.t")
        .overwrite(col("k") > 10L && col("k") < 5L)
    }
    assert(empty.getMessage.contains("empty") ||
      Option(empty.getCause).exists(_.getMessage.contains("empty")))
    assert(SnapshotStore.currentManifest(root).version == 0L)
  }

  test("a concurrent commit refuses the stale overwrite (OCC)") {
    val wh = freshWh("occ")
    val root = s"$wh/db/t"
    SnapshotStore.init(spark, base, root, "k", filesPerCommit = 4)
    // plan the overwrite against v0, then slide a commit in before it
    // lands — commitOverwriteRange must refuse, not rebase
    SnapshotStore.append(spark,
      Seq((5000L, 1L, "x")).toDF("k", "n", "p"), root) // v1
    val e = intercept[java.util.ConcurrentModificationException] {
      SnapshotStore.commitOverwriteRange(spark, root, baseVersion = 0L,
        100L, 199L, Vector.empty)
    }
    assert(e.getMessage.contains("planned against version 0"))
  }

  test("AlwaysTrue overwrite is truncate; pinned tables stay read-only") {
    val wh = freshWh("trunc")
    val c = cat(wh, "trunc")
    val root = s"$wh/db/t"
    SnapshotStore.init(spark, base, root, "k", filesPerCommit = 2)
    val repl = Seq((7L, 7L, "only")).toDF("k", "n", "p")
    repl.writeTo(s"$c.db.t").overwrite(lit(true))
    assert(rows(SnapshotStore.read(spark, root)) == rows(repl))
    val pinned = intercept[Exception] {
      repl.write.format("graft-snapshot").option("version", 0)
        .mode("overwrite").save(root)
    }
    assert(pinned.getMessage.contains("read-only") ||
      Option(pinned.getCause).exists(_.getMessage.contains("read-only")))
  }
}
