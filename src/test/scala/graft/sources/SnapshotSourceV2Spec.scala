package graft.sources

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DataSourceV2 read path: `spark.read.format("graft-snapshot")`
  * must be bit-identical to the API reads while making the store's
  * pruning visible to Catalyst — pushed filters select files at
  * planning time (key range, zone maps, blooms), residuals re-check
  * rows, column pruning reaches the parquet scan, and time travel
  * rides options.
  */
class SnapshotSourceV2Spec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"snapv2_$tag").toString + "/t"

  private def scanned(df: org.apache.spark.sql.DataFrame): Seq[String] =
    graft.sources.v2.SnapshotSource.scannedFiles(df)

  private def v2(root: String, opts: (String, String)*) =
    opts.foldLeft(spark.read.format("graft-snapshot"))(
      (r, kv) => r.option(kv._1, kv._2)).load(root)

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("V2 head read is bit-identical to SnapshotStore.read; version/tag options time-travel") {
    val root = freshRoot("basic")
    SnapshotStore.init(spark,
      (0L until 400L).map(i => (i, s"v$i", i % 7)).toDF("k", "p", "g"),
      root, "k")
    SnapshotStore.tag(root, "rel", 0L)
    SnapshotStore.merge(spark,
      Seq((5L, "upd", 9L), (9999L, "new", 9L)).toDF("k", "p", "g"), root)
    assert(rows(v2(root)) == rows(SnapshotStore.read(spark, root)))
    assert(rows(v2(root, "version" -> "0")) ==
      rows(SnapshotStore.readAsOf(spark, root, 0L)))
    assert(rows(v2(root, "tag" -> "rel")) ==
      rows(SnapshotStore.readTag(spark, root, "rel")))
    // a file:// URI root routes to the Hadoop substrate and reads
    // identically (NioStoreFs cannot parse URI strings)
    assert(rows(v2("file://" + root)) == rows(SnapshotStore.read(spark, root)))
    assertThrows[IllegalArgumentException](
      v2(root, "version" -> "0", "tag" -> "rel").collect())
  }

  test("pushed key-range predicates prune files at planning time and stay row-exact") {
    val root = freshRoot("prune")
    SnapshotStore.init(spark,
      (0L until 1600L).map(i => (i, i * 3L, s"v$i")).toDF("k", "n", "p"),
      root, "k", filesPerCommit = 8, statsCols = Seq("n"))
    val total = SnapshotStore.currentManifest(root).files.size
    assert(total == 8)
    val q = v2(root).filter(col("k").between(100L, 299L))
    // file selection: 1600 keys over 8 range-clustered files = 200
    // keys/file; [100, 299] touches exactly 2
    assert(scanned(q).length == 2,
      s"expected 2 of $total files, read ${scanned(q).length}")
    assert(rows(q) == rows(SnapshotStore.read(spark, root)
      .filter(col("k").between(100L, 299L))))
    // the pushed filters are visible in the V2 scan's plan
    val plan = q.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PushedFilters:"), plan)
    assert(plan.contains("GreaterThanOrEqual(k,100)"), plan)
    // zone-map pruning on a NON-key stats column: n = 3k, so
    // n <= 150 lives only in the first file
    val z = v2(root).filter(col("n") <= 150L)
    assert(scanned(z).length == 1, scanned(z).mkString(","))
    assert(z.count() == 51)
    // residual exactness: a predicate the manifest can't decide
    // (string column) reads everything but filters exactly
    val r = v2(root).filter(col("p") === "v42")
    assert(scanned(r).length == total)
    assert(rows(r) == Set(Seq(42L, 126L, "v42")))
  }

  test("column pruning reaches the parquet scan") {
    val root = freshRoot("cols")
    SnapshotStore.init(spark,
      (0L until 100L).map(i => (i, s"v$i", i * 2L)).toDF("k", "p", "w"),
      root, "k")
    val q = v2(root).select("k", "w")
    val plan = q.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(readSchema.contains("k") && readSchema.contains("w") &&
      !readSchema.contains("p"), readSchema)
    assert(rows(q) == (0L until 100L).map(i => Seq(i, i * 2L)).toSet)
  }

  test("per-file key blooms prune gap-key point reads below their range overlap") {
    val root = freshRoot("bloom")
    // sparse keys (stride 1000) so gap probes land inside envelopes
    SnapshotStore.init(spark,
      (0L until 2000L).map(i => (i * 1000L, s"v$i")).toDF("k", "p"),
      root, "k", filesPerCommit = 8, bloomBits = 16384)
    // a present key reads its one file
    val hit = v2(root).filter(col("k") === 1337000L)
    assert(scanned(hit).length == 1)
    assert(hit.count() == 1)
    // a gap key (inside some file's [min,max], absent) is bloom-pruned
    // to zero files with overwhelming probability at these widths
    val miss = v2(root).filter(col("k") === 1337500L)
    assert(scanned(miss).isEmpty, scanned(miss).mkString(","))
    assert(miss.count() == 0)
    // IN-list point set: only the files holding the probed keys read
    val in = v2(root).filter(col("k").isin(5000L, 999000L, 1999000L))
    assert(scanned(in).length <= 3)
    assert(in.count() == 3)
  }

  test("V2 refuses unmaterialized MOR deletes loudly; applyDeletes restores readability") {
    val root = freshRoot("mor")
    SnapshotStore.init(spark,
      (0L until 300L).map(i => (i, s"v$i")).toDF("k", "p"), root, "k")
    SnapshotStore.deleteKeys(spark, Seq(7L, 9L).toDF("k"), root)
    val e = intercept[IllegalStateException](v2(root).collect())
    assert(e.getMessage.contains("merge-on-read"))
    // pruning past every deleted-key file would dodge the refusal only
    // if correct — here the delete applies to the selected file too
    assertThrows[IllegalStateException](
      v2(root).filter(col("k") === 7L).collect())
    // time travel to the pre-delete version stays readable
    assert(v2(root, "version" -> "0").count() == 300)
    SnapshotStore.applyDeletes(spark, root)
    assert(rows(v2(root)) == rows(SnapshotStore.read(spark, root)))
    assert(v2(root).count() == 298)
  }

  test("schema evolution: V2 reads the declared schema of the pinned version") {
    val root = freshRoot("evolve")
    SnapshotStore.init(spark,
      Seq((1L, "a", "x"), (2L, "b", "y")).toDF("k", "keep", "dropme"),
      root, "k")
    SnapshotStore.dropColumn(root, "dropme")
    assert(v2(root).columns.toSeq == Seq("k", "keep"))
    assert(rows(v2(root)) == Set(Seq(1L, "a"), Seq(2L, "b")))
    // the old version still reads the wider schema
    assert(v2(root, "version" -> "0").columns.toSeq ==
      Seq("k", "keep", "dropme"))
    SnapshotStore.addColumn(root, "extra", "BIGINT")
    assert(v2(root).columns.toSeq == Seq("k", "keep", "extra"))
    assert(rows(v2(root)) == Set(Seq(1L, "a", null), Seq(2L, "b", null)))
  }
}
