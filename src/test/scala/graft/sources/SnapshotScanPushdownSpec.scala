package graft.sources

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Catalyst integrations on the V2 read path beyond plain pushdown:
  * manifest-answered aggregates (COUNT/MIN/MAX plan ZERO data files),
  * file-exact key conjuncts dropping their residual re-check, and
  * runtime (join-driven) file pruning.
  */
class SnapshotScanPushdownSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"snappush_$tag").toString + "/t"

  private def scanned(df: org.apache.spark.sql.DataFrame): Seq[String] =
    graft.sources.v2.SnapshotSource.scannedFiles(df)

  private def v2(root: String) =
    spark.read.format("graft-snapshot").load(root)

  // 1600 contiguous keys over 8 range-clustered files: 200 keys/file,
  // envelopes [0,199], [200,399], ... deterministic boundaries
  private def fixture(tag: String): String = {
    val root = freshRoot(tag)
    SnapshotStore.init(spark,
      (0L until 1600L).map(i => (i, i * 3L, s"v$i")).toDF("k", "n", "p"),
      root, "k", filesPerCommit = 8, statsCols = Seq("n"))
    assert(SnapshotStore.currentManifest(root).files.size == 8)
    root
  }

  test("unfiltered COUNT/MIN/MAX answer from the manifest: one local row, zero data files") {
    val root = fixture("aggall")
    val q = v2(root).agg(
      count(lit(1)).as("c"), min("k").as("mnk"), max("k").as("mxk"),
      min("n").as("mnn"), max("n").as("mxn"))
    assert(q.collect().toSeq.map(_.toSeq) ==
      Seq(Seq(1600L, 0L, 1599L, 0L, 4797L)))
    assert(scanned(q).isEmpty, s"expected zero files: ${scanned(q)}")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"), plan)
    assert(!plan.contains("BatchScan") || scanned(q).isEmpty, plan)
  }

  test("file-aligned key range: filter fully handled, COUNT still zero files") {
    val root = fixture("aggrange")
    // [200, 599] covers files 1-2 exactly; every other file is disjoint
    val q = v2(root).filter(col("k").between(200L, 599L))
      .agg(count(lit(1)).as("c"))
    assert(q.collect().head.getLong(0) == 400L)
    assert(scanned(q).isEmpty, s"expected zero files: ${scanned(q)}")
    // and the non-agg read of the same range has NO residual Filter
    // node — selection is file-exact, rows need no re-check
    val exact = v2(root).filter(col("k").between(200L, 599L))
    assert(exact.count() == 400L)
    assert(!exact.queryExecution.executedPlan.toString.contains("Filter ("),
      exact.queryExecution.executedPlan.toString)
    assert(scanned(exact).length == 2)
  }

  test("misaligned key range falls back to a real scan with exact results") {
    val root = fixture("aggmis")
    // [250, 549] partially overlaps files 1 and 2 — not file-exact
    val q = v2(root).filter(col("k").between(250L, 549L))
      .agg(count(lit(1)).as("c"), min("k").as("mn"), max("k").as("mx"))
    assert(q.collect().toSeq.map(_.toSeq) == Seq(Seq(300L, 250L, 549L)))
    assert(scanned(q).nonEmpty, "partial overlap must read files")
    // the residual filter is retained for the misaligned range
    val part = v2(root).filter(col("k").between(250L, 549L))
    assert(part.count() == 300L)
  }

  test("aggregates over non-stats or non-integral columns fall back") {
    val root = fixture("aggfall")
    val q = v2(root).agg(min("p").as("mn")) // string col: no zone map
    assert(q.collect().head.getString(0) == "v0")
    assert(scanned(q).nonEmpty)
    // count(col) (null-sensitive) must not be answered by count(*) math
    val qc = v2(root).agg(count(col("p")).as("c"))
    assert(qc.collect().head.getLong(0) == 1600L)
    assert(scanned(qc).nonEmpty)
  }

  test("an empty selection aggregates to count 0 / null min-max from the manifest") {
    val root = fixture("aggempty")
    val q = v2(root).filter(col("k").between(5000L, 6000L))
      .agg(count(lit(1)).as("c"), min("k").as("mn"))
    val r = q.collect().head
    assert(r.getLong(0) == 0L && r.isNullAt(1))
    assert(scanned(q).isEmpty)
  }

  test("merge-on-read deletes disable manifest aggregates (refusal, not a wrong count)") {
    val root = fixture("aggmor")
    SnapshotStore.deleteKeys(spark, Seq(7L).toDF("k"), root)
    // the agg can't be answered (deletes apply) and the raw V2 read
    // refuses MOR — countAsOf / the API read remain the MOR-aware path
    intercept[IllegalStateException] {
      v2(root).agg(count(lit(1))).collect()
    }
    assert(SnapshotStore.read(spark, root).count() == 1599L)
  }

  test("a broadcast dim join prunes store files at execution time (runtime V2 filtering)") {
    val root = fixture("dpp")
    // the dim must be a REAL relation: a local Seq would constant-fold
    // its filter away and leave no selective predicate for the
    // pruning rule to see
    val dimPath = freshRoot("dim")
    Seq((42L, "keep"), (1337L, "keep"), (9L, "drop"))
      .toDF("k", "tag").write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val q = v2(root).join(broadcast(dim).filter(col("tag") === "keep"), "k")
      .select("k", "n", "tag")
    val got = q.collect().map(_.toSeq).toSet
    assert(got == Set(Seq(42L, 126L, "keep"), Seq(1337L, 4011L, "keep")))
    // keys 42 and 1337 live in files 0 and 6 — the runtime IN-set must
    // narrow the 8-file manifest to exactly those (checked after
    // execution: the scan's current set reflects runtime filtering)
    val files = scanned(q)
    assert(files.length == 2, s"runtime filter should keep 2 of 8: $files")
  }

  test("regression: file-exact key filter with the key pruned from the projection") {
    // a fully-handled key conjunct drops its residual, so the planner
    // prunes the KEY column out of the read schema — re-pushing that
    // filter to parquet then row-group-filtered against a schema
    // without the column and silently dropped EVERY block (zero rows
    // from a 400-row range). The scan must not hand parquet filters
    // on columns outside the read schema.
    val root = fixture("prune_key_out")
    // [200, 599] is file-aligned (files 1-2 exactly) → fully handled,
    // no residual → k pruned from the projection of `n`
    val q = v2(root).filter(col("k").between(200L, 599L)).select("n")
    val got = q.collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (200L until 600L).map(_ * 3L),
      s"got ${got.length} rows")
    // the residual-bearing mixed shape stays correct too
    val q2 = v2(root).filter(col("k").between(200L, 599L) &&
      col("p").startsWith("v2")).select("n")
    assert(q2.collect().length ==
      (200L until 600L).count(i => s"v$i".startsWith("v2")))
  }

  test("LIMIT truncates the planned file set to cover n rows") {
    val root = fixture("limit")
    // 250 rows need 2 of the 8 200-row files
    val q = v2(root).limit(250)
    assert(q.count() == 250L)
    assert(scanned(q).length == 2, s"expected 2 files: ${scanned(q)}")
    // with a file-exact range: limit truncates WITHIN the selection
    val q2 = v2(root).filter(col("k").between(200L, 999L)).limit(150)
    assert(q2.count() == 150L)
    assert(scanned(q2).length == 1, s"expected 1 file: ${scanned(q2)}")
    // a limit above the table size keeps everything and stays correct
    val q3 = v2(root).limit(5000)
    assert(q3.count() == 1600L)
  }

  test("ORDER BY key LIMIT n (TopN) reads only the files at that end of the key line") {
    val root = fixture("topn")
    val asc = v2(root).orderBy(col("k")).limit(30).select("k")
    assert(asc.collect().map(_.getLong(0)).toSeq == (0L until 30L))
    assert(scanned(asc).length == 1, s"expected 1 file: ${scanned(asc)}")
    val desc = v2(root).orderBy(col("k").desc).limit(30).select("k")
    assert(desc.collect().map(_.getLong(0)).toSeq ==
      (1570L until 1600L).reverse)
    assert(scanned(desc).length == 1, s"expected 1 file: ${scanned(desc)}")
  }

  test("LIMIT/TopN truncation declines when it could undercount") {
    val root = fixture("limitneg")
    // residual filter (stats column): a truncated set could hold
    // fewer than n MATCHING rows — no truncation, result exact
    val q = v2(root).filter(col("n") >= 3000L).limit(100)
    assert(q.count() == 100L)
    assert(scanned(q).length > 2,
      s"residual-filtered limit must not truncate: ${scanned(q)}")
    // overlapping envelopes (a second overlapping append): TopN
    // cannot pick an end of the key line — no truncation, order exact
    val root2 = freshRoot("limitneg2")
    SnapshotStore.init(spark,
      (0L until 400L).map(i => (i, i, s"a$i")).toDF("k", "n", "p"),
      root2, "k", filesPerCommit = 2)
    SnapshotStore.append(spark,
      (100L until 300L).map(i => (i, i, s"b$i")).toDF("k", "n", "p"),
      root2, filesPerCommit = 2)
    val m2 = SnapshotStore.currentManifest(root2)
    val byMin = m2.files.sortBy(_.minKey)
    assert(byMin.sliding(2).exists(w => w.head.maxKey >= w.last.minKey),
      "fixture must actually overlap or this test is vacuous")
    val topn = spark.read.format("graft-snapshot").load(root2)
      .orderBy(col("k")).limit(10).select("k")
    assert(topn.collect().map(_.getLong(0)).toSeq == (0L until 10L),
      "overlapping-envelope TopN must stay exact")
    // and no truncation happened: the scan reads every file
    assert(scanned(topn).length == m2.files.size,
      s"overlapping envelopes must decline TopN truncation: ${scanned(topn)}")
  }
}
