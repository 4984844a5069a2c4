package graft.sources

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BATCH change reads (the Delta `table_changes` / Iceberg changelog
  * shape): `spark.read.format("graft-cdc")` — and the catalog's
  * `db.t.changes` suffix in a plain SELECT — answer a version-range
  * diff with no streaming checkpoint. The interval convention is the
  * feed's offset convention (`(startVersion, endVersion]`), so batch
  * slices splice exactly with each other and with a checkpointed
  * stream. Also pins the evolution-aware diff: a metadata-only
  * RENAME/WIDEN version emits NOTHING (and plans nothing — the
  * verbatim-carry skip stays engaged), on both the V2 feed and the
  * store's `changes()` API.
  */
class CdcBatchReadSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"cdcbatch_$tag").toString + "/t"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private val base =
    (0L until 60L).map(i => (i, i.toInt, s"v$i")).toDF("k", "n", "p")

  /** v0 init, v1 merge (update 5 / insert 100), v2 rename p->q,
    * v3 merge (update 6), v4 delete key 7.
    */
  private def history(root: String): Unit = {
    SnapshotStore.init(spark, base, root, "k", filesPerCommit = 3) // v0
    SnapshotStore.merge(spark,
      Seq((5L, 99, "x"), (100L, 1, "new")).toDF("k", "n", "p"), root) // v1
    SnapshotStore.renameColumn(root, "p", "q") // v2: metadata-only
    SnapshotStore.merge(spark, Seq((6L, 77, "y")).toDF("k", "n", "q"), root) // v3
    SnapshotStore.deleteKeys(spark, Seq(7L).toDF("k"), root) // v4
  }

  test("a batch read equals the streamed feed and slices splice exactly") {
    val root = freshRoot("eq")
    history(root)
    val full = spark.read.format("graft-cdc").load(root)
    // the metadata-only rename version emits NOTHING; everything else
    // is the exact change set
    assert(rows(full) == Set(
      Seq(5L, "update", 1L), Seq(100L, "insert", 1L),
      Seq(6L, "update", 3L), Seq(7L, "delete", 4L)))
    // the same feed via a stream (startVersion 0 = full history)
    val q = spark.readStream.format("graft-cdc")
      .option("startVersion", 0L).load(root)
      .writeStream.format("memory").queryName("cdcbatch_eq").start()
    try q.processAllAvailable() finally q.stop()
    assert(rows(spark.table("cdcbatch_eq")) == rows(full))
    // slices (0,1] ∪ (1,3] ∪ (3,4] == (0,4]
    def slice(a: Long, b: Long) = spark.read.format("graft-cdc")
      .option("startVersion", a).option("endVersion", b).load(root)
    assert(rows(slice(0, 1)) ++ rows(slice(1, 3)) ++ rows(slice(3, 4)) ==
      rows(full))
    // an empty interval is an empty frame, not an error
    assert(slice(2, 2).count() == 0L)
    // images: the pre-image of the post-rename merge carries the
    // OLD-era payload under the view's column name
    val imgs = spark.read.format("graft-cdc").option("images", "true")
      .option("startVersion", 2L).option("endVersion", 3L).load(root)
    assert(rows(imgs.select("k", "_change_type", "n", "q")) == Set(
      Seq(6L, "update_preimage", 6, "v6"),
      Seq(6L, "update_postimage", 77, "y")))
  }

  test("the catalog name surface serves batch SELECTs over changes and changes_images") {
    val wh = java.nio.file.Files.createTempDirectory("cdcbatch_wh").toString
    spark.conf.set("spark.sql.catalog.cbcat", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cbcat.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS cbcat.db")
      base.writeTo("cbcat.db.t").tableProperty("key", "k").create() // v0+v1
      spark.sql("UPDATE cbcat.db.t SET n = n + 1000 WHERE k BETWEEN 10 AND 12") // v2
      spark.sql("DELETE FROM cbcat.db.t WHERE k >= 55") // v3
      // the pure-SQL consumer: no checkpoint, no stream (CTAS lands
      // the data as its own insert version, so it shows as inserts)
      val got = spark.sql(
        "SELECT op, count(*) AS n FROM cbcat.db.t.changes GROUP BY op")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == Map("insert" -> 60L, "update" -> 3L, "delete" -> 5L))
      // reader options refine the range through the name surface too
      val updOnly = spark.read.option("startVersion", 1)
        .option("endVersion", 2).table("cbcat.db.t.changes")
      assert(rows(updOnly.select("k", "op")) ==
        (10L to 12L).map(k => Seq[Any](k, "update")).toSet)
      // image feed by name, batch
      val imgs = spark.read.option("startVersion", 2)
        .table("cbcat.db.t.changes_images")
      assert(rows(imgs.select("k", "_change_type")) ==
        (55L until 60L).map(k => Seq[Any](k, "delete")).toSet)
    } finally spark.conf.unset("spark.sql.catalog.cbcat")
  }

  test("projection pushdown: the scan prunes to the requested columns; classification is unchanged") {
    val root = freshRoot("prune")
    history(root)
    def cdcReadSchema(df: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.types.StructType =
      graft.sources.v2.SnapshotSource.planNodes(df).collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan.readSchema()
      }.get
    val images = spark.read.format("graft-cdc")
      .option("images", "true").load(root)
    // full read: every payload slot
    assert(cdcReadSchema(images.select(images.columns.map(col): _*))
      .fieldNames.toSeq == Seq("k", "_change_type", "version", "n", "q"))
    // a two-column consumer: the SCAN itself narrows — unprojected
    // image slots are never decoded (plan-asserted, not post-projected)
    val narrow = images.select("k", "n")
    assert(cdcReadSchema(narrow).fieldNames.toSeq == Seq("k", "n"))
    assert(rows(narrow) == Set(
      Seq(5L, 5), Seq(5L, 99), Seq(100L, 1), // update pre/post + insert
      Seq(6L, 6), Seq(6L, 77), Seq(7L, 7)))  // update pre/post + delete
    // classification is PROJECTION-INDEPENDENT: an update on an
    // unprojected column still emits its rows (v3 updated n while q
    // projects away; v1 also changed p/q) — and COUNT(*) (empty
    // projection) sees every change row
    val qOnly = images.select("version", "q")
    assert(cdcReadSchema(qOnly).fieldNames.toSeq == Seq("version", "q"))
    assert(rows(qOnly) == Set(
      Seq(1L, "v5"), Seq(1L, "x"), Seq(1L, "new"),
      Seq(3L, "v6"), Seq(3L, "y"), Seq(4L, "v7")))
    assert(images.count() == 6L) // v1: 2 (update) + 1 (insert); v3: 2; v4: 1
    // the key-level feed prunes too
    val feed = spark.read.format("graft-cdc").load(root).select("op")
    assert(cdcReadSchema(feed).fieldNames.toSeq == Seq("op"))
    assert(feed.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("delete", "insert", "update", "update"))
  }

  test("range refusals: beyond the view, inverted, vacuumed-away start") {
    val root = freshRoot("refuse")
    history(root)
    def read(a: Long, b: Long) = spark.read.format("graft-cdc")
      .option("startVersion", a).option("endVersion", b).load(root).collect()
    val e1 = intercept[Exception] { read(0, 99) }
    assert(e1.getMessage.contains("endVersion"))
    val e2 = intercept[Exception] { read(3, 1) }
    assert(e2.getMessage.contains(">= startVersion"))
  }

  test("metadata-only rename and widen versions diff as EMPTY change sets, planning nothing") {
    val root = freshRoot("meta")
    SnapshotStore.init(spark, base, root, "k", filesPerCommit = 3) // v0
    SnapshotStore.renameColumn(root, "p", "q") // v1
    SnapshotStore.widenColumn(root, "n", "BIGINT") // v2
    // the store batch API agrees
    assert(SnapshotStore.changes(spark, root, 0L, 1L).count() == 0L)
    assert(SnapshotStore.changes(spark, root, 1L, 2L).count() == 0L)
    assert(SnapshotStore.changes(spark, root, 0L, 2L).count() == 0L)
    // the feed plans NOTHING for those versions: with a delta budget
    // far below the table's bytes, a table-sized fallback read would
    // refuse — an empty result proves the verbatim-carry skip stayed
    // engaged across the evolution commits
    val tiny = spark.read.format("graft-cdc")
      .option("maxDeltaBytes", 1L).load(root)
    assert(tiny.count() == 0L)
    // a REAL change after the evolutions still diffs exactly
    SnapshotStore.merge(spark,
      Seq((3L, 42L, "z")).toDF("k", "n", "q"), root) // v3
    assert(rows(spark.read.format("graft-cdc")
      .option("startVersion", 2L).load(root)) == Set(Seq(3L, "update", 3L)))
    // and a rename-CROSSING range jump: same key updated, names
    // spelled differently on the two sides — one update, not
    // every-row-update
    val crossing = SnapshotStore.changes(spark, root, 0L, 3L)
    assert(rows(crossing) == Set(Seq(3L, "update")))
  }

  test("a widen crossing renders no spurious updates; an image stream the widen postdates refuses with restart guidance") {
    val root = freshRoot("widen")
    val df = (0L until 30L).map(i =>
      (i, new java.math.BigDecimal(s"$i.25"), i.toInt)).toDF("k", "d", "n")
      .select(col("k"), col("d").cast("decimal(9,2)").as("d"), col("n"))
    SnapshotStore.init(spark, df, root, "k", filesPerCommit = 2) // v0
    SnapshotStore.widenColumn(root, "d", "DECIMAL(18,4)") // v1
    SnapshotStore.deleteKeys(spark, Seq(7L).toDF("k"), root) // v2
    // the widen-crossing range: only the genuinely-deleted key — the
    // decimal rendering difference ("7.25" vs "7.2500") must not read
    // as an update for every surviving row of the touched files
    val diff = SnapshotStore.changes(spark, root, 0L, 2L).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(diff == Set((7L, "delete")), s"spurious rows: $diff")
    // the IMAGE feed across an INT->BIGINT widen the VIEW predates:
    // resolve the view first, widen + append after, then run — the
    // refusal names the type change and the restart rule (previously
    // a raw ClassCastException on an executor). A separate decimal-
    // free root: decimals are not CDC payloads
    val root2 = freshRoot("widen2")
    SnapshotStore.init(spark,
      (0L until 30L).map(i => (i, i.toInt)).toDF("k", "n"), root2,
      "k", filesPerCommit = 2) // v0
    SnapshotStore.deleteKeys(spark, Seq(7L).toDF("k"), root2) // v1
    val pre = spark.readStream.format("graft-cdc")
      .option("startVersion", 0L)
      .option("images", "true").load(root2) // view: n is INT
    SnapshotStore.widenColumn(root2, "n", "BIGINT") // v2
    SnapshotStore.merge(spark,
      Seq((5L, 5000000000L)).toDF("k", "n"), root2) // v3: needs 64 bits
    val q = pre.writeStream.format("memory").queryName("cdc_widen").start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q.processAllAvailable()
      finally q.awaitTermination(30000)
      q.exception.foreach(throw _)
    }
    q.stop()
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val all = msgs(err).mkString("\n")
    assert(all.contains("restart the stream") && all.contains("BIGINT"),
      s"unexpected: $all")
    // a FRESH stream (view postdates the widen) serves the history,
    // up-converting the narrow era into the wide slots
    val q2 = spark.readStream.format("graft-cdc")
      .option("startVersion", 2L).option("images", "true").load(root2)
      .writeStream.format("memory").queryName("cdc_widen2").start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.table("cdc_widen2")
      .select("k", "_change_type", "n").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((5L, "update_preimage", 5L),
      (5L, "update_postimage", 5000000000L)))
  }
}
