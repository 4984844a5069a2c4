package graft.sources

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Metadata-only RENAME COLUMN (a projection alias per version via
  * the manifest's rename log; era-split reads re-label old files'
  * physical names) and lossless type WIDENING (the parquet readers'
  * native promotion). Structural refusals: key/zone-mapped columns
  * don't rename, retired names never come back, and the snapshot
  * stream AND CDC both serve pre-view renamed history exactly
  * (per-era/per-file column translation) while refusing renames
  * their view predates.
  */
class SnapshotRenameSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"snapren_$tag").toString + "/t"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private val base =
    (0L until 100L).map(i => (i, i.toInt, s"v$i")).toDF("k", "n", "p")

  test("rename is metadata-only; reads span eras; time travel keeps old names") {
    val root = freshRoot("basic")
    SnapshotStore.init(spark, base, root, "k", filesPerCommit = 4) // v0
    val files0 = SnapshotStore.currentManifest(root).files
    SnapshotStore.renameColumn(root, "p", "label") // v1: zero files touched
    val m1 = SnapshotStore.currentManifest(root)
    assert(m1.files == files0, "rename must not touch a data file")
    assert(m1.renames == Vector(SnapshotStore.Rename(1L, "p", "label")))
    // old files' data surfaces under the NEW name
    assert(rows(SnapshotStore.read(spark, root)) ==
      rows(base.withColumnRenamed("p", "label")))
    // post-rename commits write the new name; reads span both eras
    val late = (1000L until 1020L).map(i => (i, i.toInt, "late"))
      .toDF("k", "n", "label")
    SnapshotStore.append(spark, late, root, filesPerCommit = 2) // v2
    assert(rows(SnapshotStore.read(spark, root)) ==
      rows(base.withColumnRenamed("p", "label").unionByName(late)))
    // V2 scan takes the same era-split path
    assert(rows(spark.read.format("graft-snapshot").load(root)
      .select("k", "n", "label")) ==
      rows(base.withColumnRenamed("p", "label").unionByName(late)
        .select("k", "n", "label")))
    // time travel: v0 still reads under ITS declared name
    assert(SnapshotStore.readAsOf(spark, root, 0L).columns.toSeq ==
      Seq("k", "n", "p"))
    // chained rename composes (label -> tag); old files two eras back
    SnapshotStore.renameColumn(root, "label", "tag") // v3
    assert(rows(SnapshotStore.read(spark, root).select("k", "tag")) ==
      rows(base.select(col("k"), col("p").as("tag"))
        .unionByName(late.select(col("k"), col("label").as("tag")))))
  }

  test("widen int->long is metadata-only and spans old files") {
    val root = freshRoot("widen")
    SnapshotStore.init(spark, base, root, "k", filesPerCommit = 2) // v0
    val files0 = SnapshotStore.currentManifest(root).files
    SnapshotStore.widenColumn(root, "n", "BIGINT") // v1
    assert(SnapshotStore.currentManifest(root).files == files0)
    val wide = Seq((5000L, 5000000000L, "w")).toDF("k", "n", "p")
    SnapshotStore.append(spark, wide, root) // v2: genuinely long values
    val got = SnapshotStore.read(spark, root)
    assert(got.schema("n").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(rows(got) == rows(base.withColumn("n", col("n").cast("long"))
      .unionByName(wide)))
    // narrowing (and non-promotions) refuse
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.widenColumn(root, "n", "INT")
    }
    assert(e.getMessage.contains("cannot widen"))
  }

  test("structural refusals: key, zone-mapped, retired names") {
    val root = freshRoot("refuse")
    SnapshotStore.init(spark, base, root, "k", filesPerCommit = 2,
      statsCols = Seq("n"))
    intercept[IllegalArgumentException] {
      SnapshotStore.renameColumn(root, "k", "key2")
    }
    intercept[IllegalArgumentException] {
      SnapshotStore.renameColumn(root, "n", "n2")
    }
    SnapshotStore.renameColumn(root, "p", "q")
    // a retired physical name can never be reborn: old files still
    // hold data under it
    val reborn = intercept[IllegalArgumentException] {
      SnapshotStore.addColumn(root, "p", "STRING")
    }
    assert(reborn.getMessage.contains("rename history"))
    intercept[IllegalArgumentException] {
      SnapshotStore.renameColumn(root, "q", "p")
    }
    // the rename's TARGET name is retired too once dropped: a reborn
    // add would translate back through the log and serve OLD files'
    // values instead of NULL
    SnapshotStore.dropColumn(root, "q")
    val rebornTo = intercept[IllegalArgumentException] {
      SnapshotStore.addColumn(root, "q", "STRING")
    }
    assert(rebornTo.getMessage.contains("rename history"))
  }

  test("row-level UPDATE rewrites renamed-era files to the current names") {
    val wh = java.nio.file.Files.createTempDirectory("snapren_sql").toString
    spark.conf.set("spark.sql.catalog.grencat",
      "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.grencat.warehouse", wh)
    val root = s"$wh/db/t"
    SnapshotStore.init(spark, base, root, "k", filesPerCommit = 4)
    SnapshotStore.renameColumn(root, "p", "label")
    // the group scan reads pre-rename files through the era path
    // (with _file), the rewrite writes the CURRENT names
    spark.sql("UPDATE grencat.db.t SET label = 'hit' WHERE k BETWEEN 10 AND 19")
    val got = spark.sql("SELECT k, label FROM grencat.db.t").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert((10L to 19L).forall(got(_) == "hit") && got(25L) == "v25")
  }

  test("snapshot stream serves pre-rename backfill era-translated; CDC serves pre-view renamed history exactly") {
    val root = freshRoot("stream")
    SnapshotStore.init(spark, base, root, "k", filesPerCommit = 2) // v0
    SnapshotStore.renameColumn(root, "p", "q") // v1
    // backfill over pre-rename files: the era-split scans read their
    // OLD physical names and emit the values under the view's NEW
    // name (the batch scan's era contract, stream-side)
    val out = java.nio.file.Files.createTempDirectory("renstream")
    val q = spark.readStream.format("graft-snapshot")
      .option("startVersion", 0L).load(root)
      .writeStream.format("parquet")
      .option("path", out.resolve("o").toString)
      .option("checkpointLocation", out.resolve("ck").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(rows(spark.read.parquet(out.resolve("o").toString)) ==
      rows(base.withColumnRenamed("p", "q")),
      "the backfill must serve pre-rename values under the view name")
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // CDC: a stream whose VIEW postdates the rename serves pre-rename
    // touched files EXACTLY — the era-0 file stores the column as 'p',
    // the feed emits it under the view's 'q' (per-file translation)
    SnapshotStore.merge(spark,
      Seq((5L, 99, "x")).toDF("k", "n", "q"), root) // v2 touches old files
    val qc = spark.readStream.format("graft-cdc")
      .option("startVersion", 1L).option("images", "true").load(root)
      .writeStream.format("memory").queryName("ren_cdc").start()
    try qc.processAllAvailable() finally qc.stop()
    val feed = spark.table("ren_cdc")
      .select("_change_type", "k", "n", "q").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getString(3)))
      .toSet
    assert(feed == Set(
      ("update_preimage", 5L, 5, "v5"),    // from the physical-'p' era
      ("update_postimage", 5L, 99, "x")))
    // a rename the view PREDATES still refuses loudly (the
    // restart-to-adopt rule): resolve the view FIRST, rename again,
    // touch files, then run
    val pre = spark.readStream.format("graft-cdc")
      .option("startVersion", 2L).load(root) // view resolved at v2
    SnapshotStore.renameColumn(root, "q", "r") // v3
    SnapshotStore.merge(spark,
      Seq((6L, 77, "y")).toDF("k", "n", "r"), root) // v4 touches files
    val qc2 = pre
      .writeStream.format("memory").queryName("ren_cdc2").start()
    val cerr = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      qc2.processAllAvailable()
    }
    qc2.stop()
    assert(msgs(cerr).exists(m => m.contains("rename")))
    // the batch diff serves every interval exactly either way
    val diff = SnapshotStore.changes(spark, root, 1L, 2L)
    assert(diff.count() == 1L)
  }

  test("widen decimal digit-growth and date->timestamp_ntz are metadata-only; hazards refuse") {
    val root = freshRoot("widen2")
    val df = (0L until 50L).map { i =>
      (i, new java.math.BigDecimal(s"$i.25"),
        java.sql.Date.valueOf("2020-06-01"))
    }.toDF("k", "d", "t")
      .select(col("k"), col("d").cast("decimal(9,2)").as("d"), col("t"))
    SnapshotStore.init(spark, df, root, "k", filesPerCommit = 2) // v0
    val files0 = SnapshotStore.currentManifest(root).files
    SnapshotStore.widenColumn(root, "d", "DECIMAL(18,4)") // v1
    SnapshotStore.widenColumn(root, "t", "TIMESTAMP_NTZ") // v2
    assert(SnapshotStore.currentManifest(root).files == files0,
      "decimal/date widening must touch zero data files")
    val got = SnapshotStore.read(spark, root)
    assert(got.schema("d").dataType ==
      org.apache.spark.sql.types.DecimalType(18, 4))
    assert(got.schema("t").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    // narrow-era bytes up-convert exactly
    val r5 = got.filter(col("k") === 5L).head()
    assert(r5.getDecimal(1).toPlainString == "5.2500")
    assert(r5.getAs[java.time.LocalDateTime](2) ==
      java.time.LocalDateTime.of(2020, 6, 1, 0, 0))
    // hazards: scale shrink, digit loss, zone reinterpretation
    for (bad <- Seq("DECIMAL(18,2)", "DECIMAL(9,2)", "DECIMAL(17,5)"))
      assert(intercept[IllegalArgumentException] {
        SnapshotStore.widenColumn(root, "d", bad)
      }.getMessage.contains("cannot widen"))
    assert(intercept[IllegalArgumentException] {
      SnapshotStore.widenColumn(root, "t", "TIMESTAMP")
    }.getMessage.contains("cannot widen"))
  }
}
