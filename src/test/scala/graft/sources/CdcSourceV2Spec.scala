package graft.sources

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The V2 micro-batch CDC source: offset = store version, rows =
  * changes(v-1, v) computed executor-side. Must agree with the batch
  * API per version across merges, equality deletes (MOR), range
  * deletes and schema evolution; the startVersion option and the
  * tail-from-now default pin the offset semantics.
  */
class CdcSourceV2Spec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def freshDir(tag: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(s"cdcv2_$tag")

  private def drain(root: String, out: String, ck: String,
                    start: Option[Long])(work: => Unit): Unit = {
    val reader = spark.readStream.format("graft-cdc")
    val q = start.fold(reader)(v => reader.option("startVersion", v))
      .load(root)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck)
      .start()
    try { work; q.processAllAvailable() } finally q.stop()
  }

  private def feedRows(out: String): Set[(Long, Long, String)] =
    spark.read.parquet(out).collect()
      .map(r => (r.getLong(r.fieldIndex("version")), r.getLong(0),
        r.getString(r.fieldIndex("op")))).toSet

  test("images=true emits pre/post payload rows (the Delta CDF shape) across merge, MOR, evolution") {
    val dir = freshDir("images")
    val root = dir.resolve("store").toString
    val out = dir.resolve("out").toString
    SnapshotStore.init(spark,
      (0L until 100L).map(i => (i, s"v$i", i * 2L)).toDF("k", "p", "n"),
      root, "k") // v0
    SnapshotStore.merge(spark, // v1: one update, one insert
      Seq((5L, "upd", 555L), (900L, "new", 1L)).toDF("k", "p", "n"), root)
    SnapshotStore.addColumn(root, "tag", "STRING") // v2: metadata only
    SnapshotStore.merge(spark, // v3: populates the new column on one row
      Seq((7L, "v7", 14L, "hot")).toDF("k", "p", "n", "tag"), root)
    SnapshotStore.deleteKeys(spark, Seq(9L).toDF("k"), root) // v4 MOR
    val q = spark.readStream.format("graft-cdc")
      .option("startVersion", 0L).option("images", "true").load(root)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", dir.resolve("ck").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.read.parquet(out)
      .select("version", "k", "_change_type", "p", "n", "tag").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getLong(4),
        if (r.isNullAt(5)) null else r.getString(5))).toSet
    assert(rows == Set(
      (1L, 5L, "update_preimage", "v5", 10L, null),
      (1L, 5L, "update_postimage", "upd", 555L, null),
      (1L, 900L, "insert", "new", 1L, null),
      // v2 (addColumn) produces no rows; v3 carries the new column
      (3L, 7L, "update_preimage", "v7", 14L, null),
      (3L, 7L, "update_postimage", "v7", 14L, "hot"),
      (4L, 9L, "delete", "v9", 18L, null)))
  }

  test("startVersion validation and the single-task delta-size guard refuse with guidance") {
    val dir = freshDir("guards")
    val root = dir.resolve("store").toString
    SnapshotStore.init(spark,
      (0L until 200L).map(i => (i, s"v$i")).toDF("k", "p"), root, "k")
    // negative start refuses at CONSTRUCTION, not deep in planning
    val neg = intercept[Exception] {
      spark.readStream.format("graft-cdc").option("startVersion", -1L)
        .load(root)
    }
    assert(neg.getMessage.contains("startVersion"))
    // a start below the vacuum-retention floor refuses with guidance
    // at STREAM START (initialOffset) — construction must stay legal
    // so a checkpointed stream can still restart after vacuum drops
    // its configured startVersion
    SnapshotStore.merge(spark,
      Seq((5L, "u1")).toDF("k", "p"), root) // v1
    SnapshotStore.merge(spark,
      Seq((6L, "u2")).toDF("k", "p"), root) // v2
    SnapshotStore.vacuum(root, keepLast = 1)
    val stale = spark.readStream.format("graft-cdc")
      .option("startVersion", 0L).load(root) // constructs fine
    val old = intercept[Exception] {
      val sq = stale.writeStream.format("parquet")
        .option("path", dir.resolve("out_stale").toString)
        .option("checkpointLocation", dir.resolve("ck_stale").toString)
        .start()
      try sq.processAllAvailable() finally sq.stop()
    }
    assert(old.getMessage.contains("oldest retained"))
    // the delta-size guard: a tiny maxDeltaBytes trips on a rewrite
    val q = spark.readStream.format("graft-cdc")
      .option("startVersion", 2L).option("maxDeltaBytes", 10L).load(root)
      .writeStream.format("parquet")
      .option("path", dir.resolve("out").toString)
      .option("checkpointLocation", dir.resolve("ck").toString)
      .start()
    val trip = intercept[Exception] {
      try {
        SnapshotStore.merge(spark, Seq((7L, "u3")).toDF("k", "p"), root)
        q.processAllAvailable()
      } finally q.stop()
    }
    assert(trip.getMessage.contains("maxDeltaBytes"),
      s"expected the size guard, got: ${trip.getMessage}")
  }

  test("stream output equals the batch changes() per version across merge, MOR delete, range delete") {
    val dir = freshDir("parity")
    val root = dir.resolve("store").toString
    val out = dir.resolve("out").toString
    val ck = dir.resolve("ck").toString
    SnapshotStore.init(spark,
      (0L until 400L).map(i => (i, s"v$i", i % 7)).toDF("k", "p", "g"),
      root, "k") // v0
    drain(root, out, ck, start = Some(0L)) {
      SnapshotStore.merge(spark, // v1: updates + an insert
        Seq((5L, "upd", 9L), (9999L, "new", 9L)).toDF("k", "p", "g"), root)
      SnapshotStore.deleteKeys(spark, Seq(7L, 9L).toDF("k"), root) // v2 MOR
      SnapshotStore.deleteRange(spark, root, 100L, 149L) // v3
      SnapshotStore.merge(spark, // v4: a no-op payload is NOT a change
        Seq((11L, "v11", 4L), (12L, "vX", 5L)).toDF("k", "p", "g"), root)
    }
    val got = feedRows(out)
    val want = (1L to 4L).flatMap { v =>
      SnapshotStore.changes(spark, root, v - 1, v).collect()
        .map(r => (v, r.getLong(0), r.getString(1)))
    }.toSet
    assert(got == want)
    // spot semantics: the unchanged-payload merge row is absent
    assert(got.contains((4L, 12L, "update")) && !got.exists(
      t => t._1 == 4L && t._2 == 11L))
    assert(got.contains((2L, 7L, "delete")) && got.contains((1L, 5L, "update")))
  }

  test("schema evolution boundary streams the full diff (the delta skip disengages)") {
    val dir = freshDir("schema")
    val root = dir.resolve("store").toString
    SnapshotStore.init(spark,
      Seq((1L, "a", "x"), (2L, "b", null)).toDF("k", "keep", "dropme"),
      root, "k")
    drain(root, dir.resolve("out").toString, dir.resolve("ck").toString,
        start = Some(0L)) {
      SnapshotStore.dropColumn(root, "dropme") // v1: metadata-only
    }
    // the non-null holder reads differently under the new schema; the
    // null row's payload is unchanged (null fields are omitted)
    assert(feedRows(dir.resolve("out").toString) ==
      Set((1L, 1L, "update")))
  }

  test("default start tails from the current version; startVersion replays history") {
    val dir = freshDir("start")
    val root = dir.resolve("store").toString
    SnapshotStore.init(spark,
      (0L until 100L).map(i => (i, s"v$i")).toDF("k", "p"), root, "k")
    SnapshotStore.merge(spark, Seq((1L, "old")).toDF("k", "p"), root) // v1
    // default: only versions committed AFTER stream start
    drain(root, dir.resolve("out1").toString,
        dir.resolve("ck1").toString, start = None) {
      SnapshotStore.merge(spark, Seq((2L, "new")).toDF("k", "p"), root) // v2
    }
    assert(feedRows(dir.resolve("out1").toString) ==
      Set((2L, 2L, "update")))
    // explicit startVersion = 0 replays v1 too
    drain(root, dir.resolve("out2").toString,
        dir.resolve("ck2").toString, start = Some(0L))(())
    assert(feedRows(dir.resolve("out2").toString) ==
      Set((1L, 1L, "update"), (2L, 2L, "update")))
  }

  test("digest injectivity: separator-looking bytes inside values do not mask updates") {
    // (f1="x", f2="y") updated to (f1 = "x" + 0x1e + "f2" + 0x1f + "y",
    // f2=null) must surface as an update: a delimiter-only payload
    // encoding would hash both sides identically
    val dir = freshDir("inject")
    val root = dir.resolve("store").toString
    SnapshotStore.init(spark,
      Seq((1L, "x", "y")).toDF("k", "f1", "f2"), root, "k")
    val tricky = "x" + 0x1e.toChar + "f2" + 0x1f.toChar + "y"
    drain(root, dir.resolve("out").toString, dir.resolve("ck").toString,
        start = Some(0L)) {
      SnapshotStore.merge(spark,
        Seq((1L, tricky, null.asInstanceOf[String]))
          .toDF("k", "f1", "f2"), root)
    }
    assert(feedRows(dir.resolve("out").toString) == Set((1L, 1L, "update")))
  }

  test("a replay range crossing an unsupported-payload version refuses at planning with guidance") {
    val dir = freshDir("badhist")
    val root = dir.resolve("store").toString
    SnapshotStore.init(spark,
      Seq((1L, Array(0.5f), "a")).toDF("k", "emb", "p"), root, "k") // v0
    SnapshotStore.dropColumn(root, "emb") // v1: head is clean
    SnapshotStore.merge(spark, Seq((2L, "b")).toDF("k", "p"), root) // v2
    val q = spark.readStream.format("graft-cdc")
      .option("startVersion", 0L).load(root)
      .writeStream.format("noop").start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      try q.processAllAvailable() finally q.stop())
    assert(e.getMessage.contains("unsupported payload") ||
      Option(e.getCause).exists(_.getMessage.contains("unsupported payload")))
  }

  test("unsupported payload types refuse at stream construction") {
    val dir = freshDir("types")
    val root = dir.resolve("store").toString
    SnapshotStore.init(spark,
      Seq((1L, Array(0.5f, 0.25f))).toDF("k", "emb"), root, "k")
    val e = intercept[IllegalArgumentException](
      spark.readStream.format("graft-cdc").load(root))
    assert(e.getMessage.contains("changes()"))
  }
}
