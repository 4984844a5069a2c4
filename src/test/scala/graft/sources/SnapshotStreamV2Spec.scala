package graft.sources

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming TABLE reads — `spark.readStream.format("graft-snapshot")`:
  * backfill-then-tail offsets, admission control, append-only refusal,
  * schema-drift refusal, Trigger.AvailableNow drain, and restart
  * exactly-once (offsets replay to identical batches).
  */
class SnapshotStreamV2Spec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def freshDir(tag: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(s"snapstream_$tag")

  private def df(r: Range) = r.map(i => (i.toLong, i * 3L)).toDF("k", "n")

  private def rows(d: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    d.select("k", "n").as[(Long, Long)].collect().toSet

  test("default start tails appends only; offsets are versions") {
    val dir = freshDir("tail")
    val root = s"$dir/t"
    val sink = s"$dir/sink"
    SnapshotStore.init(spark, df(0 until 100), root, "k",
      filesPerCommit = 2) // v0 — NOT emitted by a default-start tail
    val q = spark.readStream.format("graft-snapshot").load(root)
      .writeStream.format("parquet").option("path", sink)
      .option("checkpointLocation", s"$dir/ck").start()
    try {
      SnapshotStore.append(spark, df(1000 until 1100), root) // v1
      q.processAllAvailable()
      SnapshotStore.append(spark, df(2000 until 2050), root) // v2
      q.processAllAvailable()
    } finally q.stop()
    assert(rows(spark.read.parquet(sink)) ==
      rows(df(1000 until 1100)) ++ rows(df(2000 until 2050)))
  }

  test("startVersion backfills the snapshot in admission-limited slices, then tails") {
    val dir = freshDir("backfill")
    val root = s"$dir/t"
    SnapshotStore.init(spark, df(0 until 400), root, "k",
      filesPerCommit = 8) // v0: 8 files
    SnapshotStore.append(spark, df(1000 until 1050), root) // v1
    val q = spark.readStream.format("graft-snapshot")
      .option("startVersion", 0).option("maxFilesPerTrigger", 3)
      .load(root)
      .writeStream.format("memory").queryName("backfill_mem").start()
    try {
      q.processAllAvailable()
      SnapshotStore.append(spark, df(3000 until 3020), root) // v2
      q.processAllAvailable()
      val got = rows(spark.table("backfill_mem"))
      assert(got == rows(df(0 until 400)) ++ rows(df(1000 until 1050)) ++
        rows(df(3000 until 3020)))
      // the 8-file snapshot drained in ceil(8/3)=3 slices, not one
      // batch: admission caps the backfill
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length >= 4,
        s"expected >= 4 admission-limited batches, got ${batches.length}")
      assert(batches.map(_.numInputRows).max <= 3 * 50 + 50,
        "a backfill batch exceeded the 3-file admission cap")
    } finally q.stop()
  }

  test("a rewrite inside the tailed interval refuses with guidance") {
    val dir = freshDir("refuse")
    val root = s"$dir/t"
    SnapshotStore.init(spark, df(0 until 100), root, "k")
    val q = spark.readStream.format("graft-snapshot").load(root)
      .writeStream.format("noop").start()
    try {
      SnapshotStore.merge(spark, // v1: REWRITES v0 files
        df(0 until 10).withColumn("n", col("n") + 1000L), root)
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable(); q.awaitTermination(10000)
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(ex).exists(c =>
        c.getMessage != null && c.getMessage.contains("not append-only")))
    } finally q.stop()
  }

  test("schema evolution serves the stream's declared view; a fresh stream adopts the new schema") {
    val dir = freshDir("drift")
    val root = s"$dir/t"
    val sink = s"$dir/sink"
    SnapshotStore.init(spark, df(0 until 50), root, "k")
    val q = spark.readStream.format("graft-snapshot").load(root)
      .writeStream.format("parquet").option("path", sink)
      .option("checkpointLocation", s"$dir/ck").start()
    try {
      SnapshotStore.addColumn(root, "extra", "BIGINT") // v1
      SnapshotStore.append(spark, // v2: wider rows
        df(100 until 120).withColumn("extra", col("k") + 7L), root)
      q.processAllAvailable()
    } finally q.stop()
    // the running stream projects the widened appends down to its
    // construction-time view (the graft-cdc images rule) — nothing
    // wedges, nothing re-emits
    val tailed = spark.read.parquet(sink)
    assert(tailed.columns.toSet == Set("k", "n"))
    assert(rows(tailed) == rows(df(100 until 120)))
    // a FRESH stream (new checkpoint) adopts the new schema: the
    // backfill serves pre-evolution files with the added column NULL
    val dir2 = s"$dir/sink2"
    val q2 = spark.readStream.format("graft-snapshot")
      .option("startVersion", 2).load(root)
      .writeStream.format("parquet").option("path", dir2)
      .option("checkpointLocation", s"$dir/ck2").start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(dir2)
    assert(got.columns.toSet == Set("k", "n", "extra"))
    assert(got.count() == 70) // snapshot-as-of-v2: 50 original + 20 new
    assert(got.filter(col("extra").isNull).count() == 50,
      "pre-evolution files must null-fill the added column")
    assert(got.filter(col("extra") === col("k") + 7L).count() == 20)
  }

  test("a dropped-and-re-added column type change refuses loudly") {
    val dir = freshDir("retype")
    val root = s"$dir/t"
    SnapshotStore.init(spark, df(0 until 30), root, "k")
    val q = spark.readStream.format("graft-snapshot").load(root)
      .writeStream.format("noop").start()
    try {
      SnapshotStore.dropColumn(root, "n") // v1
      SnapshotStore.addColumn(root, "n", "STRING") // v2: same name, new type
      SnapshotStore.append(spark, // v3
        (500 until 510).map(i => (i.toLong, s"s$i")).toDF("k", "n"), root)
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable(); q.awaitTermination(10000)
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(ex).exists(c => c.getMessage != null &&
        c.getMessage.contains("type change")))
    } finally q.stop()
  }

  test("a widen landing after stream start refuses with the restart-to-adopt remedy") {
    val dir = freshDir("widen")
    val root = s"$dir/t"
    SnapshotStore.init(spark,
      df(0 until 30).select(col("k"), col("n").cast("int").as("n")),
      root, "k")
    val q = spark.readStream.format("graft-snapshot").load(root)
      .writeStream.format("noop").start()
    try {
      SnapshotStore.widenColumn(root, "n", "BIGINT") // v1, after start
      SnapshotStore.append(spark, df(500 until 510), root) // v2
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable(); q.awaitTermination(10000)
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      // the remedy is a checkpointed RESTART (the wide view then
      // serves the narrow backlog via canWiden) — NOT the two-stream
      // workaround the dropped-and-re-added case needs
      assert(causes(ex).exists(c => c.getMessage != null &&
        c.getMessage.contains("restart the stream to adopt the widened")))
      assert(!causes(ex).exists(c => c.getMessage != null &&
        c.getMessage.contains("separate streams")))
    } finally q.stop()
    // and the remedy WORKS: a fresh-checkpoint restart re-resolves the
    // wide view and serves both eras
    val sink = s"$dir/sink"
    val q2 = spark.readStream.format("graft-snapshot")
      .option("startVersion", 0).load(root)
      .writeStream.format("parquet").option("path", sink)
      .option("checkpointLocation", s"$dir/ck2").start()
    try q2.processAllAvailable() finally q2.stop()
    assert(rows(spark.read.parquet(sink)) ==
      rows(df(0 until 30)) ++ rows(df(500 until 510)))
  }

  test("Trigger.AvailableNow drains the backfill in capped batches and stops") {
    val dir = freshDir("avnow")
    val root = s"$dir/t"
    SnapshotStore.init(spark, df(0 until 300), root, "k",
      filesPerCommit = 6) // v0: 6 files
    SnapshotStore.append(spark, df(1000 until 1030), root) // v1
    val q = spark.readStream.format("graft-snapshot")
      .option("startVersion", 0).option("maxFilesPerTrigger", 2)
      .load(root)
      .writeStream.format("memory").queryName("avnow_mem")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "AvailableNow query must self-stop")
    assert(rows(spark.table("avnow_mem")) ==
      rows(df(0 until 300)) ++ rows(df(1000 until 1030)))
  }

  test("restart from checkpoint resumes exactly-once (no re-emitted files)") {
    val dir = freshDir("restart")
    val root = s"$dir/t"
    val sink = s"$dir/sink"
    val ck = s"$dir/ck"
    SnapshotStore.init(spark, df(0 until 200), root, "k",
      filesPerCommit = 4)
    def stream() = spark.readStream.format("graft-snapshot")
      .option("startVersion", 0).option("maxFilesPerTrigger", 1)
      .load(root)
      .writeStream.format("parquet").option("path", sink)
      .option("checkpointLocation", ck).start()
    val q1 = stream()
    try q1.processAllAvailable() finally q1.stop() // drains the backfill
    SnapshotStore.append(spark, df(5000 until 5010), root) // v1 while down
    val q2 = stream()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(sink).select("k").as[Long].collect()
    assert(got.length == got.distinct.length, "a restart re-emitted rows")
    assert(got.toSet == (0L until 200L).toSet ++ (5000L until 5010L).toSet)
  }

  test("admission walk tolerates vacuum gaps in the version history") {
    val dir = freshDir("vacgap")
    val root = s"$dir/t"
    SnapshotStore.init(spark, df(0 until 40), root, "k") // v0
    SnapshotStore.append(spark, df(100 until 120), root) // v1
    SnapshotStore.tag(root, "keep", 1L) // retained across vacuum
    SnapshotStore.append(spark, df(200 until 210), root) // v2
    SnapshotStore.append(spark, df(300 until 310), root) // v3
    SnapshotStore.append(spark, df(400 until 410), root) // v4
    SnapshotStore.vacuum(root, keepLast = 2,
      scratchTtlMs = 0L, orphanTtlMs = 0L)
    assert(SnapshotStore.versions(root) == Seq(1L, 3L, 4L),
      "vacuum should leave a gap: tagged v1 + last two")
    // backfill from the tagged version, then tail across the gap —
    // the limited walk must step over missing v2 (retained-version
    // iteration), and the gap batch (1, 3] carries BOTH v2's and
    // v3's appends
    val q = spark.readStream.format("graft-snapshot")
      .option("startVersion", 1).option("maxFilesPerTrigger", 1)
      .load(root)
      .writeStream.format("memory").queryName("vacgap_mem").start()
    try q.processAllAvailable() finally q.stop()
    assert(rows(spark.table("vacgap_mem")) ==
      rows(df(0 until 40)) ++ rows(df(100 until 120)) ++
        rows(df(200 until 210)) ++ rows(df(300 until 310)) ++
        rows(df(400 until 410)))
  }

  test("a version/tag-pinned table refuses to stream") {
    val dir = freshDir("pinned")
    val root = s"$dir/t"
    SnapshotStore.init(spark, df(0 until 10), root, "k")
    // the refusal fires on the stream thread (logical-plan build), so
    // it surfaces through awaitTermination, not start()
    val q = spark.readStream.format("graft-snapshot").option("version", 0)
      .load(root)
      .writeStream.format("noop").start()
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination(60000)
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c => c.getMessage != null &&
      c.getMessage.contains("pinned")))
  }
}
