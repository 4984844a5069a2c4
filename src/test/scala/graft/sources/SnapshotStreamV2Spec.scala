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

  test("schema evolution inside the tailed interval refuses with restart guidance") {
    val dir = freshDir("drift")
    val root = s"$dir/t"
    SnapshotStore.init(spark, df(0 until 50), root, "k")
    val q = spark.readStream.format("graft-snapshot").load(root)
      .writeStream.format("noop").start()
    try {
      SnapshotStore.addColumn(root, "extra", "BIGINT") // v1
      SnapshotStore.append(spark, // v2: wider rows
        df(100 until 120).withColumn("extra", col("k") + 7L), root)
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable(); q.awaitTermination(10000)
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(ex).exists(c => c.getMessage != null &&
        c.getMessage.contains("restart the stream")))
    } finally q.stop()
    // a FRESH stream (new checkpoint) adopts the new schema and reads
    // the widened appends
    val dir2 = s"$dir/sink2"
    val q2 = spark.readStream.format("graft-snapshot")
      .option("startVersion", 2).load(root)
      .writeStream.format("parquet").option("path", dir2)
      .option("checkpointLocation", s"$dir/ck2").start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(dir2)
    assert(got.columns.toSet == Set("k", "n", "extra"))
    assert(got.count() == 70) // snapshot-as-of-v2: 50 original + 20 new
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
