package graft.sources

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A concurrent RENAME COLUMN must REFUSE any commit whose staged
  * files were physically written under the pre-rename column names —
  * rebasing them past the rename would stamp them into the post-
  * rename era, where era-split readers project the NEW physical name
  * out of files storing the OLD one (the renamed column silently
  * reading NULL). Also pins the stream's rename SERVING: a
  * checkpointed restart whose backlog predates an adopted rename
  * reads it era-translated (values under the view's names) — only a
  * rename the view has not adopted refuses, with the achievable
  * restart-to-adopt advice. Plus the CDC maxDeltaBytes config
  * validation.
  */
class RenameRaceSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"renrace_$tag").toString + "/t"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private val base =
    (0L until 40L).map(i => (i, i.toInt, s"v$i")).toDF("k", "n", "p")

  test("an append staged before a rename refuses to rebase across it") {
    val root = freshRoot("stage")
    SnapshotStore.init(spark, base, root, "k", filesPerCommit = 2) // v0
    val staged = SnapshotStore.stageAppend(spark,
      Seq((100L, 1, "x")).toDF("k", "n", "p"), root) // physical name 'p'
    SnapshotStore.renameColumn(root, "p", "q") // v1 lands in the gap
    val e = intercept[java.util.ConcurrentModificationException] {
      SnapshotStore.publish(root, staged)
    }
    assert(e.getMessage.contains("rename"))
    // the refused stage aborts cleanly; the table is intact under the
    // new name (no mis-era'd file ever landed)
    SnapshotStore.abort(root, staged)
    assert(rows(SnapshotStore.read(spark, root)) ==
      rows(base.withColumnRenamed("p", "q")))
    // a FRESH stage against the renamed schema publishes fine
    SnapshotStore.append(spark,
      Seq((100L, 1, "x")).toDF("k", "n", "q"), root)
    assert(SnapshotStore.read(spark, root).where(col("k") === 100L)
      .select("q").as[String].collect().toSeq == Seq("x"))
  }

  test("a V2 staged-entry commit planned before a rename refuses; a fresh plan lands") {
    val root = freshRoot("entries")
    SnapshotStore.init(spark, base, root, "k", filesPerCommit = 2) // v0
    val planRenames = SnapshotStore.currentManifest(root).renames // stage time
    SnapshotStore.renameColumn(root, "p", "q") // v1: the race
    val e = intercept[java.util.ConcurrentModificationException] {
      SnapshotStore.commitStagedEntries(root, Vector.empty,
        truncate = false, stagedRenames = Some(planRenames))
    }
    assert(e.getMessage.contains("rename"))
    // planned against the CURRENT rename log: commits
    val m = SnapshotStore.commitStagedEntries(root, Vector.empty,
      truncate = false,
      stagedRenames = Some(SnapshotStore.currentManifest(root).renames))
    assert(m.version == 2L)
  }

  test("a checkpointed restart SERVES pre-rename backlog era-translated; only an unadopted rename refuses") {
    val root = freshRoot("dir")
    val dir = java.nio.file.Files.createTempDirectory("renrace_ck")
    SnapshotStore.init(spark, base, root, "k", filesPerCommit = 2) // v0
    // drain v0 with a checkpoint, then stop
    def start() = spark.readStream.format("graft-snapshot")
      .option("startVersion", 0).option("maxFilesPerTrigger", 1).load(root)
      .writeStream.format("parquet")
      .option("path", dir.resolve("o").toString)
      .option("checkpointLocation", dir.resolve("ck").toString)
      .start()
    val q0 = start()
    try q0.processAllAvailable() finally q0.stop()
    // TWO backlog versions land BEFORE the rename, while the stream
    // is down. The checkpointed restart re-resolves the view WITH the
    // rename; its first batches are pre-rename manifests whose files
    // store the OLD physical name — the era-split scans serve their
    // values under the view's NEW name (this used to brick the
    // stream with an unachievable restart-to-adopt refusal).
    SnapshotStore.append(spark,
      Seq((200L, 2, "a")).toDF("k", "n", "p"), root) // v1
    SnapshotStore.append(spark,
      Seq((210L, 2, "a2")).toDF("k", "n", "p"), root) // v2
    SnapshotStore.renameColumn(root, "p", "q") // v3
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // the sink holds pre-rename epochs (column p) and post-restart
    // epochs (column q) — merge and check the backlog VALUES landed
    // under the view's name
    val served = spark.read.option("mergeSchema", "true")
      .parquet(dir.resolve("o").toString)
    val backlog = served.filter(col("k").isin(200L, 210L))
      .select("k", "q").collect().map(r => r.getLong(0) -> r.getString(1))
      .toMap
    assert(backlog == Map(200L -> "a", 210L -> "a2"),
      s"pre-rename backlog must serve under the view's name: $backlog")
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // the other direction keeps restart-to-adopt: the stream is LIVE
    // (view resolved pre-rename) when a rename + post-rename commit
    // land — a checkpointed restart genuinely adopts the new names
    val q2 = spark.readStream.format("graft-snapshot").load(root)
      .writeStream.format("memory").queryName("renrace_pre").start()
    q2.processAllAvailable() // idle tail at the current head
    SnapshotStore.renameColumn(root, "q", "r") // v4
    SnapshotStore.append(spark,
      Seq((300L, 3, "b")).toDF("k", "n", "r"), root) // v5
    val err2 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q2.processAllAvailable()
      finally q2.awaitTermination(30000)
      q2.exception.foreach(throw _)
    }
    q2.stop()
    assert(msgs(err2).mkString("\n").contains("restart the stream"))
  }

  test("cdc maxDeltaBytes validates at construction on both option surfaces") {
    val root = freshRoot("cdcopt")
    SnapshotStore.init(spark, base, root, "k", filesPerCommit = 2)
    // table-level option (path surface, validated in forStore)
    val e1 = intercept[IllegalArgumentException] {
      spark.readStream.format("graft-cdc")
        .option("maxDeltaBytes", 0L).load(root)
        .writeStream.format("memory").queryName("renrace_cdc0").start()
    }
    assert(e1.getMessage.contains("maxDeltaBytes"))
    // reader-level option: the catalog-name surface hands options to
    // the SCAN (loadTable sees none), validated in newScanBuilder —
    // before this guard .option("maxDeltaBytes", 0) failed every
    // non-empty batch with the confusing over-budget message
    val wh = java.nio.file.Files.createTempDirectory("renrace_wh").toString
    spark.conf.set("spark.sql.catalog.rrcat", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.rrcat.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS rrcat.db")
      base.writeTo("rrcat.db.t").tableProperty("key", "k").create()
      val e2 = intercept[Exception] {
        val q = spark.readStream.option("maxDeltaBytes", "-1")
          .table("rrcat.db.t.changes")
          .writeStream.format("memory").queryName("renrace_cdc1").start()
        try q.processAllAvailable() finally q.stop()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e2).mkString("\n").contains("maxDeltaBytes"))
    } finally spark.conf.unset("spark.sql.catalog.rrcat")
  }
}
