package graft.sources

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CHANGE-FEED REPLICATION: `applyChanges` (one copy-on-write commit
  * applying a graft-cdc images batch) and the `mode=cdc` streaming
  * sink that keeps a replica key-for-key equal to a source store by
  * consuming only its change feed — exactly-once under engine-level
  * redelivery.
  */
class CdcApplySpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def df(r: Range) = r.map(i => (i.toLong, i * 3L, s"p$i"))
    .toDF("k", "n", "p")

  private def rows(d: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    d.select("k", "n", "p").collect().map(_.toSeq).toSet

  private def freshDir(tag: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(s"cdcapply_$tag")

  test("applyChanges replays a multi-version feed to the source's head state") {
    val dir = freshDir("batch")
    val src = s"$dir/src"
    val dst = s"$dir/dst"
    SnapshotStore.init(spark, df(0 until 100), src, "k") // v0
    // the replica starts as a copy of v0, spread over 8 files so the
    // change set (keys < 60 and >= 500) provably misses some
    SnapshotStore.init(spark, df(0 until 100), dst, "k",
      filesPerCommit = 8)
    // source evolves: v1 merge (updates + inserts), v2 range delete,
    // v3 re-insert of some deleted keys
    SnapshotStore.merge(spark, df(0 until 100).filter(col("k") < 10)
      .withColumn("n", col("n") + 1000L)
      .unionByName(df(500 until 520)), src) // v1
    SnapshotStore.deleteRange(spark, src, 30L, 59L) // v2
    SnapshotStore.append(spark, df(40 until 45)
      .withColumn("p", lit("back")), src) // v3
    // the full feed 0->3 as ONE images batch (collapse matters: k=40
    // was updated? deleted at v2, re-inserted at v3; k=30 deleted)
    val q = spark.readStream.format("graft-cdc")
      .option("startVersion", 0L).option("images", "true").load(src)
    val feedDir = s"$dir/feed"
    val fq = q.writeStream.format("parquet").option("path", feedDir)
      .option("checkpointLocation", s"$dir/ck").start()
    try fq.processAllAvailable() finally fq.stop()
    val feed = spark.read.parquet(feedDir)
    SnapshotStore.applyChanges(spark, feed, dst)
    assert(rows(SnapshotStore.read(spark, dst)) ==
      rows(SnapshotStore.read(spark, src)),
      "replica after one multi-version apply must equal the source head")
    // ONE commit landed on the replica
    assert(SnapshotStore.versions(dst) == Seq(0L, 1L))
    // untouched replica files carried by reference (work scales with
    // the change set): at least one v0 file survives verbatim
    val m = SnapshotStore.currentManifest(dst)
    assert(m.files.exists(_.seq == 0L),
      "files disjoint from the change set must carry by reference")
  }

  test("applyChangesOnce is idempotent under a replayed batch id") {
    val dir = freshDir("once")
    val dst = s"$dir/dst"
    SnapshotStore.init(spark, df(0 until 50), dst, "k")
    val batch = Seq(
      (7L, "update_postimage", 1L, 7777L, "u7"),
      (7L, "update_preimage", 1L, 21L, "p7"), // informational, drops
      (1000L, "insert", 1L, 1L, "new"),
      (3L, "delete", 1L, 9L, "p3"))
      .toDF("k", "_change_type", "version", "n", "p")
    SnapshotStore.applyChangesOnce(spark, batch, dst, "app", 0L)
    val after = rows(SnapshotStore.read(spark, dst))
    // replay the SAME batch id with different (corrupt) content — the
    // marker wins, nothing lands
    SnapshotStore.applyChangesOnce(spark,
      batch.withColumn("n", col("n") + 1L), dst, "app", 0L)
    assert(rows(SnapshotStore.read(spark, dst)) == after)
    assert(SnapshotStore.versions(dst) == Seq(0L, 1L))
    assert(after.contains(Seq(7L, 7777L, "u7")))
    assert(after.contains(Seq(1000L, 1L, "new")))
    assert(!after.exists(_.head == 3L))
  }

  test("mode=cdc streaming sink keeps a replica in lockstep, exactly-once under redelivery") {
    val dir = freshDir("stream")
    val src = s"$dir/src"
    val dst = s"$dir/dst"
    val ck = s"$dir/ck"
    val ckBak = java.nio.file.Paths.get(s"$dir/ck_bak")
    SnapshotStore.init(spark, df(0 until 80), src, "k") // v0
    SnapshotStore.init(spark, df(0 until 80), dst, "k") // replica of v0

    def start() = spark.readStream.format("graft-cdc")
      .option("startVersion", 0L).option("images", "true").load(src)
      .writeStream.format("graft-snapshot")
      .option("mode", "cdc").option("txnAppId", "replica")
      .option("checkpointLocation", ck)
      .start(dst)

    def assertLockstep(): Unit =
      assert(rows(SnapshotStore.read(spark, dst)) ==
        rows(SnapshotStore.read(spark, src)))

    val q1 = start()
    try {
      SnapshotStore.merge(spark, df(0 until 80)
        .filter(col("k") % 7 === 0).withColumn("n", col("n") + 500L)
        .unionByName(df(2000 until 2010)), src) // v1
      q1.processAllAvailable()
      assertLockstep()
      // two source commits in ONE epoch (no drain between): the apply
      // must collapse per key across versions
      SnapshotStore.deleteRange(spark, src, 10L, 29L) // v2
      SnapshotStore.append(spark, df(15 until 18)
        .withColumn("p", lit("back")), src) // v3
      q1.processAllAvailable()
      assertLockstep()
    } finally q1.stop()
    graft.queries.CurationQueries.copyDirRec(
      java.nio.file.Paths.get(ck), ckBak)

    val q2 = start()
    try {
      SnapshotStore.deleteKeys(spark,
        df(0 until 80).filter(col("k") % 13 === 2).select("k"), src) // v4
      q2.processAllAvailable()
      assertLockstep()
    } finally q2.stop()
    val replicaVersions = SnapshotStore.versions(dst)

    // REDELIVERY exactly as engine recovery does it: restore the
    // checkpoint to its pre-v4-epoch state and restart — the feed
    // replays the epoch (same offsets, same images); the txn marker
    // must land nothing twice
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(ck)).iterator()
      .asScala.toVector.reverse.foreach(java.nio.file.Files.delete)
    graft.queries.CurationQueries.copyDirRec(
      ckBak, java.nio.file.Paths.get(ck))
    val q3 = start()
    try q3.processAllAvailable() finally q3.stop()
    assert(SnapshotStore.versions(dst) == replicaVersions,
      "a redelivered epoch must land no new replica version")
    assertLockstep()
    // no transport litter left staged
    assert(!new java.io.File(s"$dst/data").listFiles()
      .exists(_.getName.startsWith(".staged-")),
      "cdc transport files must be cleaned after apply")
  }

  test("mode=cdc refuses a non-images input schema at analysis") {
    val dir = freshDir("badschema")
    val dst = s"$dir/dst"
    SnapshotStore.init(spark, df(0 until 10), dst, "k")
    val ex = intercept[Exception] {
      val q = spark.readStream.format("rate").load()
        .select(col("value").as("k"), col("value").as("n"),
          lit("x").as("p"))
        .writeStream.format("graft-snapshot")
        .option("mode", "cdc")
        .option("checkpointLocation", s"$dir/ck")
        .start(dst)
      try q.awaitTermination(60000) finally q.stop()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c => c.getMessage != null &&
      c.getMessage.contains("images shape")))
  }
}
