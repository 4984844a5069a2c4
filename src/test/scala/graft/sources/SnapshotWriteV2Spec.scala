package graft.sources

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DataSourceV2 WRITE path: `df.write.format("graft-snapshot")`
  * must land commits bit-identical to the API writes, through the
  * same CAS/publish machinery (append rebases, truncate refuses over
  * concurrent commits), with per-file stats folded inline — and the
  * streaming sink must be exactly-once under real engine redelivery
  * (checkpoint restored to an earlier state replays an epoch with the
  * same id; the txn marker makes it a no-op).
  */
class SnapshotWriteV2Spec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"snapw2_$tag").toString + "/t"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("batch append commits a version identical to SnapshotStore.append, stats included") {
    val rootA = freshRoot("appA")
    val rootB = freshRoot("appB")
    val base = (0L until 400L).map(i => (i, i * 3L, s"v$i")).toDF("k", "n", "p")
    val batch = (1000L until 1200L).map(i => (i, i * 3L, s"v$i")).toDF("k", "n", "p")
    for (r <- Seq(rootA, rootB))
      SnapshotStore.init(spark, base, r, "k", filesPerCommit = 4,
        statsCols = Seq("n"), bloomBits = 8192)
    batch.write.format("graft-snapshot")
      .option("filesPerCommit", 4) // pinned: the API twin writes 4
      .mode("append").save(rootA)
    SnapshotStore.append(spark, batch, rootB)
    assert(rows(SnapshotStore.read(spark, rootA)) ==
      rows(SnapshotStore.read(spark, rootB)))
    val (ma, mb) = (SnapshotStore.currentManifest(rootA),
      SnapshotStore.currentManifest(rootB))
    assert(ma.version == 1L && mb.version == 1L)
    // the inline-folded stats agree with the API path's stats scan
    def newStats(m: SnapshotStore.Manifest) = m.files.filter(_.seq == 1L)
      .map(f => (f.minKey, f.maxKey, f.rows, f.stats)).sortBy(_._1)
    assert(newStats(ma) == newStats(mb))
    // blooms carried: every appended key probes positive in some new file
    val withBloom = ma.files.filter(_.seq == 1L)
    assert(withBloom.nonEmpty && withBloom.forall(_.bloom.isDefined))
    assert(withBloom.exists(f => graft.functions.KeyBloom.mightContain(
      java.util.Base64.getDecoder.decode(f.bloom.get), 1100L)))
    // nothing litters staging
    assert(!new java.io.File(s"$rootA/data").listFiles()
      .exists(_.getName.startsWith(".staged-")))
    // files are range-clustered: the requested distribution produced
    // non-overlapping envelopes across the 4 new files
    val envs = ma.files.filter(_.seq == 1L).map(f => (f.minKey, f.maxKey))
      .sortBy(_._1)
    assert(envs.size == 4)
    assert(envs.sliding(2).forall {
      case Seq((_, aMax), (bMin, _)) => aMax < bMin
      case _ => true
    })
  }

  test("mode(overwrite) truncates: new contents only, schema and key config survive") {
    val root = freshRoot("trunc")
    SnapshotStore.init(spark,
      (0L until 100L).map(i => (i, i * 2L)).toDF("k", "n"), root, "k",
      statsCols = Seq("n"))
    val repl = (500L until 550L).map(i => (i, i * 2L)).toDF("k", "n")
    repl.write.format("graft-snapshot").mode("overwrite").save(root)
    val m = SnapshotStore.currentManifest(root)
    assert(m.version == 1L)
    assert(rows(SnapshotStore.read(spark, root)) == rows(repl))
    assert(m.statsCols == Vector("n"))
    // truncate dropped the old files from the manifest (bytes stay
    // for time travel; vacuum owns reclamation)
    assert(m.files.forall(_.seq == 1L))
    assert(SnapshotStore.readAsOf(spark, root, 0L).count() == 100L)
  }

  test("concurrent commit between write job start and commit: append rebases, nothing lost") {
    val root = freshRoot("race")
    SnapshotStore.init(spark,
      (0L until 100L).map(i => (i, s"v$i")).toDF("k", "p"), root, "k")
    // the V2 commit reads currentManifest at commit time, so a commit
    // landed any time before that simply becomes the rebase base —
    // emulate the interleave by committing v1 just before the V2 write
    SnapshotStore.append(spark,
      (200L until 250L).map(i => (i, s"b$i")).toDF("k", "p"), root)
    (300L until 350L).map(i => (i, s"c$i")).toDF("k", "p")
      .write.format("graft-snapshot").mode("append").save(root)
    assert(SnapshotStore.currentManifest(root).version == 2L)
    assert(SnapshotStore.read(spark, root).count() == 200L)
  }

  test("write validation: schema mismatch, null keys, pinned tables refuse") {
    val root = freshRoot("valid")
    SnapshotStore.init(spark,
      (0L until 10L).map(i => (i, s"v$i")).toDF("k", "p"), root, "k")
    // unknown column refuses at analysis (Spark's byName resolution)
    intercept[Exception] {
      Seq((1L, "x", 2L)).toDF("k", "p", "zz")
        .write.format("graft-snapshot").mode("append").save(root)
    }
    // null key fails the job (writer-side rejection)
    intercept[Exception] {
      Seq((Some(1L), "x"), (None, "y"))
        .toDF("k", "p")
        .write.format("graft-snapshot").mode("append").save(root)
    }
    assert(SnapshotStore.currentManifest(root).version == 0L,
      "no failed write may land a version")
    // version-pinned tables are read-only
    intercept[Exception] {
      Seq((1L, "x")).toDF("k", "p").write.format("graft-snapshot")
        .option("version", "0").mode("append").save(root)
    }
  }

  test("streaming sink is exactly-once under engine-level redelivery (restored checkpoint)") {
    val base = java.nio.file.Files.createTempDirectory("snapw2_stream")
    val root = base.resolve("store").toString
    val incoming = base.resolve("in").toString
    val ck = base.resolve("ck").toString
    val ckBak = base.resolve("ck_bak")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(incoming))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT NOT NULL, p STRING")
    SnapshotStore.init(spark,
      (0L until 50L).map(i => (i, s"v$i")).toDF("k", "p"), root, "k")

    def start() = spark.readStream.schema(schema).parquet(incoming)
      .writeStream.format("graft-snapshot")
      .option("txnAppId", "ingest")
      .option("checkpointLocation", ck)
      .start(root)

    def copyDir(src: java.nio.file.Path, dst: java.nio.file.Path): Unit =
      graft.queries.CurationQueries.copyDirRec(src, dst)
    def rmDir(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toVector.reverse
        .foreach(java.nio.file.Files.delete)
    }

    val q1 = start()
    try {
      (1000L until 1050L).map(i => (i, s"a$i")).toDF("k", "p")
        .coalesce(1).write.mode("append").parquet(incoming)
      q1.processAllAvailable() // epoch 0
    } finally q1.stop()
    copyDir(java.nio.file.Paths.get(ck), ckBak) // snapshot BEFORE epoch 1

    val q2 = start()
    try {
      (2000L until 2050L).map(i => (i, s"b$i")).toDF("k", "p")
        .coalesce(1).write.mode("append").parquet(incoming)
      q2.processAllAvailable() // epoch 1
    } finally q2.stop()
    assert(SnapshotStore.read(spark, root).count() == 150L)

    // REDELIVERY exactly as engine recovery does it: restore the
    // checkpoint to its pre-epoch-1 state and restart — the file
    // source replays epoch 1 (same id, same files); the sink's txn
    // marker must land nothing twice
    rmDir(java.nio.file.Paths.get(ck))
    copyDir(ckBak, java.nio.file.Paths.get(ck))
    val q3 = start()
    try q3.processAllAvailable()
    finally q3.stop()

    val versions = SnapshotStore.versions(root)
    assert(versions == (0L to 2L),
      s"each epoch must land exactly once: $versions")
    assert(SnapshotStore.read(spark, root).count() == 150L)
    assert(rows(SnapshotStore.read(spark, root).filter(col("k") >= 2000L))
      == (2000L until 2050L).map(i => Seq(i, s"b$i")).toSet)
  }

  test("driver-side abort cleans every staged file (failing commit task)") {
    val root = freshRoot("abort")
    SnapshotStore.init(spark,
      (0L until 100L).map(i => (i, s"v$i")).toDF("k", "p"), root, "k")
    // a mid-stream null key: some writers may already have committed
    // their staged files before the job fails — driver abort must
    // remove them all
    val poisoned = (200L until 260L).map(i =>
      (if (i == 259L) None else Some(i), s"x$i")).toDF("k", "p")
    intercept[Exception] {
      poisoned.write.format("graft-snapshot").mode("append").save(root)
    }
    val staged = new java.io.File(s"$root/data").listFiles()
      .filter(_.getName.startsWith(".staged-"))
      .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty))
    assert(staged.isEmpty, staged.mkString(","))
    assert(SnapshotStore.currentManifest(root).version == 0L)
  }
}
