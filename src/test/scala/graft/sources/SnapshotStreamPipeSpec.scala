package graft.sources

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two halves of the V2 streaming story composed END TO END:
  * a graft store is BOTH ends of a structured-streaming pipeline —
  * `readStream.format("graft-snapshot")` (backfill-then-tail) feeding
  * `writeStream.format("graft-snapshot")` (epoch-txn-marked appends) —
  * exactly-once across engine-level redelivery; and the same pipeline
  * addressed purely by SQL NAME (`readStream.table` / `.toTable`
  * through the TableCatalog).
  */
class SnapshotStreamPipeSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def df(r: Range) = r.map(i => (i.toLong, i * 3L)).toDF("k", "n")

  test("store-to-store pipeline: backfill + tail, exactly-once under redelivery") {
    val base = java.nio.file.Files.createTempDirectory("snappipe")
    val src = base.resolve("src").toString
    val dst = base.resolve("dst").toString
    val ck = base.resolve("ck").toString
    val ckBak = base.resolve("ck_bak")
    SnapshotStore.init(spark, df(0 until 200), src, "k",
      filesPerCommit = 4) // v0: the backfill
    SnapshotStore.init(spark, // dst: empty declared schema
      Seq.empty[(Long, Long)].toDF("k", "n2"), dst, "k")

    def start() = spark.readStream.format("graft-snapshot")
      .option("startVersion", 0).option("maxFilesPerTrigger", 2)
      .load(src)
      .select(col("k"), (col("n") * 2L).as("n2"))
      .writeStream.format("graft-snapshot")
      .option("txnAppId", "pipe")
      .option("checkpointLocation", ck)
      .start(dst)

    val q1 = start()
    try q1.processAllAvailable() finally q1.stop() // drains the backfill
    val expected0 = (0L until 200L).map(i => (i, i * 6L)).toSet
    def dstRows() = SnapshotStore.read(spark, dst)
      .select("k", "n2").as[(Long, Long)].collect().toSet
    assert(dstRows() == expected0)

    // snapshot the checkpoint, tail one more version, then REDELIVER
    // it the way engine recovery does: restore the checkpoint and
    // restart — the source replays the epoch (same offsets, same
    // files), the sink's txn marker lands nothing twice
    graft.queries.CurationQueries.copyDirRec(
      java.nio.file.Paths.get(ck), ckBak)
    SnapshotStore.append(spark, df(1000 until 1040), src) // v1
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val expected1 = expected0 ++ (1000L until 1040L).map(i => (i, i * 6L))
    assert(dstRows() == expected1)

    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(ck)).iterator()
      .asScala.toVector.reverse.foreach(java.nio.file.Files.delete)
    graft.queries.CurationQueries.copyDirRec(
      ckBak, java.nio.file.Paths.get(ck))
    val q3 = start()
    try q3.processAllAvailable() finally q3.stop()
    assert(dstRows() == expected1, "redelivered epochs must land nothing twice")
    val dstKeys = SnapshotStore.read(spark, dst).select("k")
      .as[Long].collect()
    assert(dstKeys.length == dstKeys.distinct.length,
      "duplicate rows after redelivery")
  }

  test("streaming by SQL name: readStream.table feeds writeStream.toTable") {
    val wh = java.nio.file.Files.createTempDirectory("snappipe_wh").toString
    val ck = java.nio.file.Files.createTempDirectory("snappipe_ck2").toString
    spark.conf.set("spark.sql.catalog.gpipe",
      "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gpipe.warehouse", wh)
    spark.sql("CREATE NAMESPACE gpipe.db")
    spark.sql("""CREATE TABLE gpipe.db.src (k BIGINT NOT NULL, n BIGINT)
                |TBLPROPERTIES ('key' = 'k')""".stripMargin)
    spark.sql("""CREATE TABLE gpipe.db.dst (k BIGINT NOT NULL, n BIGINT)
                |TBLPROPERTIES ('key' = 'k')""".stripMargin)
    spark.sql(
      "INSERT INTO gpipe.db.src SELECT id AS k, id * 3 AS n FROM range(0, 100)")
    val q = spark.readStream
      .option("startVersion", 0) // backfill v0 (empty) + v1 (the insert)
      .table("gpipe.db.src")
      .writeStream
      .option("txnAppId", "sqlpipe")
      .option("checkpointLocation", ck)
      .toTable("gpipe.db.dst")
    try {
      q.processAllAvailable()
      spark.sql(
        "INSERT INTO gpipe.db.src SELECT id AS k, id AS n FROM range(5000, 5020)")
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.sql("SELECT k, n FROM gpipe.db.dst")
      .as[(Long, Long)].collect().toSet
    val want = (0L until 100L).map(i => (i, i * 3L)).toSet ++
      (5000L until 5020L).map(i => (i, i)).toSet
    assert(got == want)
  }

  test("streaming a time-travel-pinned catalog table refuses") {
    val wh = java.nio.file.Files.createTempDirectory("snappipe_wh3").toString
    spark.conf.set("spark.sql.catalog.gpipe3",
      "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gpipe3.warehouse", wh)
    spark.sql("CREATE NAMESPACE gpipe3.db")
    spark.sql("""CREATE TABLE gpipe3.db.t (k BIGINT NOT NULL, n BIGINT)
                |TBLPROPERTIES ('key' = 'k')""".stripMargin)
    spark.sql("INSERT INTO gpipe3.db.t SELECT id, id FROM range(0, 10)")
    // a pinned read must refuse to stream regardless of HOW it was
    // pinned. Reader time-travel options are refused by Spark's own
    // analysis ("time travel is not allowed in streaming") before the
    // table is consulted; the scan-level `pinned` guard (covered in
    // SnapshotStreamV2Spec) backstops the path-option route.
    val ex = intercept[Exception] {
      val q = spark.readStream.option("versionAsOf", 0)
        .table("gpipe3.db.t")
        .writeStream.format("noop").start()
      try q.awaitTermination(60000) finally q.stop()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c => c.getMessage != null &&
      (c.getMessage.contains("pinned") ||
        c.getMessage.toLowerCase.contains("time travel"))))
  }
}
