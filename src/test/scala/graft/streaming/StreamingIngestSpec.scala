package graft.streaming

import graft.SparkTest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ingestion must produce the batch pipeline's rows: same
  * parse, same remap, same null filter; the natural-key dedup keeps one
  * row per (tfrom, statid) across micro-batches within the watermark.
  */
class StreamingIngestSpec extends AnyFunSuite with SparkTest {

  test("statobs stream: parse + remap + dedup across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stations = Seq((101, 9001), (102, 9002)).toDF("id", "lotjuid")

    val mem = MemoryStream[(Long, String, Int)]
    val raw = mem.toDF().toDF("ID", "AIKA", "ASEMA_ID")
    val q = StreamingIngest.statobsStreamFrom(raw, stations, "2 hours")
      .writeStream.format("memory").queryName("statobs_stream")
      .outputMode("append").start()

    mem.addData(
      (1L, "01.03.2018 10:00:00,000000000", 9001),
      (2L, "01.03.2018 10:00:00,000000000", 9001), // dup natural key
      (3L, "01.03.2018 10:10:00,000000000", 9002),
      (4L, "01.03.2018 10:20:00,000000000", 9999)) // unknown station
    q.processAllAvailable()
    // duplicate arriving in a LATER micro-batch must still dedup (state)
    mem.addData(
      (5L, "01.03.2018 10:00:00,000000000", 9001),
      (6L, "01.03.2018 10:30:00,000000000", 9001))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("statobs_stream")
      .select(col("id"), col("tfrom").cast("long"), col("statid"))
      .orderBy("tfrom", "statid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toList
    // 2018-03-01 10:00 Helsinki (UTC+2, winter) = 08:00 UTC
    val t0 = java.time.Instant.parse("2018-03-01T08:00:00Z").getEpochSecond
    assert(got == List(
      (1L, t0, 101),
      (3L, t0 + 600, 102),
      (6L, t0 + 1800, 101)))
    // matches the batch pipeline on the same rows (modulo which dup wins)
    val batch = graft.ingest.LotjuIngest.statobs(
      Seq((1L, "01.03.2018 10:00:00,000000000", 9001),
        (3L, "01.03.2018 10:10:00,000000000", 9002),
        (4L, "01.03.2018 10:20:00,000000000", 9999),
        (6L, "01.03.2018 10:30:00,000000000", 9001))
        .toDF("ID", "AIKA", "ASEMA_ID"), stations)
      .select(col("id"), col("tfrom").cast("long"), col("statid"))
      .orderBy("tfrom").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toList
    assert(batch == got)
  }

  test("document stream dedup keeps first arrival per fingerprint") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val docs = mem.toDF().toDF("doc_id", "ts", "text")
    val q = StreamingIngest.exactDedupStream(docs, "ts", "text", "1 hour")
      .writeStream.format("memory").queryName("doc_stream")
      .outputMode("append").start()
    def ts(m: Long) = new java.sql.Timestamp(1700000000000L + m * 60000)
    mem.addData((1L, ts(0), "the quick brown fox"), (2L, ts(1), "The  Quick  Brown  FOX"))
    q.processAllAvailable()
    mem.addData((3L, ts(2), "the quick brown fox"), (4L, ts(3), "something else entirely"))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("doc_stream").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // 2 normalizes to 1's fingerprint (case/whitespace), 3 is a re-send
    assert(ids == Set(1L, 4L))
  }
}
