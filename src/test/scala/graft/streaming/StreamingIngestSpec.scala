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

  test("q_stream_dedup gate: stream survivors equal batch exactDedup") {
    val sf = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q_stream_dedup")(spark, sf)
      .collect().map(_.getLong(0)).toList
    val batch = graft.operators.Dedup.exactDedup(
        graft.sources.Tables.documents(spark, sf), "doc_id", "text")
      .select("doc_id").orderBy("doc_id")
      .collect().map(_.getLong(0)).toList
    assert(got == batch)
    assert(got.nonEmpty)
  }

  test("streaming session_window converges to batch sessionize") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    def ts(m: Long) = new java.sql.Timestamp(1700000000000L + m * 60000)
    val events = Seq(
      (1L, 0L), (1L, 10L), (1L, 20L),   // session A: 3 events
      (1L, 90L), (1L, 95L),             // session B: 2 events (gap 70 > 30)
      (2L, 5L))                         // session C: 1 event
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val q = mem.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "1 minute")
      .groupBy($"user_id", session_window($"ts", "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"session_window.start".as("session_start"), $"n_events")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    mem.addData(events.map { case (u, m) => (u, ts(m)) }: _*)
    q.processAllAvailable()
    mem.addData((99L, ts(100000))) // advance the watermark far past all sessions
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sessions")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    val batch = graft.core.TimeJoins.sessionize(
        events.map { case (u, m) => (u, ts(m)) }.toDF("user_id", "ts"),
        Seq("user_id"), "ts", gapSeconds = 1800)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(3))).toSet
    assert(streamed == batch)
  }

  test("streaming wide-layout condition eval matches the batch pack") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    def ts(m: Long) = new java.sql.Timestamp((1517443200L + m * 60) * 1000)
    // wide rows: (statid, ts, keli, tie); master = keli = 8 AND tie < -3
    val rows = Seq(
      (1, ts(0), Some(8.0), Some(-5.0)),   // T
      (1, ts(10), Some(8.0), Some(-4.0)),  // T
      (1, ts(20), Some(7.0), Some(-5.0)),  // F
      (1, ts(30), Some(8.0), None),        // NULL (tie missing → 3VL null)
      (1, ts(40), Some(8.0), Some(-6.0)),  // T
      (1, ts(50), Some(2.0), Some(-6.0)))  // F (closes the T island)
    val master = (col("keli") === 8) && (col("tie") < -3)

    val mem = MemoryStream[(Int, java.sql.Timestamp, Option[Double], Option[Double])]
    val q = StreamingCondition.evalWideStream(
        mem.toDF().toDF("statid", "ts", "keli", "tie"),
        "statid", "ts", master, maxMinutes = 30)
      .writeStream.format("memory").queryName("cond_stream")
      .outputMode("append").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cond_stream").orderBy("vfrom")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(3))).toList

    val batch = graft.core.PackRanges.pack(
        rows.toDF("statid", "tfrom", "keli", "tie")
          .select(col("statid").as("block_id"), col("tfrom"), master.as("istrue")),
        maxMinutes = 30)
      .orderBy("vfrom")
      .collect().map(r => (r.getTimestamp(1).getTime * 1000,
        r.getTimestamp(2).getTime * 1000,
        Option(r.get(3)).map(b => if (b.asInstanceOf[Boolean]) 1 else 0).getOrElse(-1)))
      .toList
    // streaming emits all islands the batch kernel produces except the
    // trailing open one (still in state)
    assert(batch.startsWith(streamed) && batch.size - streamed.size <= 1,
      s"streamed=$streamed batch=$batch")
    assert(streamed.nonEmpty)
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

  test("streaming curation: quality gate, PII scrub, post-redaction dedup") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // long enough to clear the 0.5 quality bar (length + stopwords)
    val body = "the quick brown fox jumps over the lazy dog and runs to " +
      "the river in the morning while it is calm and the light of day is soft"
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val docs = mem.toDF().toDF("doc_id", "ts", "text")
    val q = StreamingIngest.curateStream(docs, "ts", "text")
      .writeStream.format("memory").queryName("curate_stream")
      .outputMode("append").start()
    def ts(m: Long) = new java.sql.Timestamp(1700000000000L + m * 60000)
    mem.addData(
      (1L, ts(0), s"$body mail alice@example.com"),
      (2L, ts(1), s"$body mail bob@sample.org"), // same doc after redaction
      (3L, ts(2), "!!! ??? ***"))                // fails the quality gate
    q.processAllAvailable()
    mem.addData((4L, ts(3), s"$body but genuinely different tail content"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("curate_stream")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet == Set(1L, 4L))
    assert(got(1L).endsWith("mail <EMAIL>"))
    // parity with the batch composition on the same rows
    val batch = graft.operators.Dedup.exactDedup(
      Seq(1L -> s"$body mail alice@example.com",
          2L -> s"$body mail bob@sample.org",
          3L -> "!!! ??? ***",
          4L -> s"$body but genuinely different tail content")
        .toDF("doc_id", "text")
        .filter(graft.operators.TextOps.qualityScore(col("text")) >= 0.5)
        .withColumn("text", graft.operators.TextOps.redactPii(col("text"))),
      "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batch == got.keySet)
  }

  test("streaming decontamination drops overlap with the eval set, statelessly") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val evalDoc = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val evalDf = Seq(1L -> evalDoc).toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val q = StreamingIngest.decontaminateStream(docs, evalDf, "text")
      .writeStream.format("memory").queryName("decontam_stream")
      .outputMode("append").start()
    mem.addData(
      (100L, s"unrelated prefix $evalDoc and an unrelated suffix"),
      (101L, "totally different words with no shared runs at all here"))
    q.processAllAvailable()
    mem.addData((102L, "another clean document about spark shuffles and joins"))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("decontam_stream").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(101L, 102L))
    // parity with the batch operator on the same rows
    val batchKept = graft.operators.Dedup.decontaminate(
        Seq(100L -> s"unrelated prefix $evalDoc and an unrelated suffix",
          101L -> "totally different words with no shared runs at all here",
          102L -> "another clean document about spark shuffles and joins")
          .toDF("doc_id", "text"),
        evalDf, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchKept == ids)
  }

  test("image dedup stream: re-encoded duplicates drop across micro-batches") {
    import spark.implicits._
    import graft.operators.MediaCodecs
    implicit val sq = spark.sqlContext
    def px(seed: Long)(i: Int): Int = ((seed * 31 + i) % 256).toInt
    val mem = MemoryStream[(Long, Array[Byte], java.sql.Timestamp)]
    val ts = (m: Int) => new java.sql.Timestamp(1700000000000L + m * 60000L)
    val sink = s"img_dedup_${java.util.UUID.randomUUID().toString.takeWhile(_ != '-')}"
    val q = graft.streaming.StreamingIngest.imageDedupStream(
        mem.toDF().toDF("id", "media", "ts"), "ts", "media")
      .select("id", "dhash_hi", "dhash_lo")
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      mem.addData((1L, MediaCodecs.Bmp.encode(16, 12, px(7)), ts(0)),
        (2L, MediaCodecs.Bmp.encode(16, 12, px(99)), ts(1)))
      q.processAllAvailable()
      // batch 2: id 3 is image 1 RE-ENCODED as PPM (same pixels,
      // different container) — a perceptual dup; id 4 is novel
      mem.addData((3L, MediaCodecs.Ppm.encode(16, 12, px(7)), ts(2)),
        (4L, MediaCodecs.Bmp.encode(16, 12, px(55)), ts(3)))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table(sink).select("id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 4L), s"got $ids")
  }
}
