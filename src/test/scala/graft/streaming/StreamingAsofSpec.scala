package graft.streaming

import graft.SparkTest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming as-of enrich must converge to the batch asofJoin on
  * the same events: identical carried (state_ts, state_value) per
  * reading, NULLs before the first state row, inclusive tie at equal
  * timestamps, and batch-boundary independence (state carries across
  * micro-batches).
  */
class StreamingAsofSpec extends AnyFunSuite with SparkTest {

  private val t0 = 1517443200L
  private def ts(m: Long) = new java.sql.Timestamp((t0 + m * 60) * 1000)

  test("advance: ties take the state row, NULL before first state") {
    import StreamingAsof._
    val evs = Seq(
      Ev(1, 100, 1, 9.0),  // reading before any state → NULLs
      Ev(1, 200, 0, 1.0),  // state @200
      Ev(1, 200, 1, 8.0),  // reading tied @200 → sees 1.0 (inclusive)
      Ev(1, 300, 1, 7.0),  // reading @300 → still 1.0
      Ev(1, 400, 0, 2.0),
      Ev(1, 500, 1, 6.0))  // → 2.0
    val (out, st) = advance(None, evs.iterator, 1)
    assert(out.map(e => (e.ts, e.state_value)) == List(
      (100L, None), (200L, Some(1.0)), (300L, Some(1.0)), (500L, Some(2.0))))
    assert(st.contains(Carry(400, 2.0)))
  }

  test("advance: chunked equals one-shot (state carries across batches)") {
    import StreamingAsof._
    val evs = (1 to 20).map { i =>
      if (i % 3 == 0) Ev(5, i * 10L, 0, i.toDouble)
      else Ev(5, i * 10L, 1, i * 100.0)
    }
    val oneShot = advance(None, evs.iterator, 5)
    val (e1, s1) = advance(None, evs.take(7).iterator, 5)
    val (e2, s2) = advance(s1, evs.drop(7).iterator, 5)
    assert(e1 ++ e2 == oneShot._1)
    assert(s2 == oneShot._2)
  }

  test("asofStream over MemoryStream matches batch asofJoin") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    // two keys, state changes interleaved with readings; reading at an
    // exact state timestamp (key 1 @ 40) pins the inclusive tie
    val stateRows = Seq((1L, 10L, 1.0), (1L, 40L, 2.0), (2L, 20L, 5.0))
    val readRows = Seq((1L, 5L, 9.0), (1L, 15L, 8.0), (1L, 40L, 7.0),
      (1L, 60L, 6.0), (2L, 10L, 4.0), (2L, 30L, 3.0))

    val memS = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val memR = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val q = StreamingAsof.asofStream(
        memR.toDF().toDF("key", "ts", "reading"),
        memS.toDF().toDF("key", "ts", "value"))
      .writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").start()

    // one SOURCE per micro-batch, batches in global event-time order:
    // data added to two MemoryStreams before one processAllAvailable
    // can land in separate micro-batches in EITHER order, which would
    // violate the documented per-key event-order arrival assumption
    // (observed flaky before this split)
    memR.addData((1L, ts(5), 9.0), (2L, ts(10), 4.0)) // pre-state → NULL
    q.processAllAvailable()
    memS.addData((1L, ts(10), 1.0), (2L, ts(20), 5.0))
    q.processAllAvailable()
    memR.addData((1L, ts(15), 8.0), (2L, ts(30), 3.0))
    q.processAllAvailable()
    memS.addData((1L, ts(40), 2.0))
    q.processAllAvailable()
    memR.addData((1L, ts(40), 7.0), (1L, ts(60), 6.0))
    q.processAllAvailable()

    val got = spark.table("asof_stream")
      .select(col("key"), col("ts"), col("reading"), col("state_value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), Option(r.get(3)).map(_.asInstanceOf[Double])))
      .sortBy(t => (t._1, t._2)).toList

    // batch twin over the same rows
    val left = readRows.map { case (k, m, v) => (k, ts(m), v) }
      .toDF("key", "ts", "reading")
    val right = stateRows.map { case (k, m, v) => (k, ts(m), v) }
      .toDF("key", "ts", "value")
    val expected = graft.core.TimeJoins.asofJoin(left, right, Seq("key"), "ts")
      .select(col("key"), unix_micros(col("ts")).as("ts"),
        col("reading"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), Option(r.get(3)).map(_.asInstanceOf[Double])))
      .sortBy(t => (t._1, t._2)).toList

    assert(got == expected)
    // spot-pin the semantics: pre-state reading NULL, inclusive tie
    assert(got.head == (1L, (t0 + 5 * 60) * 1000000L, 9.0, None))
    assert(got.find(t => t._1 == 1L && t._2 == (t0 + 40 * 60) * 1000000L)
      .get._4.contains(2.0))
    q.stop()
  }
}
