package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrich — the live twin of
  * [[graft.core.TimeJoins.asofJoin]]: each reading picks up the LATEST
  * state value with `state.ts <= reading.ts` in its key group
  * (inclusive at equality, NULL before the first state row) — the
  * enrich-readings-with-latest-state join, maintained incrementally.
  *
  * Spark's built-in stream-stream joins cannot express "latest row at
  * or before" (they range-join within watermark windows, fanning out);
  * the natural streaming layout is the SAME union + per-key fill the
  * batch kernel uses, with the carried value living in
  * `flatMapGroupsWithState` state between micro-batches. State per key
  * is ONE (ts, value) pair — not a buffer — so memory is O(keys), the
  * layout that survives an unbounded stream.
  *
  * Within a micro-batch, events sort by (ts, side) with state rows
  * first at equal timestamps — the batch kernel's exact tie rule. Like
  * [[StreamingPack]], arrival is assumed event-time-ordered per key
  * ACROSS batches (enforce upstream with watermark + dedup): a state
  * row older than the carried state timestamp is ignored, and a
  * reading older than it would see newer state than a historical
  * replay — the same late-data posture as the rest of the streaming
  * layer, converged when the feed respects the watermark.
  */
object StreamingAsof {

  /** side 0 = state update (right), side 1 = reading (left). */
  final case class Ev(key: Long, ts: Long, side: Int, v: Double)
  final case class Carry(ts: Long, v: Double)
  final case class Enriched(key: Long, ts: Long, reading: Double,
                            state_ts: Option[Long], state_value: Option[Double])

  /** Pure per-key transition shared with the spec: fold one batch of
    * events into (enriched readings, carried state).
    */
  def advance(state: Option[Carry], events: Iterator[Ev], key: Long)
      : (List[Enriched], Option[Carry]) = {
    var st = state
    val out = List.newBuilder[Enriched]
    for (e <- events) {
      if (e.side == 0) {
        if (st.forall(_.ts <= e.ts)) st = Some(Carry(e.ts, e.v))
      } else {
        out += Enriched(key, e.ts, e.v, st.map(_.ts), st.map(_.v))
      }
    }
    (out.result(), st)
  }

  /** Wire [[advance]] into Structured Streaming. Timestamps ride as
    * epoch MICROSECONDS (the engine's StreamingPack convention) — a
    * second-granular `unix_timestamp` would collapse sub-second
    * reading/state ordering and diverge from the µs-exact batch
    * kernel on real feeds.
    *
    * @param readings streaming (key long, ts timestamp, reading double)
    * @param state    streaming (key long, ts timestamp, value double)
    * @return streaming Dataset of enriched readings; `state_ts` /
    *   `state_value` are NULL until the key's first state row
    */
  def asofStream(readings: DataFrame, state: DataFrame): Dataset[Enriched] = {
    val spark = readings.sparkSession
    import spark.implicits._
    val tagged = state
      .select(col("key").cast("long"), unix_micros(col("ts")).as("ts"),
        lit(0).as("side"), col("value").cast("double").as("v"))
      .unionByName(readings.select(col("key").cast("long"),
        unix_micros(col("ts")).as("ts"), lit(1).as("side"),
        col("reading").cast("double").as("v")))
      .as[Ev]
    tagged
      .groupByKey(_.key)
      .flatMapGroupsWithState[Carry, Enriched](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, events, gs: GroupState[Carry]) =>
          // (ts, side): state rows first at equal ts — inclusive match
          val sorted = events.toVector.sortBy(e => (e.ts, e.side)).iterator
          val (emit, newState) = advance(gs.getOption, sorted, key)
          newState.foreach(gs.update)
          emit.iterator
      }
  }
}
