package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the attribution shape
  * (every click within `window` after a view, per user). This is the
  * one join family batch reformulations can't cover in flight: both
  * sides are unbounded, so completeness REQUIRES the watermark
  * contract.
  *
  * State posture at scale: Spark buffers each side keyed by user in
  * the join state store; the time-range condition plus BOTH
  * watermarks bound eviction — a view is dropped from state once the
  * click watermark passes `view_ts + window`, a click once the view
  * watermark passes `click_ts`. State is therefore O(rows inside the
  * window horizon per key), not O(history). Without the range
  * condition Spark would keep both sides forever; the `require`
  * below makes that unrepresentable.
  */
object StreamingJoin {

  /** Inner-join `views` (user_id, view_ts, view_id) with `clicks`
    * (c_user, click_ts, click_id): same user, click in
    * [view_ts, view_ts + window]. `window` is a SQL interval string
    * ("6 hours"); `lateness` bounds out-of-order arrival on both
    * sides.
    */
  def attributionJoin(views: DataFrame, clicks: DataFrame,
                      window: String, lateness: String = "1 minute"): DataFrame = {
    require(window.trim.nonEmpty)
    views.withWatermark("view_ts", lateness)
      .join(clicks.withWatermark("click_ts", lateness),
        expr(s"user_id = c_user AND click_ts >= view_ts " +
          s"AND click_ts <= view_ts + interval $window"))
      .select(col("user_id"), col("view_id"), col("click_id"),
        col("view_ts"), col("click_ts"))
  }
}
