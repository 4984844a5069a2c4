package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel and cohort-retention analytics over a keyed event
  * log — the product-analytics pair every event warehouse runs daily,
  * here with the repo's determinism discipline so both carry full
  * value oracles.
  *
  * Scale posture: everything aggregates to per-user scalars FIRST
  * (min timestamps, cohort week) and only then joins/counts — the
  * shuffled relations are user-sized, never event-sized, and each
  * funnel stage is one broadcast-eligible join of (user, ts) frames.
  */
object EventAnalytics {

  /** Strictly-ordered funnel: a user converts through stage k iff an
    * event of `stages(k)` exists STRICTLY AFTER their earliest
    * conversion time of stage k-1 (the standard ordered-funnel
    * semantics — a purchase logged before the first view does not
    * count). Returns one row per stage: (stage_idx, stage, n_users,
    * conversion) with conversion = n_users / stage-1 users.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty)
    val spark = events.sparkSession
    // earliest qualifying timestamp per user, stage by stage
    var reached = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol).as("u")).agg(min(col(tsCol)).as("t"))
      .localCheckpoint(eager = false)
    val counts = Seq.newBuilder[(Int, String, DataFrame)]
    counts += ((0, stages.head, reached))
    stages.zipWithIndex.drop(1).foreach { case (st, i) =>
      val nxt = events.filter(col(typeCol) === st)
        .select(col(userCol).as("u"), col(tsCol).as("__ts"))
        .join(reached, "u")
        .filter(col("__ts") > col("t"))
        .groupBy("u").agg(min(col("__ts")).as("t"))
        .localCheckpoint(eager = false)
      counts += ((i, st, nxt))
      reached = nxt
    }
    val rows = counts.result().map { case (i, st, df) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i).as("stage_idx"), lit(st).as("stage"), col("n_users"))
    }
    val all = rows.reduce(_.unionByName(_))
    // conversion vs the PREVIOUS stage — the tiny per-stage frame
    // self-joins at #stages rows
    val base = all.select(col("stage_idx").as("__prev_idx"),
      col("n_users").as("__prev_n"))
    all.join(base, col("stage_idx") === col("__prev_idx") + 1, "left")
      .select(col("stage_idx"), col("stage"), col("n_users"),
        round(col("n_users").cast("double") /
          coalesce(col("__prev_n"), col("n_users")), 6).as("conversion"))
  }

  /** Weekly cohort retention: cohort = Monday-truncated week of the
    * user's FIRST `anchorType` event; a user is retained in offset w
    * iff they have ANY event in cohort_week + w weeks. Returns
    * (cohort_week, week_offset, n_users) — distinct users, the
    * retention-matrix relation.
    */
  def cohorts(events: DataFrame, userCol: String, tsCol: String,
              typeCol: String, anchorType: String): DataFrame = {
    val anchors = events.filter(col(typeCol) === anchorType)
      .groupBy(col(userCol).as("u"))
      .agg(date_trunc("week", min(col(tsCol))).cast("date").as("cohort_week"))
    val activity = events.select(col(userCol).as("u"),
      date_trunc("week", col(tsCol)).cast("date").as("w"))
    activity.join(anchors, "u")
      .filter(col("w") >= col("cohort_week"))
      .select(col("u"), col("cohort_week"),
        (datediff(col("w"), col("cohort_week")) / 7).cast("long")
          .as("week_offset"))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /** First-order Markov transition matrix over per-user event
    * journeys: P(next event type | current) — the path-analysis view
    * behind funnel design ([[funnel]] tests ONE hypothesized path;
    * transitions surface which paths actually exist). One lead()
    * window per user (ordered by (ts, tieCol) — a total order), a
    * pair count, and a types²-sized probability join; no self-join of
    * the event log.
    *
    * @return (from_type, to_type, n, p) — p = n / Σ n over from_type,
    *         rounded to 6
    */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
                  tieCol: String, typeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("from_type").agg(sum("n").as("__t"))
    pairs.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        graft.core.Round6.intRatio6(col("n"), col("__t")).as("p"))
  }
}
