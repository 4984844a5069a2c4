package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Relational core queries over the driver test tables.
  *
  * These exercise the reference's relational surface re-expressed
  * Spark-first (SURVEY.md §2.3/§2.4): time-range scan filters (R1),
  * large equi-joins (R2), broadcast FK dim joins (E2/E3), grouped
  * aggregation with min/max/count/sum (A2-A6), distinct (A7).
  *
  * Numeric note: double sums are order-dependent, and the driver
  * hash-compares against a DuckDB oracle. Monetary aggregates therefore
  * accumulate in DECIMAL (exact, order-independent) and cast the final
  * value back to double so both engines emit bit-identical results.
  */
object Relational {

  /** sum of a 2-decimal monetary double column, exact via decimal. */
  private def msum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(38,6)")).cast("double")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A2-A5: grouped duration/quantity style aggregation (TPC-H Q1 shape).
    "q1_agg" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity").as("sum_qty"),
          msum($"l_extendedprice").as("sum_base_price"),
          msum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
          msum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // R1: range scan filter + global agg (TPC-H Q6 shape); predicate
    // pushdown to the parquet scan is the point.
    "q6_filter" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_shipdate" >= lit("1994-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1995-01-01").cast("timestamp") &&
          $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24)
        .agg(msum($"l_extendedprice" * $"l_discount").as("revenue"),
          count(lit(1)).as("n"))
    }),

    // the six-table join (TPC-H Q5 shape): the multi-way planning
    // exercise — lineitem⋈orders shuffles on the fact key once; every
    // dimension (customer, supplier, nation, region) broadcasts; the
    // local-supplier condition (c_nationkey = s_nationkey) applies
    // after the joins as a cheap filter
    "q5_join" -> ((s, d) => {
      import s.implicits._
      val ord = Tables.orders(s, d)
        .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
      val asia = broadcast(Tables.region(s, d).filter($"r_name" === "ASIA"))
      val nat = broadcast(Tables.nation(s, d)
        .join(asia, $"n_regionkey" === $"r_regionkey"))
      Tables.lineitem(s, d)
        .join(ord, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(Tables.customer(s, d)), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.supplier(s, d)), $"l_suppkey" === $"s_suppkey")
        .filter($"c_nationkey" === $"s_nationkey")
        .join(nat, $"s_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(msum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
        .orderBy(desc("revenue"), $"n_name")
    }),

    // R2 + E2: large-large equi-join then broadcast dim join, grouped agg
    // (TPC-H Q3 shape). customer is small → broadcast; orders⋈lineitem
    // shuffles on the join key only.
    "q3_join" -> ((s, d) => {
      import s.implicits._
      val cust = Tables.customer(s, d).filter($"c_mktsegment" === "BUILDING")
      val ord = Tables.orders(s, d)
        .filter($"o_orderdate" < lit("1995-03-15").cast("timestamp"))
      val li = Tables.lineitem(s, d)
        .filter($"l_shipdate" > lit("1995-03-15").cast("timestamp"))
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(cust), $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey", $"o_orderdate")
        .agg(msum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
        .orderBy(desc("revenue"), $"l_orderkey")
        .limit(10)
    }),

    // E2/E3: FK remap through two broadcast dims (station/sensor remap
    // analogue): supplier → nation → region.
    "q_fk_remap" -> ((s, d) => {
      import s.implicits._
      Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg(count(lit(1)).as("n_suppliers"),
          msum($"s_acctbal").as("total_acctbal"))
        .orderBy($"r_name", $"n_name")
    }),

    // Conditional-share aggregation over a broadcast dim (TPC-H Q14
    // shape) — covers the `part` source; the promo share is a ratio of
    // two DECIMAL-exact sums, divided (and rounded) in double at the end.
    "q14_promo" -> ((s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d)
        .filter($"l_shipdate" >= lit("1995-09-01").cast("timestamp") &&
          $"l_shipdate" < lit("1995-10-01").cast("timestamp"))
      val rev = ($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast("decimal(38,6)")
      li.join(broadcast(Tables.part(s, d)), $"l_partkey" === $"p_partkey")
        .agg(
          round(lit(100.0) *
            sum(when($"p_type".startsWith("PROMO"), rev)
              .otherwise(lit(0).cast("decimal(38,6)"))).cast("double") /
            sum(rev).cast("double"), 6).as("promo_share"),
          count(lit(1)).as("n"))
    }),

    // jsonb-metadata analogue (SURVEY.md §1.1: the reference stores jsonb
    // it never queries; we make it queryable): extract a JSON field from
    // the props column and aggregate.
    "q_json_extract" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .withColumn("k", get_json_object($"props", "$.k").cast("int"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
          min($"k").as("min_k"), max($"k").as("max_k"))
        .orderBy($"event_type")
    }),

    // Exact interpolated quantiles per group (PERCENTILE_CONT
    // semantics, identical interpolation in DuckDB's quantile_cont).
    // At scale swap percentile -> percentile_approx (t-digest sketch,
    // mergeable) — exact quantiles need the full sorted group.
    "q_quantiles" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy($"event_type")
        .agg(
          round(expr("percentile(value, 0.25)"), 6).as("p25"),
          round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.95)"), 6).as("p95"),
          count(lit(1)).as("n"))
        .orderBy($"event_type")
    }),

    // Hierarchical totals via ROLLUP (SURVEY §2.6 names grouping sets
    // as a gap vs general-purpose engines — one partial-aggregated
    // pass produces all levels).
    "q_rollup" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .rollup($"event_type", ($"user_id" % 10).as("bucket"))
        .agg(count(lit(1)).as("n"),
          sum($"value".cast("decimal(38,6)")).cast("double").as("sum_value"))
        .orderBy($"event_type".asc_nulls_first, $"bucket".asc_nulls_first)
    }),

    // Skew-safe exact distinct count (A7 at scale): dedup on
    // (key, value) spreads a hot key across reducers by value; only
    // per-key counts meet. countDistinct would funnel each key's
    // values through one reducer.
    "q_distinct_by_key" -> ((s, d) =>
      graft.core.SkewOps.distinctCountByKey(
          Tables.events(s, d), Seq("event_type"), "user_id")
        .orderBy("event_type")),

    // A7: distinct scan (the reference disabled this as "too slow" in
    // Postgres, tsa/cond_collection.py:131 — trivially cheap in Spark).
    "q_distinct" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d).select($"user_id").distinct().orderBy($"user_id")
    }),

    // A6: observations-summary report analogue
    // (reference database/observations_summary.sql:8-17): month × station
    // × sensor → count/min/max. Here month(ts) × user_id × event_type.
    "q_obs_summary" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy(month($"ts").as("obs_month"), $"user_id", $"event_type")
        .agg(count(lit(1)).as("n_obs"),
          min($"ts").as("first_obs"),
          max($"ts").as("last_obs"))
        .orderBy($"obs_month", $"user_id", $"event_type")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q6_filter" ->
      """SELECT
        |  CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1994-01-01' AND l_shipdate < TIMESTAMP '1995-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q5_join" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |    AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q3_join" ->
      """SELECT l_orderkey, o_orderdate,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q_fk_remap" ->
      """SELECT r_name, n_name, count(*) AS n_suppliers,
        |  CAST(sum(CAST(s_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS total_acctbal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q14_promo" ->
      """SELECT
        |  round(100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
        |      THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))
        |      ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
        |    / CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE),
        |    6) AS promo_share,
        |  count(*) AS n
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1995-09-01'
        |  AND l_shipdate < TIMESTAMP '1995-10-01'""".stripMargin,

    "q_json_extract" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        |  min(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_rollup" ->
      """SELECT event_type, user_id % 10 AS bucket, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY ROLLUP (event_type, user_id % 10)
        |ORDER BY event_type ASC NULLS FIRST, bucket ASC NULLS FIRST""".stripMargin,

    "q_quantiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.25), 6) AS p25,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.95), 6) AS p95,
        |  count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_distinct_by_key" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_distinct_user_id
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_distinct" ->
      "SELECT DISTINCT user_id FROM events ORDER BY user_id",
    "q_obs_summary" ->
      """SELECT CAST(month(ts) AS INT) AS obs_month, user_id, event_type,
        |  count(*) AS n_obs, min(ts) AS first_obs, max(ts) AS last_obs
        |FROM events
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,
  )
}
