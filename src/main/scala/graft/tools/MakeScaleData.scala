package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Dev tool: derive a K× replica of a driver-generated SF directory for
  * SCALING measurements (the driver ships sf0.001/0.01/0.1; proving the
  * 2×-of-baseline headroom holds needs one larger point). Copy k of
  * each fact row gets its keys shifted by `k * Off` (FKs shifted
  * consistently, so join selectivity is unchanged), and content columns
  * are deterministically PERTURBED so the statistical shape scales the
  * way a real corpus does instead of degenerating:
  *
  *  - `documents.text`: every token suffixed `~k` — replicas are NOT
  *    near-duplicates of their originals (identical copies would grow
  *    Jaccard/MinHash pair counts quadratically in K, which no real
  *    corpus does; distinct-token replicas keep pair density constant);
  *  - `embeddings.embedding`: component-wise deterministic jitter —
  *    cosine is scale-invariant, so without jitter every replica would
  *    be an exact cos=1 near-dup of its original (same quadratic
  *    blowup); jitter keeps near-dup density constant per copy;
  *  - `events.ts`: shifted k seconds — the TSA layer keys observations
  *    on (station, ts) where station = user_id % 10, so un-shifted
  *    replicas would collapse in the upsert-dedup instead of growing
  *    the observation store 10×;
  *  - `events.user_id`: shifted `k * Off` (Off % 10 == 0 keeps the
  *    station mapping and its distribution identical).
  *
  * region/nation stay fixed (TPC-H dims don't scale with SF).
  *
  * Usage: MakeScaleData <baseSfDir> <outDir> <K> [cpus]
  */
object MakeScaleData {
  /** Key offset per copy: above any base id, divisible by 10. */
  val Off = 10000000L

  def main(args: Array[String]): Unit = {
    val base = args(0)
    val out = args(1)
    val k = args(2).toInt
    val cpus = if (args.length > 3) args(3).toInt else 16
    val spark = GraftSession.local(cpus, cpus)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try build(spark, base, out, k)
    finally spark.stop()
  }

  def build(spark: SparkSession, base: String, out: String, k: Int): Unit = {
    def read(t: String) = spark.read.parquet(s"$base/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")

    /** Union k copies of `df`, transforming copy i>0 with `f`. */
    def replicate(df: DataFrame)(f: (DataFrame, Long) => DataFrame): DataFrame =
      (1 until k).foldLeft(df)((acc, i) => acc.unionByName(f(df, i.toLong)))

    def shift(c: String, i: Long) = col(c) + lit(i * Off)

    write(read("region"), "region")
    write(read("nation"), "nation")
    write(replicate(read("customer"))((d, i) =>
      d.withColumn("c_custkey", shift("c_custkey", i))), "customer")
    write(replicate(read("supplier"))((d, i) =>
      d.withColumn("s_suppkey", shift("s_suppkey", i))), "supplier")
    write(replicate(read("part"))((d, i) =>
      d.withColumn("p_partkey", shift("p_partkey", i))), "part")
    write(replicate(read("orders"))((d, i) =>
      d.withColumn("o_orderkey", shift("o_orderkey", i))
        .withColumn("o_custkey", shift("o_custkey", i))), "orders")
    write(replicate(read("lineitem"))((d, i) =>
      d.withColumn("l_orderkey", shift("l_orderkey", i))
        .withColumn("l_partkey", shift("l_partkey", i))
        .withColumn("l_suppkey", shift("l_suppkey", i))), "lineitem")
    // ts is TIMESTAMP(NANOS) read as long under nanosAsLong in older
    // generator output, native TIMESTAMP(MICROS) in newer — shift each
    // replica by i seconds in the unit the schema actually carries
    val ev = read("events")
    val tsShift: (DataFrame, Long) => org.apache.spark.sql.Column =
      ev.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          (_, i) => col("ts") + lit(i * 1000000000L)
        case _ =>
          (_, i) => col("ts") + expr(s"INTERVAL 1 SECOND") * lit(i)
      }
    write(replicate(ev)((d, i) =>
      d.withColumn("event_id", shift("event_id", i))
        .withColumn("user_id", shift("user_id", i))
        .withColumn("ts", tsShift(d, i))), "events")
    write(replicate(read("documents"))((d, i) =>
      d.withColumn("doc_id", shift("doc_id", i))
        .withColumn("text", regexp_replace(col("text"), "(\\S+)", "$1~" + i))
        .withColumn("n_chars", length(col("text")).cast("long"))), "documents")
    write(replicate(read("embeddings"))((d, i) =>
      d.withColumn("vec_id", shift("vec_id", i))
        .withColumn("embedding", transform(col("embedding"), (v, p) =>
          (v + (pmod(hash(col("vec_id"), lit(i), p), lit(1000)).cast("double")
            / lit(10000.0) - lit(0.05)).cast("float")).cast("float")))), "embeddings")
  }
}
