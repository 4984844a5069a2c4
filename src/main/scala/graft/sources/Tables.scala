package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table readers for the driver test data (TESTDATA.md).
  *
  * Mirrors the reference's source surface (SURVEY.md §2.1 S3-S5): the
  * reference bulk-loads pipe-CSV into Postgres; our engine reads columnar
  * parquet and lets Catalyst push filters/projections into the scan.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, d: String): DataFrame   = table(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame     = table(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame   = table(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame   = table(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame       = table(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame     = table(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame     = table(spark, d, "region")
  /** events.ts has shipped as both parquet TIMESTAMP(NANOS) — which
    * Spark's vectorized reader rejects — and plain TIMESTAMP(MICROS),
    * depending on the generator version. Read with nanosAsLong so the
    * nanos layout surfaces as BIGINT, then normalize on the observed
    * type: longs are floored to microseconds with integer `div` (ns
    * epoch values ~1.7e18 exceed double's 2^53 exact range; a floating
    * divide would corrupt timestamps), native timestamps pass through.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ =>
        df.withColumn("ts",
          df.col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame  = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")
}
