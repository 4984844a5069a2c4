package graft.sources

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed tables must deliver what they exist for: a join on the
  * bucket key with matching bucket counts runs WITHOUT a shuffle on
  * either side (and without re-sorting, since buckets are written
  * sorted).
  */
class BucketedStoreSpec extends AnyFunSuite with SparkTest {

  private val sf = "/root/testdata/sf0.001"

  /** Managed-table locations survive the per-JVM derby metastore; an
    * orphan dir from an earlier test JVM fails CREATE TABLE, so drop
    * both the catalog entry and the location.
    */
  private def reset(tables: String*): Unit = tables.foreach { t =>
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    if (loc.exists()) rm(loc)
  }

  test("bucketed join: no exchange on either side, values intact") {
    reset("b_docs", "b_splits")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    BucketedStore.writeBucketed(
      docs.select("doc_id", "source", "n_chars"), "b_docs", Seq("doc_id"), 8)
    BucketedStore.writeBucketed(
      docs.select(col("doc_id"),
        graft.operators.Sampling.hashSplit(col("doc_id"),
          Seq("train" -> 80, "val" -> 10, "test" -> 10)).as("split")),
      "b_splits", Seq("doc_id"), 8)

    // at test scale the planner would broadcast (also exchange-free, but
    // not what bucketing exists for); force the 100 TB-shaped plan —
    // a sort-merge join over co-located, pre-sorted buckets
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = BucketedStore.read(spark, "b_docs")
        .join(BucketedStore.read(spark, "b_splits"), Seq("doc_id"))
      val physical = joined.queryExecution.executedPlan.toString

      assert(physical.contains("SortMergeJoin"), physical)
      assert(!physical.contains("Exchange"), physical)
      assert(joined.count() == docs.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    val joined = BucketedStore.read(spark, "b_docs")
      .join(BucketedStore.read(spark, "b_splits"), Seq("doc_id"))
    // a non-bucketed version of the same join must produce identical rows
    val plain = docs.select("doc_id", "source", "n_chars")
      .join(docs.select(col("doc_id"),
        graft.operators.Sampling.hashSplit(col("doc_id"),
          Seq("train" -> 80, "val" -> 10, "test" -> 10)).as("split")),
        Seq("doc_id"))
    val a = joined.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = plain.orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("mismatched bucket counts fall back to a correct shuffled join") {
    reset("b_docs4")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    BucketedStore.writeBucketed(
      docs.select("doc_id", "n_chars"), "b_docs4", Seq("doc_id"), 4)
    val joined = BucketedStore.read(spark, "b_docs4")
      .join(BucketedStore.read(spark, "b_docs"), Seq("doc_id"))
    assert(joined.count() == docs.count()) // correctness regardless of layout
  }
}
