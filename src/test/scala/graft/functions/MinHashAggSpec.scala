package graft.functions

import graft.SparkTest
import graft.operators.{Dedup, TextOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native sketch aggregate must agree with the compiled per-row
  * signature UDF (same coefficient stream) and obey the mergeability
  * law that makes sketches roll up without rescanning.
  */
class MinHashAggSpec extends AnyFunSuite with SparkTest {

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("minhash_agg per doc == minhashSignatureUdf on the same hashes") {
    MinHashAgg.register(spark, "minhash_agg64", 64)
    val hashed = docs
      .withColumn("shingles", TextOps.wordShingles(col("text"), 3))
      .filter(size(col("shingles")) > 0)
      .withColumn("hashes", transform(col("shingles"), s => crc32(encode(s, "UTF-8"))))
    val viaUdf = hashed
      .select(col("doc_id"), Dedup.minhashSignatureUdf(64)(col("hashes")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val viaAgg = hashed
      .select(col("doc_id"), explode(col("hashes")).as("h"))
      .groupBy("doc_id").agg(expr("minhash_agg64(h)").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    assert(viaAgg == viaUdf)
  }

  test("GraftExtensions injects the functions into a fresh session's SQL") {
    import org.apache.spark.sql.SparkSession
    spark.sparkContext // ensure the shared context exists
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // new session over the SAME SparkContext; do NOT stop it (that
      // would stop the shared context for the rest of the suite).
      // withExtensions = the programmatic form of
      // --conf spark.sql.extensions=graft.functions.GraftExtensions
      // (the static conf is only read at SparkContext creation)
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      val r = s2.sql(
        """SELECT fvec_cosine(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)),
          |                   array(CAST(1 AS FLOAT), CAST(0 AS FLOAT))) AS c,
          |  minhash_agg(h)[0] AS m,
          |  arr_jaccard(array('a', 'b', 'c'), array('b', 'c', 'd')) AS j,
          |  zorder2(3, 5) AS zz
          |FROM VALUES (CAST(7 AS BIGINT)), (CAST(9 AS BIGINT)) AS t(h)""".stripMargin)
        .head()
      assert(r.getDouble(0) == 1.0)
      assert(r.getLong(1) > 0)
      assert(r.getDouble(2) == 0.5)
      assert(r.getLong(3) == 39L) // interleave(0b011, 0b101)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("mergeability: whole-corpus sketch == elementwise min of group sketches") {
    MinHashAgg.register(spark, "minhash_agg16", 16)
    val h = docs
      .select(col("source"), explode(TextOps.wordShingles(col("text"), 3)).as("g"))
      .withColumn("h", conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long"))
    val perSource = h.groupBy("source").agg(expr("minhash_agg16(h)").as("sig"))
      .collect().map(_.getSeq[Long](1).toArray)
    val whole = h.agg(expr("minhash_agg16(h)").as("sig"))
      .head().getSeq[Long](0).toList
    val merged = perSource.reduce((a, b) =>
      a.zip(b).map { case (x, y) => math.min(x, y) }).toList
    assert(merged == whole)
  }
}
