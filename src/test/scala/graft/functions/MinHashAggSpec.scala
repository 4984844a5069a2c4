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
