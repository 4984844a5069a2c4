package graft.streaming

import graft.SparkTest
import graft.operators.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming SimHash near-dup detection must agree with the batch
  * operator on the same corpus: every batch pair surfaces once the
  * second member arrives, with identical hamming distances.
  */
class StreamingNearDupSpec extends AnyFunSuite with SparkTest {

  private val sf = "/root/testdata/sf0.001"

  test("streaming pairs equal batch simhashPairs on the same corpus") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    // 120 real docs + a planted near-identical copy of doc 0 (one word
    // changed — the batch spec's fixture shape, hamming ~5)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").limit(120).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val t0 = docs.head._2.split(" ").zipWithIndex
      .map { case (w, i) => if (i == 3) "zzz" else w }.mkString(" ")
    val corpus = docs :+ (9999L, t0)

    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val ts0 = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val stream = StreamingNearDup.simhashPairsStream(
      mem.toDF().toDF("doc_id", "text", "ts"), "ts", "doc_id", "text",
      maxHamming = 6)
    val q = stream.writeStream.format("memory").queryName("near_dups")
      .outputMode("append").start()
    // two micro-batches, arrival order scrambled within each
    // all event times inside one lateness horizon: shuffled arrival of
    // rows OLDER than the watermark is data loss by design (the
    // expiry test below pins that), not the parity under test here
    val rows = corpus.zipWithIndex.map { case ((id, text), i) =>
      (id, text, java.sql.Timestamp.from(ts0.plusSeconds(i.toLong)))
    }
    val (b1, b2) = scala.util.Random.javaRandomToRandom(
      new java.util.Random(5)).shuffle(rows.toSeq).splitAt(rows.length / 2)
    mem.addData(b1)
    q.processAllAvailable()
    mem.addData(b2)
    q.processAllAvailable()
    val streamed = spark.table("near_dups")
      .select("id_a", "id_b", "hamming").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    q.stop()

    val batch = Dedup.simhashPairs(
        corpus.toSeq.toDF("doc_id", "text"), "doc_id", "text", maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(batch.exists(p => p._1 == docs.head._1 && p._2 == 9999L),
      "fixture should plant a near-dup")
    assert(streamed == batch, s"stream-only=${streamed -- batch} batch-only=${batch -- streamed}")
  }

  test("incremental stream equals batch verified pairs vs the corpus index") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.functions._

    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val inCorpus = graft.operators.Sampling.hashBucket(col("doc_id"), 100) < 80
    val corpus = docs.filter(inCorpus)
    val idx = Dedup.bandedSignatures(corpus, "doc_id", "text", n = 3)
      .localCheckpoint() // static: the persisted-artifact stand-in
    val batchDocs = docs.filter(!inCorpus)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))

    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val ts0 = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val stream = StreamingNearDup.incrementalStream(
      mem.toDF().toDF("doc_id", "text", "ts"), "ts", "doc_id", "text",
      idx, corpus, n = 3, threshold = 0.8)
    val q = stream.writeStream.format("memory").queryName("inc_dups")
      .outputMode("append").start()
    val rows = batchDocs.zipWithIndex.map { case ((id, text), i) =>
      (id, text, java.sql.Timestamp.from(ts0.plusSeconds(i.toLong)))
    }
    val (b1, b2) = rows.toSeq.splitAt(rows.length / 2)
    mem.addData(b1)
    q.processAllAvailable()
    mem.addData(b2)
    q.processAllAvailable()
    val streamed = spark.table("inc_dups")
      .select("doc_id", "dup_of", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    q.stop()

    val batch = Dedup.incrementalVerifiedPairs(idx, corpus,
        batchDocs.toSeq.toDF("doc_id", "text"), "doc_id", "text",
        n = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(batch.nonEmpty, "fixture should contain cross-split near-dups")
    assert(streamed == batch,
      s"stream-only=${streamed -- batch} batch-only=${batch -- streamed}")
  }

  test("incremental cosine stream equals batch verified pairs vs the index") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.functions._
    import graft.operators.{Sampling, Similarity}

    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val inCorpus = Sampling.hashBucket(col("vec_id"), 100) < 80
    val corpus = embs.filter(inCorpus)
    val idx = Similarity.vectorBuckets(corpus, dim = 64).localCheckpoint()
    val batchVecs = embs.filter(!inCorpus)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))

    val mem = MemoryStream[(Long, Seq[Float], java.sql.Timestamp)]
    val ts0 = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val stream = StreamingNearDup.incrementalCosineStream(
      mem.toDF().toDF("vec_id", "embedding", "ts")
        .withColumn("embedding", col("embedding").cast("array<float>")),
      "ts", idx, corpus, threshold = 0.3, dim = 64)
    val q = stream.writeStream.format("memory").queryName("inc_cos")
      .outputMode("append").start()
    val rows = batchVecs.zipWithIndex.map { case ((id, e), i) =>
      (id, e, java.sql.Timestamp.from(ts0.plusSeconds(i.toLong)))
    }
    val (b1, b2) = rows.toSeq.splitAt(rows.length / 2)
    mem.addData(b1)
    q.processAllAvailable()
    mem.addData(b2)
    q.processAllAvailable()
    val streamed = spark.table("inc_cos")
      .select("vec_id", "dup_of", "cos_sim")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    q.stop()

    val batch = Similarity.incrementalCosineVerifiedPairs(idx, corpus,
        embs.filter(!inCorpus), threshold = 0.3, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(batch.nonEmpty, "fixture should contain cross-split near-dups")
    assert(streamed == batch,
      s"stream-only=${streamed -- batch} batch-only=${batch -- streamed}")
  }

  test("duplicate-id re-delivery refreshes the bucket clock and signature") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val stream = StreamingNearDup.simhashPairsStream(
      mem.toDF().toDF("doc_id", "text", "ts"), "ts", "doc_id", "text",
      maxHamming = 6, lateness = java.time.Duration.ofMinutes(10))
    val q = stream.writeStream.format("memory").queryName("nd_redeliver")
      .outputMode("append").start()
    val ts0 = java.time.Instant.parse("2024-01-01T00:00:00Z")
    def ts(m: Long) = java.sql.Timestamp.from(ts0.plusSeconds(m * 60L))
    val text = "the quick brown fox jumps over the lazy dog again and again"
    mem.addData((1L, text, ts(0)))
    q.processAllAvailable()
    // a batch whose far-future row races the watermark ~2h past doc 1's
    // expiry ALSO re-delivers doc 1 (at-least-once source, fresh
    // ingestion timestamp). An implementation that ignores duplicate
    // ids leaves the bucket's clock at ts(0): the bucket then expires
    // on the very next watermark tick despite live traffic, and a
    // timeout set from the stale clock can land below the watermark
    // (query-killing) — every arrival must refresh the clock
    mem.addData(
      (2L, "completely different words entirely unrelated content here now", ts(120)),
      (1L, text, ts(119)))
    q.processAllAvailable()
    // the bucket survived its original horizon: an identical doc
    // arriving now still pairs with doc 1
    mem.addData((3L, text, ts(121)))
    q.processAllAvailable()
    val pairs = spark.table("nd_redeliver")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(pairs.contains((1L, 3L)),
      s"doc 3 should pair with doc 1 (bucket kept alive by re-delivery): $pairs")
  }

  test("bucket state expires past the lateness horizon") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val stream = StreamingNearDup.simhashPairsStream(
      mem.toDF().toDF("doc_id", "text", "ts"), "ts", "doc_id", "text",
      maxHamming = 6, lateness = java.time.Duration.ofMinutes(10))
    val q = stream.writeStream.format("memory").queryName("nd_expire")
      .outputMode("append").start()
    val ts0 = java.time.Instant.parse("2024-01-01T00:00:00Z")
    def ts(m: Long) = java.sql.Timestamp.from(ts0.plusSeconds(m * 60L))
    val text = "the quick brown fox jumps over the lazy dog again and again"
    // doc 1 arrives; the watermark then advances ~2 hours past it, so
    // its bucket state must expire...
    mem.addData((1L, text, ts(0)))
    q.processAllAvailable()
    mem.addData((2L, "completely different words entirely unrelated content here now", ts(120)))
    q.processAllAvailable()
    // ...and an identical doc arriving later pairs with nothing
    mem.addData((3L, text, ts(125)))
    q.processAllAvailable()
    val pairs = spark.table("nd_expire").collect()
    q.stop()
    assert(!pairs.exists(r => r.getLong(0) == 1L),
      s"doc 1's bucket state should have expired: ${pairs.mkString(",")}")
  }
}
