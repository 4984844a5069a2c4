package graft.streaming

import graft.SparkTest
import graft.functions.TextExpressions
import graft.operators.{SequencePack, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The stateless curation transforms (context-window chunking, HTML
  * text extraction, NFC normalization) must be directly usable in a
  * Structured Streaming pipeline — no state store, no watermark, no
  * output-mode restriction — and produce EXACTLY the batch rows on the
  * same input. This is the streaming posture for the per-row half of
  * the curation pipeline: run it map-side in the stream, leave the
  * stateful half (dedup, CC) to the batch/streaming-near-dup layers.
  */
class StreamingTransformsSpec extends AnyFunSuite with SparkTest {

  private def streamVsBatch(rows: Seq[(String, String)],
                            f: DataFrame => DataFrame): Unit = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val name = "transforms_" + System.nanoTime()
    val mem = MemoryStream[(String, String)]
    val q = f(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    val (a, b) = rows.splitAt(rows.length / 2)
    mem.addData(a: _*); q.processAllAvailable()
    mem.addData(b: _*); q.processAllAvailable()
    q.stop()
    val got = spark.table(name).collect().map(_.toSeq).toSet
    val want = f(rows.toDF("doc_id", "text")).collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)
  }

  test("chunkDocuments streams append-mode with batch parity") {
    val docs = Seq(
      "d1" -> ("tok " * 23).trim, // 23 tokens -> 3 chunks at stride 8
      "d2" -> "a b c",            // shorter than one window
      "d3" -> "",                 // no tokens -> no chunks
      "d4" -> ("word " * 10).trim)
    streamVsBatch(docs,
      df => SequencePack.chunkDocuments(df, "doc_id", "text",
        maxTokens = 10, overlap = 2))
  }

  test("broadcast-model LM scoring streams statelessly with batch parity") {
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val model = graft.operators.NgramLm.fitModel(corpus, "doc_id", "text",
      graft.operators.Sampling.hashBucket(col("doc_id"), 100) < 80)
    val rows = corpus.select("doc_id", "text").limit(50).collect()
      .map(r => (r.getLong(0).toString, r.getString(1))).toSeq
    streamVsBatch(rows, df =>
      graft.operators.NgramLm.scoreWith(df, "doc_id", "text", model))
  }

  test("trained linear quality model scores a stream statelessly with batch parity") {
    // fit on the standing corpus (batch), apply to arriving docs — the
    // same ship-the-model-as-literals posture as the LM broadcast test;
    // the 4-double model needs no join and no state store
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val w = graft.operators.LinearModel.fitWeights(corpus)
    val rows = corpus.select("doc_id", "text").limit(50).collect()
      .map(r => (r.getLong(0).toString, r.getString(1))).toSeq
    streamVsBatch(rows, df =>
      graft.operators.LinearModel.predictQuality(df, w, idCol = "doc_id"))
  }

  test("htmlToText + nfc_normalize stream as plain projections") {
    val docs = Seq(
      "d1" -> "<p>Hello &amp; <b>world</b></p><script>var x=1;</script>",
      "d2" -> "café <style>p{}</style> déjà",
      "d3" -> "&amp;lt; stays literal &lt;")
    streamVsBatch(docs, df => df.select(col("doc_id"),
      TextExpressions.nfcNormalize(TextOps.htmlToText(col("text")))
        .as("clean")))
  }
}
