package graft.operators

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unigram tokenizer: hand-computed vocabulary + Viterbi on a toy
  * corpus, the tie policy, and the long-word fallback the sf gates
  * don't reach.
  */
class UnigramSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def micro(p: Double): Long = math.round(math.log(p) * 1e6)

  test("vocab: occurrence-weighted span counts and micro-nat scores") {
    val docs = Seq((1L, "abab abab ab"), (2L, "abab cd")).toDF("doc_id", "text")
    val v = Unigram.vocab(docs, "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // abab:3 ab:1 cd:1 -> spans: a/b/ab 2·3+1=7; aba/abab/ba/bab 3;
    // c/d/cd 1; total 36
    assert(v.keySet == Set("a", "b", "ab", "aba", "abab", "ba", "bab",
      "c", "d", "cd"))
    assert(v("a")._1 == 7 && v("ab")._1 == 7 && v("bab")._1 == 3 &&
      v("cd")._1 == 1)
    assert(v("ab")._2 == micro(7.0 / 36) && v("abab")._2 == micro(3.0 / 36))
  }

  test("segment: Viterbi picks the highest-scoring split; scores replay") {
    val docs = Seq((1L, "abab abab ab"), (2L, "abab cd")).toDF("doc_id", "text")
    val seg = Unigram.segment(docs, "text")
      .collect().map(r => r.getString(0) ->
        (r.getSeq[String](2), r.getLong(3))).toMap
    // "abab" as ONE piece beats ab+ab: ln(3/36) > 2·ln(7/36)
    assert(seg("abab")._1 == Vector("abab"))
    assert(seg("abab")._2 == micro(3.0 / 36))
    assert(seg("ab")._1 == Vector("ab") && seg("ab")._2 == micro(7.0 / 36))
    assert(seg("cd")._1 == Vector("cd"))
    // wordScores agrees with segment's optimum
    val ws = Unigram.wordScores(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(ws == seg.view.mapValues(_._2).toMap)
  }

  test("tie policy: equal totals resolve to the longer last piece") {
    val udfFn = Unigram.mkSegmentUdf(Map("a" -> -10L, "b" -> -10L, "ab" -> -20L))
    val out = Seq("ab").toDF("w").select(udfFn(col("w")).as("r"))
      .select(col("r._1"), col("r._2")).collect()(0)
    assert(out.getSeq[String](0) == Vector("ab") && out.getLong(1) == -20L)
  }

  test("long words (> MaxDpLen) fall back to per-character segmentation") {
    val long = "x" * 20
    val docs = Seq((1L, s"$long yy")).toDF("doc_id", "text")
    val seg = Unigram.segment(docs, "text")
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(seg(long) == Vector.fill(20)("x"))
    // and the score matches 20x the char score computed by the vocab
    val v = Unigram.vocab(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val ws = Unigram.wordScores(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(ws(long) == 20L * v("x"))
  }
}
