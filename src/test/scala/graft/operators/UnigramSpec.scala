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

  test("randomized: Viterbi optimum == brute-force over all segmentations") {
    val rng = new scala.util.Random(23)
    // random small vocab over {a,b,c}: all chars + some multi-char
    // pieces with random negative micro scores
    val chars = Seq("a", "b", "c").map(_ -> -(1000000L + rng.nextInt(3000000)))
    val multi = (1 to 12).map { _ =>
      val len = 2 + rng.nextInt(4)
      val p = (1 to len).map(_ => ('a' + rng.nextInt(3)).toChar).mkString
      p -> -(500000L + rng.nextInt(4000000))
    }
    val vocab = (chars ++ multi).toMap
    def brute(word: String): Long = {
      // max over all 2^(L-1) cut patterns; pieces must be in vocab or
      // single chars (always are here)
      val L = word.length
      (0 until (1 << (L - 1))).map { mask =>
        var score = 0L; var start = 0; var ok = true
        for (i <- 1 to L) {
          val cut = i == L || ((mask >> (i - 1)) & 1) == 1
          if (cut) {
            val piece = word.substring(start, i)
            vocab.get(piece) match {
              case Some(s) if piece.length <= Unigram.MaxPiece => score += s
              case _ => ok = false
            }
            start = i
          }
        }
        if (ok) score else Long.MinValue
      }.max
    }
    val udfFn = Unigram.mkSegmentUdf(vocab)
    val words = (1 to 40).map(_ =>
      (1 to (1 + rng.nextInt(8))).map(_ => ('a' + rng.nextInt(3)).toChar).mkString)
      .distinct
    import spark.implicits._
    val got = words.toDF("w")
      .select(col("w"), udfFn(col("w")).getField("_2").as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    words.foreach { w =>
      assert(got(w) == brute(w), s"word '$w': dp ${got(w)} vs brute ${brute(w)}")
    }
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
