package graft.operators

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE training on the classic Sennrich et al. fixture — the merge
  * trajectory is hand-computable — plus the two semantic edges that
  * make or break a replace-based formulation: greedy left-to-right
  * overlap and word-boundary protection.
  */
class BpeSpec extends AnyFunSuite with SparkTest {

  private def corpus(words: (String, Int)*) = {
    import spark.implicits._
    // one word per doc row, repeated to its frequency
    words.flatMap { case (w, n) => Seq.fill(n)(w) }.toDF("text")
  }

  test("merge trajectory matches the hand-computed Sennrich fixture") {
    // low×5 lower×2 newest×6 widest×3:
    //   r1 (e,s)=9 ties (s,t)=9 → lexicographic s1 wins
    //   r2 (es,t)=9; r3 (l,o)=7 ties (o,w) → (l,o); r4 (lo,w)=7
    //   r5 (e,w)=6 ties (n,e),(w,est) → "e" < "n" < "w"
    val docs = corpus("low" -> 5, "lower" -> 2, "newest" -> 6, "widest" -> 3)
    val got = Bpe.trainMerges(docs, "text", merges = 5)
    assert(got == Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L),
      (3, "l", "o", 7L), (4, "lo", "w", 7L),
      (5, "e", "w", 6L)))
  }

  test("tokensWith applies the merge chain per word") {
    import spark.implicits._
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"), ("e", "w"))
    val got = Seq("newest lower").toDF("text")
      .select(Bpe.tokensWith(col("text"), merges).as("t"))
      .as[Seq[String]].head()
    assert(got == Seq("n", "ew", "est", "low", "e", "r"))
  }

  test("repeated pairs merge greedily left-to-right") {
    import spark.implicits._
    val got = Seq("aaa").toDF("text")
      .select(Bpe.tokensWith(col("text"), Seq(("a", "a"))).as("t"))
      .as[Seq[String]].head()
    assert(got == Seq("aa", "a"))
  }

  test("merges never cross word boundaries") {
    import spark.implicits._
    val got = Seq("x y").toDF("text")
      .select(Bpe.tokensWith(col("text"), Seq(("x", "y"))).as("t"))
      .as[Seq[String]].head()
    assert(got == Seq("x", "y"))
    // ...but the same pair inside one word does merge
    val one = Seq("xy x").toDF("text")
      .select(Bpe.tokensWith(col("text"), Seq(("x", "y"))).as("t"))
      .as[Seq[String]].head()
    assert(one == Seq("xy", "x"))
  }

  test("overlong words are excluded from training and tokenization") {
    val blob = "z" * (Bpe.MaxWordLen + 1)
    val docs = corpus(blob -> 10, "ab" -> 3)
    val traj = Bpe.trainMerges(docs, "text", merges = 1)
    assert(traj == Seq((1, "a", "b", 3L))) // the blob's (z,z) never counted
    import spark.implicits._
    val toks = Seq(s"$blob ab").toDF("text")
      .select(Bpe.tokensWith(col("text"), traj.map(m => (m._2, m._3))).as("t"))
      .as[Seq[String]].head()
    assert(toks == Seq("ab"))
  }
}
