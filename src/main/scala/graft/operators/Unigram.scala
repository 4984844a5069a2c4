package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenization (the SentencePiece family — Kudo 2018,
  * public literature) next to [[Bpe]]'s merge-based family: a piece
  * VOCABULARY scored by corpus frequency, then per-word Viterbi
  * segmentation maximizing the summed piece scores.
  *
  * Deliberate simplifications that keep every stage exactly
  * replayable cross-engine (the full-EM trainer refines the same
  * structures but iterates float expectations):
  *   - vocabulary = the `vocabSize` most frequent substrings
  *     (length ≤ [[MaxPiece]]) of corpus words, occurrence-weighted,
  *     PLUS every single character (coverage guarantee);
  *   - piece score = ln(count / total) in INTEGER MICRO-NATS
  *     (round(ln·10⁶) — one transcendental per piece, identical
  *     doubles in every engine, then pure integer DP);
  *   - Viterbi maximizes the micro-nat sum; ties break toward the
  *     LONGER last piece (smaller split point), making the optimum
  *     and the segmentation deterministic.
  *
  * Scale shape: corpus-sized work is ONE token count; candidate
  * extraction, scoring and the DP run over DISTINCT WORDS
  * (vocabulary-scale), and segmenting a corpus is a broadcast-map
  * join of those results back onto tokens — the [[Bpe]] layout.
  */
object Unigram {

  /** Maximum piece length considered (SentencePiece defaults 16;
    * 6 keeps the candidate relation word_len×6-bounded).
    */
  val MaxPiece = 6

  /** Words longer than this skip the DP and segment per character —
    * bounds the unrolled oracle replay; >16-char words are a sliver
    * of natural-language corpora.
    */
  val MaxDpLen = 16

  /** (word, n) distinct lowercased whitespace tokens with counts. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.filter(length(trim(col(textCol))) > 0)
      .select(explode(TextOps.tokens(lower(col(textCol)))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** The scored vocabulary: top-`vocabSize` substrings by
    * occurrence-weighted count (ties → lexicographic), UNIONed with
    * every single character, each with `score_micro` =
    * round(ln(count/total)·10⁶). One row per piece.
    */
  def vocab(docs: DataFrame, textCol: String,
            vocabSize: Int = 500): DataFrame = {
    val words = wordCounts(docs, textCol)
    // every (start, len<=MaxPiece) span of every distinct word,
    // weighted by the word's corpus count — row-local explode at
    // distinct-word scale
    val spans = words
      .select(col("word"), col("n"),
        explode(expr(
          s"""flatten(transform(sequence(1, length(word)),
             |  j -> transform(sequence(j, least(length(word), j + ${MaxPiece - 1})),
             |    i -> substring(word, j, i - j + 1))))""".stripMargin))
          .as("piece"))
      .groupBy("piece").agg(sum("n").as("cnt"))
    val chars = spans.filter(length(col("piece")) === 1)
    val top = spans
      .orderBy(desc("cnt"), col("piece")).limit(vocabSize)
    val all = top.unionByName(chars).groupBy("piece")
      .agg(max("cnt").as("cnt")) // char may appear in both branches
    val total = all.agg(sum("cnt").as("tot"))
    all.crossJoin(broadcast(total))
      .select(col("piece"), col("cnt"),
        round(log(col("cnt").cast("double") / col("tot")) * 1e6)
          .cast("long").as("score_micro"))
  }

  /** Viterbi optimum per distinct word: (word, n, best_micro) — the
    * maximal summed piece score in micro-nats (char-sum fallback past
    * [[MaxDpLen]]). The DP value is what the SQL oracle replays; the
    * actual piece sequence is exposed by [[segment]] and pinned in
    * ScalaTest.
    */
  def wordScores(docs: DataFrame, textCol: String,
                 vocabSize: Int = 500): DataFrame = {
    val v = vocab(docs, textCol, vocabSize)
    val words = wordCounts(docs, textCol)
    val scores = v.select("piece", "score_micro")
    val segUdf = mkSegmentUdf(collectVocab(scores))
    words.select(col("word"), col("n"),
      segUdf(col("word")).getField("_2").as("best_micro"))
  }

  /** Segment every distinct word: (word, n, pieces, best_micro). */
  def segment(docs: DataFrame, textCol: String,
              vocabSize: Int = 500): DataFrame = {
    val v = vocab(docs, textCol, vocabSize)
    val segUdf = mkSegmentUdf(collectVocab(v.select("piece", "score_micro")))
    wordCounts(docs, textCol).select(col("word"), col("n"),
      segUdf(col("word")).getField("_1").as("pieces"),
      segUdf(col("word")).getField("_2").as("best_micro"))
  }

  /** The model is vocab-sized: collect + broadcast is the k-means-
    * centroid boundary, not a data-sized collect.
    */
  private def collectVocab(scores: DataFrame): Map[String, Long] =
    scores.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Compiled Viterbi: integer micro-nat DP, ties to the longer last
    * piece (smaller split j). Unknown characters (absent even from
    * the char vocab — impossible for in-corpus words, defensive for
    * ad-hoc input) score [[UnknownScore]].
    */
  private[operators] def mkSegmentUdf(vocabMap: Map[String, Long]) =
    udf { (word: String) =>
      val L = word.length
      if (L > MaxDpLen) {
        val pieces = word.map(_.toString)
        (pieces, pieces.map(p => vocabMap.getOrElse(p, UnknownScore)).sum)
      } else {
        val best = Array.fill(L + 1)(Long.MinValue)
        val back = new Array[Int](L + 1)
        best(0) = 0L
        var i = 1
        while (i <= L) {
          var j = math.max(0, i - MaxPiece)
          // scan j ascending: strictly-greater keeps the SMALLEST j on
          // ties = the longest last piece
          while (j < i) {
            if (best(j) != Long.MinValue) {
              val s = vocabMap.get(word.substring(j, i)) match {
                case Some(sc) => sc
                case None => if (i - j == 1) UnknownScore else Long.MinValue
              }
              if (s != Long.MinValue && best(j) + s > best(i)) {
                best(i) = best(j) + s
                back(i) = j
              }
            }
            j += 1
          }
          i += 1
        }
        val pieces = Vector.newBuilder[String]
        var stack = List.empty[String]
        var p = L
        while (p > 0) { stack = word.substring(back(p), p) :: stack; p = back(p) }
        (stack.toVector, best(L))
      }
    }

  /** Score for a character absent from the vocabulary. */
  val UnknownScore: Long = -25000000L
}
