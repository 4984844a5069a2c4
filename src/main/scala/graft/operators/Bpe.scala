package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer training (Sennrich,
  * Haddow & Birch 2016, "Neural Machine Translation of Rare Words with
  * Subword Units" — the public algorithm every modern LLM tokenizer
  * descends from).
  *
  * The reference has no tokenizer (its DSL tokenizes condition strings,
  * `tsa/condition.py`); this is part of the LLM-pipeline layer: sequence
  * packing (`q_seq_pack`), token-budget mixing (`q_mix_budget`) and the
  * corpus card all consume token counts that a real pipeline derives
  * from its ACTUAL tokenizer, not a heuristic —
  * [[TextOps.bpeishTokenCount]] is the heuristic this replaces.
  *
  * Distributed shape — the 100 TB story:
  *   - ONE corpus scan reduces the text to a distinct-word frequency
  *     table (vocabulary-sized — millions of rows at web scale, never
  *     corpus-sized), which is `localCheckpoint`ed once.
  *   - each merge round is ONE aggregation over that table (adjacent
  *     symbol-pair counts weighted by word frequency) plus a 1-row
  *     argmax collect — the [[LinearModel.fitQualityGd]] "train in T
  *     scans" shape; the chosen merge broadcasts back as a literal.
  *   - the per-round state rewrite is a literal string `replace` on the
  *     space-joined symbol encoding — codegen'd, no UDF, no shuffle
  *     (the table keeps its partitioning; only the agg shuffles
  *     vocabulary-sized pair rows).
  *   - scan-time tokenization applies the learned merge list as a chain
  *     of M literal replaces per document — embarrassingly parallel,
  *     zero state.
  *
  * Symbol-sequence encoding: a word is held as its code points joined
  * by single spaces, padded with one leading and trailing space
  * (`"the"` → `" t h e "`). Applying merge (s1, s2) is then the literal
  * replacement `" s1 s2 " → " s1s2 "`; leftmost-non-overlapping literal
  * replace IS the BPE greedy left-to-right merge order (in
  * `[a, a, a]`, merging (a, a) consumes the shared boundary and yields
  * `[aa, a]` in both formulations). Symbols never contain spaces (words
  * come from a whitespace split), so the encoding is unambiguous — and
  * it replays verbatim in the DuckDB oracle, whose `replace` has the
  * same leftmost-non-overlapping semantics.
  */
object Bpe {

  /** Max word length (code points) admitted to training: one
    * pathological unbroken blob must not turn the per-round pair
    * explosion into that word's length. Standard practice (GPT-2's
    * pre-tokenizer splits far more aggressively); replicated in the
    * oracle SQL.
    */
  val MaxWordLen = 64

  /** The corpus reduced to (spaced, wc): distinct pre-tokenized words
    * in spaced-symbol encoding with corpus frequencies. The ONE scan
    * that touches document bodies.
    */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(col(textCol), "\\s+")).as("word"))
      .filter(length(col("word")).between(1, MaxWordLen))
      .groupBy("word").agg(count(lit(1)).as("wc"))
      .select(
        concat(lit(" "), regexp_replace(col("word"), "(.)", "$1 ")).as("spaced"),
        col("wc"))

  /** Adjacent symbol pairs of one spaced word as (s1, s2) structs. */
  private def pairsOf(spaced: Column): Column = {
    val syms = split(trim(spaced), " ")
    zip_with(
      slice(syms, lit(1), greatest(size(syms) - 1, lit(0))),
      slice(syms, lit(2), greatest(size(syms) - 1, lit(0))),
      (a, b) => struct(a.as("s1"), b.as("s2")))
  }

  private def applyMerge(spaced: Column, s1: String, s2: String): Column =
    call_function("replace", spaced,
      lit(" " + s1 + " " + s2 + " "), lit(" " + s1 + s2 + " "))

  /** One training round over the checkpointed word table: count pairs,
    * pick the (count DESC, s1 ASC, s2 ASC) argmax — the deterministic
    * tie-break both engines share under binary collation.
    */
  private def bestPair(words: DataFrame): Option[(String, String, Long)] =
    words
      .select(explode(pairsOf(col("spaced"))).as("p"), col("wc"))
      .groupBy(col("p.s1").as("s1"), col("p.s2").as("s2"))
      .agg(sum("wc").as("cnt"))
      .orderBy(desc("cnt"), asc("s1"), asc("s2"))
      .limit(1).collect().headOption
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))

  /** Learn `merges` rounds. Returns the merge trajectory — the model
    * artifact AND the training log: (iter, s1, s2, pair_count), where
    * pair_count is the pre-merge corpus count that won the round.
    */
  def trainMerges(docs: DataFrame, textCol: String,
                  merges: Int): Seq[(Int, String, String, Long)] = {
    var words = wordCounts(docs, textCol).localCheckpoint(false)
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var it = 1
    var done = false
    while (it <= merges && !done) {
      bestPair(words) match {
        case Some((s1, s2, cnt)) =>
          out += ((it, s1, s2, cnt))
          // rewrite is tiny (vocab-sized) but its lineage would chain M
          // rounds deep — truncate per round like the CC fixpoint does
          words = words
            .withColumn("spaced", applyMerge(col("spaced"), s1, s2))
            .localCheckpoint(false)
        case None => done = true
      }
      it += 1
    }
    out.result()
  }

  /** The merge trajectory as a DataFrame — the `q_bpe_train` gate. */
  def train(docs: DataFrame, textCol: String, merges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainMerges(docs, textCol, merges).toDF("iter", "s1", "s2", "pair_count")
  }

  /** Tokenize a text column with a learned merge list: the M literal
    * replaces chain per word, then the surviving symbols are the
    * tokens. Scan-time, stateless, codegen'd end to end.
    */
  def tokensWith(text: Column, merges: Seq[(String, String)]): Column = {
    val spaced = concat(lit(" "),
      regexp_replace(
        array_join(
          filter(split(text, "\\s+"),
            w => length(w).between(1, MaxWordLen)),
          " "),
        "(.)", "$1 "))
    // word boundaries survive as DOUBLE spaces (the join separator is
    // itself char-spaced by the regex), so no single-space " s1 s2 "
    // merge pattern can straddle two words; the resulting empty
    // pseudo-symbols are filtered with length > 0 at the end
    val merged = merges.foldLeft(spaced) { case (acc, (s1, s2)) =>
      applyMerge(acc, s1, s2)
    }
    filter(split(trim(merged), " "), s => length(s) > 0)
  }

  /** Corpus token-frequency table under the learned tokenizer — the
    * `q_bpe_tokenize` gate relation (top-k by frequency, fully ordered
    * for determinism).
    */
  def tokenFrequencies(docs: DataFrame, textCol: String, merges: Int,
                       topK: Int = 50): DataFrame = {
    val learned = trainMerges(docs, textCol, merges).map(m => (m._2, m._3))
    docs
      .select(explode(tokensWith(col(textCol), learned)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), asc("token"))
      .limit(topK)
  }
}
