package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for corpus curation at 100 TB:
  * exact (fingerprint groupBy), n-gram Jaccard (inverted-index join),
  * MinHash+LSH (shingle → signature → band-bucket join → verify),
  * SimHash (bit-vote signature → band join → hamming), and
  * embedding-cosine near-dup (see [[Similarity]]).
  *
  * Scale posture, per operator:
  *   - exact: shuffles 32-byte md5 keys, not document bodies;
  *   - jaccard: the shingle join explodes on hot shingles — cap document
  *     frequency (`maxShingleDf`) to drop stop-shingles, the standard
  *     inverted-index pruning; candidate pair counts stay near-linear;
  *   - minhash: fixed-width signatures (numPerm ints) replace documents
  *     in the shuffle; band buckets bound join fan-out; final verify
  *     joins texts only for candidates.
  */
object Dedup {

  /** Exact dedup: one survivor (min id) per fingerprint.
    * Returns (idCol, textCol…) of survivors only.
    */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = TextOps.fingerprint(col(textCol))
    val w = Window.partitionBy("__fp").orderBy(col(idCol))
    df.withColumn("__fp", fp)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__fp", "__rn")
  }

  /** Distinct word-`n`-gram shingle relation `(id, shingle)`. */
  def shingleRelation(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"),
        explode(TextOps.wordShingles(col(textCol), n)).as("shingle"))

  /** Exact n-gram Jaccard near-dup pairs via inverted-index join.
    *
    * @param maxShingleDf drop shingles appearing in more than this many
    *   docs (0 = keep all — exact semantics, used under the oracle)
    * @return (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String, n: Int,
                   threshold: Double, maxShingleDf: Int = 0): DataFrame = {
    val sh0 = shingleRelation(df, idCol, textCol, n)
    val sh =
      if (maxShingleDf <= 0) sh0
      else {
        val hot = sh0.groupBy("shingle").count()
          .filter(col("count") > maxShingleDf).select("shingle")
        sh0.join(hot, Seq("shingle"), "left_anti")
      }
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_shingles"))
    val a = sh.select(col("id").as("id_a"), col("shingle"))
    val b = sh.select(col("id").as("id_b"), col("shingle"))
    val common = a.join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("id", "id_a")
        .withColumnRenamed("n_shingles", "size_a"), Seq("id_a"))
      .join(sizes.withColumnRenamed("id", "id_b")
        .withColumnRenamed("n_shingles", "size_b"), Seq("id_b"))
      .withColumn("jaccard", round(
        col("n_common").cast("double") /
          (col("size_a") + col("size_b") - col("n_common")).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash signature: for permutation i, `min((a_i*h + b_i) mod p)` over
    * the crc32 shingle hashes. Deterministic LCG-derived coefficients —
    * no runtime randomness (replayable plans).
    */
  def minhashSignature(shingles: Column, numPerm: Int): Column = {
    val p = 4294967311L // smallest prime > 2^32
    val hashed = transform(shingles, s => crc32(encode(s, "UTF-8")))
    val mins = (0 until numPerm).map { i =>
      // a < 2^30 keeps h*a (h < 2^32) under 2^62 — no ANSI long overflow
      val a = lcg(2 * i) % ((1L << 30) - 1) + 1
      val b = lcg(2 * i + 1) % p
      array_min(transform(hashed, h => (h * lit(a) + lit(b)) % lit(p)))
    }
    array(mins: _*)
  }

  private def lcg(i: Int): Long = {
    // splitmix64-ish deterministic stream, truncated positive
    var z = (i + 1).toLong * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    (z ^ (z >>> 31)) & 0x7FFFFFFFFFFFFFFFL
  }

  /** MinHash+LSH near-dup pairs: signatures → band buckets → candidate
    * pairs (distinct) → exact-Jaccard verification ≥ threshold.
    *
    * bands × rowsPerBand must equal numPerm. With 16 bands × 4 rows,
    * P(candidate | j=0.8) ≈ 0.9998 — the verify step then makes the
    * output exact-precision (recall is the only approximation).
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String, n: Int,
                      threshold: Double, numPerm: Int = 64,
                      bands: Int = 16): DataFrame = {
    require(numPerm % bands == 0)
    val rows = numPerm / bands
    val withSig = df.select(col(idCol).as("id"), col(textCol).as("text"),
      minhashSignature(TextOps.wordShingles(col(textCol), n), numPerm).as("sig"))
      .filter(size(col("sig")) > 0)

    // band key = (band index, hash of that signature slice)
    val banded = withSig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        bi => hash(bi, slice(col("sig"), bi * rows + 1, lit(rows))))))
      .select(col("id"), col("pos").as("band"), col("col").as("bucket"))

    val l = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
    val r = banded.select(col("band"), col("bucket"), col("id").as("id_b"))
    val candidates = l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()

    // verify candidates with exact jaccard (precision = 1.0)
    val sh = shingleRelation(df, idCol, textCol, n)
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_shingles"))
    val common = candidates
      .join(sh.withColumnRenamed("id", "id_a"), Seq("id_a"))
      .join(sh.withColumnRenamed("id", "id_b")
        .withColumnRenamed("shingle", "shingle_b"), Seq("id_b"))
      .filter(col("shingle") === col("shingle_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("id", "id_a")
        .withColumnRenamed("n_shingles", "size_a"), Seq("id_a"))
      .join(sizes.withColumnRenamed("id", "id_b")
        .withColumnRenamed("n_shingles", "size_b"), Seq("id_b"))
      .withColumn("jaccard", round(
        col("n_common").cast("double") /
          (col("size_a") + col("size_b") - col("n_common")).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash: per token hash, vote each bit ±1, sign → bit.
    * Pure column expressions (bit ops over crc32 token hashes).
    */
  def simhash64(text: Column): Column = {
    val toks = TextOps.tokens(text)
    val hashed = transform(toks, t =>
      xxhash64(t)) // 64-bit stable hash, codegen'd
    val bits = (0 until 64).map { b =>
      // vote: count of tokens with bit b set vs total
      val set = size(filter(hashed, h => (shiftright(h, b) % 2) =!= 0))
      when(set * 2 > size(hashed), lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce((a, c) => a.bitwiseOR(c))
  }

  /** SimHash near-dup pairs with hamming distance <= maxHamming, using
    * the pigeonhole band trick: split 64 bits into maxHamming+1 bands —
    * any pair within distance k shares at least one exact band.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val nBands = maxHamming + 1
    val bandBits = 64 / nBands
    val sigs = df.select(col(idCol).as("id"),
      simhash64(col(textCol)).as("sig"))
    val banded = sigs.select(col("id"), col("sig"),
      posexplode(array((0 until nBands).map(bi =>
        shiftrightunsigned(col("sig"), bi * bandBits)
          .bitwiseAND(lit((1L << bandBits) - 1))): _*)))
      .select(col("id"), col("sig"), col("pos").as("band"), col("col").as("bucket"))
    val l = banded.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
