package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Dedup

/** Dev tool: measure the direct inverted-index Jaccard join
  * ([[Dedup.jaccardPairs]]) against the prefix-filtered PPJoin form
  * ([[Dedup.jaccardPairsPrefix]]) on a HOT-SHINGLE corpus — the Zipfian
  * document-frequency regime real web crawls have (boilerplate
  * sentences shared by 10–30% of documents), which the uniform-ish
  * driver test data never exercises. This is the measurement behind the
  * "use the prefix path under Zipfian shingle distributions" claim in
  * the Scaladoc of both operators (SCALING.md records the numbers).
  *
  * The corpus is the driver's `documents` table with a fixed
  * boilerplate sentence appended to `hotPct`% of docs (hash-selected,
  * deterministic). The appended shingles get df ≈ hotPct·N/100 — the
  * direct join's bucket expansion is then quadratic in that df, while
  * rarest-first prefix filtering never indexes them. Output pairs are
  * UNCHANGED at threshold 0.5 (the boilerplate adds ~10 common shingles
  * on a ~60-shingle union, J ≈ 0.17), so the two paths must agree
  * exactly — the tool asserts count + checksum equality before
  * printing timings.
  *
  * Usage: ZipfBench <sfDir> [hotPct] [cpus] [skipDirect]
  */
object ZipfBench {

  val Boilerplate =
    "subscribe to our newsletter today for the latest updates and offers"

  def hotCorpus(docs: DataFrame, hotPct: Int): DataFrame =
    docs.withColumn("text",
      when(pmod(hash(col("doc_id")), lit(100)) < lit(hotPct),
        concat(col("text"), lit(" " + Boilerplate))).otherwise(col("text")))

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val hotPct = if (args.length > 1) args(1).toInt else 20
    val cpus = if (args.length > 2) args(2).toInt else 32
    val skipDirect = args.length > 3 && args(3) == "skipDirect"
    val spark = GraftSession.local(cpus, cpus)
    spark.sparkContext.setLogLevel("ERROR")
    try run(spark, sfDir, hotPct, skipDirect)
    finally spark.stop()
  }

  def run(spark: SparkSession, sfDir: String, hotPct: Int,
          skipDirect: Boolean): Unit = {
    val docs = hotCorpus(
      graft.sources.Tables.documents(spark, sfDir), hotPct)
      // freeze the corpus so neither path re-pays the generator and the
      // comparison is pure join strategy
      .select("doc_id", "text").localCheckpoint()
    val n = docs.count()

    def bench(f: () => DataFrame): (Double, Long, Long) = {
      System.gc()
      var out: DataFrame = null
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        out = f()
        out.count()
        (System.nanoTime() - t0) / 1e9
      }
      // coalesce: sum() is NULL over an empty pair set, and a corpus
      // with no near-dups should report pairs=0, not NPE
      val agg = out.agg(count(lit(1)), coalesce(sum(hash(col("id_a"), col("id_b"),
        col("jaccard")).cast("long")), lit(0L))).collect()(0)
      (times.min, agg.getLong(0), agg.getLong(1))
    }

    val (tPrefix, cPrefix, hPrefix) = bench(() =>
      Dedup.jaccardPairsPrefix(docs, "doc_id", "text", n = 3, threshold = 0.5))
    val direct =
      if (skipDirect) None
      else Some(bench(() =>
        Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)))

    direct.foreach { case (_, cDirect, hDirect) =>
      require(cDirect == cPrefix && hDirect == hPrefix,
        s"paths disagree: direct ($cDirect, $hDirect) vs prefix ($cPrefix, $hPrefix)")
    }
    println(s"""{"tool":"zipfbench","sf":"$sfDir","docs":$n,"hotPct":$hotPct,""" +
      s""""pairs":$cPrefix,"prefix_s":${f(tPrefix)}""" +
      direct.fold("")(d => s""","direct_s":${f(d._1)}""") + "}")
  }

  private def f(d: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, d)
}

/** Dev tool: measure [[graft.operators.NgramLm.scoreDocs]]'s direct
  * scoring join against the `hotBigrams` broadcast-head twin on the
  * same hot-shingle corpus [[ZipfBench]] uses — appending the
  * boilerplate sentence to `hotPct`% of docs gives its ~10 bigrams a
  * document frequency of hotPct·N/100, the Zipfian head the broadcast
  * path exists for. Asserts the two shapes are value-identical (count +
  * checksum) before printing timings; SCALING.md records the numbers
  * and the honest read of them.
  *
  * Usage: LmBench <sfDir> [hotPct] [cpus] [hotK]
  */
object LmBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val hotPct = if (args.length > 1) args(1).toInt else 20
    val cpus = if (args.length > 2) args(2).toInt else 32
    val hotK = if (args.length > 3) args(3).toInt else 64
    val spark = GraftSession.local(cpus, cpus)
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val docs = ZipfBench.hotCorpus(
        graft.sources.Tables.documents(spark, sfDir), hotPct)
        .select("doc_id", "text").localCheckpoint()
      val n = docs.count()
      val pred = graft.operators.Sampling.hashBucket(col("doc_id"), 100) < 80

      def bench(k: Int): (Double, Long, Long) = {
        System.gc()
        var out: DataFrame = null
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          out = graft.operators.NgramLm.scoreDocs(
            docs, "doc_id", "text", pred, hotBigrams = k)
          out.count()
          (System.nanoTime() - t0) / 1e9
        }
        val agg = out.agg(count(lit(1)),
          coalesce(sum(hash(col("doc_id"), col("n_bigrams"),
            col("avg_logp"), col("oov_rate")).cast("long")), lit(0L)))
          .collect()(0)
        (times.min, agg.getLong(0), agg.getLong(1))
      }

      val (tDirect, cDirect, hDirect) = bench(0)
      val (tHot, cHot, hHot) = bench(hotK)
      require(cDirect == cHot && hDirect == hHot,
        s"shapes disagree: direct ($cDirect, $hDirect) vs hot ($cHot, $hHot)")
      println(s"""{"tool":"lmbench","sf":"$sfDir","docs":$n,""" +
        s""""hotPct":$hotPct,"hotK":$hotK,"scored":$cDirect,""" +
        s""""direct_s":${"%.2f".formatLocal(java.util.Locale.ROOT, tDirect)},""" +
        s""""hot_s":${"%.2f".formatLocal(java.util.Locale.ROOT, tHot)}}""")
    } finally spark.stop()
  }
}
