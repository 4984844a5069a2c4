package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Dedup

/** Dev tool: measure the OPH vs k-permutation MinHash SIGNATURE pass
  * on synthetic long documents. The gate corpus (~100-token docs)
  * hides the hashing difference — both pipelines are dominated by
  * shingling + md5 there (measured parity at the 10× replica). The
  * OPH claim is about the k×|shingles| permutation inner product,
  * which only dominates once documents get long. This generates
  * `nDocs` docs of `nTokens` deterministic tokens each and times the
  * full signature pipelines (shingle → hash → signature → count).
  *
  *   runMain graft.tools.OphBench <nDocs> <nTokens>
  */
object OphBench {
  def main(args: Array[String]): Unit = {
    val (nDocs, nTokens) = (args(0).toInt, args(1).toInt)
    val spark = GraftSession.local(32, 32)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val mk = udf { (id: Long) =>
      val sb = new StringBuilder
      var i = 0
      while (i < nTokens) {
        sb.append('w').append((id * 31 + i * 7919) % 50000).append(' ')
        i += 1
      }
      sb.toString
    }
    val docs = spark.range(nDocs.toLong)
      .select(col("id").as("doc_id"), mk(col("id")).as("text"))
      .localCheckpoint(true) // fixture cost out of both timings
    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"tool":"oph","docs":$nDocs,"tokens":$nTokens,"path":"$label","rows":$n,"sec":$sec%.2f}""")
    }
    // both paths end at the same relation shape; sweep k to expose
    // where the k-permutation inner product starts to dominate the
    // shared md5-per-shingle cost
    for (k <- Seq(64, 256, 1024)) {
      time(s"minhash_k$k")(
        Dedup.bandedSignatures(docs, "doc_id", "text", n = 3,
          numPerm = k, bands = k / 4).count())
      time(s"oph_k$k")(
        Dedup.ophSignatures(docs, "doc_id", "text", n = 3, k = k).count())
    }
    spark.stop()
  }
}
