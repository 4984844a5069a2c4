package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{LinearModel, TextOps}

/** Dev tool: locate the literal-model vs broadcast-relation crossover
  * for the hashed-n-gram logistic gate ([[LinearModel]]). The literal
  * path inlines the (buckets+1)-double model into every plan
  * (`typedLit` + `element_at`) and collects the per-bucket gradient to
  * the driver each iteration — right at 64 buckets, visibly wrong by
  * fastText's 2M default. The relation path broadcasts a (bucket, w)
  * relation and updates it with a model-sized left join. Both produce
  * bit-equal trajectories (LogitPathParitySpec pins it); this measures
  * where the representations cross over in wall-clock.
  *
  *   runMain graft.tools.LogitBench <sfDir> [maxLiteralBuckets]
  */
object LogitBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    // past ~64k the literal plan takes minutes just to construct —
    // cap the literal side; the relation side sweeps further
    val maxLit = if (args.length > 1) args(1).toInt else 65536
    val spark = GraftSession.local(32, 32)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .localCheckpoint(true) // fixture cost out of all timings
    val label = TextOps.qualityScore(col("text")) >= 0.5
    def time(path: String, buckets: Int): Unit = {
      val t0 = System.nanoTime()
      val n = LinearModel.fitPredictLogitVia(docs, "doc_id", "text",
        label, buckets, iters = 3, lr = 0.5,
        viaRelation = path == "relation").count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"tool":"logit","buckets":$buckets,"path":"$path","rows":$n,"sec":$sec%.2f}""")
    }
    for (b <- Seq(64, 512, 4096, 16384, 65536, 262144, 1048576, 2097152)) {
      if (b <= maxLit) time("literal", b)
      time("relation", b)
    }
    spark.stop()
  }
}
