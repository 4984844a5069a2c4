package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Retrieval
import graft.sources.Tables

/** Dev tool: measure [[Retrieval.bitextMineLsh]] at a given LSH shape
  * — the "raise planes with the corpus" lever from SCALING.md. The
  * gate's 8-plane/12-table shape is tuned for gate-sized slices; at
  * 100× the per-table collision mass (∝ |A|·|B| / 2^planes) must be
  * bought back with a wider bucket space, exactly like
  * q_embed_pairs_lsh_scale's 12/24 shape. Usage:
  *
  *   runMain graft.tools.BitextBench <sfDir> <nPlanes> <nTables>
  */
object BitextBench {
  def main(args: Array[String]): Unit = {
    val (sfDir, nPlanes, nTables) = (args(0), args(1).toInt, args(2).toInt)
    val spark = GraftSession.local(32, 32)
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables.table(spark, sfDir, "embeddings")
    val t0 = System.nanoTime()
    val n = Retrieval.bitextMineLsh(
      e.filter(col("label") < 5), e.filter(col("label") >= 5),
      k = 4, threshold = 1.02, dim = 64,
      nPlanes = nPlanes, nTables = nTables).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"tool":"bitext","sf":"$sfDir","planes":$nPlanes,"tables":$nTables,"mined":$n,"sec":$sec%.2f}""")
    spark.stop()
  }
}
