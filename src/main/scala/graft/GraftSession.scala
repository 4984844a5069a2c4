package graft

import org.apache.spark.sql.SparkSession

/** One place for the session defaults every graft entry point needs.
  *
  * - `spark.sql.session.timeZone=UTC`: the observation store is UTC by
  *   construction (ingestion converts Europe/Helsinki wall time); any
  *   other session zone would skew collection range filters and
  *   timestamp rendering. Library operators that parse wall time bind
  *   zones explicitly and don't depend on this, but entry points pin it
  *   so oracle comparisons and CSV/JSON output are reproducible.
  * - Shuffle partitions follow the core count in local mode. On a real
  *   cluster size them 2-3x total cores and let AQE coalesce: with
  *   `spark.sql.adaptive.enabled` (on by default in Spark 4) small
  *   post-shuffle partitions merge and skewed joins split, so
  *   over-partitioning is cheap and under-partitioning is the only
  *   real failure mode at 100 TB. `spark.sql.files.maxPartitionBytes`
  *   (128m default) already bounds scan partitions.
  * - Local mode ALSO shrinks the scan-partition sizing. The defaults
  *   (128m partitions, 4m per-file open cost) are tuned for clusters
  *   where files are ~100 MB+; local test data is a handful of sub-MB
  *   snappy-parquet files whose rows expand 10-100x in the first map
  *   stage (shingle explodes, per-row vector math), so the default
  *   sizing packs EVERY file into one scan partition and serializes
  *   the heaviest stage onto one of the 32 cores — measured 20x on a
  *   shingle+aggregate query over a 6 MB/10-file table. 4m/128k keeps
  *   local scans parallel; cluster entry points keep Spark's defaults
  *   (at 100 TB the same setting would explode the task count).
  */
object GraftSession {

  def local(cpus: Int, shufflePartitions: Int): SparkSession = {
    val s = configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "128k")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Cluster-mode entry: master/resources come from spark-submit; only
    * semantic + observability-cost defaults are pinned here.
    *
    * maxPlanStringLength: listener events render every executed plan to
    * a string; a deep condition DAG (chunked pack under cached
    * conditions under secondary references) makes the DEFAULT unbounded
    * rendering cost minutes of single-core driver time per batch —
    * measured dominating a 4-condition TsaBatch run. 32k keeps plans
    * debuggable and rendering O(ms).
    */
  def configure(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.maxPlanStringLength", 32768)
}
