package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Sharded JSONL interchange — the lingua franca of training-data
  * pipelines (every public corpus release ships as gzip'd JSON lines).
  * Parquet stays the processing format; this is the boundary layer for
  * handing curated corpora to trainers and ingesting third-party drops.
  */
object JsonlStore {

  /** Write `df` as `ceil(rows / rowsPerShard)` gzip JSONL shards.
    * Row-count sizing (one cheap count action) rather than byte
    * sizing: JSONL consumers (data loaders, samplers) address work in
    * documents, and equal-row shards give them even work units.
    * `repartition`, not `coalesce`, for the same reason as
    * [[Compaction.compact]]: the pass exists to fix layout.
    */
  def write(df: DataFrame, path: String, rowsPerShard: Long = 100000L): Unit = {
    require(rowsPerShard > 0)
    val n = math.max(1L, (df.count() + rowsPerShard - 1) / rowsPerShard).toInt
    df.repartition(n).write.mode(SaveMode.Overwrite)
      .option("compression", "gzip").json(path)
  }

  /** Read a JSONL directory with an EXPLICIT schema — schema inference
    * is a full extra pass over (compressed) text at corpus scale, and
    * silently widens types; a boundary format should be read against
    * the contract, not guessed. Gzip shards are non-splittable: one
    * task per shard, which is why [[write]] sizes shards evenly.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
