package graft.streaming

import org.apache.spark.sql.SparkSession

/** Scale-adaptive sizing for STATEFUL streaming stages.
  *
  * Stateful operators plan their state-store partition count from
  * `spark.sql.shuffle.partitions` at stream start and PIN it in the
  * checkpoint for the stream's lifetime. AQE never coalesces
  * micro-batch shuffles the way it does batch ones (adaptive execution
  * does not apply under stateful streaming), so every micro-batch pays
  * one task + one state-store instance + one checkpoint delta file +
  * fsync PER PARTITION regardless of data volume. Choosing that count
  * is the standard production decision for a streaming job — it must
  * derive from expected STATE size, not inherit the session's
  * batch-shuffle default (which GraftSession sizes for batch work).
  *
  * [[statePartitions]] derives the count from an approximate bound on
  * the bytes feeding the stream: ceil(bytes / bytesPerPartition),
  * clamped to [1, session shuffle partitions]. `bytesPerPartition`
  * comes from `spark.graft.stream.state.bytesPerPartition` (default
  * 64 MiB — the same order as AQE's advisory partition size, i.e. one
  * state store per coalesced-batch-partition-worth of feed; override
  * per deployment). At production feed sizes the session ceiling is in
  * charge (a 10 GB backlog at the default still asks for 160 and gets
  * the ceiling); on a small backfill it stops a kilobyte-sized
  * aggregation from checkpointing dozens of empty stores per batch.
  */
object StreamTune {

  private val ConfKey = "spark.graft.stream.state.bytesPerPartition"

  def statePartitions(s: SparkSession, approxBytes: Long): Int = {
    val per = s.conf.get(ConfKey, (64L * 1024 * 1024).toString).toLong
    require(per > 0, s"$ConfKey must be positive, got $per")
    val want = (math.max(approxBytes, 0L) + per - 1) / per
    val cap = s.conf.get("spark.sql.shuffle.partitions").toInt
    math.max(1L, math.min(want, cap.toLong)).toInt
  }

  /** Run `body` (stream start → drain → stop) with the session's
    * shuffle-partition conf pinned to [[statePartitions]], restoring
    * the previous value afterwards. The stream reads the conf at start
    * and checkpoints it; batch work outside `body` is untouched.
    * Restoration is exception-safe, so a failing stream cannot leak
    * the narrowed setting into subsequent batch queries.
    */
  def withStatePartitions[T](s: SparkSession, approxBytes: Long)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, statePartitions(s, approxBytes).toString)
    try body finally s.conf.set(key, prev)
  }

  /** Total bytes under a local path — the free size probe for stream
    * inputs the harness just wrote to disk (temp parquet feeds, store
    * data dirs). Missing paths count 0.
    */
  def dirBytes(path: String): Long = {
    val root = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(root)) 0L
    else {
      val s = java.nio.file.Files.walk(root)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    }
  }
}
