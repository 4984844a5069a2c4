package graft.sources.v2

import graft.SparkTest
import graft.sources.SnapshotStore
import graft.sources.SnapshotStore.Rename
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.GreaterThan
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

/** The streaming era-translation soundness rule for pushed filters: a
  * filter is served verbatim only in eras where its referenced
  * columns spell the same (a post-rename name pushed into a
  * pre-rename file would row-group-match nothing and silently DROP
  * that file's rows). Filters are SCOPED OUT per era rather than
  * refused — sound because non-key pushed filters stay residual, and
  * the key (the only claimed-handled reference) never renames. The
  * reachable corner: setClusterSpec removes a column from statsCols,
  * it renames, the NEW name re-enters the spec — a filtered stream
  * whose backlog crosses the rename must serve every matching row.
  */
class StreamFilterGuardSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("a pushed filter on a renamed column scopes out of pre-rename eras instead of refusing") {
    val dir = java.nio.file.Files.createTempDirectory("sfguard")
    val root = s"$dir/t"
    SnapshotStore.init(spark,
      (0L until 20L).map(i => (i, i * 3L)).toDF("k", "n"), root, "k")
    val schema = StructType.fromDDL("k BIGINT, m BIGINT")
    // a view whose log renamed n -> m, planning the v0 backfill (all
    // era-0 files): the filter on m cannot be served verbatim there,
    // but planning must SUCCEED with the filter scoped out — the rows
    // flow and Spark's residual filter re-checks them
    val stream = new SnapshotMicroBatchStream(SnapshotStore, root,
      schema, schema,
      pushed = Array(GreaterThan("m", 5L)), options = Map.empty,
      viewRenames = Vector(Rename(1L, "n", "m")))
    assert(stream.planInputPartitions(TableOffset(0L, 0L),
      TableOffset(0L, -1L)).nonEmpty)
  }

  test("end-to-end: spec-evolved + renamed column filters correctly across eras") {
    val dir = java.nio.file.Files.createTempDirectory("sfguard_e2e")
    val root = s"$dir/t"
    val sink = s"$dir/sink"
    SnapshotStore.init(spark,
      (0L until 100L).map(i => (i, (i * 37L) % 50L)).toDF("k", "n"),
      root, "k", filesPerCommit = 4, statsCols = Seq("n")) // v0
    SnapshotStore.setClusterSpec(root, Nil) // v1: n leaves the spec
    SnapshotStore.renameColumn(root, "n", "m") // v2
    SnapshotStore.setClusterSpec(root, Seq("m")) // v3: m re-enters
    SnapshotStore.append(spark,
      (1000L until 1100L).map(i => (i, (i * 37L) % 50L)).toDF("k", "m"),
      root, filesPerCommit = 4) // v4: files physically storing m
    val q = spark.readStream.format("graft-snapshot")
      .option("startVersion", 0).load(root)
      .filter(col("m") > 25L)
      .writeStream.format("parquet").option("path", sink)
      .option("checkpointLocation", s"$dir/ck").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(sink).select("k").as[Long].collect().toSet
    val want = ((0L until 100L) ++ (1000L until 1100L))
      .filter(i => (i * 37L) % 50L > 25L).toSet
    assert(got == want,
      "the filtered stream must serve every matching row of BOTH eras " +
        "(no silent loss from a filter pushed across the rename)")
  }
}
