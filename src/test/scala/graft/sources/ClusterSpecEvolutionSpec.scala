package graft.sources

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CLUSTERING-SPEC EVOLUTION: `setClusterSpec` re-keys the zone-map
  * columns (and the declared z-order dimension) as a METADATA-ONLY
  * commit; old files grandfather (no stats entry → conservatively
  * read, never wrongly skipped), new writes record the new stats, and
  * `rewriteWhere` backfills key slices incrementally under the
  * declared spec — the 100 TB re-layout that never needs a full
  * rewrite.
  */
class ClusterSpecEvolutionSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"cspec_$tag").toString + "/t"

  // grp scatters relative to the key, so key-clustered files span
  // most of its domain — the shape a secondary z-order dimension buys
  // pruning on
  private def df(r: Range) = r.map(i =>
    (i.toLong, i.toLong * 3L, (i.toLong * 37L) % 1024L)).toDF("k", "n", "grp")

  test("metadata-only evolution, grandfathered reads, incremental backfill") {
    val root = freshRoot("evolve")
    SnapshotStore.init(spark, df(0 until 800), root, "k",
      filesPerCommit = 8, statsCols = Seq("n")) // v0
    val v0Files = SnapshotStore.currentManifest(root).files
    assert(v0Files.forall(f => f.stats.contains("n") &&
      !f.stats.contains("grp")))
    // the evolution is metadata-only: identical file entries
    val m1 = SnapshotStore.setClusterSpec(root, Seq("n", "grp"),
      zorderCol = Some("grp")) // v1
    assert(m1.files == v0Files && m1.statsCols == Vector("n", "grp") &&
      m1.props.get("cluster.zorder").contains("grp"))
    // new writes record the new stats immediately
    SnapshotStore.append(spark, df(100000 until 100400), root) // v2
    val m2 = SnapshotStore.currentManifest(root)
    val (newF, oldF) = m2.files.partition(_.seq == 2L)
    assert(newF.nonEmpty && newF.forall(_.stats.contains("grp")))
    assert(oldF.forall(!_.stats.contains("grp")),
      "grandfathered files keep their original stats entries")
    // grandfathered files read CONSERVATIVELY on the new column: a
    // grp-band scan cannot skip them (no zone map), but is row-exact
    val band = SnapshotStore.scanStatsRange(spark, root, "grp", 0L, 63L)
    assert(band.count() ==
      df(0 until 800).union(df(100000 until 100400))
        .filter($"grp" <= 63).count())
    // incremental backfill: rewrite ONLY the original key slice
    val m3 = SnapshotStore.rewriteWhere(spark, root, 0L, 799L,
      targetRows = 100L) // v3
    val (oldRange, carried) = m3.files.partition(_.minKey <= 799L)
    assert(carried.toSet == newF.toSet,
      "files outside the slice must carry by reference")
    assert(oldRange.forall(f => f.stats.contains("grp") &&
      f.layout.contains("zorder(k,grp)")),
      "backfilled files must carry the new stats and the declared layout")
    // the z-ordered slice now PRUNES on grp: the top Morton bit is
    // grp's, so with >= 2 output files the high-grp files provably
    // miss a low band
    val hit = oldRange.count(f =>
      f.stats.get("grp").forall { case (mn, mx) => mn <= 63L && 0L <= mx })
    assert(oldRange.size >= 4 && hit < oldRange.size,
      s"a low grp band must skip some of the ${oldRange.size} " +
        s"z-ordered files (hit $hit)")
    // row-identical through every step; old versions still time-travel
    assert(SnapshotStore.read(spark, root).count() == 1200)
    assert(SnapshotStore.scanStatsRange(spark, root, "grp", 0L, 63L)
      .count() == band.count())
    assert(SnapshotStore.readAsOf(spark, root, 0L).count() == 800)
    // second slice completes the re-layout
    SnapshotStore.rewriteWhere(spark, root, 100000L, 100399L,
      targetRows = 100L) // v4
    assert(SnapshotStore.currentManifest(root).files
      .forall(_.stats.contains("grp")))
    assert(SnapshotStore.read(spark, root).count() == 1200)
  }

  test("governance: spec validation, and removal re-enables rename/drop") {
    val root = freshRoot("gov")
    SnapshotStore.init(spark, df(0 until 100), root, "k",
      filesPerCommit = 2, statsCols = Seq("n"))
    // validations
    assert(intercept[IllegalArgumentException] {
      SnapshotStore.setClusterSpec(root, Seq("nope"))
    }.getMessage.contains("not in the table schema"))
    assert(intercept[IllegalArgumentException] {
      SnapshotStore.setClusterSpec(root, Seq("k", "n"))
    }.getMessage.contains("key column"))
    assert(intercept[IllegalArgumentException] {
      SnapshotStore.setClusterSpec(root, Seq("n", "n"))
    }.getMessage.contains("duplicate"))
    assert(intercept[IllegalArgumentException] {
      SnapshotStore.setClusterSpec(root, Seq("n"), Some("grp"))
    }.getMessage.contains("must be in the declared stats columns"))
    // a zone-mapped column refuses rename/drop while declared...
    assert(intercept[IllegalArgumentException] {
      SnapshotStore.renameColumn(root, "n", "n2")
    }.getMessage.contains("zone-mapped"))
    // ...and becomes renamable once the spec drops it
    SnapshotStore.setClusterSpec(root, Seq("grp"), Some("grp"))
    SnapshotStore.renameColumn(root, "n", "n2")
    assert(SnapshotStore.read(spark, root).columns.toSet ==
      Set("k", "n2", "grp"))
    // clearing the z-order drops the property
    val m = SnapshotStore.setClusterSpec(root, Seq("grp"), None)
    assert(!m.props.contains("cluster.zorder"))
    // rewriteWhere without a declared z-order range-clusters by key
    val m2 = SnapshotStore.rewriteWhere(spark, root, 0L, 99L,
      targetRows = 50L)
    assert(m2.files.forall(_.layout.isEmpty))
    assert(SnapshotStore.read(spark, root).count() == 100)
  }
}
