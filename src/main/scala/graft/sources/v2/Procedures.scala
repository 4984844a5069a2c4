package graft.sources.v2

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.SnapshotStoreOps

/** STORED PROCEDURES (the Iceberg `CALL catalog.system.proc(...)`
  * surface, on Spark 4's native procedure API): the store's
  * maintenance operations runnable from pure SQL —
  *
  * {{{
  *   CALL graft.system.compact(`table` => 'db.t')
  *   CALL graft.system.zorder(`table` => 'db.t', column => 'n')
  *   CALL graft.system.apply_deletes(`table` => 'db.t')
  *   CALL graft.system.rebucket(`table` => 'db.t', n => 8)
  *   CALL graft.system.rollback(`table` => 'db.t', version => 3)
  *   CALL graft.system.tag(`table` => 'db.t', name => 'rel', version => 3)
  *   CALL graft.system.vacuum(`table` => 'db.t', keep_last => 10)
  * }}}
  *
  * Each returns its outcome as result rows (a [[GraftLocalScan]]) —
  * the new head version, counts of what moved — so a maintenance
  * scheduler can be a plain SQL script. The heavy lifting is the SAME
  * store API the Scala surface uses; the procedure layer only parses
  * names and shapes results, so SQL-driven and code-driven
  * maintenance can never diverge.
  */
private[v2] object Procedures {

  // ONE registry: names derive from it, so the listing, the loader
  // and the unknown-procedure suggestion can never drift
  private val registry: Map[String, GraftCatalog => UnboundProcedure] =
    scala.collection.immutable.ListMap(
      "compact" -> (new CompactProc(_)),
      "zorder" -> (new ZorderProc(_)),
      "set_cluster_spec" -> (new SetClusterSpecProc(_)),
      "rewrite_where" -> (new RewriteWhereProc(_)),
      "apply_deletes" -> (new ApplyDeletesProc(_)),
      "compact_deletes" -> (new CompactDeletesProc(_)),
      "rebucket" -> (new RebucketProc(_)),
      "rollback" -> (new RollbackProc(_)),
      "tag" -> (new TagProc(_)),
      "create_branch" -> (new CreateBranchProc(_)),
      "fast_forward" -> (new FastForwardProc(_)),
      "drop_branch" -> (new DropBranchProc(_)),
      "expire_snapshots" -> (new ExpireSnapshotsProc(_)),
      "vacuum" -> (new VacuumProc(_)))

  def names: Seq[String] = registry.keys.toSeq

  def load(catalog: GraftCatalog, name: String): Option[UnboundProcedure] =
    registry.get(name.toLowerCase(java.util.Locale.ROOT)).map(_(catalog))

  private[v2] def in(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()

  private[v2] def inDefault(name: String, dt: DataType,
                            sqlDefault: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(sqlDefault).build()
}

/** One graft procedure: unbound == bound (parameters are static), the
  * result is a single local row set.
  */
private[v2] abstract class GraftProcedure(catalog: GraftCatalog)
    extends UnboundProcedure with BoundProcedure {

  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false

  protected def resultSchema: StructType

  protected def run(spark: SparkSession, store: SnapshotStoreOps,
                    root: String, input: InternalRow): Array[Any]

  /** Procedures address tables by STRING name ('db.t', the Iceberg
    * convention) — resolution reuses the catalog's own name mapping.
    * Every argument is checked non-NULL up front: a NULL long would
    * otherwise unbox to 0 (CALL rollback(version => NULL) silently
    * restoring v0 is exactly the accident this guards), and a NULL
    * string would be a bare NPE with no argument name.
    */
  override def call(input: InternalRow): util.Iterator[Scan] = {
    val params = parameters()
    var i = 0
    while (i < params.length) {
      require(!input.isNullAt(i),
        s"procedure ${name()}: argument '${params(i).name}' must not be NULL")
      i += 1
    }
    val tableName = input.getUTF8String(0).toString
    val parts = tableName.split("\\.")
    val ident = Identifier.of(parts.init, parts.last)
    val root = catalog.storeRootFor(ident)
    val spark = SparkSession.active
    val row = run(spark, catalog.storeOps, root, input)
    util.Collections.singletonList[Scan](GraftLocalScan(
      s"graft procedure ${name()}", resultSchema,
      Array(new GenericInternalRow(row): InternalRow))).iterator()
  }
}

private[v2] final class CompactProc(catalog: GraftCatalog)
    extends GraftProcedure(catalog) {
  override def name(): String = "compact"
  override def description(): String =
    "bin-pack small files (and materialize outstanding MOR deletes) " +
      "into a new version"
  override def parameters(): Array[ProcedureParameter] = Array(
    Procedures.in("table", StringType),
    Procedures.inDefault("small_rows", LongType, "100000"),
    Procedures.inDefault("target_rows", LongType, "1000000"))
  override protected val resultSchema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("files", LongType, nullable = false)))
  override protected def run(spark: SparkSession, store: SnapshotStoreOps,
                             root: String, input: InternalRow): Array[Any] = {
    val m = store.compact(spark, root, input.getLong(1), input.getLong(2))
    Array(m.version, m.files.size.toLong)
  }
}

private[v2] final class ZorderProc(catalog: GraftCatalog)
    extends GraftProcedure(catalog) {
  override def name(): String = "zorder"
  override def description(): String =
    "re-cluster small files by the Morton interleave of the key and a " +
      "zone-mapped column (tightens BOTH envelopes for conjunctive pruning)"
  override def parameters(): Array[ProcedureParameter] = Array(
    Procedures.in("table", StringType),
    Procedures.in("column", StringType),
    Procedures.inDefault("small_rows", LongType, "100000"),
    Procedures.inDefault("target_rows", LongType, "1000000"))
  override protected val resultSchema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("files", LongType, nullable = false)))
  override protected def run(spark: SparkSession, store: SnapshotStoreOps,
                             root: String, input: InternalRow): Array[Any] = {
    val m = store.compactZorder(spark, root,
      input.getUTF8String(1).toString, input.getLong(2), input.getLong(3))
    Array(m.version, m.files.size.toLong)
  }
}

private[v2] final class SetClusterSpecProc(catalog: GraftCatalog)
    extends GraftProcedure(catalog) {
  override def name(): String = "set_cluster_spec"
  override def description(): String =
    "re-declare the zone-mapped stats columns (comma-separated) and the " +
      "optional z-order column — metadata-only; old files grandfather, " +
      "new writes record the new stats, rewrite_where backfills"
  override def parameters(): Array[ProcedureParameter] = Array(
    Procedures.in("table", StringType),
    Procedures.in("stats_cols", StringType),
    Procedures.inDefault("zorder", StringType, "''"))
  override protected val resultSchema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("stats_cols", StringType, nullable = false)))
  override protected def run(spark: SparkSession, store: SnapshotStoreOps,
                             root: String, input: InternalRow): Array[Any] = {
    val cols = input.getUTF8String(1).toString.split(",").map(_.trim)
      .filter(_.nonEmpty).toSeq
    val z = Some(input.getUTF8String(2).toString).filter(_.nonEmpty)
    val m = store.setClusterSpec(root, cols, z)
    Array(m.version, UTF8String.fromString(m.statsCols.mkString(",")))
  }
}

private[v2] final class RewriteWhereProc(catalog: GraftCatalog)
    extends GraftProcedure(catalog) {
  override def name(): String = "rewrite_where"
  override def description(): String =
    "rewrite only the files overlapping a key range under the declared " +
      "cluster spec (slice-sized I/O; the incremental re-layout backfill)"
  override def parameters(): Array[ProcedureParameter] = Array(
    Procedures.in("table", StringType),
    Procedures.in("lo", LongType),
    Procedures.in("hi", LongType),
    Procedures.inDefault("target_rows", LongType, "1000000"))
  override protected val resultSchema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("files", LongType, nullable = false)))
  override protected def run(spark: SparkSession, store: SnapshotStoreOps,
                             root: String, input: InternalRow): Array[Any] = {
    val m = store.rewriteWhere(spark, root, input.getLong(1),
      input.getLong(2), input.getLong(3))
    Array(m.version, m.files.size.toLong)
  }
}

private[v2] final class ApplyDeletesProc(catalog: GraftCatalog)
    extends GraftProcedure(catalog) {
  override def name(): String = "apply_deletes"
  override def description(): String =
    "materialize outstanding merge-on-read delete files into data files " +
      "(branch => materialize on that branch's chain)"
  override def parameters(): Array[ProcedureParameter] =
    Array(Procedures.in("table", StringType),
      Procedures.inDefault("branch", StringType, "''"))
  override protected val resultSchema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("remaining_delete_files", LongType, nullable = false)))
  override protected def run(spark: SparkSession, store: SnapshotStoreOps,
                             root: String, input: InternalRow): Array[Any] = {
    val b = Some(input.getUTF8String(1).toString).filter(_.nonEmpty)
    val m = store.applyDeletes(spark, root, branch = b)
    Array(m.version, m.deletes.size.toLong)
  }
}

private[v2] final class CompactDeletesProc(catalog: GraftCatalog)
    extends GraftProcedure(catalog) {
  override def name(): String = "compact_deletes"
  override def description(): String =
    "merge accumulated equality-delete files (zero data-file I/O; " +
      "dangling entries drop; seq-promotion-safe groups only)"
  override def parameters(): Array[ProcedureParameter] =
    Array(Procedures.in("table", StringType),
      Procedures.inDefault("branch", StringType, "''"))
  override protected val resultSchema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("delete_files", LongType, nullable = false)))
  override protected def run(spark: SparkSession, store: SnapshotStoreOps,
                             root: String, input: InternalRow): Array[Any] = {
    val b = Some(input.getUTF8String(1).toString).filter(_.nonEmpty)
    val m = store.compactDeletes(spark, root, branch = b)
    Array(m.version, m.deletes.size.toLong)
  }
}

private[v2] final class RebucketProc(catalog: GraftCatalog)
    extends GraftProcedure(catalog) {
  override def name(): String = "rebucket"
  override def description(): String =
    "rewrite the table into one sorted file per hash bucket (enables " +
      "storage-partitioned joins)"
  override def parameters(): Array[ProcedureParameter] = Array(
    Procedures.in("table", StringType),
    Procedures.in("n", IntegerType))
  override protected val resultSchema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("buckets", IntegerType, nullable = false)))
  override protected def run(spark: SparkSession, store: SnapshotStoreOps,
                             root: String, input: InternalRow): Array[Any] = {
    val m = store.rebucket(spark, root, input.getInt(1))
    Array(m.version, input.getInt(1))
  }
}

private[v2] final class RollbackProc(catalog: GraftCatalog)
    extends GraftProcedure(catalog) {
  override def name(): String = "rollback"
  override def description(): String =
    "restore an earlier version's content as a NEW commit (metadata-only)"
  override def parameters(): Array[ProcedureParameter] = Array(
    Procedures.in("table", StringType),
    Procedures.in("version", LongType))
  override protected val resultSchema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("restored", LongType, nullable = false)))
  override protected def run(spark: SparkSession, store: SnapshotStoreOps,
                             root: String, input: InternalRow): Array[Any] = {
    val target = input.getLong(1)
    val m = store.rollback(root, target)
    Array(m.version, target)
  }
}

private[v2] final class TagProc(catalog: GraftCatalog)
    extends GraftProcedure(catalog) {
  override def name(): String = "tag"
  override def description(): String =
    "name a version (retained across vacuum; readable via VERSION AS OF)"
  override def parameters(): Array[ProcedureParameter] = Array(
    Procedures.in("table", StringType),
    Procedures.in("name", StringType),
    Procedures.in("version", LongType))
  override protected val resultSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("version", LongType, nullable = false)))
  override protected def run(spark: SparkSession, store: SnapshotStoreOps,
                             root: String, input: InternalRow): Array[Any] = {
    val tag = input.getUTF8String(1).toString
    val v = input.getLong(2)
    store.tag(root, tag, v)
    Array(UTF8String.fromString(tag), v)
  }
}

private[v2] final class CreateBranchProc(catalog: GraftCatalog)
    extends GraftProcedure(catalog) {
  override def name(): String = "create_branch"
  override def description(): String =
    "fork a movable branch ref from a main version (-1 = current head); " +
      "write to it via the V2 write's branch option, publish via " +
      "fast_forward"
  override def parameters(): Array[ProcedureParameter] = Array(
    Procedures.in("table", StringType),
    Procedures.in("name", StringType),
    Procedures.inDefault("from_version", LongType, "-1"))
  override protected val resultSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("forked_at", LongType, nullable = false)))
  override protected def run(spark: SparkSession, store: SnapshotStoreOps,
                             root: String, input: InternalRow): Array[Any] = {
    val bname = input.getUTF8String(1).toString
    store.createBranch(root, bname, input.getLong(2))
    Array(UTF8String.fromString(bname),
      store.branches(root).getOrElse(bname, -1L))
  }
}

private[v2] final class FastForwardProc(catalog: GraftCatalog)
    extends GraftProcedure(catalog) {
  override def name(): String = "fast_forward"
  override def description(): String =
    "publish a branch into main as a metadata-only fast-forward commit " +
      "(refuses if main moved past the fork point)"
  override def parameters(): Array[ProcedureParameter] = Array(
    Procedures.in("table", StringType),
    Procedures.in("name", StringType))
  override protected val resultSchema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("files", LongType, nullable = false)))
  override protected def run(spark: SparkSession, store: SnapshotStoreOps,
                             root: String, input: InternalRow): Array[Any] = {
    val m = store.fastForward(root, input.getUTF8String(1).toString)
    Array(m.version, m.files.size.toLong)
  }
}

private[v2] final class DropBranchProc(catalog: GraftCatalog)
    extends GraftProcedure(catalog) {
  override def name(): String = "drop_branch"
  override def description(): String =
    "remove a branch ref; its unpublished files become vacuum-eligible"
  override def parameters(): Array[ProcedureParameter] = Array(
    Procedures.in("table", StringType),
    Procedures.in("name", StringType))
  override protected val resultSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false)))
  override protected def run(spark: SparkSession, store: SnapshotStoreOps,
                             root: String, input: InternalRow): Array[Any] = {
    val bname = input.getUTF8String(1).toString
    store.dropBranch(root, bname)
    Array(UTF8String.fromString(bname))
  }
}

private[v2] final class ExpireSnapshotsProc(catalog: GraftCatalog)
    extends GraftProcedure(catalog) {
  override def name(): String = "expire_snapshots"
  override def description(): String =
    "trim retained versions by policy (older_than_versions and/or " +
      "retain_last); tags, branches and the head always survive; only " +
      "files exclusive to expired versions are reclaimed"
  override def parameters(): Array[ProcedureParameter] = Array(
    Procedures.in("table", StringType),
    Procedures.inDefault("older_than_versions", LongType, "-1"),
    Procedures.inDefault("retain_last", IntegerType, "-1"))
  override protected val resultSchema: StructType = StructType(Seq(
    StructField("manifests_expired", IntegerType, nullable = false),
    StructField("data_files_deleted", IntegerType, nullable = false),
    StructField("oldest_retained", LongType, nullable = false)))
  override protected def run(spark: SparkSession, store: SnapshotStoreOps,
                             root: String, input: InternalRow): Array[Any] = {
    val (expired, reclaimed) = store.expireSnapshots(root,
      input.getLong(1), input.getInt(2))
    Array(expired, reclaimed, store.versions(root).head)
  }
}

private[v2] final class VacuumProc(catalog: GraftCatalog)
    extends GraftProcedure(catalog) {
  override def name(): String = "vacuum"
  override def description(): String =
    "drop old untagged versions and unreferenced files (age-gated)"
  override def parameters(): Array[ProcedureParameter] = Array(
    Procedures.in("table", StringType),
    Procedures.in("keep_last", IntegerType),
    Procedures.inDefault("scratch_ttl_ms", LongType, "3600000"),
    Procedures.inDefault("orphan_ttl_ms", LongType, "3600000"))
  override protected val resultSchema: StructType = StructType(Seq(
    StructField("manifests_dropped", IntegerType, nullable = false),
    StructField("data_files_deleted", IntegerType, nullable = false)))
  override protected def run(spark: SparkSession, store: SnapshotStoreOps,
                             root: String, input: InternalRow): Array[Any] = {
    val (mDropped, fDeleted) = store.vacuum(root, input.getInt(1),
      input.getLong(2), input.getLong(3))
    Array(mDropped, fDeleted)
  }
}
