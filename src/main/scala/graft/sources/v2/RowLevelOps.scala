package graft.sources.v2

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.SortOrder
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.SnapshotStoreOps
import graft.sources.SnapshotStore.Manifest

/** SQL UPDATE and MERGE INTO on snapshot stores — GROUP-BASED
  * (copy-on-write) row-level operations, the public Iceberg
  * `SparkTable`/`SparkCopyOnWriteOperation` design on Spark's own
  * rewrite rules:
  *
  * {{{
  *   UPDATE graft.db.t SET n = n + 1 WHERE k BETWEEN 100 AND 199
  *   MERGE INTO graft.db.t t USING updates u ON t.k = u.k
  *     WHEN MATCHED THEN UPDATE SET *
  *     WHEN NOT MATCHED THEN INSERT *
  * }}}
  *
  * Catalyst does the heavy lifting (`RewriteUpdateTable` /
  * `RewriteMergeIntoTable` plan a [[org.apache.spark.sql.catalyst
  * .plans.logical.ReplaceData]] that reads the affected GROUPS —
  * files — and recomputes their full content); this file supplies the
  * two connector halves those rules coordinate through ONE shared
  * [[GraftRowLevelOperation]]:
  *
  *  - a group SCAN ([[GroupScanBuilder]]) that uses the statement's
  *    predicates for FILE SELECTION ONLY — every filter stays
  *    residual and NOTHING is pushed to parquet, because a rewritten
  *    file must carry its non-matching rows verbatim (a row-group
  *    pruned by a pushed predicate would silently VANISH from the
  *    rewrite — the one way this operation could lose data). Runtime
  *    group filtering (Spark's matching-groups subquery) narrows the
  *    file set further through the scan's existing key runtime
  *    filter, so an UPDATE touching 3 files rewrites 3 files, not
  *    the table.
  *  - a replace WRITE ([[ReplaceFilesWrite]]) that stages rewritten
  *    files exactly like the V2 append sink (executor-side stats
  *    folding, same staging/vacuum contract) and commits through
  *    [[SnapshotStoreOps.commitReplaceEntries]]: replaced files drop,
  *    new files land, untouched files carry by reference, and a
  *    concurrent commit REFUSES the stale rewrite (the merge/compact
  *    OCC rule).
  *
  * At 100 TB the shape is right by construction: group selection is
  * manifest-sized, the rewrite is sized by the files that actually
  * hold matching keys, and everything else is a carried reference.
  * Versions carrying unmaterialized merge-on-read deletes that touch
  * a selected file refuse loudly (the V2 raw-file contract —
  * `applyDeletes`/`compact` first).
  */
private[v2] final class GraftRowLevelOperation(
    store: SnapshotStoreOps, root: String, m: Manifest,
    declared: StructType, cmd: RowLevelOperation.Command)
    extends RowLevelOperation {

  /** The group scan instance this operation's statement planned —
    * the write's replaced-files set reads from it AFTER runtime
    * group filtering narrowed it.
    */
  @volatile private[v2] var groupScan: SnapshotScan = _

  override def command(): RowLevelOperation.Command = cmd

  override def description(): String =
    s"graft-snapshot $cmd `$root` v${m.version} (copy-on-write)"

  /** `_file` rides the rewrite query (the Iceberg copy-on-write
    * shape). Two things hang off it: Spark's row-level plumbing takes
    * the metadata-projection path (the writer receives clean DATA
    * rows — the `__row_operation` control column never reaches
    * parquet), and runtime GROUP filtering becomes exact file
    * identity (the matching-rows subquery projects `_file`, the
    * group scan keeps precisely those files — with every carried row
    * intact, which a key-based row filter would drop).
    */
  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column("_file"))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GroupScanBuilder(SparkSession.active, store, root, m, declared,
      options, this)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val in = info.schema()
    require(in.fieldNames.toSeq == declared.fieldNames.toSeq,
      s"row-level write schema must match the table schema " +
        s"${declared.toDDL}; got ${in.toDDL}")
    // same analysis-time refusal the append path gives: the writers
    // fold stats with unboxed long reads — a non-integral key/stats
    // table must not fail mid-job on an executor
    V2WriteConf.validateTypes(declared, m.keyCol, m.statsCols,
      "row-level writes")
    new WriteBuilder {
      override def build(): Write =
        new ReplaceFilesWrite(store, root, m, declared,
          GraftRowLevelOperation.this)
    }
  }
}

/** File selection for a row-level statement: predicates select files,
  * rows are NEVER filtered here (everything returns residual, nothing
  * reaches parquet) — see [[GraftRowLevelOperation]] for why.
  */
private[v2] final class GroupScanBuilder(spark: SparkSession,
                                         store: SnapshotStoreOps,
                                         root: String, m: Manifest,
                                         declared: StructType,
                                         options: CaseInsensitiveStringMap,
                                         op: GraftRowLevelOperation)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private val pruner = new ManifestPruner(m)
  private var selecting: Array[Filter] = Array.empty
  private var required: StructType = declared

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    selecting = filters.filter(pruner.usable)
    filters // ALL residual: file selection only, no row semantics
  }

  override def pushedFilters(): Array[Filter] = selecting

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val sel = pruner.select(m.files, selecting.toIndexedSeq)
    val blocked = sel.filter(f => store.applicableDeletes(m, f).nonEmpty)
    if (blocked.nonEmpty) throw new IllegalStateException(
      s"version ${m.version} has unmaterialized merge-on-read deletes " +
        s"applying to ${blocked.size} affected file(s) — a copy-on-write " +
        "rewrite of raw files would resurrect deleted keys; run " +
        "applyDeletes/compact first")
    val files = sel.map { f =>
      val p = new org.apache.hadoop.fs.Path(root, f.path)
      val bytes =
        if (f.bytes > 0) f.bytes else store.fsSizeBytes(s"$root/${f.path}")
      (p, bytes, f)
    }
    // NOTHING pushed to the parquet scan: a rewritten file must keep
    // its non-matching rows
    val scan = new SnapshotScan(spark, store, root, m, pruner, declared,
      required, Array.empty, options, files, groupOp = true)
    op.groupScan = scan
    scan
  }
}

/** The replace write: stage rewritten files like the V2 append sink,
  * commit them IN PLACE OF the group scan's (runtime-narrowed) file
  * set.
  */
private[v2] final class ReplaceFilesWrite(store: SnapshotStoreOps,
                                          root: String, m: Manifest,
                                          schema: StructType,
                                          op: GraftRowLevelOperation)
    extends Write with RequiresDistributionAndOrdering {

  private val keyCol = m.keyCol

  override def description(): String =
    s"graft-snapshot replace-files `$root` (${op.command()})"

  override def requiredDistribution(): Distribution =
    Distributions.ordered(Array(sortOrder))

  override def requiredOrdering(): Array[SortOrder] = Array(sortOrder)

  // one output file per statically-selected file keeps file sizing
  // roughly stable under rewrites; runtime group filtering can only
  // shrink the row count (empty partitions write nothing)
  override def requiredNumPartitions(): Int =
    math.max(1, Option(op.groupScan).map(_.currentEntries.size).getOrElse(4))

  private def sortOrder: SortOrder = V2WriteConf.keySortOrder(keyCol)

  private val writeUuid = java.util.UUID.randomUUID().toString.take(8)
  private val stageRel = V2WriteConf.stageRel(writeUuid)

  override def toBatch: BatchWrite = new BatchWrite {
    private val factory = new SnapshotWriterFactory(root, stageRel,
      writeUuid, schema, schema.fieldIndex(keyCol),
      m.statsCols.map(c => c -> schema.fieldIndex(c)),
      m.bloomBits, V2WriteConf.resolved(), keyCol)

    override def createBatchWriterFactory(i: PhysicalWriteInfo): DataWriterFactory =
      factory

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val scan = op.groupScan
      require(scan != null,
        "row-level write committed before its group scan was planned")
      val replaced = scan.currentEntries.map(_.path).toSet
      store.commitReplaceEntries(root, m.version, replaced,
        V2WriteConf.entriesOf(messages))
      ()
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit =
      V2WriteConf.abortStaged(store, root, keyCol, messages)
  }
}
