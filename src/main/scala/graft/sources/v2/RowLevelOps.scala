package graft.sources.v2

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.SortOrder
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{LongType, StructField, StructType}
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
    declared: StructType, cmd: RowLevelOperation.Command,
    branch: Option[String] = None)
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
          GraftRowLevelOperation.this, branch)
    }
  }
}

/** MERGE-ON-READ row-level operations ([[SupportsDelta]], the Iceberg
  * `SparkPositionDeltaOperation` idea over this store's EQUALITY
  * deletes): a sparse UPDATE/MERGE/DELETE writes a key-count-sized
  * DELETE FILE plus data files holding only the NEW rows — never a
  * full rewrite of every touched wide file (the copy-on-write
  * amplification this mode exists to cut at 100 TB). Opt in per
  * session:
  *
  * {{{
  *   SET spark.graft.update.mode = merge-on-read
  *   UPDATE graft.db.t SET v = v + 1 WHERE k % 1000 = 7   -- 0.1% of rows
  * }}}
  *
  * Catalyst's rewrite rules see [[SupportsDelta]] and plan a
  * WriteDelta over ONLY the matching rows (the scan is the ordinary
  * pruned/pushed-down read — matching rows, not whole groups, flow to
  * the writers); each task's [[GraftDeltaWriter]] splits the stream:
  * deleted/updated keys accumulate into one sorted equality-delete
  * parquet under `deletes/`, inserted/updated rows stream through the
  * same stats-folding writer the append sink uses. The driver commit
  * ([[SnapshotStoreOps.commitDeltaEntries]]) lands BOTH in one
  * version: new data files at seq v, delete entries at seq v — the
  * store's existing seq rule scopes them to strictly-older files, so
  * the new rows are never shadowed by their own update's delete.
  *
  * The MOR-aware readers (`SnapshotStore.read`/`readAsOf`) serve the
  * result immediately; the raw-file V2 paths keep their loud refusal
  * until `apply_deletes`/`compact` materializes — including THIS
  * path's own scan, so a second delta statement touching
  * still-shadowed files refuses with the materialize-first guidance
  * instead of resurrecting stale rows into its matches.
  */
private[v2] final class GraftDeltaOperation(
    store: SnapshotStoreOps, root: String, m: Manifest,
    declared: StructType, cmd: RowLevelOperation.Command,
    branch: Option[String] = None)
    extends RowLevelOperation
    with org.apache.spark.sql.connector.write.SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd

  override def description(): String =
    s"graft-snapshot $cmd `$root` v${m.version} (merge-on-read)"

  override def rowId()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column(m.keyCol))

  /** The ORDINARY pruned read: matching rows (not whole files) reach
    * the writers, so pushdown and runtime key filtering are all legal
    * here — nothing needs carrying. Its existing unmaterialized-MOR
    * refusal is exactly the chained-delta guard (scaladoc above).
    */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SnapshotScanBuilder(SparkSession.active, store, root, m, declared,
      options)

  override def newWriteBuilder(info: LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.DeltaWriteBuilder = {
    val in = info.schema()
    // a pure DELETE plans an EMPTY row schema (only the rowId
    // projection flows — no data rows will ever reach insert/update)
    require(in.isEmpty || in.fieldNames.toSeq == declared.fieldNames.toSeq,
      s"row-level write schema must match the table schema " +
        s"${declared.toDDL}; got ${in.toDDL}")
    V2WriteConf.validateTypes(declared, m.keyCol, m.statsCols,
      "merge-on-read row-level writes")
    new org.apache.spark.sql.connector.write.DeltaWriteBuilder {
      override def build()
          : org.apache.spark.sql.connector.write.DeltaWrite =
        new MorDeltaWrite(store, root, m, declared, branch)
    }
  }
}

/** The delta write: new rows stage like the append sink, deleted keys
  * land as equality-delete files, one commit carries both.
  */
private[v2] final class MorDeltaWrite(store: SnapshotStoreOps,
                                      root: String, m: Manifest,
                                      schema: StructType,
                                      branch: Option[String] = None)
    extends org.apache.spark.sql.connector.write.DeltaWrite {

  override def description(): String =
    s"graft-snapshot delta-write `$root` v${m.version}"

  private val writeUuid = java.util.UUID.randomUUID().toString.take(8)
  private val stageRel = V2WriteConf.stageRel(writeUuid)

  /** Per-task ceiling on accumulated delete keys: the sorted set
    * lives in task HEAP until the commit-time flush, so a NON-sparse
    * statement (a 30% delete under merge-on-read) must refuse loudly
    * with mode guidance instead of creeping toward an executor OOM —
    * merge-on-read exists for MATCH-SIZED statements. Resolved on the
    * driver from the session conf; the default bounds the set near
    * ~1 GiB of boxed longs per task.
    */
  private val maxDeltaKeys: Long = SparkSession.active.conf
    .getOption(MorDeltaWrite.MaxKeysConf).map(_.toLong)
    .getOrElse(MorDeltaWrite.DefaultMaxKeysPerTask)

  override def toBatch
      : org.apache.spark.sql.connector.write.DeltaBatchWrite =
    new org.apache.spark.sql.connector.write.DeltaBatchWrite {
      private val factory = new MorDeltaWriterFactory(root, stageRel,
        writeUuid, schema, schema.fieldIndex(m.keyCol),
        m.statsCols.map(c => c -> schema.fieldIndex(c)),
        m.bloomBits, V2WriteConf.resolved(), m.keyCol, maxDeltaKeys)

      override def createBatchWriterFactory(i: PhysicalWriteInfo)
          : org.apache.spark.sql.connector.write.DeltaWriterFactory =
        factory

      override def commit(messages: Array[WriterCommitMessage]): Unit = {
        val ms = messages.toVector.collect { case d: MorDeltaMessage => d }
        val files = V2WriteConf.entriesOf(ms.flatMap(_.data).toArray)
        val dels = ms.flatMap(_.delete).map { case (p, mn, mx, n) =>
          graft.sources.SnapshotStore.DeleteEntry(p, mn, mx, n, seq = 0L)
        }
        if (files.isEmpty && dels.isEmpty) return // matched nothing
        try {
          store.commitDeltaEntries(root, m.version, files, dels, branch)
          ()
        } catch {
          case e: java.util.ConcurrentModificationException =>
            // the staged DATA files are cleaned by the engine-driven
            // abort; the delete files already live under deletes/ and
            // are ours to remove on a refused commit
            ms.flatMap(_.delete).foreach { case (p, _, _, _) =>
              store.fsDelete(s"$root/$p")
            }
            throw e
        }
      }

      override def abort(messages: Array[WriterCommitMessage]): Unit = {
        val ms = messages.toVector.collect { case d: MorDeltaMessage => d }
        V2WriteConf.abortStaged(store, root, m.keyCol,
          ms.flatMap(_.data).toArray)
        ms.flatMap(_.delete).foreach { case (p, _, _, _) =>
          store.fsDelete(s"$root/$p")
        }
      }
    }
}

/** Per-task outcome: an optional staged data file (new/updated rows,
  * stats folded inline) and an optional equality-delete file
  * `(path, minKey, maxKey, keys)` already under `deletes/`.
  */
private[v2] final case class MorDeltaMessage(
    data: Option[V2FileMessage],
    delete: Option[(String, Long, Long, Long)])
    extends WriterCommitMessage

private[v2] object MorDeltaWrite {
  val MaxKeysConf = "spark.graft.update.maxDeltaKeysPerTask"
  /** ~16M boxed longs ≈ 1 GiB of task heap — far past any statement
    * merge-on-read is the right mode for.
    */
  val DefaultMaxKeysPerTask: Long = 16L * 1024 * 1024
}

private[v2] final class MorDeltaWriterFactory(root: String, stageRel: String,
                                              writeUuid: String,
                                              schema: StructType,
                                              keyOrd: Int,
                                              statsOrds: Vector[(String, Int)],
                                              bloomBits: Int,
                                              confKVs: Array[(String, String)],
                                              keyCol: String,
                                              maxDeltaKeys: Long)
    extends org.apache.spark.sql.connector.write.DeltaWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] =
    new GraftDeltaWriter(root, stageRel,
      f"$writeUuid-part-$partitionId%05d-$taskId", schema, keyOrd,
      statsOrds, bloomBits, confKVs, keyCol, maxDeltaKeys)
}

/** One task's delta stream: inserts (and update post-rows) flow into
  * the shared stats-folding parquet writer; deleted (and update pre-)
  * KEYS collect into a sorted set and flush as one equality-delete
  * parquet at commit. Work and bytes are MATCH-sized, never
  * file-sized.
  */
private[v2] final class GraftDeltaWriter(root: String, stageRel: String,
                                         fileBase: String,
                                         schema: StructType, keyOrd: Int,
                                         statsOrds: Vector[(String, Int)],
                                         bloomBits: Int,
                                         confKVs: Array[(String, String)],
                                         keyCol: String,
                                         maxDeltaKeys: Long = Long.MaxValue)
    extends org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] {

  private val rows = new SnapshotDataWriter(root, stageRel, fileBase,
    schema, keyOrd, statsOrds, bloomBits, confKVs, keyCol)

  private val deletedKeys = new java.util.TreeSet[java.lang.Long]()

  // the rowId projection carries the key under its DECLARED type —
  // a getLong on an INT key would zero-extend the 4-byte slot
  // (negative keys corrupt silently); dispatch like longAt does
  private val keyDt = schema(keyOrd).dataType

  private def keyOf(id: InternalRow): Long = {
    require(!id.isNullAt(0), "row-level delete with a NULL key")
    keyDt match {
      case org.apache.spark.sql.types.LongType => id.getLong(0)
      case org.apache.spark.sql.types.IntegerType => id.getInt(0).toLong
      case org.apache.spark.sql.types.ShortType => id.getShort(0).toLong
      case org.apache.spark.sql.types.ByteType => id.getByte(0).toLong
      case dt => throw new IllegalStateException(
        s"non-integral key type ${dt.sql}") // builder refused already
    }
  }

  // the DENSE-DELTA budget: a per-task ceiling on the sorted set a
  // merge-on-read statement accumulates in heap. Checked on the add
  // path (cheap size read), refusing with mode guidance — a delete
  // set past this is no longer the sparse shape the mode exists for,
  // and the alternatives (copy-on-write rewrite; the key-range DELETE,
  // which is manifest-arithmetic + boundary files) handle dense
  // statements without any per-task key state at all.
  private def budgeted(k: Long): Unit = {
    deletedKeys.add(k)
    if (deletedKeys.size() > maxDeltaKeys)
      throw new IllegalStateException(
        s"merge-on-read delete set exceeded $maxDeltaKeys keys in one " +
          "task — this statement is not sparse. Use copy-on-write " +
          "(SET spark.graft.update.mode = copy-on-write, or the table's " +
          "update.mode property), or a key-range DELETE (manifest-" +
          "arithmetic); or raise " + MorDeltaWrite.MaxKeysConf)
    ()
  }

  override def delete(meta: InternalRow, id: InternalRow): Unit =
    budgeted(keyOf(id))

  override def update(meta: InternalRow, id: InternalRow,
                      row: InternalRow): Unit = {
    budgeted(keyOf(id))
    rows.write(row)
  }

  override def insert(row: InternalRow): Unit = rows.write(row)

  private var deletePath: Option[(String, Long, Long, Long)] = None

  override def commit(): WriterCommitMessage = {
    if (!deletedKeys.isEmpty) {
      val rel = s"deletes/mor-$fileBase.parquet"
      val conf = SnapshotDataWriter.taskConf(confKVs)
      val delSchema = StructType(Seq(
        StructField(keyCol, LongType, nullable = false)))
      val hPath = new Path(root, rel)
      val w = SnapshotDataWriter.openRowWriter(hPath, delSchema, conf)
      try {
        val it = deletedKeys.iterator()
        val one = new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(1)
        while (it.hasNext) {
          one.update(0, it.next().longValue())
          w.write(one)
        }
      } finally w.close()
      deletePath = Some((rel, deletedKeys.first().longValue(),
        deletedKeys.last().longValue(), deletedKeys.size().toLong))
    }
    val dataMsg = rows.commit() match {
      case m: V2FileMessage => Some(m)
      case _ => None
    }
    MorDeltaMessage(dataMsg, deletePath)
  }

  override def abort(): Unit = {
    rows.abort()
    // a flushed delete file of a failed task is unreferenced litter
    deletePath.foreach { case (rel, _, _, _) =>
      val conf = SnapshotDataWriter.taskConf(confKVs)
      val p = new Path(root, rel)
      val fs = p.getFileSystem(conf)
      if (fs.exists(p)) { fs.delete(p, false); () }
    }
  }

  override def close(): Unit = rows.close()
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
                                          op: GraftRowLevelOperation,
                                          branch: Option[String] = None)
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
        V2WriteConf.entriesOf(messages), branch)
      ()
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit =
      V2WriteConf.abortStaged(store, root, keyCol, messages)
  }
}
