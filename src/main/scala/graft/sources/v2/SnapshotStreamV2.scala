package graft.sources.v2

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadLimit, ReadMaxBytes, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.SnapshotStoreOps
import graft.sources.SnapshotStore.{FileEntry, Manifest}

/** Two-phase stream position (the Delta `(reservoirVersion, index)`
  * shape):
  *
  *  - `snapIdx >= 0` — BACKFILL: the first `snapIdx` files of
  *    `manifestAsOf(version)` are emitted; the initial snapshot is
  *    draining in admission-limited slices.
  *  - `snapIdx == -1` — TAIL: everything through `version` is
  *    emitted; micro-batches cover appended files of `(version, end]`.
  */
private[v2] final case class TableOffset(version: Long, snapIdx: Long)
    extends Offset {
  override def json(): String = s"$version:$snapIdx"
}

private[v2] object TableOffset {
  def parse(json: String): TableOffset = {
    val Array(v, i) = json.split(":", 2)
    TableOffset(v.toLong, i.toLong)
  }
}

/** STREAMING TABLE READS — `spark.readStream.format("graft-snapshot")`
  * (the Delta/Iceberg "stream from a table" surface; `graft-cdc` is
  * the sibling for row-level change feeds):
  *
  * {{{
  *   spark.readStream.format("graft-snapshot")
  *     .option("startVersion", 0)          // backfill from v0, then tail
  *     .option("maxFilesPerTrigger", 100)  // admission control
  *     .option("maxBytesPerTrigger", 1L << 30)
  *     .load(root)                         // default: tail from head
  * }}}
  *
  * The OFFSET IS a store position: with `startVersion` the stream
  * first emits the table SNAPSHOT as of that version (in
  * admission-limited slices — a 100 TB initial snapshot is thousands
  * of micro-batches, not one), then TAILS appends; without it, it
  * tails from the head. Planning is manifest arithmetic (zero
  * listing/stat RPCs; the tail shares [[graft.sources
  * .SnapshotStoreOps.appendOnlyAdded]] with `readIncremental`),
  * reading goes through Spark's own vectorized parquet planning over
  * a [[ManifestFileIndex]] of the batch's files — the SAME split/
  * bin-pack/reader machinery the batch scan delegates to. Appended
  * files carry a sequence number above every pre-existing delete's,
  * so the tail always reads plain; the backfill refuses
  * unmaterialized merge-on-read deletes like the batch V2 scan does.
  *
  * NON-APPEND tail intervals refuse loudly: a rewrite (merge/compact)
  * or a landed delete makes "added files" stop meaning "added rows" —
  * the stream fails with guidance toward `graft-cdc` / `changes()`
  * (row-level diffs). It never silently re-emits carried rows.
  *
  * SCHEMA EVOLUTION serves the stream's DECLARED VIEW (the
  * construction-time schema — the same rule `graft-cdc` images use):
  * files predating an `addColumn` read the added column as NULL,
  * files written after one project the extra column away, dropped
  * columns null-fill. Emitted rows therefore always match the schema
  * the downstream query was analyzed with; a consumer wanting a NEWLY
  * added column restarts on its own schedule (a checkpointed restart
  * replays pending batches under the new view — nothing wedges). The
  * one genuinely unreconcilable case — a column dropped and re-added
  * under a DIFFERENT type — refuses loudly at planning.
  *
  * ADMISSION CONTROL ([[SupportsAdmissionControl]]):
  * `maxFilesPerTrigger` / `maxBytesPerTrigger` cap each batch — file-
  * granular during the backfill, version-granular on the tail (a
  * version is the atomic replay unit there; at least one version
  * always admits, so a single over-limit commit still progresses).
  * The tail walk iterates the RETAINED version list (vacuum may leave
  * gaps — untagged intermediates drop while tagged ones stay), so
  * offsets only ever land on versions that exist. Files predating
  * byte tracking report 0 bytes and cannot be byte-budgeted — they
  * pass (unknown, not unbounded; the `graft-cdc` `maxDeltaBytes`
  * rule) — use `maxFilesPerTrigger` on such stores.
  * `Trigger.AvailableNow` pins the head at prepare time and drains up
  * to it in limited batches — bounded backfill, then stop.
  */
private[v2] final class SnapshotMicroBatchStream(
    store: SnapshotStoreOps, root: String,
    dataSchema: StructType, required: StructType,
    pushed: Array[Filter], options: Map[String, String],
    viewRenames: Vector[graft.sources.SnapshotStore.Rename] = Vector.empty)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private val start: Option[Long] = options.get("startversion").map(_.toLong)
  start.foreach(v => require(v >= 0, s"startVersion must be >= 0, got $v"))

  // Trigger.AvailableNow: the head pinned at prepare time — batches
  // never admit past it, so the query drains and stops even while
  // writers keep committing
  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(store.currentManifest(root).version)

  override def initialOffset(): Offset = {
    // consulted on a FRESH start only (a checkpointed restart resumes
    // from its offset log) — the right place for the retention and
    // existence checks: the backfill reads manifestAsOf(start), which
    // vacuum may have dropped or a writer not yet committed
    start match {
      case None =>
        TableOffset(store.currentManifest(root).version, -1L)
      case Some(s) =>
        val vs = store.versions(root)
        require(vs.contains(s),
          s"startVersion $s is not a retained version (oldest: " +
            s"${vs.headOption.getOrElse(-1L)}, head: " +
            s"${vs.lastOption.getOrElse(-1L)}; vacuum drops untagged " +
            "intermediates) — start at a retained version")
        TableOffset(s, 0L)
    }
  }

  override def deserializeOffset(json: String): Offset =
    TableOffset.parse(json)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def getDefaultReadLimit: ReadLimit = {
    val limits = Seq(
      options.get("maxfilespertrigger").map(n => ReadLimit.maxFiles(n.toInt)),
      options.get("maxbytespertrigger").map(n => ReadLimit.maxBytes(n.toLong))
    ).flatten
    limits match {
      case Seq() => ReadLimit.allAvailable()
      case Seq(one) => one
      case many => ReadLimit.compositeLimit(many.toArray)
    }
  }

  // the engine calls the ReadLimit overload on admission-controlled
  // streams; the plain one exists only to satisfy the interface
  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "latestOffset(Offset, ReadLimit) should be called instead of this")

  override def reportLatestOffset(): Offset =
    TableOffset(store.currentManifest(root).version, -1L)

  private def flatLimits(l: ReadLimit): Seq[ReadLimit] = l match {
    case c: CompositeReadLimit => c.getReadLimits.toSeq.flatMap(flatLimits)
    case other => Seq(other)
  }

  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset = {
    val o = startOffset.asInstanceOf[TableOffset]
    val maxFiles = flatLimits(limit).collectFirst {
      case f: ReadMaxFiles => f.maxFiles()
    }
    val maxBytes = flatLimits(limit).collectFirst {
      case b: ReadMaxBytes => b.maxBytes()
    }
    if (o.snapIdx >= 0) {
      // BACKFILL: admit the next prefix-contiguous slice of the
      // snapshot's files (the manifest's own order — deterministic,
      // so offsets replay to identical batches), stopping at the
      // FIRST over-limit file; always >= 1, so a single over-limit
      // file still progresses
      val files = store.manifestAsOf(root, o.version).files
      val rest = files.drop(o.snapIdx.toInt)
      var n = 0
      var bytes = 0L
      var stop = false
      val it = rest.iterator
      while (!stop && it.hasNext) {
        val f = it.next()
        val over = maxFiles.exists(n + 1 > _) ||
          maxBytes.exists(bytes + f.bytes > _)
        if (over && n > 0) stop = true
        else { n += 1; bytes += f.bytes; if (over) stop = true }
      }
      val idx = o.snapIdx + n
      return if (idx >= files.size) TableOffset(o.version, -1L)
      else TableOffset(o.version, idx)
    }
    // TAIL: admit whole RETAINED versions until a limit would be
    // exceeded (always at least one). Each manifest loads ONCE (the
    // previous step's manifest is the next step's base); the walk is
    // manifest-metadata-sized, never data-sized. A non-append version
    // admits as the FIRST version of its batch — planInputPartitions
    // then raises the loud refusal — or ends the batch just before
    // itself.
    val v0 = o.version
    val head = availableNowCap.getOrElse(store.currentManifest(root).version)
    if (head <= v0) return TableOffset(v0, -1L)
    if (maxFiles.isEmpty && maxBytes.isEmpty) return TableOffset(head, -1L)
    val steps = store.versions(root).filter(v => v > v0 && v <= head)
    var admitted = v0
    var files = 0
    var bytes = 0L
    var prev = store.manifestAsOf(root, v0)
    val it = steps.iterator
    while (it.hasNext) {
      val v = it.next()
      val cur = store.manifestAsOf(root, v)
      val added =
        try store.appendOnlyAdded(prev, cur)
        catch {
          case _: IllegalArgumentException =>
            return TableOffset(if (admitted == v0) v else admitted, -1L)
        }
      files += added.size
      bytes += added.map(_.bytes).sum
      val over = maxFiles.exists(files > _) || maxBytes.exists(bytes > _)
      if (over && admitted > v0) return TableOffset(admitted, -1L)
      admitted = v
      if (over) return TableOffset(admitted, -1L) // single over-limit version
      prev = cur
    }
    TableOffset(admitted, -1L)
  }

  override def planInputPartitions(startOffset: Offset, end: Offset)
      : Array[InputPartition] = {
    val o0 = startOffset.asInstanceOf[TableOffset]
    val o1 = end.asInstanceOf[TableOffset]
    val (files: Vector[FileEntry], planned: Manifest) =
      if (o0.snapIdx >= 0) {
        // BACKFILL slice [o0.snapIdx, o1.snapIdx) of the snapshot
        val m = store.manifestAsOf(root, o0.version)
        typeGuard(m)
        val all = m.files
        val hi = if (o1.snapIdx < 0) all.size else o1.snapIdx.toInt
        val slice = all.slice(o0.snapIdx.toInt, hi)
        // raw-file phase: like the batch V2 scan, refuse silently
        // resurrecting merge-on-read-deleted keys
        val blocked = slice.filter(f => store.applicableDeletes(m, f).nonEmpty)
        if (blocked.nonEmpty) throw new IllegalStateException(
          s"version ${m.version} has unmaterialized merge-on-read deletes " +
            s"applying to ${blocked.size} snapshot file(s) — run " +
            "applyDeletes/compact first, or tail row-level changes via " +
            "graft-cdc")
        (slice, m)
      } else {
        if (o0.version >= o1.version) return Array.empty
        val m1 = store.manifestAsOf(root, o1.version)
        typeGuard(m1)
        (store.appendOnlyAdded(store.manifestAsOf(root, o0.version), m1), m1)
      }
    // prune files that can never match the stream's pushed predicates
    // — a filtered stream skips whole files by manifest envelope/bloom
    // before any task launches
    val pruner = new ManifestPruner(planned)
    val usable = pushed.filter(pruner.usable)
    val kept = files.filter(f => usable.forall(pruner.mayMatch(f, _)))
    // RENAMED eras: files written before a rename store the column
    // under its old physical name — group by era under the VIEW's
    // rename log and read each group through a ParquetScan whose
    // schemas are the view's RE-LABELED to that era (same positions
    // and types, so every era emits layout-identical rows — exactly
    // the batch scan's era split). A checkpointed restart whose
    // backlog predates an adopted rename therefore just SERVES it;
    // only a rename the view itself predates refuses (typeGuard).
    import graft.sources.SnapshotStore.Renames
    kept.groupBy(f => Renames.eraOf(viewRenames, f.seq)).toSeq
      .sortBy(_._1).flatMap { case (e, fs) =>
        scanOver(fs, eraRepSeq(e)).toBatch.planInputPartitions()
          .map(EraPartition(e, _))
      }.toArray
  }

  /** A representative seq INSIDE era `e` of the view's rename log —
    * what the per-era physical schemas re-label by. Era 0 predates
    * every rename; era e sits at the e-th rename's landing version;
    * the head era is unbounded.
    */
  private def eraRepSeq(e: Int): Long = {
    import graft.sources.SnapshotStore.Renames
    if (e >= viewRenames.size) Long.MaxValue
    else if (e == 0) 0L
    else viewRenames(e - 1).v
  }

  /** A column dropped and re-added under a DIFFERENT type cannot be
    * served into the stream's declared view (the parquet readers
    * would fault on the physical type) — UNLESS the version's type
    * merely WIDENS into the view's (TINYINT/SMALLINT/INT -> BIGINT,
    * FLOAT -> DOUBLE: the parquet readers up-convert natively, so a
    * widened table keeps streaming into the wide view). Everything
    * else refuses. Adds and drops serve the declared view (scaladoc
    * above).
    */
  private def typeGuard(m: Manifest): Unit = {
    val view = dataSchema.fields.map(f => f.name -> f.dataType).toMap
    m.schema.foreach(_.fields.foreach { f =>
      view.get(f.name).foreach { dt =>
        // store.canWiden: the ONE lossless-widening table. Two distinct
        // failure shapes with two distinct remedies: the version being
        // WIDER than the view means a lossless widen landed after
        // stream start — a checkpointed RESTART re-resolves the wide
        // view, which then serves the narrow backlog via canWiden (the
        // rename guard's restart-to-adopt rule); anything else is a
        // dropped-and-re-added type change, which no single view can
        // ever serve.
        if (dt != f.dataType && !store.canWiden(f.dataType, dt)) {
          val head = s"graft-snapshot stream: column '${f.name}' is " +
            s"${f.dataType.sql} at version ${m.version} but ${dt.sql} in " +
            "the stream's view — "
          if (store.canWiden(dt, f.dataType))
            throw new IllegalStateException(head +
              "a type widening landed after stream start; restart the " +
              "stream to adopt the widened schema (a checkpointed " +
              "restart resumes position and serves the narrow backlog)")
          else
            throw new IllegalStateException(head +
              "a dropped-and-re-added type change cannot stream across; " +
              "read the two eras as separate streams")
        }
      }
    })
    // RENAME boundary: the view translates each file's physical
    // names through its OWN rename log (the era-split scans in
    // planInputPartitions), so any backlog the view's log covers —
    // including a checkpointed restart whose backlog predates a
    // rename the restart adopted — SERVES exactly. Only a rename the
    // view has not seen (the version's log extends past the view's,
    // or a rollback shortened it) refuses: a checkpointed RESTART
    // re-resolves the view and genuinely adopts it.
    if (!viewRenames.startsWith(m.renames)) throw new IllegalStateException(
      s"graft-snapshot stream: version ${m.version} declares column " +
        "renames the stream's view predates — restart the stream to " +
        "adopt the new names (a checkpointed restart resumes position)")
  }

  /** The batch's files as a ParquetScan over a fabricated
    * [[ManifestFileIndex]] — Spark's own split/bin-pack planning and
    * vectorized reader factory, exactly what the batch scan delegates
    * to (no hand-rolled copy to drift). Pre-byte-stats entries fall
    * back to one driver stat each.
    */
  private def scanOver(files: Seq[FileEntry], eraSeq: Long): ParquetScan = {
    import graft.sources.SnapshotStore.Renames
    val spark = SparkSession.active
    val sized = files.map { f =>
      val bytes =
        if (f.bytes > 0) f.bytes else store.fsSizeBytes(s"$root/${f.path}")
      (new Path(root, f.path), bytes)
    }
    // a fully-handled key conjunct may have pruned its column out of
    // the projection; parquet's row-group filter against the REQUESTED
    // schema would treat the missing column as no-match (same rule as
    // the batch toBatch).
    //
    // ERA SCOPING: a pushed filter is served verbatim in this era only
    // if its referenced columns SPELL THE SAME there — a filter on a
    // post-rename name pushed into a pre-rename file would row-group-
    // match nothing and silently DROP that file's rows (the column
    // that now carries stats can predate its membership in statsCols:
    // setClusterSpec + a historical rename makes this reachable).
    // Filters that don't cover an era are scoped OUT for it — sound,
    // because every non-key pushed filter stays RESIDUAL (Spark
    // re-checks rows), and the only claimed-handled filters reference
    // the KEY, which renameColumn refuses to rename unconditionally.
    // Manifest-level pruning needs no such scoping: per-file stats are
    // keyed by the name declared at COMMIT time, so a renamed column's
    // old files simply have no entry and read conservatively.
    val eraStable = pushed.filter(_.references.forall(c =>
      Renames.physicalName(viewRenames, eraSeq, c) == c))
    val readCols = required.fieldNames.toSet
    val parquetFilters =
      eraStable.filter(_.references.forall(readCols.contains))
    ParquetScan(spark,
      spark.sessionState.newHadoopConfWithOptions(options),
      new ManifestFileIndex(spark, new Path(root), sized),
      dataSchema = Renames.physicalSchema(dataSchema, viewRenames, eraSeq),
      readDataSchema = Renames.physicalSchema(required, viewRenames, eraSeq),
      readPartitionSchema = new StructType(),
      pushedFilters = parquetFilters,
      options = new CaseInsensitiveStringMap(options.asJava))
  }

  /** One delegate per era of the view's rename log — partitions carry
    * their era index, so a mixed-era micro-batch reads each file
    * under its own physical names (the batch scan's [[EraBatch]]
    * contract, stream-side).
    */
  override def createReaderFactory(): PartitionReaderFactory =
    new EraReaderFactory((0 to viewRenames.size).map(e =>
      scanOver(Nil, eraRepSeq(e)).toBatch.createReaderFactory()))
}
