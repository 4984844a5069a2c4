package graft.sources.v2

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadLimit, ReadMaxBytes, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
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
  * reading goes through Spark's own vectorized parquet reader over
  * split-and-packed [[FilePartition]]s, exactly like the batch scan.
  * Appended files carry a sequence number above every pre-existing
  * delete's, so the tail always reads plain; the snapshot phase
  * refuses unmaterialized merge-on-read deletes like the batch V2
  * scan does.
  *
  * NON-APPEND intervals refuse loudly: a rewrite (merge/compact), a
  * landed delete, or a schema-evolution commit inside a tail batch
  * makes "added files" stop meaning "added rows" — the stream fails
  * with guidance toward `graft-cdc` / `changes()` (row-level diffs)
  * or a restart (schema drift), the Delta behavior. It never silently
  * re-emits carried rows or serves a schema it wasn't planned with.
  *
  * ADMISSION CONTROL ([[SupportsAdmissionControl]]):
  * `maxFilesPerTrigger` / `maxBytesPerTrigger` cap each batch — file-
  * granular during the backfill, version-granular on the tail (a
  * version is the atomic replay unit there; at least one version
  * always admits, so a single over-limit commit still progresses).
  * `Trigger.AvailableNow` pins the head at prepare time and drains up
  * to it in limited batches — bounded backfill, then stop.
  */
private[v2] final class SnapshotMicroBatchStream(
    store: SnapshotStoreOps, root: String,
    dataSchema: StructType, required: StructType,
    pushed: Array[Filter], options: Map[String, String])
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
        val oldest = vs.headOption.getOrElse(0L)
        require(s >= oldest,
          s"startVersion $s predates the oldest retained version $oldest " +
            "(vacuumed away) — start at or after it")
        require(vs.lastOption.exists(_ >= s),
          s"startVersion $s does not exist yet (head: ${vs.lastOption
            .getOrElse(-1L)})")
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

  /** The backfill's file order: the manifest's own (deterministic —
    * offsets must replay to identical batches across restarts).
    */
  private def snapshotFiles(v: Long): Vector[FileEntry] =
    store.manifestAsOf(root, v).files

  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset = {
    val o = startOffset.asInstanceOf[TableOffset]
    val maxFiles = flatLimits(limit).collectFirst {
      case f: ReadMaxFiles => f.maxFiles()
    }
    val maxBytes = flatLimits(limit).collectFirst {
      case b: ReadMaxBytes => b.maxBytes()
    }
    if (o.snapIdx >= 0) {
      // BACKFILL: admit the next slice of the snapshot's files
      val files = snapshotFiles(o.version)
      val rest = files.drop(o.snapIdx.toInt)
      // prefix-contiguous slice: stop at the FIRST over-limit file
      // (always >= 1, so a single over-limit file still progresses)
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
    // TAIL: admit whole versions until a limit would be exceeded
    // (always at least one). Each manifest loads ONCE (the previous
    // step's manifest is the next step's base); the walk is manifest-
    // metadata-sized, never data-sized. A non-append version admits
    // as the FIRST version of its batch — planInputPartitions then
    // raises the loud refusal — or ends the batch just before itself.
    val v0 = o.version
    val head = availableNowCap.getOrElse(store.currentManifest(root).version)
    if (head <= v0) return TableOffset(v0, -1L)
    if (maxFiles.isEmpty && maxBytes.isEmpty) return TableOffset(head, -1L)
    var admitted = v0
    var files = 0
    var bytes = 0L
    var prev = store.manifestAsOf(root, v0)
    var v = v0 + 1
    while (v <= head) {
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
      v += 1
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
        schemaGuard(m, m)
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
        val (added, m1) = store.incrementalAddedFiles(
          root, o0.version, o1.version)
        schemaGuard(store.manifestAsOf(root, o0.version), m1)
        (added, m1)
      }
    val pruner = new ManifestPruner(planned)
    val usable = pushed.filter(pruner.usable)
    val kept = files.filter(f => usable.forall(pruner.mayMatch(f, _)))
    val spark = SparkSession.active
    val sized = kept.map { f =>
      val bytes =
        if (f.bytes > 0) f.bytes else store.fsSizeBytes(s"$root/${f.path}")
      (f, bytes)
    }
    val maxSplit = FilePartition.maxSplitBytes(spark, sized.map(_._2).sum)
    // split large files at maxSplit (the parquet reader serves the row
    // groups whose midpoint falls in its split), then bin-pack — the
    // same task sizing the batch scan gets from Spark's planner
    val splits = sized.flatMap { case (f, bytes) =>
      val p = org.apache.spark.paths.SparkPath
        .fromPath(new Path(root, f.path))
      (0L until bytes by maxSplit).map { off =>
        PartitionedFile(org.apache.spark.sql.catalyst.InternalRow.empty,
          p, off, math.min(maxSplit, bytes - off),
          Array.empty[String], 0L, bytes)
      }
    }.sortBy(-_.length)
    FilePartition.getFilePartitions(spark, splits, maxSplit).toArray
  }

  /** Schema drift refuses like Delta: files written under a schema
    * other than the stream's planned view must not be silently
    * projected/null-filled — restart the stream to adopt the new
    * schema (its checkpointed offset resumes past the boundary).
    */
  private def schemaGuard(m0: Manifest, m1: Manifest): Unit =
    if (m0.schemaDdl != m1.schemaDdl || !m1.schema.contains(dataSchema))
      throw new IllegalStateException(
        s"graft-snapshot stream: schema changed across versions " +
          s"${m0.version}..${m1.version} (stream planned " +
          s"${dataSchema.toDDL}) — restart the stream to adopt the new " +
          "schema; the checkpoint resumes from this offset")

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = SparkSession.active
    // a fully-handled key conjunct may have pruned its column out of
    // the projection; parquet's row-group filter against the REQUESTED
    // schema would treat the missing column as no-match (same rule as
    // the batch toBatch)
    val readCols = required.fieldNames.toSet
    val parquetFilters = pushed.filter(_.references.forall(readCols.contains))
    ParquetScan(spark,
      spark.sessionState.newHadoopConfWithOptions(options),
      new ManifestFileIndex(spark, new Path(root), Nil),
      dataSchema = dataSchema,
      readDataSchema = required,
      readPartitionSchema = new StructType(),
      pushedFilters = parquetFilters,
      options = new CaseInsensitiveStringMap(options.asJava))
      .toBatch.createReaderFactory()
  }
}
