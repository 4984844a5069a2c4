package graft.sources.v2

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.SnapshotStore.{FileEntry, Manifest, Rename, Renames}
import graft.sources.SnapshotStoreOps

/** The snapshot store's CHANGE FEED as a DataSourceV2 micro-batch
  * stream — the offset IS the store version:
  *
  * {{{
  *   spark.readStream.format("graft-cdc")
  *     .option("startVersion", 0)   // default: tail from the current
  *     .load(root)                  // version at stream start
  * }}}
  *
  * Each micro-batch covers the versions committed since the last
  * offset; for every version `v` in the batch it emits the rows of
  * `changes(v - 1, v)` — (keyCol, op, version) — computed ON THE
  * EXECUTORS, one partition per version. This removes the two driver
  * bottlenecks of the foreachBatch version-loop this source replaces:
  * no per-version driver iteration (versions in a batch process as
  * ordinary parallel tasks) and no per-version `coalesce(1)` sink
  * writes (the batch is one DataFrame; the sink decides its layout).
  *
  * Each partition is SELF-CONTAINED: it carries the two versions'
  * touched-file lists (the delta-sized read set shared with
  * [[graft.sources.SnapshotStore.changes]] — files carried verbatim
  * contribute nothing and are never read) plus each file's applicable
  * equality-delete files; the reader builds key→payload-digest maps
  * for both sides with a plain parquet reader and diffs them locally.
  * No shuffle: the store's keyed-upsert discipline means a version's
  * touched files ARE the complete home of every key that can differ.
  * Per-version work is therefore DELTA-sized, the right unit for a
  * commit-rate-sized tail; a diff of table-sized rewrites belongs to
  * the batch API (`changes()`), which joins distributed.
  *
  * Payload digests only classify update-vs-unchanged WITHIN one
  * version pair (never compared to the batch API's hashes), so the
  * encoding just needs injectivity: field-name-tagged, separator-
  * delimited value renderings, null fields omitted — the same
  * boundary/null discipline `changes()` gets from to_json. Supported
  * payload types are the flat primitives the store's tables use
  * (integral, string, boolean, float, double, date); anything else
  * refuses at stream construction and points at the batch API.
  */
final class CdcSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-cdc"

  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CdcSource.tableFor(options).schema()

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    CdcSource.tableFor(new CaseInsensitiveStringMap(properties))
}

object CdcSource {
  private val Supported: Set[DataType] = Set(LongType, IntegerType,
    ShortType, ByteType, StringType, BooleanType, FloatType, DoubleType,
    DateType)

  private[v2] def unsupportedColumns(schema: StructType): Array[String] =
    schema.fields.filterNot(f => Supported(f.dataType))
      .map(f => s"${f.name}: ${f.dataType.sql}")

  /** Default ceiling on one version's touched-file bytes (2 GiB): a
    * version pair diffs in ONE task's heap, so a table-sized read set
    * (a large rewrite, or a schema-evolution commit disengaging the
    * verbatim-carry skip) must refuse loudly instead of OOMing an
    * executor mid-stream — the batch `changes()` API diffs those as a
    * distributed join.
    */
  private[v2] val DefaultMaxDeltaBytes: Long = 2L * 1024 * 1024 * 1024

  private[v2] def tableFor(options: CaseInsensitiveStringMap): CdcTable = {
    require(options.get("branch") == null,
      "graft-cdc tails the MAIN chain (branch commits fast-forward " +
        "into it); drop the branch option")
    val (store, root, m) = SnapshotSource.resolve(options)
    val start = Option(options.get("startVersion")).map(_.toLong)
    val images = Option(options.get("images")).exists(_.toBoolean)
    val maxDelta = Option(options.get("maxDeltaBytes")).map(_.toLong)
      .getOrElse(DefaultMaxDeltaBytes)
    forStore(store, root, m, start, images, maxDelta)
  }

  /** The feed over a resolved store — shared by the path-based
    * provider above and [[GraftCatalog]]'s `db.t.changes` /
    * `db.t.changes_images` metadata suffixes, so the two name
    * surfaces can never validate differently.
    */
  private[v2] def forStore(store: SnapshotStoreOps, root: String,
                           m: Manifest, start: Option[Long],
                           images: Boolean, maxDelta: Long): CdcTable = {
    val declared = m.schema.getOrElse(throw new IllegalArgumentException(
      "this snapshot store predates schema tracking — graft-cdc needs the declared schema"))
    unsupportedColumns(declared) match {
      case Array() => ()
      case bad => throw new IllegalArgumentException(
        s"graft-cdc supports flat primitive payloads; unsupported column(s) " +
          s"${bad.mkString(", ")} — diff via SnapshotStore.changes() instead")
    }
    // a negative start is a config error regardless of table state —
    // refuse at construction with guidance, not as an opaque
    // missing-manifest error from a later planInputPartitions. The
    // retention-floor check lives in initialOffset instead: it only
    // binds on a FRESH start (a checkpointed restart never consults
    // startVersion, and must keep restarting after vacuum drops it).
    start.foreach(v => require(v >= 0, s"startVersion must be >= 0, got $v"))
    // a non-positive budget is a CONFIG error — refuse here, not as a
    // confusing over-budget failure on the first non-empty batch
    require(maxDelta > 0, s"maxDeltaBytes must be > 0, got $maxDelta")
    new CdcTable(store, root, m.keyCol, start, images, declared, maxDelta,
      m.version, m.renames)
  }
}

/** `images = false`: the classic key-level feed (key, op, version).
  * `images = true`: the Delta-CDF shape — one row per pre/post image,
  * `(key, _change_type, version, <payload columns>)` with change
  * types insert / update_preimage / update_postimage / delete; the
  * partition reader already holds both sides' payloads when it
  * classifies, so emitting them costs no extra read. Payload columns
  * are the STREAM-construction-time schema's; versions that predate
  * an addColumn render the added column as NULL (their declared view).
  */
private[v2] final class CdcTable(store: SnapshotStoreOps, root: String,
                                 keyCol: String, start: Option[Long],
                                 images: Boolean, declared: StructType,
                                 maxDeltaBytes: Long,
                                 viewVersion: Long,
                                 viewRenames: Vector[Rename])
    extends Table with SupportsRead {

  override def name(): String = s"graft-cdc `$root`"

  private def payloadFields: Seq[StructField] =
    declared.fields.toSeq.filterNot(_.name == keyCol)
      .map(f => StructField(f.name, f.dataType, nullable = true))

  override def schema(): StructType =
    if (images) StructType(
      StructField(keyCol, LongType, nullable = false) +:
        StructField("_change_type", StringType, nullable = false) +:
        StructField("version", LongType, nullable = false) +:
        payloadFields)
    else StructType(Seq(
      StructField(keyCol, LongType, nullable = false),
      StructField("op", StringType, nullable = false),
      StructField("version", LongType, nullable = false)))

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_READ)

  /** Reader options refine the table-level defaults — the surface a
    * CATALOG-name consumer has (`spark.readStream
    * .option("startVersion", 0).table("graft.db.t.changes")`: the
    * catalog's loadTable sees no options, the SCAN does). `images`
    * stays table-level: it changes the SCHEMA, which analysis fixes
    * before scan options apply — the catalog serves it as the
    * `changes_images` suffix instead. `endVersion` applies to BATCH
    * reads only (a stream's end is its offset walk).
    */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val start2 = Option(options.get("startVersion")).map(_.toLong)
      .orElse(start)
    start2.foreach(v => require(v >= 0, s"startVersion must be >= 0, got $v"))
    val end2 = Option(options.get("endVersion")).map(_.toLong)
    val maxDelta2 = Option(options.get("maxDeltaBytes")).map(_.toLong)
      .getOrElse(maxDeltaBytes)
    require(maxDelta2 > 0, s"maxDeltaBytes must be > 0, got $maxDelta2")
    new CdcScan(store, root, keyCol, schema(), start2, end2,
      if (images) Some(payloadFields.map(f => f.name -> f.dataType))
      else None,
      maxDelta2, viewVersion, viewRenames)
  }
}

private[v2] final class CdcScan(store: SnapshotStoreOps, root: String,
                                keyCol: String, schema: StructType,
                                start: Option[Long],
                                end: Option[Long],
                                imageCols: Option[Seq[(String, DataType)]],
                                maxDeltaBytes: Long,
                                viewVersion: Long,
                                viewRenames: Vector[Rename])
    extends ScanBuilder with Scan
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {

  /** PROJECTION PUSHDOWN: a consumer reading two columns of an image
    * feed must not decode every image slot of every change row. Only
    * the OUTPUT prunes — change CLASSIFICATION still digests every
    * declared payload column (an update on an unprojected column must
    * keep emitting its change rows; projection narrows what a change
    * row carries, never which rows exist — the Delta CDF contract).
    *
    * Tracked by POSITION in the feed schema, never by name: the feed's
    * fixed slots are positional (0 = key, 1 = op/_change_type,
    * 2 = version, 3+ = payload), and a payload column coincidentally
    * NAMED "op" or "version" must keep serving its stored values, not
    * the feed's bookkeeping.
    */
  private var projectedIdx: Array[Int] = schema.fields.indices.toArray

  override def pruneColumns(required: StructType): Unit = {
    val keep = required.fieldNames.toSet
    projectedIdx = schema.fields.indices
      .filter(i => keep(schema.fields(i).name)).toArray
  }

  override def build(): Scan = this
  override def readSchema(): StructType =
    StructType(projectedIdx.map(schema.fields))
  override def description(): String = s"graft-cdc `$root`"

  /** The pruned payload slots (image feeds decode ONLY these) plus
    * the output row recipe: for each projected field, the canonical
    * source — 0 = key, 1 = op/_change_type, 2 = version, 3+j = pruned
    * payload slot j.
    */
  private def prunedPlan: (Option[Seq[(String, DataType)]], Array[Int]) = {
    val payloadKeep = projectedIdx.filter(_ >= 3).map(_ - 3)
    val prunedPayload = imageCols.map(all => payloadKeep.map(all).toSeq)
    val payloadRank = payloadKeep.zipWithIndex.toMap
    val out = projectedIdx.map(i => if (i < 3) i else 3 + payloadRank(i - 3))
    (prunedPayload, out)
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    val (pruned, out) = prunedPlan
    new CdcMicroBatchStream(store, root, keyCol, start, pruned, out,
      maxDeltaBytes, viewVersion, viewRenames)
  }

  /** BATCH change read (the Delta `table_changes(t, start, end)` /
    * Iceberg changelog-table shape): `SELECT * FROM graft.db.t.changes`
    * — or `spark.read.option("startVersion", a)
    * .option("endVersion", b).table(...)` — answers a version-range
    * diff with NO streaming checkpoint. Version-interval convention
    * is the feed's own offset convention: the read covers versions
    * `(startVersion, endVersion]` — version v's row set is
    * `changes(v - 1, v)` — so a batch read over `(a, b]` splices
    * EXACTLY with a stream checkpointed at offset `a` or `b`.
    * Defaults: the FULL retained history (startVersion = the oldest
    * version of the terminal contiguous retained run — the oldest
    * version outright when retention left no gaps — endVersion = the
    * view's version): the audit/backfill shape, where the stream's
    * default instead tails from the current version.
    *
    * Planning reuses the stream's per-version machinery verbatim
    * ([[CdcPlan]]): per-version partitions, touched-file-sized work,
    * per-file rename translation — a batch read crosses renamed
    * history exactly like the stream does.
    */
  override def toBatch: org.apache.spark.sql.connector.read.Batch = {
    val versions = store.versions(root)
    val oldest = versions.headOption.getOrElse(0L)
    // the default "full retained history" start is the start of the
    // TERMINAL CONTIGUOUS RUN: retention (expire_snapshots/vacuum)
    // keeps tagged islands whose neighbors are gone, and a version
    // pair with a missing predecessor cannot diff — an island is
    // time-travelable, not replayable. An EXPLICIT startVersion
    // inside a gap still fails loudly at planning.
    val s0 = start.getOrElse {
      val retained = versions.toSet
      var s = math.min(viewVersion, versions.lastOption.getOrElse(0L))
      while (retained.contains(s - 1)) s -= 1
      s
    }
    val s1 = end.getOrElse(viewVersion)
    require(s0 >= oldest,
      s"startVersion $s0 predates the oldest retained version $oldest " +
        "(vacuumed away) — start at or after it")
    require(s1 >= s0,
      s"endVersion $s1 must be >= startVersion $s0")
    require(s1 <= viewVersion,
      s"endVersion $s1 is beyond the table's resolved version " +
        s"$viewVersion — re-resolve the table (or drop the option)")
    val (pruned, out) = prunedPlan
    val plan = new CdcPlan(store, root, keyCol, pruned, out, maxDeltaBytes,
      viewVersion, viewRenames)
    new org.apache.spark.sql.connector.read.Batch {
      override def planInputPartitions(): Array[InputPartition] =
        plan.partitionsBetween(s0, s1)
      override def createReaderFactory(): PartitionReaderFactory =
        CdcPlan.readerFactory()
    }
  }
}

private[v2] final case class CdcOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

/** One side's read spec for one version: per FILE, the version's
  * declared column set as (digest TAG, PHYSICAL name) pairs — the
  * tag is the stream VIEW's spelling (identical on both sides of a
  * pair, so a rename never reads as a payload change), the physical
  * name is the file-era spelling the parquet projection needs — plus
  * the stream view's image-slot physical names and the applicable
  * delete files: everything a reader needs, resolved on the driver
  * where the manifest lives.
  */
private[v2] final case class CdcFileSpec(path: String,
                                         deletePaths: Seq[String],
                                         cols: Seq[(String, String)],
                                         imagePhys: Seq[String])
private[v2] final case class CdcSideSpec(files: Seq[CdcFileSpec])
/** `imageCols`: Some(PROJECTED stream payload columns, in output
  * order) when the feed emits pre/post images — the reader renders
  * each side's values into these slots (a column absent from a
  * version's declared schema renders NULL). `out`: the output row
  * recipe under projection pushdown — for each projected output
  * field, its canonical source (0 = key, 1 = op/_change_type,
  * 2 = version, 3+j = payload slot j of `imageCols`).
  */
private[v2] final case class CdcInputPartition(version: Long,
                                               keyCol: String,
                                               a: CdcSideSpec,
                                               b: CdcSideSpec,
                                               imageCols: Option[Seq[(String, DataType)]],
                                               out: Array[Int])
    extends InputPartition

private[v2] final class CdcMicroBatchStream(store: SnapshotStoreOps,
                                            root: String, keyCol: String,
                                            start: Option[Long],
                                            imageCols: Option[Seq[(String, DataType)]],
                                            out: Array[Int],
                                            maxDeltaBytes: Long,
                                            viewVersion: Long,
                                            viewRenames: Vector[Rename])
    extends MicroBatchStream {

  override def initialOffset(): Offset = {
    // consulted on a FRESH start only (a checkpointed restart resumes
    // from its offset log) — the right place for the retention check:
    // the first batch reads manifestAsOf(start), which vacuum may
    // have dropped
    start.foreach { s =>
      val oldest = store.versions(root).headOption.getOrElse(0L)
      require(s >= oldest,
        s"startVersion $s predates the oldest retained version $oldest " +
          "(vacuumed away) — start at or after it, or rebuild downstream " +
          "state from a full read + a fresh tail")
    }
    CdcOffset(start.getOrElse(store.currentManifest(root).version))
  }

  override def latestOffset(): Offset =
    CdcOffset(store.currentManifest(root).version)

  override def deserializeOffset(json: String): Offset =
    CdcOffset(json.toLong)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  private val plan = new CdcPlan(store, root, keyCol, imageCols, out,
    maxDeltaBytes, viewVersion, viewRenames)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    plan.partitionsBetween(start.asInstanceOf[CdcOffset].version,
      end.asInstanceOf[CdcOffset].version)

  override def createReaderFactory(): PartitionReaderFactory =
    CdcPlan.readerFactory()
}

/** The change feed's shared PLANNER — one home for per-version
  * partition planning (touched-file read sets, per-file rename
  * translation, the single-task delta-byte budget), used verbatim by
  * both the micro-batch stream (offset walk) and the batch scan
  * (explicit `(startVersion, endVersion]` interval), so the two
  * surfaces can never diff differently.
  */
private[v2] final class CdcPlan(store: SnapshotStoreOps,
                                root: String, keyCol: String,
                                imageCols: Option[Seq[(String, DataType)]],
                                out: Array[Int],
                                maxDeltaBytes: Long,
                                viewVersion: Long,
                                viewRenames: Vector[Rename]) {

  private def sideSpec(m: Manifest, touched: Vector[FileEntry]): CdcSideSpec = {
    // the head manifest was validated at stream construction, but a
    // REPLAY range can cross versions with absent or unsupported
    // declared schemas — refuse HERE, at planning, with guidance,
    // instead of crashing an executor mid-read
    val schema = m.schema.getOrElse(throw new IllegalStateException(
      s"graft-cdc: version ${m.version} predates schema tracking — " +
        "start the stream at a later startVersion or diff via " +
        "SnapshotStore.changes()"))
    CdcSource.unsupportedColumns(schema) match {
      case Array() => ()
      case bad => throw new IllegalStateException(
        s"graft-cdc: version ${m.version} carries unsupported payload " +
          s"column(s) ${bad.mkString(", ")} — start the stream past it " +
          "or diff via SnapshotStore.changes()")
    }
    // RENAMES: files predating a rename store columns under old
    // physical names — translate the version's declared names (and
    // the stream view's image slots) per file via the view's rename
    // log, so pre-view renamed history diffs EXACTLY. A rename the
    // VIEW itself predates cannot be served by-name (the view has no
    // spelling for it) — refuse loudly, the restart-to-adopt rule the
    // snapshot stream follows.
    if (!m.renames.forall(viewRenames.contains))
      throw new IllegalStateException(
        s"graft-cdc: version ${m.version} declares column renames the " +
          "stream's view predates — restart the stream to adopt the " +
          "new names (a checkpointed restart resumes position)")
    // TYPE boundary, images feed only (the key-level digest renders
    // values per FILE and is type-agnostic): an image slot decodes by
    // the VIEW's type, which serves any version the view's type
    // losslessly WIDENS from (the reader up-converts like the parquet
    // readers do) — but a version declared WIDER than the view's slot
    // (a widen landing after stream start) cannot decode into it;
    // refuse with the restart rule instead of a ClassCastException
    // mid-read on an executor.
    imageCols.foreach { cols =>
      val slotType = cols.toMap
      schema.fields.foreach { f =>
        val viewName =
          Renames.translate(viewRenames, f.name, m.version, viewVersion)
        slotType.get(viewName).foreach { dt =>
          if (dt != f.dataType && !store.canWiden(f.dataType, dt))
            throw new IllegalStateException(
              s"graft-cdc: column '${f.name}' is ${f.dataType.sql} at " +
                s"version ${m.version} but the stream's image slot is " +
                s"${dt.sql} — a type change landed after stream start; " +
                "restart the stream to adopt the widened schema (a " +
                "checkpointed restart resumes position)")
        }
      }
    }
    CdcSideSpec(touched.map { f =>
      // (digest tag, physical name) per column: the tag is the
      // VIEW's spelling (both sides of a pair translate to the same
      // names, so a rename is never mistaken for a payload change),
      // the physical name is the file-era spelling the parquet
      // projection needs
      val cols = schema.fieldNames.toSeq.map(n =>
        Renames.translate(viewRenames, n, m.version, viewVersion) ->
          Renames.translate(viewRenames, n, m.version, f.seq))
      val imgPhys = imageCols.fold(Seq.empty[String])(_.map { case (n, _) =>
        Renames.translate(viewRenames, n, viewVersion, f.seq)
      })
      CdcFileSpec(s"$root/${f.path}",
        store.applicableDeletes(m, f).map(d => s"$root/${d.path}"),
        cols, imgPhys)
    })
  }

  /** One partition per version in `(s0, s1]` — version v diffs
    * `changes(v - 1, v)` in one task, work sized by its touched
    * files.
    */
  def partitionsBetween(s0: Long, s1: Long): Array[InputPartition] = {
    ((s0 + 1) to s1).map { v =>
      val a = store.manifestAsOf(root, v - 1)
      val b = store.manifestAsOf(root, v)
      val (aT, bT) = store.cdcReadSet(a, b)
      // one version pair diffs in ONE task's heap — a table-sized read
      // set (large rewrite; a schema-evolution commit disengaging the
      // verbatim-carry skip) refuses HERE, at planning, instead of
      // OOMing the executor. Files predating byte tracking report 0
      // and can't be budgeted; they pass (unknown, not unbounded).
      val touched = (aT ++ bT).map(_.bytes).sum
      if (touched > maxDeltaBytes) throw new IllegalStateException(
        s"graft-cdc: version $v touches ~$touched bytes across " +
          s"${aT.size + bT.size} files — beyond maxDeltaBytes=" +
          s"$maxDeltaBytes for a single-task diff. Diff it via " +
          "SnapshotStore.changes() (distributed), or raise " +
          ".option(\"maxDeltaBytes\", ...) if the executors have heap")
      CdcInputPartition(v, keyCol, sideSpec(a, aT), sideSpec(b, bT),
        imageCols, out): InputPartition
    }.toArray
  }

}

private[v2] object CdcPlan {
  /** Shared by the stream and batch legs. Snapshots the SESSION
    * Hadoop configuration for the executors — a bare new
    * Configuration() there would drop credentials, HA nameservice
    * mappings and fs tuning set via spark.hadoop.*
    */
  def readerFactory(): PartitionReaderFactory = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    import scala.jdk.CollectionConverters._
    new CdcReaderFactory(conf.iterator().asScala
      .map(e => e.getKey -> e.getValue).toArray)
  }
}

private[v2] final class CdcReaderFactory(confKVs: Array[(String, String)])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new CdcPartitionReader(partition.asInstanceOf[CdcInputPartition], confKVs)
}

/** Diffs one version pair locally: key→digest maps for both sides
  * (delete-aware, projection-scoped), then the classic full-outer
  * classification. Work and memory are bounded by the TOUCHED file
  * set — the delta — not the table.
  */
private[v2] final class CdcPartitionReader(p: CdcInputPartition,
                                           confKVs: Array[(String, String)])
    extends PartitionReader[InternalRow] {

  import org.apache.hadoop.conf.Configuration
  import org.apache.parquet.example.data.Group
  import org.apache.parquet.hadoop.ParquetReader
  import org.apache.parquet.hadoop.example.GroupReadSupport

  private def sessionConf(): Configuration = {
    val c = new Configuration(false)
    confKVs.foreach { case (k, v) => c.set(k, v) }
    c
  }

  private def groups[A](path: String, columns: Option[Seq[String]])
                       (fold: (A, Group) => A)(zero: A): A = {
    val conf = sessionConf()
    val hPath = new org.apache.hadoop.fs.Path(path)
    // project the FILE's own schema down to the declared column set:
    // repetition and physical types always match the file, dropped
    // columns vanish, columns added after this file simply aren't
    // present (= null = omitted from the digest)
    columns.foreach { names =>
      val keep = names.toSet
      val fileSchema = {
        val fr = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(hPath, conf))
        try fr.getFooter.getFileMetaData.getSchema finally fr.close()
      }
      import scala.jdk.CollectionConverters._
      val projected = new org.apache.parquet.schema.MessageType(
        fileSchema.getName,
        fileSchema.getFields.asScala.filter(f => keep(f.getName)).asJava)
      conf.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA,
        projected.toString)
    }
    val reader = ParquetReader
      .builder(new GroupReadSupport(), hPath)
      .withConf(conf).build()
    try {
      var acc = zero
      var g = reader.read()
      while (g != null) { acc = fold(acc, g); g = reader.read() }
      acc
    } finally reader.close()
  }

  private def deleteKeys(paths: Seq[String]): java.util.HashSet[java.lang.Long] = {
    val set = new java.util.HashSet[java.lang.Long]()
    paths.foreach(dp => groups[Unit](dp, None)((_, g) =>
      set.add(g.getValueToString(0, 0).toLong): Unit)(()))
    set
  }

  // one digest instance per partition, reset() per row (single-
  // threaded reader); getInstance + a field sort per ROW would
  // dominate the loop this source exists to speed up
  private val md = java.security.MessageDigest.getInstance("MD5")

  /** Per-file loop state, computed once from the first row's schema
    * (every row of a projected parquet read shares one GroupType):
    * the key's index and the payload indices in VIEW-SPELLED tag
    * order, digested under the view-spelled TAGS — the two sides may
    * store columns in different physical orders, under different
    * physical NAMES (a rename separates file from version), or even
    * under different DECLARED names (the pair crosses the rename),
    * and none of those is a payload difference (changes() sorts and
    * era-translates too). For image
    * feeds, additionally a getter per STREAM payload slot, resolved
    * through the slot's per-file physical name (absent-in-this-file
    * columns stay null — the version's declared view).
    */
  private final class FieldPlan(t: org.apache.parquet.schema.GroupType,
                                spec: CdcFileSpec) {
    val keyIdx: Int = t.getFieldIndex(p.keyCol) // the key never renames
    private val present = spec.cols
      .filter { case (d, ph) => d != p.keyCol && t.containsField(ph) }
      .sortBy(_._1)
    val payload: Array[Int] =
      present.map { case (_, ph) => t.getFieldIndex(ph) }.toArray
    val names: Array[Array[Byte]] = present.map(_._1
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray

    // slot -> field index in THIS file's projected schema (-1: absent)
    val imageIdx: Array[Int] = p.imageCols match {
      case None => null
      case Some(cols) => cols.indices.map { i =>
        val ph = spec.imagePhys(i)
        if (t.containsField(ph)) t.getFieldIndex(ph) else -1
      }.toArray
    }

    def imageOf(g: Group): Array[Any] = {
      val cols = p.imageCols.get
      val out = new Array[Any](cols.length)
      var s = 0
      while (s < out.length) {
        val i = imageIdx(s)
        if (i >= 0 && g.getFieldRepetitionCount(i) > 0)
          out(s) = CdcPartitionReader.valueOf(g, i, cols(s)._2)
        s += 1
      }
      out
    }
  }

  private def lenPrefixed(bytes: Array[Byte]): Unit = {
    // LENGTH-PREFIX every component: a value may CONTAIN any byte
    // (including would-be separators), so delimiters alone are not
    // injective — (f1="x\u001ef2\u001fy") must not collide with
    // (f1="x", f2="y")
    md.update(java.nio.ByteBuffer.allocate(4).putInt(bytes.length).array())
    md.update(bytes)
  }

  private def digest(g: Group, plan: FieldPlan): Array[Byte] = {
    md.reset()
    var j = 0
    while (j < plan.payload.length) {
      val i = plan.payload(j)
      // null fields are OMITTED (the to_json discipline: no value can
      // collide with the null encoding)
      if (g.getFieldRepetitionCount(i) > 0) {
        lenPrefixed(plan.names(j))
        lenPrefixed(g.getValueToString(i, 0)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      j += 1
    }
    md.digest()
  }

  /** One side's row state: the injective payload digest (op
    * classification) plus, for image feeds only, the decoded payload
    * values in stream-slot order.
    */
  private final class SideRow(val digest: Array[Byte], val img: Array[Any])

  private def side(s: CdcSideSpec): java.util.HashMap[java.lang.Long, SideRow] = {
    val out = new java.util.HashMap[java.lang.Long, SideRow]()
    val wantImages = p.imageCols.isDefined
    s.files.foreach { f =>
      val dels = deleteKeys(f.deletePaths)
      var plan: FieldPlan = null
      groups[Unit](f.path, Some(f.cols.map(_._2))) { (_, g) =>
        if (plan == null) plan = new FieldPlan(g.getType, f)
        val k = g.getValueToString(plan.keyIdx, 0).toLong
        if (!dels.contains(k)) {
          out.put(k, new SideRow(digest(g, plan),
            if (wantImages) plan.imageOf(g) else null))
          ()
        }
      }(())
    }
    out
  }

  /** One output row under the partition's projection recipe: each
    * projected field pulls from its canonical source (key / op /
    * version / a pruned payload slot) — an empty recipe (COUNT(*)
    * over a change feed) emits empty rows, one per change row.
    */
  private def emit(k: Long, change: String, img: Array[Any]): InternalRow = {
    val vals = new Array[Any](p.out.length)
    var i = 0
    while (i < vals.length) {
      vals(i) = p.out(i) match {
        case 0 => k
        case 1 => UTF8String.fromString(change)
        case 2 => p.version
        case j => img(j - 3)
      }
      i += 1
    }
    new GenericInternalRow(vals)
  }

  private lazy val rows: Iterator[InternalRow] = {
    val h0 = side(p.a)
    val h1 = side(p.b)
    val keys = new java.util.HashSet[java.lang.Long](h0.keySet())
    keys.addAll(h1.keySet())
    val images = p.imageCols.isDefined
    import scala.jdk.CollectionConverters._
    keys.iterator().asScala.flatMap { boxed =>
      val k = boxed.longValue()
      val (r0, r1) = (h0.get(k), h1.get(k))
      val op =
        if (r0 == null) "insert"
        else if (r1 == null) "delete"
        else if (!java.util.Arrays.equals(r0.digest, r1.digest)) "update"
        else null
      op match {
        case null => Iterator.empty
        case _ if !images => Iterator.single(emit(k, op, null))
        case "insert" => Iterator.single(emit(k, "insert", r1.img))
        case "delete" => Iterator.single(emit(k, "delete", r0.img))
        case "update" => Iterator(
          emit(k, "update_preimage", r0.img),
          emit(k, "update_postimage", r1.img))
      }
    }
  }

  private var current: InternalRow = _

  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false

  override def get(): InternalRow = current
  override def close(): Unit = ()
}

private[v2] object CdcPartitionReader {
  import org.apache.parquet.example.data.Group
  import org.apache.spark.unsafe.types.UTF8String

  /** One non-null parquet group field → the Catalyst internal value
    * of the DECLARED type. A declared type may be WIDER than the
    * file's physical encoding (metadata-only type widening: an
    * INT32-era file read under a BIGINT declaration) — the integral
    * and float lanes check the file's primitive type and up-convert,
    * exactly what Spark's own parquet readers do.
    */
  def valueOf(g: Group, i: Int, dt: DataType): Any = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    def phys = g.getType.getType(i).asPrimitiveType().getPrimitiveTypeName
    dt match {
      case LongType =>
        if (phys == PrimitiveTypeName.INT32) g.getInteger(i, 0).toLong
        else g.getLong(i, 0)
      case IntegerType => g.getInteger(i, 0)
      case ShortType => g.getInteger(i, 0).toShort
      case ByteType => g.getInteger(i, 0).toByte
      case StringType => UTF8String.fromString(g.getString(i, 0))
      case BooleanType => g.getBoolean(i, 0)
      case FloatType => g.getFloat(i, 0)
      case DoubleType =>
        if (phys == PrimitiveTypeName.FLOAT) g.getFloat(i, 0).toDouble
        else g.getDouble(i, 0)
      case DateType => g.getInteger(i, 0) // days since epoch = internal
      case other => throw new IllegalStateException(
        s"unsupported CDC payload type ${other.sql}") // refused upstream
    }
  }
}
