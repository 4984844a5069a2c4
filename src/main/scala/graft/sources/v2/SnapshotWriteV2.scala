package graft.sources.v2

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.parquet.io.OutputFile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, NullOrdering, SortDirection, SortOrder}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.types._

import graft.functions.KeyBloom
import graft.sources.SnapshotStore.{FileEntry, Rename}
import graft.sources.SnapshotStoreOps

/** The WRITE half of the snapshot store's DataSourceV2 surface:
  *
  * {{{
  *   df.write.format("graft-snapshot").mode("append").save(root)
  *   df.write.format("graft-snapshot").mode("overwrite").save(root)   // truncate
  *   df.writeStream.format("graft-snapshot")
  *     .option("checkpointLocation", ck).start(root)                  // exactly-once
  * }}}
  *
  * What this adds over the API writes (`SnapshotStore.append/merge/
  * appendOnce`): Spark OWNS the physical write. The write declares its
  * layout requirement through [[RequiresDistributionAndOrdering]] —
  * range-distribute + sort by the key across `filesPerCommit`
  * partitions, exactly the clustering the API path gets from
  * `repartitionByRange(...).sortWithinPartitions(...)` — and Catalyst
  * plans the shuffle like any other exchange (AQE, whole-stage codegen
  * upstream, no extra job). Each task streams its partition straight
  * into ONE staged parquet file via Spark's own [[ParquetWriteSupport]]
  * (the writer ParquetFileFormat uses), folding the per-file stats the
  * manifest needs — minKey/maxKey, zone maps, the key bloom, bytes —
  * INLINE with the write, so the V2 path pays no second stats scan
  * (the API path's one stats job over the new files). The driver-side
  * `commit(messages)` is metadata-only: assemble [[FileEntry]]s from
  * the task messages and land the manifest through the SAME
  * stage/publish machinery every other commit uses — CAS, append
  * rebase, refusal semantics, catalog arbitration all identical
  * (`SnapshotStore.scala` publishWith).
  *
  * STREAMING is the exactly-once story without foreachBatch: the
  * epoch's files stage on the executors, and the driver commit routes
  * through `publishOnce` with the `(appId, epochId)` txn marker — a
  * redelivered epoch (engine recovery replays the micro-batch with the
  * same id) finds the marker and lands NOTHING twice; its staged files
  * are aborted as unreferenced. `appId` defaults to the streaming
  * query id (stable across restarts from the same checkpoint) and can
  * be pinned with `.option("txnAppId", ...)`.
  *
  * Failure cleanup: a failed/speculative task's `abort()` deletes its
  * own staged file; a failed job's driver `abort(messages)` deletes
  * every staged file the tasks reported. Files orphaned by a crashed
  * JVM sit under `data/.staged-*` where the store's vacuum already
  * knows how to age them out.
  *
  * Reference intent anchor: the reference's monthly ingestion loop
  * (`database/10_batch_populate_statobs_seobs.sh:29-42`) is an
  * append-only sink fed by a scheduler — this sink is that loop as a
  * declarative Spark write, with redelivery-safety the shell loop
  * never had.
  */
private[v2] final class SnapshotWriteBuilder(store: SnapshotStoreOps,
                                             root: String,
                                             declared: StructType,
                                             keyCol: String,
                                             statsCols: Seq[String],
                                             bloomBits: Int,
                                             baseVersion: Long,
                                             baseRenames: Vector[Rename],
                                             info: LogicalWriteInfo,
                                             branch: Option[String] = None)
    extends WriteBuilder with SupportsTruncate
    with org.apache.spark.sql.connector.write.SupportsOverwrite {

  private var doTruncate = false
  private var overwriteRange: Option[(Long, Long)] = None

  override def truncate(): WriteBuilder = { doTruncate = true; this }

  /** FILTER-SCOPED OVERWRITE (the Delta `replaceWhere` / Iceberg
    * filter-overwrite surface): `df.writeTo("graft.db.t")
    * .overwrite(col("k").between(a, b))` — the standard backfill
    * idiom for a time-keyed table (re-running one month's ingestion,
    * the reference's `database/10_batch_populate_statobs_seobs.sh`
    * loop, IS a range overwrite). The predicate must fold to ONE key
    * range ([[KeyPlan]] — the SQL-DELETE standard); anything not
    * decidable by the key alone refuses loudly HERE, at analysis,
    * rather than silently rewriting the table. The commit maps to
    * [[SnapshotStoreOps.commitOverwriteRange]]: in-range files drop
    * manifest-only, disjoint files carry by reference (path-
    * identical), only boundary files rewrite — and the staged new
    * data must itself fall inside the range (per-file key envelopes,
    * checked at commit — the replaceWhere conformance contract).
    */
  override def overwrite(filters: Array[org.apache.spark.sql.sources.Filter])
      : WriteBuilder = {
    import org.apache.spark.sql.sources.AlwaysTrue
    filters match {
      case Array(AlwaysTrue()) => doTruncate = true // INSERT OVERWRITE
      case _ => KeyPlan.of(filters, keyCol) match {
        case Some(KeyPlan.ByRange(Long.MinValue, Long.MaxValue)) =>
          doTruncate = true
        case Some(KeyPlan.ByRange(lo, hi)) if lo <= hi =>
          overwriteRange = Some((lo, hi))
        case Some(KeyPlan.ByRange(lo, hi)) =>
          throw new IllegalArgumentException(
            s"graft-snapshot overwrite range [$lo, $hi] is empty — " +
              "contradictory key bounds; nothing would be replaced")
        case _ => throw new UnsupportedOperationException(
          s"graft-snapshot overwrite supports ONE key range on " +
            s"'$keyCol' (comparisons/=, ANDed; the SQL-DELETE " +
            s"standard); got ${filters.mkString(", ")} — " +
            "row-level rewrites belong to UPDATE/MERGE")
      }
    }
    this
  }

  override def build(): Write = {
    val in = info.schema()
    // file sizing: an explicit filesPerCommit pins the partition
    // count (the pre-round-17 behavior); the DEFAULT is byte-targeted
    // — requiredNumPartitions stays unset and the declared
    // distribution advertises targetFileBytes as its advisory
    // partition size, so AQE sizes the write from the data (a large
    // INSERT INTO ... SELECT no longer funnels through 4 giant
    // fixed-range tasks). SQL INSERT has no option surface, so the
    // session conf spark.graft.write.filesPerCommit provides the
    // same pin there (fixture/test determinism, or a cluster-wide
    // policy); the write option wins when both are set.
    val filesOpt = Option(info.options.get("filesPerCommit")).map(_.toInt)
      .orElse(SparkSession.active.conf
        .getOption("spark.graft.write.filesPerCommit").map(_.toInt))
    filesOpt.foreach(n => require(n > 0, "filesPerCommit must be positive"))
    val targetBytes = Option(info.options.get("targetFileBytes"))
      .map(_.toLong).getOrElse(V2WriteConf.DefaultTargetFileBytes)
    require(targetBytes > 0, "targetFileBytes must be positive")
    val appId = Option(info.options.get("txnAppId"))
      .getOrElse(info.queryId())
    Option(info.options.get("mode")).getOrElse("append") match {
      case "cdc" =>
        // the input IS a graft-cdc images feed; each epoch applies as
        // one upsert+delete commit — see [[CdcApplyWrite]]
        require(!doTruncate && overwriteRange.isEmpty,
          "mode=cdc is append-shaped (Update/Complete output modes " +
            "would truncate the replica every epoch)")
        require(branch.isEmpty,
          "mode=cdc maintains a replica's MAIN chain; branch targets " +
            "are not supported")
        val expected = CdcApplyWrite.imagesSchema(declared, keyCol)
        require(in.fieldNames.toSeq == expected.fieldNames.toSeq &&
            in.fields.map(_.dataType).toSeq ==
              expected.fields.map(_.dataType).toSeq,
          s"mode=cdc expects the graft-cdc images shape " +
            s"${expected.toDDL}; got ${in.toDDL} — feed it " +
            "spark.readStream.format(\"graft-cdc\").option(\"images\",\"true\")")
        // same integral-key analysis refusal as the append branch —
        // the apply path round-trips keys through cast('long')
        V2WriteConf.validateTypes(declared, keyCol, Nil, "mode=cdc writes")
        new CdcApplyWrite(store, root, expected, keyCol,
          filesOpt.getOrElse(4), appId)
      case "append" =>
        require(in.fieldNames.toSeq == declared.fieldNames.toSeq &&
            in.fields.map(_.dataType).toSeq ==
              declared.fields.map(_.dataType).toSeq,
          s"graft-snapshot write schema must match the table schema " +
            s"${declared.toDDL}; got ${in.toDDL} (write with matching " +
            "column names and types — Spark resolves by name)")
        V2WriteConf.validateTypes(declared, keyCol, statsCols, "V2 writes")
        require(branch.isEmpty || overwriteRange.isEmpty,
          "filter overwrite targets the MAIN chain — fast-forward " +
            "the branch first")
        new SnapshotWrite(store, root, declared, keyCol,
          statsCols.toVector, bloomBits, doTruncate, filesOpt, targetBytes,
          appId, overwriteRange, baseVersion, baseRenames, branch)
      case other => throw new IllegalArgumentException(
        s"graft-snapshot write mode '$other' — supported: append " +
          "(default), cdc (apply a graft-cdc images feed)")
    }
  }
}

private[v2] final class SnapshotWrite(store: SnapshotStoreOps, root: String,
                                      schema: StructType, keyCol: String,
                                      statsCols: Vector[String],
                                      bloomBits: Int, truncate: Boolean,
                                      filesOpt: Option[Int],
                                      targetBytes: Long, appId: String,
                                      overwriteRange: Option[(Long, Long)],
                                      baseVersion: Long,
                                      baseRenames: Vector[Rename],
                                      branch: Option[String] = None)
    extends Write with RequiresDistributionAndOrdering {

  override def description(): String =
    s"graft-snapshot `$root` " + (overwriteRange match {
      case Some((lo, hi)) => s"overwrite [$lo, $hi]"
      case None => if (truncate) "truncate" else "append"
    })

  // the store's layout contract: range-cluster + sort by the key, so
  // every task writes ONE file with a tight key envelope — sharp range
  // skipping comes from the write plan, not a post-pass
  override def requiredDistribution(): Distribution =
    Distributions.ordered(Array(sortOrder))

  override def requiredOrdering(): Array[SortOrder] = Array(sortOrder)

  /** Streaming epochs run with AQE DISABLED (Spark's streaming
    * planner), so the byte advisory would be silently ignored and an
    * unpinned epoch would shatter into shuffle.partitions-many tiny
    * files — fall back to the classic pinned count there. Safe to
    * latch from [[toStreaming]]: Spark's V2Writes builds the
    * streaming write (calling toStreaming) BEFORE it applies the
    * distribution, and the batch path never calls toStreaming.
    */
  @volatile private var streamingMode = false

  /** Explicit `filesPerCommit` pins the count; the batch default
    * (0 = no requirement) defers to [[advisoryPartitionSizeInBytes]]
    * — AQE sizes the range shuffle to ~targetFileBytes per task, so
    * file sizing follows the DATA (the 100 TB-friendly default; a
    * fixed count would also opt the write out of AQE entirely).
    */
  override def requiredNumPartitions(): Int =
    filesOpt.getOrElse(if (streamingMode) 4 else 0)

  /** Advisory bytes per write task when no explicit count was given.
    * Measured against the SHUFFLE representation (pre-encoding), so
    * parquet files come out smaller by the encoding ratio —
    * `targetFileBytes` is the knob, not an exact on-disk promise.
    */
  override def advisoryPartitionSizeInBytes(): Long =
    if (filesOpt.isEmpty && !streamingMode) targetBytes else 0L

  private def sortOrder: SortOrder = V2WriteConf.keySortOrder(keyCol)

  /** Per-write staging namespace under the store's staged prefix —
    * publish moves files into `data/`, vacuum ages out crash litter.
    * The SAME uuid prefixes every FILE name: publish strips the
    * staging directory, and (partition, task) ids restart at 0 in
    * every Spark application, so without the uuid two applications'
    * commits could collide in `data/` and silently replace a
    * referenced file (the API path names files `<uuid>-<i>.parquet`
    * for the same reason).
    */
  private val writeUuid = java.util.UUID.randomUUID().toString.take(8)
  private val stageRel = V2WriteConf.stageRel(writeUuid)

  private def factoryConf(): Array[(String, String)] = V2WriteConf.resolved()

  override def toBatch: BatchWrite = new BatchWrite {
    private val factory = new SnapshotWriterFactory(root, stageRel, writeUuid,
      schema, schema.fieldIndex(keyCol),
      statsCols.map(c => c -> schema.fieldIndex(c)),
      bloomBits, factoryConf(), keyCol)

    override def createBatchWriterFactory(i: PhysicalWriteInfo): DataWriterFactory =
      factory

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      overwriteRange match {
        case Some((lo, hi)) =>
          store.commitOverwriteRange(SparkSession.active, root,
            baseVersion, lo, hi, entriesOf(messages))
        case None =>
          store.commitStagedEntries(root, entriesOf(messages), truncate,
            branch = branch, stagedRenames = Some(baseRenames))
      }
      ()
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit =
      abortStaged(store, root, messages)
  }

  override def toStreaming: StreamingWrite = {
    require(!truncate && overwriteRange.isEmpty,
      "graft-snapshot streaming sink is append-only (Update/Complete " +
        "output modes and filter overwrites would rewrite table state " +
        "every epoch)")
    require(branch.isEmpty,
      "graft-snapshot streaming sink commits exactly-once txn markers " +
        "on the MAIN chain; branch targets are not supported")
    streamingMode = true // see requiredNumPartitions
    new StreamingWrite {
      private val factory = new SnapshotWriterFactory(root, stageRel,
        writeUuid, schema, schema.fieldIndex(keyCol),
        statsCols.map(c => c -> schema.fieldIndex(c)),
        bloomBits, factoryConf(), keyCol)

      override def createStreamingWriterFactory(i: PhysicalWriteInfo): StreamingDataWriterFactory =
        factory

      // exactly-once: the (appId, epochId) marker makes a redelivered
      // epoch a no-op — publishOnce aborts the duplicate stage
      override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
        store.commitStagedEntries(root, entriesOf(messages),
          truncate = false, txn = Some((appId, epochId)),
          stagedRenames = Some(baseRenames))
        ()
      }

      override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
        abortStaged(store, root, messages)
    }
  }

  private def entriesOf(messages: Array[WriterCommitMessage]): Vector[FileEntry] =
    V2WriteConf.entriesOf(messages)

  private def abortStaged(store: SnapshotStoreOps, root: String,
                          messages: Array[WriterCommitMessage]): Unit =
    V2WriteConf.abortStaged(store, root, keyCol, messages)
}

/** CHANGE-FEED REPLICATION — the `mode=cdc` streaming sink:
  *
  * {{{
  *   spark.readStream.format("graft-cdc")
  *     .option("images", "true").load(srcRoot)
  *     .writeStream.format("graft-snapshot")
  *     .option("mode", "cdc").option("txnAppId", "replica")
  *     .option("checkpointLocation", ck).start(replicaRoot)
  * }}}
  *
  * keeps a REPLICA store key-for-key equal to a source store by
  * consuming only its change feed — the source table itself is never
  * read. Each epoch's image rows stage on the executors as ordinary
  * parquet TRANSPORT files (same staged-file discipline as the append
  * sink — crash litter ages out via vacuum), and the driver-side
  * epoch commit applies them through [[graft.sources.SnapshotStoreOps
  * .applyChangesOnce]]: collapse to the newest state per key, rewrite
  * only the replica files the change set touches, carry the rest by
  * reference, land ONE commit under the `(appId, epochId)` txn
  * marker — a redelivered epoch finds the marker and lands nothing
  * twice. Work per epoch scales with the CHANGE SET (the feed is
  * delta-sized by construction), so replica lag is commit-rate-sized
  * even on a 100 TB primary. Transport files are deleted after the
  * apply (marker-hit redeliveries included); a failed epoch's are
  * cleaned by the engine-driven abort.
  */
private[v2] object CdcApplyWrite {
  /** The images shape for a table: `(key, _change_type, version,
    * <payload in declared order>)` — exactly what `graft-cdc
    * images=true` emits for the source's schema.
    */
  def imagesSchema(declared: StructType, keyCol: String): StructType =
    StructType(
      StructField(keyCol, LongType, nullable = false) +:
        StructField("_change_type", StringType, nullable = false) +:
        StructField("version", LongType, nullable = false) +:
        declared.fields.toSeq.filterNot(_.name == keyCol)
          .map(f => StructField(f.name, f.dataType, nullable = true)))
}

private[v2] final class CdcApplyWrite(store: SnapshotStoreOps, root: String,
                                      imagesSchema: StructType,
                                      keyCol: String, filesPerCommit: Int,
                                      appId: String)
    extends Write {

  override def description(): String = s"graft-snapshot `$root` cdc-apply"

  private val writeUuid = java.util.UUID.randomUUID().toString.take(8)
  private val stageRel = V2WriteConf.stageRel(writeUuid)

  override def toBatch: BatchWrite = throw new UnsupportedOperationException(
    "mode=cdc is a streaming sink; apply a batch of images with " +
      "SnapshotStore.applyChanges")

  override def toStreaming: StreamingWrite = new StreamingWrite {
    private val factory = new SnapshotWriterFactory(root, stageRel,
      writeUuid, imagesSchema, imagesSchema.fieldIndex(keyCol),
      Vector.empty, bloomBits = 0, V2WriteConf.resolved(), keyCol)

    override def createStreamingWriterFactory(i: PhysicalWriteInfo): StreamingDataWriterFactory =
      factory

    override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
      val entries = V2WriteConf.entriesOf(messages)
      if (entries.nonEmpty) {
        val spark = SparkSession.active
        val images = spark.read.schema(imagesSchema)
          .parquet(entries.map(e => s"$root/${e.path}"): _*)
        store.applyChangesOnce(spark, images, root, appId, epochId,
          filesPerCommit, knownNonEmpty = true) // tasks reported rows
        // transport files are never referenced by any manifest —
        // clean them now (marker-hit redeliveries included); a THROWN
        // apply leaves cleanup to the engine-driven abort below
        V2WriteConf.abortStaged(store, root, keyCol, messages)
      }
    }

    override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
      V2WriteConf.abortStaged(store, root, keyCol, messages)
  }
}

/** The pieces every V2 write path (append, streaming epoch, row-level
  * replace) must agree on: the executor-shipped hadoop conf, the
  * key-ascending sort order, the staged-directory naming the vacuum
  * contract knows, the abort-staged sequence, and the integral
  * key/stats type validation — one home so a fix to any of them can
  * never leave one writer on old behavior.
  */
private[v2] object V2WriteConf {

  /** Default advisory bytes per write task when `filesPerCommit` is
    * not pinned (128 MiB of shuffle representation — the parquet
    * files land smaller by the encoding ratio).
    */
  val DefaultTargetFileBytes: Long = 128L * 1024 * 1024

  def keySortOrder(keyCol: String): SortOrder =
    Expressions.sort(Expressions.column(keyCol),
      SortDirection.ASCENDING, NullOrdering.NULLS_FIRST)

  /** `data/.staged-v2-<uuid>/` — the uuid prefixes every FILE name
    * too (see [[SnapshotWrite.writeUuid]] for why).
    */
  def stageRel(writeUuid: String): String =
    s"${graft.sources.SnapshotStore.stagePrefix}v2-$writeUuid"

  def abortStaged(store: SnapshotStoreOps, root: String, keyCol: String,
                  messages: Array[WriterCommitMessage]): Unit = {
    import graft.sources.SnapshotStore.{Manifest, Staged}
    val files = messages.toVector.collect { case m: V2FileMessage => m.path }
    store.abort(root, Staged(Manifest(-1L, keyCol, Vector.empty),
      files, -1L, appendOnly = true))
    ()
  }

  /** Task commit messages → manifest entries (seq is stamped by the
    * commit that lands them).
    */
  def entriesOf(messages: Array[WriterCommitMessage]): Vector[FileEntry] =
    messages.toVector.collect {
      case V2FileMessage(path, mn, mx, rows, stats, bloom, bytes) =>
        FileEntry(path, mn, mx, rows, stats, seq = 0L, bloom = bloom,
          bytes = bytes)
    }.sortBy(_.path)

  private def integral(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  /** V2 writers fold stats inline with unboxed long reads — refuse
    * non-integral key/stats columns at ANALYSIS, not mid-job on an
    * executor.
    */
  def validateTypes(declared: StructType, keyCol: String,
                    statsCols: Seq[String], what: String): Unit = {
    require(integral(declared(keyCol).dataType),
      s"graft-snapshot $what needs an integral key column; " +
        s"'$keyCol' is ${declared(keyCol).dataType.sql} — use the " +
        "SnapshotStore API")
    statsCols.foreach { c =>
      require(integral(declared(c).dataType),
        s"graft-snapshot $what folds zone maps inline and needs " +
          s"integral stats columns; '$c' is ${declared(c).dataType.sql}" +
          " — use the SnapshotStore API")
    }
  }

  def resolved(): Array[(String, String)] = {
    val spark = SparkSession.active
    val hconf = spark.sessionState.newHadoopConf()
    // the keys ParquetWriteSupport.init + SparkToParquetSchemaConverter
    // read — set explicitly (with each conf's session-resolved value)
    // so the executor-side conf never depends on which SQL confs the
    // user happened to SET in this session
    import org.apache.spark.sql.internal.SQLConf
    Seq(SQLConf.PARQUET_WRITE_LEGACY_FORMAT,
      SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE,
      SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED,
      SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE,
      SQLConf.PARQUET_REBASE_MODE_IN_WRITE,
      SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE,
      SQLConf.PARQUET_COMPRESSION)
      .foreach(e => hconf.set(e.key,
        spark.sessionState.conf.getConfString(e.key, e.defaultValueString)))
    import scala.jdk.CollectionConverters._
    hconf.iterator().asScala.map(e => e.getKey -> e.getValue).toArray
  }
}

/** One staged file per (partition, task) with the manifest's stats
  * folded inline. `rows = 0` partitions report no file.
  */
private[v2] final case class V2FileMessage(path: String, minKey: Long,
                                           maxKey: Long, rows: Long,
                                           stats: Map[String, (Long, Long)],
                                           bloom: Option[String],
                                           bytes: Long)
    extends WriterCommitMessage

private[v2] final case class V2EmptyMessage() extends WriterCommitMessage

private[v2] final class SnapshotWriterFactory(root: String, stageRel: String,
                                              writeUuid: String,
                                              schema: StructType,
                                              keyOrd: Int,
                                              statsOrds: Vector[(String, Int)],
                                              bloomBits: Int,
                                              confKVs: Array[(String, String)],
                                              keyCol: String)
    extends DataWriterFactory with StreamingDataWriterFactory {

  // writeUuid in the FILE name, not just the staging dir: publish
  // strips the dir, and task ids restart per application
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new SnapshotDataWriter(root, stageRel,
      f"$writeUuid-part-$partitionId%05d-$taskId", schema, keyOrd, statsOrds,
      bloomBits, confKVs, keyCol)

  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new SnapshotDataWriter(root, stageRel,
      f"$writeUuid-e$epochId-part-$partitionId%05d-$taskId", schema, keyOrd,
      statsOrds, bloomBits, confKVs, keyCol)
}

/** Streams one partition into one staged parquet file through Spark's
  * own [[ParquetWriteSupport]] (vectorized-reader-compatible, same
  * physical encoding `DataFrame.write.parquet` produces), folding
  * (minKey, maxKey, rows, zone maps, bloom) as rows pass — the
  * commit-time stats scan the API write path pays is free here.
  */
private[v2] final class SnapshotDataWriter(root: String, stageRel: String,
                                           fileBase: String,
                                           schema: StructType, keyOrd: Int,
                                           statsOrds: Vector[(String, Int)],
                                           bloomBits: Int,
                                           confKVs: Array[(String, String)],
                                           keyCol: String)
    extends DataWriter[InternalRow] {

  private val relPath = s"$stageRel/$fileBase.parquet"
  private val hPath = new Path(root, relPath)

  private def conf(): Configuration = SnapshotDataWriter.taskConf(confKVs)

  private var writer: ParquetWriter[InternalRow] = _
  private var hconf: Configuration = _

  private var rows = 0L
  private var minKey = Long.MaxValue
  private var maxKey = Long.MinValue
  private val zoneMin = Array.fill(statsOrds.length)(Long.MaxValue)
  private val zoneMax = Array.fill(statsOrds.length)(Long.MinValue)
  private val zoneSeen = Array.fill(statsOrds.length)(false)
  private val bloom: Array[Byte] =
    if (bloomBits > 0) new Array[Byte](bloomBits / 8) else null

  private def longAt(row: InternalRow, ord: Int): Long =
    schema(ord).dataType match {
      case LongType => row.getLong(ord)
      case IntegerType => row.getInt(ord).toLong
      case ShortType => row.getShort(ord).toLong
      case ByteType => row.getByte(ord).toLong
      case dt => throw new IllegalStateException(
        s"non-integral stats type ${dt.sql}") // builder refused already
    }

  private def open(): Unit = {
    hconf = conf()
    writer = SnapshotDataWriter.openRowWriter(hPath, schema, hconf)
  }

  override def write(row: InternalRow): Unit = {
    if (writer == null) open() // empty partitions never create a file
    if (row.isNullAt(keyOrd)) throw new IllegalArgumentException(
      s"snapshot-store commit rejected: NULL key column '$keyCol'; " +
        "filter or repair before writing")
    val k = longAt(row, keyOrd)
    if (k < minKey) minKey = k
    if (k > maxKey) maxKey = k
    var i = 0
    while (i < statsOrds.length) {
      val ord = statsOrds(i)._2
      if (!row.isNullAt(ord)) {
        val v = longAt(row, ord)
        if (v < zoneMin(i)) zoneMin(i) = v
        if (v > zoneMax(i)) zoneMax(i) = v
        zoneSeen(i) = true
      }
      i += 1
    }
    if (bloom != null) KeyBloom.add(bloom, k)
    rows += 1L
    writer.write(row)
  }

  /** The metadata-carrying variant Spark's row-level tasks call
    * (DataAndMetadataWritingSparkTask): the metadata row — `_file`,
    * which drove group selection — has no place in the written bytes.
    */
  override def write(metadata: InternalRow, row: InternalRow): Unit =
    write(row)

  private var committed = false

  override def commit(): WriterCommitMessage = {
    if (writer == null && rows == 0L) { committed = true; return V2EmptyMessage() }
    writer.close()
    writer = null
    committed = true
    val bytes = hPath.getFileSystem(hconf).getFileStatus(hPath).getLen
    V2FileMessage(relPath, minKey, maxKey, rows,
      statsOrds.indices.collect {
        case i if zoneSeen(i) => statsOrds(i)._1 -> (zoneMin(i), zoneMax(i))
      }.toMap,
      Option(bloom).map(java.util.Base64.getEncoder.encodeToString),
      bytes)
  }

  override def abort(): Unit = close()

  override def close(): Unit = {
    if (writer != null) { writer.close(); writer = null }
    // a failed/speculative attempt removes its own partial file; a
    // committed writer's staged file is the job's to keep (the
    // driver-side abort(messages) owns cleanup from here)
    if (!committed) {
      val fs = hPath.getFileSystem(if (hconf != null) hconf else conf())
      if (fs.exists(hPath)) { fs.delete(hPath, false); () }
    }
  }
}

private[v2] object SnapshotDataWriter {
  /** parquet-hadoop's builder pattern over Spark's row write support. */
  final class RowWriterBuilder(file: OutputFile)
      extends ParquetWriter.Builder[InternalRow, RowWriterBuilder](file) {
    override def self(): RowWriterBuilder = this
    override def getWriteSupport(c: Configuration) = new ParquetWriteSupport
  }

  /** Executor-side Configuration for a V2 task writer: the shipped
    * session conf plus, for the local scheme, a RawLocalFileSystem
    * override — the checksummed LocalFileSystem would litter staging
    * with .crc sidecars the store's publish/cleanup (which moves
    * exactly the reported files) never claims. Cache disabled so the
    * override never leaks into the process-wide FileSystem cache.
    */
  def taskConf(confKVs: Array[(String, String)]): Configuration = {
    val c = new Configuration(false)
    confKVs.foreach { case (k, v) => c.set(k, v) }
    c.set("fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
    c.setBoolean("fs.file.impl.disable.cache", true)
    c
  }

  /** The ONE parquet-writer construction every V2 task writer uses
    * (data files and equality-delete files alike): Spark's own
    * [[ParquetWriteSupport]] under the session-resolved compression —
    * a write-conf change lands here once or not at all.
    */
  def openRowWriter(hPath: Path, schema: StructType,
                    conf: Configuration): ParquetWriter[InternalRow] = {
    ParquetWriteSupport.setSchema(schema, conf)
    val codec = CompressionCodecName.valueOf(
      conf.get(org.apache.spark.sql.internal.SQLConf.PARQUET_COMPRESSION.key,
        "snappy").toUpperCase(java.util.Locale.ROOT))
    new RowWriterBuilder(HadoopOutputFile.fromPath(hPath, conf))
      .withConf(conf)
      .withCompressionCodec(codec)
      .build()
  }
}
