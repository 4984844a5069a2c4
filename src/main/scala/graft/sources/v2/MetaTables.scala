package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.SnapshotStoreOps

/** METADATA TABLES (the Iceberg `db.table.history` surface): a store's
  * own bookkeeping queryable from pure SQL through [[GraftCatalog]] —
  *
  * {{{
  *   SELECT * FROM graft.db.t.history   -- one row per retained version
  *   SELECT * FROM graft.db.t.files     -- current version's data files
  *   SELECT * FROM graft.db.t.tags      -- named versions
  *   SELECT * FROM graft.db.t.branches  -- movable refs (name, head,
  *                                      --   base, behind_main staleness)
  *   SELECT * FROM graft.db.t.deletes   -- outstanding MOR delete files
  * }}}
  *
  * Each plans as a [[LocalScan]] over manifest metadata — ZERO data
  * files, zero tasks, exactly like the manifest-answered aggregates:
  * on a 100 TB table these queries cost what the manifests cost.
  * `history.rows`/`bytes` are the version's MANIFEST totals (visible
  * data-file rows before outstanding MOR deletes apply — the same
  * numbers `files` shows per file).
  */
private[v2] object MetaTables {

  val kinds: Set[String] = Set("history", "files", "tags", "branches",
    "deletes")

  def schemaOf(kind: String): StructType = kind match {
    case "history" => StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("committed_at", TimestampType, nullable = false),
      StructField("files", LongType, nullable = false),
      StructField("rows", LongType, nullable = false),
      StructField("bytes", LongType, nullable = false),
      StructField("delete_files", LongType, nullable = false)))
    case "files" => StructType(Seq(
      StructField("path", StringType, nullable = false),
      StructField("seq", LongType, nullable = false),
      StructField("min_key", LongType, nullable = false),
      StructField("max_key", LongType, nullable = false),
      StructField("rows", LongType, nullable = false),
      StructField("bytes", LongType, nullable = false),
      StructField("layout", StringType, nullable = true)))
    case "tags" => StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("version", LongType, nullable = false)))
    // base = the main version the branch forked from; behind_main =
    // main commits landed past the fork (0 ⇒ still fast-forwardable,
    // >0 ⇒ drop and re-fork) — the staleness triage column
    case "branches" => StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("head", LongType, nullable = false),
      StructField("base", LongType, nullable = false),
      StructField("behind_main", LongType, nullable = false)))
    case "deletes" => StructType(Seq(
      StructField("path", StringType, nullable = false),
      StructField("seq", LongType, nullable = false),
      StructField("min_key", LongType, nullable = false),
      StructField("max_key", LongType, nullable = false),
      StructField("rows", LongType, nullable = false)))
    case other => throw new IllegalArgumentException(
      s"unknown metadata table '$other' (one of ${kinds.mkString(", ")})")
  }

  private def utf8(s: String): Any = UTF8String.fromString(s)

  def rows(store: SnapshotStoreOps, root: String, kind: String)
      : Array[InternalRow] = kind match {
    case "history" =>
      // the store-side walk parses each immutable manifest SEGMENT
      // once across all versions — O(distinct segments), not
      // O(versions x files) driver parse
      store.history(root).map { case (v, tsMs, files, rws, bytes, dels) =>
        new GenericInternalRow(Array[Any](v, tsMs * 1000L, // micros
          files, rws, bytes, dels)): InternalRow
      }.toArray
    case "files" =>
      store.currentManifest(root).files.map(f =>
        new GenericInternalRow(Array[Any](utf8(f.path), f.seq, f.minKey,
          f.maxKey, f.rows, f.bytes,
          f.layout.map(utf8).orNull)): InternalRow).toArray
    case "tags" =>
      store.tags(root).toSeq.sortBy(_._1).map { case (n, v) =>
        new GenericInternalRow(Array[Any](utf8(n), v)): InternalRow
      }.toArray
    case "branches" =>
      store.branchInfo(root).map { case (n, head, base, behind) =>
        new GenericInternalRow(Array[Any](utf8(n), head, base,
          behind)): InternalRow
      }.toArray
    case "deletes" =>
      store.currentManifest(root).deletes.map(e =>
        new GenericInternalRow(Array[Any](utf8(e.path), e.seq, e.minKey,
          e.maxKey, e.rows)): InternalRow).toArray
    case other => throw new IllegalArgumentException(other)
  }
}

private[v2] final class MetaTable(store: SnapshotStoreOps, root: String,
                                  kind: String)
    extends Table with SupportsRead {

  override def name(): String = s"graft-meta `$root` $kind"

  override def schema(): StructType = MetaTables.schemaOf(kind)

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      // manifest bookkeeping as one local row set — no data files,
      // no tasks (the shared GraftLocalScan wrapper)
      override def build(): Scan = GraftLocalScan(
        s"graft-meta `$root` $kind", schema(),
        MetaTables.rows(store, root, kind))
    }
}
