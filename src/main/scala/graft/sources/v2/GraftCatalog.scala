package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.SnapshotStoreOps

/** SQL-name access to snapshot stores — a minimal
  * [[TableCatalog]] plugin (the public Iceberg `SparkCatalog` shape):
  *
  * {{{
  *   spark.sql.catalog.graft           = graft.sources.v2.GraftCatalog
  *   spark.sql.catalog.graft.warehouse = /data/warehouse
  *
  *   CREATE TABLE graft.db.obs (k BIGINT, n BIGINT)
  *     TBLPROPERTIES ('key' = 'k', 'statsCols' = 'n')
  *   INSERT INTO graft.db.obs SELECT ...
  *   SELECT * FROM graft.db.obs VERSION AS OF 3        -- or a tag name
  *   SELECT * FROM graft.db.obs TIMESTAMP AS OF '...'
  *   ALTER TABLE graft.db.obs ADD COLUMN tag STRING
  * }}}
  *
  * `graft.ns1.ns2.t` maps to the store root
  * `<warehouse>/ns1/ns2/t`; a table EXISTS iff that root holds a
  * store (a `manifests/` directory with at least one version). All
  * reads plan through [[SnapshotTable]]'s V2 scan (manifest pruning,
  * aggregate pushdown, runtime filtering) and writes through its V2
  * write (commit/rebase/CAS) — the catalog only resolves NAMES; a
  * path-based `spark.read.format("graft-snapshot")` on the same root
  * sees identical state. Time travel: `VERSION AS OF` takes a version
  * number OR a tag name; `TIMESTAMP AS OF` resolves to the newest
  * version committed at or before the timestamp (commit wall-clock,
  * the Iceberg/Delta contract).
  *
  * Deliberately NOT a metastore: no table-level metadata files beyond
  * the store's own manifests, so there is nothing to drift out of
  * sync. A production deployment would back namespaces with a real
  * catalog service; the store's commit protocol (and its
  * [[graft.sources.CommitCatalog]] object-store arbiter) is
  * orthogonal to this naming layer.
  */
final class GraftCatalog extends TableCatalog with SupportsNamespaces
    with FunctionCatalog with ProcedureCatalog {

  private var catalogName: String = _
  private var warehouse: String = _
  private var catalogAutoBytes: Option[Long] = None

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).map(_.stripSuffix("/"))
      .getOrElse(throw new IllegalArgumentException(
        s"catalog $name needs spark.sql.catalog.$name.warehouse"))
    // catalog-level fleet default for the auto update-mode threshold
    // (spark.sql.catalog.<name>.update.auto.bytes) — one warehouse
    // property instead of per-table ALTERs; the per-table property and
    // the session conf still override it (see SnapshotTable's mode
    // resolution). Validated here, where the failing key has a name.
    catalogAutoBytes = Option(options.get("update.auto.bytes")).map(v =>
      v.toLongOption.filter(_ > 0).getOrElse(
        throw new IllegalArgumentException(
          s"spark.sql.catalog.$name.update.auto.bytes='$v' is not a " +
            "positive byte count")))
  }

  override def name(): String = catalogName

  private def store: SnapshotStoreOps = SnapshotSource.storeFor(warehouse)

  private def rootFor(ident: Identifier): String =
    (warehouse +: ident.namespace.toSeq :+ ident.name).mkString("/")

  private def dirFor(ns: Seq[String]): String =
    (warehouse +: ns).mkString("/")

  // filesystem probes go through Hadoop so schemed warehouses work;
  // a plain local warehouse resolves to file:// implicitly
  private def hfs(path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(
      SparkSession.active.sparkContext.hadoopConfiguration), p)
  }

  private def isDir(path: String): Boolean = {
    val (fs, p) = hfs(path)
    fs.isDirectory(p)
  }

  private def isStore(root: String): Boolean =
    isDir(s"$root/manifests") &&
      (try store.versions(root).nonEmpty catch { case _: Exception => false })

  override def tableExists(ident: Identifier): Boolean =
    isStore(rootFor(ident))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = dirFor(namespace.toSeq)
    if (!isDir(dir)) throw new NoSuchNamespaceException(
      catalogName +: namespace)
    val (fs, p) = hfs(dir)
    fs.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName)
      .filter(n => isStore(s"$dir/$n"))
      .map(n => Identifier.of(namespace, n)).toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val root = rootFor(ident)
    if (!isStore(root)) {
      // metadata suffix (the Iceberg shape): `db.t.history` parses as
      // Identifier([db, t], "history") — serve the parent store's
      // bookkeeping as a LocalScan when the parent IS a store
      val kind = ident.name.toLowerCase(java.util.Locale.ROOT)
      if (ident.namespace.nonEmpty) {
        val parent = dirFor(ident.namespace.toSeq)
        if (MetaTables.kinds(kind) && isStore(parent))
          return new MetaTable(store, parent, kind)
        // CHANGE FEED BY NAME (the Delta table_changes / Iceberg
        // changelog surface): `db.t.changes` tails the key-level
        // feed, `db.t.changes_images` the pre/post-image feed —
        // spark.readStream.option("startVersion", 0)
        //   .table("graft.db.t.changes")
        // with startVersion/maxDeltaBytes as READER options (they
        // refine the scan; images picks the suffix because it
        // changes the schema). A SQL-first consumer no longer needs
        // the physical root this catalog exists to hide.
        if ((kind == "changes" || kind == "changes_images") &&
            isStore(parent))
          return CdcSource.forStore(store, parent,
            store.currentManifest(parent), start = None,
            images = kind == "changes_images",
            CdcSource.DefaultMaxDeltaBytes)
        // BRANCH BY NAME (the Iceberg `t.branch_<name>` SQL shape): a
        // WRITABLE handle at the branch head — INSERT / UPDATE /
        // MERGE / DELETE land on the branch's own chain (the WAP
        // fix-up surface: audit the staged batch, repair bad rows ON
        // the branch, fast_forward publishes pointer-only). Distinct
        // from `VERSION AS OF '<branch>'`, which reads the head as a
        // pinned read-only snapshot.
        if (kind.startsWith("branch_") && isStore(parent)) {
          val bname = ident.name.substring("branch_".length)
          if (store.branches(parent).contains(bname)) {
            val bm = store.currentManifest(parent, Some(bname))
            return new SnapshotTable(store, parent, bm,
              bm.schema.getOrElse(throw new IllegalStateException(
                s"store at $parent predates schema tracking")),
              pinned = false, branch = Some(bname),
              catalogAutoBytes = catalogAutoBytes)
          }
        }
      }
      throw new NoSuchTableException(ident)
    }
    val m = store.currentManifest(root)
    tableOf(root, m, pinned = false)
  }

  /** SQL `VERSION AS OF x`: a version number, a TAG name, or a
    * BRANCH name (the branch head — Iceberg's ref-reading shape; SQL
    * reads of a branch are snapshots, branch WRITES go through the
    * `branch` write option).
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val root = rootFor(ident)
    if (!isStore(root)) throw new NoSuchTableException(ident)
    val m = version.toLongOption match {
      case Some(n) => store.manifestAsOf(root, n)
      case None if store.tags(root).contains(version) =>
        store.manifestAsOf(root, store.tagVersion(root, version))
      case None if store.branches(root).contains(version) =>
        store.currentManifest(root, Some(version))
      case None => throw new IllegalArgumentException(
        s"no tag or branch '$version' on $ident (tags: " +
          s"${store.tags(root).keys.toSeq.sorted.mkString(", ")}; " +
          s"branches: ${store.branches(root).keys.toSeq.sorted.mkString(", ")})")
    }
    tableOf(root, m, pinned = true)
  }

  /** SQL `TIMESTAMP AS OF t` (micros): the newest version committed
    * at or before `t` — commit wall-clock from the version file.
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val root = rootFor(ident)
    if (!isStore(root)) throw new NoSuchTableException(ident)
    val tsMs = timestamp / 1000L
    val vs = store.versions(root)
      .filter(v => store.versionTimestampMs(root, v) <= tsMs)
    require(vs.nonEmpty,
      s"no version of $ident committed at or before timestamp " +
        s"$timestamp (oldest retained: ${store.versions(root).headOption})")
    tableOf(root, store.manifestAsOf(root, vs.max), pinned = true)
  }

  private def tableOf(root: String, m: graft.sources.SnapshotStore.Manifest,
                      pinned: Boolean): Table =
    new SnapshotTable(store, root, m,
      m.schema.getOrElse(throw new IllegalStateException(
        s"store at $root predates schema tracking")), pinned,
      catalogAutoBytes = catalogAutoBytes)

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft tables cluster by their key (TBLPROPERTIES key=...); " +
        "PARTITIONED BY is not supported")
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val props = properties.asScala
    def prop(k: String): Option[String] =
      props.get(k).orElse(props.get(TableCatalog.OPTION_PREFIX + k))
    val keyCol = prop("key").getOrElse(throw new IllegalArgumentException(
      "CREATE TABLE needs TBLPROPERTIES ('key' = '<column>') — the " +
        "store's cluster/upsert key"))
    require(schema.fieldNames.contains(keyCol),
      s"key column '$keyCol' not in the table schema")
    val statsCols = prop("statsCols").map(_.split(",").map(_.trim).toSeq
      .filter(_.nonEmpty)).getOrElse(Nil)
    statsCols.foreach(c => require(schema.fieldNames.contains(c),
      s"stats column '$c' not in the table schema"))
    val bloomBits = prop("bloomBits").map(_.toInt).getOrElse(0)
    // every OTHER user property persists into the manifest (the
    // TBLPROPERTIES convention); Spark/engine bookkeeping keys are
    // dropped, structural keys live in their manifest fields above
    val userProps = props.toMap
      .filterNot { case (k, _) =>
        GraftCatalog.StructuralProps(k) ||
          GraftCatalog.EngineProps(k) ||
          k.startsWith(TableCatalog.OPTION_PREFIX)
      }
    val spark = SparkSession.active
    val root = rootFor(ident)
    // version 0 is the declared schema with zero data files — the
    // first INSERT is an ordinary append commit
    store.init(spark,
      spark.createDataFrame(util.Collections.emptyList[org.apache.spark.sql.Row](),
        schema),
      root, keyCol, statsCols = statsCols, bloomBits = bloomBits,
      props = userProps)
    tableOf(root, store.currentManifest(root), pinned = false)
  }

  /** ADD/DROP/RENAME COLUMN and type WIDENING map to the store's
    * metadata-only schema evolution (a rename is a projection alias
    * per version — the manifest's rename log; widening rides the
    * parquet readers' native type promotion); everything else refuses
    * loudly.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val root = rootFor(ident)
    if (!isStore(root)) throw new NoSuchTableException(ident)
    // SET/UNSET TBLPROPERTIES → manifest-carried properties
    // (metadata-only commits, versioned with the table). All property
    // changes of one ALTER are COLLECTED and landed as ONE
    // setProperties / unsetProperties commit each — per-key commits
    // would make SET TBLPROPERTIES('a'='1','b'='2') non-atomic (a CAS
    // conflict midway leaves a partial property set applied). The
    // structural create-time properties are immutable (the key is
    // addressed by delete files and merges across versions, stats
    // columns key per-file zone maps) and refuse BEFORE any change
    // lands; Spark/engine bookkeeping keys (comment, owner, option.*)
    // are dropped, the same filter createTable applies — an ALTER must
    // not persist as a durable user property what CREATE never would.
    val sets = changes.collect { case p: TableChange.SetProperty => p }
    val removes = changes.collect { case p: TableChange.RemoveProperty => p }
    (sets.map(_.property) ++ removes.map(_.property)).foreach(k =>
      require(!GraftCatalog.StructuralProps(k),
        s"'$k' is a structural create-time property — the key and " +
          "bloom sizing cannot change on a live table, and stats " +
          "columns evolve through CALL " +
          s"$catalogName.system.set_cluster_spec (metadata-only), " +
          "not TBLPROPERTIES"))
    def bookkeeping(k: String): Boolean =
      GraftCatalog.EngineProps(k) || k.startsWith(TableCatalog.OPTION_PREFIX)
    changes.foreach {
      case a: TableChange.AddColumn =>
        require(a.fieldNames.length == 1,
          "nested columns are not supported")
        store.addColumn(root, a.fieldNames.head, a.dataType.sql)
      case d: TableChange.DeleteColumn =>
        require(d.fieldNames.length == 1,
          "nested columns are not supported")
        store.dropColumn(root, d.fieldNames.head)
      case r: TableChange.RenameColumn =>
        require(r.fieldNames.length == 1,
          "nested columns are not supported")
        store.renameColumn(root, r.fieldNames.head, r.newName)
      case u: TableChange.UpdateColumnType =>
        require(u.fieldNames.length == 1,
          "nested columns are not supported")
        store.widenColumn(root, u.fieldNames.head, u.newDataType.sql)
      case _: TableChange.SetProperty => () // batched below
      case _: TableChange.RemoveProperty => () // batched below
      case c => throw new UnsupportedOperationException(
        "graft tables support ADD/DROP/RENAME COLUMN, lossless " +
          s"type widening and SET/UNSET TBLPROPERTIES only; got $c")
    }
    val userSets = sets.filterNot(p => bookkeeping(p.property))
      .map(p => p.property -> p.value).toMap
    if (userSets.nonEmpty) store.setProperties(root, userSets)
    val userRemoves = removes.map(_.property).filterNot(bookkeeping)
    if (userRemoves.nonEmpty) store.unsetProperties(root, userRemoves)
    tableOf(root, store.currentManifest(root), pinned = false)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val existed = tableExists(ident)
    if (existed) store.destroy(rootFor(ident))
    existed
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    val (fs, src) = hfs(rootFor(oldIdent))
    val dst = new org.apache.hadoop.fs.Path(rootFor(newIdent))
    fs.mkdirs(dst.getParent)
    require(fs.rename(src, dst), s"rename $src -> $dst failed")
  }

  // ---- functions: the bucket transform's backing function ----
  //
  // Catalyst resolves a scan-reported `bucket(n, key)` clustering by
  // loading "bucket" from the RELATION'S catalog (V2ScanPartitioning →
  // V2ExpressionUtils.loadV2FunctionOpt, empty namespace) — serving it
  // here is what turns two bucketed stores' SQL join into a
  // STORAGE-PARTITIONED JOIN instead of two shuffles. The public
  // Iceberg SparkCatalog serves its transform functions the same way.

  override def listFunctions(namespace: Array[String]): Array[Identifier] = {
    if (namespace.nonEmpty && !namespaceExists(namespace))
      throw new NoSuchNamespaceException(catalogName +: namespace)
    Array(Identifier.of(namespace, "bucket"))
  }

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    // same namespace rule as listFunctions: the empty namespace (where
    // transform resolution looks) or a real one — a typo'd namespace
    // must not resolve
    if (ident.name == "bucket" &&
        (ident.namespace.isEmpty || namespaceExists(ident.namespace)))
      graft.functions.BucketUnbound
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)

  // ---- procedures: CALL graft.system.<proc>(...) ----
  //
  // the Iceberg stored-procedure surface on Spark 4's native
  // procedure API — maintenance (compact, apply_deletes, rebucket,
  // rollback, tag, vacuum) from pure SQL; see [[Procedures]]

  /** Procedure table-name resolution ('db.t' strings) and the store
    * handle, shared with the table surface so the two can never
    * resolve differently.
    */
  private[v2] def storeRootFor(ident: Identifier): String = {
    val root = rootFor(ident)
    if (!isStore(root)) throw new NoSuchTableException(ident)
    root
  }

  private[v2] def storeOps: SnapshotStoreOps = store

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      Procedures.names.map(n => Identifier.of(Array("system"), n)).toArray
    else Array.empty

  override def loadProcedure(ident: Identifier): procedures.UnboundProcedure =
    (if (ident.namespace.sameElements(Array("system")))
       Procedures.load(this, ident.name)
     else None).getOrElse(throw new IllegalArgumentException(
      // Spark has no NoSuchProcedureException (4.1); whatever is
      // thrown here surfaces wrapped as FAILED_TO_LOAD_ROUTINE — the
      // message carries the fix
      s"no such procedure $ident — CALL $catalogName.system.<one of " +
        s"${Procedures.names.mkString(", ")}>"))

  // ---- namespaces: directories under the warehouse ----

  override def listNamespaces(): Array[Array[String]] = {
    if (!isDir(warehouse)) return Array.empty
    val (fs, p) = hfs(warehouse)
    fs.listStatus(p).toSeq.filter(_.isDirectory)
      .map(s => Array(s.getPath.getName)).toArray
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    val dir = dirFor(namespace.toSeq)
    if (!isDir(dir)) throw new NoSuchNamespaceException(
      catalogName +: namespace)
    val (fs, p) = hfs(dir)
    fs.listStatus(p).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName)
      .filterNot(n => isStore(s"$dir/$n")) // tables are not namespaces
      .map(n => namespace :+ n).toArray
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    isDir(dirFor(namespace.toSeq))

  override def loadNamespaceMetadata(namespace: Array[String])
      : util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(
      catalogName +: namespace)
    util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    if (namespaceExists(namespace))
      throw new NamespaceAlreadyExistsException(catalogName +: namespace)
    val (fs, p) = hfs(dirFor(namespace.toSeq))
    fs.mkdirs(p)
    ()
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace)) return false
    val dir = dirFor(namespace.toSeq)
    val (fs, p) = hfs(dir)
    if (!cascade && fs.listStatus(p).nonEmpty)
      throw new IllegalStateException(
        s"namespace ${namespace.mkString(".")} is not empty")
    fs.delete(p, true)
  }
}

private[v2] object GraftCatalog {
  /** Create-time structural properties — not settable via
    * TBLPROPERTIES on a live table. The key (addressed BY NAME by
    * delete files and merge batches across versions) and bloom sizing
    * (baked into committed file blooms) are immutable outright; stats
    * columns DO evolve, but through the governed
    * `CALL graft.system.set_cluster_spec` procedure
    * ([[graft.sources.SnapshotStoreOps.setClusterSpec]] — schema/type
    * validation, z-order coupling), never as a raw property write.
    */
  val StructuralProps: Set[String] = Set("key", "statsCols", "bloomBits")

  /** Spark/engine bookkeeping keys injected into CREATE TABLE
    * properties — never persisted as user table properties.
    */
  val EngineProps: Set[String] =
    Set("provider", "owner", "location", "comment", "external")
}
