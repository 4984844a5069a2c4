package graft.sources

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The TableCatalog plugin: the store addressable from PURE SQL —
  * create/insert/select/time-travel/alter/drop by name, planning
  * through the V2 scan (pruning pins intact) and committing through
  * the V2 write.
  */
class GraftCatalogSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private val wh =
    java.nio.file.Files.createTempDirectory("graft_cat_wh").toString

  private def sql(q: String) = spark.sql(q)

  private def scanned(df: org.apache.spark.sql.DataFrame): Seq[String] =
    graft.sources.v2.SnapshotSource.scannedFiles(df)

  spark.conf.set("spark.sql.catalog.gcat",
    "graft.sources.v2.GraftCatalog")
  spark.conf.set("spark.sql.catalog.gcat.warehouse", wh)
  // the fixtures' pruning/history assertions are written against
  // deterministic 4-file INSERT commits; SQL INSERT has no option
  // surface, so the session-conf pin supplies it (byte-targeted
  // sizing — the unpinned default — is covered by q_store_overwrite
  // and SnapshotOverwriteSpec)
  spark.conf.set("spark.graft.write.filesPerCommit", "4")

  test("full SQL lifecycle: create, insert, select, time travel, alter, drop") {
    sql("CREATE NAMESPACE gcat.db")
    assert(sql("SHOW NAMESPACES IN gcat").collect().map(_.getString(0))
      .contains("db"))
    sql("""CREATE TABLE gcat.db.obs (k BIGINT NOT NULL, n BIGINT, p STRING)
          |TBLPROPERTIES ('key' = 'k', 'statsCols' = 'n')""".stripMargin)
    assert(sql("SHOW TABLES IN gcat.db").collect().map(_.getString(1))
      .contains("obs"))
    // v0 is the empty declared schema
    assert(sql("SELECT * FROM gcat.db.obs").count() == 0)

    // INSERT INTO = append commit through the V2 write
    sql("""INSERT INTO gcat.db.obs
          |SELECT id AS k, id * 3 AS n, concat('v', id) AS p
          |FROM range(0, 1600)""".stripMargin)
    assert(sql("SELECT count(*) AS c FROM gcat.db.obs")
      .collect().head.getLong(0) == 1600L)

    // the SQL read plans through the pruned V2 scan
    val pruned = sql("SELECT k, n FROM gcat.db.obs WHERE k BETWEEN 100 AND 299")
    assert(pruned.count() == 200L)
    assert(scanned(pruned).length < SnapshotStore
      .currentManifest(s"$wh/db/obs").files.size,
      "SQL key-range predicates must prune files at planning time")

    // a second insert, then SQL time travel back across it
    sql("""INSERT INTO gcat.db.obs
          |SELECT id AS k, id AS n, 'late' AS p FROM range(5000, 5100)""".stripMargin)
    assert(sql("SELECT count(*) AS c FROM gcat.db.obs")
      .collect().head.getLong(0) == 1700L)
    assert(sql("SELECT count(*) AS c FROM gcat.db.obs VERSION AS OF 1")
      .collect().head.getLong(0) == 1600L)

    // VERSION AS OF also takes a TAG name
    SnapshotStore.tag(s"$wh/db/obs", "rel-a", 1L)
    assert(sql("SELECT count(*) AS c FROM gcat.db.obs VERSION AS OF 'rel-a'")
      .collect().head.getLong(0) == 1600L)

    // TIMESTAMP AS OF: now covers every committed version
    val cnt = sql(
      s"SELECT count(*) AS c FROM gcat.db.obs TIMESTAMP AS OF '2099-01-01'")
      .collect().head.getLong(0)
    assert(cnt == 1700L)

    // ALTER TABLE maps to metadata-only schema evolution
    sql("ALTER TABLE gcat.db.obs ADD COLUMN tag STRING")
    assert(sql("SELECT * FROM gcat.db.obs").columns.toSeq ==
      Seq("k", "n", "p", "tag"))
    assert(sql("SELECT tag FROM gcat.db.obs WHERE k = 5").collect()
      .head.isNullAt(0))
    sql("ALTER TABLE gcat.db.obs DROP COLUMN tag")
    assert(sql("SELECT * FROM gcat.db.obs").columns.toSeq ==
      Seq("k", "n", "p"))

    // INSERT OVERWRITE truncates
    sql("""INSERT OVERWRITE gcat.db.obs
          |SELECT id AS k, id AS n, 'ow' AS p FROM range(0, 10)""".stripMargin)
    assert(sql("SELECT count(*) AS c FROM gcat.db.obs")
      .collect().head.getLong(0) == 10L)

    // identical state through the path-based V2 source
    assert(spark.read.format("graft-snapshot").load(s"$wh/db/obs")
      .count() == 10L)

    sql("DROP TABLE gcat.db.obs")
    assert(!spark.catalog.tableExists("gcat.db.obs"))
  }

  test("manifest-answered aggregate works from SQL: zero files planned") {
    sql("CREATE NAMESPACE IF NOT EXISTS gcat.agg")
    sql("""CREATE TABLE gcat.agg.t (k BIGINT NOT NULL, n BIGINT)
          |TBLPROPERTIES ('key' = 'k', 'statsCols' = 'n')""".stripMargin)
    sql("INSERT INTO gcat.agg.t SELECT id, id * 7 FROM range(0, 4000)")
    val q = sql("SELECT count(*) AS c, min(k) AS mn, max(n) AS mx FROM gcat.agg.t")
    assert(q.collect().head.toSeq == Seq(4000L, 0L, 27993L))
    assert(scanned(q).isEmpty,
      s"manifest-answered SQL aggregate must plan zero files: ${scanned(q)}")
  }

  test("SQL DELETE: range is metadata-first, IN-set materializes, others refuse") {
    sql("CREATE NAMESPACE IF NOT EXISTS gcat.del")
    sql("""CREATE TABLE gcat.del.t (k BIGINT NOT NULL, n BIGINT, p STRING)
          |TBLPROPERTIES ('key' = 'k')""".stripMargin)
    sql("INSERT INTO gcat.del.t SELECT id, id * 2, concat('v', id) FROM range(0, 1600)")
    val root = s"$wh/del/t"
    val before = SnapshotStore.currentManifest(root)
    sql("DELETE FROM gcat.del.t WHERE k >= 800")
    val after = SnapshotStore.currentManifest(root)
    // fully-covered files dropped manifest-only; disjoint carried
    val covered = before.files.filter(_.minKey >= 800L).map(_.path).toSet
    assert(covered.nonEmpty)
    assert((covered & after.files.map(_.path).toSet).isEmpty,
      "files fully inside the deleted range must drop from the manifest")
    assert(before.files.filter(_.maxKey < 800L).map(_.path).toSet
      .subsetOf(after.files.map(_.path).toSet))
    assert(sql("SELECT count(*) AS c FROM gcat.del.t")
      .collect().head.getLong(0) == 800L)
    // IN-set: ONE copy-on-write commit, V2 read stays open
    val vBefore = SnapshotStore.currentManifest(root).version
    sql("DELETE FROM gcat.del.t WHERE k IN (5, 7)")
    assert(sql("SELECT count(*) AS c FROM gcat.del.t")
      .collect().head.getLong(0) == 798L)
    assert(SnapshotStore.currentManifest(root).version == vBefore + 1,
      "the SQL IN-delete must be a single commit")
    assert(SnapshotStore.currentManifest(root).deletes.isEmpty,
      "the SQL IN-delete must not leave unmaterialized MOR entries")
    // overflow edges: strict bounds past the long range delete NOTHING
    sql("DELETE FROM gcat.del.t WHERE k > 9223372036854775807")
    sql("DELETE FROM gcat.del.t WHERE k < -9223372036854775808")
    assert(sql("SELECT count(*) AS c FROM gcat.del.t")
      .collect().head.getLong(0) == 798L)
    // a non-key predicate no longer refuses: canDeleteWhere declines
    // it and Spark falls back to the row-level copy-on-write rewrite
    // (RowLevelOpsSpec covers the mechanics)
    sql("DELETE FROM gcat.del.t WHERE p = 'v3'")
    assert(sql("SELECT count(*) AS c FROM gcat.del.t")
      .collect().head.getLong(0) == 797L)
    sql("TRUNCATE TABLE gcat.del.t")
    assert(sql("SELECT count(*) AS c FROM gcat.del.t")
      .collect().head.getLong(0) == 0L)
    // history intact: the pre-truncate state still time-travels
    assert(sql("SELECT count(*) AS c FROM gcat.del.t VERSION AS OF 2")
      .collect().head.getLong(0) == 800L)
    sql("DROP TABLE gcat.del.t")
  }

  test("CREATE TABLE validation and rename") {
    intercept[Exception] {
      sql("CREATE TABLE gcat.db.bad (k BIGINT, n BIGINT)") // no key prop
    }
    sql("""CREATE TABLE gcat.db.r1 (k BIGINT NOT NULL, p STRING)
          |TBLPROPERTIES ('key' = 'k')""".stripMargin)
    sql("INSERT INTO gcat.db.r1 SELECT id, 'x' FROM range(0, 5)")
    sql("ALTER TABLE gcat.db.r1 RENAME TO db.r2")
    assert(sql("SELECT count(*) AS c FROM gcat.db.r2")
      .collect().head.getLong(0) == 5L)
    assert(!spark.catalog.tableExists("gcat.db.r1"))
    sql("DROP TABLE gcat.db.r2")
  }

  test("metadata tables: history/files/tags/deletes as LocalScans by SQL name") {
    sql("CREATE NAMESPACE IF NOT EXISTS gcat.meta")
    sql("""CREATE TABLE gcat.meta.t (k BIGINT NOT NULL, n BIGINT)
          |TBLPROPERTIES ('key' = 'k')""".stripMargin) // v0: empty
    sql("INSERT INTO gcat.meta.t SELECT id, id * 2 FROM range(0, 400)") // v1
    sql("INSERT INTO gcat.meta.t SELECT id, id FROM range(1000, 1100)") // v2
    val root = s"$wh/meta/t"
    SnapshotStore.tag(root, "rel", 1L)
    SnapshotStore.deleteKeys(spark, // v3: one MOR delete file
      (0L until 5L).toDF("k"), root)

    val hist = sql("SELECT version, files, rows, delete_files " +
      "FROM gcat.meta.t.history ORDER BY version")
    assert(hist.collect().map(_.toSeq).toSeq == Seq(
      Seq(0L, 0L, 0L, 0L), Seq(1L, 4L, 400L, 0L),
      Seq(2L, 8L, 500L, 0L), Seq(3L, 8L, 500L, 1L)))
    // the history scan is a LocalScan: no data files read
    assert(graft.sources.v2.SnapshotSource.scannedFiles(hist).isEmpty)

    // v2's files: 4 range-clustered files covering [1000, 1099] with
    // non-overlapping envelopes (exact split points are sampled)
    val files = sql("SELECT min_key, max_key, rows FROM gcat.meta.t.files " +
      "WHERE seq = 2 ORDER BY min_key").collect().map(_.toSeq)
    assert(files.length == 4 && files.map(_(2).asInstanceOf[Long]).sum == 100L)
    assert(files.head.head == 1000L && files.last(1) == 1099L)
    assert(files.sliding(2).forall(w =>
      w.head(1).asInstanceOf[Long] < w.last.head.asInstanceOf[Long]))

    assert(sql("SELECT name, version FROM gcat.meta.t.tags")
      .collect().map(_.toSeq).toSeq == Seq(Seq("rel", 1L)))

    val dels = sql("SELECT min_key, max_key, rows FROM gcat.meta.t.deletes")
    assert(dels.collect().map(_.toSeq).toSeq == Seq(Seq(0L, 4L, 5L)))

    // branches surface as a metadata table too (movable refs), with
    // the staleness columns: fork base + main commits landed past it
    val headV = SnapshotStore.currentManifest(s"$wh/meta/t").version
    SnapshotStore.createBranch(s"$wh/meta/t", "exp")
    assert(sql("SELECT name, head, base, behind_main FROM " +
        "gcat.meta.t.branches")
      .collect().map(_.toSeq).toSeq ==
        Seq(Seq("exp", headV, headV, 0L)))
    SnapshotStore.append(spark,
      Seq((9999L, 1L)).toDF("k", "n"), s"$wh/meta/t")
    assert(sql("SELECT behind_main FROM gcat.meta.t.branches")
      .collect().map(_.getLong(0)).toSeq == Seq(1L),
      "a main commit past the fork must show as staleness")
    SnapshotStore.dropBranch(s"$wh/meta/t", "exp")
    assert(sql("SELECT * FROM gcat.meta.t.branches").count() == 0)

    // a meta suffix on a NON-store parent still resolves nothing
    intercept[Exception] { sql("SELECT * FROM gcat.meta.nosuch.history") }
    sql("DROP TABLE gcat.meta.t")
  }

  test("CTAS and REPLACE TABLE AS SELECT work through the catalog") {
    sql("CREATE NAMESPACE IF NOT EXISTS gcat.ctas")
    // CTAS: Spark's createTable + append fallback (non-atomic without
    // a StagedTableCatalog — a crash between the two leaves an empty
    // v0, same exposure as Spark's built-in non-staging catalogs)
    sql("""CREATE TABLE gcat.ctas.t TBLPROPERTIES ('key' = 'k')
          |AS SELECT id AS k, id * 2 AS n FROM range(0, 300)""".stripMargin)
    assert(sql("SELECT count(*) AS c FROM gcat.ctas.t")
      .collect().head.getLong(0) == 300L)
    // versions: 0 = declared empty schema, 1 = the CTAS payload
    assert(SnapshotStore.versions(s"$wh/ctas/t") == Seq(0L, 1L))
    // the created store prunes like any other
    val pruned = sql("SELECT k, n FROM gcat.ctas.t WHERE k < 10")
    assert(pruned.count() == 10L)
    // RTAS: full replace — new content, fresh history
    sql("""REPLACE TABLE gcat.ctas.t TBLPROPERTIES ('key' = 'k')
          |AS SELECT id AS k, id AS n FROM range(500, 520)""".stripMargin)
    assert(sql("SELECT min(k) AS mn, max(k) AS mx FROM gcat.ctas.t")
      .collect().head.toSeq == Seq(500L, 519L))
    sql("DROP TABLE gcat.ctas.t")
  }

  test("change feed by name: db.t.changes / changes_images resolve; real tables win") {
    sql("CREATE NAMESPACE IF NOT EXISTS gcat.cdc")
    sql("""CREATE TABLE gcat.cdc.t (k BIGINT, n BIGINT)
          |TBLPROPERTIES ('key' = 'k')""".stripMargin) // v0
    sql("INSERT INTO gcat.cdc.t SELECT id, id * 2 FROM range(0, 50)") // v1
    sql("UPDATE gcat.cdc.t SET n = n + 7 WHERE k BETWEEN 10 AND 14") // v2
    val out = java.nio.file.Files.createTempDirectory("cdcname")
    val q = spark.readStream.option("startVersion", 0L)
      .table("gcat.cdc.t.changes")
      .writeStream.format("memory").queryName("cdc_by_name").start()
    try q.processAllAvailable() finally q.stop()
    val feed = spark.table("cdc_by_name")
      .select("version", "k", "op").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(feed == ((0L until 50L).map(i => (1L, i, "insert")) ++
      (10L to 14L).map(i => (2L, i, "update"))).toSet)
    // images suffix: pre/post values ride the feed
    val qi = spark.readStream.option("startVersion", 1L)
      .table("gcat.cdc.t.changes_images")
      .writeStream.format("memory").queryName("cdc_img_by_name").start()
    try qi.processAllAvailable() finally qi.stop()
    val imgs = spark.table("cdc_img_by_name")
      .filter(col("k") === 12L)
      .select("_change_type", "n").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(imgs == Set(("update_preimage", 24L), ("update_postimage", 31L)))
    // a real table NAMED changes shadows the suffix
    sql("CREATE NAMESPACE IF NOT EXISTS gcat.cdc.t2")
    intercept[Exception] { sql("SELECT * FROM gcat.cdc.t2.changes") }
    java.nio.file.Files.deleteIfExists(out)
    sql("DROP TABLE gcat.cdc.t")
  }
}
