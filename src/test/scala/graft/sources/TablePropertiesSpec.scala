package graft.sources

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Manifest-carried TABLE PROPERTIES (the TBLPROPERTIES surface):
  * durable, versioned with the table, landed as metadata-only
  * commits, carried by EVERY commit path. The consumer that matters:
  * 'update.mode' — session conf > table property > AUTO, where auto
  * picks merge-on-read from manifest stats alone (avg live file bytes
  * >= 'update.auto.bytes') so the common case needs no knob at all.
  */
class TablePropertiesSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"tprops_$tag").toString + "/t"

  private val base =
    (0L until 120L).map(i => (i, i * 3L, s"v$i")).toDF("k", "n", "p")

  test("properties persist across every commit path and time-travel correctly") {
    val root = freshRoot("carry")
    SnapshotStore.init(spark, base, root, "k", filesPerCommit = 3,
      props = Map("owner.team" -> "data-eng")) // v0
    assert(SnapshotStore.currentManifest(root).props ==
      Map("owner.team" -> "data-eng"))
    SnapshotStore.setProperties(root, Map("update.mode" -> "merge-on-read")) // v1
    SnapshotStore.append(spark, Seq((500L, 1L, "a")).toDF("k", "n", "p"), root) // v2
    SnapshotStore.merge(spark, Seq((5L, 9L, "m")).toDF("k", "n", "p"), root) // v3
    SnapshotStore.renameColumn(root, "p", "q") // v4
    SnapshotStore.deleteRange(spark, root, 100L, 110L) // v5
    SnapshotStore.compact(spark, root) // v6 (maybe no-op)
    val props = SnapshotStore.currentManifest(root).props
    assert(props == Map("owner.team" -> "data-eng",
      "update.mode" -> "merge-on-read"),
      s"props lost by a commit path: $props")
    // versioned: v0 predates the set
    assert(SnapshotStore.manifestAsOf(root, 0L).props ==
      Map("owner.team" -> "data-eng"))
    // unset drops; absent keys no-op
    SnapshotStore.unsetProperties(root, Seq("update.mode", "absent"))
    assert(SnapshotStore.currentManifest(root).props ==
      Map("owner.team" -> "data-eng"))
    // structural-character refusal keeps the manifest parser sound
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.setProperties(root, Map("bad" -> """x"y"""))
    }
    assert(e.getMessage.contains("quotes"))
  }

  test("SQL TBLPROPERTIES: create persists, ALTER SET/UNSET evolve, SHOW reads, structural refuse") {
    val wh = java.nio.file.Files.createTempDirectory("tprops_wh").toString
    spark.conf.set("spark.sql.catalog.tpcat", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.tpcat.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS tpcat.db")
      spark.sql("""CREATE TABLE tpcat.db.t (k BIGINT, n BIGINT)
                  |TBLPROPERTIES ('key' = 'k', 'team' = 'curation')"""
        .stripMargin)
      def show(): Map[String, String] =
        spark.sql("SHOW TBLPROPERTIES tpcat.db.t").collect()
          .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(show().get("team").contains("curation"))
      assert(show().get("key").contains("k")) // structural, surfaced
      spark.sql("ALTER TABLE tpcat.db.t SET TBLPROPERTIES " +
        "('update.mode' = 'merge-on-read')")
      assert(show().get("update.mode").contains("merge-on-read"))
      spark.sql("ALTER TABLE tpcat.db.t UNSET TBLPROPERTIES ('team')")
      assert(!show().contains("team"))
      val e = intercept[Exception] {
        spark.sql("ALTER TABLE tpcat.db.t SET TBLPROPERTIES ('key' = 'n')")
      }
      assert(e.getMessage.contains("structural"))
    } finally spark.conf.unset("spark.sql.catalog.tpcat")
  }

  test("update.mode resolution: conf > property > auto (manifest-stat cost default)") {
    val wh = java.nio.file.Files.createTempDirectory("tprops_wh2").toString
    spark.conf.set("spark.sql.catalog.tpc2", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.tpc2.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS tpc2.db")
      def mk(name: String, tblProps: String): String = {
        spark.sql(s"""CREATE TABLE tpc2.db.$name (k BIGINT, n BIGINT)
                     |TBLPROPERTIES ('key' = 'k'$tblProps)""".stripMargin)
        (0L until 120L).map(i => (i, i * 3L)).toDF("k", "n")
          .writeTo(s"tpc2.db.$name").append()
        s"$wh/db/$name"
      }
      def deletesOf(root: String) =
        SnapshotStore.currentManifest(root).deletes
      // 1) PROPERTY picks merge-on-read with NO session knob
      val rProp = mk("tprop", ", 'update.mode' = 'merge-on-read'")
      assert(spark.conf.getOption("spark.graft.update.mode").isEmpty)
      spark.sql("UPDATE tpc2.db.tprop SET n = n + 1 WHERE k % 40 = 1")
      assert(deletesOf(rProp).nonEmpty,
        "the update.mode property must route the UPDATE to the delta path")
      // 2) AUTO: same UPDATE, no knob anywhere — the wide-file table
      // (auto threshold property below its file size) takes the delta
      // path, the small-file default table takes copy-on-write
      val rWide = mk("twide", ", 'update.auto.bytes' = '10'")
      spark.sql("UPDATE tpc2.db.twide SET n = n + 1 WHERE k % 40 = 1")
      assert(deletesOf(rWide).nonEmpty,
        "auto must pick merge-on-read when avg file bytes >= threshold")
      val rSmall = mk("tsmall", "")
      spark.sql("UPDATE tpc2.db.tsmall SET n = n + 1 WHERE k % 40 = 1")
      assert(deletesOf(rSmall).isEmpty,
        "auto must pick copy-on-write for small-file tables")
      // 3) SESSION CONF overrides the property
      spark.conf.set("spark.graft.update.mode", "copy-on-write")
      try {
        spark.sql("CALL tpc2.system.apply_deletes(`table` => 'db.tprop')")
        spark.sql("UPDATE tpc2.db.tprop SET n = n + 2 WHERE k % 40 = 1")
        assert(deletesOf(rProp).isEmpty,
          "the session conf must override the table property")
      } finally spark.conf.unset("spark.graft.update.mode")
    } finally spark.conf.unset("spark.sql.catalog.tpc2")
  }

  test("auto threshold chain: session conf > table property > catalog property > constant") {
    val wh = java.nio.file.Files.createTempDirectory("tprops_wh4").toString
    spark.conf.set("spark.sql.catalog.tpc4", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.tpc4.warehouse", wh)
    // the CATALOG-level fleet default: one warehouse property instead
    // of a per-table ALTER on every table
    spark.conf.set("spark.sql.catalog.tpc4.update.auto.bytes", "10")
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS tpc4.db")
      def mk(name: String): String = {
        spark.sql(s"""CREATE TABLE tpc4.db.$name (k BIGINT, n BIGINT)
                     |TBLPROPERTIES ('key' = 'k')""".stripMargin)
        (0L until 120L).map(i => (i, i * 3L)).toDF("k", "n")
          .writeTo(s"tpc4.db.$name").append()
        s"$wh/db/$name"
      }
      def deletesOf(root: String) =
        SnapshotStore.currentManifest(root).deletes
      // 1) no conf, no table property: the CATALOG default (10 bytes,
      // below any real file) routes auto to merge-on-read — the
      // built-in 32 MiB constant would have picked copy-on-write
      val rCat = mk("tcat")
      spark.sql("UPDATE tpc4.db.tcat SET n = n + 1 WHERE k % 40 = 1")
      assert(deletesOf(rCat).nonEmpty,
        "the catalog-level update.auto.bytes default must reach auto")
      // 2) the TABLE property beats the catalog default
      val rTbl = mk("ttbl")
      spark.sql("ALTER TABLE tpc4.db.ttbl SET TBLPROPERTIES " +
        "('update.auto.bytes' = '1073741824')")
      spark.sql("UPDATE tpc4.db.ttbl SET n = n + 1 WHERE k % 40 = 1")
      assert(deletesOf(rTbl).isEmpty,
        "the table property must override the catalog default")
      // 3) the SESSION conf beats the table property
      spark.conf.set("spark.graft.update.auto.bytes", "10")
      try {
        spark.sql("UPDATE tpc4.db.ttbl SET n = n + 2 WHERE k % 40 = 1")
        assert(deletesOf(rTbl).nonEmpty,
          "the session conf must override the table property")
      } finally spark.conf.unset("spark.graft.update.auto.bytes")
      // a malformed catalog default names its key at initialize
      spark.conf.set("spark.sql.catalog.tpbad", "graft.sources.v2.GraftCatalog")
      spark.conf.set("spark.sql.catalog.tpbad.warehouse", wh)
      spark.conf.set("spark.sql.catalog.tpbad.update.auto.bytes", "large")
      try {
        val e = intercept[Exception] {
          spark.sql("SHOW NAMESPACES IN tpbad").collect()
        }
        def msgs(t: Throwable): Seq[String] =
          if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
        assert(msgs(e).mkString.contains("update.auto.bytes"))
      } finally spark.conf.unset("spark.sql.catalog.tpbad")
    } finally {
      spark.conf.unset("spark.sql.catalog.tpc4.update.auto.bytes")
      spark.conf.unset("spark.sql.catalog.tpc4")
    }
  }

  test("multi-property ALTER lands atomically; engine keys filter at ALTER like CREATE") {
    val wh = java.nio.file.Files.createTempDirectory("tprops_wh5").toString
    spark.conf.set("spark.sql.catalog.tpc5", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.tpc5.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS tpc5.db")
      spark.sql("""CREATE TABLE tpc5.db.t (k BIGINT, n BIGINT)
                  |TBLPROPERTIES ('key' = 'k')""".stripMargin)
      val root = s"$wh/db/t"
      val v0 = SnapshotStore.versions(root).last
      // ONE commit for a multi-key SET: a CAS conflict can never leave
      // a partial property set applied
      spark.sql("ALTER TABLE tpc5.db.t SET TBLPROPERTIES " +
        "('a.x' = '1', 'a.y' = '2', 'a.z' = '3')")
      assert(SnapshotStore.versions(root).last == v0 + 1,
        "a multi-key SET TBLPROPERTIES must land as ONE commit")
      assert(SnapshotStore.currentManifest(root).props ==
        Map("a.x" -> "1", "a.y" -> "2", "a.z" -> "3"))
      // engine bookkeeping keys (comment, owner) filter at ALTER
      // exactly as at CREATE — never persisted as user properties
      spark.sql("ALTER TABLE tpc5.db.t SET TBLPROPERTIES " +
        "('comment' = 'hello', 'a.w' = '4')")
      val props = SnapshotStore.currentManifest(root).props
      assert(props.get("a.w").contains("4") && !props.contains("comment"))
      // an all-engine-key SET is a no-op: no empty commit lands
      val v1 = SnapshotStore.versions(root).last
      spark.sql("ALTER TABLE tpc5.db.t SET TBLPROPERTIES " +
        "('comment' = 'again')")
      assert(SnapshotStore.versions(root).last == v1,
        "an ALTER carrying only bookkeeping keys must not commit")
      // multi-key UNSET is one commit too
      spark.sql("ALTER TABLE tpc5.db.t UNSET TBLPROPERTIES " +
        "('a.x', 'a.y')")
      assert(SnapshotStore.versions(root).last == v1 + 1)
      assert(SnapshotStore.currentManifest(root).props ==
        Map("a.z" -> "3", "a.w" -> "4"))
      // a structural key anywhere in the batch refuses BEFORE any
      // key of the batch lands
      val e = intercept[Exception] {
        spark.sql("ALTER TABLE tpc5.db.t SET TBLPROPERTIES " +
          "('a.v' = '9', 'key' = 'n')")
      }
      assert(e.getMessage.contains("structural"))
      assert(!SnapshotStore.currentManifest(root).props.contains("a.v"),
        "a refused batch must land none of its keys")
    } finally spark.conf.unset("spark.sql.catalog.tpc5")
  }

  test("control characters refuse with the structural character set") {
    val root = freshRoot("ctrl")
    SnapshotStore.init(spark, base, root, "k", filesPerCommit = 2)
    for (v <- Seq("a\nb", "a\rb", "a\u0000b", "a\u007fb"))
      assert(intercept[IllegalArgumentException] {
        SnapshotStore.setProperties(root, Map("note" -> v))
      }.getMessage.contains("control characters"))
    assert(intercept[IllegalArgumentException] {
      SnapshotStore.setProperties(root, Map("bad\nkey" -> "v"))
    }.getMessage.contains("control characters"))
    // every retained manifest stays valid JSON to EXTERNAL tooling
    SnapshotStore.setProperties(root, Map("note" -> "plain value ok"))
    ()
  }

  test("property validation is one gate: reserved keys, poison values, and the CREATE path") {
    val root = freshRoot("valid")
    // reserved manifest-field names refuse (a 'txn' property would
    // make every version read as an applied streaming-epoch marker)
    SnapshotStore.init(spark, base, root, "k", filesPerCommit = 2)
    for (k <- Seq("txn", "schemaDdl", "seq", "props"))
      assert(intercept[IllegalArgumentException] {
        SnapshotStore.setProperties(root, Map(k -> "x"))
      }.getMessage.contains("collide"))
    // the engine-read keys validate their VALUES at set time
    assert(intercept[IllegalArgumentException] {
      SnapshotStore.setProperties(root, Map("update.auto.bytes" -> "32MB"))
    }.getMessage.contains("positive byte count"))
    assert(intercept[IllegalArgumentException] {
      SnapshotStore.setProperties(root, Map("update.mode" -> "sideways"))
    }.getMessage.contains("update.mode"))
    // the CREATE TABLE path runs the same gate (no bypass)
    assert(intercept[IllegalArgumentException] {
      SnapshotStore.init(spark, base, freshRoot("valid2"), "k",
        props = Map("note" -> """a"b}c"""))
    }.getMessage.contains("quotes"))
    val wh = java.nio.file.Files.createTempDirectory("tprops_wh3").toString
    spark.conf.set("spark.sql.catalog.tpc3", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.tpc3.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS tpc3.db")
      val e = intercept[Exception] {
        spark.sql("""CREATE TABLE tpc3.db.bad (k BIGINT)
                    |TBLPROPERTIES ('key' = 'k', 'txn' = 'x')""".stripMargin)
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).mkString.contains("collide"))
    } finally spark.conf.unset("spark.sql.catalog.tpc3")
  }
}
