package graft.sources

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stored procedures: `CALL graft.system.<proc>(...)` — the store's
  * maintenance surface from pure SQL, returning outcome rows.
  */
class GraftProceduresSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private val wh =
    java.nio.file.Files.createTempDirectory("graft_proc_wh").toString

  spark.conf.set("spark.sql.catalog.gproc", "graft.sources.v2.GraftCatalog")
  spark.conf.set("spark.sql.catalog.gproc.warehouse", wh)

  private def sql(q: String) = spark.sql(q)

  test("CALL tag / rollback / vacuum round-trip with result rows") {
    sql("CREATE NAMESPACE IF NOT EXISTS gproc.db")
    sql("""CREATE TABLE gproc.db.t (k BIGINT NOT NULL, n BIGINT)
          |TBLPROPERTIES ('key' = 'k')""".stripMargin) // v0
    sql("INSERT INTO gproc.db.t SELECT id, id * 2 FROM range(0, 200)") // v1
    sql("INSERT INTO gproc.db.t SELECT id, id FROM range(1000, 1050)") // v2
    val root = s"$wh/db/t"

    val tagged = sql("CALL gproc.system.tag(`table` => 'db.t', " +
      "name => 'rel', version => 1)").collect()
    assert(tagged.map(_.toSeq).toSeq == Seq(Seq("rel", 1L)))
    assert(sql("SELECT count(*) AS c FROM gproc.db.t VERSION AS OF 'rel'")
      .collect().head.getLong(0) == 200L)

    val rolled = sql("CALL gproc.system.rollback(`table` => 'db.t', " +
      "version => 1)").collect()
    assert(rolled.map(_.toSeq).toSeq == Seq(Seq(3L, 1L))) // new head v3
    assert(sql("SELECT count(*) AS c FROM gproc.db.t")
      .collect().head.getLong(0) == 200L)

    val vac = sql("CALL gproc.system.vacuum(`table` => 'db.t', " +
      "keep_last => 2, scratch_ttl_ms => 0, orphan_ttl_ms => 0)")
      .collect()
    assert(vac.length == 1)
    // v0 dropped (untagged, old); v1 survives (tagged), v2, v3 kept
    assert(SnapshotStore.versions(root) == Seq(1L, 2L, 3L))
  }

  test("CALL compact and apply_deletes materialize MOR state") {
    sql("CREATE NAMESPACE IF NOT EXISTS gproc.db2")
    sql("""CREATE TABLE gproc.db2.t (k BIGINT NOT NULL, n BIGINT)
          |TBLPROPERTIES ('key' = 'k')""".stripMargin)
    sql("INSERT INTO gproc.db2.t SELECT id, id FROM range(0, 300)")
    val root = s"$wh/db2/t"
    SnapshotStore.deleteKeys(spark, (0L until 7L).toDF("k"), root)
    assert(SnapshotStore.currentManifest(root).deletes.size == 1)
    val applied = sql(
      "CALL gproc.system.apply_deletes(`table` => 'db2.t')").collect()
    assert(applied.head.getLong(1) == 0L, "no delete files must remain")
    assert(sql("SELECT count(*) AS c FROM gproc.db2.t")
      .collect().head.getLong(0) == 293L)
    val compacted = sql("CALL gproc.system.compact(`table` => 'db2.t')")
      .collect()
    assert(compacted.head.getLong(1) >= 1L)
    assert(sql("SELECT count(*) AS c FROM gproc.db2.t")
      .collect().head.getLong(0) == 293L)
  }

  test("CALL rebucket enables the zero-shuffle SPJ path") {
    sql("CREATE NAMESPACE IF NOT EXISTS gproc.db3")
    sql("""CREATE TABLE gproc.db3.t (k BIGINT NOT NULL, n BIGINT)
          |TBLPROPERTIES ('key' = 'k')""".stripMargin)
    sql("INSERT INTO gproc.db3.t SELECT id, id FROM range(0, 400)")
    val out = sql("CALL gproc.system.rebucket(`table` => 'db3.t', n => 4)")
      .collect()
    assert(out.head.getInt(1) == 4)
    val m = SnapshotStore.currentManifest(s"$wh/db3/t")
    assert(m.files.size == 4 &&
      m.files.forall(_.layout.exists(_.startsWith("bucket(4,"))))
    assert(sql("SELECT count(*) AS c FROM gproc.db3.t")
      .collect().head.getLong(0) == 400L)
  }

  test("NULL arguments refuse with the argument name, never unbox to 0") {
    // a NULL version would otherwise unbox to 0 and silently roll the
    // table back to its empty v0
    val ex = intercept[Exception] {
      sql("CALL gproc.system.rollback(`table` => 'db.t', " +
        "version => CAST(NULL AS BIGINT))").collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c => c.getMessage != null &&
      c.getMessage.contains("'version' must not be NULL")))
    // the table is untouched at its pre-call head
    assert(sql("SELECT count(*) AS c FROM gproc.db.t")
      .collect().head.getLong(0) == 200L)
  }

  test("unknown procedures and non-store tables refuse loudly") {
    val ex = intercept[Exception] {
      sql("CALL gproc.system.nope(`table` => 'db.t')")
    }
    assert(ex.getMessage.contains("no such procedure") ||
      Option(ex.getCause).exists(_.getMessage.contains("no such procedure")))
    intercept[Exception] {
      sql("CALL gproc.system.compact(`table` => 'db.absent')").collect()
    }
  }
}
