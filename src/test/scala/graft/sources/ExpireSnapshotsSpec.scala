package graft.sources

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Snapshot EXPIRY — retained history bounded by POLICY
  * (`older_than_versions` / `retain_last`) under vacuum's protection
  * rules: head, tags and branch-referenced files always survive; only
  * files EXCLUSIVE to expired versions reclaim; expired time-travel
  * refuses with guidance; the batch-CDC oldest-retained boundary
  * moves.
  */
class ExpireSnapshotsSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"expire_$tag").toString + "/t"

  private def df(r: Range) = r.map(i => (i.toLong, i * 3L)).toDF("k", "n")

  private def dataFiles(root: String): Set[String] =
    new java.io.File(s"$root/data").list().toSet

  test("policy expiry: exclusive files reclaim, shared and tagged survive, refusals guide") {
    val root = freshRoot("policy")
    SnapshotStore.init(spark, df(0 until 100), root, "k",
      filesPerCommit = 4) // v0: files A0
    val a0 = SnapshotStore.currentManifest(root).files.map(_.path).toSet
    // v1: a merge rewriting every file — A0 becomes exclusive to v0
    SnapshotStore.merge(spark,
      df(0 until 100).filter($"k" % 10 === 3)
        .select($"k", ($"n" + 1000L).as("n")), root, filesPerCommit = 4)
    val a1 = SnapshotStore.currentManifest(root).files.map(_.path).toSet
    assert((a0 & a1).isEmpty, "fixture: the merge must rewrite all files")
    SnapshotStore.append(spark, df(1000 until 1010), root) // v2
    SnapshotStore.append(spark, df(2000 until 2010), root) // v3
    SnapshotStore.tag(root, "rel", 3L)
    SnapshotStore.append(spark, df(3000 until 3010), root) // v4
    // older_than_versions=2 from head 4 expires {0, 1}
    val (expired, reclaimed) = SnapshotStore.expireSnapshots(root,
      olderThanVersions = 2L)
    assert(expired == 2 && reclaimed == a0.size,
      s"expected A0 (${a0.size} files) exclusive-reclaimed, " +
        s"got ($expired, $reclaimed)")
    assert(SnapshotStore.versions(root) == Seq(2L, 3L, 4L))
    val disk = dataFiles(root)
    assert((disk & a0).isEmpty, "v0-exclusive files must be reclaimed")
    assert(a1.forall(p => disk.contains(p.stripPrefix("data/"))),
      "files shared with retained versions must survive")
    // expired time-travel refuses with the retention message
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.readAsOf(spark, root, 0L).count()
    }
    assert(e.getMessage.contains("expired or vacuumed"))
    // retain_last=1 keeps {4} plus the tag's {3}; v2 expires but its
    // files are all carried into retained versions — zero reclaim
    val (e2, r2) = SnapshotStore.expireSnapshots(root, retainLast = 1)
    assert(e2 == 1 && r2 == 0)
    assert(SnapshotStore.versions(root) == Seq(3L, 4L))
    assert(SnapshotStore.readTag(spark, root, "rel").count() == 120,
      "the tagged version must stay readable after expiry")
    // reads on retained versions bit-identical content-wise
    assert(SnapshotStore.read(spark, root).count() == 130)
    // no policy is a config error, not expire-everything
    assert(intercept[IllegalArgumentException] {
      SnapshotStore.expireSnapshots(root)
    }.getMessage.contains("policy"))
  }

  test("branch-referenced files survive expiry of the main versions that created them") {
    val root = freshRoot("branch")
    SnapshotStore.init(spark, df(0 until 60), root, "k",
      filesPerCommit = 3) // v0: files A0
    val a0 = SnapshotStore.currentManifest(root).files.map(_.path).toSet
    SnapshotStore.createBranch(root, "audit") // forks at v0, carries A0
    SnapshotStore.merge(spark,
      df(0 until 60).filter($"k" % 5 === 1)
        .select($"k", ($"n" + 7L).as("n")), root, filesPerCommit = 3) // v1
    SnapshotStore.append(spark, df(500 until 510), root) // v2
    val (expired, reclaimed) =
      SnapshotStore.expireSnapshots(root, retainLast = 1)
    assert(expired == 2 && reclaimed == 0,
      "A0 is branch-referenced — expiry must reclaim nothing")
    assert(a0.forall(p =>
      dataFiles(root).contains(p.stripPrefix("data/"))))
    assert(SnapshotStore.readBranch(spark, root, "audit").count() == 60,
      "the unpublished branch must keep reading after main expiry")
  }

  test("batch CDC: the oldest-retained boundary moves; the default start skips gaps") {
    val dir = java.nio.file.Files.createTempDirectory("expire_cdc")
    val wh = s"$dir/wh"
    spark.conf.set("spark.sql.catalog.excdc", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.excdc.warehouse", wh)
    try {
      val root = s"$wh/db/t"
      SnapshotStore.init(spark, df(0 until 40), root, "k") // v0
      SnapshotStore.append(spark, df(100 until 110), root) // v1
      SnapshotStore.tag(root, "island", 1L)
      SnapshotStore.append(spark, df(200 until 210), root) // v2
      SnapshotStore.append(spark, df(300 until 310), root) // v3
      SnapshotStore.append(spark, df(400 until 410), root) // v4
      // pre-expiry: full history replays from v0 — (0, 4] covers the
      // four appended batches (v0's content is the base state)
      assert(spark.sql("SELECT * FROM excdc.db.t.changes").count() == 40)
      SnapshotStore.expireSnapshots(root, retainLast = 3)
      assert(SnapshotStore.versions(root) == Seq(1L, 2L, 3L, 4L))
      SnapshotStore.expireSnapshots(root, retainLast = 2)
      // the tag keeps v1 as an ISLAND: {1, 3, 4} with v2 gone
      assert(SnapshotStore.versions(root) == Seq(1L, 3L, 4L))
      // default start = terminal contiguous run (3, 4] — v1 is
      // time-travelable but not replayable (its successor is gone)
      assert(spark.sql("SELECT * FROM excdc.db.t.changes").count() == 10)
      // explicit pre-oldest start refuses with the moved boundary
      val e = intercept[Exception] {
        spark.read.option("startVersion", 0)
          .table("excdc.db.t.changes").count()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).mkString.contains("oldest retained version"))
    } finally spark.conf.unset("spark.sql.catalog.excdc")
  }
}
