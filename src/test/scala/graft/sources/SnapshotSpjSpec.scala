package graft.sources

import graft.SparkTest
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed layout + storage-partitioned joins: the shared bucket
  * function agrees with the builtin xxhash64 lane bit-for-bit,
  * `rebucket` rewrites row-identically into one-file-per-bucket with
  * per-file `bucket(n,b)` specs, the V2 scan reports the clustering,
  * and two same-n stores join through the SQL catalog with ZERO
  * shuffle exchanges — while mixed layouts fall back safely and
  * manifest-reported statistics drive auto-broadcast on dim-sized
  * stores.
  */
class SnapshotSpjSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"spj_$tag").toString

  private def shuffles(df: DataFrame): Int = {
    df.collect()
    graft.sources.v2.SnapshotSource.planNodes(df).count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange
        .ShuffleExchangeLike])
  }

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("GraftBucket matches the xxhash64 builtin lane exactly") {
    val keys = (Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue, 42L) ++
      (1 to 200).map(i => i * 982451653L - 7L)).toDF("k")
    val viaSpark = keys
      .select(col("k"), pmod(xxhash64(col("k")), lit(16)).cast("int").as("b"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    viaSpark.foreach { case (k, b) =>
      assert(graft.functions.GraftBucket(k, 16) == b,
        s"bucket mismatch at key $k")
    }
    // and the V2 function's unboxed magic method is the same function
    viaSpark.foreach { case (k, b) =>
      assert(graft.functions.BucketFunction.invoke(16, k) == b)
      assert(graft.functions.BucketFunction.produceResult(
        org.apache.spark.sql.catalyst.InternalRow(16, k)) == b)
    }
  }

  test("rebucket: row-identical rewrite, one file per bucket, specs stamped") {
    val root = freshDir("rebucket") + "/t"
    val df = (0L until 1000L).map(i => (i, i * 3L, s"v$i")).toDF("k", "n", "p")
    SnapshotStore.init(spark, df, root, "k", filesPerCommit = 4,
      statsCols = Seq("n"), bloomBits = 4096)
    val before = SnapshotStore.read(spark, root).orderBy("k").collect().toSeq
    SnapshotStore.rebucket(spark, root, 8)
    val m = SnapshotStore.currentManifest(root)
    assert(m.files.size == 8, s"expected one file per bucket: ${m.files.size}")
    val specs = m.files.flatMap(_.layout)
    assert(specs.size == 8 && specs.forall(_.startsWith("bucket(8,")))
    assert(specs.flatMap(graft.functions.GraftBucket.parseLayout)
      .map(_._2).sorted == (0 until 8))
    // blooms and zone maps recompute through the normal commit path
    assert(m.files.forall(_.bloom.isDefined))
    assert(m.files.forall(_.stats.contains("n")))
    assert(SnapshotStore.read(spark, root).orderBy("k").collect().toSeq
      == before)
    // every row actually sits in its computed bucket
    m.files.foreach { f =>
      val b = graft.functions.GraftBucket.parseLayout(f.layout.get).get._2
      val keys = spark.read.parquet(s"$root/${f.path}")
        .select("k").collect().map(_.getLong(0))
      assert(keys.nonEmpty &&
        keys.forall(k => graft.functions.GraftBucket(k, 8) == b),
        s"file ${f.path} holds keys outside bucket $b")
    }
  }

  test("rebucket refuses a non-BIGINT key") {
    val root = freshDir("intkey") + "/t"
    SnapshotStore.init(spark,
      (0 until 100).map(i => (i, i.toLong)).toDF("k", "n"), root, "k")
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.rebucket(spark, root, 4)
    }
    assert(e.getMessage.contains("BIGINT"))
  }

  test("rebucket materializes merge-on-read deletes") {
    val root = freshDir("mor") + "/t"
    SnapshotStore.init(spark,
      (0L until 500L).map(i => (i, i * 2L)).toDF("k", "n"), root, "k",
      filesPerCommit = 4)
    SnapshotStore.deleteKeys(spark,
      (0L until 500L by 7L).toDF("k"), root)
    SnapshotStore.rebucket(spark, root, 4)
    val m = SnapshotStore.currentManifest(root)
    assert(m.deletes.isEmpty, "rebucket must drop materialized deletes")
    assert(spark.read.format("graft-snapshot").load(root).count() ==
      (0L until 500L).count(_ % 7L != 0L))
  }

  test("SPJ: same-n stores join via the catalog with zero shuffles") {
    val wh = freshDir("spjwh")
    val cat = "gspjspec"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.v2.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$wh/db"))
    val fa = (0L until 800L).map(i => (i, i * 3L)).toDF("k", "n")
    val fb = (0L until 800L by 2L).map(i => (i, i * 5L)).toDF("k", "m")
    SnapshotStore.init(spark, fa, s"$wh/db/fa", "k", filesPerCommit = 3)
    SnapshotStore.init(spark, fb, s"$wh/db/fb", "k", filesPerCommit = 5)
    SnapshotStore.rebucket(spark, s"$wh/db/fa", 8)
    SnapshotStore.rebucket(spark, s"$wh/db/fb", 8)
    val sql = s"SELECT a.k, a.n, b.m FROM $cat.db.fa a " +
      s"JOIN $cat.db.fb b ON a.k = b.k"
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.sources.v2.bucketing.enabled" -> "false") {
      assert(shuffles(spark.sql(sql)) > 0,
        "control: the join must shuffle without v2 bucketing")
    }
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true") {
      val spj = spark.sql(sql)
      assert(shuffles(spj) == 0, "SPJ must plan zero shuffle exchanges")
      val got = spj.orderBy("k").collect().toSeq.map(_.toSeq)
      val want = (0L until 800L by 2L).map(i => Seq(i, i * 3L, i * 5L))
      assert(got == want)
    }
  }

  test("SPJ survives static key-range pruning on one side") {
    val wh = freshDir("spjprune")
    val cat = "gspjprune"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.v2.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$wh/db"))
    val fa = (0L until 400L).map(i => (i, i * 3L)).toDF("k", "n")
    val fb = (0L until 400L).map(i => (i, i * 5L)).toDF("k", "m")
    SnapshotStore.init(spark, fa, s"$wh/db/pa", "k")
    SnapshotStore.init(spark, fb, s"$wh/db/pb", "k")
    SnapshotStore.rebucket(spark, s"$wh/db/pa", 4)
    SnapshotStore.rebucket(spark, s"$wh/db/pb", 4)
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true") {
      val q = spark.sql(s"SELECT a.k, a.n, b.m FROM $cat.db.pa a " +
        s"JOIN $cat.db.pb b ON a.k = b.k WHERE a.k < 100 AND b.k < 100")
      assert(shuffles(q) == 0)
      assert(q.orderBy("k").collect().toSeq.map(_.toSeq) ==
        (0L until 100L).map(i => Seq(i, i * 3L, i * 5L)))
    }
  }

  test("one-file-per-bucket SPJ drops the sorts too (reported ordering)") {
    val wh = freshDir("spjsort")
    val cat = "gspjsort"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.v2.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$wh/db"))
    val fa = (0L until 600L).map(i => (i, i * 3L)).toDF("k", "n")
    val fb = (0L until 600L).map(i => (i, i * 5L)).toDF("k", "m")
    SnapshotStore.init(spark, fa, s"$wh/db/sa", "k")
    SnapshotStore.init(spark, fb, s"$wh/db/sb", "k")
    SnapshotStore.rebucket(spark, s"$wh/db/sa", 4)
    SnapshotStore.rebucket(spark, s"$wh/db/sb", 4)
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.sources.v2.bucketing.enabled" -> "true") {
      val q = spark.sql(s"SELECT a.k, a.n, b.m FROM $cat.db.sa a " +
        s"JOIN $cat.db.sb b ON a.k = b.k")
      assert(shuffles(q) == 0)
      val sorts = graft.sources.v2.SnapshotSource.planNodes(q).count(
        _.isInstanceOf[org.apache.spark.sql.execution.SortExec])
      assert(sorts == 0,
        "one sorted file per bucket must satisfy the merge join's " +
          s"ordering with no SortExec (got $sorts)")
      assert(q.count() == 600L)
    }
  }

  test("appendBucketed keeps the clustering; SPJ survives, order claim narrows") {
    val wh = freshDir("spjappend")
    val cat = "gspjapp"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.v2.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$wh/db"))
    val fa = (0L until 500L).map(i => (i, i * 3L)).toDF("k", "n")
    val fb = (0L until 1000L).map(i => (i, i * 5L)).toDF("k", "m")
    SnapshotStore.init(spark, fa, s"$wh/db/aa", "k")
    SnapshotStore.init(spark, fb, s"$wh/db/ab", "k")
    SnapshotStore.rebucket(spark, s"$wh/db/aa", 4)
    SnapshotStore.rebucket(spark, s"$wh/db/ab", 4)
    SnapshotStore.appendBucketed(spark,
      (500L until 1000L).map(i => (i, i * 3L)).toDF("k", "n"), s"$wh/db/aa")
    val m = SnapshotStore.currentManifest(s"$wh/db/aa")
    assert(m.files.forall(_.layout.exists(_.startsWith("bucket(4,"))),
      "appended files must carry the table's bucket specs")
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.sources.v2.bucketing.enabled" -> "true") {
      val q = spark.sql(s"SELECT a.k, a.n, b.m FROM $cat.db.aa a " +
        s"JOIN $cat.db.ab b ON a.k = b.k")
      assert(shuffles(q) == 0,
        "SPJ must survive a bucket-preserving append")
      val got = q.orderBy("k").collect().toSeq.map(_.toSeq)
      assert(got == (0L until 1000L).map(i => Seq(i, i * 3L, i * 5L)))
    }
    // a PLAIN append degrades to mixed and refuses appendBucketed
    SnapshotStore.append(spark,
      Seq((2000L, 1L)).toDF("k", "n"), s"$wh/db/aa")
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.appendBucketed(spark,
        Seq((3000L, 2L)).toDF("k", "n"), s"$wh/db/aa")
    }
    assert(e.getMessage.contains("rebucket"))
  }

  test("mixed layout (append after rebucket) reports no clustering and falls back") {
    val wh = freshDir("spjmixed")
    val cat = "gspjmixed"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.v2.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$wh/db"))
    val fa = (0L until 300L).map(i => (i, i * 3L)).toDF("k", "n")
    SnapshotStore.init(spark, fa, s"$wh/db/ma", "k")
    SnapshotStore.init(spark, fa.select(col("k"), (col("n") * 2L).as("m")),
      s"$wh/db/mb", "k")
    SnapshotStore.rebucket(spark, s"$wh/db/ma", 4)
    SnapshotStore.rebucket(spark, s"$wh/db/mb", 4)
    // a plain range-layout append makes ma's layout MIXED
    SnapshotStore.append(spark,
      (300L until 350L).map(i => (i, i * 3L)).toDF("k", "n"), s"$wh/db/ma")
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.sources.v2.bucketing.enabled" -> "true") {
      val q = spark.sql(s"SELECT a.k, a.n, b.m FROM $cat.db.ma a " +
        s"JOIN $cat.db.mb b ON a.k = b.k")
      assert(shuffles(q) > 0,
        "a mixed-layout side must fall back to a shuffled join")
      assert(q.count() == 300L)
    }
  }

  test("manifest statistics: post-pruning rows and bytes, compression-scaled") {
    val root = freshDir("stats") + "/t"
    SnapshotStore.init(spark,
      (0L until 1000L).map(i => (i, i * 2L)).toDF("k", "n"), root, "k",
      filesPerCommit = 4)
    val m = SnapshotStore.currentManifest(root)
    def statsOf(df: DataFrame) = {
      val scan = df.queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2ScanRelation => r.scan
      }.get
      scan.asInstanceOf[org.apache.spark.sql.connector.read
        .SupportsReportStatistics].estimateStatistics()
    }
    val full = statsOf(spark.read.format("graft-snapshot").load(root))
    assert(full.numRows().getAsLong == 1000L)
    assert(full.sizeInBytes().getAsLong == m.files.map(_.bytes).sum)
    // a pruned scan reports the SELECTED files' stats, not the table's
    val pruned = statsOf(spark.read.format("graft-snapshot").load(root)
      .filter(col("k") < 250L))
    assert(pruned.numRows().getAsLong == 250L)
    assert(pruned.sizeInBytes().getAsLong <
      full.sizeInBytes().getAsLong)
  }

  test("stats drive auto-broadcast: dim store broadcasts with no hint") {
    val factRoot = freshDir("bfact") + "/t"
    val dimRoot = freshDir("bdim") + "/t"
    SnapshotStore.init(spark,
      (0L until 5000L).map(i => (i, i * 2L)).toDF("k", "n"), factRoot, "k",
      filesPerCommit = 8)
    SnapshotStore.init(spark,
      (0L until 50L).map(i => (i * 100L, s"d$i")).toDF("k", "tag"), dimRoot,
      "k")
    val out = spark.read.format("graft-snapshot").load(factRoot)
      .join(spark.read.format("graft-snapshot").load(dimRoot), "k")
    out.collect()
    val bcast = graft.sources.v2.SnapshotSource.planNodes(out).count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange
        .BroadcastExchangeLike])
    assert(bcast > 0, "dim store must auto-broadcast")
    assert(out.count() == 50L)
  }
}
