package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: phase timings of the snapshot-store machinery the store
  * gates exercise. Not part of the driver contract.
  * `sbt "runMain graft.tools.StoreProbe /root/testdata/sf0.1"`
  */
object StoreProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local(32, 32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $name%-36s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    import graft.sources.SnapshotStore
    val base0 = graft.sources.Tables.documents(spark, d)
      .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
        col("source"))
    val baseDir = java.nio.file.Files.createTempDirectory("store_probe")
    val root = baseDir.resolve("store").toString

    // run twice: first is cold (codegen), second is the shape min-of-2 sees
    for (round <- 1 to 2) {
      val r = baseDir.resolve(s"store_$round").toString
      println(s"-- round $round")
      t("init (v0)")(SnapshotStore.init(spark, base0, r, "doc_id"))
      t("merge (v1)")(SnapshotStore.merge(spark,
        base0.filter(col("doc_id") % 10 === 0)
          .withColumn("n_chars", col("n_chars") + 1000L), r))
      t("deleteRange (v2)")(SnapshotStore.deleteRange(spark, r, 200L, 299L))
      t("deleteKeys MOR (v3)")(SnapshotStore.deleteKeys(spark,
        base0.filter(col("doc_id") % 13 === 1).select("doc_id"), r))
      t("read head count")(SnapshotStore.read(spark, r).count())
      t("readAsOf(1) count")(SnapshotStore.readAsOf(spark, r, 1L).count())
      t("changes(0,3) count")(SnapshotStore.changes(spark, r, 0L, 3L).count())
    }
    spark.stop()
  }
}
