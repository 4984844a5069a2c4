package graft.tools

/** Dev tool for the cross-JVM bench bimodality class (q_triangles
  * 3.7↔5.7 s, q_video_neardup 1.4↔5.2 s, q_stream_join 2.35↔8.01 s on
  * identical code): runs one gate N times in ONE JVM — Bench's exact
  * session, warmup and GC discipline — printing per-run wall time, a
  * canonicalized fingerprint of the EXECUTED plan (AQE-final), and the
  * WholeStageCodegen span count. Distinguishes the three candidate
  * mechanisms: an AQE plan flip shows as differing fingerprints, a
  * codegen fallback as differing span counts, JIT/warmup as run-1-slow
  * with a stable fingerprint. Not part of the driver contract; run:
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.BimodalProbe q_triangles 6"`.
  */
object BimodalProbe {
  def main(args: Array[String]): Unit = {
    val q = if (args.nonEmpty) args(0) else "q_triangles"
    val n = if (args.length > 1) args(1).toInt else 6
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = graft.GraftSession.local(cpus, cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    // experiment knob: AQE off isolates whether run-to-run variance is
    // adaptive plan flips (variance collapses) or JIT/scheduling (stays)
    if (sys.env.get("SPARK_GRAFT_PROBE_NOAQE").contains("1"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    val fn = graft.SparkEntry.queries(q)
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    try fn(spark, warmDir).count() catch { case _: Throwable => () }
    def canon(plan: String): Int = plan
      .replaceAll("#\\d+", "#x")
      .replaceAll("plan_id=\\d+", "plan_id=x")
      .replaceAll("\\[id=#?x?\\d*\\]", "")
      .replaceAll("[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}", "uuid")
      .replaceAll("/[^ ,\\]\\)]*(parquet|tmp)[^ ,\\]\\)]*", "path")
      .hashCode
    (1 to n).foreach { i =>
      System.gc()
      // Bench times CONSTRUCTION + execution (fn(...).count()) — any
      // eager fixture work in the gate body is inside the measurement
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val tc = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      df.count()
      val te = (System.nanoTime() - t1) / 1e9
      val plan = df.queryExecution.executedPlan.toString
      val wscg = "WholeStageCodegen".r.findAllIn(plan).size
      println(f"PROBE $q run=$i construct=$tc%.3f s execute=$te%.3f s planFp=${canon(plan)} wscg=$wscg")
    }
    spark.stop()
  }
}
