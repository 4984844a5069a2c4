package graft.tools

import java.nio.file.{Files, Paths}

/** Dev tool: write `.explain("formatted")` for named bench queries to
  * files (the optimization-round evidence artifacts under plans/).
  * Not part of the driver contract.
  *
  * Usage:
  *   sbt "runMain graft.tools.PlanDump <outDir> <q1,q2,...> [sfDir]"
  *
  * Each query's plan lands at `<outDir>/<name>.txt`. Queries whose
  * construction itself RUNS jobs (streaming harnesses, store fixtures)
  * still produce the plan of the final returned frame — the part the
  * optimizer sees.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <q1,q2,...> [sfDir]")
    val outDir = Paths.get(args(0))
    val names = args(1).split(",").toSeq
    val sfDir = if (args.length >= 3) args(2) else "/root/testdata/sf0.1"
    Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus, cpus)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query: $n"))
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(outDir.resolve(s"$n.txt"), plan)
      println(s"PLAN $n -> ${outDir.resolve(s"$n.txt")}")
    }
    spark.stop()
  }
}
