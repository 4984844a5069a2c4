package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Dev tool: dump the formatted plan of the logit FEATURE subtree
  * (hashed n-gram relation + broadcast-weight scoring), which the
  * declared logit gates hide behind a localCheckpoint at train time.
  * `predictLogitWithRel` is lazy (no jobs run), so the dumped plan is
  * exactly the optimizer's view of the feature construction.
  *
  *   sbt "runMain graft.tools.LogitPlanDump <outFile> [sfDir]"
  */
object LogitPlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: LogitPlanDump <outFile> [sfDir]")
    val sfDir = if (args.length >= 2) args(1) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local(8, 8)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val wRel = spark.range(65L).select(col("id").as("bucket"),
      (col("id") % 7).cast("double").as("w"))
    val df = graft.operators.LinearModel.predictLogitWithRel(
      docs, wRel, buckets = 64)
    Files.writeString(Paths.get(args(0)), df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    println(s"PLAN -> ${args(0)}")
    spark.stop()
  }
}
