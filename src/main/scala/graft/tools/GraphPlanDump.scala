package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FormattedMode

/** Dev tool: dump the DISTRIBUTED-path plans of the graph gates (the
  * `smallGraphEdges = 0` spelling — the shape the same gates planned
  * before the driver small-graph switch, and still plan above the
  * bound), for the plans/ evidence directory. Not part of the driver
  * contract.
  */
object GraphPlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(if (args.nonEmpty) args(0) else "/tmp/plans_graph")
    val d = if (args.length >= 2) args(1) else "/root/testdata/sf0.1"
    Files.createDirectories(outDir)
    val s = graft.GraftSession.local(32, 32)
    s.sparkContext.setLogLevel("ERROR")
    import graft.sources.Tables
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
    val prEdges = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("s"), col("l_suppkey").cast("string")).as("src"),
        concat(lit("c"), col("o_custkey").cast("string")).as("dst"))
    val op = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val kcEdges = op.as("a").join(op.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("src"), col("b.p").as("dst"))
    val lpaEdges = op.as("a").join(op.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("src"), col("b.p").as("dst"))
      .agg(count(lit(1)).as("w")).filter(col("w") >= 2)
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      Files.writeString(outDir.resolve(s"$name.txt"),
        df.queryExecution.explainString(FormattedMode))
      println(s"PLAN $name")
    }
    dump("q_pagerank_dist", graft.operators.Graph.pageRank(
      prEdges, "src", "dst", iters = 5, smallGraphEdges = 0L).orderBy("node"))
    dump("q_hits_dist", graft.operators.Graph.hits(
      prEdges, "src", "dst", iters = 3, smallGraphEdges = 0L).orderBy("node"))
    dump("q_kcore_dist", graft.operators.Graph.kcoreMembers(
      kcEdges, "src", "dst", k = 80, rounds = 8, smallGraphEdges = 0L)
      .orderBy("node"))
    dump("q_lpa_dist", graft.operators.Graph.labelPropagation(
      lpaEdges, "src", "dst", rounds = 4, smallGraphEdges = 0L)
      .orderBy("node"))
    s.stop()
  }
}
