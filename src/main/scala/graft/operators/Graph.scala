package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph analytics for corpus curation. A web-scale training
  * pipeline ranks crawl domains by link authority before deciding what
  * to fetch and keep (the Common Crawl curation precedent); PageRank
  * (Brin & Page 1998) is the public algorithm for that signal.
  *
  * Distributed shape: the graph stays edge-partitioned end to end.
  * Each power iteration is one broadcast-free equi-join of the edge
  * relation with the current rank table on `src` (both hash-partition
  * on the join key, and the edge⋈outdeg frame is materialized ONCE
  * via localCheckpoint so every iteration reuses the same shuffle
  * layout), one groupBy(dst) partial-aggregated sum, and one tiny
  * dangling-mass scalar broadcast back. Ranks are localCheckpointed
  * per iteration — each round reads the previous round's materialized
  * table (the [[Dedup.connectedComponents]] discipline), not a
  * re-execution of the whole prefix, and lineage stays flat at any
  * iteration count.
  *
  * Determinism discipline: fixed iteration count (power iteration, no
  * data-dependent convergence test), ranks and per-edge contributions
  * rounded to 6 decimals before order-free DECIMAL(28,6) sums — the
  * whole trajectory replays value-exactly in DuckDB's unrolled CTEs.
  */
object Graph {

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  /** PageRank with damping 0.85 over the DISTINCT directed edges of
    * (srcCol, dstCol). Nodes are the union of endpoints; dangling-node
    * mass is redistributed uniformly each iteration (the standard
    * formulation). Returns (node, rank) — ranks sum to ~1.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 5): DataFrame = {
    require(iters >= 1)
    val e = edges
      .select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"))
      .distinct()
      .localCheckpoint(eager = false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(eager = false)
    val n = nodes.count()
    require(n > 0, "empty graph")
    val out = e.groupBy("src").agg(count(lit(1)).as("__outdeg"))
    // edge ⋈ outdeg materialized once; every iteration joins ranks
    // into this same layout
    val eo = e.join(out, "src").localCheckpoint(eager = false)
    // the dangling node SET is iteration-invariant — resolve the
    // anti-join once; each iteration only semi-joins ranks against it
    val danglingNodes = nodes
      .join(out.select(col("src").as("node")), Seq("node"), "left_anti")
      .localCheckpoint(eager = false)
    var ranks = nodes.withColumn("rank", lit(round6(1.0 / n)))
      .localCheckpoint(eager = false)
    for (_ <- 1 to iters) {
      val contribs = eo
        .join(ranks.select(col("node").as("src"), col("rank")), "src")
        .select(col("dst").as("node"),
          round(col("rank") / col("__outdeg"), 6).as("__c"))
        .groupBy("node")
        .agg(sum(col("__c").cast("decimal(28,6)")).cast("double").as("__s"))
      val dangling = ranks
        .join(danglingNodes, Seq("node"), "left_semi")
        .agg(coalesce(sum(col("rank").cast("decimal(28,6)")),
          lit(java.math.BigDecimal.ZERO)).cast("double").as("__d"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          round(lit(0.15 / n) + lit(0.85) *
            (coalesce(col("__s"), lit(0.0)) + col("__d") / lit(n.toDouble)), 6)
            .as("rank"))
        .localCheckpoint(eager = false)
    }
    ranks
  }

  /** HITS (Kleinberg, JACM 1999): mutually-recursive hub/authority
    * scores over the distinct directed edges — the complementary
    * authority signal to [[pageRank]] (a good hub links to good
    * authorities; in crawl curation, hub quality ranks link DIRECTORIES
    * where PageRank ranks destinations).
    *
    * Fixed `iters` power iterations, authorities updated first from
    * hubs, hubs from the UPDATED authorities, each vector L2-normalized
    * per iteration. Same execution shape as pageRank (edge relation
    * checkpointed once, per-iteration score checkpoint, one-row norm
    * scalars broadcast) and the same round6/DECIMAL replay discipline —
    * sqrt is IEEE-exact in both engines, so norms replay too.
    *
    * @return (node, hub, auth), zero where a node has no out/in edges
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iters: Int = 3): DataFrame = {
    require(iters >= 1)
    val e = edges
      .select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"))
      .distinct()
      .localCheckpoint(eager = false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(eager = false)
    def dsum(c: Column) = sum(c.cast("decimal(28,6)")).cast("double")
    def normalized(raw: DataFrame, scoreCol: String): DataFrame = {
      val nrm = raw.agg(
        sqrt(dsum(round(col("__raw") * col("__raw"), 6))).as("__nrm"))
      nodes.join(raw, Seq("node"), "left")
        .crossJoin(broadcast(nrm))
        .select(col("node"),
          round(coalesce(col("__raw"), lit(0.0)) / col("__nrm"), 6)
            .as(scoreCol))
    }
    var hubs = nodes.withColumn("hub", lit(1.0)).localCheckpoint(eager = false)
    var auths: DataFrame = null
    for (_ <- 1 to iters) {
      val authRaw = e
        .join(hubs.select(col("node").as("src"), col("hub")), "src")
        .groupBy(col("dst").as("node")).agg(dsum(col("hub")).as("__raw"))
      auths = normalized(authRaw, "auth").localCheckpoint(eager = false)
      val hubRaw = e
        .join(auths.select(col("node").as("dst"), col("auth")), "dst")
        .groupBy(col("src").as("node")).agg(dsum(col("auth")).as("__raw"))
      hubs = normalized(hubRaw, "hub").localCheckpoint(eager = false)
    }
    nodes.join(hubs, "node").join(auths, "node")
      .select(col("node"), col("hub"), col("auth"))
  }
}
