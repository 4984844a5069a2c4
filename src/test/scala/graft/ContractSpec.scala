package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: the correctness gate is only as strong
  * as its coverage, so EVERY declared query must carry a DuckDB oracle
  * — a new operator landing without one silently downgrades its gate to
  * rows-only, which this spec turns into a build failure.
  */
class ContractSpec extends AnyFunSuite {

  /** The one deliberate exception: zlib has no DuckDB twin, so the
    * compression-ratio gate is rows-only BY DESIGN (values pinned by
    * ScalaTest ordering/determinism properties instead). Growing this
    * set is a design decision, not an accident — hence the explicit
    * allowlist.
    */
  private val rowsOnlyByDesign = Set("q_compress_ratio")

  test("every query has an oracle; no orphan oracle entries") {
    val queries = SparkEntry.queries.keySet -- rowsOnlyByDesign
    val oracles = SparkEntry.oracleSql.keySet
    assert((queries -- oracles).isEmpty,
      s"queries missing an oracle: ${(queries -- oracles).toSeq.sorted.mkString(", ")}")
    assert((oracles -- queries).isEmpty,
      s"oracles without a query: ${(oracles -- queries).toSeq.sorted.mkString(", ")}")
  }

  test("query names are unique across the five def maps") {
    val maps = Seq(queries.Relational.defs, queries.TsaQueries.defs,
      queries.TrainQueries.defs, queries.PipelineQueries.defs,
      queries.CurationQueries.defs)
    val total = maps.map(_.size).sum
    assert(maps.flatMap(_.keys).distinct.size == total,
      "duplicate query name across Relational/TsaQueries/TrainQueries/PipelineQueries/CurationQueries")
  }
}
