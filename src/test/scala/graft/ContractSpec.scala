package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: the correctness gate is only as strong
  * as its coverage, so EVERY declared query must carry a DuckDB oracle
  * — a new operator landing without one silently downgrades its gate to
  * rows-only, which this spec turns into a build failure.
  */
class ContractSpec extends AnyFunSuite {

  test("every query has an oracle; no orphan oracle entries") {
    val queries = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet
    assert((queries -- oracles).isEmpty,
      s"queries missing an oracle: ${(queries -- oracles).toSeq.sorted.mkString(", ")}")
    assert((oracles -- queries).isEmpty,
      s"oracles without a query: ${(oracles -- queries).toSeq.sorted.mkString(", ")}")
  }

  test("query names are unique across the three def maps") {
    val maps = Seq(queries.Relational.defs, queries.TsaQueries.defs,
      queries.TrainQueries.defs)
    val total = maps.map(_.size).sum
    assert(maps.flatMap(_.keys).distinct.size == total,
      "duplicate query name across Relational/TsaQueries/TrainQueries")
  }
}
