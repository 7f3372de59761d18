package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-contract wiring itself: names only, no Spark session.
  * A queries entry without an oracle silently downgrades that operator
  * to a rows-only check at the correctness gate; a Bench.Headline name
  * absent from queries records a fake error marker in the round bench.
  * Both are config drift a query-level test can't catch.
  */
class DriverContractSpec extends AnyFunSuite {

  test("every query carries an oracle and every oracle names a query (zero rows-only paths)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  test("every Bench headline name is a registered query") {
    val missing = Bench.Headline.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"headline names not in queries: $missing")
  }

  test("headline has no duplicates") {
    val dups = Bench.Headline.groupBy(identity).collect { case (n, xs) if xs.size > 1 => n }
    assert(dups.isEmpty, s"duplicated headline names: $dups")
  }
}
