package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pure inventory invariants over [[SparkEntry]] — the contract that keeps
  * the driver's correctness artifact free of oracle-less rows (VERDICT r6
  * #2). No SparkSession needed: these are map-shape checks only.
  */
class EntryInventorySpec extends AnyFunSuite {

  test("every benchOnly name is a real query") {
    val missing = SparkEntry.benchOnly -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"benchOnly names without a query: $missing")
  }

  test("every benchOnly name has a hash-gated _contract sibling with an oracle") {
    val noSibling = SparkEntry.benchOnly
      .filterNot(n => SparkEntry.queries.contains(s"${n}_contract"))
    assert(noSibling.isEmpty, s"benchOnly without _contract sibling: $noSibling")
    val noOracle = SparkEntry.benchOnly
      .filterNot(n => SparkEntry.oracleSql.contains(s"${n}_contract"))
    assert(noOracle.isEmpty, s"_contract sibling without oracle: $noOracle")
  }

  test("every verified query (non-benchOnly) has an oracle — 0 err rows by construction") {
    val unOracled = SparkEntry.queries.keySet -- SparkEntry.benchOnly --
      SparkEntry.oracleSql.keySet
    assert(unOracled.isEmpty,
      s"queries Verify will dump without an oracle (driver would record err): $unOracled")
  }

  test("every oracle points at a real query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracleSql entries without a query: $dangling")
  }

  test("benchOnly names are never _contract rows themselves") {
    assert(SparkEntry.benchOnly.forall(!_.endsWith("_contract")))
  }
}
