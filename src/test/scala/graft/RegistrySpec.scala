package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural pins for the query registry after its split across
  * `SparkEntry` (plans) and `SparkEntryOracles` (DuckDB SQL twins): the
  * split must never drop or orphan an entry. Pure map checks — no Spark. */
class RegistrySpec extends AnyFunSuite {

  test("every oracle key names a registered query (no orphaned oracles)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans === Set.empty[String])
  }

  test("registry counts are pinned (an accidental drop in a refactor fails loudly)") {
    // update BOTH literals deliberately when adding/removing queries
    assert(SparkEntry.queries.size === 261)
    assert(SparkEntry.oracleSql.size === 237)
  }

  test("every query name is a lowercase identifier (driver artifact-path safe)") {
    val bad = SparkEntry.queries.keySet.filterNot(_.matches("[a-z0-9_]+"))
    assert(bad === Set.empty[String])
  }
}
