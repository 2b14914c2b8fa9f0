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
    assert(SparkEntry.queries.size === 344)
    assert(SparkEntry.oracleSql.size === 338)
  }

  test("rows-only keys (no oracle) are a deliberate, pinned set") {
    // Every key here is rows-only for a REASON recorded in SURVEY §2 —
    // after r16 replayed XXH64 itself in SQL (graft.XxhSql) and r17
    // promoted EVERY trained ANN tier via the exact-arithmetic k-means
    // (knn_ivf / knn_ivf_at_rest / knn_ivf_sq8 / knn_pq_adc / knn_ivf_pq
    // now carry full hash oracles; the float sampled-training paths
    // remain as operators with recall pins), what remains is genuinely
    // un-oracle-able: DataSketches serialized HLL/KLL estimator internals
    // (coupon/compaction modes — each with a green exact twin or pinned
    // error/merge laws; r17 promoted the deterministic CMS rollup, the
    // exact-mode theta overlap, AND Spark's own HLL++ — graft.HllSql
    // replays approx_count_distinct bit-for-bit, so only the
    // DataSketches-library rows remain; bpe_merges left too — the
    // 16-round head unroll extends to the full 50 trained rounds at
    // trivial oracle cost), the merge-order-dependent GK
    // quantile summaries (a_approx_quantiles),
    // the Jacobi eigensolve behind the green fixed-basis projection
    // twin, and zlib bytes (below). Adding a query WITHOUT an oracle
    // must be a deliberate edit here — the round-9 lesson was a registry
    // row silently reporting nothing.
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly === Set(
      "a_approx_quantiles",
      "a_quantile_sketch_rollup", "a_sketch_rollup",
      "emb_pca_project", "events_trailing_distinct_sketch",
      // zlib output bytes aren't pinned across builds; ordering laws
      // spec-pinned in TextAnalysisSpec
      "text_compress_ratio"))
  }

  test("every query name is a lowercase identifier (driver artifact-path safe)") {
    val bad = SparkEntry.queries.keySet.filterNot(_.matches("[a-z0-9_]+"))
    assert(bad === Set.empty[String])
  }
}
