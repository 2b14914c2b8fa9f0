package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class RuntimeFiltersSpec extends SparkSpec {

  test("bloom-filtered join equals the plain join, probe is codegen'd") {
    val li = Tables(spark, sfDir, "lineitem")
    val hi = Tables(spark, sfDir, "orders")
      .where(col("o_totalprice") > 250000.0)
    assert(hi.count() > 0, "dim side must be non-empty")
    val got = RuntimeFilters.bloomFilteredJoin(
      li, hi, "l_orderkey", "o_orderkey", expectedItems = 100000L)
    val plain = li.join(hi, col("l_orderkey") === col("o_orderkey"))
    val key = Seq("l_orderkey", "l_linenumber")
    assert(got.select(key.map(col): _*)
      .exceptAll(plain.select(key.map(col): _*)).isEmpty)
    assert(plain.select(key.map(col): _*)
      .exceptAll(got.select(key.map(col): _*)).isEmpty)
    // the Bloom probe must sit in the executed plan (a Filter the plain
    // join doesn't have), as Spark's own codegen'd predicate
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(2000))
  }

  test("bloom pre-filter prunes most non-matching fact rows, never matching ones") {
    val li = Tables(spark, sfDir, "lineitem")
    val hi = Tables(spark, sfDir, "orders")
      .where(col("o_totalprice") > 250000.0)
    val bytes = RuntimeFilters.buildKeyBloom(hi, "o_orderkey", 100000L, 0.01)
    // megabyte-class state: broadcastable
    assert(RuntimeFilters.bloomBitSize(bytes) / 8 < 2 * 1024 * 1024)
    val kept = li.where(
      RuntimeFilters.bloomMightContain(bytes, col("l_orderkey")))
    // no false negatives: every matching row survives the pre-filter
    val matching = li.join(hi, col("l_orderkey") === col("o_orderkey")).count()
    assert(kept.join(hi, col("l_orderkey") === col("o_orderkey")).count()
      === matching)
    // selectivity: the dim keeps a small fraction of orders, so the
    // Bloom pass must drop the bulk of lineitem before any shuffle
    val total = li.count()
    val keptN = kept.count()
    assert(keptN < total / 2,
      s"expected pruning, kept $keptN of $total")
  }
}
