package graft

import org.apache.spark.sql.functions._

class ApproxDistinctSpec extends SparkSpec {

  test("approx_count_distinct within its 2% error bound of exact distinct") {
    val li = Tables(spark, sfDir, "lineitem")
    val joined = SparkEntry.queries("a_approx_distinct")(spark, sfDir)
      .join(li.groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("exact_parts")), "l_returnflag")
      .collect()
    assert(joined.nonEmpty)
    for (r <- joined) {
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getAs[String]("l_returnflag")}: approx $approx vs exact $exact")
    }
  }

  test("approx_percentile quantiles bracket the exact interpolated ones") {
    val docs = Tables(spark, sfDir, "documents")
    val approx = SparkEntry.queries("a_approx_quantiles")(spark, sfDir)
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("p25"), r.getAs[Long]("p50"), r.getAs[Long]("p90")))
      .toMap
    val exact = docs.groupBy("lang").agg(
      percentile(col("n_chars"), lit(0.25)).as("e25"),
      percentile(col("n_chars"), lit(0.5)).as("e50"),
      percentile(col("n_chars"), lit(0.9)).as("e90"))
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Double]("e25"), r.getAs[Double]("e50"), r.getAs[Double]("e90")))
      .toMap
    assert(approx.keySet === exact.keySet)
    for ((lang, (a25, a50, a90)) <- approx) {
      val (e25, e50, e90) = exact(lang)
      // the sketch returns an OBSERVED value near the quantile; with
      // accuracy 1000 on these group sizes it must land within 10% of
      // the exact interpolated value (and exactly at it for most groups)
      assert(math.abs(a25 - e25) <= math.max(1.0, 0.10 * e25), s"$lang p25")
      assert(math.abs(a50 - e50) <= math.max(1.0, 0.10 * e50), s"$lang p50")
      assert(math.abs(a90 - e90) <= math.max(1.0, 0.10 * e90), s"$lang p90")
    }
  }
}
