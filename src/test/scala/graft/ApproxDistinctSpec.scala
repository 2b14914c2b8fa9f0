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
}
