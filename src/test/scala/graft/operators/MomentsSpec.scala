package graft.operators

import graft.SparkSpec

class MomentsSpec extends SparkSpec {

  test("covMatrix: hand-computed 2x2 including a negative covariance") {
    import spark.implicits._
    // x = (1,2,3,4), y = (8,6,4,1): n=4, Σx=10, Σy=19, Σxy=1*8+2*6+3*4+4*1=36
    // cov_xy = (4*36 - 10*19) / 12 = -46/12 -> trunc toward zero = -3
    // var_x = (4*30 - 100)/12 = 20/12 -> 1; var_y = (4*117 - 361)/12 = 107/12 -> 8
    val df = Seq((1L, 8L), (2L, 6L), (3L, 4L), (4L, 1L)).toDF("x", "y")
    val got = Moments.covMatrix(df, Seq("x", "y"))
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got(("x", "x")) === (("x", "x", 4L, 10L, 10L, 1L)))
    assert(got(("x", "y")) === (("x", "y", 4L, 10L, 19L, -3L)))
    assert(got(("y", "y")) === (("y", "y", 4L, 19L, 19L, 8L)))
    assert(got.size === 3)
  }

  test("covMatrix: single scan — exactly one aggregate over the input") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, (i * 7 % 13).toLong, (i % 5).toLong))
      .toDF("a", "b", "c")
    val plan = Moments.covMatrix(df, Seq("a", "b", "c"))
      .queryExecution.executedPlan.toString
    // one HashAggregate pair (partial+final), not one per pair of columns
    val nAggs = "HashAggregate".r.findAllIn(plan).length
    assert(nAggs <= 2, s"expected one partial+final aggregate, got:\n$plan")
  }

  test("covMatrix: diagonal equals the exact variance formula") {
    import spark.implicits._
    val xs = (1 to 57).map(i => (i * 31 % 101).toLong)
    val df = xs.map(x => (x, x)).toDF("x", "y")
    val n = xs.length.toLong
    val sx = xs.sum
    val sxx = xs.map(x => x * x).sum
    val expected = (n * sxx - sx * sx) / (n * (n - 1))
    val got = Moments.covMatrix(df, Seq("x", "y"))
      .where("var_x = 'x' and var_y = 'x'")
      .select("cov").as[Long].collect().head
    assert(got === expected)
  }
}
