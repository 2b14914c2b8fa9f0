package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class WeightedMeanAggregatorSpec extends SparkSpec {

  test("typed weighted mean equals the untyped sum/sum formulation") {
    import spark.implicits._
    val typed = Tables(spark, sfDir, "lineitem")
      .select(col("l_returnflag"),
        floor(col("l_extendedprice") * 100).cast("long").as("pc"),
        col("l_quantity").cast("long").as("qty"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(WeightedMeanAggregator.weightedMean.toColumn)
      .map { case (flag, (swx, sw, ppm)) => (flag, swx, sw, ppm) }
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val untyped = Tables(spark, sfDir, "lineitem")
      .select(col("l_returnflag"),
        floor(col("l_extendedprice") * 100).cast("long").as("pc"),
        col("l_quantity").cast("long").as("qty"))
      .groupBy("l_returnflag")
      .agg(sum(col("pc") * col("qty")).as("swx"), sum(col("qty")).as("sw"))
      .as[(String, Long, Long)]
      .collect()
      .map(r => r._1 -> ((r._2, r._3, (BigInt(r._2) * 1000000 / r._3).toLong)))
      .toMap
    assert(typed === untyped)
    assert(typed.nonEmpty)
  }

  test("negative weighted sums truncate toward zero like DuckDB's //") {
    import spark.implicits._
    // Σwx = -7, Σw = 3: trunc(-7000000/3) = -2333333 — DuckDB's `//`
    // truncates on negatives (-7 // 2 = -3, verified), as does Spark's
    // `div`; flooring here would hash-diverge by one
    val got = Seq(("g", -7L, 1L), ("g", 0L, 2L))
      .toDS()
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(WeightedMeanAggregator.weightedMean.toColumn)
      .collect().toMap
    assert(got === Map("g" -> ((-7L, 3L, -2333333L))))
  }

  test("zero-weight groups report (0, 0, 0), not a division failure") {
    import spark.implicits._
    val got = Seq(("g", 10L, 0L), ("g", 20L, 0L))
      .toDS()
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(WeightedMeanAggregator.weightedMean.toColumn)
      .collect().toMap
    assert(got === Map("g" -> ((0L, 0L, 0L))))
  }
}
