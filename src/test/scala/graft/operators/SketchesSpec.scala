package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {

  test("rollup from the sketch table tracks exact distinct counts within HLL error") {
    val orders = Tables(spark, sfDir, "orders").select(
      col("o_orderstatus"),
      (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
        .cast("long").as("yyyymm"),
      col("o_custkey"))
    val path = Sketches.sketchTableFor(orders,
      Seq("o_orderstatus", "yyyymm"), "o_custkey",
      key = "spec-orders-sk", spark = spark)
    // roll the (status, month) sketches up to status alone — a SUBSET of
    // the sketch keys, answered purely from sketch merges
    val est = Sketches.distinctFromSketches(spark, path,
        Seq("o_orderstatus"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val exact = orders.groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (k, n) =>
      assert(math.abs(est(k) - n) <= math.max(2.0, 0.04 * n),
        s"$k: est=${est(k)} exact=$n")
    }
  }

  test("trailing-distinct sketch twin tracks the exact query within HLL error") {
    val exact = graft.SparkEntry.queries("events_trailing_distinct")(
        spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val approx = graft.SparkEntry.queries(
        "events_trailing_distinct_sketch")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (day, n) =>
      assert(math.abs(approx(day) - n) <= math.max(2.0, 0.05 * n),
        s"day $day: approx=${approx(day)} exact=$n")
    }
  }

  test("sketches of disjoint batches union to the whole-input sketch (incremental maintenance)") {
    import spark.implicits._
    val rows = (1 to 20000).map(i => ("g", (i % 7013).toLong)).toDF("g", "v")
    val whole = Sketches.sketchTable(rows, Seq("g"), "v")
      .select(hll_sketch_estimate(col("sketch")).cast("double")).as[Double].head()
    val halves = Sketches.sketchTable(rows.where($"v" % 2 === 0),
        Seq("g"), "v")
      .unionByName(Sketches.sketchTable(rows.where($"v" % 2 =!= 0),
        Seq("g"), "v"))
      .groupBy("g")
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false)))
        .as("e"))
      .select(col("e").cast("double")).as[Double].head()
    // disjoint-batch union is the incremental-ingest path; estimates
    // must agree closely (reps differ only in union internals)
    assert(math.abs(whole - halves) <= math.max(2.0, 0.01 * whole),
      s"whole=$whole halves=$halves")
  }
}
