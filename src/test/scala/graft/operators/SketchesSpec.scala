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

  // ---- KLL quantile sketches ----

  /** Normalized rank error for k=200 (two-sided, 99% confidence). */
  private val kllEps =
    org.apache.datasketches.kll.KllSketch.getNormalizedRankError(200, false)

  test("KLL quantile rollup tracks exact ranks within the sketch's rank error") {
    val got = graft.SparkEntry.queries("a_quantile_sketch_rollup")(
        spark, sfDir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    val li = Tables(spark, sfDir, "lineitem")
      .select(col("l_returnflag"),
        floor(col("l_extendedprice") * 100).cast("double").as("pc"))
    val vals = li.collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    assert(got.keySet === vals.keySet)
    val targets = Seq(0.5, 0.95, 0.99)
    vals.foreach { case (flag, sorted) =>
      val (n, quantiles) = got(flag)
      assert(n === sorted.length.toLong,
        s"$flag: sketch n=$n exact=${sorted.length}")
      targets.zip(quantiles).foreach { case (p, est) =>
        // exact INCLUSIVE rank of the estimated value must sit within
        // the sketch's ε of the requested rank (the KLL guarantee —
        // holds under the build + rollup merge tree)
        val exactRank =
          sorted.count(_ <= est).toDouble / sorted.length
        assert(math.abs(exactRank - p) <= 3 * kllEps,
          s"$flag p=$p: est=$est exactRank=$exactRank eps=$kllEps")
      }
    }
  }

  test("KLL n is conserved exactly under any merge tree; disjoint batches merge to the whole") {
    import spark.implicits._
    val rows = (1 to 50000)
      .map(i => ("g", ((i * 2654435761L) % 100000).toDouble)).toDF("g", "v")
    val whole = Sketches.quantileSketchTable(rows, Seq("g"), "v")
    val halves = Sketches
      .quantileSketchTable(rows.where($"v" % 2 === 0), Seq("g"), "v")
      .unionByName(Sketches.quantileSketchTable(
        rows.where($"v" % 2 =!= 0), Seq("g"), "v"))
      .groupBy("g").agg(Sketches.kllMergeAgg(col("qsketch")).as("qsketch"))
    def stats(df: org.apache.spark.sql.DataFrame): (Long, Double, Double) =
      df.select(Sketches.kllN(col("qsketch")),
          Sketches.kllQuantile(col("qsketch"), 0.5),
          Sketches.kllQuantile(col("qsketch"), 0.99))
        .as[(Long, Double, Double)].head()
    val (nW, p50W, p99W) = stats(whole)
    val (nH, p50H, p99H) = stats(halves)
    assert(nW === 50000L && nH === 50000L) // exact conservation law
    // both sketches bound the SAME exact distribution: estimates agree
    // within twice the one-sketch rank error, translated through the
    // near-uniform value domain (100k distinct values)
    assert(math.abs(p50W - p50H) <= 4 * kllEps * 100000,
      s"p50 whole=$p50W halves=$p50H")
    assert(math.abs(p99W - p99H) <= 4 * kllEps * 100000,
      s"p99 whole=$p99W halves=$p99H")
  }

  test("KLL functions are callable from SQL text and rank is the quantile inverse") {
    import spark.implicits._
    graft.functions.GraftSql.register(spark)
    (1 to 10000).map(i => ("g", i.toDouble)).toDF("g", "v")
      .createOrReplaceTempView("kll_in")
    val row = spark.sql(
      """SELECT kll_sketch_n(sk) AS n,
        |       kll_quantile(sk, 0.5d) AS p50,
        |       kll_rank(sk, kll_quantile(sk, 0.5d)) AS r50
        |FROM (SELECT kll_merge_agg(sk, 200) AS sk
        |      FROM (SELECT g, kll_sketch_agg(v, 200) AS sk
        |            FROM kll_in GROUP BY g))""".stripMargin)
      .as[(Long, Double, Double)].head()
    assert(row._1 === 10000L)
    assert(math.abs(row._2 - 5000.0) <= 3 * kllEps * 10000,
      s"p50=${row._2}")
    // INCLUSIVE rank of the INCLUSIVE quantile returns (close to) the
    // requested rank on a distinct-valued stream
    assert(math.abs(row._3 - 0.5) <= 3 * kllEps, s"r50=${row._3}")
  }

  // ---- theta sketches (set algebra: intersect / A-not-B) ----

  test("theta overlap matrix equals the exact twin while sketches are in exact mode") {
    // distinct users per segment at test scale is far below k = 2^12, so
    // every sketch — and every Intersection/AnotB of them — is in EXACT
    // mode: the matrix must match the presence-table twin row for row
    def rows(name: String): Map[(String, String), (Long, Long)] =
      graft.SparkEntry.queries(name)(spark, sfDir).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
    val exact = rows("events_user_overlap")
    val sk = rows("events_user_overlap_sketch")
    assert(sk === exact)
  }

  test("theta set ops are exact below k and inside the error bound above it") {
    import spark.implicits._
    // |A| = 30k, |B| = 30k, |A ∩ B| = 10k — far above k = 2^12, so the
    // sketches are in estimation mode and the ~1/sqrt(k) RSE law applies
    val a = (1L to 30000L).toDF("v").select(lit("a").as("g"), col("v"))
    val b = (20001L to 50000L).toDF("v").select(lit("b").as("g"), col("v"))
    val sk = a.unionByName(b).groupBy("g")
      .agg(Sketches.thetaSketchAgg(col("v")).as("sk"))
      .groupBy()
      .agg(min(when(col("g") === "a", col("sk"))).as("ska"),
        min(when(col("g") === "b", col("sk"))).as("skb"))
    val (both, aOnly) = sk.select(
        Sketches.thetaEstimate(
          Sketches.thetaIntersect(col("ska"), col("skb"))),
        Sketches.thetaEstimate(Sketches.thetaAnotB(col("ska"), col("skb"))))
      .as[(Double, Double)].head()
    // intersection/AnotB error compounds both operands' theta: allow 5x
    // the single-sketch RSE (1/sqrt(4096) ~ 1.6%)
    val tol = 5.0 / math.sqrt(4096)
    assert(math.abs(both - 10000) <= tol * 30000, s"both=$both")
    assert(math.abs(aOnly - 20000) <= tol * 30000, s"aOnly=$aOnly")
  }

  test("theta sketches of disjoint batches union to the whole; SQL surface round-trips") {
    import spark.implicits._
    graft.functions.GraftSql.register(spark)
    (1L to 20000L).map(v => ("g", v)).toDF("g", "v")
      .createOrReplaceTempView("theta_in")
    // exact mode end to end (20k distinct < 2^15): the halves must union
    // to EXACTLY the whole count, and estimates are exact integers
    val est = spark.sql(
      """SELECT theta_estimate(graft_theta_union_agg(sk, 15)) AS e
        |FROM (SELECT graft_theta_sketch_agg(v, 15) AS sk
        |      FROM theta_in WHERE v % 2 = 0 GROUP BY g
        |      UNION ALL
        |      SELECT graft_theta_sketch_agg(v, 15) AS sk
        |      FROM theta_in WHERE v % 2 = 1 GROUP BY g)""".stripMargin)
      .as[Double].head()
    assert(est === 20000.0, s"est=$est")
  }

  test("CMS never undercounts and stays inside e/width·N on real keys; " +
    "n is exact") {
    import spark.implicits._
    val li = Tables(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"), col("l_partkey"))
    val path = Sketches.cmsTableFor(li,
      Seq("l_returnflag", "l_linestatus"), "l_partkey",
      key = "spec-li-cms", spark = spark)
    val probes = (1L to 40L)
    val est = Sketches.frequenciesFromSketches(spark, path,
        Seq("l_returnflag"), probes)
      .select(col("l_returnflag"), col("probe_key"), col("n"),
        col("est_count"))
      .as[(String, Long, Long, Long)].collect()
    val exact = li.where(col("l_partkey").isin(probes: _*))
      .groupBy("l_returnflag", "l_partkey").count()
      .as[(String, Long, Long)].collect()
      .map { case (f, k, c) => (f, k) -> c }.toMap
    val totals = li.groupBy("l_returnflag").count()
      .as[(String, Long)].collect().toMap
    assert(est.nonEmpty)
    est.foreach { case (f, k, n, e) =>
      val t = exact.getOrElse((f, k), 0L)
      assert(e >= t, s"($f,$k): est $e undercounts true $t")
      assert(n === totals(f), s"($f): n $n != ${totals(f)}")
      // deterministic measured bound: the classic e/width·N slack
      val slack = math.ceil(2.7182818 / 2048.0 * totals(f)).toLong
      assert(e - t <= slack, s"($f,$k): est $e true $t slack $slack")
    }
  }

  test("CMS merge is EXACT: disjoint halves merge to the byte-identical " +
    "whole-input sketch, in the DSL and from SQL text") {
    import spark.implicits._
    val df = (1L to 30000L).map(v => ("g", v % 997)).toDF("g", "k")
    val whole = df.groupBy("g")
      .agg(Sketches.cmsSketchAgg(col("k"), 4, 512).as("sk"))
      .select("sk").as[Array[Byte]].head()
    val halves = df.where(col("k") % 2 === 0)
      .groupBy("g").agg(Sketches.cmsSketchAgg(col("k"), 4, 512).as("sk"))
      .unionByName(df.where(col("k") % 2 === 1)
        .groupBy("g").agg(Sketches.cmsSketchAgg(col("k"), 4, 512).as("sk")))
    val merged = halves.agg(Sketches.cmsMergeAgg(col("sk"), 4, 512).as("m"))
      .select("m").as[Array[Byte]].head()
    assert(java.util.Arrays.equals(whole, merged))
    // SQL surface round-trips and the estimate of a known-count key is
    // >= truth (k=7 occurs ceil/floor of 30000/997 times)
    df.createOrReplaceTempView("cms_in")
    val (n, e) = spark.sql(
      """SELECT cms_sketch_n(m), cms_estimate(m, CAST(7 AS BIGINT)) FROM (
        |  SELECT cms_merge_agg(sk, 4, 512) AS m FROM (
        |    SELECT cms_sketch_agg(k, 4, 512) AS sk FROM cms_in GROUP BY g))
        |""".stripMargin).as[(Long, Long)].head()
    assert(n === 30000L)
    val truth = df.where(col("k") === 7).count()
    assert(e >= truth && e <= truth + math.ceil(2.72 / 512 * 30000).toLong)
  }

  test("bitmap rollup is EXACTLY count(DISTINCT); disjoint OR-merge " +
    "equals the whole; SQL surface round-trips") {
    import spark.implicits._
    val orders = Tables(spark, sfDir, "orders").select(
      col("o_orderstatus"),
      (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
        .cast("long").as("yyyymm"),
      col("o_custkey"))
    val path = Sketches.bitmapTableFor(orders,
      Seq("o_orderstatus", "yyyymm"), "o_custkey",
      key = "spec-orders-bm", spark = spark)
    val got = Sketches.distinctFromBitmaps(spark, path, Seq("o_orderstatus"))
      .as[(String, Long)].collect().toMap
    val exact = orders.groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got === exact) // EXACT, not within-error
    // disjoint halves OR to the whole count; SQL text works
    (1L to 9999L).map(v => ("g", v * 7 % 5000)).toDF("g", "k")
      .createOrReplaceTempView("bm_in")
    val whole = spark.sql(
      """SELECT graft_bitmap_count(graft_bitmap_or_agg(bm)) FROM (
        |  SELECT bitmap_agg(k) AS bm FROM bm_in WHERE k % 2 = 0 GROUP BY g
        |  UNION ALL
        |  SELECT bitmap_agg(k) AS bm FROM bm_in WHERE k % 2 = 1 GROUP BY g)
        |""".stripMargin).as[Long].head()
    val direct = spark.sql(
      "SELECT count(DISTINCT k) FROM bm_in").as[Long].head()
    assert(whole === direct)
  }

  test("CMS inner product never undercounts the true join size and stays " +
    "inside the e/width * Na * Nb slack") {
    import spark.implicits._
    val li = Tables(spark, sfDir, "lineitem")
    val ord = Tables(spark, sfDir, "orders")
    val w = 65536
    val a = li.groupBy()
      .agg(Sketches.cmsSketchAgg(col("l_orderkey"), 4, w).as("a"))
    val b = ord.groupBy()
      .agg(Sketches.cmsSketchAgg(col("o_orderkey"), 4, w).as("b"))
    val est = a.crossJoin(broadcast(b))
      .select(Sketches.cmsInnerProduct(col("a"), col("b")).as("e"))
      .as[Long].head()
    val truth = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
    val na = li.count(); val nb = ord.count()
    assert(est >= truth, s"est $est undercounts true $truth")
    val slack = math.ceil(2.7182818 / w * na * nb).toLong
    assert(est - truth <= slack, s"est $est true $truth slack $slack")
  }

  test("HLL++ register rollup EQUALS direct approx_count_distinct " +
    "(slot maxes commute with the rollup)") {
    import spark.implicits._
    val orders = Tables(spark, sfDir, "orders").select(
      col("o_orderstatus"),
      (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
        .cast("long").as("yyyymm"),
      col("o_custkey"))
    val path = Sketches.hllppSketchTableFor(orders,
      Seq("o_orderstatus", "yyyymm"), "o_custkey",
      key = "spec-orders-hpp", spark = spark)
    val rolled = Sketches.distinctFromHllpp(spark, path,
        Seq("o_orderstatus"))
      .as[(String, Long)].collect().toMap
    // NOT within-error: the merged registers are bitwise the registers
    // of a direct per-status build, so the estimates are IDENTICAL
    val direct = orders.groupBy("o_orderstatus")
      .agg(approx_count_distinct(col("o_custkey"), 0.02).as("n"))
      .as[(String, Long)].collect().toMap
    assert(rolled === direct)
    // and inside the 2% rsd envelope of the exact count (sanity that
    // identical != identically-wrong)
    val exact = orders.groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(rolled(k).toDouble - n) <= math.max(2.0, 0.05 * n),
        s"$k: est=${rolled(k)} exact=$n")
    }
  }

  test("HLL++ trailing-window union equals the direct aggregate over " +
    "the window's users and tracks the exact trailing distinct") {
    import spark.implicits._
    val windowed = graft.SparkEntry
      .queries("events_trailing_distinct_hllpp")(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    // direct: approx_count_distinct over each window's presence rows —
    // register max-merge over days must give the IDENTICAL estimate
    val pres = Tables(spark, sfDir, "events")
      .select(datediff(to_date(col("ts")), lit("1970-01-01"))
        .cast("long").as("day"), col("user_id")).distinct()
    val days = pres.select(col("day").as("d")).distinct()
    val direct = pres.join(broadcast(days),
        col("day").between(col("d") - 6, col("d")))
      .groupBy("d")
      .agg(approx_count_distinct(col("user_id"), 0.02).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(windowed === direct)
    val exact = pres.join(broadcast(days),
        col("day").between(col("d") - 6, col("d")))
      .groupBy("d").agg(countDistinct(col("user_id")).as("n"))
      .as[(Long, Long)].collect().toMap
    exact.foreach { case (d, n) =>
      assert(math.abs(windowed(d).toDouble - n) <= math.max(2.0, 0.05 * n),
        s"day $d: est=${windowed(d)} exact=$n")
    }
  }

  test("HLL++ merge is EXACT: disjoint halves merge to the " +
    "byte-identical whole-input registers, in the DSL and from SQL") {
    import spark.implicits._
    val df = (1L to 30000L).map(v => ("g", v * 2654435761L % (1L << 40)))
      .toDF("g", "k")
    val whole = df.groupBy("g")
      .agg(Sketches.hllppSketchAgg(col("k")).as("sk"))
      .select("sk").as[Array[Byte]].head()
    val halves = df.where(col("k") % 2 === 0)
      .groupBy("g").agg(Sketches.hllppSketchAgg(col("k")).as("sk"))
      .unionByName(df.where(col("k") % 2 === 1)
        .groupBy("g").agg(Sketches.hllppSketchAgg(col("k")).as("sk")))
    val merged = halves.agg(Sketches.hllppMergeAgg(col("sk")).as("m"))
      .select("m").as[Array[Byte]].head()
    assert(java.util.Arrays.equals(whole, merged))
    // SQL surface round-trips and equals the built-in aggregate
    df.createOrReplaceTempView("hpp_in")
    val viaSketch = spark.sql(
      """SELECT hllpp_estimate(hllpp_merge_agg(sk, 0.02), 0.02) FROM (
        |  SELECT hllpp_sketch_agg(k, 0.02) AS sk FROM hpp_in GROUP BY g)
        |""".stripMargin).as[Long].head()
    val builtin = spark.sql(
      "SELECT approx_count_distinct(k, 0.02) FROM hpp_in").as[Long].head()
    assert(viaSketch === builtin)
  }
}
