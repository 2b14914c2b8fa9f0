package graft.operators

import graft.SparkSpec

class RankingSpec extends SparkSpec {

  test("globalRowNumbers: contiguous 0-based seq in key order, any input partitioning") {
    import spark.implicits._
    // deliberately scrambled input across many partitions
    val df = (0L until 5000L).map(i => (i * 2654435761L) % 100003L)
      .distinct.toDF("k").repartition(17)
    val got = Ranking.globalRowNumbers(df, Seq("k"))
      .as[(Long, Long)].collect().sortBy(_._2)
    val keys = got.map(_._1)
    assert(got.map(_._2).toSeq === got.indices.map(_.toLong)) // contiguous
    assert(keys.toSeq === keys.sorted.toSeq) // seq follows key order
    assert(keys.length === df.count())
  }

  test("globalRowNumbers refuses a colliding output column") {
    import spark.implicits._
    val df = Seq(1L).toDF("seq")
    intercept[IllegalArgumentException] {
      Ranking.globalRowNumbers(df, Seq("seq"))
    }
  }

  test("exactPercentiles matches brute-force nearest-rank selection") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map(i =>
      (s"g${i % 3}", i.toLong, rnd.nextInt(40).toLong))
    val ps = Seq(1, 25, 50, 90, 99, 100)
    val got = Ranking.exactPercentiles(
      rows.toDF("g", "id", "v").repartition(13),
      "v", groupCols = Seq("g"), ps = ps)
      .as[(String, Long, Long, Long)].collect()
      .map { case (g, p, v, n) => (g, p) -> ((v, n)) }.toMap
    val brute = rows.groupBy(_._1).flatMap { case (g, xs) =>
      val sorted = xs.map(_._3).sorted
      val n = sorted.length.toLong
      ps.map { p =>
        val rank = math.max(1L, (p * n + 99) / 100) // ceil(p*n/100)
        (g, p.toLong) -> ((sorted((rank - 1).toInt), n))
      }
    }
    assert(got === brute)
    // p=100 is the max, p small on a big group is the min's neighborhood
    assert(got.keySet.size === 3 * ps.size)
  }

  test("percentileRanks: min 0, max 1e6, monotone; singletons pin to 0") {
    import spark.implicits._
    val df = ((1 to 11).map(i => ("g", i.toLong, (i * 7 % 11).toLong)) :+
      (("solo", 99L, 5L))).toDF("g", "id", "v").repartition(5)
    val got = Ranking.percentileRanks(df, "v", Seq("g"), Seq("id"))
      .as[(String, Long, Long, Long)].collect()
    val grp = got.filter(_._1 == "g").sortBy(_._3)
    // 11 distinct values -> ranks 0..10 -> ppm i*100000
    assert(grp.map(_._4).toSeq === (0 to 10).map(_ * 100000L))
    assert(got.find(_._1 == "solo").get._4 === 0L)
  }

  test("exactPercentiles: n=1 groups pin every percentile to the value") {
    import spark.implicits._
    val got = Ranking.exactPercentiles(
      Seq(("a", 1L, 42L)).toDF("g", "id", "v"),
      "v", Seq("g"), Seq(1, 50, 100))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(("a", 1L, 42L, 1L), ("a", 50L, 42L, 1L),
      ("a", 100L, 42L, 1L)))
  }

  test("winsorizedMean: planted outliers clamp to the exact decile cuts") {
    import spark.implicits._
    // group g: values 1..10 -> p10 cut = value at rank 1 = 1, p90 cut =
    // value at rank 9 = 9; the 10 clamps to 9: wsum = 55 - 10 + 9 = 54
    val g = (1 to 10).map(i => ("g", i.toLong, i.toLong))
    // group h: extreme outliers on both sides clamp to the cuts
    // values: -1000, 2, 3, ..., 9, 1000 (n = 10)
    // p10 -> rank 1 = -1000 stays its own cut; p90 -> rank 9 = 9
    val h = Seq(("h", 100L, -1000L)) ++
      (2 to 9).map(i => ("h", 100L + i, i.toLong)) ++ Seq(("h", 111L, 1000L))
    val got = Ranking.winsorizedMean(
      (g ++ h).toDF("g", "id", "v").repartition(7),
      "v", Seq("g"), loP = 10, hiP = 90)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got("g") === ((10L, 1L, 9L, 54L, 5400000L)))
    // h: wsum = -1000 + (2..9).sum + 9 = -1000 + 44 + 9 = -947
    // mean_ppm truncates toward zero: -947*1e6 div 10 = -94700000
    assert(got("h") === ((10L, -1000L, 9L, -947L, -94700000L)))
  }

  test("ntileScores: even spread, exact boundaries, partition-invariant") {
    import spark.implicits._
    // 8 rows, k=4 -> exactly 2 per bucket; score = seq*4 div 8 + 1
    val df = (0L until 8L).map(i => (i, i * 3 % 8)).toDF("id", "v")
    val got = Ranking.ntileScores(df.repartition(5), Seq("v", "id"), 4,
      "q").as[(Long, Long, Long)].collect().map(r => r._2 -> r._3).toMap
    assert(got === (0L until 8L).map(v => v -> (v / 2 + 1)).toMap)
    // 5 rows, k=4: the formula spreads the remainder evenly
    // (seq*4 div 5) + 1 for seq 0..4 -> 1, 1, 2, 3, 4
    val odd = Ranking.ntileScores(
      (0L until 5L).toDF("v").repartition(3), Seq("v"), 4, "q")
      .as[(Long, Long)].collect().toMap
    assert(odd === Map(0L -> 1L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }

  test("weightedMedian: half-weight selection, tie runs cannot flip it") {
    import spark.implicits._
    // g: values 1 (w 1), 2 (w 1), 3 (w 10) -> tot 12, half 6: cum at
    // v=3 end = 12 >= 6, at v=2 end = 2 < 6 -> median 3
    // h: equal-weight 1..4 -> tot 4: cum(2) = 2, 2*2 >= 4 -> median 2
    // (the lower of the middle pair, matching the exact-median rule)
    // t: a tie RUN at the boundary - values 5,5,5 (w 1 each) + 1 (w 3):
    // tot 6, half 3: cum at v=1 end = 3, 2*3 >= 6 -> median 1
    val df = Seq(
      ("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 10L),
      ("h", 1L, 1L), ("h", 2L, 1L), ("h", 3L, 1L), ("h", 4L, 1L),
      ("t", 5L, 1L), ("t", 5L, 1L), ("t", 5L, 1L), ("t", 1L, 3L))
      .toDF("g", "v", "w").repartition(7)
    val got = Ranking.weightedMedian(df, "v", "w", Seq("g"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map("g" -> ((3L, 12L)), "h" -> ((2L, 4L)),
      "t" -> ((1L, 6L))))
  }

  test("NULL group keys are kept by every order statistic (the " +
    "statistics joins are null-safe, matching a window's behavior)") {
    import spark.implicits._
    val df = Seq((Some("a"), 1L, 1L), (Some("a"), 2L, 2L),
      (None, 3L, 5L), (None, 4L, 7L)).toDF("g", "id", "v")
    val pct = Ranking.exactPercentiles(df, "v", Seq("g"), Seq(50, 100))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(pct((None, 50L)) === ((5L, 2L)) &&
      pct((None, 100L)) === ((7L, 2L)))
    assert(pct((Some("a"), 50L)) === ((1L, 2L)))
    val ranks = Ranking.percentileRanks(df, "v", Seq("g"), Seq("id"))
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(ranks(3L) === 0L && ranks(4L) === 1000000L)
    val wm = Ranking.weightedMedian(
      df.withColumn("w", org.apache.spark.sql.functions.lit(1L)),
      "v", "w", Seq("g"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(wm(None) === 5L && wm(Some("a")) === 1L)
    val ws = Ranking.winsorizedMean(df, "v", Seq("g"), loP = 50, hiP = 100)
      .collect().map(r => Option(r.getString(0)) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(ws(None) === ((2L, 5L, 7L, 12L)))
  }

  test("weightedMedian: NULL weights contribute nothing, matching the " +
    "window form's sum-skips-nulls behavior") {
    import spark.implicits._
    val df = Seq(("g", 1L, Some(1L)), ("g", 2L, None), ("g", 3L, Some(3L)))
      .toDF("g", "v", "w")
    val got = Ranking.weightedMedian(df, "v", "w", Seq("g"))
      .as[(String, Long, Long)].collect()
    assert(got.toSeq === Seq(("g", 3L, 4L)))
  }

  test("weightedMedian: a negative weight raises loudly instead of " +
    "silently corrupting downstream groups' offsets") {
    import spark.implicits._
    val df = Seq(("a", 1L, 2L), ("b", 2L, -1L), ("c", 3L, 4L))
      .toDF("g", "v", "w")
    val e = intercept[Exception] {
      Ranking.weightedMedian(df, "v", "w", Seq("g")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("negative weight")))
  }
}
