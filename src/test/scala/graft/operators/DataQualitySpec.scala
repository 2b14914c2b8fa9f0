package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DataQualitySpec extends SparkSpec {

  import DataQuality._

  test("report counts violations per rule in one pass") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", 10.0), (2L, null, 5.0), (3L, "  ", -1.0), (4L, "d", 200.0))
      .toDF("id", "name", "amount")
    val rep = report(df, Seq(
      Complete("name"),
      InRange("amount", 0, 100),
      Satisfies("id_positive", $"id" > 0)))
      .as[(String, Long, Long)].collect()
    assert(rep.forall(_._3 === 4L)) // n_rows on every rule row
    val got = rep.map(r => r._1 -> r._2).toMap
    assert(got("complete(name)") === 2L) // null + blank
    assert(got("in_range(amount,0.0,100.0)") === 2L) // -1 and 200
    assert(got("id_positive") === 0L)
  }

  test("identical rules can't alias each other's counters: duplicate names rejected") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "name")
    val e = intercept[IllegalArgumentException] {
      report(df, Seq(Complete("name"), Complete("name")))
    }
    assert(e.getMessage.contains("complete(name)"))
    // same-shape rules with distinct names still run in one pass
    val ok = report(df, Seq(
      Satisfies("id_pos", $"id" > 0), Satisfies("id_small", $"id" < 100)))
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(ok === Map("id_pos" -> 0L, "id_small" -> 0L))
  }

  test("duplicateKeys finds multi-occurring key tuples") {
    import spark.implicits._
    val df = Seq((1, "x"), (1, "x"), (2, "y"), (1, "z")).toDF("k1", "k2")
    val dups = duplicateKeys(df, Seq("k1", "k2"))
      .as[(Int, String, Long)].collect()
    assert(dups === Array((1, "x", 2L)))
  }

  test("driftReport: planted null-rate and distinct-count drift flagged, stable columns clear") {
    import spark.implicits._
    // side a: no nulls, 4 distinct cities; side b: half the city values
    // null (null-rate drift) and only 1 distinct city (distinct drift);
    // the id column is drift-free on both sides
    val a = (1L to 8L).map(i => (i, s"city${i % 4}")).toDF("id", "city")
    val b = (1L to 8L)
      .map(i => (i, if (i % 2 == 0) null else "city0")).toDF("id", "city")
    val got = DataQuality.driftReport(a, b, Seq("id", "city"))
      .select("column", "n_a", "n_null_a", "n_distinct_a", "n_b",
        "n_null_b", "n_distinct_b", "null_drift", "distinct_drift")
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("id") === (("id", 8L, 0L, 8L, 8L, 0L, 8L, 0L, 0L)))
    assert(got("city") === (("city", 8L, 0L, 4L, 8L, 4L, 1L, 1L, 1L)))
  }

  test("madOutliers: extreme values can't mask themselves; mad=0 groups are sharp") {
    import spark.implicits._
    // group a: tight cluster (100..104 x4 each) + one 100000 — the
    // extreme would inflate a std-dev toward self-acceptance, but
    // med=102, mad=1 and the extreme's deviation 99898 >> 3
    val a = (1 to 20).map(i => ("a", i.toLong, 100L + (i % 5))) ++
      Seq(("a", 99L, 100000L))
    // group b: constant — med 50, mad 0, zero deviations, zero flags
    val b = (1 to 10).map(i => ("b", 200L + i, 50L))
    // group c: near-constant — mad 0 makes ANY deviation an outlier
    val c = (1 to 9).map(i => ("c", 300L + i, 10L)) ++ Seq(("c", 399L, 11L))
    val got = DataQuality.madOutliers(
      (a ++ b ++ c).toDF("g", "id", "v").repartition(7),
      "v", groupCols = Seq("g"))
      .select("g", "id", "v", "med", "mad", "is_outlier")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    val byGroup = got.groupBy(_._1)
    assert(got.length === a.size + b.size + c.size)
    // per-group statistics are constant across rows
    assert(byGroup("a").map(r => (r._4, r._5)).toSet === Set((102L, 1L)))
    assert(byGroup("b").map(r => (r._4, r._5)).toSet === Set((50L, 0L)))
    assert(byGroup("c").map(r => (r._4, r._5)).toSet === Set((10L, 0L)))
    // flags: only the planted extremes
    assert(got.filter(_._6 === 1L).map(r => (r._1, r._2)).toSet ===
      Set(("a", 99L), ("c", 399L)))
  }

  test("chi2Contingency: hand-computed 2x2 cells in exact integer ppm") {
    import spark.implicits._
    // observed: (x1,y1)=30 (x1,y2)=10 (x2,y1)=10 (x2,y2)=50; n=100
    // marginals: x1=40 x2=60 y1=40 y2=60
    val rows =
      Seq.fill(30)(("x1", "y1")) ++ Seq.fill(10)(("x1", "y2")) ++
      Seq.fill(10)(("x2", "y1")) ++ Seq.fill(50)(("x2", "y2"))
    val got = DataQuality.chi2Contingency(
      rows.toDF("a", "b").repartition(7), "a", "b")
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // expected_milli = r*c*1000 div n; term = (n*o - r*c)^2 * 1e6
    // div (n*r*c)
    assert(got(("x1", "y1")) === ((30L, 16000L, 12250000L)))
    assert(got(("x1", "y2")) === ((10L, 24000L, 8166666L)))
    assert(got(("x2", "y1")) === ((10L, 24000L, 8166666L)))
    assert(got(("x2", "y2")) === ((50L, 36000L, 5444444L)))
  }

  test("keySkew: max/median/top-share on a planted skewed key distribution") {
    import spark.implicits._
    // per-key counts: a=10 b=2 c=2 d=1 e=1 -> 5 keys, 16 rows,
    // sorted counts (1,1,2,2,10): nearest-rank median at rank 3 = 2
    val rows = Seq.fill(10)("a") ++ Seq.fill(2)("b") ++ Seq.fill(2)("c") ++
      Seq("d", "e")
    val got = DataQuality.keySkew(rows.toDF("k").repartition(5), "k")
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(got === ((5L, 16L, 10L, 2L, 625000L, 5000000L)))
  }

  test("idGaps: planted gap ranges; duplicates collapse; no gaps -> empty") {
    import spark.implicits._
    // ids {1,2,3, 7, 9,10, 15} with a duplicate 7
    val df = Seq(1L, 2L, 3L, 7L, 7L, 9L, 10L, 15L).toDF("id")
    val got = DataQuality.idGaps(df, "id")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got === Array((4L, 6L, 3L), (8L, 8L, 1L), (11L, 14L, 4L)))
    val dense = (5L to 9L).toDF("id")
    assert(DataQuality.idGaps(dense, "id").count() === 0L)
  }

  test("fdStrength: exact g3 on a hand-built violation") {
    import spark.implicits._
    // lhs a -> {x, x, y}: keep 2 of 3; lhs b -> {z}: holds
    val df = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "z"))
      .toDF("lhs", "rhs")
    val got = DataQuality.fdStrength(df, Seq("lhs"), "rhs")
      .as[(Long, Long, Long, Long, Long)].collect().head
    // (n_groups, n_violating_groups, n_rows, n_rows_to_delete, g3_ppm)
    assert(got === ((2L, 1L, 4L, 1L, 250000L)))
  }

  test("fdStrength: an exactly-holding FD reports zero everywhere") {
    import spark.implicits._
    val df = Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("k", "v")
    val got = DataQuality.fdStrength(df, Seq("k"), "v")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(got === ((2L, 0L, 3L, 0L, 0L)))
  }

  test("kAnonymity: class-size histogram and violation flags on planted classes") {
    import spark.implicits._
    // equivalence classes on (zip, age): sizes 3, 3, 2, 1, 1, 1
    val rows = Seq(
      ("10115", 30, "r1"), ("10115", 30, "r2"), ("10115", 30, "r3"),
      ("10117", 40, "r4"), ("10117", 40, "r5"), ("10117", 40, "r6"),
      ("10119", 30, "r7"), ("10119", 30, "r8"),
      ("10121", 50, "r9"), ("10123", 60, "r10"), ("10125", 70, "r11")
    ).toDF("zip", "age", "payload")
    val got = DataQuality.kAnonymity(rows, Seq("zip", "age"), k = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // (class_size, n_classes, n_rows, violates_k)
    assert(got === Array((1L, 3L, 3L, 1L), (2L, 1L, 2L, 1L), (3L, 2L, 6L, 0L)))
  }

  test("embeddingReport: hand-computed per-label norm stats; null, zero, " +
    "null-element and wrong-dimension vectors counted; exact lower median") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq[Option[Float]](Some(0.0f), Some(0.0f)), 1),   // zero, n2 = 0
      (2L, Seq[Option[Float]](Some(0.001f), Some(0.0f)), 1), // n2 = 1
      (3L, Seq[Option[Float]](Some(0.002f), Some(0.0f)), 1), // n2 = 4
      (4L, Seq[Option[Float]](Some(0.003f), Some(0.0f)), 1), // n2 = 9
      (5L, null.asInstanceOf[Seq[Option[Float]]], 2),
      (6L, Seq[Option[Float]](Some(0.001f), Some(0.001f),
        Some(0.001f)), 2),                          // wrong dim (3), n2 = 3
      (7L, Seq[Option[Float]](Some(0.001f), None), 2) // NULL element — must
      // be counted, NOT fed into the norm (dot_long skips null guards)
    ).toDF("vec_id", "embedding", "label")
    val got = DataQuality.embeddingReport(emb, "vec_id", "embedding",
      "label", dims = 2)
      .as[(Int, Long, Long, Long, Long, Long, Option[Long], Option[Long],
        Option[Long])].collect().map(r => r._1 -> r).toMap
    // label 1: 4 vectors, one zero; n2 in {0,1,4,9} -> lower median 1
    assert(got(1) === ((1, 4L, 0L, 0L, 0L, 1L, Some(0L), Some(9L), Some(1L))))
    // label 2: null vec counted, null-element vec counted and excluded
    // from the norm stats, wrong-dim counted; median over the one
    // measurable vector
    assert(got(2) === ((2, 3L, 1L, 1L, 1L, 0L, Some(3L), Some(3L), Some(3L))))
  }
}
