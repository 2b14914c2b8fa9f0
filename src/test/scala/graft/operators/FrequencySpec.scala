package graft.operators

import graft.SparkSpec

class FrequencySpec extends SparkSpec {

  test("exact heavy hitters: ceil threshold, integer ppm share") {
    import spark.implicits._
    // 10 rows: a x5, b x3, c x2 -> support 0.3 keeps a and b (ceil(3)=3)
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c"))
      .toDF("v")
    val got = Frequency.heavyHitters(df, "v", support = 0.3)
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(got === Array(("a", 5L, 500000L), ("b", 3L, 300000L)))
  }

  test("Misra-Gries sketch: superset of true heavy hitters, estimates undercount by <= total/k") {
    import spark.implicits._
    // skewed stream over 40 distinct values, one partition so the k-1=7
    // counters actually evict
    val values = (Seq.fill(300)("hot1") ++ Seq.fill(200)("hot2") ++
      Seq.fill(90)("warm") ++ (1 to 40).flatMap(i => Seq.fill(10)(s"cold$i")))
    val df = spark.createDataset(scala.util.Random.shuffle(values))(
      org.apache.spark.sql.Encoders.STRING).repartition(1).toDF("v")
    val total = values.size
    val k = 8
    val est = Frequency.heavyHittersSketch(df, "v", k)
      .as[(String, Long)].collect().toMap
    val truth = values.groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
    // every value with true count > total/k must be reported
    truth.filter(_._2 > total / k).keys.foreach { v =>
      assert(est.contains(v), s"$v (count ${truth(v)}) missing from sketch")
    }
    // estimates never exceed the truth and undercount by at most total/k
    est.foreach { case (v, e) =>
      assert(e <= truth(v), s"$v overestimated: $e > ${truth(v)}")
      assert(e >= truth(v) - total / k,
        s"$v undercounts too far: $e < ${truth(v)} - ${total / k}")
    }
  }

  test("sketch superset survives adversarial multi-partition merges") {
    import spark.implicits._
    // partition A: seven decoys at 57 each + ONE occurrence of v;
    // partition B: v x100 among eviction-forcing cold values. v's true
    // count (101) beats total/k, but its merged estimate sinks below the
    // decoys' — a top-(k-1) merge cut would drop it (the bug this pins)
    val k = 8
    val partA = (1 to 7).flatMap(i => Seq.fill(57)(s"w$i")) ++ Seq("v")
    val partB = scala.util.Random.shuffle(
      Seq.fill(100)("v") ++ (1 to 30).flatMap(i => Seq.fill(10)(s"cold$i")))
    val df = partA.map((_, 0)).toDF("v", "p")
      .unionByName(partB.map((_, 1)).toDF("v", "p"))
      .repartitionByRange(2, $"p").select("v")
    val total = partA.size + partB.size
    val truth = (partA ++ partB).groupBy(identity)
      .map { case (v, xs) => v -> xs.size.toLong }
    val est = Frequency.heavyHittersSketch(df, "v", k)
      .as[(String, Long)].collect().toMap
    truth.filter(_._2 > total / k).keys.foreach { v =>
      assert(est.contains(v), s"$v (count ${truth(v)}) missing from sketch")
    }
    est.foreach { case (v, e) =>
      assert(e <= truth(v) && e >= truth(v) - total / k, s"$v bound: $e")
    }
  }

  test("sketch is exact in the no-eviction regime (distinct < k-1) across partitions") {
    import spark.implicits._
    val df = (Seq.fill(7)("x") ++ Seq.fill(5)("y") ++ Seq.fill(3)("z"))
      .toDF("v").repartition(4)
    val got = Frequency.heavyHittersSketch(df, "v", k = 10)
      .as[(String, Long)].collect().toMap
    assert(got === Map("x" -> 7L, "y" -> 5L, "z" -> 3L))
  }

  test("equi-width histogram: floor cells, closed last cell, degenerate domain") {
    import spark.implicits._
    // lo=0 hi=100, 10 buckets of width 10; 100 lands in the LAST cell
    val got = Frequency.histogram(
      Seq(0L, 5L, 10L, 55L, 99L, 100L).toDF("x"), "x", buckets = 10)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(0L -> 2L, 1L -> 1L, 5L -> 1L, 9L -> 2L))
    val flat = Frequency.histogram(Seq(7L, 7L, 7L).toDF("x"), "x", 10)
      .as[(Long, Long)].collect().toMap
    assert(flat === Map(0L -> 3L))
  }
}
