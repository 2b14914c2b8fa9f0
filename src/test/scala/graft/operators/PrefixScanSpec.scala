package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrefixScanSpec extends SparkSpec {

  // Skewed keys (clustered values) so repartitionByRange produces some
  // near-empty / empty partitions — the carry alignment must survive them.
  private def skewed(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val k = if (i % 10 < 7) i % 5 else i // 70% of keys in [0,5)
      (k.toLong * 1000000L + i, (i % 97).toLong - 11L)
    }.toDF("k", "v").repartition(23)
  }

  test("Sum matches a single-partition window oracle") {
    import spark.implicits._
    val df = skewed(4000)
    val got = PrefixScan.runningLong(df, Seq("k"), "v", PrefixScan.Sum)
      .select("k", "v", "run_excl", "run_incl")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val rows = df.as[(Long, Long)].collect().sortBy(_._1)
    var acc = 0L
    rows.zip(got).foreach { case ((k, v), (gk, gv, excl, incl)) =>
      assert(gk === k && gv === v)
      assert(excl === acc, s"excl at k=$k")
      acc += v
      assert(incl === acc, s"incl at k=$k")
    }
  }

  test("Max matches the running maximum; first excl is the MinValue sentinel") {
    import spark.implicits._
    val df = skewed(3000)
    val got = PrefixScan.runningLong(df, Seq("k"), "v", PrefixScan.Max)
      .select("k", "v", "run_excl", "run_incl")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.head._3 === Long.MinValue) // neutral carried into row 1
    var acc = Long.MinValue
    got.foreach { case (k, v, excl, incl) =>
      assert(excl === acc, s"excl at k=$k")
      acc = math.max(acc, v)
      assert(incl === acc, s"incl at k=$k")
    }
  }

  test("empty input and single row") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("k", "v")
    assert(PrefixScan.runningLong(empty, Seq("k"), "v", PrefixScan.Sum)
      .count() === 0L)
    val one = Seq((7L, 42L)).toDF("k", "v")
    val r = PrefixScan.runningLong(one, Seq("k"), "v", PrefixScan.Sum)
      .select("run_excl", "run_incl").as[(Long, Long)].head()
    assert(r === ((0L, 42L)))
  }

  test("rejects actual nulls at runtime, colliding output names, overflow") {
    import spark.implicits._
    // a nullable-SCHEMA column with no actual nulls works (parquet reads
    // are conservatively nullable); an actual null fails loudly
    val nullableOk = Seq((1L, Some(2L)), (2L, Some(3L))).toDF("k", "v")
    assert(PrefixScan.runningLong(nullableOk, Seq("k"), "v", PrefixScan.Sum)
      .count() === 2L)
    val withNull = Seq((1L, Some(2L)), (2L, None)).toDF("k", "v")
    val nex = intercept[Throwable] {
      PrefixScan.runningLong(withNull, Seq("k"), "v", PrefixScan.Sum)
        .collect()
    }
    assert(Iterator.iterate(nex)(_.getCause).takeWhile(_ != null).take(8)
      .exists(c => Option(c.getMessage).exists(_.contains("NULL"))))
    val df = Seq((1L, 2L)).toDF("k", "run_excl")
    intercept[IllegalArgumentException] {
      PrefixScan.runningLong(df, Seq("k"), "run_excl", PrefixScan.Sum)
    }
    // Sum fails loudly on int64 wrap (Math.addExact), per the
    // integer-exactness convention
    val big = Seq((1L, Long.MaxValue), (2L, 1L)).toDF("k", "v")
    val ex = intercept[Throwable] {
      PrefixScan.runningLong(big, Seq("k"), "v", PrefixScan.Sum).collect()
    }
    val causes = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
      .take(8).toSeq
    assert(causes.exists(c => c.isInstanceOf[ArithmeticException] ||
      Option(c.getMessage).exists(_.toLowerCase.contains("overflow"))))
  }
}
