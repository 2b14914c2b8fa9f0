package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GraftFunctions._

class LinkAlignSpec extends SparkSpec {

  import LinkAlign._

  test("count-equality gate drops mismatched bills (batch_train.py:98-99)") {
    import spark.implicits._
    val a = Seq(("K1", 1), ("K1", 2), ("K2", 1), ("K3", 1)).toDF("k", "i")
    val b = Seq(("K1", 1), ("K1", 2), ("K2", 1), ("K2", 2)).toDF("k", "j")
    val keys = countMatchedKeys(a, b, "k").as[String].collect().sorted
    assert(keys === Array("K1")) // K2: 1 vs 2 items; K3: absent in b
  }

  test("ordinal alignment pairs i-th with i-th per key") {
    import spark.implicits._
    val a = Seq(("K", 1, "a1"), ("K", 2, "a2"), ("K", 3, "a3"))
      .toDF("k", "ord_a", "va")
    val b = Seq(("K", 30, "b3"), ("K", 10, "b1"), ("K", 20, "b2"))
      .toDF("k", "ord_b", "vb")
    val got = alignByOrdinal(a, b, "k", Seq(col("ord_a")), Seq(col("ord_b")))
      .select("va", "vb").as[(String, String)].collect().sorted
    assert(got === Array(("a1", "b1"), ("a2", "b2"), ("a3", "b3")))
  }

  test("keys differing only by whitespace/slash/dash/case link after hygiene") {
    import spark.implicits._
    val a = Seq(("mw 1", "h-7", "x")).toDF("m", "h", "va")
      .select(linkKey($"m", $"h").as("k"), $"va", lit(1).as("oa"))
    val b = Seq(("MW1", "H/7", "y")).toDF("m", "h", "vb")
      .select(linkKey($"m", $"h").as("k"), $"vb", lit(1).as("ob"))
    val got = alignByOrdinal(a, b, "k", Seq(col("oa")), Seq(col("ob")))
      .select("k", "va", "vb").as[(String, String, String)].collect()
    assert(got === Array(("MW1_H7", "x", "y")))
  }
}
