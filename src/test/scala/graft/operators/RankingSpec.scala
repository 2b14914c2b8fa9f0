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
}
