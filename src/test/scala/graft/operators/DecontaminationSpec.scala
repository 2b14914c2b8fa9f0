package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class DecontaminationSpec extends SparkSpec {

  test("contamination finds planted n-gram overlap with hit counts") {
    import spark.implicits._
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // contains "quick brown fox jumps" twice -> 2 hits, 1 distinct
      (1L, "a quick brown fox jumps here and a quick brown fox jumps there"),
      // shares only a trigram, not a 4-gram -> clean
      (2L, "the quick brown cat sleeps"),
      (3L, "completely unrelated words entirely")).toDF("doc_id", "text")
    val got = Decontamination
      .contamination(corpus, bench, "doc_id", "text", 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(1L -> ((2L, 1L))))
  }

  test("hashed variant agrees with the string variant's distinct hits") {
    import spark.implicits._
    val docs = Tables(spark, sfDir, "documents")
    val bench = docs.where(pmod(col("doc_id"), lit(50)) === 7)
    val corpus = docs.where(pmod(col("doc_id"), lit(50)) =!= 7)
    val str = Decontamination.contamination(corpus, bench, "doc_id", "text", 4)
      .select("doc_id", "n_distinct_hits")
      .as[(Long, Long)].collect().toMap
    val hashed = Decontamination
      .contaminationHashed(corpus, bench, "doc_id", "text", 4)
      .as[(Long, Long)].collect().toMap
    assert(hashed === str)
    assert(str.nonEmpty, "test corpus must exercise the overlap path")
  }

  test("portable md5-key variant agrees with the string variant") {
    import spark.implicits._
    val docs = Tables(spark, sfDir, "documents")
    val bench = docs.where(pmod(col("doc_id"), lit(50)) === 7)
    val corpus = docs.where(pmod(col("doc_id"), lit(50)) =!= 7)
    val str = Decontamination.contamination(corpus, bench, "doc_id", "text", 4)
      .select("doc_id", "n_distinct_hits")
      .as[(Long, Long)].collect().toMap
    val md5k = Decontamination
      .contaminationMd5Keys(corpus, bench, "doc_id", "text", 4)
      .as[(Long, Long)].collect().toMap
    assert(md5k === str)
    assert(str.nonEmpty, "test corpus must exercise the overlap path")
  }
}
