package graft

import org.apache.spark.sql.functions._

/** Laws for the small-input fan-out ([[Fanout.maybe]]): it must
  * parallelize a single-split scan, leave an already-parallel frame
  * UNTOUCHED (at 100 TB a blanket repartition would be a full-corpus
  * shuffle), preserve the rowset exactly, and pass streaming frames
  * through (split introspection throws on unstarted streaming plans). */
class FanoutSpec extends SparkSpec {

  private lazy val docs = Tables(spark, sfDir, "documents")

  test("single-split input fans out to the session's parallelism; rowset identical") {
    val one = docs.coalesce(1)
    assert(one.rdd.getNumPartitions === 1)
    val fanned = Fanout.maybe(one, "doc_id")
    assert(fanned.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
    val a = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    val b = fanned.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(a === b)
  }

  test("already-parallel input passes through UNCHANGED (no shuffle added)") {
    val wide = docs.repartition(
      spark.sparkContext.defaultParallelism, col("doc_id"))
    val out = Fanout.maybe(wide, "doc_id")
    assert(out eq wide, "fan-out must be the identity on multi-split input")
  }

  test("streaming frames pass through untouched") {
    val stream = spark.readStream.format("rate").load()
    val out = Fanout.maybe(stream, "value")
    assert(out eq stream)
  }

  test("fan-out is deterministic: hash partitioning, not round-robin") {
    val one = docs.coalesce(1)
    val p1 = Fanout.maybe(one, "doc_id").withColumn("p", spark_partition_id())
      .select("doc_id", "p").collect().map(r => (r.getLong(0), r.getInt(1)))
      .toMap
    val p2 = Fanout.maybe(one, "doc_id").withColumn("p", spark_partition_id())
      .select("doc_id", "p").collect().map(r => (r.getLong(0), r.getInt(1)))
      .toMap
    assert(p1 === p2)
  }
}
