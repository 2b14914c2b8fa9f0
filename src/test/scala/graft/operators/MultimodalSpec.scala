package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private lazy val assets = graft.Tables(spark, sfDir, "documents")
    .select(col("doc_id"), col("text").cast("binary").as("payload"))
    .cache()

  test("decode plumbing: one record per asset, deterministic stub metadata") {
    val a = Multimodal.decodeAssets(assets, "doc_id", "payload").cache()
    val b = Multimodal.decodeAssets(assets, "doc_id", "payload")
    assert(a.count() === assets.count())
    // deterministic: two runs produce identical rows
    assert(a.except(b).count() === 0L)
    import spark.implicits._
    assert(a.filter(m => m.width < 64 || m.height < 64).count() === 0L)
  }

  test("frame sampling: n frames per asset, fixed size, in-bounds offsets") {
    import spark.implicits._
    val frames = Multimodal.sampleFrames(assets, "doc_id", "payload", n = 3,
      frameBytes = 16).cache()
    assert(frames.count() === assets.count() * 3)
    assert(frames.where($"frame_no" < 0 || $"frame_no" > 2).count() === 0L)
    val sizes = frames.select(length($"frame").as("l"))
      .where($"l" > 16 || $"l" < 1).count()
    assert(sizes === 0L)
  }
}
