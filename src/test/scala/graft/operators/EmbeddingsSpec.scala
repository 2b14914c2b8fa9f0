package graft.operators

import graft.SparkSpec

class EmbeddingsSpec extends SparkSpec {

  test("labelCentroids accumulates exact quantized sums per (label, dim)") {
    import spark.implicits._
    val embs = Seq(
      (1L, Array(1.0f, -2.0f), 10),
      (2L, Array(3.0f, 0.5f), 10),
      (3L, Array(0.25f, 0.25f), 20))
      .toDF("vec_id", "embedding", "label")
    val got = Embeddings.labelCentroids(embs, "label", "embedding")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // label 10: dim0 = 1e6 + 3e6, dim1 = -2e6 + 0.5e6; two vectors each
    assert(got((10L, 0L)) === ((4000000L, 2L)))
    assert(got((10L, 1L)) === ((-1500000L, 2L)))
    assert(got((20L, 0L)) === ((250000L, 1L)))
    assert(got((20L, 1L)) === ((250000L, 1L)))
  }
}
