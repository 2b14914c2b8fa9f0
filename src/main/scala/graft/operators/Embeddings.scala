package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column analytics beyond similarity search: per-label
  * centroid accumulation for cluster/label auditing. Kept separate from
  * [[Similarity]] (query answering) — these are corpus-profiling passes. */
object Embeddings {

  /** Per-(label, dimension) centroid ACCUMULATORS: the component sum
    * quantized to integer millionths plus the vector count — the exact
    * integer form of the centroid (centroid = sum_q / 1e6 / n). Quantizing
    * BEFORE the sum keeps the aggregation order-independent (float sums
    * are combine-order sensitive and would never hash-match a second
    * engine), so the result is reproducible AND oracle-checkable. The
    * product is computed in DOUBLE (float widens exactly; float×int would
    * round in 24-bit precision and engines disagree on the promotion).
    *
    * Scale shape: posexplode to (label, dim) keys then a hash aggregate —
    * partial aggregation runs map-side, the shuffle carries at most
    * |labels| x dim rows per partition. */
  def labelCentroids(embs: DataFrame, labelCol: String,
                     vecCol: String): DataFrame =
    embs
      .select(col(labelCol).cast("long").as("label"),
        posexplode(col(vecCol)).as(Seq("pos", "_v")))
      .groupBy(col("label"), col("pos").cast("long").as("pos"))
      .agg(sum(round(col("_v").cast("double") * 1000000).cast("long"))
        .as("sum_q"),
        count(lit(1)).cast("long").as("n_vecs"))

  /** Symmetric per-vector int8 scalar quantization — the standard 4x
    * storage shrink for an embedding corpus at rest (at 100 TB the
    * embedding column IS the dataset; fp32 -> int8 is the difference
    * between 4 scans and 1). Each component maps to
    * round(x * 127 / max_abs) in [-127, 127]; `max_abs_e6` (the scale in
    * integer millionths) rides along so a reader can dequantize. All
    * arithmetic in DOUBLE from exactly-widened floats, so the codes are
    * bit-reproducible across engines. Row-local: no shuffle at all.
    * All-zero vectors quantize to 0 (guarded division). */
  def quantizeInt8(embs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol)
    val maxAbs = array_max(transform(v, x => abs(x.cast("double"))))
    embs
      .select(col(idCol).cast("long").as("vec_id"), maxAbs.as("_m"),
        posexplode(v).as(Seq("pos", "_x")))
      .select(col("vec_id"), col("pos").cast("long").as("pos"),
        when(col("_m") === 0d, 0L)
          .otherwise(round(col("_x").cast("double") * 127 / col("_m"))
            .cast("long")).as("q8"),
        round(col("_m") * 1000000).cast("long").as("max_abs_e6"))
  }

  /** Dense random projection to `outDim` dimensions with a fixed ±1 sign
    * matrix (Achlioptas-style): out_j = sum_i sign(j,i) * x_i. The sign
    * is the high bit of a Knuth multiplicative hash of (j, i), so the
    * "matrix" is a formula — nothing is materialized or broadcast, and
    * any two engines agree on it. The fold runs in index order in DOUBLE
    * (deterministic IEEE sum — NOT a float aggregation), emitted in
    * integer millionths. Row-local map; at scale this is the cheap
    * front-door to ANN: 64d -> 16d cuts every downstream distance
    * computation 4x. */
  def randomProjection(embs: DataFrame, idCol: String, vecCol: String,
                       outDim: Int): DataFrame = {
    val v = col(vecCol)
    def sign(j: Column, i: Column): Column =
      when(pmod((j * 1024 + i) * lit(2654435761L), lit(4294967296L)) >=
        2147483648L, 1d).otherwise(-1d)
    val outs = transform(sequence(lit(0), lit(outDim - 1)), j =>
      round(aggregate(sequence(lit(0), size(v) - 1), lit(0.0d),
        (acc, i) => acc + sign(j, i) * element_at(v, i + 1).cast("double"))
        * 1000000).cast("long"))
    embs
      .select(col(idCol).cast("long").as("vec_id"),
        posexplode(outs).as(Seq("pos", "out_q")))
      .select(col("vec_id"), col("pos").cast("long").as("pos"), col("out_q"))
  }
}
