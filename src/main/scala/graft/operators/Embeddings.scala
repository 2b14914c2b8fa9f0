package graft.operators

import org.apache.spark.sql.DataFrame
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
}
