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

  /** Floor division on longs (rounds toward -inf, unlike `/`'s
    * truncation) — the portable integer centroid-average both engines
    * compute identically. */
  private def fdiv(s: Long, n: Long): Long = {
    val m = ((s % n) + n) % n
    (s - m) / n
  }

  /** EXACT-arithmetic Lloyd's k-means over the embedding column:
    * components quantize to integer thousandths up front (the
    * `dedup_semantic` convention), so assignments (integer squared-L2
    * argmin, ties to the smallest cell id) and centroid updates (integer
    * floor-averages) are bit-reproducible and SQL-replayable — a
    * clustering run a second engine can hash-verify, which float k-means
    * never is. Initial centroids: the `k` smallest `idCol` rows in id
    * order (deterministic seed-free init).
    *
    * Scale shape, per iteration: ONE scan-side codegen'd assignment pass
    * (the k×dim centroid matrix folds into the expression as literals —
    * bounded driver state, the [[Similarity]] codebook contract) and ONE
    * hash aggregate with `dim+1` map-side-partial sums — no explode, no
    * per-row join against the centroid table. Empty cells keep their
    * previous centroid. `k`×`dim` term count is codegen'd; keep
    * k×dim ≲ 10k (beyond that, the IVF codebook path in [[Similarity]]
    * is the right tool). */
  def kmeansExact(embs: DataFrame, idCol: String, vecCol: String,
                  dim: Int, k: Int = 4, iters: Int = 2,
                  scale: Int = 1000): DataFrame = {
    require(k >= 1 && iters >= 0 && dim >= 1)
    val base = embs.select(col(idCol).cast("long").as("vec_id"),
      transform(col(vecCol),
        x => floor(x.cast("double") * scale).cast("long")).as("q"))

    var cents: Array[Array[Long]] = base.orderBy("vec_id").limit(k)
      .select("q").collect().map(_.getSeq[Long](0).toArray)
    require(cents.length == k, s"need at least $k input rows")

    // (squared-distance, cell) argmin as ONE least-of-structs expression:
    // lexicographic struct order = min distance, ties to min cell id
    // (k=1: least() needs two args — every row is trivially cell 0)
    def cellCol: Column =
      if (k == 1) lit(0L)
      else least(cents.zipWithIndex.map { case (c, j) =>
        val dist = (0 until dim).map { d =>
          val diff = element_at(col("q"), d + 1) - lit(c(d))
          diff * diff
        }.reduce(_ + _)
        struct(dist.as("d"), lit(j).as("j"))
      }: _*).getField("j").cast("long")

    for (_ <- 1 to iters) {
      val aggs = count(lit(1)).as("n") +: (0 until dim).map(d =>
        sum(element_at(col("q"), d + 1)).as(s"s$d"))
      val rows = base.withColumn("cell", cellCol)
        .groupBy("cell").agg(aggs.head, aggs.tail: _*)
        .collect() // bounded: k rows of dim+2 longs
      val byCell = rows.map(r => r.getLong(0) -> r).toMap
      cents = cents.zipWithIndex.map { case (old, j) =>
        byCell.get(j.toLong).map { r =>
          val n = r.getLong(1)
          Array.tabulate(dim)(d => fdiv(r.getLong(2 + d), n))
        }.getOrElse(old)
      }
    }

    val assigned = base.withColumn("cell", cellCol).select("vec_id", "cell")
    val counts = assigned.groupBy("cell").agg(count(lit(1)).as("cluster_n"))
    assigned.join(broadcast(counts), Seq("cell"))
      .select("vec_id", "cell", "cluster_n")
  }
}
