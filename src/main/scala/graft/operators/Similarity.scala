package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers: brute-force cosine top-k (the exact baseline — a broadcast
  * join of the query set against the corpus, one scan, no corpus shuffle),
  * and a sign-bucket LSH variant (random-hyperplane buckets along fixed
  * coordinate planes) that prunes the candidate set for scale.
  */
object Similarity {

  /** Deterministic coarse bucket: the sign bits of the first `dims`
    * components packed into an int — a fixed-hyperplane LSH code. At 100 TB
    * this is the partition key: the corpus is written bucketed by this code
    * so a query touches only its own bucket's files (partition pruning). */
  def signBucket(vec: Column, dims: Int): Column =
    (0 until dims).map { d =>
      when(element_at(vec, d + 1) > 0f, lit(1 << d)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Exact top-`k` cosine neighbors for each query vector. `queries` must be
    * small (it is broadcast); the corpus is scanned exactly once. The
    * per-query ranking window partitions by query id, so the shuffle volume
    * is |queries| × |corpus| score rows — for big query sets switch to the
    * bucketed variant below. Ties break by neighbor id (deterministic). */
  def knnBruteForce(corpus: DataFrame, queries: DataFrame,
                    idCol: String, vecCol: String, k: Int,
                    excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val joined = c.crossJoin(broadcast(q))
    // Self-exclusion is opt-out: correct for self-search (corpus == queries);
    // when corpus and queries are distinct datasets whose ids merely collide,
    // pass excludeSelf = false so legitimate neighbors aren't dropped.
    val kept =
      if (excludeSelf) joined.where(col("query_id") =!= col("neighbor_id"))
      else joined
    val scored = kept.withColumn("cos", cosineSim(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }

  /** Materialize the corpus PARTITIONED BY sign bucket — the at-rest layout
    * for ANN at scale: a query's candidate set lives in one partition
    * directory, so the scan prunes to ~1/2^dims of the files before any
    * row is read (see [[knnPrePartitioned]]). */
  def writeBucketed(corpus: DataFrame, idCol: String, vecCol: String,
                    path: String, signDims: Int = 4): Unit =
    corpus.select(col(idCol), col(vecCol),
      signBucket(col(vecCol), signDims).as("bucket"))
      .write.partitionBy("bucket").mode("overwrite").parquet(path)

  /** ANN over a [[writeBucketed]] layout: the bucket predicate becomes a
    * PartitionFilter — only the query buckets' files are touched. The
    * query-side bucket set is computed driver-side (queries are the small,
    * broadcast side by construction). Output shape of [[knnBruteForce]]. */
  def knnPrePartitioned(spark: org.apache.spark.sql.SparkSession, path: String,
                        queries: DataFrame, idCol: String, vecCol: String,
                        k: Int, signDims: Int = 4,
                        multiProbe: Boolean = true): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      explode(probeBuckets(col(vecCol), signDims, multiProbe)).as("bucket"))
    val queryBuckets = q.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSeq
    val c = spark.read.parquet(path)
      .where(col("bucket").isin(queryBuckets: _*)) // partition pruning
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
        col("bucket"))
    val scored = c.join(broadcast(q), "bucket")
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosineSim(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }

  /** IVF (inverted-file) ANN — the coarse-quantizer tier that scales past
    * fixed-hyperplane LSH: a k-means codebook of `nlist` centroids (cosine
    * metric, trained on a sample) partitions the corpus into cells; each
    * query probes only its `nprobe` nearest cells. Candidate fraction is
    * ~nprobe/nlist and, unlike sign buckets, cells track the DATA
    * distribution, so recall holds on clustered embeddings.
    *
    * Scale shape: training fits on a driver-bounded sample; assignment is a
    * scan-side model transform (centroids broadcast inside the model); the
    * candidate join is corpus ⋈ broadcast(query-probes) keyed on the cell —
    * the corpus is never shuffled. At rest, write the corpus partitioned by
    * cell (as [[writeBucketed]] does for sign buckets) and the probe
    * predicate prunes partitions before any row is read. */
  def knnIvf(corpus: DataFrame, queries: DataFrame,
             idCol: String, vecCol: String, k: Int,
             nlist: Int = 16, nprobe: Int = 4,
             trainFraction: Double = 1.0, seed: Long = 42L,
             excludeSelf: Boolean = true): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import corpus.sparkSession.implicits._
    val c0 = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      // zero vectors have no cosine direction: k-means with the cosine
      // measure throws on them, and they can never rank as a neighbor
      .where(exists(col("c_vec"), x => x =!= lit(0.0f)))
      .withColumn("_fv", array_to_vector(col("c_vec")))
    val train = if (trainFraction >= 1.0) c0 else c0.sample(trainFraction, seed)
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10)
      .setDistanceMeasure("cosine").setFeaturesCol("_fv")
      .setPredictionCol("cell").fit(train)
    val assigned = model.transform(c0)
      .select(col("neighbor_id"), col("c_vec"), col("cell"))
    val cent = model.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray.map(_.toFloat).toSeq) }
      .toSeq.toDF("cell", "centroid")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("_csim", cosineSim(col("q_vec"), col("centroid")))
      .withColumn("_pr", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("_csim").desc, col("cell").asc)))
      .where(col("_pr") <= nprobe)
      .select("query_id", "q_vec", "cell")
    val joined = assigned.join(broadcast(probes), "cell")
    val kept =
      if (excludeSelf) joined.where(col("query_id") =!= col("neighbor_id"))
      else joined
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    kept.withColumn("cos", cosineSim(col("q_vec"), col("c_vec")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }

  /** Materialize the corpus PARTITIONED BY IVF cell — the at-rest layout
    * of the k-means tier (see [[knnIvf]]): `<path>/data` partitioned by
    * cell, `<path>/centroids` as a tiny parquet codebook. Queries against
    * this layout touch only their probe cells' files. */
  def writeIvf(corpus: DataFrame, idCol: String, vecCol: String,
               path: String, nlist: Int = 16,
               trainFraction: Double = 1.0, seed: Long = 42L): Unit = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import corpus.sparkSession.implicits._
    val c0 = corpus.select(col(idCol), col(vecCol))
      .where(exists(col(vecCol), x => x =!= lit(0.0f))) // see knnIvf note
      .withColumn("_fv", array_to_vector(col(vecCol)))
    val train = if (trainFraction >= 1.0) c0 else c0.sample(trainFraction, seed)
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10)
      .setDistanceMeasure("cosine").setFeaturesCol("_fv")
      .setPredictionCol("cell").fit(train)
    model.transform(c0).select(col(idCol), col(vecCol), col("cell"))
      .write.partitionBy("cell").mode("overwrite").parquet(s"$path/data")
    model.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray.map(_.toFloat).toSeq) }
      .toSeq.toDF("cell", "centroid")
      .write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** ANN over a [[writeIvf]] layout: probe cells become a PartitionFilter —
    * only those cells' files are read. Output shape of [[knnBruteForce]]. */
  def knnIvfPartitioned(spark: org.apache.spark.sql.SparkSession, path: String,
                        queries: DataFrame, idCol: String, vecCol: String,
                        k: Int, nprobe: Int = 4,
                        excludeSelf: Boolean = true): DataFrame = {
    val cent = spark.read.parquet(s"$path/centroids")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("_csim", cosineSim(col("q_vec"), col("centroid")))
      .withColumn("_pr", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("_csim").desc, col("cell").asc)))
      .where(col("_pr") <= nprobe)
      .select("query_id", "q_vec", "cell")
    // query-side cells, driver-collected (queries are small by contract)
    val probeCells = probes.select("cell").distinct()
      .collect().map(_.getInt(0)).toSeq
    val c = spark.read.parquet(s"$path/data")
      .where(col("cell").isin(probeCells: _*)) // partition pruning
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
        col("cell"))
    val joined = c.join(broadcast(probes), "cell")
    val kept =
      if (excludeSelf) joined.where(col("query_id") =!= col("neighbor_id"))
      else joined
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    kept.withColumn("cos", cosineSim(col("q_vec"), col("c_vec")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }

  /** A query's probe set: its own sign bucket plus, with `multiProbe`,
    * every Hamming-1 neighbor bucket — standard multi-probe LSH. A near
    * neighbor differing in ONE hyperplane sign is recovered at the cost of
    * scanning (dims+1)/2^dims of the corpus instead of 1/2^dims (measured
    * recall@3 on the test corpus: 0.14 single-probe -> ~0.5 multi-probe). */
  def probeBuckets(vec: Column, dims: Int, multiProbe: Boolean): Column = {
    val own = signBucket(vec, dims)
    if (!multiProbe) array(own)
    else array(own +: (0 until dims).map(d => own.bitwiseXOR(lit(1 << d))): _*)
  }

  /** Bucketed ANN: queries search their own sign bucket (+ Hamming-1
    * buckets with `multiProbe`, the default). Same output shape as
    * [[knnBruteForce]]; recall < 1 by construction (standard LSH trade)
    * but the scanned fraction drops ~2^dims/(dims+1)-fold. */
  def knnBucketed(corpus: DataFrame, queries: DataFrame,
                  idCol: String, vecCol: String, k: Int,
                  signDims: Int = 4, excludeSelf: Boolean = true,
                  multiProbe: Boolean = true): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      explode(probeBuckets(col(vecCol), signDims, multiProbe)).as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      signBucket(col(vecCol), signDims).as("bucket"))
    val joined = c.join(broadcast(q), "bucket")
    val kept =
      if (excludeSelf) joined.where(col("query_id") =!= col("neighbor_id"))
      else joined
    val scored = kept.withColumn("cos", cosineSim(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }
}
