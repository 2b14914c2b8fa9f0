package graft

/** Cost-vs-recall A/B of the recall-trading caps, measured on the
  * ADVERSARIAL (permuted, zero-new-vocabulary) corpus — the regime
  * SCALE.md's three-regime bracket showed goes super-linear under any
  * df-ranked blocking. The caps (`maxBucket` on the shingle-prefix
  * family, `maxDf` on the winnowing family) bound that blow-up by
  * dropping the hottest blocks from pairing; this harness quantifies
  * BOTH sides of that trade on the same corpus: wall time capped vs
  * uncapped, and recall = capped pairs / uncapped pairs (caps only
  * DROP candidates, so capped ⊆ uncapped and the count ratio is the
  * recall — the containment is asserted, not assumed).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<permuted corpus> runMain graft.CapBench
  * Prints one JSON line per family. */
object CapBench {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/blowup3perm")
    val spark = Sessions.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"[capbench] corpus=$sfDir docs=${docs.count()}")

    // warm codegen/shuffle paths on a slice so the FIRST timed arm does
    // not eat the JVM warmup (the ±30% solo-noise discipline still
    // applies to the numbers)
    locally {
      val warm = docs.limit(500)
      operators.Dedup.ngramJaccardPairs(warm, "doc_id", "text",
        k = 2, minJaccard = 0.8).count()
      operators.TextAnalysis.winnowPairs(warm, "doc_id", "text",
        k = 5, w = 4, minShared = 8, maxDf = 20).count()
    }

    // caps only DROP candidates, so capped ⊆ uncapped by construction;
    // the join below sanity-checks that on corpora where materializing
    // the uncapped relation is feasible (an adversarial corpus can make
    // it tens of millions of pairs — counting streams, joining doesn't).
    // The capped side is localCheckpoint'ed so the containment query
    // carries only ONE observe() metric name (two same-name metrics in
    // one query are rejected by the analyzer).
    def ab(family: String, pairs: Int => org.apache.spark.sql.DataFrame,
           cap: Int): Unit = {
      val (nCap, tCap) = timed(pairs(cap).count())
      val (nUn, tUn) = timed(pairs(Int.MaxValue).count())
      if (nUn <= 5000000L) {
        val missed = pairs(cap).localCheckpoint()
          .join(pairs(Int.MaxValue), Seq("id_a", "id_b"), "left_anti")
          .count()
        require(missed == 0, s"capped must be a subset of uncapped ($missed)")
      } else println(s"[capbench] $family: containment check skipped " +
        s"($nUn uncapped pairs — subset holds by construction)")
      val recall = if (nUn == 0) 1000000L else nCap * 1000000L / nUn
      println(f"""{"family":"$family","capped_sec":$tCap%.1f,"uncapped_sec":$tUn%.1f,"capped_pairs":$nCap,"uncapped_pairs":$nUn,"recall_ppm":$recall}""")
    }

    // shingle-prefix (PPJoin) family: maxBucket at the production
    // default vs uncapped; dedup_clusters consumes exactly this stage
    ab("jaccard_maxbucket", c => operators.Dedup.ngramJaccardPairs(
      docs, "doc_id", "text", k = 2, minJaccard = 0.8, maxBucket = c),
      cap = 10000)

    // winnowing family: maxDf at the production default vs uncapped;
    // dedup_winnowing runs exactly this shape
    ab("winnow_maxdf", c => operators.TextAnalysis.winnowPairs(
      docs, "doc_id", "text", k = 5, w = 4, minShared = 8, maxDf = c),
      cap = 20)

    // relative-cap arm (r16): the operationalized sizing rule at the
    // registry's 2% setting vs the same uncapped ground truth. The `cap`
    // knob here routes to maxDfPerMille (Int.MaxValue perMille ⟹
    // effectively uncapped, same containment law: relative-capped ⊆
    // uncapped since the rel cap only RAISES the absolute 20)
    ab("winnow_maxdf_rel", c => operators.TextAnalysis.winnowPairs(
      docs, "doc_id", "text", k = 5, w = 4, minShared = 8, maxDf = 20,
      metric = "winnow_df_cap_rel",
      maxDfPerMille = if (c == Int.MaxValue) 1000000 else c),
      cap = 20)

    spark.stop()
  }
}
