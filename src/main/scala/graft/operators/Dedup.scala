package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._
import graft.Checkpoints.PinOps

/** Corpus deduplication operators for the extended (training-data pipeline)
  * surface: exact, MinHash+LSH, SimHash, exact n-gram Jaccard, and
  * embedding-cosine near-duplicate detection.
  *
  * All variants are pure DataFrame plans (no driver-side loops, no UDFs in
  * the per-row hot path) so they scale with executor count; the pair-finding
  * variants all use *blocking joins* (bucket / shingle / sign-bucket) so no
  * O(n²) cross product ever materializes.
  */
object Dedup {

  /** Exact duplicate groups by normalized-content fingerprint: one row per
    * duplicated fingerprint with the keeper id (min), the duplicate count,
    * and the ids removed. Scale: single hash aggregation on a 128-bit key —
    * the canonical first pass of any 100 TB dedup. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(count(lit(1)).as("n_dups"), min(idCol).as("keeper_id"))
      .where(col("n_dups") > 1)

  /** Exact-first collapse, shared by every pair generator below: group
    * docs by `key` (the full sorted shingle set, or the simhash value —
    * whatever makes two docs trivially duplicates), keep one representative
    * per distinct key for the blocking stage, and remember the member ids
    * for expansion. A million identical crawl copies — the NORMAL hot case
    * of web-scale dedup — contribute ONE row to every block instead of a
    * million, killing the hot-bucket OOM by construction. Buffers hold ids
    * only, never content.
    *
    * Plan note: the collapsed table feeds several consumers (signature,
    * member expansion, intra pairs), and per-branch column pruning
    * specializes each one's aggregate, so Catalyst does NOT reuse the
    * exchange — each consumer re-aggregates from the scan. Cheap at bench
    * scale (measured faster than the pre-collapse shape); at true corpus
    * scale, persist the collapsed table once and pass it through
    * [[minhashLshPairsFromGroups]] instead. */
  private def collapseBy(docs: DataFrame, keyCol: Column): DataFrame =
    docs.groupBy(keyCol.as("key"))
      .agg(collect_list(col("doc")).as("ids"), min(col("doc")).as("rep"),
        count(lit(1)).as("n_same"))

  /** All intra-group pairs of collapsed groups (trivial duplicates), with
    * `extra` named columns attached (e.g. intersection = set size,
    * hamming = 0). Pair expansion is the OUTPUT contract's cost — it
    * streams from a per-group explode, no aggregation buffer ever holds a
    * cluster's content. */
  private def intraPairs(groups: DataFrame,
                         extra: Seq[(String, Column)]): DataFrame = {
    val names = extra.map(_._1).map(col)
    groups.where(col("n_same") > 1)
      .select(col("ids") +: extra.map { case (n, c) => c.as(n) }: _*)
      .select(col("ids") +: explode(col("ids")).as("id_a") +: names: _*)
      .select(col("id_a") +: explode(col("ids")).as("id_b") +: names: _*)
      .where(col("id_a") < col("id_b"))
  }

  /** Drop blocks with more than `maxBucket` DISTINCT members before pair
    * generation (recall-trading guard against pathological boilerplate
    * clusters that survive exact collapsing), counting what was dropped in
    * an observed metric so the loss is visible, never silent. */
  private def capBuckets(grouped: DataFrame, maxBucket: Int,
                         metric: String): DataFrame =
    grouped
      .observe(metric,
        sum(when(size(col("ms")) > maxBucket, 1L).otherwise(0L))
          .as("dropped_buckets"))
      .where(size(col("ms")) <= maxBucket)

  /** Pairwise word-k-gram Jaccard ≥ `minJaccard`, exact, via PREFIX
    * FILTERING (the AllPairs/PPJoin family): under any global total order
    * on shingles, two sets of sizes na, nb with Jaccard ≥ t MUST share a
    * shingle among each one's `n - ceil(t*n) + 1` smallest — so candidate
    * generation joins only on those prefix shingles instead of all of them.
    * Ordering by ascending document frequency makes prefixes the RAREST
    * shingles, collapsing the join on Zipfian corpora (hot stop-phrase
    * shingles never block anything). Candidates are then verified exactly
    * with a native `array_intersect` over hashed shingle sets. Output:
    * (id_a < id_b, intersection, size_a, size_b) — lossless at any t
    * unless a prefix bucket exceeds `maxBucket` DISTINCT sets (dropped,
    * counted in the `ngram_prefix_buckets` observed metric).
    *
    * Scale shape: one df aggregation, one (shingle-keyed) join to attach
    * df, one per-doc sort of its own shingle list (bounded by document
    * length), a prefix-keyed candidate join, and a candidate-keyed verify
    * join. The quadratic shingle self-join of the naive formulation never
    * materializes; measured 88 s -> 8 s on the sf0.1 bench corpus (which
    * is adversarially self-similar — a 31-word vocabulary).
    *
    * `maxShingleDf > 0` additionally DROPS hotter-than-cap shingles before
    * everything (sizes recomputed over the capped universe, so Jaccard
    * stays internally consistent) — a recall-trading guard for corpora
    * where even prefixes stay hot; off by default because prefix filtering
    * already neutralizes hot shingles losslessly.
    *
    * Shingles are compared by 64-bit hash (collision odds ~ n²/2^65 —
    * negligible; a collision could only merge two shingle identities). */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        k: Int, minJaccard: Double,
                        maxShingleDf: Int = 0,
                        maxBucket: Int = 10000): DataFrame =
    // shingle identity only -> hashed shingles (no string building, long
    // keys); exact-identical sets collapse to one representative before
    // anything else (df, prefixes, buckets all see distinct sets only).
    // The collapse is MATERIALIZED (eager local checkpoint) before the
    // pair pipeline: downstream references it three times (explode, member
    // expansion, intra pairs) and aliased subplans don't share exchanges,
    // so an unmaterialized table would re-run the corpus scan + shingle
    // aggregation per reference. Checkpoint blocks free with the RDD (no
    // CacheManager entry to leak). Callers managing their own persisted
    // groups table use ...FromGroups directly.
    ngramJaccardPairsFromGroups(
      shingleGroups(docs, idCol, textCol, k).pin(),
      minJaccard, maxShingleDf, maxBucket)

  /** [[ngramJaccardPairs]] over a pre-collapsed (possibly persisted)
    * [[shingleGroups]] table — the corpus-scale two-step: persist the
    * collapse once (one scan + one aggregation) and run BOTH dedup
    * families (this and [[minhashLshPairsFromGroups]]) from the same
    * table, instead of re-collapsing inside each operator. */
  def ngramJaccardPairsFromGroups(groups: DataFrame, minJaccard: Double,
                                  maxShingleDf: Int = 0,
                                  maxBucket: Int = 10000): DataFrame = {
    val exploded = groups
      .select(col("rep").as("doc"), explode(col("key")).as("h"))
    val filtered =
      if (maxShingleDf > 0) {
        val hot = exploded.groupBy("h")
          .agg(count(lit(1)).as("df")).where(col("df") > maxShingleDf)
        exploded.join(hot, Seq("h"), "left_anti")
      } else exploded
    val dfTab = filtered.groupBy("h").agg(count(lit(1)).as("df"))
    // (df, hash) is the global total order; sort each doc's shingles by it.
    // Materialized (eager local checkpoint): the prefix explode and BOTH
    // sides of the verify join read this table — unmaterialized, the
    // df-join + collect_list aggregation would run three times.
    val sets = filtered.join(dfTab, "h")
      .select(col("doc"), struct(col("df"), col("h")).as("e"))
      .groupBy("doc")
      .agg(sort_array(collect_list(col("e"))).as("es"),
        count(lit(1)).as("n"))
      .pin()
    val prefixLen = (col("n") - ceil(lit(minJaccard) * col("n")) + 1).cast("int")
    // posexplode keeps each prefix element's position for PPJoin-style
    // positional pruning: overlap is bounded by the elements at or after
    // the shared position on each side, so pairs that can't reach the
    // equivalent overlap threshold alpha = ceil(t/(1+t) * (na+nb)) die
    // before the expensive verify join.
    val prefixes = sets.select(col("doc"), col("n"),
      posexplode(slice(col("es"), lit(1), prefixLen)).as(Seq("pos", "p")))
    val alphaFactor = minJaccard / (1.0 + minJaccard)
    // Pairs are generated WITHIN each prefix bucket (groupBy + collect +
    // double explode) rather than by self-joining the prefix table — a
    // self-join would recompute the whole scan->shingle->sort lineage for
    // both sides (aliased subplans don't share exchanges), which measured
    // ~2x the entire pipeline cost. One aggregation, one lineage.
    val bucketed = capBuckets(
      prefixes
        .groupBy("p")
        .agg(collect_list(struct(col("doc"), col("n"), col("pos"))).as("ms"))
        .where(size(col("ms")) > 1),
      maxBucket, "ngram_prefix_buckets")
    val cand = bucketed
      .select(explode(col("ms")).as("a"), col("ms"))
      .select(col("a"), explode(col("ms")).as("b"))
      .where(col("a.doc") < col("b.doc") &&
        // PPJoin LENGTH filter — J >= t forces t·|B| <= |A| (and vice
        // versa); a necessary condition, so no true pair can be lost —
        // it prunes wildly mismatched sizes before the positional test
        least(col("a.n"), col("b.n")) >=
          ceil(lit(minJaccard) * greatest(col("a.n"), col("b.n"))) &&
        least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos")) >=
          ceil(lit(alphaFactor) * (col("a.n") + col("b.n"))))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b")).distinct()
    // re-sort by VALUE (es is df-ordered): one sort per distinct set buys
    // the codegen'd merge-walk intersect on every candidate pair
    val hashed = sets.select(col("doc"),
      sort_array(transform(col("es"), e => e.getField("h"))).as("hs"),
      col("n"))
    val repPairs = cand
      .join(hashed.select(col("doc").as("id_a"), col("hs").as("hs_a"),
        col("n").as("size_a")), "id_a")
      .join(hashed.select(col("doc").as("id_b"), col("hs").as("hs_b"),
        col("n").as("size_b")), "id_b")
      // early-exit threshold pre-filter: J ≥ t ⟺ i ≥ t/(1+t)·(na+nb);
      // the −1 slack keeps the prefilter strictly NECESSARY under any
      // IEEE boundary disagreement with the exact division test below,
      // so no true pair can be lost — non-matching pairs (the vast
      // majority) abandon the merge walk after a few comparisons (r18)
      .where(sortedIntersectAtLeast(col("hs_a"), col("hs_b"),
        (ceil(lit(alphaFactor) * (col("size_a") + col("size_b"))) - 1)
          .cast("long")))
      .withColumn("intersection",
        sortedIntersectCount(col("hs_a"), col("hs_b")))
      .withColumn("jaccard",
        col("intersection") / (col("size_a") + col("size_b") - col("intersection")))
      .where(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "intersection", "size_a", "size_b")
    // expand representative pairs back to member pairs (sizes follow their
    // doc across the id reorder), add the trivial intra-group pairs
    val memb = groups.select(col("rep"), explode(col("ids")).as("m"))
    val cross = repPairs
      .join(memb.select(col("rep").as("id_a"), col("m").as("ma")), "id_a")
      .join(memb.select(col("rep").as("id_b"), col("m").as("mb")), "id_b")
      .select(when(col("ma") <= col("mb"),
          struct(col("ma").as("id_a"), col("mb").as("id_b"),
            col("intersection"), col("size_a"), col("size_b")))
        .otherwise(
          struct(col("mb").as("id_a"), col("ma").as("id_b"),
            col("intersection"), col("size_b").as("size_a"),
            col("size_a").as("size_b"))).as("p"))
      .select("p.*")
    val n = size(col("key")).cast("long")
    val intra = intraPairs(groups, Seq(
      "intersection" -> n, "size_a" -> n, "size_b" -> n))
    cross.unionByName(intra)
  }

  /** ASYMMETRIC containment pairs: (contained, container) where
    * |A∩B| ≥ ⌈t·|A|⌉ — the dedup question symmetric Jaccard CANNOT ask:
    * a tweet quoted inside an article, boilerplate wrapping a kept doc, a
    * chunk re-shipped inside a bigger crawl page all have LOW Jaccard
    * (the union is dominated by the big side) but containment ≈ 1.
    * Output is DIRECTIONAL — identical sets contain each other and emit
    * both orders.
    *
    * Blocking is the PPJoin prefix on the CONTAINED side only: sort each
    * set by global (df, hash), a set missing all of its |A|−⌈t·|A|⌉+1
    * rarest-first prefix elements from B cannot reach the overlap bound,
    * so candidates come from joining that short prefix (rare shingles by
    * construction — bounded fan-out) against the full exploded table;
    * the container side needs no prefix (its bound depends on |A|, which
    * varies per pair). `|B| ≥ ⌈t·|A|⌉` prunes before the exact
    * array-intersect confirm. Exact-identical sets collapse first and
    * member expansion restores them, like every operator of this family. */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       k: Int, minContainment: Double): DataFrame =
    containmentPairsFromGroups(
      shingleGroups(docs, idCol, textCol, k).pin(),
      minContainment)

  def containmentPairsFromGroups(groups: DataFrame,
                                 minContainment: Double): DataFrame =
    containmentFromSets(groups,
      containmentSets(groups).pin(), minContainment)

  /** Per-JVM cache of the df-sorted containment SETS table — derived
    * from the [[shingleGroupsFor]] collapse and INDEPENDENT of the
    * containment threshold, so repeated queries over the same corpus
    * (any threshold) reuse one build; the same index-artifact contract
    * as [[shingleGroupsFor]] itself. */
  private val containSetsCache =
    new graft.SessionMemo[(String, Int), DataFrame]()

  /** [[containmentPairs]] riding the per-dataset memos (the registry
    * form, the [[ngramPairsFor]] contract): the shingle collapse AND the
    * df-sorted sets build at most once per (session, key, k). */
  def containmentPairsFor(docs: DataFrame, idCol: String, textCol: String,
                          k: Int, minContainment: Double,
                          key: String): DataFrame = {
    val groups = shingleGroupsFor(docs, idCol, textCol, k, key)
    val sets = containSetsCache.getOrCompute(
      docs.sparkSession, (key, k))(
      containmentSets(groups).pin())
    containmentFromSets(groups, sets, minContainment)
  }

  /** The threshold-independent half: global df per shingle hash, each
    * set sorted by (df, h) with its size — one materialization serves
    * the prefix AND both verify sides. */
  private def containmentSets(groups: DataFrame): DataFrame = {
    val exploded = groups
      .select(col("rep").as("doc"), explode(col("key")).as("h"))
    val dfTab = exploded.groupBy("h").agg(count(lit(1)).as("df"))
    exploded.join(dfTab, "h")
      .select(col("doc"), struct(col("df"), col("h")).as("e"))
      .groupBy("doc")
      .agg(sort_array(collect_list(col("e"))).as("es"),
        count(lit(1)).as("n"))
      // the hash-sorted set rides in the memoized table: the verify join
      // needs it per query, and recomputing it there re-sorted every
      // array per candidate side on each threshold query
      .withColumn("hs",
        sort_array(transform(col("es"), e => e.getField("h"))))
  }

  private def containmentFromSets(groups: DataFrame, sets: DataFrame,
                                  minContainment: Double): DataFrame = {
    require(minContainment > 0 && minContainment <= 1,
      "minContainment in (0, 1]")
    val t = minContainment
    val prefixLen = (col("n") - ceil(lit(t) * col("n")) + 1).cast("int")
    // positions ride along on BOTH sides (the shared df-sorted order), so
    // the PPJoin positional residual prunes before the distinct: a match
    // at (pa, pb) bounds the remaining possible overlap by
    // min(na−pa, nb−pb), which must still reach ⌈t·na⌉
    val prefixes = sets.select(col("doc").as("a"), col("n").as("na"),
      posexplode(transform(slice(col("es"), lit(1), prefixLen),
        e => e.getField("h"))).as(Seq("pa", "h")))
    val full = sets.select(col("doc").as("b"), col("n").as("nb"),
      posexplode(transform(col("es"), e => e.getField("h")))
        .as(Seq("pb", "h")))
    // NO distinct on the raw candidates (r18): deduping 6M prefix-match
    // rows before the verify cost a corpus-scale exchange + two hash
    // aggregates (peak 0.5 GB at sf0.1) only to shrink 8.4M rows to 6M —
    // with the early-exit prefilter below, verifying the duplicates
    // directly is a few comparisons each, and the dedup moves to the
    // ~500-row survivor set where it is free. Identical output: a pair's
    // intersection/sizes are functions of the pair, so duplicate
    // candidate rows collapse to one identical row.
    val cand = prefixes.join(full, "h")
      .where(col("a") =!= col("b") &&
        least(col("na") - col("pa"), col("nb") - col("pb")) >=
          ceil(lit(t) * col("na")))
      .select("a", "b")
    // hs is precomputed in the memoized sets table (one sort per set per
    // corpus, not per threshold query)
    val hashed = sets.select(col("doc"), col("hs"), col("n"))
    val repPairs = cand
      .join(hashed.select(col("doc").as("a"), col("hs").as("hs_a"),
        col("n").as("size_a")), "a")
      .join(hashed.select(col("doc").as("b"), col("hs").as("hs_b"),
        col("n").as("size_b")), "b")
      .where(col("size_b") >= ceil(lit(t) * col("size_a")))
      // threshold pre-filter with two-sided early exit: identical verdict
      // to `count >= ceil(t·|A|)`, but the ~10⁴:1 non-matching candidate
      // majority abandons the merge walk in a few comparisons; only the
      // survivors pay the full count the output schema needs (r18)
      .where(sortedIntersectAtLeast(col("hs_a"), col("hs_b"),
        ceil(lit(t) * col("size_a")).cast("long")))
      .withColumn("intersection",
        sortedIntersectCount(col("hs_a"), col("hs_b")))
      .select(col("a").as("contained_id"), col("b").as("container_id"),
        col("intersection"), col("size_a"), col("size_b"))
      .distinct()
    // members: every member of rep a is contained in every member of rep
    // b; identical sets (same rep, n_same > 1) contain each other BOTH
    // ways — emit ordered pairs in both directions
    val memb = groups.select(col("rep"), explode(col("ids")).as("m"))
    val cross = repPairs
      .join(memb.select(col("rep").as("contained_id"), col("m").as("ma")),
        "contained_id")
      .join(memb.select(col("rep").as("container_id"), col("m").as("mb")),
        "container_id")
      .select(col("ma").as("contained_id"), col("mb").as("container_id"),
        col("intersection"), col("size_a"), col("size_b"))
    val n = size(col("key")).cast("long")
    val intra = groups.where(col("n_same") > 1)
      .select(col("ids"), n.as("nn"))
      .select(col("ids"), explode(col("ids")).as("ma"), col("nn"))
      .select(col("ma"), explode(col("ids")).as("mb"), col("nn"))
      .where(col("ma") =!= col("mb"))
      .select(col("ma").as("contained_id"), col("mb").as("container_id"),
        col("nn").as("intersection"), col("nn").as("size_a"),
        col("nn").as("size_b"))
    cross.unionByName(intra)
      .withColumn("containment_ppm",
        expr("cast(intersection * 1000000 div size_a as bigint)"))
  }

  /** MinHash + LSH near-duplicate pairs: n-hash signatures split into
    * `bands`, candidate pairs from band-bucket collisions, then an EXACT
    * Jaccard confirmation on the candidates (so precision is 1; recall is
    * the standard 1-(1-j^r)^b curve of the banding scheme).
    *
    * Scale: exact duplicates collapse to one representative per distinct
    * shingle set BEFORE banding (identical copies — the normal hot case of
    * web-scale dedup — never inflate a bucket), signatures are computed
    * scan-side in one pass, candidates come from a groupBy on
    * (band, bucket) with a `maxBucket` cap on distinct-set bucket size,
    * and representative pairs expand back to member pairs through slim
    * id-only joins, so the doc-level output is unchanged. */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      k: Int, numHashes: Int, bands: Int,
                      minJaccard: Double,
                      maxBucket: Int = 10000): DataFrame =
    // collapse materialized once — same multi-reference rationale as
    // [[ngramJaccardPairs]]
    minhashLshPairsFromGroups(
      shingleGroups(docs, idCol, textCol, k).pin(),
      numHashes, bands, minJaccard, maxBucket)

  /** Per-JVM cache of materialized [[shingleGroups]] tables, keyed by a
    * caller-chosen dataset key — the "collapse once, run every dedup
    * family from the same table" usage the two-step API documents, made
    * the default for repeated queries over the same corpus (same shape as
    * [[Similarity.ivfLayoutFor]]: the collapse is an index-like artifact,
    * deterministic for a given corpus, so a cache hit is equivalent to a
    * recompute). Session binding + dead-session eviction: see
    * [[graft.SessionMemo]]. */
  private val groupsCache = new graft.SessionMemo[(String, Int), DataFrame]()

  /** The [[shingleGroups]] collapse for `docs` under dataset key `key`,
    * computed and eagerly checkpointed at most once per (session, key, k)
    * per JVM. `key` must uniquely identify the input dataset (e.g. its
    * directory) — different docs under the same key would silently reuse
    * the first collapse. */
  def shingleGroupsFor(docs: DataFrame, idCol: String, textCol: String,
                       k: Int, key: String): DataFrame =
    groupsCache.getOrCompute(docs.sparkSession, (key, k))(
      shingleGroups(docs, idCol, textCol, k).pin())

  /** Per-JVM cache of near-dup CLUSTER tables: the n-gram Jaccard pairs +
    * [[connectedComponents]] loop, run at most once per (session, key, k,
    * threshold) and shared by every consumer of the cluster assignment
    * (cluster listing, survivor selection, pipeline retention). The CC
    * loop is the most expensive job in the dedup family — paying it once
    * per dataset instead of once per query is the same index-artifact
    * rationale as [[shingleGroupsFor]]. Output columns: (doc, cluster). */
  private val clustersCache =
    new graft.SessionMemo[(String, Int, Double), DataFrame]()

  /** Per-JVM cache of n-gram Jaccard PAIR tables (the PPJoin output) —
    * the artifact both the pair-listing query and the cluster builder
    * consume; same cache contract as [[shingleGroupsFor]]. */
  private val pairsCache =
    new graft.SessionMemo[(String, Int, Double), DataFrame]()

  /** Per-JVM cache of REFERENCE-corpus PPJoin indexes for the
    * incremental (cross-corpus) path: the reference side's shingle sets,
    * its document-frequency table and its positional prefix rows. Keyed
    * by (dataset key, k, minJaccard) — the prefix LENGTH depends on the
    * threshold, so a lower-threshold query must never probe a
    * higher-threshold (shorter) prefix index: that would silently drop
    * pairs whose only shared shingle sits in the truncated tail. Built
    * once per (corpus generation, threshold), probed by every batch. */
  private val refIndexCache =
    new graft.SessionMemo[(String, Int, Double),
      (DataFrame, DataFrame, DataFrame)]()

  def ngramPairsFor(docs: DataFrame, idCol: String, textCol: String,
                    k: Int, minJaccard: Double, key: String): DataFrame =
    pairsCache.getOrCompute(docs.sparkSession, (key, k, minJaccard))(
      ngramJaccardPairsFromGroups(
        shingleGroupsFor(docs, idCol, textCol, k, key), minJaccard)
        .pin())

  /** Near-dup clusters for `docs` under dataset key `key` (same key
    * contract as [[shingleGroupsFor]]): memoized
    * `connectedComponents(ngramPairsFor(...))`. */
  def ngramClustersFor(docs: DataFrame, idCol: String, textCol: String,
                       k: Int, minJaccard: Double, key: String): DataFrame =
    clustersCache.getOrCompute(docs.sparkSession, (key, k, minJaccard)) {
      val pairs = ngramPairsFor(docs, idCol, textCol, k, minJaccard, key)
      // connectedComponents already returns an eagerly checkpointed,
      // loop-cache-free frame — safe to hold while the session lives
      connectedComponents(pairs, "id_a", "id_b")
    }

  /** Sorted-neighborhood dedup blocking (the Hernández–Stolfo
    * merge/purge method): every document gets a global position in the
    * total order of a blocking key (here the first `keyLen` characters
    * of the normalized text, tiebroken by id), and each document is
    * compared only against its `window` successors in that order. The
    * candidate count is LINEAR — n·window pairs — with no banding,
    * bucketing, or signature computation, which makes SNM the classic
    * complement to the LSH/prefix-filter family: it wins when
    * near-duplicates agree on their sort key (shared prefixes, titles,
    * normalized names) and `window` is small.
    *
    * Scale shape: the global order comes from
    * [[Ranking.globalRowNumbers]] (range-partitioned distributed sort +
    * per-partition offsets — no single-reducer window); neighbor
    * candidates are generated by exploding the CONSTANT offsets
    * 1..window and equi-joining on the shifted sequence number — a range
    * join unrolled into `window` equi-pairs, so it hash-partitions like
    * any join and never degrades to a nested loop. The exact-Jaccard
    * confirm is row-local array intersection on the candidate pair.
    * Shuffles: the range sort + one equi-join on `seq`.
    *
    * Output matches [[ngramJaccardPairs]]: (id_a, id_b, intersection,
    * size_a, size_b) with id_a < id_b, Jaccard ≥ `minJaccard`, computed
    * over distinct word-k-shingle hashes. */
  def sortedNeighborhoodPairs(docs: DataFrame, idCol: String,
                              textCol: String, keyLen: Int, window: Int,
                              k: Int, minJaccard: Double): DataFrame = {
    require(keyLen >= 1, "keyLen >= 1")
    require(window >= 1, "window >= 1")
    val base = docs.select(col(idCol).as("doc_id"),
      substring(lower(trim(col(textCol))), 1, keyLen).as("bkey"),
      sort_array(shingleHashes(col(textCol), k)).as("sh"))
    val seqd = graft.operators.Ranking
      .globalRowNumbers(base, Seq("bkey", "doc_id"))
      .select(col("doc_id"), col("seq"), col("sh"))
    val right = seqd.select(col("seq").as("seq_b"),
      col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    seqd
      .select(col("doc_id"), col("sh"), col("seq"),
        explode(sequence(lit(1L), lit(window.toLong))).as("off"))
      .withColumn("seq_b", col("seq") + col("off"))
      .join(right, "seq_b")
      .withColumn("sa", size(col("sh")).cast("long"))
      .withColumn("sb", size(col("sh_b")).cast("long"))
      // early-exit pre-filter (−1 slack, see ngramJaccardPairsFromGroups)
      .where(sortedIntersectAtLeast(col("sh"), col("sh_b"),
        (ceil(lit(minJaccard / (1.0 + minJaccard)) *
          (col("sa") + col("sb"))) - 1).cast("long")))
      .withColumn("intersection",
        sortedIntersectCount(col("sh"), col("sh_b")))
      .where(col("intersection") / (col("sa") + col("sb") -
        col("intersection")) >= minJaccard)
      .select(least(col("doc_id"), col("doc_b")).as("id_a"),
        greatest(col("doc_id"), col("doc_b")).as("id_b"),
        col("intersection"),
        when(col("doc_id") <= col("doc_b"), col("sa")).otherwise(col("sb"))
          .as("size_a"),
        when(col("doc_id") <= col("doc_b"), col("sb")).otherwise(col("sa"))
          .as("size_b"))
  }

  /** The exact-collapse table (key = sorted distinct shingle-hash set,
    * ids = members, rep = min id, n_same = |ids|): the materialization
    * point for corpus-scale dedup — persist this once (one scan + one
    * aggregation) and feed it to [[minhashLshPairsFromGroups]]. */
  def shingleGroups(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    // shingle identity only -> hashed shingles: signatures minhash the
    // 64-bit shingle hashes and the exact-confirm join intersects long
    // arrays, so no shingle string is ever built or shuffled
    val withSets = docs
      .select(col(idCol).as("doc"),
        sort_array(shingleHashes(col(textCol), k)).as("sh"))
      .where(size(col("sh")) > 0)
    collapseBy(withSets, col("sh"))
  }

  /** [[minhashLshPairs]] over a pre-collapsed (possibly persisted)
    * [[shingleGroups]] table. */
  def minhashLshPairsFromGroups(groups: DataFrame, numHashes: Int,
                                bands: Int, minJaccard: Double,
                                maxBucket: Int = 10000): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands
    // Materialize the signature ONCE before banding: lshBands slices the
    // signature `bands` times, and feeding it the raw minhash expression
    // would duplicate the whole numHashes-fold computation per band
    // (measured 30x slowdown on the bench before this split).
    val sig = groups.select(col("rep").as("doc"), col("key").as("sh"),
      minhashSignature(col("key"), numHashes).as("sig"))
    // The shingle set rides along INTO the buckets so the exact-confirm
    // step intersects arrays already present in the pair row — the
    // alternative (join candidate ids back to a sets table) re-runs the
    // scan->shingle lineage once per join side, which measured as the
    // dominant cost. Pairs are generated within buckets via one
    // aggregation (a self-join would also double the lineage). Shuffle
    // trade: sets travel once per band, one row per DISTINCT set.
    val buckets = sig
      .select(struct(col("doc"), col("sh")).as("ds"),
        explode(lshBands(col("sig"), bands, rows)).as("b"))
      .select(col("ds"), col("b.band").as("band"), col("b.bucket").as("bucket"))
    val repPairs = capBuckets(
      buckets
        .groupBy("band", "bucket").agg(collect_list(col("ds")).as("ms"))
        .where(size(col("ms")) > 1),
      maxBucket, "minhash_lsh_buckets")
      .select(explode(col("ms")).as("a"), col("ms"))
      .select(col("a"), explode(col("ms")).as("b"))
      .where(col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      // early-exit pre-filter (−1 slack, see ngramJaccardPairsFromGroups)
      .where(sortedIntersectAtLeast(col("sh_a"), col("sh_b"),
        (ceil(lit(minJaccard / (1.0 + minJaccard)) *
          (size(col("sh_a")) + size(col("sh_b"))).cast("long")) - 1)
          .cast("long")))
      .withColumn("intersection",
        sortedIntersectCount(col("sh_a"), col("sh_b")).cast("int"))
      .withColumn("union_size",
        size(col("sh_a")) + size(col("sh_b")) - col("intersection"))
      .withColumn("jaccard", col("intersection") / col("union_size"))
      .where(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "intersection")
      // dedup AFTER the verify (r18, same move as containment): a pair
      // colliding in several bands verifies once per collision — a few
      // comparisons each under the early-exit walk — while the old
      // band-level dropDuplicates shuffled every candidate row WITH both
      // shingle arrays aboard just to save those re-walks; here the
      // distinct moves only the (id, id, n) survivor rows. Identical
      // output: intersection is a function of the pair.
      .distinct()
    val memb = groups.select(col("rep"), explode(col("ids")).as("m"))
    val cross = repPairs
      .join(memb.select(col("rep").as("id_a"), col("m").as("ma")), "id_a")
      .join(memb.select(col("rep").as("id_b"), col("m").as("mb")), "id_b")
      .select(least(col("ma"), col("mb")).as("id_a"),
        greatest(col("ma"), col("mb")).as("id_b"), col("intersection"))
    val intra = intraPairs(groups, Seq("intersection" -> size(col("key"))))
    cross.unionByName(intra)
  }

  /** 64-bit SimHash per document, computed entirely row-local as a custom
    * codegen'd expression ([[org.apache.spark.sql.graft.SimHash64]]):
    * tokens → per-token 64-bit hash → signed bit votes → sign bits packed
    * into a long, in one primitive loop. Zero shuffles for the fingerprint
    * itself. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      org.apache.spark.sql.GraftBridge.column(
        org.apache.spark.sql.graft.SimHash64(
          org.apache.spark.sql.GraftBridge.expression(tokens(col(textCol)))))
        .as("simhash"))

  /** PORTABLE-hash SimHash signatures — the oracle twin of [[simhash]]'s
    * xxhash64 machinery, with the per-token hash swapped for the first 60
    * bits of md5 (a hash both Spark and the SQL oracle compute
    * identically, the `text_fingerprints_md5` pattern): token → 60-bit
    * integer, signed bit votes, sign bits packed into one long. Same
    * zero-shuffle scale shape per document (one explode + one grouped
    * integer aggregation); exists so the simhash MATH gets a full hash
    * oracle, which the engine-specific fingerprint can't. Ties (vote sum
    * 0) resolve to bit 0. Docs with no tokens are absent. */
  def simhashMd5Signatures(docs: DataFrame, idCol: String, textCol: String,
                           bits: Int = 60): DataFrame = {
    require(bits >= 1 && bits <= 60, "md5 prefix provides up to 60 bits")
    // tokenize + per-token md5 is the map-side cost; fan small scans out
    // so it doesn't run single-task (graft.Fanout — identity on
    // multi-split data; the doc-key agg shuffles regardless)
    val toks = graft.Fanout.maybe(docs, idCol)
      .where(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("t"))
      .where(col("t") =!= "")
      .select(col("doc_id"),
        conv(substring(md5(col("t")), 1, 15), 16, 10).cast("long").as("h"))
    val voteCols = (0 until bits).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"_b$i"))
    toks.groupBy("doc_id").agg(voteCols.head, voteCols.tail: _*)
      .select(col("doc_id"),
        (0 until bits).map(i =>
          when(col(s"_b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash60"))
  }

  /** Deterministic universal-hash constants for [[minhashMd5Signatures]]:
    * (a_i, b_i) for h_i(x) = (a_i·x + b_i) mod p with p = 2^31 − 1. One
    * generator — [[org.apache.spark.sql.graft.MinHashMd5Signature.consts]]
    * — feeds the kernel, this Spark plan AND the SQL oracle's literals,
    * so the three can never drift. a_i is forced nonzero. */
  def minhashMd5Consts(n: Int): Seq[(Long, Long)] =
    org.apache.spark.sql.graft.MinHashMd5Signature.consts(n)

  /** PORTABLE-hash MinHash signatures (wide: m0..m{n−1} per document):
    * word-k-shingles → 28-bit md5-prefix integers → n independent
    * (a·x + b) mod p minima, all inside ONE codegen-called kernel
    * ([[org.apache.spark.sql.graft.MinHashMd5Signature]]) — the oracle
    * twin of the xxhash64 [[GraftFunctions.minhashSignature]]. The old
    * dataflow exploded distinct shingles and min-AGGREGATED n columns
    * back per doc: a row blowup plus a shuffle for row-local arithmetic.
    * Scale shape now: a pure fanned scan, zero exchanges. Docs with
    * < k tokens are absent (the kernel returns NULL; filtered). */
  def minhashMd5Signatures(docs: DataFrame, idCol: String, textCol: String,
                           k: Int = 2, numHashes: Int = 32): DataFrame = {
    val sig = org.apache.spark.sql.GraftBridge.column(
      org.apache.spark.sql.graft.MinHashMd5Signature(
        org.apache.spark.sql.GraftBridge.expression(
          shingles(col(textCol), k)), numHashes))
    graft.Fanout.maybe(docs, idCol)
      .where(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), sig.as("_sig"))
      .where(col("_sig").isNotNull)
      .select(col("doc_id") +: (0 until numHashes).map(i =>
        expr(s"_sig[$i]").as(s"m$i")): _*)
  }

  /** MinHash-LSH pair enumeration in the PORTABLE md5-hash space — the
    * hash-oracled form of [[minhashLshPairsFromGroups]]: signatures come
    * from [[org.apache.spark.sql.graft.MinHashMd5Signature]] (the green
    * `dedup_minhash_md5` kernel), band keys are the RAW rows-per-band
    * min tuples (exact equality grouping — no bucket hashing, so a hash
    * collision can never invent a candidate the SQL replay lacks), and
    * the exact-Jaccard confirm runs on the shingle STRING sets
    * (`array_intersect` — byte-identical to the oracle's list
    * intersection, no xxhash-collision caveat). Identical shingle sets
    * exact-collapse first (clone-adversarial, the house rule); banding
    * runs on representatives only — sound because a signature is a
    * function of the SET, so per-member banding would collide
    * identically.
    *
    * Scale shape: one collapse aggregation, one bands-way explode of the
    * DISTINCT-set table, per-bucket pair generation capped at
    * `maxBucket` (observed metric `minhash_md5_lsh_buckets`), member
    * expansion restores clone pairs. Output: (id_a < id_b,
    * intersection, union_size) for verified pairs with Jaccard ≥
    * `minJaccard`. */
  def minhashMd5LshPairs(docs: DataFrame, idCol: String, textCol: String,
                         k: Int = 2, numHashes: Int = 32, bands: Int = 8,
                         minJaccard: Double = 0.8,
                         maxBucket: Int = 10000): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands
    val sets = docs
      .where(col(textCol).isNotNull)
      .select(col(idCol).as("doc"),
        sort_array(array_distinct(shingles(col(textCol), k))).as("shs"))
      .where(size(col("shs")) > 0)
    val groups = sets.groupBy(col("shs"))
      .agg(min(col("doc")).as("rep"), collect_list(col("doc")).as("ids"))
      .pinLazy() // three consumers: banding, member expansion, intra
    val sig = groups.select(col("rep"), col("shs"),
      org.apache.spark.sql.GraftBridge.column(
        org.apache.spark.sql.graft.MinHashMd5Signature(
          org.apache.spark.sql.GraftBridge.expression(col("shs")),
          numHashes)).as("sig"))
    val banded = sig
      .select(struct(col("rep"), col("shs")).as("ds"),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"),
            slice(col("sig"), b * rows + 1, rows).as("key"))): _*)).as("bk"))
      .select(col("ds"), col("bk.band").as("band"), col("bk.key").as("key"))
    val repPairs = capBuckets(
      banded.groupBy("band", "key").agg(collect_list(col("ds")).as("ms"))
        .where(size(col("ms")) > 1),
      maxBucket, "minhash_md5_lsh_buckets")
      .select(explode(col("ms")).as("a"), col("ms"))
      .select(col("a"), explode(col("ms")).as("b"))
      .where(col("a.rep") < col("b.rep"))
      .select(col("a.rep").as("ra"), col("b.rep").as("rb"),
        col("a.shs").as("sh_a"), col("b.shs").as("sh_b"))
      .withColumn("intersection",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("union_size",
        size(col("sh_a")).cast("long") + size(col("sh_b")).cast("long")
          - col("intersection"))
      .where(col("intersection") / col("union_size") >= minJaccard)
      .select("ra", "rb", "intersection", "union_size")
      // dedup AFTER the verify (r18, the containment move): the old
      // band-level dropDuplicates exchanged every candidate row with
      // BOTH string shingle arrays aboard just to avoid re-verifying a
      // pair that collided in several bands; verifying the few
      // collisions costs less than shuffling the arrays, and the
      // distinct now moves only (id, id, n, n) survivor rows. Identical
      // output: intersection/union are functions of the pair.
      .distinct()
    val memb = groups.select(col("rep"), explode(col("ids")).as("m"))
    val cross = repPairs
      .join(memb.select(col("rep").as("ra"), col("m").as("ma")), "ra")
      .join(memb.select(col("rep").as("rb"), col("m").as("mb")), "rb")
      .select(least(col("ma"), col("mb")).as("id_a"),
        greatest(col("ma"), col("mb")).as("id_b"),
        col("intersection"), col("union_size"))
    val intra = groups.where(size(col("ids")) > 1)
      .select(size(col("shs")).cast("long").as("sz"),
        explode(col("ids")).as("a"), col("ids"))
      .select(col("sz"), col("a"), explode(col("ids")).as("b"))
      .where(col("a") < col("b"))
      .select(col("a").as("id_a"), col("b").as("id_b"),
        col("sz").as("intersection"), col("sz").as("union_size"))
    cross.unionByName(intra)
  }

  /** Measured LSH recall curve: for every EXACT Jaccard-≥-`minJaccard`
    * pair ([[ngramPairsFor]] — the green all-pairs relation), was it
    * FOUND by the banded md5-MinHash candidate generation
    * ([[minhashMd5LshPairs]] at the same threshold)? Rolled up per
    * Jaccard decile as (n_exact, n_found, recall_ppm) — the measured
    * form of the 1−(1−J^r)^b s-curve every LSH parameter choice is
    * betting on, over the corpus' own pair distribution instead of the
    * theory. Exact integers end to end (decile = min(9, 10i div u);
    * found ⊆ exact since the confirm applies the same exact metric).
    *
    * Scale shape: both inputs are the already-bounded pair relations;
    * the eval itself is one pair-keyed join + a ≤10-group rollup. */
  def lshRecallEval(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 2, numHashes: Int = 32, bands: Int = 8,
                    minJaccard: Double = 0.7, key: String): DataFrame = {
    val exact = ngramPairsFor(docs, idCol, textCol, k, minJaccard, key)
      .select(col("id_a"), col("id_b"),
        col("intersection").cast("long").as("i"),
        (col("size_a") + col("size_b") - col("intersection"))
          .cast("long").as("u"))
    val found = minhashMd5LshPairs(docs, idCol, textCol, k, numHashes,
      bands, minJaccard)
      .select(col("id_a"), col("id_b"), lit(1L).as("found"))
    exact.join(found, Seq("id_a", "id_b"), "left_outer")
      .withColumn("jacc_decile", least(lit(9L), expr("(i * 10) div u")))
      .groupBy(col("jacc_decile"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("found"), lit(0L))).as("n_found"))
      .withColumn("recall_ppm", expr(
        "cast(cast(n_found as decimal(38,0)) * 1000000 div n_exact" +
          " as bigint)"))
  }

  /** SimHash near-duplicate pairs with Hamming distance ≤ `maxHamming`,
    * using the standard pigeonhole blocking: split the 64-bit fingerprint
    * into `maxHamming + 1` chunks — any pair within distance d agrees on at
    * least one chunk — and join per chunk. Only candidate pairs pay the
    * XOR + popcount check. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int, maxBucket: Int = 10000): DataFrame =
    fingerprintHammingPairs(
      simhash(docs, idCol, textCol), "doc_id", "simhash",
      maxHamming, maxBucket, metric = "simhash_buckets")

  /** Hamming-distance-≤-d pairs among arbitrary 64-bit fingerprints — the
    * fingerprint-agnostic core of [[simhashPairs]], reused for perceptual
    * image hashes ([[Multimodal.perceptualHashes]]). Standard pigeonhole
    * blocking: split 64 bits into `maxHamming + 1` chunks — any pair
    * within distance d agrees on at least one chunk — join per chunk, and
    * only candidates pay the XOR + popcount check. Output:
    * (id_a, id_b, hamming) with id_a < id_b. */
  def fingerprintHammingPairs(fps0: DataFrame, idCol: String, fpCol: String,
                              maxHamming: Int, maxBucket: Int = 10000,
                              metric: String = "fp_buckets"): DataFrame = {
    val chunks = maxHamming + 1
    // Chunk boundaries cover all 64 bits even when chunks doesn't divide 64
    // (last chunks get the remainder); width == 64 (maxHamming = 0) needs
    // mask -1L since (1L << 64) - 1 overflows to 0 and would degenerate the
    // blocked join into an all-pairs cross product.
    val bounds = (0 to chunks).map(c => c * 64 / chunks)
    // equal fingerprints collapse to one representative before blocking:
    // they'd land together in EVERY chunk block (the hot-bucket case), and
    // they are pairs by definition (hamming 0 <= any threshold)
    val fps = fps0.select(col(idCol).as("doc"), col(fpCol).as("fp"))
    val groups = collapseBy(fps, col("fp"))
    val blocked = groups.select(col("rep").as("doc_id"),
      col("key").as("fp"),
      explode(array((0 until chunks).map { c =>
        val lo = bounds(c)
        val w = bounds(c + 1) - lo
        val mask = if (w >= 64) -1L else (1L << w) - 1
        struct(lit(c).as("chunk"),
          shiftright(col("key"), lo)
            .bitwiseAND(lit(mask)).as("ckey"))
      }: _*)).as("b"))
      .select(col("doc_id"), col("fp"),
        col("b.chunk").as("chunk"), col("b.ckey").as("ckey"))
    // pairs within blocks via one aggregation (see ngramJaccardPairs note)
    val repPairs = capBuckets(
      blocked
        .groupBy("chunk", "ckey")
        .agg(collect_list(struct(col("doc_id"), col("fp"))).as("ms"))
        .where(size(col("ms")) > 1),
      maxBucket, metric)
      .select(explode(col("ms")).as("a"), col("ms"))
      .select(col("a"), explode(col("ms")).as("b"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
    val memb = groups.select(col("rep"), explode(col("ids")).as("m"))
    val cross = repPairs
      .join(memb.select(col("rep").as("id_a"), col("m").as("ma")), "id_a")
      .join(memb.select(col("rep").as("id_b"), col("m").as("mb")), "id_b")
      .select(least(col("ma"), col("mb")).as("id_a"),
        greatest(col("ma"), col("mb")).as("id_b"), col("hamming"))
    val intra = intraPairs(groups, Seq("hamming" -> lit(0)))
    cross.unionByName(intra)
  }

  /** Embedding near-duplicates: pairs with cosine ≥ `minCosine`. Blocking
    * by sign-bit bucket with Hamming-1 multi-probe (each vector lands in
    * its own bucket and probes the dims adjacent ones) keeps the self-join
    * from going quadratic while recovering pairs that straddle one
    * hyperplane; pairs meeting in several buckets are deduped before the
    * cosine check. `exact = true` skips blocking (test-scale ground truth).
    */
  def embeddingPairs(emb: DataFrame, idCol: String, vecCol: String,
                     minCosine: Double, exact: Boolean = false,
                     signDims: Int = 4): DataFrame = {
    val base = emb.select(col(idCol).as("vid"), col(vecCol).as("v"))
    // EXACT-COLLAPSE first — the uniform defense of every blocking family
    // (the 10× identical-copy blowup measured this path at ~30× before:
    // k byte-identical crawl-copy embeddings multiplied every bucket's
    // candidate join k²). Identical vectors form ONE group keyed by the
    // raw array; only representatives enter the bucket join, and member
    // expansion afterwards reconstructs the per-row pair output exactly
    // (cross pairs of matched groups are real output; intra-group pairs
    // qualify iff the group's own self-cosine passes — computed with the
    // same IEEE expression the uncollapsed pair would have used, so
    // zero vectors still never match and results stay bit-identical).
    // LAZY pin, not persist: groups is consumed three times (reps,
    // member expansion, intra pairs). A persist() here leaks — the
    // CacheManager keys on the plan and holds the entry for the session
    // lifetime, one per distinct input (round-12 ADVICE). A lazy pin
    // materializes on first consumption (no plan-build job), its blocks
    // are ContextCleaner-GC'd with the RDD, and in reliable mode
    // (spark.graft.checkpoint.mode) it survives executor loss.
    val groups = base.groupBy(col("v"))
      .agg(min(col("vid")).as("rep"), collect_list(col("vid")).as("ids"),
        count(lit(1)).as("n_same"))
      .pinLazy()
    val reps = groups.select(col("rep").as("vid"), col("v"))
    val candidates =
      if (exact) {
        reps.select(col("vid").as("id_a"), col("v").as("v_a"))
          .crossJoin(reps.select(col("vid").as("id_b"), col("v").as("v_b")))
          .where(col("id_a") < col("id_b"))
      } else {
        // ASYMMETRIC multi-probe: only the left side probes its Hamming-1
        // buckets, the right side sits in its own bucket — a pair qualifies
        // iff its buckets are within Hamming distance 1, and each ordered
        // pair is generated at most once (the probed row meets the other's
        // single own-bucket row in exactly one bucket), so no dedup pass.
        // Probing BOTH sides doubles the effective radius and, at 4 sign
        // dims, covers ~70% of all pairs — measured 11x slower for the
        // extra (mostly below-threshold) candidates. The embedding lineage
        // is a bare scan, so the two-sided join beats carrying fat vector
        // arrays through a collect_list.
        val probed = reps.select(
          explode(Similarity.probeBuckets(col("v"), signDims,
            multiProbe = true)).as("bucket"),
          col("vid").as("id_a"), col("v").as("v_a"))
        val own = reps.select(
          Similarity.signBucket(col("v"), signDims).as("bucket"),
          col("vid").as("id_b"), col("v").as("v_b"))
        probed.join(own, Seq("bucket"))
          .where(col("id_a") < col("id_b"))
          .select("id_a", "id_b", "v_a", "v_b")
      }
    val repPairs = candidates
      .withColumn("cos", cosineSim(col("v_a"), col("v_b")))
      .where(col("cos") >= minCosine)
      .select("id_a", "id_b")
    val memb = groups.select(col("rep"), explode(col("ids")).as("m"))
    val cross = repPairs
      .join(memb.select(col("rep").as("id_a"), col("m").as("ma")), "id_a")
      .join(memb.select(col("rep").as("id_b"), col("m").as("mb")), "id_b")
      .select(least(col("ma"), col("mb")).as("id_a"),
        greatest(col("ma"), col("mb")).as("id_b"))
    val intra = groups.where(col("n_same") > 1 &&
        cosineSim(col("v"), col("v")) >= minCosine)
      .select(col("ids"), explode(col("ids")).as("ma"))
      .select(col("ma"), explode(col("ids")).as("mb"))
      .where(col("ma") < col("mb"))
      .select(col("ma").as("id_a"), col("mb").as("id_b"))
    cross.unionByName(intra)
  }

  /** SEMANTIC deduplication, SemDeDup-style (Abbas et al. 2023,
    * arXiv:2303.09540): embeddings are blocked into codebook cells and a
    * row is a semantic duplicate iff an EARLIER-id row in ITS CELL is
    * cosine-similar above the threshold — the smallest id of each
    * near-duplicate neighborhood always survives (deterministic, order-
    * free). Output: (vec_id, cell, is_dup, dup_of) where `dup_of` is the
    * smallest qualifying earlier id (null for survivors).
    *
    * EXACT integer math end to end, so the whole pass replays in SQL
    * (registry key `dedup_semantic`): vectors milli-quantize
    * ([[Similarity.quantizeMilli]]), the similarity test
    * `cos² ≥ simSqPpm/1e6` is evaluated as
    * `score²·1e6 ≥ simSqPpm·|a|²·|b|²` in decimal(38,0) — products reach
    * ~10²⁰, past int64, and the decimal keeps the comparison exact where
    * a double would round. `score > 0` guards the square test (a strongly
    * ANTI-similar pair must not pass), and a zero vector (score 0 against
    * everything) is never a duplicate.
    *
    * Scale shape: the only join is the within-cell self-join — shuffle
    * once on the cell, per-cell work bounded by `maxCell`² with hot cells
    * DROPPED from pairing (their rows all survive, conservatively — never
    * wrongly deleted) and the drop observed (`semantic_dedup_cells`
    * metric), same cap discipline as the shingle paths. At corpus scale
    * the cells come from the trained codebook (the IVF layout already
    * partitions by them), so the pass reads cell-local data only;
    * the fixed literal codebook here is what buys the SQL oracle. */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
                    centroids: Seq[Seq[Long]], simSqPpm: Long = 810000L,
                    maxCell: Int = 100000): DataFrame =
    semanticDedupAssigned(emb
      .select(col(idCol).cast("long").as("vec_id"),
        Similarity.quantizeMilli(col(vecCol)).as("iq"),
        Similarity.cellOf(col(vecCol), centroids).as("cell")),
      simSqPpm, maxCell)

  /** [[semanticDedup]] over an AT-REST IVF layout ([[Similarity.writeIvf]]
    * — including one grown by [[Similarity.appendToIvf]]): the cells are
    * already assigned on disk, so the pass reads the cell-partitioned
    * corpus and goes straight to within-cell pairing — the index that
    * similarity search maintains doubles as the dedup blocking, no
    * re-assignment scan. Blocked dedup is defined RELATIVE to its
    * blocking: results follow the layout's (learned) cells, exactly as
    * the registry form's follow the fixed codebook. */
  def semanticDedupAtRest(spark: org.apache.spark.sql.SparkSession,
                          path: String, idCol: String, vecCol: String,
                          simSqPpm: Long = 810000L,
                          maxCell: Int = 100000): DataFrame =
    semanticDedupAssigned(spark.read.parquet(s"$path/data")
      .select(col(idCol).cast("long").as("vec_id"),
        Similarity.quantizeMilli(col(vecCol)).as("iq"), col("cell")),
      simSqPpm, maxCell)

  /** Shared core of the semantic-dedup forms: `assigned` must carry
    * (vec_id, iq, cell). One body so the in-memory and at-rest paths
    * cannot drift.
    *
    * EXACT-COLLAPSE first (the same defense every text blocking path
    * has): identical quantized vectors in a cell form ONE group keyed by
    * (cell, iq), and only group REPRESENTATIVES (min id) enter the
    * within-cell pair join — the 1×→10× blowup measured the uncollapsed
    * join at ~100× cost under 10 byte-identical copies per vector (k
    * copies multiply the candidate join k², and identical crawl-copy
    * embeddings are exactly the common case). The original per-row
    * output is then reconstructed EXACTLY, because for a member v of
    * group A, min{u < v : u matches v} = min over the matching groups'
    * own minima that are < v — a group's minimum is the smallest
    * candidate it can contribute. Zero-norm groups never match anything
    * (the score > 0 guard), including their own copies — preserved by
    * keeping n2 = 0 groups out of the head lists entirely.
    *
    * The hot-cell cap now counts GROUPS (distinct vectors), not rows —
    * the quantity that actually drives join cost; a cell of a million
    * identical copies is one group and never drops. */
  private def semanticDedupAssigned(assigned: DataFrame, simSqPpm: Long,
                                    maxCell: Int): DataFrame = {
    require(simSqPpm >= 0 && simSqPpm <= 1000000L,
      "simSqPpm is cos² in parts-per-million: [0, 1000000]")
    val base = assigned
    val sized = base.withColumn("n2", dotLong(col("iq"), col("iq")))
    // one row per DISTINCT vector per cell
    val groups = sized.groupBy(col("cell"), col("iq"), col("n2"))
      .agg(min(col("vec_id")).as("gmin"))
    val hot = groups.groupBy("cell").agg(count(lit(1)).as("_c"))
      .observe("semantic_dedup_cells",
        sum(when(col("_c") > maxCell, 1L).otherwise(0L))
          .as("dropped_cells"))
      .where(col("_c") > maxCell).select("cell")
    val joinable = groups.join(broadcast(hot), Seq("cell"), "left_anti")
    val prior = joinable.select(col("cell"),
      col("gmin").as("head_b"), col("iq").as("iq_b"), col("n2").as("n2_b"))
    val d = (c: Column) => c.cast("decimal(19,0)")
    // matching group pairs, BOTH directions (a member needs heads from
    // every matching group, whichever side has the smaller minimum) plus
    // the group's own head for its intra-group copies (identical nonzero
    // vectors always match themselves: cos² = 1 ≥ any threshold, and the
    // n2 > 0 filter preserves the zero-vector non-match)
    val crossHeads = joinable.join(prior, Seq("cell"))
      .where(col("gmin") =!= col("head_b"))
      .withColumn("score", dotLong(col("iq"), col("iq_b")))
      .where(col("score") > 0 &&
        d(col("score")) * d(col("score")) * d(lit(1000000L)) >=
          d(lit(simSqPpm)) * d(col("n2")) * d(col("n2_b")))
      .select(col("cell"), col("iq"), col("head_b").as("head"))
    val selfHeads = joinable.where(col("n2") > 0)
      .select(col("cell"), col("iq"), col("gmin").as("head"))
    val heads = crossHeads.unionByName(selfHeads)
    // fan heads back to members on the collapse key; the smallest
    // matching head below v is v's dup_of
    val dups = sized.join(heads, Seq("cell", "iq"))
      .where(col("head") < col("vec_id"))
      .groupBy("vec_id").agg(min(col("head")).as("dup_of"))
    base.join(dups, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("cell"),
        col("dup_of").isNotNull.as("is_dup"), col("dup_of"))
  }

  /** Connected components over an undirected near-duplicate pair list —
    * the step every dedup family needs between "pairs found" and "one
    * representative kept": transitively-linked documents form ONE cluster
    * (a~b, b~c ⇒ {a,b,c}), labeled by the cluster's minimum id.
    *
    * Algorithm: hash-min label propagation — every node starts as its own
    * label; each round, a node adopts the minimum label among itself and
    * its neighbors; fixpoint when no label changes. Each round is one
    * (edge ⋈ label) shuffle + a min-aggregation — the standard scalable
    * shape (no driver-side graph, no quadratic closure). Rounds needed =
    * component diameter, which for near-dup clusters is small (dup groups
    * are dense); for long-chain graphs a pointer-jumping variant would cut
    * rounds to O(log d), not needed here. The iteration is a driver LOOP
    * but each step is fully distributed; `maxIter` bounds pathological
    * chains, erring toward over-segmentation, never corruption.
    *
    * Output: (doc, cluster) for every id in `pairs` — singleton documents
    * never enter a pair list, so they are implicitly their own cluster. */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 25): DataFrame = {
    // Persist the DIRECTED pair list BEFORE symmetrizing: the union
    // references the (potentially expensive — a whole near-dup pipeline)
    // pairs plan twice, and aliased subplans don't share exchanges, so an
    // unpersisted input would be computed once per branch (measured: 7 of
    // dedup_clusters' 10.7s were re-deriving the Jaccard pairs inside the
    // first iteration). No distinct() after the union: pair lists are
    // already distinct and min() is idempotent to duplicates — a dedup
    // shuffle here is pure overhead.
    val fwd = pairs.select(col(aCol).as("u"), col(bCol).as("v")).persist()
    // co-partitioned pin (r19): the loop joins `edges` on u every
    // iteration; pinning the symmetrized list hash-partitioned on u
    // moves that corpus-scale exchange out of the loop (the label side
    // still exchanges — it changes per round). The eager pin also lets
    // fwd's cache go immediately instead of at loop exit.
    val edges = graft.Checkpoints.pinPartitioned(
      fwd.unionByName(fwd.select(col("v").as("u"), col("u").as("v"))),
      Seq("u"))
    fwd.unpersist()
    var labels = edges.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").as("label")).persist()
    var cached = labels // the DataFrame actually holding the cache entry
    var changed = 1L
    var it = 0
    val ccLog = sys.env.contains("SPARK_GRAFT_CC_LOG")
    while (changed > 0 && it < maxIter) {
      val itT0 = System.nanoTime()
      val nbrMin = edges
        .join(labels.select(col("node").as("u"), col("label").as("l_u")), "u")
        .groupBy(col("v").as("node")).agg(min(col("l_u")).as("nbr_min"))
      // carry the old label through the projection so `changed` is a
      // filter-count on the already-persisted frame, not a second join
      // re-deriving labels (the original shape paid a join + shuffle per
      // iteration just for the convergence check)
      val next = labels.join(nbrMin, Seq("node"), "left_outer")
        .select(col("node"), col("label").as("_old"),
          least(col("label"), coalesce(col("nbr_min"), col("label")))
            .as("label"))
        .persist()
      changed = next.where(col("label") < col("_old")).count()
      cached.unpersist()
      cached = next
      // truncate lineage every few rounds: each iteration otherwise nests
      // the previous plan, and a deep component would grow the logical
      // plan (and its analysis time) linearly with the round count
      val nextLabels = next.select("node", "label")
      labels = if (it % 5 == 4) nextLabels.pin() else nextLabels
      if (ccLog) System.err.println(
        f"[cc] iter $it changed=$changed ${(System.nanoTime() - itT0) / 1e9}%.2fs")
      it += 1
    }
    // materialize the result OUT of the loop caches (eager checkpoint —
    // the label table is small: one row per paired node), then drop the
    // last persisted frame: a CacheManager entry is never GC'd, so
    // returning a frame backed by the loop's persist would leak one
    // entry per invocation in a long-lived driver (Bench reps, notebooks)
    val out = labels.select(col("node").as("doc"), col("label").as("cluster"))
      .pin()
    cached.unpersist()
    out
  }

  /** INCREMENTAL dedup: near-dup pairs BETWEEN two corpora — each (new,
    * ref) pair with word-k-gram Jaccard ≥ `minJaccard`, never new–new or
    * ref–ref pairs. This is the arriving-batch-vs-kept-corpus pass of a
    * continuously growing training set: the reference side has already
    * been deduped internally; a new document is judged only against what
    * is already kept.
    *
    * Same PPJoin prefix filtering as [[ngramJaccardPairsFromGroups]],
    * asymmetric: document frequencies come from the REFERENCE side (the
    * big, stable side — at scale that df table is an index artifact built
    * once per corpus generation), both sides sort their shingles by the
    * same (df, hash) total order (new-side shingles unseen in the
    * reference get df 0: rarest-first, prefix guarantee unaffected), and
    * candidate pairs are generated within shared-prefix buckets with a
    * side gate so only cross-corpus pairs survive. Output: (new_id,
    * ref_id, intersection, size_new, size_ref).
    *
    * `maxBucket` caps are PER SIDE here, not combined as in the
    * one-corpus path: a prefix bucket is dropped when EITHER side alone
    * exceeds `maxBucket`, so join work per bucket is bounded by
    * `maxBucket²` cross pairs (vs the one-corpus combined cap's
    * `maxBucket·(maxBucket−1)/2`). The recall edge cases differ too: a
    * bucket with e.g. 0.6·max new + 0.6·max ref entries survives here
    * (the combined cap would drop it), while a ref bucket just over the
    * cap drops all its candidates even against a single new doc. Both
    * behaviors are deliberate — the ref-side df index is built without
    * knowledge of future batches, so only per-side bounds are stable
    * across batch arrivals — and both drop events are observed
    * (`xcorpus_prefix_buckets*` metrics). */
  def crossCorpusPairs(newDocs: DataFrame, refDocs: DataFrame,
                       idCol: String, textCol: String, k: Int,
                       minJaccard: Double,
                       maxBucket: Int = 10000,
                       refKey: Option[String] = None): DataFrame = {
    def sets(d: DataFrame) = d
      .select(col(idCol).as("doc"),
        sort_array(shingleHashes(col(textCol), k)).as("sh"))
      .where(size(col("sh")) > 0)
    // the new side is read twice (prefixing + verify join) — materialize
    val nSets = sets(newDocs).pin()
    val prefixLen =
      (col("n") - ceil(lit(minJaccard) * col("n")) + 1).cast("int")
    // explode → df join → per-doc (df, hash) sort → positional prefix
    // rows. The df table always comes from the REFERENCE side
    def prefixRows(s: DataFrame, dfTab: DataFrame) = s
      .select(col("doc"), explode(col("sh")).as("h"))
      .join(dfTab, Seq("h"), "left_outer")
      .select(col("doc"),
        struct(coalesce(col("df"), lit(0L)).as("df"), col("h").as("h"))
          .as("e"))
      .groupBy("doc")
      .agg(sort_array(collect_list(col("e"))).as("es"),
        count(lit(1)).as("n"))
      .select(col("doc"), col("n"),
        posexplode(slice(col("es"), lit(1), prefixLen)).as(Seq("pos", "p")))
    // the reference side IS the once-per-corpus-generation index the
    // scaladoc describes: with `refKey` (same dataset-key contract as
    // [[shingleGroupsFor]]) its shingle sets, df table AND prefix rows
    // are built at most once per dataset — an arriving batch pays only
    // its own (small) side of the pipeline plus the shared bucket join
    val (rSets, dfTab, refPrefix) = refKey match {
      case Some(key) =>
        refIndexCache.getOrCompute(refDocs.sparkSession,
            (key, k, minJaccard)) {
          val r = sets(refDocs).pin()
          val d = r.select(explode(col("sh")).as("h"))
            .groupBy("h").agg(count(lit(1)).as("df")).pin()
          (r, d, prefixRows(r, d).pin())
        }
      case None =>
        // uncached path (e.g. a per-micro-batch growing corpus): the df
        // table feeds BOTH sides' prefix pipelines and the ref prefix is
        // consumed twice (hot counts + join) — materialize both, same as
        // the cached branch, or each reference pass recomputes 2-3x
        val r = sets(refDocs).pin()
        val d = r.select(explode(col("sh")).as("h"))
          .groupBy("h").agg(count(lit(1)).as("df")).pin()
        (r, d, prefixRows(r, d).pin())
    }
    // hot-prefix guard on BOTH sides' bucket sizes (each observed): a
    // prefix shingle with more than maxBucket entries on EITHER side is
    // dropped from candidate generation — per-bucket join work is then
    // bounded by maxBucket², the same invariant the symmetric
    // capBuckets gave the one-corpus path (a hot templated batch must
    // not cross an under-cap ref bucket into a quadratic blowup)
    def hotSide(p: DataFrame, metric: String) = {
      val counts = p.groupBy("p").agg(count(lit(1)).as("_c"))
        .observe(metric,
          sum(when(col("_c") > maxBucket, 1L).otherwise(0L))
            .as("dropped_buckets"))
      counts.where(col("_c") > maxBucket).select("p")
    }
    val newPrefix = prefixRows(nSets, dfTab).pin()
    val hotP = hotSide(refPrefix, "xcorpus_prefix_buckets")
      .unionByName(hotSide(newPrefix, "xcorpus_prefix_buckets_new"))
      .distinct()
    // candidates: a cross-side EQUI-JOIN on the prefix entry — no
    // collect_list buckets, no re-shuffle of the (cached) reference
    // rows into bucket arrays; the arriving batch is the small side and
    // broadcasts under AQE. The PPJoin positional filter rides as the
    // join residual
    val alphaFactor = minJaccard / (1.0 + minJaccard)
    val cand = newPrefix
      .join(broadcast(hotP), Seq("p"), "left_anti")
      .join(refPrefix.join(broadcast(hotP), Seq("p"), "left_anti")
        .select(col("p"), col("doc").as("ref_id"), col("n").as("rn"),
          col("pos").as("rpos")), "p")
      // PPJoin length filter first (see ngramJaccardPairsFromGroups),
      // then the positional filter — both necessary conditions of J >= t
      .where(least(col("n"), col("rn")) >=
        ceil(lit(minJaccard) * greatest(col("n"), col("rn"))) &&
        least(col("n") - col("pos"), col("rn") - col("rpos")) >=
        ceil(lit(alphaFactor) * (col("n") + col("rn"))))
      .select(col("doc").as("new_id"), col("ref_id"))
      .distinct()
    cand
      .join(nSets.select(col("doc").as("new_id"), col("sh").as("sh_n")),
        "new_id")
      .join(rSets.select(col("doc").as("ref_id"), col("sh").as("sh_r")),
        "ref_id")
      .withColumn("size_new", size(col("sh_n")).cast("long"))
      .withColumn("size_ref", size(col("sh_r")).cast("long"))
      // early-exit pre-filter (−1 slack, see ngramJaccardPairsFromGroups)
      .where(sortedIntersectAtLeast(col("sh_n"), col("sh_r"),
        (ceil(lit(alphaFactor) * (col("size_new") + col("size_ref"))) - 1)
          .cast("long")))
      .withColumn("intersection",
        sortedIntersectCount(col("sh_n"), col("sh_r")))
      .where(col("intersection") /
        (col("size_new") + col("size_ref") - col("intersection")) >=
        minJaccard)
      .select("new_id", "ref_id", "intersection", "size_new", "size_ref")
  }

  /** Per-new-document keep/drop VERDICT against a reference corpus: the
    * [[crossCorpusPairs]] matches aggregated per new document — `(new_id,
    * n_matches, dropped)` over EVERY new document (zero-match and
    * too-short-to-shingle documents report 0/kept). The `dropped = 1`
    * slice is what an incremental ingestion discards; the whole relation
    * is the audit trail, mirroring [[Decontamination.contaminationVerdict]]. */
  def incrementalVerdict(newDocs: DataFrame, refDocs: DataFrame,
                         idCol: String, textCol: String, k: Int,
                         minJaccard: Double,
                         refKey: Option[String] = None): DataFrame = {
    val matches = crossCorpusPairs(newDocs, refDocs, idCol, textCol, k,
      minJaccard, refKey = refKey)
      .groupBy("new_id").agg(count(lit(1)).as("m"))
    newDocs.select(col(idCol).as("new_id"))
      .join(matches, Seq("new_id"), "left_outer")
      .select(col("new_id"),
        coalesce(col("m"), lit(0L)).as("n_matches"),
        (coalesce(col("m"), lit(0L)) > 0).cast("long").as("dropped"))
  }

  /** Edit-distance-≤-`maxDistance` pair enumeration by DELETION
    * NEIGHBORHOODS (the FastSS family): every string generates itself
    * plus all strings reachable by deleting up to `maxDistance`
    * characters, and any two strings within edit distance `maxDistance`
    * MUST share a variant (a substitution is a same-position deletion on
    * both sides; an insertion/deletion is a deletion on the longer side
    * alone). Candidates are pairs sharing a variant; the exact
    * `levenshtein` confirm runs only on candidates — the quadratic
    * all-pairs distance matrix never materializes.
    *
    * Scale shape: the variant explode multiplies rows by ≤ len+1 (for
    * maxDistance=1), the candidate join hash-partitions on the variant
    * string, and hot variant buckets are capped at `maxBucket` DISTINCT
    * strings with the drop counted in the `edit_distance_buckets`
    * observed metric (same recall-trading guard as the shingle family).
    * The per-candidate verify is the codegen'd built-in's THRESHOLD
    * overload — banded O(maxDistance·len) dynamic programming, not the
    * full O(len²) matrix.
    *
    * Output: (id_a < id_b, distance) for distinct-id pairs with
    * levenshtein ≤ `maxDistance` (identical strings under different ids
    * report distance 0). Currently supports `maxDistance` = 1 — the
    * near-typo regime where FastSS blocking is exact. */
  def editDistancePairs(docs: DataFrame, idCol: String, strCol: String,
                        maxDistance: Int = 1,
                        maxBucket: Int = 1000): DataFrame =
    editDistanceFromIndex(
      editDistanceIndex(docs, idCol, strCol, maxDistance, maxBucket),
      maxDistance)

  /** Per-JVM cache of the deletion-neighborhood INDEX (the FastSS
    * artifact: every string grouped under itself + its single-deletion
    * variants) — corpus-keyed like [[shingleGroupsFor]]; the pair
    * expansion + banded-DP confirm stay per-query. */
  private val editIndexCache =
    new graft.SessionMemo[(String, Int), DataFrame]()

  /** [[editDistancePairs]] riding the per-dataset index memo (the
    * registry form, the [[ngramPairsFor]] contract). */
  def editDistancePairsFor(docs: DataFrame, idCol: String, strCol: String,
                           maxDistance: Int = 1, maxBucket: Int = 1000,
                           key: String): DataFrame =
    editDistanceFromIndex(
      editIndexCache.getOrCompute(docs.sparkSession, (key, maxDistance))(
        editDistanceIndex(docs, idCol, strCol, maxDistance, maxBucket)
          .pin()),
      maxDistance)

  private def editDistanceIndex(docs: DataFrame, idCol: String,
                                strCol: String, maxDistance: Int,
                                maxBucket: Int): DataFrame = {
    require(maxDistance == 1, "editDistancePairs supports maxDistance = 1")
    val base = docs.select(col(idCol).as("doc_id"),
      col(strCol).cast("string").as("s"))
      .where(col("s").isNotNull && length(col("s")) > 0)
    // self + every single-deletion variant (substring(s,1,i-1) ||
    // substring(s,i+1,len)), one row-local transform per string
    val del = base.select(col("doc_id"), col("s"),
      explode(array_union(array(col("s")),
        expr("transform(sequence(1, length(s)), i -> " +
          "concat(substring(s, 1, i - 1), substring(s, i + 1, length(s))))")))
        .as("v"))
    val grouped = del.groupBy("v")
      .agg(collect_set(struct(col("doc_id"), col("s"))).as("ms"))
    capBuckets(grouped, maxBucket, "edit_distance_buckets")
  }

  private def editDistanceFromIndex(capped: DataFrame,
                                    maxDistance: Int): DataFrame = {
    capped
      .select(explode(col("ms")).as("a"), col("ms"))
      .select(col("a"), explode(col("ms")).as("b"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.s").as("sa"), col("b.s").as("sb"))
      .distinct()
      // the THRESHOLD overload runs the banded O(d·n) DP and returns -1
      // past the bound — strictly cheaper than the full O(n²) matrix for
      // the near-typo confirm
      .withColumn("distance",
        levenshtein(col("sa"), col("sb"), maxDistance).cast("long"))
      .where(col("distance") >= 0 && col("distance") <= maxDistance)
      .select("id_a", "id_b", "distance")
  }
}
