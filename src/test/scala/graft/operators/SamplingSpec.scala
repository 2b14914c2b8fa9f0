package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SamplingSpec extends SparkSpec {

  private lazy val docs = Tables(spark, sfDir, "documents").cache()

  test("hash sampling is deterministic and near the requested fraction") {
    import spark.implicits._
    val a = Sampling.sampleByHash(docs, "doc_id", 0.3).select("doc_id")
      .as[Long].collect().sorted
    val b = Sampling.sampleByHash(docs, "doc_id", 0.3).select("doc_id")
      .as[Long].collect().sorted
    assert(a === b) // bit-identical across runs
    val frac = a.length.toDouble / docs.count()
    assert(math.abs(frac - 0.3) < 0.08, s"got $frac")
    // growing the fraction only ADDS rows (nested samples)
    val bigger = Sampling.sampleByHash(docs, "doc_id", 0.5).select("doc_id")
      .as[Long].collect().toSet
    assert(a.toSet.subsetOf(bigger))
  }

  test("split: disjoint, exhaustive, stable, near the weights") {
    import spark.implicits._
    val s = Sampling.split(docs, "doc_id",
      Seq("train" -> 8, "valid" -> 1, "test" -> 1))
    val bySplit = s.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(bySplit.keySet === Set("train", "valid", "test")) // exhaustive
    assert(bySplit.values.sum === docs.count()) // disjoint cover
    assert(bySplit("train") > bySplit("valid") * 4)
    // a document's split never changes when the corpus grows
    val half = Sampling.split(docs.limit(200), "doc_id",
      Seq("train" -> 8, "valid" -> 1, "test" -> 1))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val full = s.select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(half.forall { case (id, sp) => full(id) === sp })
  }

  test("clusterSafeSplit: every near-dup cluster lands in exactly one split") {
    import spark.implicits._
    val out = graft.SparkEntry.queries("sample_splits_cluster_safe")(
      spark, sfDir)
    // leakage law: one distinct split per representative, clustered or not
    val perRep = out.groupBy("rep_id")
      .agg(org.apache.spark.sql.functions.countDistinct("split").as("k"))
      .as[(Long, Long)].collect()
    assert(perRep.nonEmpty && perRep.forall(_._2 === 1L))
    // the composition is non-trivial on this corpus: some cluster has >1
    // member, and the cover is total
    val sizes = out.groupBy("rep_id").count().as[(Long, Long)].collect()
    assert(sizes.exists(_._2 > 1L), "fixture premise: a real cluster exists")
    assert(out.count() === docs.count())
    // a clustered member's split equals its representative's own-id split
    val bySelf = Sampling.split(docs, "doc_id",
      Seq("train" -> 8, "valid" -> 1, "test" -> 1))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val members = out.select("doc_id", "rep_id", "split")
      .as[(Long, Long, String)].collect()
    assert(members.forall { case (_, rep, sp) => bySelf(rep) === sp })
  }

  test("stratified sampling keeps unlisted strata whole and downsamples listed ones") {
    import spark.implicits._
    val sampled = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.2))
    val before = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val after = sampled.groupBy("lang").count().as[(String, Long)].collect().toMap
    for (l <- before.keys if l != "en")
      assert(after(l) === before(l), s"stratum $l must be untouched")
    val enFrac = after("en").toDouble / before("en")
    assert(enFrac < 0.4 && enFrac > 0.05, s"en kept $enFrac")
  }

  test("capTokensPerGroup: budget fills, crossing doc kept, small groups whole") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", 100L), (2L, "a", 100L), (3L, "a", 100L),
      (10L, "b", 5L)).toDF("doc_id", "source", "n_tok")
    val kept = Sampling.capTokensPerGroup(df, "doc_id", "source", "n_tok",
        budget = 150L)
      .as[(Long, String, Long)].collect()
    // group a: whatever the md5 order, exclusive prefixes are 0/100/200 —
    // the crossing doc (prefix 100 < 150) stays, the third (200) drops
    assert(kept.count(_._2 == "a") === 2)
    // group b is smaller than the budget: kept whole
    assert(kept.count(_._2 == "b") === 1)
  }

  test("packBatches assigns consecutive token-budget batches per stream") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 5L), ("a", 2L, 5L), ("a", 3L, 5L), ("a", 4L, 12L),
      ("b", 1L, 9L), ("b", 2L, 2L))
      .toDF("source", "doc_id", "n_tokens")
    val got = Sampling.packBatches(df, "doc_id", "source", "n_tokens", 10L)
      .select("source", "doc_id", "batch_id")
      .as[(String, Long, Long)].collect()
      .map { case (s, d, b) => (s, d) -> b }.toMap
    // stream a: exclusive cumsum 0,5,10,15 -> batches 0,0,1,1
    assert(got(("a", 1L)) === 0L)
    assert(got(("a", 2L)) === 0L)
    assert(got(("a", 3L)) === 1L)
    assert(got(("a", 4L)) === 1L)
    // stream b restarts its own budget: 0,9 -> 0,0
    assert(got(("b", 1L)) === 0L)
    assert(got(("b", 2L)) === 0L)
    // batches are monotone in doc order and never skip an id
    val perStream = Sampling.packBatches(docs.select(col("doc_id"),
        col("source"), col("n_chars").as("n_tokens")),
      "doc_id", "source", "n_tokens", 5000L)
      .select("source", "batch_id").as[(String, Long)].collect()
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).toSet }
    perStream.foreach { case (s, ids) =>
      assert(ids === (0L until ids.size).toSet, s"stream $s gapped: $ids")
    }
  }

  test("capPerGroup: exact cap, small groups whole, survivors = lowest md5") {
    import spark.implicits._
    val capped = Sampling.capPerGroup(docs, "doc_id", "source", cap = 10)
    val perGroup = capped.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    val before = docs.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    perGroup.foreach { case (s, n) =>
      assert(n === math.min(10L, before(s)), s"group $s kept $n") }
    assert(perGroup.keySet === before.keySet) // no group vanishes
    // deterministic across runs
    val ids = () => Sampling.capPerGroup(docs, "doc_id", "source", 10)
      .select("doc_id").as[Long].collect().toSet
    assert(ids() === ids())
    // survivors are exactly the cap lowest (md5 prefix, id) per group —
    // brute-force the same order on the driver
    val md = java.security.MessageDigest.getInstance("MD5")
    def pref(id: Long): String =
      md.digest(s"cap$id".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(8)
    val expect = docs.select("doc_id", "source").as[(Long, String)]
      .collect().groupBy(_._2).toSeq.flatMap { case (_, rows) =>
        rows.sortBy { case (id, _) => (pref(id), id) }.take(10)
      }.map(_._1).toSet
    assert(ids() === expect)
    // a group smaller than the cap is kept whole
    val tiny = Seq((1L, "x"), (2L, "x")).toDF("doc_id", "source")
    assert(Sampling.capPerGroup(tiny, "doc_id", "source", 10).count() === 2L)
  }

  test("materializeBatches concatenates each batch's docs in id order") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 5L, "one"), ("a", 2L, 5L, "two"), ("a", 3L, 5L, "three"),
      ("b", 1L, 9L, "solo"))
      .toDF("source", "doc_id", "n_tokens", "text")
    val got = Sampling.materializeBatches(
      df, "doc_id", "source", "n_tokens", "text", budget = 10L, sep = "|")
      .as[(String, Long, Long, Long, String)].collect()
      .map { case (s, b, nd, nt, t) => (s, b) -> ((nd, nt, t)) }.toMap
    // stream a packs ids 1,2 into batch 0 (cumsum-before 0,5) and 3 into 1
    assert(got(("a", 0L)) === ((2L, 10L, "one|two")))
    assert(got(("a", 1L)) === ((1L, 5L, "three")))
    assert(got(("b", 0L)) === ((1L, 9L, "solo")))
    // id order inside the sequence, not collect order: shuffle the input
    val rev = Sampling.materializeBatches(
      df.orderBy($"doc_id".desc).repartition(7),
      "doc_id", "source", "n_tokens", "text", budget = 10L, sep = "|")
      .where($"source" === "a" && $"batch_id" === 0L)
      .select("batch_text").as[String].head()
    assert(rev === "one|two")
    // every doc lands in exactly one batch over the real corpus
    val total = Sampling.materializeBatches(
      docs.select(col("doc_id"), col("source"),
        col("n_chars").as("n_tokens"), col("text")),
      "doc_id", "source", "n_tokens", "text", 5000L)
      .agg(sum("n_docs")).as[Long].head()
    assert(total === docs.count())
  }

  test("mixtureSample: per-group rates hold, unlisted groups drop, stable") {
    import spark.implicits._
    val df = (0L until 4000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "grp")
    val rates = Map("a" -> 0.5, "b" -> 1.0)
    val run = () => Sampling.mixtureSample(df, "id", "grp", rates)
      .as[(Long, String)].collect().toSet
    val got = run()
    assert(got === run()) // deterministic
    val aKept = got.count(_._2 == "a") / 2000.0
    assert(math.abs(aKept - 0.5) < 0.05, s"a rate $aKept")
    // rate 1.0 keeps all but the astronomically unlikely all-f prefix
    assert(got.count(_._2 == "b") >= 1999)
    // a group with no rate vanishes
    val dropped = Sampling.mixtureSample(
      df.withColumn("grp", lit("c")), "id", "grp", rates)
    assert(dropped.count() === 0L)
    // membership is a pure function of the id, not the corpus: a subset
    // corpus keeps exactly the intersection
    val sub = Sampling.mixtureSample(df.where($"id" < 100), "id", "grp", rates)
      .as[(Long, String)].collect().toSet
    assert(sub === got.filter(_._1 < 100))
  }

  test("sampleFixedK: exactly k, deterministic, append displaces at most the appended") {
    import spark.implicits._
    val df = (0L until 1000L).toDF("id")
    val run = () => Sampling.sampleFixedK(df, "id", k = 50)
      .as[Long].collect().toSet
    val got = run()
    assert(got.size === 50 && got === run())
    // appending 10 rows changes the pick by at most 10 members
    val grown = Sampling.sampleFixedK((0L until 1010L).toDF("id"), "id", 50)
      .as[Long].collect().toSet
    assert((got -- grown).size <= 10)
  }

  test("weightedSample: per-row probabilities hold, clamps, deterministic") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    // 3 weight tiers: 0 (never), 0.5 (about half), 2.0 (clamped -> all)
    val df = (0L until 3000L).map(i => (i, (i % 3) * 1.0)).toDF("id", "w")
    val run = () => Sampling.weightedSample(df, "id", col("w") * lit(0.5))
      .as[(Long, Double)].collect().toSet
    val got = run()
    assert(got === run()) // deterministic
    assert(got.count(_._2 == 0.0) === 0) // p = 0 never keeps
    assert(got.count(_._2 == 2.0) === 1000) // p clamped to 1 keeps all
    val half = got.count(_._2 == 1.0) / 1000.0
    assert(math.abs(half - 0.5) < 0.06, s"p=0.5 tier kept $half")
    // membership is a pure function of (id, weight): subset keeps the
    // intersection
    val sub = Sampling.weightedSample(df.where($"id" < 300), "id",
      col("w") * lit(0.5)).as[(Long, Double)].collect().toSet
    assert(sub === got.filter(_._1 < 300))
  }

  test("exactSplit: per-stratum counts are exact integers, deterministic, disjoint") {
    import spark.implicits._
    // stratum A: 500 rows at 8/1/1 -> exactly 400/50/50
    // stratum B: 7 rows -> floor cuts give 5/1/1
    val docs = ((0L until 500L).map(i => (i, "A")) ++
      (1000L until 1007L).map(i => (i, "B"))).toDF("id", "stratum")
    val run = () => Sampling.exactSplit(docs.repartition(9), "id", "stratum",
      Seq("train" -> 8, "valid" -> 1, "test" -> 1))
      .as[(Long, String, String)].collect().toSet
    val got = run()
    assert(got === run()) // deterministic across runs and partitionings
    assert(got.size === 507) // total partition: every row exactly once
    val counts = got.groupBy(r => (r._2, r._3)).view.mapValues(_.size).toMap
    assert(counts === Map(
      ("A", "train") -> 400, ("A", "valid") -> 50, ("A", "test") -> 50,
      ("B", "train") -> 5, ("B", "valid") -> 1, ("B", "test") -> 1))
  }

  test("temperatureAlloc: hand-computed Hamilton apportionment of sqrt " +
    "weights; leftover goes to the largest remainders; clamp engages") {
    import spark.implicits._
    // groups a:9 b:4 c:1 -> w_q = 3e6/2e6/1e6, W = 6e6
    val docs = ((1 to 9).map(i => (i.toLong, "a")) ++
      (11 to 14).map(i => (i.toLong, "b")) ++ Seq((21L, "c")))
      .toDF("id", "g")
    def alloc(budget: Long): Map[String, (Long, Long, Long)] =
      Sampling.temperatureAlloc(docs, "g", budget)
        .as[(String, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // budget 5: base 2/1/0 (rem 3e6/4e6/5e6), leftover 2 -> c and b
    assert(alloc(5L) === Map(
      "a" -> ((9L, 3000000L, 2L)), "b" -> ((4L, 2000000L, 2L)),
      "c" -> ((1L, 1000000L, 1L))))
    // budget 7: base 3/2/1 (rem 3e6/2e6/1e6), leftover 1 -> a
    assert(alloc(7L) === Map(
      "a" -> ((9L, 3000000L, 4L)), "b" -> ((4L, 2000000L, 2L)),
      "c" -> ((1L, 1000000L, 1L))))
    // budget 12: base 6/4/2 exact (leftover 0); c clamps 2 -> 1 and the
    // grand total is honestly short (no silent redistribution)
    val a12 = alloc(12L)
    assert(a12("c")._3 === 1L && a12("a")._3 === 6L && a12("b")._3 === 4L)
  }

  test("temperatureAlloc: a NULL group tying on remainder sorts LAST " +
    "(DuckDB default null order) — the bonus unit goes to the named group") {
    import spark.implicits._
    // groups a:4 null:4 b:1 -> w_q 2e6/2e6/1e6, W = 5e6. budget 1: all
    // bases 0, remainders 2e6/2e6/1e6, leftover 1 — a and NULL tie on
    // remainder, so the tie-break order decides who gets the single unit.
    val docs = ((1 to 4).map(i => (i.toLong, Some("a"))) ++
      (11 to 14).map(i => (i.toLong, Option.empty[String])) ++
      Seq((21L, Some("b")))).toDF("id", "g")
    val got = Sampling.temperatureAlloc(docs, "g", 1L)
      .as[(Option[String], Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(got === Map(Some("a") -> 1L, None -> 0L, Some("b") -> 0L))
  }

  test("temperatureSample: per-group counts equal the allocation; " +
    "deterministic; members are the lowest-md5 rows of each group") {
    import spark.implicits._
    val docs = graft.Tables(spark, sfDir, "documents")
      .select($"doc_id", $"lang")
    val budget = 120L
    val alloc = Sampling.temperatureAlloc(docs, "lang", budget)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    val got = Sampling.temperatureSample(docs, "doc_id", "lang", budget)
      .select("doc_id", "lang").as[(Long, String)].collect()
    assert(got.groupBy(_._2).view.mapValues(_.size.toLong).toMap === alloc)
    assert(alloc.values.sum <= budget)
    val again = Sampling.temperatureSample(docs, "doc_id", "lang", budget)
      .select("doc_id", "lang").as[(Long, String)].collect()
    assert(got.sorted.toSeq === again.sorted.toSeq)
  }

  test("epochUpsample: emits exactly the budget; per-doc epoch counts " +
    "within a group differ by at most 1; epochs are dense from 0") {
    import spark.implicits._
    val docs = graft.Tables(spark, sfDir, "documents")
      .select($"doc_id", $"source")
    val budget = 3000L // ~6 epochs per doc at the 500-doc fixture
    val got = Sampling.epochUpsample(docs, "doc_id", "source", budget)
      .select("doc_id", "source", "epoch")
      .as[(Long, String, Long)].collect()
    assert(got.length.toLong === budget)
    // per-doc epoch sets are dense prefixes 0..k-1
    got.groupBy(_._1).foreach { case (id, rows) =>
      val es = rows.map(_._3).sorted
      assert(es === (0L until es.length).toArray, s"doc $id epochs: $es")
    }
    // within a group, repeat counts differ by <= 1 (full epochs + a
    // single partial epoch)
    got.groupBy(_._2).foreach { case (src, rows) =>
      val perDoc = rows.groupBy(_._1).values.map(_.length).toSeq
      assert(perDoc.max - perDoc.min <= 1, s"source $src: $perDoc")
    }
    // deterministic
    val again = Sampling.epochUpsample(docs, "doc_id", "source", budget)
      .select("doc_id", "source", "epoch")
      .as[(Long, String, Long)].collect()
    assert(got.sorted.toSeq === again.sorted.toSeq)
  }

  test("epochUpsample upsamples: with budget > corpus every doc appears " +
    "in epoch 0, and group totals are the UNCLAMPED apportionment") {
    import spark.implicits._
    val docs = graft.Tables(spark, sfDir, "documents")
      .select($"doc_id", $"source")
    val n = docs.count()
    val budget = 4 * n
    val got = Sampling.epochUpsample(docs, "doc_id", "source", budget)
    val epoch0 = got.where($"epoch" === 0).select("doc_id")
      .as[Long].collect().toSet
    val all = docs.select("doc_id").as[Long].collect().toSet
    assert(epoch0 === all, "epoch 0 must be the full deterministic pass")
    assert(got.count() === budget)
  }

  test("lengthBucketReport: caps are the next power of two, counts and " +
    "padding reconcile, waste is zero iff every doc fills its cap") {
    import spark.implicits._
    val df = Seq(1L, 16L, 17L, 32L, 100L, 5000L, 4096L)
      .toDF("n_tokens")
    val got = Sampling.lengthBucketReport(df, "n_tokens")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(got(16L) === ((2L, 17L, 16L, 15L, 468750L))) // 1 + 16
    assert(got(32L) === ((2L, 49L, 32L, 15L, 234375L))) // 17 + 32
    assert(got(128L) === ((1L, 100L, 100L, 28L, 218750L)))
    // 5000 pools into the top bucket, which pads to its own max (5000)
    assert(got(4096L) === ((2L, 9096L, 5000L, 904L, 90400L)))
    assert(got.values.map(_._1).sum === df.count())
  }

  test("mixGap: shares sum to ~1e6, gaps sum to ~0, and a group with " +
    "exactly the target share gaps to zero") {
    import spark.implicits._
    // two groups with token masses proportional to sqrt(n_docs) weights:
    // a has 4 docs (w 2e6), b has 1 doc (w 1e6) -> targets 2/3 and 1/3
    val df = (Seq.fill(4)("a") :+ "b").zipWithIndex
      .map { case (g, i) => (g, if (g == "a") 200L else 100L) }
      .toDF("g", "n_tokens")
    val got = Sampling.mixGap(df, "g", "n_tokens")
      .collect().map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // actual: a = 800/900, b = 100/900; target: a = 2/3, b = 1/3
    assert(got("a")._1 === 888888L && got("a")._2 === 666666L)
    assert(got("b")._1 === 111111L && got("b")._2 === 333333L)
    assert(got("a")._3 === 222222L && got("b")._3 === -222222L)
  }

  test("curriculumInterleave: keys strictly increasing round-robin over " +
    "the score bands; ranks match a window-based recompute") {
    import spark.implicits._
    val docs = graft.Tables(spark, sfDir, "documents")
      .select($"doc_id", ($"n_chars" % 997).as("score_q"))
    val buckets = 10
    val got = Sampling.curriculumInterleave(docs, "doc_id", "score_q",
      buckets, salt = "curr")
      .select("doc_id", "score_q", "bucket", "rn_in_bucket",
        "curriculum_key")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.length.toLong === docs.count())
    // key arithmetic + uniqueness
    assert(got.forall(r => r._5 === r._4 * buckets + r._3))
    assert(got.map(_._5).distinct.length === got.length)
    assert(got.forall(r => r._3 >= 0 && r._3 < buckets))
    // ranks are dense 1..n_b within each band
    got.groupBy(_._3).foreach { case (b, rows) =>
      val rns = rows.map(_._4).sorted
      assert(rns === (1L to rows.length).toArray, s"bucket $b")
    }
    // window-based recompute of the same definition agrees exactly
    val sc = docs.crossJoin(broadcast(docs.agg(
        min($"score_q").as("_mn"), max($"score_q").as("_mx"))))
      .withColumn("bucket",
        expr(s"cast(((score_q - _mn) * $buckets) div (_mx - _mn + 1)" +
          " as bigint)"))
      .withColumn("_pfx", substring(md5(concat(lit("curr"),
        $"doc_id".cast("string")).cast("binary")), 1, 8))
      .withColumn("rn_in_bucket", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"bucket")
          .orderBy($"_pfx".asc, $"doc_id".asc)).cast("long"))
      .select($"doc_id", $"bucket", $"rn_in_bucket")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    got.foreach { r =>
      assert(sc(r._1) === ((r._3, r._4)), s"doc ${r._1}")
    }
    // extreme scores land in the extreme bands
    val mn = got.minBy(_._2); val mx = got.maxBy(_._2)
    assert(mn._3 === 0L)
    assert(mx._3 === (buckets - 1).toLong)
  }

  test("packBucketed: hand-checked buckets, sequence boundaries, " +
    "truncation in the open top bucket") {
    import spark.implicits._
    val df = Seq((1L, 10L), (2L, 16L), (3L, 12L), (4L, 100L), (5L, 120L),
      (6L, 5000L)).toDF("doc_id", "n_tokens")
    val got = Sampling.packBucketed(df, "doc_id", "n_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // bucket 16: docs 1,2,3 all fit one 4096-token sequence (256/seq)
    assert(got((16L, 0L)) === ((3L, 38L, 0L, 10L)))
    // bucket 128: docs 4,5 -> used 220, padded 2*128-220
    assert(got((128L, 0L)) === ((2L, 220L, 0L, 36L)))
    // top bucket truncates to the context: used 4096, trunc 904, pad 0
    assert(got((4096L, 0L)) === ((1L, 4096L, 904L, 0L)))
    // tight context forces sequence boundaries inside a bucket
    val tight = Sampling.packBucketed(df, "doc_id", "n_tokens",
      contextTokens = 32L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(tight((16L, 0L)) === 2L && tight((16L, 1L)) === 1L) // 2 per seq
    assert(tight((128L, 0L)) === 1L && tight((128L, 1L)) === 1L) // 1 per seq
  }
}
