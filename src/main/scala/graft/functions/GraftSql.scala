package graft.functions

import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{ElementAt, Expression, Literal, Lower, RegExpReplace, StringSplit, StringTrim, Upper}
import org.apache.spark.sql.graft.{CosineSimilarity, MinHashSignature, NfkcNormalize, ShingleHashes, SimHash64}
import org.apache.spark.sql.types.{Decimal, DecimalType, DoubleType, IntegerType}

/** SQL-text registration for the engine's custom Catalyst expressions
  * (SURVEY §2.8): after `GraftSql.register(spark)` they are callable from
  * `spark.sql(...)` by name, not just through the Scala DSL —
  *
  *   - `nfkc_normalize(str)` — NFKC compatibility normalization (F4)
  *   - `graft_normalize_text(str)` — the reference's full normalizer
  *   - `cosine_sim(vecA, vecB)` — float-vector cosine similarity
  *   - `shingle_hashes(str, k)` — distinct word-k-shingle 64-bit hashes
  *   - `shingles(str, k)` — word-k-shingle strings (ordered, with dups)
  *   - `minhash_signature(hashes, n)` — n-permutation MinHash signature
  *   - `simhash64(tokens)` — 64-bit SimHash of a token array
  *   - `char_ngram_counts(str, n)` — per-row (char-gram, count) pairs, 1..n
  *   - `repetition_signals(str)` — struct of the 4 Gopher repetition stats
  *   - `gopher_stats(str)` — the 9 Gopher rule evidence counts in one pass
  *   - `c4_stats(str)` — the 7 C4 cleaning counts in one pass
  *   - `mojibake_repair(str)` — struct<fixed, n_bad>: encoding repair +
  *     detection in one pass (UTF-8-as-cp1252 dictionary)
  *   - `dup_ngram_stats(tokens)` — the 10 Gopher duplicate-n-gram values
  *     (top-gram count/mass n=2..4, duplicate mass n=5..8) in one pass
  *   - `winnow_fingerprints(str, k, w)` — the MOSS winnowing fingerprint
  *     set (sorted distinct window-min char-k-gram md5 prefixes)
  *   - `han_count(str)` — Han-script code-point count (langid's zh signal)
  *   - `int8_codes(vec)` — symmetric int8 quantization of a float vector
  *   - `int8_cosine(a, b)` — approximate cosine from two int8 code vectors
  *   - `kll_sketch_agg(v, k)` / `kll_merge_agg(sk, k)` — mergeable KLL
  *     quantile sketch build / rollup aggregates
  *   - `kll_quantile(sk, rank)` / `kll_rank(sk, v)` / `kll_sketch_n(sk)`
  *     — KLL sketch readers
  *   - `graft_theta_sketch_agg(v, lgK)` / `graft_theta_union_agg(sk,
  *     lgK)` +
  *     `theta_intersect` / `theta_a_not_b` / `theta_estimate` — theta
  *     sketch set algebra
  *   - `cms_sketch_agg(k, d, w)` / `cms_merge_agg(sk, d, w)` +
  *     `cms_estimate(sk, k)` / `cms_sketch_n(sk)` /
  *     `cms_inner_product(a, b)` — count-min point frequencies and the
  *     join-size inner-product estimator
  *   - `bitmap_agg(k)` / `graft_bitmap_or_agg(bm)` /
  *     `graft_bitmap_count(bm)` —
  *     EXACT mergeable distinct bitmaps (Roaring64)
  *   - `hllpp_sketch_agg(v, rsd)` / `hllpp_merge_agg(sk, rsd)` /
  *     `hllpp_estimate(sk, rsd)` — Spark-native HLL++ registers at
  *     rest: byte-exact merges, DuckDB-replayable estimates (HllSql)
  *
  * Integer parameters (`k`, `n`) must be integer LITERALS: they are
  * structural (codegen'd loop bounds), not per-row data.
  */
object GraftSql {

  private def intLit(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be an integer literal, got $other")
  }

  private def doubleLit(e: Expression, fn: String, pos: Int): Double =
    e match {
      case Literal(v: Double, DoubleType) => v
      case Literal(v: Decimal, _: DecimalType) => v.toDouble
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${pos + 1} must be a double literal, got $other")
    }

  private def arity(fn: String, es: Seq[Expression], n: Int): Unit =
    require(es.length == n, s"$fn expects $n arguments, got ${es.length}")

  /** All (name, builder) pairs — one place so register() and docs agree. */
  private[graft] def builderNames: Seq[String] = builders.map(_._1)

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "nfkc_normalize" -> { es =>
      arity("nfkc_normalize", es, 1); NfkcNormalize(es.head)
    },
    "graft_normalize_text" -> { es =>
      arity("graft_normalize_text", es, 1)
      // raw Catalyst mirror of GraftFunctions.normalizeText — a registry
      // builder must return resolved expressions, not Column nodes
      val seg = ElementAt(
        StringSplit(Upper(NfkcNormalize(es.head)), Literal("/"), Literal(-1)),
        Literal(-1))
      StringTrim(RegExpReplace(
        RegExpReplace(seg, Literal("[^\\p{L}\\p{N}_\\s]"), Literal(" ")),
        Literal("\\s+"), Literal(" ")))
    },
    "cosine_sim" -> { es =>
      arity("cosine_sim", es, 2); CosineSimilarity(es.head, es(1))
    },
    "sorted_intersect_count" -> { es =>
      arity("sorted_intersect_count", es, 2)
      org.apache.spark.sql.graft.SortedIntersectCount(es.head, es(1))
    },
    "dot_long" -> { es =>
      arity("dot_long", es, 2)
      org.apache.spark.sql.graft.DotProductLong(es.head, es(1))
    },
    "shingle_hashes" -> { es =>
      arity("shingle_hashes", es, 2)
      // text in, like the DSL: tokenize (lower + whitespace split) inline
      val toks = StringSplit(Lower(StringTrim(es.head)),
        Literal("\\s+"), Literal(-1))
      ShingleHashes(toks, intLit(es(1), "shingle_hashes", 1))
    },
    "shingles" -> { es =>
      arity("shingles", es, 2)
      // string k-grams, text in — the SQL-replayable twin of
      // shingle_hashes (same inline tokenization)
      val toks = StringSplit(Lower(StringTrim(es.head)),
        Literal("\\s+"), Literal(-1))
      org.apache.spark.sql.graft.Shingles(toks, intLit(es(1), "shingles", 1))
    },
    "minhash_signature" -> { es =>
      arity("minhash_signature", es, 2)
      MinHashSignature(es.head, intLit(es(1), "minhash_signature", 1))
    },
    "simhash64" -> { es =>
      arity("simhash64", es, 1); SimHash64(es.head)
    },
    "char_ngram_counts" -> { es =>
      arity("char_ngram_counts", es, 2)
      org.apache.spark.sql.graft.CharNgramCounts(es.head,
        intLit(es(1), "char_ngram_counts", 1))
    },
    "repetition_signals" -> { es =>
      arity("repetition_signals", es, 1)
      org.apache.spark.sql.graft.RepetitionSignals(es.head)
    },
    "gopher_stats" -> { es =>
      arity("gopher_stats", es, 1)
      org.apache.spark.sql.graft.GopherStats(es.head)
    },
    "mojibake_repair" -> { es =>
      arity("mojibake_repair", es, 1)
      org.apache.spark.sql.graft.MojibakeRepair(es.head)
    },
    "c4_stats" -> { es =>
      arity("c4_stats", es, 1)
      org.apache.spark.sql.graft.C4Stats(es.head)
    },
    "dup_ngram_stats" -> { es =>
      arity("dup_ngram_stats", es, 1)
      org.apache.spark.sql.graft.DupNgramStats(es.head)
    },
    "winnow_fingerprints" -> { es =>
      arity("winnow_fingerprints", es, 3)
      org.apache.spark.sql.graft.WinnowFingerprints(es.head,
        intLit(es(1), "winnow_fingerprints", 1),
        intLit(es(2), "winnow_fingerprints", 2))
    },
    "han_count" -> { es =>
      arity("han_count", es, 1)
      org.apache.spark.sql.graft.HanCount(es.head)
    },
    "int8_codes" -> { es =>
      arity("int8_codes", es, 1)
      org.apache.spark.sql.graft.Int8Codes(es.head)
    },
    "int8_cosine" -> { es =>
      arity("int8_cosine", es, 2)
      org.apache.spark.sql.graft.Int8Cosine(es.head, es(1))
    },
    // KLL quantile-sketch family (the percentile sibling of Spark's
    // hll_sketch_agg); aggregates are returned unwrapped — the analyzer
    // wraps AggregateFunctions into AggregateExpressions
    "kll_sketch_agg" -> { es =>
      arity("kll_sketch_agg", es, 2)
      org.apache.spark.sql.graft.KllSketchAgg(es.head,
        intLit(es(1), "kll_sketch_agg", 1))
    },
    "kll_merge_agg" -> { es =>
      arity("kll_merge_agg", es, 2)
      org.apache.spark.sql.graft.KllMergeAgg(es.head,
        intLit(es(1), "kll_merge_agg", 1))
    },
    "kll_quantile" -> { es =>
      arity("kll_quantile", es, 2)
      org.apache.spark.sql.graft.KllQuantile(es.head, es(1))
    },
    "kll_rank" -> { es =>
      arity("kll_rank", es, 2)
      org.apache.spark.sql.graft.KllRank(es.head, es(1))
    },
    "kll_sketch_n" -> { es =>
      arity("kll_sketch_n", es, 1)
      org.apache.spark.sql.graft.KllSketchN(es.head)
    },
    // count-min sketch family — point-FREQUENCY estimates for arbitrary
    // keys (the Misra-Gries pass covers only the heavy ones); exact
    // counter-wise merge
    "cms_sketch_agg" -> { es =>
      arity("cms_sketch_agg", es, 3)
      org.apache.spark.sql.graft.CmsSketchAgg(es.head,
        intLit(es(1), "cms_sketch_agg", 1),
        intLit(es(2), "cms_sketch_agg", 2))
    },
    "cms_merge_agg" -> { es =>
      arity("cms_merge_agg", es, 3)
      org.apache.spark.sql.graft.CmsMergeAgg(es.head,
        intLit(es(1), "cms_merge_agg", 1),
        intLit(es(2), "cms_merge_agg", 2))
    },
    "cms_estimate" -> { es =>
      arity("cms_estimate", es, 2)
      org.apache.spark.sql.graft.CmsEstimate(es.head, es(1))
    },
    "cms_sketch_n" -> { es =>
      arity("cms_sketch_n", es, 1)
      org.apache.spark.sql.graft.CmsSketchN(es.head)
    },
    "cms_inner_product" -> { es =>
      arity("cms_inner_product", es, 2)
      org.apache.spark.sql.graft.CmsInnerProduct(es.head, es(1))
    },
    // exact mergeable distinct bitmaps (Roaring64 — in Spark's own
    // jars). The or/count names carry a graft_ prefix: Spark 4 ships
    // BUILT-INS called bitmap_or_agg/bitmap_count (and theta_*_agg)
    // with incompatible byte formats — shadowing them would silently
    // change what a user's existing SQL computes, and re-registering
    // over a built-in WARNs on every session init. Pinned by
    // GraftSqlSpec's no-shadowing test against FunctionRegistry.builtin.
    "bitmap_agg" -> { es =>
      arity("bitmap_agg", es, 1)
      org.apache.spark.sql.graft.BitmapAgg(es.head)
    },
    "graft_bitmap_or_agg" -> { es =>
      arity("graft_bitmap_or_agg", es, 1)
      org.apache.spark.sql.graft.BitmapOrAgg(es.head)
    },
    "graft_bitmap_count" -> { es =>
      arity("graft_bitmap_count", es, 1)
      org.apache.spark.sql.graft.BitmapCount(es.head)
    },
    // theta sketch family — the set-algebra sibling (HLL unions; theta
    // also intersects and differences at-rest segment sketches)
    "graft_theta_sketch_agg" -> { es =>
      arity("graft_theta_sketch_agg", es, 2)
      org.apache.spark.sql.graft.ThetaSketchAgg(es.head,
        intLit(es(1), "graft_theta_sketch_agg", 1))
    },
    "graft_theta_union_agg" -> { es =>
      arity("graft_theta_union_agg", es, 2)
      org.apache.spark.sql.graft.ThetaUnionAgg(es.head,
        intLit(es(1), "graft_theta_union_agg", 1))
    },
    "theta_estimate" -> { es =>
      arity("theta_estimate", es, 1)
      org.apache.spark.sql.graft.ThetaEstimate(es.head)
    },
    "theta_intersect" -> { es =>
      arity("theta_intersect", es, 2)
      org.apache.spark.sql.graft.ThetaIntersectSketch(es.head, es(1))
    },
    "theta_anotb" -> { es =>
      arity("theta_anotb", es, 2)
      org.apache.spark.sql.graft.ThetaAnotBSketch(es.head, es(1))
    },
    // Spark-native HLL++ register sketches — the oracle-replayable
    // at-rest distinct family (see org.apache.spark.sql.graft
    // .HllPpSketch); rsd is structural (sizes the register words)
    "hllpp_sketch_agg" -> { es =>
      arity("hllpp_sketch_agg", es, 2)
      org.apache.spark.sql.graft.HllPpSketchAgg(es.head,
        doubleLit(es(1), "hllpp_sketch_agg", 1))
    },
    "hllpp_merge_agg" -> { es =>
      arity("hllpp_merge_agg", es, 2)
      org.apache.spark.sql.graft.HllPpMergeAgg(es.head,
        doubleLit(es(1), "hllpp_merge_agg", 1))
    },
    "hllpp_estimate" -> { es =>
      arity("hllpp_estimate", es, 2)
      org.apache.spark.sql.graft.HllPpEstimate(es.head,
        doubleLit(es(1), "hllpp_estimate", 1))
    })

  /** Register every custom function in the session's FunctionRegistry as a
    * temp function (session-scoped, like CREATE TEMPORARY FUNCTION). */
  def register(spark: SparkSession): Unit = {
    val registry = GraftBridge.registry(spark)
    builders.foreach { case (name, b) =>
      // idempotent: re-registering a name WE already own (via a prior
      // register() call or the GraftExtensions inject path) makes Spark
      // log a "replaced a previously registered function" WARN per
      // function per session re-init — noise that buries real warnings.
      // The ownership check is by ExpressionInfo className, NOT bare
      // functionExists: a name held by something else (e.g. a Spark
      // built-in) must still be replaced, loudly.
      val ident = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
      val ours = registry.lookupFunction(ident).exists(
        _.getClassName == "graft.functions.GraftSql")
      if (!ours) {
        registry.registerFunction(ident,
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
            "graft.functions.GraftSql", name),
          b)
      }
    }
  }

  /** Same functions via [[org.apache.spark.sql.SparkSessionExtensions]] —
    * for deployments that configure `spark.sql.extensions=graft.functions
    * .GraftExtensions` instead of calling [[register]] per session. */
  def injectInto(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    builders.foreach { case (name, b) =>
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.functions.GraftSql", name),
        b))
    }
    // whole-operator extension tier: the map-side-partial top-k-per-key
    // planner strategy (org.apache.spark.sql.graft.TopKPerKey*), plus
    // the OPT-IN optimizer rule rewriting row_number()<=k windows to it
    ext.injectPlannerStrategy(_ =>
      org.apache.spark.sql.graft.TopKPerKeyStrategy)
    ext.injectOptimizerRule(_ =>
      org.apache.spark.sql.graft.TopKWindowRewrite)
  }
}

/** `spark.sql.extensions` entry point (instantiated by Spark). */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftSql.injectInto(ext)
}
