package graft.functions

import graft.SparkSpec

class GraftSqlSpec extends SparkSpec {

  test("engine sessions have the functions without explicit registration") {
    // Sessions.builder injects GraftSql via SparkSessionExtensions — the
    // shared test session must already resolve the names from SQL text
    import spark.implicits._
    assert(spark.sql("SELECT nfkc_normalize('Ａ') AS v").as[String].head() === "A")
  }

  test("custom expressions are SQL-callable after registration") {
    import spark.implicits._
    GraftSql.register(spark)
    GraftSql.register(spark) // idempotent (createOrReplace)

    assert(spark.sql("SELECT nfkc_normalize('Ｐｏｌｏ衫') AS v")
      .as[String].head() === "Polo衫")
    // the full reference normalizer: NFKC, upper, last /-segment,
    // punctuation strip (CJK preserved), whitespace collapse
    assert(spark.sql("SELECT graft_normalize_text('bag/ＵＳＢ风扇!!') AS v")
      .as[String].head() === "USB风扇")
    assert(spark.sql(
      "SELECT cosine_sim(CAST(array(3.0, 4.0) AS array<float>), " +
        "CAST(array(3.0, 4.0) AS array<float>)) AS v")
      .as[Double].head() === 1.0)
    assert(spark.sql("SELECT size(shingle_hashes('a b c', 2)) AS v")
      .as[Int].head() === 2)
    assert(spark.sql("SELECT shingles('a b c', 2) AS v")
      .as[Seq[String]].head() === Seq("a b", "b c"))
    assert(spark.sql(
      "SELECT size(minhash_signature(shingle_hashes('a b c', 2), 16)) AS v")
      .as[Int].head() === 16)
    assert(spark.sql(
      "SELECT sorted_intersect_count(array(1L, 3L, 7L), " +
        "array(2L, 3L, 7L, 9L)) AS v")
      .as[Long].head() === 2L)
    assert(spark.sql(
      "SELECT dot_long(array(2L, -3L, 5L), array(7L, 1L, 10L)) AS v")
      .as[Long].head() === 61L)
    // a null ELEMENT nulls the result (matches the composed
    // aggregate(zip_with) form it replaced) — it must never count as 0
    assert(spark.sql(
      "SELECT dot_long(array(2L, NULL, 5L), array(7L, 1L, 10L)) AS v")
      .head().isNullAt(0))
    assert(spark.sql(
      "SELECT dot_long(array(2L), CAST(NULL AS array<bigint>)) AS v")
      .head().isNullAt(0))
    assert(spark.sql(
      "SELECT size(char_ngram_counts('ab', 2)) AS v") // " a","ab","b ","a","b"
      .as[Int].head() === 5)
    assert(spark.sql(
      "SELECT repetition_signals('a b a b').top_bigram_count AS v")
      .as[Long].head() === 2L) // "a b" twice
    assert(spark.sql("SELECT han_count('風扇 fan') AS v")
      .as[Int].head() === 2)
    // "a b a b": top bigram "a b" x2 (mass 6); 5..8-grams impossible ->
    // [2, 6, top3=1, mass3=5, top4=1, mass4=7, 0, 0, 0, 0]
    assert(spark.sql(
      "SELECT dup_ngram_stats(split('a b a b', ' ')) AS v")
      .as[Seq[Long]].head() === Seq(2L, 6L, 1L, 5L, 1L, 7L, 0L, 0L, 0L, 0L))
    // 'The #cat...': 2 words, 10 non-ws chars, 1 hash, 1 '...', 1 line
    // (not a bullet, ends in dots), both words alphabetic, 'the' hits
    assert(spark.sql("SELECT gopher_stats('The #cat...') AS v")
      .as[Seq[Long]].head() === Seq(2L, 10L, 1L, 1L, 1L, 0L, 1L, 2L, 1L))
    // line 1 kept (terminal '.' + 6 words, 34 chars); 'short' not; one
    // sentence mark; lorem-ipsum page gate fires
    assert(spark.sql(
      "SELECT c4_stats('Lorem ipsum makes five words here.\nshort') AS v")
      .as[Seq[Long]].head() === Seq(2L, 1L, 34L, 1L, 1L, 0L, 0L))
    // mojibake: damaged e-acute (C3 A9 as cp1252) repairs, count 1
    assert(spark.sql(
      "SELECT mojibake_repair('caf' || chr(195) || chr(169) || '!') AS v")
      .select("v.fixed", "v.n_bad").as[(String, Long)].head()
      === (("caf\u00e9!", 1L)))
    assert(spark.sql(
      "SELECT int8_cosine(int8_codes(CAST(array(1.0, 2.0) AS array<float>)), " +
        "int8_codes(CAST(array(2.0, 4.0) AS array<float>))) AS v")
      .as[Double].head() === 1.0) // parallel vectors -> identical codes
    // winnowing: "abcdefgh" with k=5,w=4 -> grams of 5 chars (4 of them),
    // one window -> exactly 1 fingerprint; case/punct-insensitive
    assert(spark.sql(
      "SELECT size(winnow_fingerprints('abcdefgh', 5, 4)) AS v")
      .as[Int].head() === 1)
    assert(spark.sql(
      "SELECT winnow_fingerprints('A-b C!d EF... gh', 5, 4) AS v")
      .as[Seq[String]].head() ===
      spark.sql("SELECT winnow_fingerprints('abcdefgh', 5, 4) AS v")
        .as[Seq[String]].head())
    // SQL call equals the Scala DSL result
    val viaSql = spark.sql(
      "SELECT simhash64(split('hello world', ' ')) AS v").as[Long].head()
    val viaDsl = Seq("hello world").toDF("text")
      .select(org.apache.spark.sql.GraftBridge.column(
        org.apache.spark.sql.graft.SimHash64(
          org.apache.spark.sql.GraftBridge.expression(
            GraftFunctions.tokens(org.apache.spark.sql.functions.col("text")))))
        .as("v")).as[Long].head()
    assert(viaSql === viaDsl)
  }

  test("SQL graft_normalize_text equals the DSL normalizeText on real documents") {
    import spark.implicits._
    GraftSql.register(spark)
    val docs = graft.Tables(spark, sfDir, "documents").limit(200).cache()
    docs.createOrReplaceTempView("docs_sqlfn")
    val viaSql = spark.sql("SELECT graft_normalize_text(text) AS v FROM docs_sqlfn")
    val viaDsl = docs.select(GraftFunctions.normalizeText($"text").as("v"))
    assert(viaSql.except(viaDsl).count() === 0L)
    assert(viaDsl.except(viaSql).count() === 0L)
  }

  test("no registered name shadows a Spark built-in function") {
    // Spark 4 ships bitmap_or_agg / bitmap_count / theta_*_agg built-ins
    // with byte formats incompatible with ours — shadowing one silently
    // changes what a user's existing SQL computes, and re-registering
    // over a built-in WARNs at every session init. Colliding names carry
    // a graft_ prefix instead; this pin catches new collisions when the
    // Spark version moves.
    val builtin =
      org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin
    val shadowed = graft.functions.GraftSql.builderNames.filter(n =>
      builtin.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(n)))
    assert(shadowed === Seq.empty[String])
  }

  test("register() is idempotent and keeps ours over same-name built-ins") {
    GraftSql.register(spark)
    GraftSql.register(spark) // second call must be a no-op, not a replace
    import spark.implicits._
    // graft_bitmap_count reads OUR Roaring64 bytes (bitmap_agg output)
    val n = spark.sql(
      "SELECT graft_bitmap_count(bitmap_agg(id)) FROM range(100)")
      .as[Long].head()
    assert(n === 100L)
  }

  test("structural int parameters must be literals") {
    GraftSql.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT shingle_hashes('a b c', id) FROM range(3)").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
