package graft

class SessionMemoSpec extends SparkSpec {

  test("computes once per (session, key) and memoizes the value") {
    val memo = new SessionMemo[String, Int]()
    var builds = 0
    def get(key: String) = memo.getOrCompute(spark, key) { builds += 1; builds }
    assert(get("a") === 1)
    assert(get("a") === 1) // hit — no rebuild
    assert(get("b") === 2) // distinct key builds
    assert(builds === 2)
  }

  test("a different session object recomputes even under the same key") {
    val memo = new SessionMemo[String, String]()
    val other = spark.newSession() // distinct session, shared live context
    assert(memo.getOrCompute(spark, "k")("from-base") === "from-base")
    assert(memo.getOrCompute(other, "k")("from-other") === "from-other")
    // each session keeps its own entry
    assert(memo.getOrCompute(spark, "k")("never-built") === "from-base")
    assert(memo.size === 2)
  }

  test("prune evicts dead-session entries; the next access rebuilds") {
    val memo = new SessionMemo[String, Int]()
    val other = spark.newSession()
    memo.getOrCompute(spark, "k")(1)
    memo.getOrCompute(other, "k")(2)
    assert(memo.size === 2)
    // simulate `other` having been stopped (can't stop the real shared
    // context mid-suite — the predicate is the injection point the
    // default `_.sparkContext.isStopped` flows through)
    memo.prune(isDead = _ eq other)
    assert(memo.size === 1)
    assert(memo.getOrCompute(spark, "k")(99) === 1) // survivor intact
    assert(memo.getOrCompute(other, "k")(3) === 3) // evictee rebuilds
  }

  test("live sessions are never pruned by the default predicate") {
    val memo = new SessionMemo[String, Int]()
    memo.getOrCompute(spark, "x")(7)
    memo.prune() // default: sparkContext.isStopped — false here
    assert(memo.size === 1)
  }
}
