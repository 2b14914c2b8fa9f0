package graft.operators

import graft.SparkSpec

class GraphSpec extends SparkSpec {

  /** Local reimplementation of the integer power iteration — the spec the
    * distributed dataflow must match node-for-node. */
  private def localPageRank(edges: Seq[(String, String)],
                            iters: Int): Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var rank = nodes.map(_ -> 1000000L).toMap
    for (_ <- 0 until iters) {
      val contrib = edges
        .map { case (u, v) => v -> (rank(u) * 850L) / (1000L * outdeg(u)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      rank = nodes.map(n => n -> (150000L + contrib.getOrElse(n, 0L))).toMap
    }
    rank
  }

  test("pageRankInt matches the local integer power iteration exactly") {
    import spark.implicits._
    // a hub (a), a chain (b -> c -> d) and a dangler target (d)
    val edges = Seq(
      ("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"),
      ("b", "c"), ("c", "d"))
    val got = Graph
      .pageRankInt(edges.toDF("src", "dst"), "src", "dst", iters = 3)
      .as[(String, Long)].collect().toMap
    assert(got === localPageRank(edges, 3))
    // the hub outranks the chain tail
    assert(got("a") > got("d"))
  }

  test("dangling nodes receive rank but contribute none; result deterministic") {
    import spark.implicits._
    val edges = Seq(("a", "sink"), ("b", "sink"))
    val run = () => Graph
      .pageRankInt(edges.toDF("src", "dst"), "src", "dst", iters = 2)
      .as[(String, Long)].collect().toMap
    val got = run()
    assert(got === localPageRank(edges, 2))
    assert(got("sink") > got("a")) // sink accumulates, emits nothing
    assert(got("a") === 150000L) // no in-edges: teleport constant only
    assert(got === run())
  }

  test("triangleCounts: exact per-node counts, orientation-independent") {
    import spark.implicits._
    // two triangles sharing node 3, plus a pendant edge (6) with none
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (5L, 3L), (5L, 6L),
      // duplicates / reversed duplicates must not inflate counts
      (2L, 1L), (1L, 3L))
    val got = Graph.triangleCounts(edges.toDF("u", "v"), "u", "v")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 1L,
      6L -> 0L))
  }

  test("cooccurrenceEdges: shared-via threshold and hyper-connector cap") {
    import spark.implicits._
    val nv = Seq(
      // u,v share vias p1,p2 (edge at minShared=2); v,w share only p3
      (10L, "p1"), (10L, "p2"), (11L, "p1"), (11L, "p2"), (11L, "p3"),
      (12L, "p3"),
      // p9 is a hyper-connector shared by everyone: capped away, so it
      // must not push (10,12) over the threshold
      (10L, "p9"), (11L, "p9"), (12L, "p9")).toDF("cust", "part")
    val got = Graph
      .cooccurrenceEdges(nv, "cust", "part", minShared = 2L, maxPerVia = 2L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((10L, 11L, 2L)))
  }

  test("labelPropagation: two heavy triangles split across a weak bridge; " +
    "deterministic under repartitioning") {
    import spark.implicits._
    // triangle {1,2,3} and triangle {4,5,6}, all internal edges w=5,
    // joined by the w=1 bridge 3-4. Hand-unrolled 3 rounds converge to
    // min-label communities 1 and 4 (the bridge vote always loses)
    val edges = Seq(
      (1L, 2L, 5L), (1L, 3L, 5L), (2L, 3L, 5L),
      (4L, 5L, 5L), (4L, 6L, 5L), (5L, 6L, 5L),
      (3L, 4L, 1L)).toDF("u", "v", "w").repartition(4)
    val got = Graph.labelPropagation(edges, "u", "v", "w", iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L))
    // synchronous update + total tiebreak: partitioning can't change it
    val again = Graph.labelPropagation(edges.repartition(7), "u", "v", "w",
      iters = 3).as[(Long, Long)].collect().toMap
    assert(again === got)
  }

  test("shortestPaths: BFS hops settle at first reach; cycles and fan-in are safe") {
    import spark.implicits._
    // a->b->c->d chain with a shortcut a->c (so c is 1, not 2), a cycle
    // d->a (revisits must not relabel), and an unreachable island x->y
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"),
      ("d", "a"), ("x", "y")).toDF("s", "t").repartition(3)
    val got = Graph.shortestPaths(edges, "s", "t", Seq("a"), maxHops = 5)
      .as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 0L, "b" -> 1L, "c" -> 1L, "d" -> 2L))
    // maxHops truncates the expansion
    val capped = Graph.shortestPaths(edges, "s", "t", Seq("a"), maxHops = 1)
      .as[(String, Long)].collect().toMap
    assert(capped === Map("a" -> 0L, "b" -> 1L, "c" -> 1L))
    // multi-source: distance is to the NEAREST seed
    val multi = Graph.shortestPaths(edges, "s", "t", Seq("a", "x"),
      maxHops = 5).as[(String, Long)].collect().toMap
    assert(multi("y") === 1L && multi("d") === 2L)
  }

  test("kCore: peel cascades through chained dependence; cliques survive; " +
    "core degrees are internal degrees") {
    import spark.implicits._
    // K4 clique {1,2,3,4} + a path 4-5-6 hanging off it. 2-core: the path
    // peels in CASCADE (6 has deg 1 -> gone; then 5 drops to deg 1 ->
    // gone) while the clique stays with internal degree 3 — the pendant
    // edge 4-5 must not count toward 4's core degree
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("u", "v").repartition(3)
    val core2 = Graph.kCore(edges, "u", "v", k = 2L)
      .as[(Long, Long)].collect().toMap
    assert(core2 === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // k above the clique's degree empties the core entirely
    assert(Graph.kCore(edges, "u", "v", k = 4L).isEmpty)
    // k=1 keeps everything (every node has an edge)
    val core1 = Graph.kCore(edges, "u", "v", k = 1L)
      .as[(Long, Long)].collect().toMap
    assert(core1.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L))
    // partitioning can't change the unique fixpoint
    val again = Graph.kCore(edges.repartition(7), "u", "v", k = 2L)
      .as[(Long, Long)].collect().toMap
    assert(again === core2)
    // self-loops and duplicate rows must not inflate degrees: node 7
    // with a self-loop and one real neighbor is NOT in the 2-core
    val dirty = edges
      .unionByName(Seq((7L, 7L), (7L, 1L), (1L, 2L)).toDF("u", "v"))
    val cleaned = Graph.kCore(dirty, "u", "v", k = 2L)
      .as[(Long, Long)].collect().toMap
    assert(cleaned === core2)
    // an exhausted maxRounds FAILS LOUDLY instead of emitting a residual
    // that violates core_degree >= k: a 12-node path peels 2 endpoints
    // per round, needing 6 rounds to empty its (nonexistent) 2-core
    val path = (1L to 11L).map(i => (i, i + 1)).toDF("u", "v")
    intercept[IllegalArgumentException] {
      Graph.kCore(path, "u", "v", k = 2L, maxRounds = 3).collect()
    }
    assert(Graph.kCore(path, "u", "v", k = 2L, maxRounds = 10).isEmpty)
  }

  test("kCore: converges within the oracle's unroll depth on the real " +
    "co-purchase graph and every core degree is >= k") {
    import org.apache.spark.sql.functions._
    val edges = Graph.cooccurrenceEdges(
      graft.Tables(spark, sfDir, "lineitem")
        .join(graft.Tables(spark, sfDir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey"), col("l_partkey")),
      "o_custkey", "l_partkey", minShared = 3L)
    // maxRounds = the 8-round unroll the oracle ships: if real data ever
    // needs more rounds, THIS pin fails before the oracle silently would
    val atCap = Graph.kCore(edges, "u", "v", k = 35L, maxRounds = 8)
    val converged = Graph.kCore(edges, "u", "v", k = 35L, maxRounds = 20)
    val a = atCap.orderBy("node").collect().toSeq
    assert(a === converged.orderBy("node").collect().toSeq)
    assert(a.forall(_.getAs[Long]("core_degree") >= 35L))
  }
}
