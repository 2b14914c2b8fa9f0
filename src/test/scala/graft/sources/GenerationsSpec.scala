package graft.sources

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Crash-injection proof for the cross-table atomic generation publish:
  * at EVERY protocol step, a reader resolving the pointer sees all
  * tables from ONE generation — never table A's new snapshot with table
  * B's old one (the mixed-generation window the per-table
  * snapshotOverwrite protocol could not close; ref
  * `batch_train.py:154-176`'s one-transaction semantics). */
class GenerationsSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-gens").toString

  private class Boom extends RuntimeException("injected crash")
  private def crashAt(p: String): String => Unit =
    q => if (q == p) throw new Boom

  // one consistent read set: resolve the pointer ONCE, read both tables
  private def readPair(root: String): (Long, Seq[String], Seq[String]) = {
    import spark.implicits._
    val v = Generations.openVersion(spark, root)
    (v,
      Generations.readTableAt(spark, root, v, "ord")
        .as[String].collect().sorted.toSeq,
      Generations.readTableAt(spark, root, v, "li")
        .as[String].collect().sorted.toSeq)
  }

  private def gen(ord: Seq[String], li: Seq[String]): Map[String, DataFrame] = {
    import spark.implicits._
    Map("ord" -> ord.toDF("v"), "li" -> li.toDF("v"))
  }

  test("a crash at ANY protocol step never exposes a mixed generation; " +
    "retry completes and sweeps the orphaned staging") {
    val root = tmp()
    val v1 = Generations.publish(spark, gen(Seq("o1"), Seq("l1")), root)
    assert(v1 === 1L)
    assert(readPair(root) === ((1L, Seq("o1"), Seq("l1"))))

    // protocol steps in firing order (tables stage in sorted order:
    // li before ord)
    for (step <- Seq("staged-li", "staged-ord", "staged", "marker-staged")) {
      intercept[Boom] {
        Generations.publish(spark, gen(Seq("o2"), Seq("l2")), root,
          crashPoint = crashAt(step))
      }
      // reader still sees generation 1, BOTH tables — nothing mixed,
      // even though some/all of gen 2 is already staged on disk
      assert(readPair(root) === ((1L, Seq("o1"), Seq("l1"))),
        s"mixed/advanced read after crash at $step")
    }
    // crash AFTER the marker rename: the publish already committed —
    // the reader sees generation 2 complete
    intercept[Boom] {
      Generations.publish(spark, gen(Seq("o2"), Seq("l2")), root,
        crashPoint = crashAt("published"))
    }
    assert(readPair(root) === ((2L, Seq("o2"), Seq("l2"))))

    // retry after the pre-commit crashes: the next publish swept the
    // orphans (no gen dir above the marker except its own) and commits 3
    val v3 = Generations.publish(spark, gen(Seq("o3"), Seq("l3")), root)
    assert(v3 === 3L)
    assert(readPair(root) === ((3L, Seq("o3"), Seq("l3"))))
    val gens = new java.io.File(root).listFiles()
      .map(_.getName).filter(_.startsWith("gen-")).sorted
    assert(gens.length === 3) // 1, 2, 3 — no orphan staging left behind
  }

  test("openVersion pins a repeatable multi-table read; older " +
    "generations stay addressable until vacuumed") {
    val root = tmp()
    Generations.publish(spark, gen(Seq("a"), Seq("x")), root)
    Generations.publish(spark, gen(Seq("b"), Seq("y")), root)
    Generations.publish(spark, gen(Seq("c"), Seq("z")), root)
    assert(Generations.currentVersion(spark, root) === Some(3L))
    assert(Generations.tablesAt(spark, root, 3L) === Seq("li", "ord"))
    import spark.implicits._
    // time-travel: generation 2 both tables
    assert(Generations.readTableAt(spark, root, 2L, "ord")
      .as[String].collect().toSeq === Seq("b"))
    assert(Generations.readTableAt(spark, root, 2L, "li")
      .as[String].collect().toSeq === Seq("y"))
    // vacuum to the newest 1: generations 1-2 (markers AND data) go
    val deleted = Generations.vacuum(spark, root, keepLast = 1)
    assert(deleted.size === 2)
    assert(Generations.currentVersion(spark, root) === Some(3L))
    assert(readPair(root) === ((3L, Seq("c"), Seq("z"))))
    intercept[org.apache.spark.sql.AnalysisException] {
      Generations.readTableAt(spark, root, 2L, "ord").collect()
    }
  }

  test("a reader RACING live publish churn always sees one generation " +
    "per read set (the guarantee the module exists for, now pinned " +
    "against concurrency, not just crashes)") {
    import spark.implicits._
    val root = tmp()
    Generations.publish(spark, gen(Seq("o1"), Seq("l1")), root)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reads = new java.util.concurrent.atomic.AtomicInteger(0)
    val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    // the reader loops the documented protocol — resolve the pointer
    // ONCE, then read every table at that version — while the writer
    // churns; any cross-generation mix or read failure is a violation.
    // (Violations queue instead of asserting: a failed assertion in a
    // spawned thread would vanish, not fail the test.)
    val reader = new Thread(() => {
      while (!stop.get()) {
        try {
          val v = Generations.openVersion(spark, root)
          val ord = Generations.readTableAt(spark, root, v, "ord")
            .as[String].collect().toSeq
          val li = Generations.readTableAt(spark, root, v, "li")
            .as[String].collect().toSeq
          if (ord != Seq(s"o$v") || li != Seq(s"l$v"))
            bad.add(s"v$v read ord=$ord li=$li")
          reads.incrementAndGet()
        } catch {
          case e: Exception => bad.add(s"read failed: ${e.getMessage}")
        }
      }
    })
    reader.start()
    try {
      var v = 1L
      while (v < 7L) // 6 publishes churning under the reader
        v = Generations.publish(spark,
          gen(Seq(s"o${v + 1}"), Seq(s"l${v + 1}")), root)
    } finally {
      stop.set(true)
      reader.join(60000)
    }
    assert(bad.isEmpty, s"racing reader violations: ${bad.toArray.mkString("; ")}")
    // the race must have actually exercised concurrent reads
    assert(reads.get() >= 3, s"only ${reads.get()} reads completed")
    assert(readPair(root) === ((7L, Seq("o7"), Seq("l7"))))
  }

  test("no committed generation -> openVersion refuses loudly; a torn " +
    "marker temp never commits") {
    val root = tmp()
    intercept[java.util.NoSuchElementException] {
      Generations.openVersion(spark, root)
    }
    // simulate a crash that left only a marker TEMP: not a commit
    val vdir = new java.io.File(s"$root/_versions")
    vdir.mkdirs()
    java.nio.file.Files.writeString(
      vdir.toPath.resolve(".tmp-v000000000007"), "")
    assert(Generations.currentVersion(spark, root) === None)
    // the next publish sweeps the temp and commits version 1
    assert(Generations.publish(spark, gen(Seq("o"), Seq("l")), root) === 1L)
    assert(!vdir.listFiles().map(_.getName).exists(_.startsWith(".tmp-")))
  }
}
