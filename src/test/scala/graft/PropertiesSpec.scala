package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._
import graft.operators.{GroupedMode, LinkAlign}

/** Property-based pinning (SURVEY §5.3): ScalaCheck generators produce the
  * inputs (several deterministic seeds per property), Spark evaluates each
  * sample in one bulk job, and the property is checked against a
  * straight-Scala model. */
class PropertiesSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val weirdString: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.listOf(Gen.oneOf("Ｐ", "ｏ", "衫", "风", "扇", "/", ",", "。", " ", "a",
      "B", "3", "　", "①")).map(_.mkString),
    Gen.asciiPrintableStr)

  test("normalizeText is idempotent on arbitrary (incl. full-width/CJK) strings") {
    import spark.implicits._
    val samples = (1L to 4L).flatMap(s =>
      sample(Gen.listOfN(150, weirdString), s))
    val df = samples.toDF("s")
      .select(normalizeText($"s").as("n1"),
        normalizeText(normalizeText($"s")).as("n2"))
    assert(df.where($"n1" =!= $"n2").count() === 0L)
  }

  test("modeBy winner frequency >= every other candidate's; ties -> smallest value") {
    import spark.implicits._
    for (seed <- 1L to 8L) {
      val votes = sample(
        Gen.listOfN(120, Gen.zip(Gen.choose(0, 5), Gen.choose(0, 4))), seed)
      val got = GroupedMode.modeBy(votes.toDF("g", "v"), Seq("g"), Seq("v"))
        .as[(Int, Int, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      val expected = votes.groupBy(_._1).map { case (g, vs) =>
        val counts = vs.groupBy(_._2).view.mapValues(_.size.toLong)
        val maxC = counts.values.max
        g -> (counts.filter(_._2 == maxC).keys.min, maxC)
      }
      assert(got === expected, s"seed $seed")
    }
  }

  test("alignByOrdinal emits exactly sum of per-key counts over count-matched keys") {
    import spark.implicits._
    for (seed <- 1L to 5L) {
      val gl = Gen.listOfN(80, Gen.zip(Gen.choose(0, 8), Gen.choose(0, 100)))
      val la = sample(gl, seed)
      val lb = sample(gl, seed + 100)
      val a = la.zipWithIndex.map { case ((k, v), i) => (k, i, v) }
        .toDF("k", "oa", "va")
      val b = lb.zipWithIndex.map { case ((k, v), i) => (k, i, v) }
        .toDF("k", "ob", "vb")
      val aligned = LinkAlign.alignByOrdinal(a, b, "k",
        Seq(col("oa")), Seq(col("ob"))).count()
      val ca = la.groupBy(_._1).view.mapValues(_.size)
      val cb = lb.groupBy(_._1).view.mapValues(_.size)
      val expected = ca.collect {
        case (k, n) if cb.get(k).contains(n) => n.toLong
      }.sum
      assert(aligned === expected, s"seed $seed")
    }
  }

  test("numOrZero is total: any string maps to a non-null double") {
    import spark.implicits._
    val samples = (10L to 13L).flatMap(s =>
      sample(Gen.listOfN(150, weirdString), s))
    val df = samples.toDF("s").select(numOrZero($"s").as("d"))
    assert(df.where($"d".isNull).count() === 0L)
  }

  test("int8 codes: bounded to ±127, max component hits ±127, zero maps to zero") {
    import spark.implicits._
    val vecGen = Gen.listOfN(16,
      Gen.chooseNum(-1000f, 1000f, 0f, -0f, 1f, -1f, 0.001f))
    val samples = (20L to 23L).flatMap(s =>
      sample(Gen.listOfN(100, vecGen), s)).map(_.toArray)
    val df = samples.toSeq.toDF("v")
      .select($"v", int8Codes($"v").as("c")).as[(Array[Float], Array[Byte])]
    df.collect().foreach { case (v, c) =>
      assert(c.length === v.length)
      assert(c.forall(b => b >= -127 && b <= 127)) // never -128
      val maxAbs = v.map(x => math.abs(x.toDouble)).max
      if (maxAbs > 0) {
        // the largest-magnitude component must map to exactly ±127
        assert(c.map(b => math.abs(b.toInt)).max === 127)
        // signs survive quantization wherever the code is non-zero
        v.zip(c).foreach { case (x, b) =>
          if (b != 0) assert(math.signum(x.toDouble) === math.signum(b.toDouble))
        }
      } else assert(c.forall(_ === 0))
    }
  }

  test("repetition signals: invariants hold on arbitrary multi-line text") {
    import spark.implicits._
    val textGen = Gen.listOf(Gen.oneOf(weirdString, Gen.const("\n")))
      .map(_.mkString(" "))
    val samples = (30L to 33L).flatMap(s =>
      sample(Gen.listOfN(100, textGen), s))
    val df = samples.toDF("t")
      .select(repetitionSignals($"t").as("r"))
      .select($"r.n_lines", $"r.n_distinct_lines", $"r.n_bigrams",
        $"r.top_bigram_count")
      .as[(Long, Long, Long, Long)]
    df.collect().foreach { case (nl, nd, nb, top) =>
      assert(nd >= 0 && nd <= nl) // distinct can't exceed total
      assert(nb >= 0)
      assert(top >= 0 && top <= nb) // multiplicity bounded by gram count
      assert((nb == 0) == (top == 0)) // both empty together
    }
  }

  test("chunks reconstruct any document exactly (drop each overlap prefix)") {
    import spark.implicits._
    for (seed <- 40L to 42L) {
      val docs = sample(Gen.listOfN(60, weirdString), seed)
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val byDoc = graft.operators.TextAnalysis
        .chunks(docs.toDF("doc_id", "text"), "doc_id", "text",
          size = 7, overlap = 3)
        .as[(Long, Long, Long, String)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      docs.foreach { case (id, t) =>
        val expected = t // code points == chars here only if no surrogates;
        // weirdString is BMP-only, so String equality is exact
        val rebuilt = byDoc.get(id).map(_.map { case (_, no, _, c) =>
          if (no == 0) c else c.drop(3) // overlap = 3
        }.mkString).getOrElse("")
        assert(rebuilt === expected, s"doc $id")
      }
    }
  }

  test("crossCorpusPairs equals brute-force cross-side jaccard on random corpora") {
    import spark.implicits._
    // small vocab + short docs -> dense near-dup structure, so both the
    // prefix filter's keep AND drop paths are exercised
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val doc = Gen.chooseNum(2, 8).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    def sh(t: String): Set[String] =
      t.split(" ").sliding(2).map(_.mkString(" ")).toSet
    for (seed <- 1L to 5L) {
      val newDocs = sample(Gen.listOfN(25, doc), seed)
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val refDocs = sample(Gen.listOfN(25, doc), seed + 100)
        .zipWithIndex.map { case (t, i) => ((i + 1000).toLong, t) }
      val expected = (for {
        (ni, nt) <- newDocs; (ri, rt) <- refDocs
        a = sh(nt); b = sh(rt)
        inter = (a & b).size
        if inter.toDouble / (a.size + b.size - inter) >= 0.8
      } yield (ni, ri, inter.toLong, a.size.toLong, b.size.toLong)).toSet
      val got = graft.operators.Dedup.crossCorpusPairs(
        newDocs.toDF("doc_id", "text"), refDocs.toDF("doc_id", "text"),
        "doc_id", "text", k = 2, minJaccard = 0.8)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got === expected, s"seed $seed")
    }
  }
}
