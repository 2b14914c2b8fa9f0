package graft.operators

import graft.SparkSpec

class FuzzyMatchSpec extends SparkSpec {

  test("best match by edit distance, lexicographic tiebreak, bound drops non-matches") {
    import spark.implicits._
    val dirty = Seq((1L, "kitten"), (2L, "ax"), (3L, "zzzzzzzz"))
      .toDF("id", "s")
    val clean = Seq("sitting", "mitten", "ay", "az", "beta").toDF("c")
    val got = FuzzyMatch.bestMatch(dirty, clean, "s", "c", maxDistance = 3)
      .select("id", "match", "distance")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    // kitten: mitten at 1 beats sitting at 3
    // ax: ay and az both at 1 -> lexicographically smaller "ay" wins
    // zzzzzzzz: nothing within 3 -> dropped
    assert(got === Array((1L, "mitten", 1L), (2L, "ay", 1L)))
  }

  test("the dimension side broadcasts; no shuffle of the dirty side for the join") {
    import spark.implicits._
    val dirty = Seq((1L, "abc")).toDF("id", "s")
    val clean = Seq("abd").toDF("c")
    val plan = FuzzyMatch.bestMatch(dirty, clean, "s", "c", 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), plan)
  }

  test("fellegiSunterScore: weights sum per agreement pattern; bands split " +
    "at the pinned cuts; NULL counts as disagreement") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import FuzzyMatch.FsField
    val pairs = Seq(
      (1L, Some(10L), 10L), // both agree: 2000 + 500 = 2500 -> match
      (2L, Some(10L), 99L), // first only: 2000 - 300 = 1700 -> possible
      (3L, Some(99L), 99L), // second only: -700 + 500 = -200 -> nonmatch
      (4L, None, 10L) // NULL left: both predicates null -> full disagree
    ).toDF("id", "a", "b")
    val fields = Seq(
      FsField("f1", col("a") === 10L, 2000L, -700L),
      FsField("f2", col("a") === col("b"), 500L, -300L))
    val got = FuzzyMatch.fellegiSunterScore(pairs, fields,
      matchMin = 2500L, possibleMin = 0L)
      .select("id", "score_milli", "band").as[(Long, Long, String)]
      .collect().sortBy(_._1)
    assert(got === Array(
      (1L, 2500L, "match"), (2L, 1700L, "possible"),
      (3L, -200L, "nonmatch"), (4L, -1000L, "nonmatch")))
  }
}
