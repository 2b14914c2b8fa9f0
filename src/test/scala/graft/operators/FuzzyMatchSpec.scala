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
}
