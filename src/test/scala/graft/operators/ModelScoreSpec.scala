package graft.operators

import graft.SparkSpec

class ModelScoreSpec extends SparkSpec {

  test("linearQualityScore: exact features and margin on hand-computed docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Hi there. All good!"), // 19 ch, 3 sp, 0 dg, 2 punct, 2 upper
      (2L, "x1 2 3") //  6 ch, 2 sp, 3 dg, 0 punct, 0 upper
    ).toDF("doc_id", "text")
    val got = ModelScore.linearQualityScore(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    // score = 500 - chars + 12*spaces - 8*digits + 25*punct - 3*upper
    assert(got(0) === ((1L, 19L, 3L, 0L, 2L, 2L,
      500L - 19 + 36 + 50 - 6, 0L)))
    assert(got(1) === ((2L, 6L, 2L, 3L, 0L, 0L,
      500L - 6 + 24 - 24, 0L)))
  }

  test("linearQualityScore: threshold decides the label; custom weights apply") {
    import spark.implicits._
    val docs = Seq((1L, "a b c.")).toDF("doc_id", "text")
    val keepAll = ModelScore.LinearModel(bias = 0, wChars = 0, wSpaces = 100,
      wDigits = 0, wPunct = 0, wUpper = 0, thresholdMilli = 200)
    val got = ModelScore.linearQualityScore(docs, "doc_id", "text", keepAll)
      .select("score_milli", "label").as[(Long, Long)].collect().head
    assert(got === ((200L, 1L))) // 2 spaces * 100, >= threshold
  }

  test("inference is one codegen'd projection over the scan — no join, no shuffle") {
    // a real file scan (a local relation constant-folds the whole plan away)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val plan = ModelScore.linearQualityScore(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan) // one codegen stage over the scan
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan)
    // column pruning reaches the scan: only the id and text are read
    // (another suite may have cached the table — pruning then shows on
    // the InMemoryTableScan instead of the parquet ReadSchema)
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>") ||
      "InMemoryTableScan \\[doc_id#\\d+L, text#\\d+\\]".r
        .findFirstIn(plan).isDefined, plan)
  }
}
