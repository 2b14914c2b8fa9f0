package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

class ObservedSpec extends SparkSpec {

  test("Observed.run returns the action result AND the plan-embedded " +
    "cap metrics; a plan without observe() nodes returns immediately") {
    import spark.implicits._
    // the planted-hot-corpus shape from TextAnalysisSpec: 25 docs share
    // one long run, so its fingerprints exceed maxDf = 20 and are cut
    val hotRun = "thisboilerplatefooterisrepeatedverbatimacrosseverysingle" +
      "documentinthecorpusandkeepsgoingonforawhile"
    val docs = (1 to 25)
      .map(i => (i.toLong, ('a' + i - 1).toChar.toString * 12 + " " + hotRun))
      .toDF("doc_id", "text")
    val (nPairs, metrics) = Observed.run(
      TextAnalysis.winnowPairs(docs, "doc_id", "text",
        minShared = 8, maxDf = 20))(_.count())
    assert(nPairs === 0L)
    val m = metrics("winnow_df_cap")
    assert(m.getAs[Long]("dropped_fingerprints") >= 1L)
    assert(m.getAs[Long]("dropped_postings") >=
      m.getAs[Long]("dropped_fingerprints") * 21L)
    // no observe() in the plan -> empty-or-unrelated metrics, no await
    val (n, _) = Observed.run(docs.select(col("doc_id")))(_.count())
    assert(n === 25L)
  }
}
