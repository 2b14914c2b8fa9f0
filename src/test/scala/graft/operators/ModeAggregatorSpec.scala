package graft.operators

import graft.{SparkSpec, Tables}

class ModeAggregatorSpec extends SparkSpec {

  test("typed mode aggregator agrees with the window-based GroupedMode on real data") {
    import spark.implicits._
    val docs = Tables(spark, sfDir, "documents")
    val viaWindow = GroupedMode.modeBy(docs, Seq("source"), Seq("lang"))
      .select("source", "lang", "frequency")
      .as[(String, String, Long)].collect().sortBy(_._1)
    val viaAgg = docs.select($"source", $"lang").as[(String, String)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(ModeAggregator.stringMode.toColumn.name("mode"))
      .map { case (src, (lang, freq)) => (src, lang, freq) }
      .collect().sortBy(_._1)
    assert(viaAgg === viaWindow)
  }

  test("tie-break matches: smallest value wins") {
    import spark.implicits._
    val ds = Seq(("g", "b"), ("g", "a"), ("g", "b"), ("g", "a")).toDS()
    val got = ds.groupByKey(_._1).mapValues(_._2)
      .agg(ModeAggregator.stringMode.toColumn.name("mode"))
      .collect()
    assert(got === Array(("g", ("a", 2L))))
  }
}
