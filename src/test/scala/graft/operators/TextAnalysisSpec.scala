package graft.operators

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {

  test("languageId: marker languages, Han-script zh, und fallback") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat and the dog is here with food"), // en markers
      (2L, "el perro es grande y la casa con jardin"), // es markers
      (3L, "USB风扇 小型 電風扇配件"), // Han chars -> zh
      (4L, "xyzzy plugh quux"), // nothing -> und
      (5L, "der hund ist gross und die katze mit")) // de markers
      .toDF("doc_id", "text")
    val got = TextAnalysis.languageId(docs, "doc_id", "text")
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "en", 2L -> "es", 3L -> "zh", 4L -> "und",
      5L -> "de"))
  }

  test("qualityScore flags short/punctuation-heavy docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a reasonable document with more than ten proper words in it easily"),
      (2L, "short doc"),
      (3L, "!!! ??? ... ;;; ::: @@@ ### $$$ %%% ^^^ &&& *** ((( )))"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.qualityScore(docs, "doc_id", "text")
      .select("doc_id", "quality_ok").as[(Long, Boolean)].collect().toMap
    assert(got(1L) === true)
    assert(got(2L) === false) // too few tokens
    assert(got(3L) === false) // punctuation-dominated
  }
}
