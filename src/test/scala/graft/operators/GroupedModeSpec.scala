package graft.operators

import graft.SparkSpec

class GroupedModeSpec extends SparkSpec {

  test("majority wins; frequency reported") {
    import spark.implicits._
    val votes = Seq(
      ("usb fan", "FAN", "8414"), ("usb fan", "FAN", "8414"),
      ("usb fan", "TOY", "9503"),
      ("bag", "BAG", "4202"))
      .toDF("src", "official", "ccc")
    val got = GroupedMode.modeBy(votes, Seq("src"), Seq("official", "ccc"))
      .as[(String, String, String, Long)].collect().sortBy(_._1)
    assert(got === Array(
      ("bag", "BAG", "4202", 1L),
      ("usb fan", "FAN", "8414", 2L)))
  }

  test("ties break deterministically by value ordering (documented delta vs pandas insertion order)") {
    import spark.implicits._
    val votes = Seq(
      ("x", "B", "2"), ("x", "A", "1"), ("x", "B", "2"), ("x", "A", "1"))
      .toDF("src", "official", "ccc")
    val got = GroupedMode.modeBy(votes, Seq("src"), Seq("official", "ccc"))
      .as[(String, String, String, Long)].collect()
    assert(got === Array(("x", "A", "1", 2L))) // tie 2-2 -> smallest value combo
  }
}
