package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SkylineSpec extends SparkSpec {

  /** The literal dominance definition, all-pairs — the oracle shape. */
  private def brute(df: DataFrame, x: String, y: String): Set[(Long, Long)] = {
    val pts = df.select(col(x).cast("long"), col(y).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    pts.filter { case (sx, sy) =>
      !pts.exists { case (ox, oy) =>
        ox >= sx && oy >= sy && (ox > sx || oy > sy)
      }
    }.toSet
  }

  test("pareto2d equals the all-pairs dominance definition on real data") {
    val pts = Tables(spark, sfDir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long"))
        .as("spend_cents"), count(lit(1)).as("n_orders"))
    val got = Skyline.pareto2d(pts, "spend_cents", "n_orders")
      .select("spend_cents", "n_orders")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === brute(pts, "spend_cents", "n_orders"))
    assert(got.nonEmpty)
  }

  test("tied duplicates of a frontier point all survive; dominated ties drop") {
    import spark.implicits._
    val df = Seq(
      ("a", 10L, 1L), ("b", 10L, 1L), // tied frontier point: both survive
      ("c", 10L, 0L),                 // same x, lower y: dominated
      ("d", 5L, 5L),                  // incomparable: survives
      ("e", 4L, 5L),                  // dominated by d (y ties, x lower)
      ("f", 0L, 9L)                   // survives
    ).toDF("id", "x", "y")
    val got = Skyline.pareto2d(df, "x", "y")
      .select("id").as[String].collect().toSet
    assert(got === Set("a", "b", "d", "f"))
  }

  test("monotone data collapses to the single maximal point; empty input is empty") {
    import spark.implicits._
    val chain = (1L to 100L).map(i => (i, i, i)).toDF("id", "x", "y")
    val got = Skyline.pareto2d(chain, "x", "y")
      .select("id").as[Long].collect().toSeq
    assert(got === Seq(100L))
    val empty = Skyline.pareto2d(chain.where($"x" < 0), "x", "y")
    assert(empty.count() === 0L)
  }
}
