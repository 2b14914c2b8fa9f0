package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact second-moment surface over several measures at once — the
  * covariance matrix a feature-engineering or drift-monitoring pass wants
  * ("which measures move together?"), computed the way the single-pair
  * `a_covariance_exact` query does it but for ALL pairs in ONE scan.
  *
  * Scale shape: one hash aggregate accumulates n, every Σxᵢ and every
  * pairwise Σxᵢxⱼ (k(k+1)/2 cross sums, map-side combined — the fact is
  * read once regardless of k); the matrix rows then EXPLODE out of that
  * single 1-row frame as a struct array — one scan total (a union of
  * per-pair selects would re-execute the aggregate once per pair).
  * All arithmetic is integer / decimal(38,0): inputs are
  * integer-quantized by the caller (cents, basis points), cross sums are
  * exact, and the covariance rational divides with the `(x − x%y) div y`
  * spelling so truncating (Spark `div`) and flooring (DuckDB `//`)
  * integral division agree on NEGATIVE covariances.
  */
object Moments {

  /** Pairwise sample covariances (including variances on the diagonal)
    * over `cols`, which must already be integral (LONG) columns. Output:
    * one row per unordered pair i ≤ j with the power sums and
    * `cov = (n·Σxy − Σx·Σy) / (n(n−1))` in the inputs' units. */
  def covMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two measures")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i <= j
    } yield (cols(i), cols(j))
    val aggs =
      cols.map(c => sum(col(c)).as(s"s_$c")) ++
        pairs.map { case (a, b) =>
          sum(col(a).cast("decimal(38,0)") * col(b).cast("decimal(38,0)"))
            .as(s"p_${a}_$b")
        }
    val sums = df.groupBy()
      .agg(count(lit(1)).as("n"), aggs: _*)
    val pairStructs: Seq[Column] = pairs.map { case (a, b) =>
      val num = s"((cast(n as decimal(38,0)) * p_${a}_$b - " +
        s"cast(s_$a as decimal(38,0)) * cast(s_$b as decimal(38,0))) " +
        "* 1)"
      val den = "nullif(cast(n as decimal(38,0)) * cast(n - 1 as " +
        "decimal(38,0)), 0)"
      // the raw Σxy stays internal: it outgrows int64 at large SF and
      // would surface as HUGEINT on a SQL twin (the SURVEY §5 class);
      // n/Σx/Σy/cov all stay comfortably integral
      struct(lit(a).as("var_x"), lit(b).as("var_y"), col("n"),
        col(s"s_$a").as("sum_x"), col(s"s_$b").as("sum_y"),
        expr(s"cast(($num - $num % $den) div $den as bigint)").as("cov"))
    }
    sums.select(explode(array(pairStructs: _*)).as("_r")).select(col("_r.*"))
  }
}
