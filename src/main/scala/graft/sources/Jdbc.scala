package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC variants of the columnar scan and append/overwrite sinks (SURVEY
  * §2.1 S7/S8 "JDBC variant"): the reference's actual store is a MySQL
  * engine built from environment variables (ref `src/database.py:17-38`;
  * `to_sql` at `import_xml_history.py:205`, `process_excel_order.py:235`,
  * `batch_train.py:176`). These are thin wrappers over Spark's JDBC source
  * — predicate pushdown (filters become WHERE clauses) and column pruning
  * (the SELECT list) are the source's defaults and ride through untouched.
  *
  * Scale note: an unpartitioned JDBC read is ONE task — a single executor
  * pulling the whole table through one connection. Always pass `partition`
  * for tables of any size; it splits the scan into `numPartitions`
  * range-bounded queries executed in parallel, the JDBC analog of file
  * splits.
  */
object Jdbc {

  /** Connection config. Env names are engine-generic (the reference reads
    * its own set; any deployment maps theirs here). */
  case class Config(url: String, user: Option[String] = None,
                    password: Option[String] = None,
                    driver: Option[String] = None)

  /** Range-partitioned read: split `column` (numeric) into `numPartitions`
    * slices over [lowerBound, upperBound]. */
  case class Partition(column: String, lowerBound: Long, upperBound: Long,
                       numPartitions: Int)

  /** Config from environment: GRAFT_JDBC_URL (required), GRAFT_JDBC_USER /
    * GRAFT_JDBC_PASSWORD / GRAFT_JDBC_DRIVER (optional). */
  def configFromEnv(env: Map[String, String] = sys.env): Config =
    Config(
      url = env.getOrElse("GRAFT_JDBC_URL",
        throw new IllegalArgumentException("GRAFT_JDBC_URL is not set")),
      user = env.get("GRAFT_JDBC_USER"),
      password = env.get("GRAFT_JDBC_PASSWORD"),
      driver = env.get("GRAFT_JDBC_DRIVER"))

  private def props(cfg: Config): java.util.Properties = {
    val p = new java.util.Properties
    cfg.user.foreach(p.setProperty("user", _))
    cfg.password.foreach(p.setProperty("password", _))
    cfg.driver.foreach(p.setProperty("driver", _))
    p
  }

  /** S7 (JDBC) — table scan. Follow with `.select(...).where(...)` as with
    * any source; Catalyst pushes both into the generated SQL. */
  def scan(spark: SparkSession, cfg: Config, table: String,
           partition: Option[Partition] = None): DataFrame =
    partition match {
      case Some(p) => spark.read.jdbc(cfg.url, table, p.column,
        p.lowerBound, p.upperBound, p.numPartitions, props(cfg))
      case None => spark.read.jdbc(cfg.url, table, props(cfg))
    }

  /** S8 (JDBC) — append sink (ref `to_sql(..., if_exists='append')`). */
  def append(df: DataFrame, cfg: Config, table: String): Unit =
    df.write.mode("append").jdbc(cfg.url, table, props(cfg))

  /** Overwrite sink. `truncate=true` keeps the existing table's schema and
    * grants (TRUNCATE + INSERT — the reference's snapshot protocol inside
    * MySQL, ref `batch_train.py:172-176`, minus the cross-table backup,
    * which [[Sinks.snapshotOverwrite]] provides on the columnar store). */
  def overwrite(df: DataFrame, cfg: Config, table: String): Unit =
    df.write.mode("overwrite").option("truncate", "true")
      .jdbc(cfg.url, table, props(cfg))
}
