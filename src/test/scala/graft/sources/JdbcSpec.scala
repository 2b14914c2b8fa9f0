package graft.sources

import org.apache.spark.sql.execution.ExplainMode

import graft.SparkSpec

/** Real-roundtrip JDBC tests against the in-JVM embedded Derby that ships
  * on the Spark classpath — no network, no external service. */
class JdbcSpec extends SparkSpec {

  // Derby writes derby.log into derby.system.home (default: the process
  // cwd, i.e. the repo root) on engine boot — point it at tmp BEFORE the
  // first connection so test runs never dirty the working tree
  sys.props.getOrElseUpdate("derby.system.home",
    sys.props("java.io.tmpdir") + "/graft-derby")

  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  test("jdbc: append, scan with pushdown, partitioned parallel read, overwrite") {
    import spark.implicits._
    val cfg = Jdbc.Config(url)
    val df = (1 to 100).map(i => (i.toLong, s"name_$i", i * 1.5))
      .toDF("id", "name", "amount")
    Jdbc.append(df, cfg, "t_orders")

    val back = Jdbc.scan(spark, cfg, "t_orders")
    assert(back.count() === 100L)

    // filter + projection are pushed into the generated SQL
    val q = back.where($"id" > 90).select("id", "name")
    val plan = q.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan"), plan)
    val read = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!read.contains("amount"), read) // pruned column never fetched
    assert(q.count() === 10L)

    // range-partitioned scan: 4 parallel range queries, complete coverage
    val part = Jdbc.scan(spark, cfg, "t_orders",
      Some(Jdbc.Partition("id", 1, 100, 4)))
    assert(part.rdd.getNumPartitions === 4)
    assert(part.count() === 100L)

    // append accumulates; overwrite replaces
    Jdbc.append(Seq((101L, "x", 0.0)).toDF("id", "name", "amount"), cfg, "t_orders")
    assert(Jdbc.scan(spark, cfg, "t_orders").count() === 101L)
    Jdbc.overwrite(Seq((999L, "z", 0.0)).toDF("id", "name", "amount"), cfg, "t_orders")
    assert(Jdbc.scan(spark, cfg, "t_orders").select("id").as[Long].collect()
      === Array(999L))
  }

  test("env config: generic names, url required") {
    val c = Jdbc.configFromEnv(Map(
      "GRAFT_JDBC_URL" -> url, "GRAFT_JDBC_USER" -> "u"))
    assert(c.url === url && c.user === Some("u") && c.password.isEmpty)
    intercept[IllegalArgumentException] { Jdbc.configFromEnv(Map.empty) }
  }
}
