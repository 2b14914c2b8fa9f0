package graft
import java.nio.file.{Files, Paths}
/** Spark-free dump of SparkEntry.oracleSql → oracle_sql.json, for the
  * fast oracle-type audit (tools/audit_oracle_types.py) without paying a
  * full Verify run. Evaluating `oracleSql` touches no SparkSession — the
  * map is pure string literals — so this finishes in JVM-startup time. */
object DumpOracles {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/oracle_sql.json")
    Files.writeString(Paths.get(out), Verify.oracleJson)
    println(s"[dump-oracles] ${SparkEntry.oracleSql.size} oracles -> $out")
  }
}
