package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness. */
  private[graft] def jsonString(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private[graft] def oracleJson: String = SparkEntry.oracleSql
    .map { case (k, v) => s"${jsonString(k)}: ${jsonString(v)}" }
    .mkString("{", ",", "}")

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_VERIFY_ONLY=name,name restricts the dump — the triage
    // loop for a single failing oracle (the checker then reports only the
    // dumped subset). Unset = full registry, the driver's mode.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = Sessions.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    val json = oracleJson
    // subset marker BEFORE oracle_sql.json so the checker (which treats
    // oracle_sql.json as the run-complete sentinel) can restrict its
    // missing-dump accounting to the requested names. A FULL run must
    // DELETE any stale marker from an earlier subset run into the same
    // dir — otherwise the checker would keep restricting itself to the
    // old subset and report green while full-registry queries failed
    only match {
      case Some(names) => Files.writeString(
        Paths.get(s"$outDir/verify_only.txt"), names.toSeq.sorted.mkString("\n"))
      case None =>
        Files.deleteIfExists(Paths.get(s"$outDir/verify_only.txt"))
    }
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
