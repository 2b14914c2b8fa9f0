package graft

import org.apache.spark.sql.functions._

import graft.sources.{CsvManifests, Sinks, XmlDeclarations}

/** Dev drive entry for the ingestion spine: batch zip/XML read, CSV
  * manifest dispatch, and the streaming drain, over the real reference
  * fixtures. Run: `sbt "runMain graft.IngestDemo"`. */
object IngestDemo {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    println("== S2/S3: batch zip/XML declarations ==")
    val decls = XmlDeclarations.read(spark,
      "/root/reference/uploads/xml_history/processed")
    decls.withColumn("zip", split($"data_source_file", "::").getItem(0))
      .groupBy("zip").count().orderBy("zip").show(false)
    decls.select("data_source_file", "dcl_doc_no", "hawb_no", "item_sequence",
      "description_official", "ccc_code", "qty", "unit_price_calculated")
      .show(3, 40)

    println("== S4/S5: manifest CSV dispatch ==")
    val manifests = CsvManifests.readAll(spark,
      new java.io.File("src/test/resources/manifests").getAbsolutePath)
    manifests.show(10, 20)

    println("== S10: streaming drain (AvailableNow + archive) ==")
    val root = java.nio.file.Files.createTempDirectory("drain").toString
    val src = s"$root/inbox"; new java.io.File(src).mkdirs()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/reference/uploads/xml_history/processed/IPC250403407EX.zip"),
      java.nio.file.Paths.get(s"$src/IPC250403407EX.zip"))
    Sinks.drainDeclarations(spark, src, s"$root/out", s"$root/archive",
      s"$root/ckpt").awaitTermination()
    println(s"drained rows: ${spark.read.parquet(s"$root/out").count()}")
    println(s"inbox now: ${new java.io.File(src).list().mkString(",")}")
    def find(d: String): Seq[String] = {
      val f = new java.io.File(d)
      if (!f.exists()) Seq.empty
      else if (f.isFile) Seq(f.getPath)
      else f.listFiles().toSeq.flatMap(c => find(c.getPath))
    }
    println(s"archive now: ${find(s"$root/archive").mkString(",")}")
    spark.stop()
  }
}
