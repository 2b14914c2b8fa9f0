package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Dev smoke entry: evaluates the custom Catalyst expressions
  * ([[org.apache.spark.sql.graft.NfkcNormalize]],
  * [[org.apache.spark.sql.graft.CosineSimilarity]]) end-to-end through a
  * real Spark plan over the driver testdata, printing results + the
  * physical plan so codegen participation is visible.
  *
  * Run: `sbt "runMain graft.Smoke"` (optional arg: sf dir).
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // NfkcNormalize over literal full-width text + documents.text
    val nfkc = Seq("Ｐｏｌｏ衫", "ＵＳＢ风扇/①②③", "plain ascii").toDF("s")
      .select($"s", nfkcNormalize($"s").as("nfkc"), normalizeText($"s").as("norm"))
    nfkc.show(false)

    val docs = Tables(spark, sfDir, "documents")
      .select($"doc_id", normalizeText($"text").as("norm"))
    println(s"documents normalized rows: ${docs.count()}")
    docs.show(3, 60)

    // CosineSimilarity over embeddings (self-join of first vs second vector)
    val emb = Tables(spark, sfDir, "embeddings").limit(4)
      .select($"vec_id", $"embedding")
    val a = emb.select($"vec_id".as("id_a"), $"embedding".as("va"))
    val b = emb.select($"vec_id".as("id_b"), $"embedding".as("vb"))
    val cos = a.crossJoin(b)
      .select($"id_a", $"id_b",
        cosineSim($"va", $"vb").as("cos"),
        cosineSimHof($"va", $"vb").as("cos_hof"))
    cos.show(20)
    cos.explain("formatted")
    spark.stop()
  }
}
