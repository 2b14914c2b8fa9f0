package graft
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("16").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, "/root/testdata/sf0.1", "documents")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
    }
    docs.count()
    val withSets = docs.select(col("doc_id").as("doc"), shingleHashes(col("text"), 2).as("sh"))
      .where(size(col("sh")) > 0)
    time("shingleHashes")(withSets.count())
    time("shingleHashes again")(withSets.count())
    val sig = withSets.select(col("doc"), minhashSignature(col("sh"), 32).as("sig"))
    time("sig")(sig.count())
    val buckets = sig.select(col("doc"), explode(lshBands(col("sig"), 8, 4)).as("b"))
      .select(col("doc"), col("b.band").as("band"), col("b.bucket").as("bucket"))
    time("buckets")(buckets.count())
    val l = buckets.select(col("band"), col("bucket"), col("doc").as("id_a"))
    val r = buckets.select(col("band"), col("bucket"), col("doc").as("id_b"))
    val cand = l.join(r, Seq("band","bucket")).where(col("id_a") < col("id_b"))
      .select("id_a","id_b").distinct()
    time("candidates")(cand.count())
    spark.stop()
  }
}
