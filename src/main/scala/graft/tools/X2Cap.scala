package graft.tools
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object X2Cap {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    for (cap <- Seq(32, 64, 128)) {
      val got = Dedup.simHashNearDup(docs, "doc_id", "text",
        threshold = 0.5, maxHamming = 7, maxBucket = cap, bands = 8)
        .count()
      println(s"sf0.01 cap=$cap: pairs=$got (want 25)")
    }
    val docs1 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    for (cap <- Seq(64, 128)) {
      val t0 = System.nanoTime()
      val n = Dedup.simHashNearDup(docs1, "doc_id", "text",
        threshold = 0.5, maxHamming = 7, maxBucket = cap, bands = 8).count()
      println(f"sf0.1 cap=$cap: rows=$n time=${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
