package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: hamming distribution of true (jaccard>=0.5) pairs at sf0.01,
  * and wall-time of x2 parameter candidates at sf0.1 (bench scale).
  */
object X2Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // hamming of each true pair at sf0.01
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val sa = sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val sb = sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    val truePairs = sa.crossJoin(sb).filter(col("id_a") < col("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")), 4))
      .filter(col("jaccard") >= 0.5)
      .select("id_a", "id_b", "jaccard")
    val fps = docs.select(col("doc_id"),
      graft.functions.SketchFunctions.simHash(split(trim(col("text")), "\\s+")).as("fp"))
    val withH = truePairs
      .join(fps.select(col("doc_id").as("id_a"), col("fp").as("fp_a")), Seq("id_a"))
      .join(fps.select(col("doc_id").as("id_b"), col("fp").as("fp_b")), Seq("id_b"))
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .select("id_a", "id_b", "jaccard", "hamming")
      .orderBy(col("hamming").desc)
    withH.show(30, false)

    // bench-scale timings at sf0.1
    val docs1 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    println(s"sf0.1 docs: ${docs1.count()}")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$tag: rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("x2 bands=32 maxH=32 cap=100000")(
      Dedup.simHashNearDup(docs1, "doc_id", "text",
        threshold = 0.5, maxHamming = 32, maxBucket = 100000, bands = 32).count())
    time("x2 bands=16 maxH=15 cap=100000")(
      Dedup.simHashNearDup(docs1, "doc_id", "text",
        threshold = 0.5, maxHamming = 15, maxBucket = 100000, bands = 16).count())
    spark.stop()
  }
}
