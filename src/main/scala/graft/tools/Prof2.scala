import org.apache.spark.sql.functions._
import graft.functions.SketchFunctions
import graft.operators.Dedup

/** Throwaway stage-bisection profiler for the dedup family. */
object Prof2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftCli.session()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs0 = spark.read.parquet(s"$dir/documents.parquet")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof2] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // stage 1: shingles only
    time("shingles_count") {
      docs0.select(col("doc_id").as("id"),
        Dedup.shingles(col("text"), 3).as("sh"))
        .filter(size(col("sh")) > 0)
        .write.format("noop").mode("overwrite").save()
    }
    // stage 2: + minhash
    time("minhash_count") {
      docs0.select(col("doc_id").as("id"),
        Dedup.shingles(col("text"), 3).as("sh"))
        .filter(size(col("sh")) > 0)
        .withColumn("sig", SketchFunctions.minHash(col("sh"), 32))
        .write.format("noop").mode("overwrite").save()
    }
    // stage 3: + localCheckpoint
    time("minhash_ckpt") {
      docs0.select(col("doc_id").as("id"),
        Dedup.shingles(col("text"), 3).as("sh"))
        .filter(size(col("sh")) > 0)
        .withColumn("sig", SketchFunctions.minHash(col("sh"), 32))
        .localCheckpoint()
    }
    // x3 stages
    val posting = docs0.select(col("doc_id").as("id"),
      Dedup.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("id"), explode(col("sh")).as("shingle"))
    time("posting_count") { println("  rows=" + posting.count()) }
    val dfCounts = posting.groupBy("shingle").count()
    time("dfcounts") { println("  rows=" + dfCounts.count()) }
    val kept = posting.join(
      dfCounts.filter(col("count") <= 64).select("shingle"),
      Seq("shingle"), "left_semi")
    time("kept") { println("  rows=" + kept.count()) }
    val nKept = kept.groupBy("id").agg(count(lit(1)).as("n"))
    val rp0 = posting.join(
        dfCounts.filter(col("count").between(2, 64)).select("shingle"),
        Seq("shingle"), "left_semi")
      .join(nKept, Seq("id"))
    time("rp_count") { println("  rows=" + rp0.count()) }
    val rp = time("rp_ckpt") { rp0.localCheckpoint() }
    time("selfjoin_agg") {
      val out = rp.select(col("shingle"), col("id").as("id_a"), col("n").as("n_a"))
        .join(rp.select(col("shingle"), col("id").as("id_b"), col("n").as("n_b")),
          Seq("shingle"))
        .filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(count(lit(1)).as("inter"))
      println("  rows=" + out.count())
    }
    spark.stop()
  }
}
