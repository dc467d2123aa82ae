import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev scratch: stage-by-stage timing of ngramJaccard at SPARK_GRAFT_SF_DIR. */
object X3Prof {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftCli.session()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[x3prof] $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (_ <- 1 to 2) {
      val withDf = time("withDf-checkpoint") {
        docs.select(col("doc_id").as("id"),
            graft.operators.Dedup.shingles(col("text"), 3).as("sh"))
          .filter(size(col("sh")) > 0)
          .select(col("id"), explode(col("sh")).as("shingle0"))
          .select(col("id"), xxhash64(col("shingle0")).as("shingle"))
          .withColumn("df", count(lit(1)).over(Window.partitionBy("shingle")))
          .localCheckpoint()
      }
      val nKept = time("nKept-checkpoint") {
        withDf.filter(col("df") <= 64)
          .groupBy("id").agg(count(lit(1)).as("n")).localCheckpoint()
      }
      val rawPairs = withDf.filter(col("df").between(2, 64))
        .groupBy("shingle").agg(collect_list(col("id")).as("ids"))
        .select(explode(graft.functions.SketchFunctions.pairEncode(col("ids"))).as("pk"))
        .groupBy("pk").agg(count(lit(1)).as("inter"))
        .select(col("pk.a").as("id_a"), col("pk.b").as("id_b"), col("inter"))
      time("pairs-agg")(rawPairs.write.format("noop").mode("overwrite").save())
      println(s"[x3prof] pair rows = ${rawPairs.count()}")
      time("final") {
        rawPairs
          .join(nKept.select(col("id").as("id_a"), col("n").as("n_a")), Seq("id_a"))
          .join(nKept.select(col("id").as("id_b"), col("n").as("n_b")), Seq("id_b"))
          .withColumn("jaccard", round(col("inter").cast("double") /
            (col("n_a") + col("n_b") - col("inter")), 4))
          .filter(col("jaccard") >= 0.5)
          .select("id_a", "id_b", "jaccard")
          .orderBy("id_a", "id_b")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
