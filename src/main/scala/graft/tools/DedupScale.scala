import org.apache.spark.sql.functions._

/** Dev measurement: does the single-shuffle pair machinery hold up when
  * the corpus is 20x the bench scale? Tiles the sf0.1 documents table
  * `copies` times (ids offset per tile; one marker token appended per tile
  * so tiles are near- but not exact duplicates of each other), then times
  * MinHash-LSH pair detection end-to-end and reports pair counts.
  * Expected: wall time grows ~linearly with corpus size (bucket caps keep
  * the pair stage from going quadratic even though every doc now has
  * ~copies near-duplicates).
  *
  * `runMain DedupScale [copies]`
  */
object DedupScale {
  def main(args: Array[String]): Unit = {
    val copies = if (args.nonEmpty) args(0).toInt else 20
    val spark = graft.GraftCli.session()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val nBase = base.count()

    for (c <- Seq(1, math.max(copies / 4, 2), copies)) {
      val tiled = base
        .crossJoin(spark.range(c).toDF("tile"))
        .select(
          (col("doc_id") * c + col("tile")).as("doc_id"),
          concat(col("text"), lit(" marker"), col("tile")).as("text"))
        .localCheckpoint() // measure the dedup, not the tiling
      val t0 = System.nanoTime()
      val nPairs = graft.operators.Dedup
        .minHashLsh(tiled, "doc_id", "text", threshold = 0.5)
        .count()
      println(f"[dedupscale] docs=${nBase * c}%9d pairs=$nPairs%9d " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
