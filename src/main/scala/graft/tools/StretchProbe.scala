package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off: reproduce the driver-bench graph stretch (x50..x55 + x47
  * back-to-back, three rounds) in one shared JVM, with and without the
  * between-runs BlockManager drain, to pin the r8 volatility (x51
  * 4.5 s isolated vs 26.6 s mid-stretch in BENCH_r08).
  * Usage: StretchProbe [sfDir] [drain|nodrain]
  */
object StretchProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val drain = args.lift(1).forall(_ == "drain")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val names = Seq("x50_copurchase", "x51_label_prop", "x52_triangles",
      "x53_bm25", "x54_ancestors", "x55_random_walks", "x47_pagerank")
    val qs = graft.SparkEntry.queries
    println(s"stretch probe: drain=$drain dir=$dir")
    for (round <- 1 to 3) {
      for (name <- names) {
        val t0 = System.nanoTime()
        qs(name)(spark, dir).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        val blocks = spark.sparkContext.getPersistentRDDs.size
        println(f"round=$round $name%-18s $t%7.2f s  (persistentRDDs=$blocks)")
        if (drain) {
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
          System.gc()
        }
      }
    }
    spark.stop()
  }
}
