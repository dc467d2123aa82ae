package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: measure the x47 fixture built two ways — the shipped
  * `cp UNION ALL cp-swapped` (recomputes the orders⋈lineitem+distinct
  * pipeline once per branch) vs a 2-element array explode (one pass) —
  * and the downstream pagerank cost over each. Usage: BidirectProbe [sfDir]
  */
object BidirectProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def cp = {
      val orders = spark.read.parquet(s"$dir/orders.parquet")
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      broadcast(orders.select(col("o_orderkey"), col("o_custkey"))
          .filter(col("o_custkey") % 10 === 0))
        .join(li.select(col("l_orderkey"), col("l_partkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("c"),
          (col("l_partkey") * 2 + 1).as("p"))
        .distinct()
    }
    def union = cp.select(col("c").as("src"), col("p").as("dst"))
      .unionAll(cp.select(col("p").as("src"), col("c").as("dst")))
    def exploded = cp.select(explode(array(
        struct(col("c").as("src"), col("p").as("dst")),
        struct(col("p").as("src"), col("c").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))

    def timed(f: => Any): Double = {
      System.gc()
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def drain(): Unit = spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    for (rep <- 1 to 3) {
      val tu = timed { union.write.format("noop").mode("overwrite").save() }
      val te = timed { exploded.write.format("noop").mode("overwrite").save() }
      val tpu = timed {
        graft.operators.Graph.pagerank(union, iters = 3, checkpointInterval = 5)
          .orderBy(desc("r"), col("node")).limit(20).collect()
      }
      drain()
      val tpe = timed {
        graft.operators.Graph.pagerank(exploded, iters = 3, checkpointInterval = 5)
          .orderBy(desc("r"), col("node")).limit(20).collect()
      }
      drain()
      println(f"rep=$rep edges union=$tu%.2f explode=$te%.2f  " +
        f"pagerank union=$tpu%.2f explode=$tpe%.2f")
    }
    spark.stop()
  }
}
