package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure the per-group top-k shapes at scale: the bounded-heap
  * `topk_struct` aggregate (ObjectHashAggregate, map-side partial heaps)
  * vs the `row_number` window form (full shuffle + per-group sort).
  * Synthetic (group, value, id) rows; both produce identical result sets
  * (spec-pinned in Round10OpsSpec) — this probe measures only cost.
  * Usage: TopKScale [rows] [groups] [k]
  */
object TopKScale {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val groups = args.lift(1).map(_.toLong).getOrElse(1000L)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def base = spark.range(rows).selectExpr(
      s"id % $groups AS g",
      "CAST((id * 2654435761) % 1000000007 AS BIGINT) AS v",
      "id")
    def timed(f: => Long): (Long, Double) = {
      System.gc()
      val t0 = System.nanoTime(); val n = f
      (n, (System.nanoTime() - t0) / 1e9)
    }
    println(s"rows=$rows groups=$groups k=$k")
    for (rep <- 1 to 3) {
      val (na, ta) = timed {
        base.groupBy("g")
          .agg(graft.functions.AggFunctions.topKStruct(
            struct((-col("v")).as("nv"), col("id")), k).as("top"))
          .select(explode(col("top"))).count()
      }
      val (nw, tw) = timed {
        import org.apache.spark.sql.expressions.Window
        base.withColumn("rk", row_number().over(
            Window.partitionBy("g").orderBy(desc("v"), col("id"))))
          .filter(col("rk") <= k).count()
      }
      require(na == nw, s"result cardinality mismatch: $na vs $nw")
      println(f"rep=$rep topk_agg=$ta%.2f s window=$tw%.2f s ($na rows)")
    }
    spark.stop()
  }
}
