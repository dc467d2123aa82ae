package graft.tools

import graft.operators.Graph
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement behind SCALE.md's PageRank row: iterative link analysis
  * over synthetic power-law graphs at 10-50 M edges.
  *
  * Graph shape: preferential-attachment-ish — dst ~ floor(nNodes *
  * u^3) concentrates in-links on low node ids (a few hub nodes carry a
  * large in-degree share, the web-graph regime), src uniform. Two arms:
  *
  *   unrolled: Graph.pagerank as shipped (iterations unrolled between
  *     checkpoints; standing frames persist()ed so AQE broadcasts the
  *     node-sized rank into every edge join).
  *   eager-ckpt: checkpointInterval = 1 — the per-round materialization
  *     the shipped default avoids; kept as the honest counterpoint.
  *
  * Usage: GraphScale [nEdgesMillions...] (default 10 30)
  */
object GraphScale {
  def main(args: Array[String]): Unit = {
    val sizesM = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(10, 30)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def edges(nEdges: Long) = {
      val nNodes = nEdges / 20 // avg out-degree 20
      spark.range(nEdges).select(
        pmod(xxhash64(col("id")), lit(nNodes)).as("src"),
        // u^3 concentrates dsts near 0: hub nodes with heavy in-degree
        floor(lit(nNodes.toDouble) *
          pow(pmod(xxhash64(col("id"), lit(7)), lit(1000000)) / 1e6,
            lit(3.0))).as("dst"))
        .filter(col("src") =!= col("dst"))
    }

    def timed(f: => Any): Double = {
      System.gc()
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // warm: classloading + codegen out of the first measurement
    Graph.pagerank(edges(100000L), iters = 2).agg(sum("r")).head()

    println(f"${"edges"}%6s ${"unrolled_3it"}%12s ${"eager_ckpt_3it"}%14s")
    for (m <- sizesM) {
      val n = m * 1000000L
      val tUnrolled = timed {
        Graph.pagerank(edges(n), iters = 3, checkpointInterval = 5)
          .agg(sum("r"), max("r")).head()
      }
      spark.sharedState.cacheManager.clearCache()
      val tEager = timed {
        Graph.pagerank(edges(n), iters = 3, checkpointInterval = 1)
          .agg(sum("r"), max("r")).head()
      }
      spark.sharedState.cacheManager.clearCache()
      println(f"${m}%4dM ${tUnrolled}%10.2f s ${tEager}%12.2f s")
    }
    spark.stop()
  }
}
