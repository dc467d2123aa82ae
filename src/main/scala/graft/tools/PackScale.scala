package graft.tools

import graft.operators.Pack
import graft.sources.LogDataGenerator
import org.apache.spark.sql.functions._

/** Dev probe: single-stream packing at reference scale (millions of rows) —
  * global-window cumsum (single-partition sort) vs the two-phase prefix sum.
  */
object PackScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 5000000L
    val spark = graft.GraftCli.session()
    val docs = LogDataGenerator.toCsvLines(LogDataGenerator.generate(spark, n))
      .withColumn("id", monotonically_increasing_id())
      .withColumn("stream", lit("g"))
      .localCheckpoint() // isolate generation cost from the measurement
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[packscale] $tag: rows=$r time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time(s"two-phase n=$n")(
      Pack.packedSpansGlobal(docs, "id", "value", 2048).count())
    time(s"global-window n=$n")(
      Pack.packedSpans(docs, "id", "value", "stream", 2048).count())
    spark.stop()
  }
}
