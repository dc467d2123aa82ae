package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Bucketing = pre-shuffling at write time: two tables bucketed by the join
  * key co-locate matching keys, so the join plans with ZERO exchanges —
  * the pattern that turns a repeated 100 TB shuffle into a one-time cost.
  */
class BucketedJoinSpec extends GraftSparkSpec {

  test("join of co-bucketed tables plans without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft-bucket").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    // AQE wraps the plan in AdaptiveSparkPlanExec (a leaf) — collect{} on it
    // finds nothing, making the shuffle assertion vacuous. Disable for the
    // plan inspection.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
      orders.write.mode("overwrite")
        .option("path", s"$wh/orders_b").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("orders_b")
      lineitem.write.mode("overwrite")
        .option("path", s"$wh/lineitem_b").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("lineitem_b")

      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"))

      val bucketedShuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      // the join itself is exchange-free; the only shuffle allowed is the
      // final single-column aggregation
      assert(bucketedShuffles.size <= 1,
        s"expected at most the agg exchange, got:\n${joined.queryExecution.executedPlan}")
      // non-vacuity: the same join over the UNBUCKETED tables does shuffle
      // both sides, so the collect provably sees exchanges when present
      val plainJoined = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      val plainShuffles = plainJoined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(plainShuffles.size > bucketedShuffles.size,
        s"sanity: unbucketed join should shuffle more (got ${plainShuffles.size})")

      // and the result matches the plain (shuffled) join — same frame the
      // shuffle-count sanity check inspected, so the two can't drift
      val expected = plainJoined
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
