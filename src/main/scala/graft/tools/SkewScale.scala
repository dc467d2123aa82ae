package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement behind SCALE.md's skew-kit row: planted-Zipf workloads
  * through the three mitigation tiers (Skew.scala) —
  *
  *   JOIN arm: facts (hot key = 30% of rows) ⋈ 100k-key dim with
  *     broadcast ruled out (threshold -1, the regime salting exists for):
  *     plain SMJ (AQE off) vs AQE skew-join vs Skew.saltedJoin.
  *   AGG arm: collect_list payload aggregation (partial aggregation
  *     cannot shrink the hot group) direct vs Skew.saltedAgg two-phase.
  *
  * Usage: SkewScale [nRowsMillions...] (default 10 50)
  */
object SkewScale {
  def main(args: Array[String]): Unit = {
    val sizesM = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(10, 50)
    val nKeys = 100000L
    val factor = 16
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // salting is for when broadcast is RULED OUT (dim too big in prod);
    // force the shuffle-join regime so the comparison is honest
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def facts(n: Long) = spark.range(n).select(
      // 30% of rows on key 0, the rest uniform over the key space — the
      // shape AQE's split can handle for joins but not for payload aggs
      when(pmod(col("id"), lit(10)) < 3, lit(0L))
        .otherwise(pmod(xxhash64(col("id")), lit(nKeys - 1)) + 1).as("key"),
      (col("id") % 97).cast("double").as("v"))
    val dims = spark.range(nKeys).select(col("id").as("key"),
      (col("id") % 31).cast("double").as("w"))

    def timed(f: => Any): Double = {
      // median-of-3 with an untimed GC between runs (same discipline as
      // Bench.scala: a shared JVM's GC stalls roam otherwise)
      val ts = (0 until 3).map { _ =>
        System.gc()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(1)
    }
    def withAqe(on: Boolean)(f: => Double): Double = {
      spark.conf.set("spark.sql.adaptive.enabled", on.toString)
      try f finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }

    // warm both paths: classloading + codegen out of the first measurement
    facts(100000L).join(dims, "key").agg(sum(col("v") * col("w"))).head()
    facts(100000L).groupBy("key").agg(collect_list(col("v")).as("vals"))
      .agg(sum(size(col("vals")))).head()

    println(f"${"rows"}%6s ${"join_plain"}%10s ${"join_aqe"}%9s ${"join_salt"}%10s ${"agg_plain"}%10s ${"agg_salt"}%9s")
    sizesM.foreach { m =>
      val n = m * 1000000L
      val f = facts(n)
      val joinPlain = withAqe(false)(timed(
        f.join(dims, "key").agg(sum(col("v") * col("w"))).head()))
      val joinAqe = withAqe(true)(timed(
        f.join(dims, "key").agg(sum(col("v") * col("w"))).head()))
      val joinSalt = withAqe(false)(timed(
        graft.operators.Skew.saltedJoin(f, dims, "key", factor)
          .agg(sum(col("v") * col("w"))).head()))
      val aggPlain = withAqe(true)(timed(
        f.groupBy("key").agg(collect_list(col("v")).as("vals"))
          .agg(sum(size(col("vals")))).head()))
      val aggSalt = withAqe(true)(timed(
        graft.operators.Skew.saltedAgg(f, Seq("key"), factor,
          partial = Seq(collect_list(col("v")).as("part")),
          merge = Seq(flatten(collect_list(col("part"))).as("vals")))
          .agg(sum(size(col("vals")))).head()))
      println(f"$m%5dM $joinPlain%10.2f $joinAqe%9.2f $joinSalt%10.2f $aggPlain%10.2f $aggSalt%9.2f")
    }
    spark.stop()
  }
}
