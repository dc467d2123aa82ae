import org.apache.spark.sql.functions._

/** Dev measurement: does Z-order layout actually buy two-dimensional scan
  * pruning? Writes the same (h, ub, payload) fact rows three ways —
  * unordered, linearly sorted by h, Z-ordered by (h, ub) — then times a
  * selective predicate on EACH dimension against all three layouts.
  * Parquet row-group min/max stats do the pruning; the layout only decides
  * whether those ranges are narrow. Expected: h-sort wins h-predicates but
  * does nothing for ub; Z-order prunes BOTH.
  *
  * `runMain ZorderScale [nRows]`
  */
object ZorderScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 10000000L
    val spark = graft.GraftCli.session()
    import spark.implicits._
    val base = "/tmp/graft_zorder_scale"

    // synthetic fact rows: h in [0,1024), ub in [0,1024), independent-ish
    val df = spark.range(n).select(
      col("id"),
      pmod(hash(col("id")), lit(1024)).cast("long").as("h"),
      pmod(hash(col("id"), lit(1)), lit(1024)).cast("long").as("ub"),
      md5(col("id").cast("string")).as("payload"))

    df.write.mode("overwrite").parquet(s"$base/plain")
    df.orderBy("h").write.mode("overwrite").parquet(s"$base/bysort")
    graft.operators.Layout.zorderBy(df, col("h"), col("ub"))
      .drop("zkey").write.mode("overwrite").parquet(s"$base/zorder")

    // the honest pruning metric is rows DECODED by the scan (row groups
    // whose min/max footer stats admit the pushed predicate) — wall time
    // at this size is JIT noise
    def time(label: String, path: String, pred: String): Unit = {
      val q = spark.read.parquet(path).filter(pred)
      val t0 = System.nanoTime()
      val c = q.collect().length
      val decoded = q.queryExecution.executedPlan.collectLeaves()
        .map(_.metrics.get("numOutputRows").map(_.value).getOrElse(0L)).sum
      println(f"[zscale] $label pred='$pred' -> $c rows, $decoded%9d decoded, " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (pred <- Seq("h = 7", "ub = 7", "h BETWEEN 100 AND 107",
        "ub BETWEEN 100 AND 107")) {
      for ((label, path) <- Seq(("plain ", s"$base/plain"),
          ("h-sort", s"$base/bysort"), ("zorder", s"$base/zorder")))
        time(label, path, pred)
      println()
    }
    spark.stop()
  }
}
