package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measurement behind SCALE.md's as-of row: native merge (AsofJoinExec)
  * vs the composed union+window form, as the RIGHT-side payload widens —
  * the window form's sort buffer carries every payload column through
  * every event row; the native merge holds one candidate row.
  * Usage: AsofScale [sfDir] [payloadCols...]
  */
object AsofScale {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val widths = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(1, 8, 32)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val e = graft.queries.QueryDef.t(spark, dir, "events")
      .select(col("user_id").as("key"), col("ts").as("at"), col("event_id"))
    def orders(width: Int): (DataFrame, Seq[String]) = {
      val base = spark.read.parquet(s"$dir/orders.parquet")
        .groupBy(col("o_custkey").as("key"), col("o_orderdate").as("at"))
        .agg(max("o_totalprice").as("p0"))
      val cols = (0 until width).map(i => s"p$i")
      (cols.drop(1).foldLeft(base)((df, c) => df.withColumn(c, col("p0") + lit(1.0))), cols)
    }
    def time(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val n = f; (n, (System.nanoTime() - t0) / 1e9)
    }
    println(f"${"payload"}%8s ${"native_s"}%9s ${"window_s"}%9s")
    widths.foreach { wdt =>
      val (o, cols) = orders(wdt)
      val native = () => graft.plans.AsofJoin
        .joinAsof(e, o, "key", "at", cols)
        .agg(count(col(cols.last))).head().getLong(0)
      val composed = () => {
        val oU = o.withColumn("is_evt", lit(0))
          .withColumn("event_id", lit(null).cast("long"))
        val eU = cols.foldLeft(e.withColumn("is_evt", lit(1)))(
          (df, c) => df.withColumn(c, lit(null).cast("double")))
        val w = Window.partitionBy("key")
          .orderBy(col("at"), col("is_evt"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        oU.unionByName(eU)
          .withColumn("m", last(col(cols.last), ignoreNulls = true).over(w))
          .filter(col("is_evt") === 1)
          .agg(count(col("m"))).head().getLong(0)
      }
      native(); composed() // warm
      val (n1, tN) = time(native())
      val (n2, tW) = time(composed())
      require(n1 == n2, s"result mismatch: $n1 vs $n2")
      println(f"$wdt%8d $tN%9.2f $tW%9.2f")
    }
    spark.stop()
  }
}
