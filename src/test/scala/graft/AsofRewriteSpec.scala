package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The AsofRewrite optimizer rule: the composed union+window as-of idiom
  * plans through AsofJoinExec, produces identical results to the window
  * execution (nulls included — nullsAsValues mode), and non-matching
  * window shapes are left untouched.
  */
class AsofRewriteSpec extends GraftSparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def withRewriteOff[A](f: => A): A = {
    spark.conf.set("spark.graft.asofRewrite.enabled", "false")
    try f finally spark.conf.set("spark.graft.asofRewrite.enabled", "true")
  }

  // inline Seq fixtures fold into LocalRelation (literal columns become
  // data — nothing left for the matcher to inspect, and nothing a real
  // table-backed query would produce). Round-trip through parquet so the
  // plans have the production Project-over-Relation shape.
  private def viaParquet(df: DataFrame): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("asof-rw").toString
    df.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  /** q26's composed shape over arbitrary ref/event frames. */
  private def composed(ref: DataFrame, evt: DataFrame): DataFrame = {
    val oU = ref.select(col("key"), col("at"), col("price"),
      lit(0).as("is_evt"), lit(null).cast("long").as("event_id"))
    val eU = evt.select(col("key"), col("at"),
      lit(null).cast("double").as("price"), lit(1).as("is_evt"),
      col("event_id"))
    val w = Window.partitionBy("key")
      .orderBy(col("at"), col("is_evt"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    oU.unionByName(eU)
      .withColumn("asof_price", last(col("price"), ignoreNulls = true).over(w))
      .filter(col("is_evt") === 1)
  }

  test("the composed idiom plans through AsofJoinExec; results identical") {
    val ref = viaParquet(Seq((1L, ts(5), 10.0), (1L, ts(15), 20.0), (2L, ts(8), 5.0))
      .toDF("key", "at", "price"))
    val evt = viaParquet(Seq((1L, ts(10), 1L), (1L, ts(20), 2L), (2L, ts(6), 3L),
      (3L, ts(9), 4L)).toDF("key", "at", "event_id"))
    val df = composed(ref, evt)
      .select("event_id", "asof_price")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"rewrite did not fire:\n$plan")
    assert(!plan.contains("Window"), s"window form should be gone:\n$plan")
    val got = df.as[(Long, Option[Double])].collect().toMap
    val want = withRewriteOff {
      val df2 = composed(ref, evt).select("event_id", "asof_price")
      val p2 = df2.queryExecution.executedPlan.toString
      assert(!p2.contains("AsofJoin"), s"toggle must disable the rewrite:\n$p2")
      df2.as[(Long, Option[Double])].collect().toMap
    }
    assert(got == want)
    assert(got == Map(1L -> Some(10.0), 2L -> Some(20.0), 3L -> None, 4L -> None))
  }

  test("rewrite preserves the window form's null semantics exactly") {
    // null keys group together; null times sort first (-infinity): the
    // rewritten plan must reproduce the window execution bit for bit
    val ref = viaParquet(Seq(
      (Some(1L), Some(ts(5)), 10.0),
      (None, Some(ts(3)), 77.0),  // null-key ref: matches null-key events
      (Some(2L), None, 88.0)      // null-at ref: -inf, visible to ALL key-2 events
    ).toDF("key", "at", "price"))
    val evt = viaParquet(Seq(
      (Some(1L), Some(ts(10)), 1L),
      (None, Some(ts(4)), 2L),    // null-key event -> the null-key ref row
      (Some(2L), None, 3L),       // null-at event -> null-at ref (peer prefix)
      (Some(2L), Some(ts(1)), 4L) // before any real-time ref, after the -inf one
    ).toDF("key", "at", "event_id"))
    val df = composed(ref, evt).select("event_id", "asof_price")
    assert(df.queryExecution.executedPlan.toString.contains("AsofJoin"))
    val got = df.as[(Long, Option[Double])].collect().toMap
    val want = withRewriteOff {
      composed(ref, evt).select("event_id", "asof_price")
        .as[(Long, Option[Double])].collect().toMap
    }
    assert(got == want, s"null semantics diverged: got $got want $want")
    assert(got == Map(1L -> Some(10.0), 2L -> Some(77.0),
      3L -> Some(88.0), 4L -> Some(88.0)))
  }

  test("non-matching shapes are left untouched") {
    val ref = viaParquet(Seq((1L, ts(5), 10.0)).toDF("key", "at", "price"))
    val evt = viaParquet(Seq((1L, ts(10), 1L)).toDF("key", "at", "event_id"))
    // (a) a sliding frame is NOT the as-of prefix
    val oU = ref.select(col("key"), col("at"), col("price"),
      lit(0).as("is_evt"), lit(null).cast("long").as("event_id"))
    val eU = evt.select(col("key"), col("at"),
      lit(null).cast("double").as("price"), lit(1).as("is_evt"), col("event_id"))
    val sliding = Window.partitionBy("key")
      .orderBy(col("at"), col("is_evt"), col("event_id"))
      .rowsBetween(-3, Window.currentRow)
    val a = oU.unionByName(eU)
      .withColumn("p", last(col("price"), ignoreNulls = true).over(sliding))
      .filter(col("is_evt") === 1)
    assert(!a.queryExecution.executedPlan.toString.contains("AsofJoin"))
    // (b) descending time ordering is NOT the as-of prefix
    val desc = Window.partitionBy("key")
      .orderBy(col("at").desc, col("is_evt"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val b = oU.unionByName(eU)
      .withColumn("p", last(col("price"), ignoreNulls = true).over(desc))
      .filter(col("is_evt") === 1)
    assert(!b.queryExecution.executedPlan.toString.contains("AsofJoin"))
    // (c) a filter on the other side (is_evt = 0) is not the idiom
    val w = Window.partitionBy("key")
      .orderBy(col("at"), col("is_evt"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = oU.unionByName(eU)
      .withColumn("p", last(col("price"), ignoreNulls = true).over(w))
      .filter(col("is_evt") === 0)
    assert(!c.queryExecution.executedPlan.toString.contains("AsofJoin"))
  }

  test("q26's full query rewrites and keeps its oracle-checked result") {
    val q26 = graft.queries.RelationalQueries.all("q26_asof_join")
    val df = q26.fn(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"q26 must now run natively:\n$plan")
    val native = df.collect()
    val windowed = withRewriteOff(q26.fn(spark, sfDir).collect())
    assert(native.sameElements(windowed))
  }
}
