package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Salting must never change results — only spread them. */
class SkewSpec extends GraftSparkSpec {
  import spark.implicits._

  // Zipfian facts: key 1 is hot (90% of rows)
  private lazy val facts = spark.range(0, 10000)
    .select(when(col("id") % 10 =!= 0, 1L).otherwise(col("id")).as("k"),
      col("id").as("v"))
  private lazy val dims = Seq((1L, "hot"), (10L, "a"), (20L, "b"))
    .toDF("k", "name")

  test("saltedJoin equals the plain join, spread over factor sub-keys") {
    val plain = facts.join(dims, "k")
      .select("k", "v", "name").as[(Long, Long, String)].collect().sorted
    val salted = Skew.saltedJoin(facts, dims, "k", factor = 8)
      .select("k", "v", "name").as[(Long, Long, String)].collect().sorted
    assert(salted.length == plain.length)
    assert(salted.toSeq == plain.toSeq)
    // the hot key really is spread: the OPERATOR'S OWN salt expression
    // (Skew.saltCol — shared by saltedJoin/saltedAgg) must give >1 salt to
    // hot-key facts, even when the rows are byte-identical. A regression
    // to content-hash salting fails here.
    val spread = facts.withColumn("_salt", Skew.saltCol(8))
      .filter(col("k") === 1).select("_salt").distinct().count()
    assert(spread > 1)
    val identical = spark.range(0, 1000).select(lit(1L).as("k"), lit(7L).as("v"))
    val identicalSpread = identical.withColumn("_salt", Skew.saltCol(8))
      .select("_salt").distinct().count()
    assert(identicalSpread == 8, s"identical rows not spread: $identicalSpread")
  }

  test("saltedAgg(collect_list) equals the direct aggregation") {
    val direct = facts.groupBy("k")
      .agg(sort_array(collect_list("v")).as("vs"), count(lit(1)).as("n"))
      .as[(Long, Seq[Long], Long)].collect().sortBy(_._1)
    val salted = Skew.saltedAgg(facts, Seq("k"), factor = 8,
        partial = Seq(collect_list("v").as("vs_p"), count(lit(1)).as("n_p")),
        merge = Seq(sort_array(flatten(collect_list("vs_p"))).as("vs"),
          sum("n_p").as("n")))
      .as[(Long, Seq[Long], Long)].collect().sortBy(_._1)
    assert(salted.toSeq == direct.toSeq)
  }
}
