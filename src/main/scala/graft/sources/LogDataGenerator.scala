package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spark-first port of the reference's KQL data generator `GenerateLogData`
  * (reference: templates/script.kql:1-23). Produces N rows of:
  *
  *   Id          long        1..N sequential
  *   Timestamp   timestamp   baseTime - (N - Id) seconds (strictly increasing)
  *   Level       string      Information 60% / Warning 30% / Error 10%
  *   Node        string      "Machine" + randint[0,25)
  *   ActivityId  string      drawn from a fixed pool of 25 uuids
  *   Text        string      random lowercase+space, length 30..150
  *
  * Differences vs the reference, by design:
  *   - deterministic: all randomness is seeded `rand(seed)`/`uuid` from a
  *     fixed namespace, so tests and oracles are reproducible
  *     (SURVEY.md §5.3 requires a seeded port);
  *   - the per-row random string is built with the higher-order
  *     `transform(sequence(...))` instead of KQL `mv-apply ... make_list`
  *     — same shape, no explode/re-aggregate shuffle, fully codegen'd.
  *
  * Scale note: `spark.range(n)` is an embarrassingly parallel source with
  * `numPartitions` splits — at 100 TB-equivalents generation scales linearly
  * with executors; there is no shuffle anywhere in this plan.
  */
object LogDataGenerator {

  /** 25-guid fixed pool (reference: script.kql:6-8 `toscalar(make_list(new_guid()))`).
    * Deterministic here: name-based v3-style uuids from a fixed namespace.
    */
  private def activityPool: Seq[String] =
    (0 until 25).map(i => java.util.UUID.nameUUIDFromBytes(s"graft-activity-$i".getBytes("UTF-8")).toString)

  private val letters = "abcdefghijklmnopqrstuvwxyz "   // 26 letters + space (script.kql:3-5: 27 entries)

  def generate(spark: SparkSession, n: Long, seed: Long = 42L,
               baseTime: String = "2024-01-01 00:00:00",
               numPartitions: Int = 32): DataFrame = {
    val pool = array(activityPool.map(lit): _*)
    val lettersArr = lit(letters)
    val df = spark.range(1, n + 1, 1, numPartitions).toDF("Id")
    df
      // Text: 30 + rand*120 chars of random letters (script.kql:10-16)
      .withColumn("_len", (lit(30) + floor(rand(seed) * 120)).cast("int"))
      .withColumn("Text",
        concat_ws("",
          transform(sequence(lit(1), col("_len")),
            i => substring(lettersArr,
              (pmod(hash(col("Id"), i, lit(seed)), lit(27)) + lit(1)).cast("int"), lit(1)))))
      // Level: 60/30/10 split (script.kql:17-18)
      .withColumn("_r", rand(seed + 1) * 100)
      .withColumn("Level",
        when(col("_r") < 60, "Information").when(col("_r") < 90, "Warning").otherwise("Error"))
      // Timestamp: base - (N - Id) seconds (script.kql:19), via epoch-second arithmetic
      .withColumn("Timestamp",
        (unix_timestamp(to_timestamp(lit(baseTime))) + col("Id") - lit(n)).cast("timestamp"))
      // Node: "Machine" + randint[0,25) (script.kql:20)
      .withColumn("Node", concat(lit("Machine"), floor(rand(seed + 2) * 25).cast("int")))
      // ActivityId: one of the 25-guid pool (script.kql:21)
      .withColumn("ActivityId", element_at(pool, (floor(rand(seed + 3) * 25) + 1).cast("int")))
      .select("Id", "Timestamp", "Level", "Node", "ActivityId", "Text")
  }

  /** The headerless-CSV serialization used as pipeline input
    * (reference landing table is 1-column `Text:string`,
    * code/IntegrationTests/TestCaseConfiguration.cs:59-64).
    */
  def toCsvLines(df: DataFrame): DataFrame =
    df.select(concat_ws(",",
      col("Id"), date_format(col("Timestamp"), "yyyy-MM-dd HH:mm:ss"),
      col("Level"), col("Node"), col("ActivityId"), col("Text")).as("value"))
}
