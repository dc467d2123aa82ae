package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability: a Spark implementation plus (when SQL-expressible)
  * a DuckDB oracle over the same parquet tables. Column names/aliases MUST
  * match between the two — the driver sorts columns by name before hashing.
  */
case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Load one driver-provided table (TESTDATA.md).
    *
    * `events.parquet`'s `ts` physical type has varied across testdata
    * generations: TIMESTAMP(NANOS) (which Spark 4 refuses by default, so we
    * read nanos-as-long and convert), TIMESTAMP(MICROS) with
    * isAdjustedToUTC=false (which Spark 4 infers as TIMESTAMP_NTZ), or a
    * plain UTC timestamp. Normalize all three to a microsecond TimestampType
    * column — identical ordering, hour/month truncation and window semantics
    * as DuckDB's native read of the same file (session timezone is UTC in
    * every entry point, so the NTZ→TZ cast is value-preserving).
    */
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events") {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types._
      df.schema("ts").dataType match {
        // legacy nanos-as-long: integer division (`/` would promote the
        // ~1.7e18 ns value to double (precision 2^53) and corrupt ~12% of
        // microsecond values by 1µs)
        case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _: TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
        case _ => df
      }
    } else df
  }
}
