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
    * The driver's `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS),
    * which Spark 4 refuses by default (PARQUET_TYPE_ILLEGAL). We read nanos
    * as long (`spark.sql.legacy.parquet.nanosAsLong`) and convert to a
    * microsecond TimestampType column — same ordering, hour/month truncation
    * and window semantics as DuckDB's native ns timestamps.
    */
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events") {
      import org.apache.spark.sql.functions._
      // integer division: `/` would promote the ~1.7e18 ns value to double
      // (precision 2^53) and corrupt ~12% of microsecond values by 1µs
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else df
  }
}
