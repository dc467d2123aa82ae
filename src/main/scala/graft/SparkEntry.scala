package graft

import graft.queries.{ExtensionQueries, QueryDef, RelationalQueries, TextQueries, VectorQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY.md §2): relational corpus
  * (B1–B10 / §2C), text training-data ops, vector ops. Each entry with a
  * DuckDB-expressible semantic also appears in `oracleSql` with IDENTICAL
  * column aliases (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  lazy val defs: Map[String, QueryDef] =
    RelationalQueries.all ++ TextQueries.all ++ VectorQueries.all ++
      ExtensionQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q1-shaped aggregation — exercises scan, projection pushdown,
    * partial aggregation, and the single-exchange group-by plan.
    */
  def entry(spark: SparkSession): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    defs("q1_agg").fn(spark, "/root/testdata/sf0.001")
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map { case (k, d) => k -> d.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.collect { case (k, QueryDef(_, Some(sql))) => k -> sql }
}
