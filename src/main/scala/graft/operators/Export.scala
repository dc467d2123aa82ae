package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** B9 — bulk CSV export (reference: `.export async [compressed] to csv(...)
  * with (sizeLimit=..., namePrefix=..., distribution="single",
  * includeHeaders=...)`, TestBase.cs:389-410).
  *
  *   distribution="single"  → coalesce(1): one writer, one file
  *   includeHeaders all/none → option("header", ...)
  *   compressed             → option("compression", "gzip")
  *   sizeLimit              → approximated with maxRecordsPerFile derived
  *                            from an avg-row-size sample (the reference
  *                            limit is also approximate: it seals after
  *                            crossing the limit)
  *   async + operation tracking → Spark actions are synchronous here;
  *                            callers wanting async wrap in a Future (the
  *                            reference polls `.show operations`)
  */
object Export {

  def toCsv(df: DataFrame, destDir: String,
            includeHeaders: Boolean = true,
            compressed: Boolean = false,
            sizeLimitBytes: Option[Long] = None,
            single: Boolean = true): Unit = {
    val base = if (single) df.coalesce(1) else df
    var w = base.write.mode("overwrite").option("header", includeHeaders)
    if (compressed) w = w.option("compression", "gzip")
    sizeLimitBytes.foreach { limit =>
      // sample-derived rows-per-file bound (pre-compression, like the ref)
      val stats = df.limit(1000).select(
        count(lit(1)).as("n"),
        sum(length(concat_ws(",", df.columns.toIndexedSeq.map(col): _*))).as("bytes"))
        .collect()(0)
      val n = stats.getLong(0)
      val avgRow = if (n == 0) 100L else stats.getLong(1) / n + 1
      w = w.option("maxRecordsPerFile", math.max(1L, limit / avgRow))
    }
    w.csv(destDir)
  }
}
