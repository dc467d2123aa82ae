package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global rank/ntile WITHOUT a single-partition sort — the scale-safe
  * form of `ntile(n) OVER (ORDER BY ...)` (the round-1 scale-killer):
  * range-partition on the sort key, rank locally per partition, then add
  * each partition's cumulative predecessor count. The driver holds P
  * counts (bounded by partition count, never by data); the bucket is a
  * narrow arithmetic map over (global_rank, N) reproducing SQL ntile's
  * equal-fill semantics exactly (first N%n buckets take ceil(N/n) rows).
  */
object Ranking {

  /** Adds `bucketCol` (1-based ntile bucket, long) to `df`.
    *
    * @param sortCols rank order; MUST be total (tie-break on a unique id)
    *                 for engine-independent bucket assignment
    */
  def globalNtile(df: DataFrame, sortCols: Seq[Column], n: Int,
                  bucketCol: String = "bucket",
                  partitions: Int = 0): DataFrame = {
    require(n >= 1, "ntile bucket count must be >= 1")
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val ranged = df
      .repartitionByRange(p, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    val localW = Window.partitionBy("__pid").orderBy(sortCols: _*)
    // localCheckpoint: the count job and the final map must see the SAME
    // pid assignment — a re-executed range exchange resamples boundaries
    val ranked = ranged.withColumn("__rn", row_number().over(localW))
      .localCheckpoint()
    val counts = ranked.groupBy("__pid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    val offsets = (0 until p).scanLeft(0L)((acc, i) => acc + counts.getOrElse(i, 0L))
    val offsetMap = typedLit((0 until p).map(i => i -> offsets(i)).toMap)
    val qsz = total / n; val rem = total % n; val big = qsz + 1
    val rank = col("__rn") + element_at(offsetMap, col("__pid"))
    val bucket =
      when(rank <= lit(rem * big), ceil(rank / lit(big.toDouble)))
        .otherwise(lit(rem) + ceil((rank - lit(rem * big)) /
          lit(math.max(qsz, 1).toDouble)))
        .cast("long")
    ranked.withColumn(bucketCol, bucket).drop("__pid", "__rn")
  }
}
