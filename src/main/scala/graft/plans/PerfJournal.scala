package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import scala.collection.concurrent.TrieMap

/** Perf-counter journal (reference: PerfCounterJournal.cs:10-73) rebuilt on
  * Spark's native observability: `df.observe(name, metrics...)` rides the
  * existing job (zero extra passes — unlike the reference's counter queue)
  * and a QueryExecutionListener collects the observed values per action.
  */
object PerfJournal {

  private val counters = TrieMap.empty[String, Long]

  /** Attach named row/byte counters to a frame; values land in the journal
    * when an action runs the frame.
    */
  def observed(df: DataFrame, name: String): DataFrame =
    df.observe(s"graft_$name", count(lit(1)).as("rows"))

  def install(spark: SparkSession): Unit =
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          if (name.startsWith("graft_")) {
            val key = name.stripPrefix("graft_")
            val rows = row.getAs[Long]("rows")
            counters.updateWith(key) { prev => Some(prev.getOrElse(0L) + rows) }
          }
        }
      override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
    })

  /** Snapshot, sorted by name (reference prints sorted sums). */
  def snapshot(): Seq[(String, Long)] = counters.toSeq.sortBy(_._1)

  def reset(): Unit = counters.clear()
}
