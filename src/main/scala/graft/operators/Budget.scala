package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quality-ranked corpus selection under a global token budget — the
  * data-mixing step of LLM corpus prep: rank documents by a quality score
  * and take them in rank order until the token budget is exhausted (a doc
  * that would cross the budget is NOT taken; selection is a prefix of the
  * rank order, so it is deterministic and engine-independent).
  *
  * Scale design (100 TB): the running token total over the rank order is
  * the same two-phase prefix sum as `Pack.packedSpansGlobal` — range
  * partition on (score DESC, id), per-partition partial sums (P values,
  * bounded by partition count, never data) broadcast back as starting
  * offsets — never a single-partition global window. Partitions whose
  * starting offset already exceeds the budget short-circuit to empty
  * without walking their rows: at 100 TB with a 1% budget, ~99% of the
  * corpus is never cumsum'd.
  */
object Budget {

  /** @param docs    input frame
    * @param idCol   unique id (rank tie-break)
    * @param scoreCol quality score — higher is better
    * @param tokensCol per-doc token count
    * @param budget  global token budget (inclusive)
    * @return (idCol, score, n_tokens, cum_tokens) for selected docs,
    *         rank-ordered; cum_tokens is the running total INCLUDING the
    *         row itself, so `cum_tokens <= budget` for every output row
    */
  def selectByBudget(docs: DataFrame, idCol: String, scoreCol: String,
                     tokensCol: String, budget: Long,
                     partitions: Int = 0): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val spark = docs.sparkSession
    val p = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    // rank order = (score DESC, id ASC); materialized once so the partial
    // sums and the walk see the identical partitioning
    val base = docs
      .select(col(idCol).as("id"), col(scoreCol).cast("double").as("score"),
        col(tokensCol).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .repartitionByRange(p, col("score").desc, col("id"))
      .sortWithinPartitions(col("score").desc, col("id"))
      .localCheckpoint()
    import spark.implicits._
    val partials = base.select(col("n_tokens")).as[Long]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var s = 0L
        it.foreach(s += _)
        Iterator.single((pid, s))
      }.collect().toMap
    val nParts = base.rdd.getNumPartitions
    val offsets = new Array[Long](nParts)
    var acc = 0L
    for (i <- 0 until nParts) {
      offsets(i) = acc
      acc += partials.getOrElse(i, 0L)
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(
        idCol, base.schema("id").dataType, base.schema("id").nullable),
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DoubleType, nullable = true),
      org.apache.spark.sql.types.StructField("n_tokens",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cum_tokens",
        org.apache.spark.sql.types.LongType, nullable = false)))
    base.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var off = bc.value(pid)
      if (off > budget) Iterator.empty // whole partition is past the budget
      else it.map { r =>
        val n = r.getLong(2)
        off += n
        (r, off)
      }.takeWhile(_._2 <= budget).map { case (r, cum) =>
        org.apache.spark.sql.Row(r.get(0), r.get(1), r.getLong(2), cum)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
