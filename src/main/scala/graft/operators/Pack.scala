package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: documents are concatenated in a
  * deterministic order and split into fixed-capacity context windows
  * (tokens, not chars), documents straddling window boundaries — the
  * standard "packed sequences" preparation (concatenate-with-EOS, cut
  * every `capacity` tokens). The output maps each document to the token
  * span it occupies: which window its first token lands in, which its
  * last, and the offset within the first window.
  *
  * Scale design (100 TB): the running token offset is a window cumsum
  * PARTITIONED by `streamCol` (e.g. language — monolingual packing
  * streams, the realistic setup): each stream's cumsum shuffles once on
  * the stream key and sorts within partitions — no global single-partition
  * window. With one giant stream, swap in the two-phase prefix-sum
  * (per-partition partial sums broadcast as offsets); the per-stream shape
  * here never needs it.
  */
object Pack {

  /** Whitespace token count — the packing currency. Identical semantics to
    * `size(split(trim(text), "\s+"))` (the text-analysis tokenizer) via
    * the single-pass TokenCount kernel — no token-array materialization
    * just to count (KernelPropertySpec pins the equivalence).
    */
  def tokenCount(text: Column): Column =
    graft.functions.SketchFunctions.tokenCount(text)

  /** Per-document packed spans.
    *
    * @param docs      input with idCol / textCol / streamCol
    * @param capacity  window capacity in tokens
    * @return (streamCol, idCol, n_tokens, start_window, end_window,
    *          start_offset) — windows are 0-based per stream, offset is the
    *          token position within the first window
    */
  def packedSpans(docs: DataFrame, idCol: String, textCol: String,
                  streamCol: String, capacity: Int): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val w = Window.partitionBy(streamCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(streamCol), col(idCol),
        tokenCount(col(textCol)).as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("cum_end", sum(col("n_tokens")).over(w))
      .withColumn("start_tok", col("cum_end") - col("n_tokens"))
      .select(
        col(streamCol), col(idCol), col("n_tokens"),
        // exact Long integer division (`div`), same semantics as
        // packedSpansGlobal — double division rounds wrong past 2^52 tokens
        expr(s"start_tok div $capacity").as("start_window"),
        expr(s"(cum_end - 1) div $capacity").as("end_window"),
        pmod(col("start_tok"), lit(capacity.toLong)).as("start_offset"))
  }

  /** Packed spans over ONE GLOBAL stream — the two-phase prefix-sum that
    * replaces a global window (which would sort the entire corpus in a
    * single partition). Phase 1 range-partitions by id and collects each
    * partition's token total (P values — bounded by partition count, never
    * data); phase 2 re-walks each partition with its broadcast starting
    * offset. The ordered frame is materialized once (localCheckpoint) so
    * both phases see the identical partitioning.
    *
    * Same output contract as `packedSpans` minus the stream column.
    */
  def packedSpansGlobal(docs: DataFrame, idCol: String, textCol: String,
                        capacity: Int, partitions: Int = 0): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val p = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    // id keeps its natural type (string ids pack fine — ordering is the
    // column's own); only n_tokens needs a concrete encoder
    val base = docs
      .select(col(idCol).as("id"), tokenCount(col(textCol)).as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .repartitionByRange(p, col("id"))
      .sortWithinPartitions("id")
      .localCheckpoint()
    val partials = base.select(col("n_tokens")).as[Int]
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
    val cap = capacity.toLong
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(
        idCol, base.schema("id").dataType, base.schema("id").nullable),
      org.apache.spark.sql.types.StructField("n_tokens",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("start_window",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("end_window",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("start_offset",
        org.apache.spark.sql.types.LongType, nullable = false)))
    base.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var off = bc.value(pid)
      it.map { r =>
        val n = r.getInt(1)
        val start = off
        off += n
        org.apache.spark.sql.Row(r.get(0), n, start / cap, (off - 1) / cap,
          start % cap)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Per-stream packing summary: windows consumed and mean fill of the
    * last (partial) window — the packing-efficiency numbers a pipeline
    * reports.
    */
  def packingStats(spans: DataFrame, streamCol: String,
                   capacity: Int): DataFrame =
    spans.groupBy(streamCol)
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        (max("end_window") + 1).as("n_windows"),
        round(sum("n_tokens").cast("double") /
          ((max("end_window") + 1) * capacity), 4).as("fill_ratio"))
      .orderBy(streamCol)
}
