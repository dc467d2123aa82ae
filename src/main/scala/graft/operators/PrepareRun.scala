package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The full training-run preparation pipeline — what a user actually
  * runs before a pretraining job, composed ENTIRELY from the gated
  * operators: quality gate (Pack.tokenCount) → MinHash near-dup
  * survivors (Dedup) → benchmark decontamination (Contamination, bloom
  * prefilter) → deterministic seeded train/val split → source-balanced
  * interleave rank (the d50 epoch order) → context-window packing of
  * train (Pack.packedSpans) → manifest of per-stage counts.
  *
  * 100 TB shape: each stage is one of the already-measured operator
  * shapes (band-bucketed pairs, broadcast bloom, one source-keyed
  * window, one split filter); the composition adds NO new shuffles of
  * its own beyond the stages'. Invariants are spec-pinned in
  * Round11OpsSpec: min-token floor, zero surviving near-dup pairs,
  * zero contaminated survivors, disjoint-and-complete split, packed
  * spans within capacity.
  */
object PrepareRun {
  def run(spark: SparkSession, docs: DataFrame, bench: DataFrame,
          outDir: String, minTokens: Int = 25, threshold: Double = 0.5,
          capacity: Int = 512, valPct: Int = 5): Seq[(String, Long)] = {
    val q = docs.filter(Pack.tokenCount(col("text")) >= minTokens)
    // surv feeds BOTH the decontamination build and its manifest count;
    // clean feeds the split writes and its count — left lazy, each extra
    // consumer re-runs the survivor anti-join and the whole-corpus
    // shingle-explode bloom pass (the x61/x62 multi-consumer rule)
    val surv = Dedup.dedupSurvivors(q, "doc_id",
      Dedup.minHashLsh(q, "doc_id", "text", threshold = threshold))
      .localCheckpoint()
    val clean = Contamination.decontaminateBloom(
      surv, bench, "doc_id", "text", 8)
      .localCheckpoint()
    // deterministic split: seeded md5 bucket, val = first valPct of 100
    val bucketed = clean.withColumn("bucket",
      pmod(abs(hash(md5(concat(col("doc_id").cast("string"),
        lit(":split"))))), lit(100)))
    val valSet = bucketed.filter(col("bucket") < valPct).drop("bucket")
    val train = bucketed.filter(col("bucket") >= valPct).drop("bucket")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
    val ordered = train.withColumn("epoch_rank", row_number().over(w))
    ordered.write.mode("overwrite").parquet(s"$outDir/train_docs")
    valSet.write.mode("overwrite").parquet(s"$outDir/val_docs")
    val spans = Pack.packedSpans(
      spark.read.parquet(s"$outDir/train_docs"),
      "doc_id", "text", "lang", capacity = capacity)
    spans.write.mode("overwrite").parquet(s"$outDir/train_spans")
    val manifest = Seq(
      ("input", docs.count()),
      ("quality_pass", q.count()),
      ("dedup_survivors", surv.count()),
      ("decontaminated", clean.count()),
      ("train", spark.read.parquet(s"$outDir/train_docs").count()),
      ("val", spark.read.parquet(s"$outDir/val_docs").count()),
      ("train_spans", spark.read.parquet(s"$outDir/train_spans").count()))
    import spark.implicits._
    manifest.toDF("stage", "n")
      .write.mode("overwrite").parquet(s"$outDir/manifest")
    manifest
  }
}
