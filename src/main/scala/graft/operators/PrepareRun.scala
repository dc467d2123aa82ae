package graft.operators

import org.apache.hadoop.fs.Path
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
  *
  * Crash safety / resume: the pipeline writes four outputs in sequence,
  * and at 100 TB the dedup/decontaminate front is hours of work — a
  * process death between `train_docs` and `train_spans` must not force
  * a recompute of everything before it. Each stage therefore commits a
  * MARKER file (`_stage_docs`, `_stage_spans`) via temp-write + rename
  * AFTER its parquet outputs land, carrying the stage's manifest counts
  * and a PER-STAGE parameter fingerprint (only the parameters the stage
  * consumes — a capacity-only change redoes the packing stage, never
  * the dedup/decontaminate front). A re-run into the same `outDir`
  * skips any stage whose marker exists AND fingerprint matches; a
  * mismatched (stale) marker is deleted BEFORE the recompute starts
  * overwriting the outputs it certified, so a crash mid-recompute can
  * never leave an old marker validating clobbered parquet. A crash
  * mid-write leaves no marker, so the interrupted stage recomputes and
  * its `overwrite` writes replace any partial output. The manifest is
  * derived from markers + output counts and is rewritten last,
  * idempotently. Fresh runs use a fresh `outDir` (the
  * checkpoint-directory contract).
  */
object PrepareRun {

  /** PER-STAGE parameter strings: a stage's marker is invalidated only
    * by parameters that stage actually consumes — changing `capacity`
    * (a packing knob) must redo train_spans but NOT the hours-long
    * dedup/decontaminate front that produced byte-identical train_docs.
    * The RAW string is stored in the marker and compared verbatim — a
    * hash would add a (tiny) collision surface for no benefit, and the
    * raw string doubles as human-readable provenance in the marker file.
    * Note the marker certifies PARAMETERS, not input-data identity:
    * re-running into the same outDir with a different `docs` frame but
    * identical params serves the committed outputs — the fresh-outDir
    * contract (scaladoc above) is what makes that sound.
    */
  private def docsParams(minTokens: Int, threshold: Double, valPct: Int): String =
    s"docs:$minTokens:$threshold:$valPct"

  private def spansParams(minTokens: Int, threshold: Double, valPct: Int,
                          capacity: Int): String =
    s"spans:$minTokens:$threshold:$valPct:$capacity"

  /** Reads a stage marker; on a parameter mismatch the stale marker is
    * DELETED before returning None — the caller is about to overwrite
    * the outputs it certifies, and a crash mid-recompute must not leave
    * an old marker validating clobbered parquet (a later run with the
    * old params would skip the stage and serve the corruption as
    * committed).
    */
  private def readMarker(spark: SparkSession, outDir: String,
                         stage: String, params: String): Option[Map[String, Long]] = {
    val p = new Path(s"$outDir/_stage_$stage")
    val fsys = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fsys.exists(p)) None
    else {
      val in = fsys.open(p)
      val txt =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val kv = txt.split("\n").iterator.map(_.trim).filter(_.nonEmpty)
        .map { l => val Array(k, v) = l.split("=", 2); k -> v }
        .toMap
      // a marker from a run with different parameters does not certify
      // this run's outputs — recompute rather than silently mix configs
      if (kv.get("params").contains(params))
        Some((kv - "params").map { case (k, v) => k -> v.toLong })
      else { fsys.delete(p, false); None }
    }
  }

  private def writeMarker(spark: SparkSession, outDir: String, stage: String,
                          params: String, counts: Seq[(String, Long)]): Unit = {
    val p = new Path(s"$outDir/_stage_$stage")
    val tmp = new Path(s"$outDir/._stage_$stage.tmp")
    val fsys = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fsys.create(tmp, true)
    try out.write((s"params=$params" +:
        counts.map { case (k, v) => s"$k=$v" })
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
    require(fsys.rename(tmp, p), s"marker commit failed for stage $stage")
  }

  def run(spark: SparkSession, docs: DataFrame, bench: DataFrame,
          outDir: String, minTokens: Int = 25, threshold: Double = 0.5,
          capacity: Int = 512, valPct: Int = 5): Seq[(String, Long)] = {
    val fpDocs = docsParams(minTokens, threshold, valPct)
    val fpSpans = spansParams(minTokens, threshold, valPct, capacity)

    // stage "docs": quality → dedup → decontaminate → split → epoch rank;
    // commits train_docs + val_docs and the front's manifest counts (the
    // expensive half of the pipeline — the half resume must never redo)
    val frontCounts = readMarker(spark, outDir, "docs", fpDocs).getOrElse {
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
      val counts = Seq(
        ("input", docs.count()),
        ("quality_pass", q.count()),
        ("dedup_survivors", surv.count()),
        ("decontaminated", clean.count()))
      writeMarker(spark, outDir, "docs", fpDocs, counts)
      counts.toMap
    }

    // stage "spans": pack the committed train_docs (reads the stage-1
    // output, so resume never touches the dedup/decontaminate front).
    // Its fingerprint includes `capacity`, which the docs stage ignores:
    // a capacity-only change redoes ONLY this stage
    if (readMarker(spark, outDir, "spans", fpSpans).isEmpty) {
      val spans = Pack.packedSpans(
        spark.read.parquet(s"$outDir/train_docs"),
        "doc_id", "text", "lang", capacity = capacity)
      spans.write.mode("overwrite").parquet(s"$outDir/train_spans")
      writeMarker(spark, outDir, "spans", fpSpans, Seq.empty)
    }

    // manifest: derived from the docs-stage marker + committed outputs;
    // rewritten last and idempotently (same inputs → same rows)
    val manifest = Seq(
      ("input", frontCounts("input")),
      ("quality_pass", frontCounts("quality_pass")),
      ("dedup_survivors", frontCounts("dedup_survivors")),
      ("decontaminated", frontCounts("decontaminated")),
      ("train", spark.read.parquet(s"$outDir/train_docs").count()),
      ("val", spark.read.parquet(s"$outDir/val_docs").count()),
      ("train_spans", spark.read.parquet(s"$outDir/train_spans").count()))
    import spark.implicits._
    manifest.toDF("stage", "n")
      .write.mode("overwrite").parquet(s"$outDir/manifest")
    manifest
  }
}
