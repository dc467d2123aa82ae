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
  /** Raw marker read: (params string, counts) with NO validation — the
    * wave path reads the BASE run's marker to inherit its parameters
    * (a wave must run under the same knobs as the corpus it extends).
    */
  private def readMarkerRaw(spark: SparkSession, outDir: String,
                            stage: String): Option[(String, Map[String, Long])] = {
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
      kv.get("params").map(ps =>
        (ps, (kv - "params").map { case (k, v) => k -> v.toLong }))
    }
  }

  private def readMarker(spark: SparkSession, outDir: String,
                         stage: String, params: String): Option[Map[String, Long]] = {
    readMarkerRaw(spark, outDir, stage) match {
      case Some((ps, counts)) if ps == params => Some(counts)
      // a marker from a run with different parameters does not certify
      // this run's outputs — recompute rather than silently mix configs
      case Some(_) =>
        val p = new Path(s"$outDir/_stage_$stage")
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(p, false)
        None
      case None => None
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
      // the bloom + benchmark shingles are built once and PERSISTED:
      // wave-mode appends (`runWave`) decontaminate later waves against
      // these artifacts without re-shingling the benchmark
      val (bfBytes, benchSh) = Contamination.buildBloom(bench, "text", 8)
      val clean = Contamination.decontaminateWithBloom(
        surv, "doc_id", "text", 8, bfBytes, benchSh)
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
      // outputs are wave=0 partition dirs: a later `runWave(waveId)`
      // appends ONLY its own wave=N dir, so wave replay can delete and
      // recompute its exact files without touching committed waves
      ordered.withColumn("wave", lit(0))
        .write.mode("overwrite").partitionBy("wave")
        .parquet(s"$outDir/train_docs")
      valSet.withColumn("wave", lit(0))
        .write.mode("overwrite").partitionBy("wave")
        .parquet(s"$outDir/val_docs")
      // the standing dedup index over the KEPT docs (near-dup evidence
      // against a removed doc must not drop a wave doc) — what every
      // later wave dedups against (x21's incremental discipline)
      Dedup.sketchIndex(clean, "doc_id", "text")
        .withColumn("wave", lit(0))
        .write.mode("overwrite").partitionBy("wave")
        .parquet(s"$outDir/dedup_index")
      benchSh.write.mode("overwrite").parquet(s"$outDir/bench_shingles")
      import spark.implicits._
      Seq((bfBytes, 8)).toDF("bf", "n")
        .write.mode("overwrite").parquet(s"$outDir/bench_bloom")
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
      spans.withColumn("wave", lit(0))
        .write.mode("overwrite").partitionBy("wave")
        .parquet(s"$outDir/train_spans")
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

  /** Incremental (wave-mode) prepare-run: process ONE new corpus wave
    * against a completed base run WITHOUT touching any committed
    * output — at 100 TB a daily ingest wave must cost O(wave), not the
    * hours-long full re-run the base paid. The wave pipeline:
    *
    *   quality floor → wave-INTERNAL near-dup survivors (same
    *   minHashLsh/dedupSurvivors as the base) → cross-corpus dedup
    *   against the PERSISTED sketch index (`incrementalNearDupIndexed`,
    *   O(wave + touched buckets); committed corpus docs always win — a
    *   wave near-dup of an indexed doc is dropped, never the reverse) →
    *   decontamination against the PERSISTED bloom + benchmark shingles
    *   (zero benchmark re-shingling) → the SAME deterministic md5
    *   split (a doc's train/val assignment depends only on its doc_id,
    *   so the union split stays disjoint-and-complete by construction)
    *   → epoch ranks CONTINUE after each source's committed max →
    *   spans pack the wave's train docs into fresh windows starting
    *   after each lang's committed max window.
    *
    * Every output lands in `wave=<waveId>` partition directories of the
    * base tables, and the wave's sketch index appends under the same
    * wave dir — so wave N+1 dedups against base ∪ waves 1..N. Append
    * never reopens committed pack windows: the base's tail window per
    * lang may stay under-filled (bounded waste, < 1 window per lang per
    * wave) — the price of immutable prior outputs.
    *
    * Crash safety mirrors the base stage-marker protocol: the wave's
    * marker (`_stage_wave_<id>`) commits AFTER all wave outputs; replay
    * of an unmarked or param-mismatched wave DELETES that wave's
    * partition dirs before recomputing (they are exactly identifiable —
    * the reason the layout is partitioned by wave), so a crash at any
    * point leaves committed waves intact and the interrupted wave fully
    * redone. A marked wave with matching params is an idempotent no-op.
    *
    * Parameters are NOT arguments: they are read from the base run's
    * committed markers, so a wave can never silently run under
    * different knobs than the corpus it extends. The spec-pinned
    * equivalence: base(c1) + runWave(w2) satisfies the one-shot(c1∪w2)
    * invariants — zero surviving near-dup pairs across the union at the
    * threshold, zero contaminated survivors, disjoint-and-complete
    * split with identical per-doc assignment, per-source epoch ranks a
    * permutation of 1..n, one span row per train doc.
    *
    * Returns the wave's manifest counts (also appended to
    * `wave_manifest` as (wave, stage, n) rows).
    */
  def runWave(spark: SparkSession, wave: DataFrame, outDir: String,
              waveId: Int): Seq[(String, Long)] = {
    require(waveId >= 1, "waveId 0 is the base run; waves start at 1")
    val (docsParamStr, _) = readMarkerRaw(spark, outDir, "docs").getOrElse(
      throw new IllegalStateException(
        s"$outDir has no completed base docs stage — run PrepareRun.run first"))
    val (spansParamStr, _) = readMarkerRaw(spark, outDir, "spans").getOrElse(
      throw new IllegalStateException(
        s"$outDir has no completed base spans stage — run PrepareRun.run first"))
    // "docs:<minTokens>:<threshold>:<valPct>" / "spans:...:<capacity>"
    val dp = docsParamStr.split(":")
    val minTokens = dp(1).toInt
    val threshold = dp(2).toDouble
    val valPct = dp(3).toInt
    val capacity = spansParamStr.split(":")(4).toInt
    val waveParams =
      s"wave:$waveId:$minTokens:$threshold:$valPct:$capacity"
    val stage = s"wave_$waveId"

    readMarkerRaw(spark, outDir, stage) match {
      case Some((ps, counts)) if ps == waveParams =>
        // committed wave: idempotent replay returns the recorded counts
        return counts.toSeq.sortBy(_._1)
      case Some(_) =>
        val p = new Path(s"$outDir/_stage_$stage")
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(p, false)
      case None =>
    }
    // unmarked (crashed or param-changed) wave: delete exactly this
    // wave's partition dirs before recomputing
    Seq("train_docs", "val_docs", "train_spans", "dedup_index",
        "wave_manifest").foreach { t =>
      val p = new Path(s"$outDir/$t/wave=$waveId")
      val fsys = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fsys.exists(p)) fsys.delete(p, true)
    }
    // manual fs deletes bypass Spark's write-path cache invalidation:
    // drop any cached file listings under outDir so the reads below
    // (and any pre-replay reader in this session) re-list
    spark.catalog.refreshByPath(outDir)

    val q = wave.filter(Pack.tokenCount(col("text")) >= minTokens)
    val waveSurv = Dedup.dedupSurvivors(q, "doc_id",
      Dedup.minHashLsh(q, "doc_id", "text", threshold = threshold))
      .localCheckpoint()
    // committed corpus wins: any wave doc near-dup of an indexed doc drops
    val idx = Dedup.loadIndex(spark, s"$outDir/dedup_index")
    val dupHits = Dedup.incrementalNearDupIndexed(
        idx, waveSurv, "doc_id", "text", threshold = threshold)
      .select(col("batch_id").as("_dup_id")).distinct()
    val crossKept = waveSurv
      .join(dupHits, waveSurv("doc_id") === col("_dup_id"), "left_anti")
    val bloomRow = spark.read.parquet(s"$outDir/bench_bloom").head()
    val clean = Contamination.decontaminateWithBloom(
        crossKept, "doc_id", "text", bloomRow.getAs[Int]("n"),
        bloomRow.getAs[Array[Byte]]("bf"),
        spark.read.parquet(s"$outDir/bench_shingles"))
      .localCheckpoint()
    val bucketed = clean.withColumn("bucket",
      pmod(abs(hash(md5(concat(col("doc_id").cast("string"),
        lit(":split"))))), lit(100)))
    val valSet = bucketed.filter(col("bucket") < valPct).drop("bucket")
    val train = bucketed.filter(col("bucket") >= valPct).drop("bucket")
    // epoch ranks continue after each source's committed max (read-only
    // source-sized agg over the prior waves — partition-pruned)
    val priorMax = spark.read.parquet(s"$outDir/train_docs")
      .filter(col("wave") < waveId)
      .groupBy("source").agg(max("epoch_rank").as("_prior_max"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
    val ordered = train.withColumn("_r", row_number().over(w))
      .join(broadcast(priorMax), Seq("source"), "left")
      .withColumn("epoch_rank",
        (col("_r") + coalesce(col("_prior_max"), lit(0))).cast("int"))
      .drop("_r", "_prior_max")
      .localCheckpoint() // feeds the write AND the spans pack below
    ordered.withColumn("wave", lit(waveId))
      .write.mode("append").partitionBy("wave")
      .parquet(s"$outDir/train_docs")
    valSet.withColumn("wave", lit(waveId))
      .write.mode("append").partitionBy("wave")
      .parquet(s"$outDir/val_docs")
    // fresh pack windows after each lang's committed max window
    val priorWin = spark.read.parquet(s"$outDir/train_spans")
      .filter(col("wave") < waveId)
      .groupBy("lang").agg(max("end_window").as("_prior_win"))
    val spans = Pack.packedSpans(ordered, "doc_id", "text", "lang",
        capacity = capacity)
      .join(broadcast(priorWin), Seq("lang"), "left")
      .withColumn("start_window",
        col("start_window") + coalesce(col("_prior_win") + 1, lit(0L)))
      .withColumn("end_window",
        col("end_window") + coalesce(col("_prior_win") + 1, lit(0L)))
      .drop("_prior_win")
    spans.withColumn("wave", lit(waveId))
      .write.mode("append").partitionBy("wave")
      .parquet(s"$outDir/train_spans")
    // wave N+1 dedups against base ∪ waves 1..N
    Dedup.sketchIndex(clean, "doc_id", "text")
      .withColumn("wave", lit(waveId))
      .write.mode("append").partitionBy("wave")
      .parquet(s"$outDir/dedup_index")

    val counts = Seq(
      ("input", wave.count()),
      ("quality_pass", q.count()),
      ("wave_survivors", waveSurv.count()),
      ("cross_corpus_kept", crossKept.count()),
      ("decontaminated", clean.count()),
      ("train", spark.read.parquet(s"$outDir/train_docs")
        .filter(col("wave") === waveId).count()),
      ("val", spark.read.parquet(s"$outDir/val_docs")
        .filter(col("wave") === waveId).count()),
      ("train_spans", spark.read.parquet(s"$outDir/train_spans")
        .filter(col("wave") === waveId).count()))
    import spark.implicits._
    counts.map { case (st, c) => (waveId, st, c) }
      .toDF("wave", "stage", "n")
      .write.mode("append").partitionBy("wave")
      .parquet(s"$outDir/wave_manifest")
    writeMarker(spark, outDir, stage, waveParams, counts)
    counts
  }
}
