package graft

import org.apache.spark.sql.functions._

/** Round-12 additions: PrepareRun's stage-marker resume protocol — a
  * process death between the `train_docs` and `train_spans` writes must
  * not recompute the dedup/decontaminate front on re-run, and a changed
  * parameter must invalidate the markers so stages DO recompute.
  */
class Round12OpsSpec extends GraftSparkSpec {
  import spark.implicits._

  private def rmTree(p: String): Unit = {
    val root = java.nio.file.Paths.get(p)
    if (java.nio.file.Files.exists(root)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
  }

  test("PrepareRun resumes after a death between train_docs and train_spans") {
    import graft.operators.PrepareRun
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val bench = docs.filter(col("doc_id") % 37 === 0)
      .select(col("doc_id"), col("text")).limit(5)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-prep-resume").toString
    val m1 = PrepareRun.run(spark, docs, bench, tmp,
      minTokens = 10, threshold = 0.5, capacity = 512, valPct = 10).toMap

    // simulate the kill: spans output, its marker, and the manifest are
    // gone (the death happened before any of them committed); the docs
    // stage marker and its parquet outputs survived
    rmTree(s"$tmp/train_spans")
    rmTree(s"$tmp/_stage_spans")
    rmTree(s"$tmp/manifest")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$tmp/_stage_docs")))

    // resume with a DIFFERENT (smaller) docs frame: if the front re-ran,
    // the manifest's input/survivor counts would reflect the new frame —
    // they must instead come from the committed stage marker
    val m2 = PrepareRun.run(spark, docs.filter(col("doc_id") % 2 === 0),
      bench, tmp, minTokens = 10, threshold = 0.5,
      capacity = 512, valPct = 10).toMap
    assert(m2("input") == m1("input"))
    assert(m2("dedup_survivors") == m1("dedup_survivors"))
    assert(m2("train") == m1("train"))
    // the interrupted stage was redone: spans exist and match run 1
    assert(m2("train_spans") == m1("train_spans"))
    assert(spark.read.parquet(s"$tmp/train_spans").count() ==
      m1("train_spans"))
  }

  test("PrepareRun recomputes every stage when parameters change") {
    import graft.operators.PrepareRun
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val bench = docs.filter(col("doc_id") % 37 === 0)
      .select(col("doc_id"), col("text")).limit(5)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-prep-params").toString
    val m1 = PrepareRun.run(spark, docs, bench, tmp,
      minTokens = 10, threshold = 0.5, capacity = 512, valPct = 10).toMap
    // same outDir, tighter quality floor: the stale markers carry a
    // different fingerprint, so the front recomputes under the new floor
    val m2 = PrepareRun.run(spark, docs, bench, tmp,
      minTokens = 40, threshold = 0.5, capacity = 512, valPct = 10).toMap
    assert(m2("input") == m1("input"))
    assert(m2("quality_pass") < m1("quality_pass"))
    // outputs were rewritten to match the new run, not left stale
    assert(spark.read.parquet(s"$tmp/train_docs").count() == m2("train"))
  }

  test("appendIvfIndex drift tripwire: drifted wave fires, in-dist stays quiet") {
    import graft.operators.Similarity
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-ivf-drift").toString
    Similarity.writeIvfIndex(e, s"$tmp/idx", nlist = 8)
    val cents = Similarity.seedCentroids(e, 8)
    val assigned = Similarity.assignLists(e, cents).localCheckpoint()

    // in-distribution wave: a uniform sample of the corpus — KL is
    // sampling noise, far below the 0.5-nat threshold
    val quiet = Similarity.appendIvfIndex(
      e.filter(col("vec_id") % 5 === 2), s"$tmp/idx")
    assert(quiet.isDefined && !quiet.get.retrain)
    assert(quiet.get.klMicro < 500000L)

    // drifted wave: vectors from ONE coarse cell only (ingest suddenly
    // concentrated) — KL is O(1) nats, tripwire fires
    val hot = assigned.orderBy("list_id", "vec_id")
      .limit(1).select("list_id").as[Long].head()
    val fired = Similarity.appendIvfIndex(
      e.join(assigned.filter(col("list_id") === hot)
        .select("vec_id"), "vec_id"), s"$tmp/idx")
    assert(fired.isDefined && fired.get.retrain)

    // pre-r12 index layout (no build_dist): append lands, report absent
    val rmAt = new org.apache.hadoop.fs.Path(s"$tmp/idx/build_dist")
    rmAt.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(rmAt, true)
    val legacy = Similarity.appendIvfIndex(
      e.filter(col("vec_id") % 11 === 0), s"$tmp/idx")
    assert(legacy.isEmpty)
  }

  test("mp4 walker: absolute keyframe ranges land inside mdat, corruption is loud") {
    import graft.operators.Multimodal
    val bytes = Multimodal.mp4Bytes(32, 48, Array(20, 21, 22, 23, 24),
      Array((2, 3000), (3, 3600)), Array(1, 4), seed = 9L)
    val m = Multimodal.parseMp4(bytes)
    val v = m.video
    assert(m.brand == "isom" && v.codec == "avc1")
    assert(v.width == 32 && v.height == 48 && v.timescale == 90000L)
    assert(v.sizes.toSeq == Seq(20L, 21L, 22L, 23L, 24L))
    assert(v.syncs.toSeq == Seq(1, 4))
    assert(v.sttsRuns.toSeq == Seq((2L, 3000L), (3L, 3600L)))
    // chunk offsets are ABSOLUTE: every keyframe's (offset, size) byte
    // range must sit inside the file — what a production frame decoder
    // would seek to
    val co = Multimodal.sampleChunkOffsets(v)
    v.syncs.foreach { s1 =>
      val lo = co(s1 - 1)._2
      assert(lo >= 0 && lo + v.sizes(s1 - 1) <= bytes.length)
    }
    // a walker, not a byte split: truncation and header corruption fail
    intercept[IllegalArgumentException] {
      Multimodal.parseMp4(bytes.take(bytes.length - 30))
    }
    val bad = bytes.clone()
    bad(4) = 'X'.toByte // ftyp fourcc corrupted -> unknown root box
    intercept[IllegalArgumentException] { Multimodal.parseMp4(bad) }
  }

  test("PrepareRun capacity-only change repacks spans without redoing the front") {
    import graft.operators.PrepareRun
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val bench = docs.filter(col("doc_id") % 37 === 0)
      .select(col("doc_id"), col("text")).limit(5)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-prep-cap").toString
    val m1 = PrepareRun.run(spark, docs, bench, tmp,
      minTokens = 10, threshold = 0.5, capacity = 512, valPct = 10).toMap
    def maxWindow() = spark.read.parquet(s"$tmp/train_spans")
      .agg(max(col("end_window"))).head().getLong(0)
    val w1 = maxWindow()
    // capacity feeds only the packing stage: resume with a DIFFERENT
    // docs frame proves the front was NOT recomputed (marker counts
    // survive), while the repack under the smaller capacity spreads the
    // same docs over MORE context windows (spans are one row per doc,
    // so the row count is capacity-invariant — the window ids move)
    val m2 = PrepareRun.run(spark, docs.filter(col("doc_id") % 2 === 0),
      bench, tmp, minTokens = 10, threshold = 0.5,
      capacity = 64, valPct = 10).toMap
    assert(m2("input") == m1("input"))
    assert(m2("dedup_survivors") == m1("dedup_survivors"))
    assert(m2("train") == m1("train"))
    assert(m2("train_spans") == m1("train_spans"))
    assert(maxWindow() > w1, "smaller capacity must yield more windows")
  }

  test("PrepareRun stale marker dies before the recompute can clobber under it") {
    import graft.operators.PrepareRun
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val bench = docs.filter(col("doc_id") % 37 === 0)
      .select(col("doc_id"), col("text")).limit(5)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-prep-stale").toString
    PrepareRun.run(spark, docs, bench, tmp,
      minTokens = 10, threshold = 0.5, capacity = 512, valPct = 10)
    // a params-B run that dies mid-recompute must not leave the params-A
    // marker certifying clobbered outputs: the stale marker is deleted
    // at read time, BEFORE any overwrite starts. Simulate the death by
    // checking the marker is gone the moment the mismatch is observed —
    // run with new params and verify the old marker file was replaced
    // (not still carrying the old fingerprint) only AFTER completion
    val mPath = java.nio.file.Paths.get(s"$tmp/_stage_docs")
    val before = new String(java.nio.file.Files.readAllBytes(mPath), "UTF-8")
    PrepareRun.run(spark, docs, bench, tmp,
      minTokens = 40, threshold = 0.5, capacity = 512, valPct = 10)
    val after = new String(java.nio.file.Files.readAllBytes(mPath), "UTF-8")
    assert(before.linesIterator.next() != after.linesIterator.next(),
      "marker must carry the new fingerprint after a param-change rerun")
  }

  test("assignmentDrift: empty wave never demands a retrain") {
    import graft.operators.Similarity
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.seedCentroids(e, 8)
    val assigned = Similarity.assignLists(e, cents).localCheckpoint()
    val buildDist = assigned.groupBy("list_id").agg(count(lit(1)).as("n"))
    val r = Similarity.assignmentDrift(
      assigned.filter(col("vec_id") < 0).select("list_id"), // empty
      buildDist, 8).head()
    assert(r.getLong(0) == 0L)          // n_batch
    assert(!r.getBoolean(2), "empty wave fired the retrain tripwire")
  }

  test("ktruss normalizes non-canonical input edges") {
    import graft.operators.Graph
    // K3 given with one edge reversed and a duplicate in both directions:
    // normalization must still see one triangle with support 1 per edge
    val messy = Seq((1L, 2L), (3L, 2L), (1L, 3L), (2L, 1L), (2L, 2L))
      .toDF("u", "v")
    val got = Graph.ktruss(messy, k = 3, rounds = 2)
      .orderBy("u", "v").as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }

  test("appendBinaryIndex: incremental build equals the one-shot index") {
    import graft.operators.Similarity
    val rnd = new scala.util.Random(12)
    val all = (1L to 90L).map(i =>
      (i, Seq.fill(32)(rnd.nextFloat() * 2 - 1), i.toInt % 3))
      .toDF("vec_id", "embedding", "label")
    val q = Seq(Tuple1(Seq.fill(32)(rnd.nextFloat() * 2 - 1)))
      .toDF("q_embedding")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-binappend").toString
    Similarity.writeBinaryIndex(all, s"$tmp/full")
    Similarity.writeBinaryIndex(all.filter(col("vec_id") <= 60), s"$tmp/inc")
    Similarity.appendBinaryIndex(all.filter(col("vec_id") > 60), s"$tmp/inc")
    def top(path: String) =
      Similarity.binaryIndexTopK(spark, path, q, 8, prefilter = 25)
        .select("vec_id", "sim", "hamming")
        .as[(Long, Double, Int)].collect().toSeq
    assert(top(s"$tmp/inc") === top(s"$tmp/full"))
  }

  test("PrepareRun full re-run into the same outDir is a cheap no-op") {
    import graft.operators.PrepareRun
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val bench = docs.filter(col("doc_id") % 37 === 0)
      .select(col("doc_id"), col("text")).limit(5)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-prep-noop").toString
    val m1 = PrepareRun.run(spark, docs, bench, tmp,
      minTokens = 10, threshold = 0.5, capacity = 512, valPct = 10)
    val m2 = PrepareRun.run(spark, docs, bench, tmp,
      minTokens = 10, threshold = 0.5, capacity = 512, valPct = 10)
    assert(m2 === m1)
  }
}
