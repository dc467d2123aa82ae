package graft

import org.apache.spark.sql.functions._

/** Round-11 additions: crash-kill proof for the exactly-once corpus
  * append (the spool-recovery discipline of 69bba49 applied to
  * `appendUniqueBatch`), and concurrency isolation for multi-tenant
  * corpus prep.
  */
class Round11OpsSpec extends GraftSparkSpec {
  import spark.implicits._

  test("appendUnique converges after a mid-append crash (partial bucket commit)") {
    import graft.streaming.StreamingAnalytics
    val tmp = java.nio.file.Files.createTempDirectory("graft-r11-crash").toString
    // a standing corpus so the replay exercises the probe path, not the
    // empty-dir fast path
    assert(StreamingAnalytics.appendUniqueBatch(
      Seq((0L, "seed text")).toDF("doc_id", "text"),
      "text", "doc_id", s"$tmp/corpus", nBuckets = 8) == 1)

    val batch = Seq((1L, "t one"), (2L, "t two"), (3L, "t three"),
      (4L, "t four"), (5L, "t five")).toDF("doc_id", "text")

    // Simulate the kill: Spark's committer makes PART-FILE commits atomic,
    // so the state a death mid-append leaves behind is bucket-granular —
    // some partition directories got their files, others did not. Hand-
    // commit exactly the sink's own rows (same hash, same bucket layout)
    // for the LOWEST touched bucket, as if the JVM died between task
    // commits.
    val hashed = batch
      .withColumn("content_hash", md5(coalesce(col("text"), lit(""))))
      .withColumn("bucket", pmod(hash(col("content_hash")), lit(8)))
    val buckets = hashed.select("bucket").distinct().as[Int].collect().sorted
    assert(buckets.length >= 2, "fixture must span multiple buckets")
    val partial = hashed.filter(col("bucket") === buckets.head)
    val nPartial = partial.count()
    assert(nPartial >= 1 && nPartial < 5)
    partial.write.mode("append").partitionBy("bucket").parquet(s"$tmp/corpus")

    // Replay the WHOLE batch (what a restarted stream does): only the rows
    // the crash lost may append — the half that landed must be recognized.
    val appended = StreamingAnalytics.appendUniqueBatch(
      batch, "text", "doc_id", s"$tmp/corpus", nBuckets = 8)
    assert(appended == 5 - nPartial)

    val corpus = spark.read.parquet(s"$tmp/corpus")
    assert(corpus.count() == 6) // seed + 5, nothing double-appended
    assert(corpus.select("content_hash").distinct().count() == 6)
    // convergence: a further replay is a no-op
    assert(StreamingAnalytics.appendUniqueBatch(
      batch, "text", "doc_id", s"$tmp/corpus", nBuckets = 8) == 0)
  }

  test("--pool flag parses off the front and only there") {
    assert(GraftCli.parsePoolFlag(List("--pool=teamA", "generate", "/x", "10"))
      == (Some("teamA"), List("generate", "/x", "10")))
    assert(GraftCli.parsePoolFlag(List("generate", "/x"))
      == (None, List("generate", "/x")))
    // a bare '--pool=' (empty name) is not a pool
    assert(GraftCli.parsePoolFlag(List("--pool=", "validate", "/y"))
      == (None, List("--pool=", "validate", "/y")))
  }

  test("concurrent corpus-prep in separate scheduler pools: no output interleave") {
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    import graft.operators.{Dedup, Pack}
    val tmp = java.nio.file.Files.createTempDirectory("graft-r11-pool").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // two disjoint tenant corpora from one table
    val ta = docs.filter(col("doc_id") % 2 === 0)
    val tb = docs.filter(col("doc_id") % 2 === 1)

    def prep(in: org.apache.spark.sql.DataFrame, out: String,
             pool: String): Unit = {
      // thread-local pool tag — exactly what `graft --pool=<tenant>` sets;
      // under a FAIR session these jobs schedule in their own pool (in the
      // FIFO test session the property is inert, isolation must hold anyway)
      spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)
      try {
        val q = in.filter(Pack.tokenCount(col("text")) >= 5)
        val surv = Dedup.dedupSurvivors(q, "doc_id",
          Dedup.minHashLsh(q, "doc_id", "text", threshold = 0.5))
        Pack.packedSpans(surv, "doc_id", "text", "lang", capacity = 256)
          .write.mode("overwrite").parquet(out)
      } finally spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
    }

    // serial ground truth
    prep(ta, s"$tmp/serial_a", "poolSerial")
    prep(tb, s"$tmp/serial_b", "poolSerial")
    // concurrent tenants
    val ex = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(ex)
    Await.result(Future.sequence(Seq(
      Future(prep(ta, s"$tmp/conc_a", "tenantA")),
      Future(prep(tb, s"$tmp/conc_b", "tenantB")))), Duration.Inf)
    ex.shutdown()

    def spanSet(p: String) = spark.read.parquet(p)
      .select("doc_id").as[Long].collect().toSet
    // each tenant's concurrent output holds exactly its serial doc set —
    // no rows lost to, or gained from, the other tenant's run
    val (sa, sb) = (spanSet(s"$tmp/serial_a"), spanSet(s"$tmp/serial_b"))
    assert(spanSet(s"$tmp/conc_a") == sa)
    assert(spanSet(s"$tmp/conc_b") == sb)
    assert((sa & sb).isEmpty)
    assert(sa.nonEmpty && sb.nonEmpty)
  }

  test("appendUnique null-text rows converge on replay (hash via coalesce)") {
    import graft.streaming.StreamingAnalytics
    val tmp = java.nio.file.Files.createTempDirectory("graft-r11-null").toString
    val batch = Seq((1L, "real text"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    assert(StreamingAnalytics.appendUniqueBatch(
      batch, "text", "doc_id", s"$tmp/corpus", nBuckets = 4) == 2)
    // the r10 bug: null text -> null md5 -> left_anti never matches ->
    // re-appended forever; coalesce('') keys it so replays converge
    assert(StreamingAnalytics.appendUniqueBatch(
      batch, "text", "doc_id", s"$tmp/corpus", nBuckets = 4) == 0)
    assert(spark.read.parquet(s"$tmp/corpus").count() == 2)
  }

  test("signBits packs sign bits; popcount(xor) counts sign disagreements") {
    import graft.operators.Similarity
    val a = Array(1.0f, -2.0f, 0.0f, 3.0f) // bits 0 and 3 → 0b1001 = 9
    val b = Array(-1.0f, 2.0f, 0.5f, 4.0f) // bits 1, 2, 3   → 0b1110 = 14
    val df = Seq((1L, a.toSeq), (2L, b.toSeq)).toDF("vec_id", "embedding")
    val bits = df.select(col("vec_id"),
        Similarity.signBits("embedding").as("bits"))
      .as[(Long, Long)].collect().toMap
    assert(bits === Map(1L -> 9L, 2L -> 14L))
    // xor = 0b0111: dims 0, 1, 2 disagree in sign (0.0 counts negative)
    assert(java.lang.Long.bitCount(bits(1L) ^ bits(2L)) == 3)
  }

  test("binaryTopK with corpus-wide prefilter equals exact brute force") {
    import graft.operators.Similarity
    // when nothing is pruned, the Hamming stage only reorders candidates
    // and the exact-cosine rerank must reproduce brute force verbatim
    val rnd = new scala.util.Random(7)
    val corpus = (1L to 50L).map(i =>
      (i, Seq.fill(16)(rnd.nextFloat() * 2 - 1), i.toInt % 4))
      .toDF("vec_id", "embedding", "label")
    val q = Seq(Tuple1(Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("q_embedding")
    val brute = Similarity.bruteForceTopK(corpus, q, 5)
      .select("vec_id", "sim").as[(Long, Double)].collect().toSeq
    val bin = Similarity.binaryTopK(corpus, q, 5, prefilter = 50)
      .select("vec_id", "sim").as[(Long, Double)].collect().toSeq
    assert(bin === brute)
    // and a tight prefilter returns exactly k rows, Hamming-bounded
    val tight = Similarity.binaryTopK(corpus, q, 5, prefilter = 8)
    assert(tight.count() == 5)
    assert(tight.select(max(col("hamming"))).as[Int].head() <= 16)
  }

  test("prepare-run pipeline holds its contract invariants end to end") {
    import graft.operators.{Contamination, Dedup, Pack, PrepareRun}
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // a bench set guaranteed to contaminate: 5 real docs verbatim
    val bench = docs.filter(col("doc_id") % 37 === 0)
      .select(col("doc_id"), col("text")).limit(5)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-prep").toString
    val manifest = PrepareRun.run(spark, docs, bench, tmp,
      minTokens = 10, threshold = 0.5, capacity = 512, valPct = 10).toMap

    val train = spark.read.parquet(s"$tmp/train_docs")
    val vals = spark.read.parquet(s"$tmp/val_docs")
    // split: disjoint and complete w.r.t. the decontaminated count
    assert(train.select("doc_id").intersect(vals.select("doc_id")).isEmpty)
    assert(manifest("train") + manifest("val") == manifest("decontaminated"))
    assert(manifest("input") >= manifest("quality_pass"))
    assert(manifest("quality_pass") >= manifest("dedup_survivors"))
    assert(manifest("dedup_survivors") >= manifest("decontaminated"))
    // quality floor holds on every surviving row
    val kept = train.select("doc_id", "text", "source", "lang")
      .unionByName(vals.select("doc_id", "text", "source", "lang"))
    assert(kept.filter(Pack.tokenCount(col("text")) < 10).isEmpty)
    // zero surviving near-dup pairs at the pipeline's own threshold
    assert(Dedup.minHashLsh(kept, "doc_id", "text", threshold = 0.5)
      .isEmpty)
    // zero contaminated survivors (exact recheck, not the bloom path)
    assert(Contamination.report(kept, bench, "doc_id", "text", 8)
      .isEmpty)
    // packed spans respect capacity and cover every train doc
    val spans = spark.read.parquet(s"$tmp/train_spans")
    assert(spans.filter(col("n_tokens") > 512).isEmpty)
  }

  test("persisted binary index reproduces the in-memory binaryTopK") {
    import graft.operators.Similarity
    val rnd = new scala.util.Random(11)
    val corpus = (1L to 80L).map(i =>
      (i, Seq.fill(32)(rnd.nextFloat() * 2 - 1), i.toInt % 3))
      .toDF("vec_id", "embedding", "label")
    val q = Seq(Tuple1(Seq.fill(32)(rnd.nextFloat() * 2 - 1)))
      .toDF("q_embedding")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-binidx").toString
    Similarity.writeBinaryIndex(corpus, s"$tmp/idx")
    // the codes table must be the skinny scan target: two columns only
    val codes = spark.read.parquet(s"$tmp/idx/codes")
    assert(codes.columns.sorted.toSeq == Seq("bits", "vec_id"))
    val mem = Similarity.binaryTopK(corpus, q, 6, prefilter = 20)
      .select("vec_id", "sim", "hamming")
      .as[(Long, Double, Int)].collect().toSeq
    val idx = Similarity.binaryIndexTopK(spark, s"$tmp/idx", q, 6,
        prefilter = 20)
      .select("vec_id", "sim", "hamming")
      .as[(Long, Double, Int)].collect().toSeq
    assert(idx === mem)
  }
}
