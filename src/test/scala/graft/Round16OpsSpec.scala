package graft

import org.apache.spark.sql.functions._

/** Round-16 ANN index lifecycle: PQ append under frozen codebooks,
  * tripwire-gated retrain-vs-append, and the prepare-run wave sync.
  */
class Round16OpsSpec extends GraftSparkSpec {

  private def emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("appendIvfPqIndex: incremental equals one-shot at frozen centroids+codebook; compact preserves; drift fires") {
    import graft.operators.Similarity
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-r16-pq").toString
    val all = emb
    val head = all.filter(col("vec_id") < 300) // holds the nlist+nCodes seeds
    val tail = all.filter(col("vec_id") >= 300)
    Similarity.writeIvfPqIndex(all, s"$tmp/full", nlist = 8, nSub = 8,
      nCodes = 16)
    Similarity.writeIvfPqIndex(head, s"$tmp/inc", nlist = 8, nSub = 8,
      nCodes = 16)
    val rep = Similarity.appendIvfPqIndex(tail, s"$tmp/inc")
    assert(rep.isDefined, "writeIvfPqIndex must persist build_dist now")
    assert(!rep.get.retrain, "uniform tail wave must not trip the tripwire")
    val q = all.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_embedding"))
    def topk(p: String) = Similarity
      .ivfPqIndexTopK(spark, p, q, k = 10, nprobe = 4)
      .collect().map(_.toSeq).toSeq
    assert(topk(s"$tmp/full") == topk(s"$tmp/inc"))
    assert(spark.read.parquet(s"$tmp/inc/lists").count() == all.count())
    // append fragments the lists; compaction must not change results
    val before = topk(s"$tmp/inc")
    Similarity.compactIndex(spark, s"$tmp/inc", targetBytes = 1L << 30)
    assert(topk(s"$tmp/inc") == before)
    // a one-cell wave (ingest suddenly concentrated) fires x84's tripwire
    val cents = Similarity.seedCentroids(all, 8)
    val assigned = Similarity.assignLists(all, cents).localCheckpoint()
    val hot = assigned.orderBy("list_id", "vec_id")
      .limit(1).select("list_id").as[Long].head()
    val fired = Similarity.appendIvfPqIndex(
      all.join(assigned.filter(col("list_id") === hot).select("vec_id"),
        "vec_id"), s"$tmp/inc")
    assert(fired.isDefined && fired.get.retrain)
  }

  test("maintainIvfIndex: quiet wave appends under frozen centroids; drifted wave retrains atomically") {
    import graft.operators.Similarity
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-r16-mnt").toString
    val all = emb
    val base = all.filter(col("vec_id") < 300)
    Similarity.writeIvfIndex(base, s"$tmp/idx", nlist = 8)
    def centSnap() = spark.read.parquet(s"$tmp/idx/centroids")
      .collect().map(_.toSeq).toSet
    val centsBefore = centSnap()
    // quiet wave: a uniform sample — appended, centroids frozen
    val quiet = all.filter(col("vec_id") >= 300 && col("vec_id") % 5 === 0)
    val (r1, rb1) = Similarity.maintainIvfIndex(spark, s"$tmp/idx", quiet,
      sys.error("quiet wave must not evaluate the corpus"))
    assert(r1.isDefined && !r1.get.retrain && !rb1)
    assert(centSnap() == centsBefore, "append must not touch centroids")
    assert(spark.read.parquet(s"$tmp/idx/lists").count() ==
      base.count() + quiet.count())
    // drifted wave: one coarse cell only — tripwire fires, index
    // rebuilds from the (wave-inclusive) corpus via the atomic swap
    val cents = Similarity.seedCentroids(base, 8)
    val rest = all.filter(col("vec_id") >= 300 && col("vec_id") % 5 =!= 0)
    val restAsg = Similarity.assignLists(rest, cents).localCheckpoint()
    val hot = restAsg.groupBy("list_id").count()
      .orderBy(col("count").desc, col("list_id"))
      .limit(1).select("list_id").as[Long].head()
    val hotWave = restAsg.filter(col("list_id") === hot).drop("list_id")
    val corpus = base.union(quiet).union(hotWave)
    val (r2, rb2) = Similarity.maintainIvfIndex(spark, s"$tmp/idx", hotWave,
      corpus, trainIters = 0)
    assert(r2.isDefined && r2.get.retrain && rb2)
    assert(!new java.io.File(s"$tmp/idx.retraining").exists())
    assert(!new java.io.File(s"$tmp/idx.old").exists())
    // the rebuilt index holds exactly the corpus and serves queries
    assert(spark.read.parquet(s"$tmp/idx/lists").count() == corpus.count())
    val res = Similarity.ivfIndexTopK(spark, s"$tmp/idx",
      all.filter(col("vec_id") === 0)
        .select(col("embedding").as("q_embedding")), k = 5, nprobe = 8)
      .collect()
    assert(res.length == 5 && res.head.getLong(0) == 0L) // self is top hit
  }

  test("syncAnnIndex: a wave folded by compactRun before any sync still reaches the index") {
    import graft.operators.{PrepareRun, Similarity}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = docs.join(
      emb.select(col("vec_id").as("doc_id"), col("embedding")), "doc_id")
    val bench = docs.filter(col("doc_id") % 37 === 0)
      .select(col("doc_id"), col("text")).limit(5)
    val c1 = corpus.filter(col("doc_id") < 250)
    val w1 = corpus.filter(col("doc_id") >= 250)
    val tmp = java.nio.file.Files.createTempDirectory("graft-r16-fold").toString
    PrepareRun.run(spark, c1, bench, tmp,
      minTokens = 10, threshold = 0.5, capacity = 512, valPct = 10)
    val m0 = PrepareRun.syncAnnIndex(spark, tmp, s"$tmp/ann", nlist = 8)
    PrepareRun.runWave(spark, w1, tmp, 1)
    // fold BEFORE the sync sees wave 1: every row is now wave=0, so the
    // cheap wave>indexedMax filter can never match — the fallback path
    // (full candidates + anti-join) must still index the folded vectors
    PrepareRun.compactRun(spark, tmp)
    val m1 = PrepareRun.syncAnnIndex(spark, tmp, s"$tmp/ann", nlist = 8)
    assert(m1("n_appended") > 0L, "folded wave vectors were silently skipped")
    assert(spark.read.parquet(s"$tmp/ann/lists").count() ==
      spark.read.parquet(s"$tmp/train_docs").count())
    assert(m0("n_appended") + m1("n_appended") ==
      spark.read.parquet(s"$tmp/ann/lists").count())
    // replay: anti-join makes it a no-op
    assert(PrepareRun.syncAnnIndex(spark, tmp, s"$tmp/ann", nlist = 8)
      .apply("n_appended") == 0L)
  }

  test("syncAnnIndex: prepare-run waves keep the index in sync; replay is a no-op; base recompute rebuilds") {
    import graft.operators.{PrepareRun, Similarity}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = docs.join(
      emb.select(col("vec_id").as("doc_id"), col("embedding")), "doc_id")
    val bench = docs.filter(col("doc_id") % 37 === 0)
      .select(col("doc_id"), col("text")).limit(5)
    // wave ids strictly above base ids: the lowest nlist surviving
    // doc_ids always live in the base, so frozen seed centroids match a
    // one-shot build over the union (the r10 equality discipline)
    val c1 = corpus.filter(col("doc_id") < 250)
    val w1 = corpus.filter(col("doc_id") >= 250)
    val tmp = java.nio.file.Files.createTempDirectory("graft-r16-sync").toString
    PrepareRun.run(spark, c1, bench, tmp,
      minTokens = 10, threshold = 0.5, capacity = 512, valPct = 10)
    val m0 = PrepareRun.syncAnnIndex(spark, tmp, s"$tmp/ann", nlist = 8)
    assert(m0("max_wave") == 0L && m0("retrained") == 0L)
    assert(spark.read.parquet(s"$tmp/ann/lists").count() == m0("n_appended"))
    PrepareRun.runWave(spark, w1, tmp, 1)
    val m1 = PrepareRun.syncAnnIndex(spark, tmp, s"$tmp/ann", nlist = 8)
    assert(m1("max_wave") == 1L && m1("n_appended") > 0L)
    assert(spark.read.parquet(s"$tmp/ann/lists").count() ==
      m0("n_appended") + m1("n_appended"))
    // replayed sync: nothing new committed, nothing appended
    val m2 = PrepareRun.syncAnnIndex(spark, tmp, s"$tmp/ann", nlist = 8)
    assert(m2("n_appended") == 0L)
    // query-identical to a one-shot index over the committed train docs
    // (same frozen seed centroids — lowest ids live in the base)
    val committed = spark.read.parquet(s"$tmp/train_docs")
      .select(col("doc_id").as("vec_id"), col("source").as("label"),
        col("embedding"))
    Similarity.writeIvfIndex(committed, s"$tmp/oneshot", nlist = 8)
    val q = committed.orderBy("vec_id").limit(1)
      .select(col("embedding").as("q_embedding"))
    def topk(p: String) = Similarity.ivfIndexTopK(spark, p, q, 10, nprobe = 4)
      .collect().map(_.toSeq).toSeq
    assert(topk(s"$tmp/ann") == topk(s"$tmp/oneshot"))
    // a base-front recompute drops the ann marker → next sync rebuilds
    PrepareRun.run(spark, c1, bench, tmp,
      minTokens = 12, threshold = 0.5, capacity = 512, valPct = 10)
    assert(!new java.io.File(s"$tmp/_stage_ann").exists())
    val m3 = PrepareRun.syncAnnIndex(spark, tmp, s"$tmp/ann", nlist = 8)
    assert(m3("max_wave") == 0L)
    assert(spark.read.parquet(s"$tmp/ann/lists").count() == m3("n_appended"))
  }
}
