package graft

import graft.operators.{Dedup, Multimodal, Similarity}
import org.apache.spark.sql.functions._

/** Semantic checks for the non-oracle extension ops: plant near-duplicates,
  * verify they are recovered; compare LSH against brute force.
  */
class DedupSimilaritySpec extends GraftSparkSpec {
  import spark.implicits._

  // corpus: token-disjoint base docs + planted near-dup pairs
  private lazy val corpus = {
    val base = (1 to 40).map { i =>
      val words = (0 until 30).map(j => s"w${i}_$j")
      (i.toLong, words.mkString(" "))
    }
    // 41..43: near-copies of docs 1..3 (one word changed)
    val dups = (1 to 3).map { i =>
      val words = (0 until 30).map(j => s"w${i}_$j").toArray
      words(15) = "CHANGED"
      ((40 + i).toLong, words.mkString(" "))
    }
    (base ++ dups).toDF("doc_id", "text")
  }

  test("clusters: pair chains collapse to min-label components; survivors kept") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = Dedup.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    val docs = (1L to 12L).toDF("doc_id")
    val survivors = Dedup.dedupSurvivors(docs, "doc_id", pairs)
      .as[Long].collect().toSet
    assert(survivors == (1L to 12L).toSet -- Set(2L, 3L, 11L))
  }

  test("clustersAlternating: logarithmic rounds on a deep chain; agrees with clusters") {
    import spark.implicits._
    // a 200-node path: min-label propagation needs ~200 rounds, so
    // clusters() with maxIter=20 hits non-convergence and must hand off to
    // the log-round alternating variant — same answer, no intervention
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val viaFallback = Dedup.clusters(chain, maxIter = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaFallback.length == 200 && viaFallback.forall(_._2 == 0L))
    val labels = Dedup.clustersAlternating(chain, maxIter = 25)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(labels.length == 200 && labels.forall(_._2 == 0L))

    // same answer as min-label propagation on a shallow multi-component graph
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (7L, 5L)).toDF("id_a", "id_b")
    val a = Dedup.clusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Dedup.clustersAlternating(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("minhash LSH recovers planted near-dups, no false positives at high threshold") {
    val pairs = Dedup.minHashLsh(corpus, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 41L), (2L, 42L), (3L, 43L)))
  }

  test("ngram jaccard inverted index finds the same planted pairs") {
    val pairs = Dedup.ngramJaccard(corpus, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 41L), (2L, 42L), (3L, 43L)))
  }

  test("incremental dedup: batch hits its corpus twins, cross pairs only") {
    // corpus = docs 1..40 + planted dup 41; batch = near-copies of docs
    // 1 and 2 plus one fresh doc — only the (batch, corpus) twins report
    val corp = corpus.filter(col("doc_id") <= 41)
    val batchDocs = Seq(
      (101L, (0 until 30).map(j => s"w1_$j").updated(3, "EDIT").mkString(" ")),
      (102L, (0 until 30).map(j => s"w2_$j").updated(7, "EDIT").mkString(" ")),
      (103L, (0 until 30).map(j => s"fresh_$j").mkString(" "))
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalNearDup(corp, batchDocs, "doc_id", "text",
      threshold = 0.5).collect()
    val pairs = got.map(r => (r.getLong(0), r.getLong(1))).toSet
    // 101 matches corpus 1 AND its planted near-copy 41 (both are twins)
    assert(pairs == Set((101L, 1L), (101L, 41L), (102L, 2L)),
      s"got $pairs")
    // every reported pair is batch x corpus (no within-side pairs)
    assert(got.forall(r => r.getLong(0) >= 101L && r.getLong(1) <= 41L))
    // jaccard is the exact verified value, high for one-word edits
    assert(got.forall(_.getAs[Double]("jaccard") > 0.5))
  }

  test("simhash: planted near-dups are hamming-close; distinct docs are not") {
    val pairs = Dedup.simHashPairs(corpus, "doc_id", "text", maxHamming = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(Set((1L, 41L), (2L, 42L), (3L, 43L)).subsetOf(pairs.toSet))
  }

  test("minhash signature estimates jaccard") {
    import graft.functions.SketchFunctions
    val df = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i CHANGED")).toDF("id", "text")
      .withColumn("sig", SketchFunctions.minHash(split($"text", " "), 128))
    val sigs = df.orderBy("id").collect().map(_.getSeq[Long](2))
    val est = sigs(0).zip(sigs(1)).count { case (x, y) => x == y } / 128.0
    // true token jaccard = 9/11 ≈ 0.82; estimate within ±0.15
    assert(math.abs(est - 9.0 / 11.0) < 0.15)
  }

  test("embedding LSH top-k recall vs brute force on testdata") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter($"vec_id" === 0).select($"embedding".as("q_embedding"))
    val brute = Similarity.bruteForceTopK(e.filter($"vec_id" =!= 0), q, 10)
      .collect().map(_.getLong(0)).toSet
    val lsh = Similarity.lshTopK(e.filter($"vec_id" =!= 0), q, 10, probes = 8)
      .collect().map(_.getLong(0)).toSet
    assert(lsh.nonEmpty)
    // recall of at least half of true top-10 with generous probes
    assert((brute & lsh).size >= 5, s"recall too low: $brute vs $lsh")
  }

  test("IVF+PQ two-stage ANN: exhaustive config equals brute force; no shuffle") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter($"vec_id" === 0).select($"embedding".as("q_embedding"))
    val cand = e.filter($"vec_id" =!= 0)
    val brute = Similarity.bruteForceTopK(cand, q, 10)
      .collect().map(_.getLong(0)).toSeq
    // probe every list and re-rank a corpus-sized shortlist: both pruning
    // stages degenerate to exhaustive, so the result must be EXACTLY the
    // brute-force top-k (same rounding, same tie-breaks)
    val exhaustive = Similarity.ivfPqTopK(cand, q, 10,
      nlist = 8, nprobe = 8, shortlistFactor = 1000)
    assert(exhaustive.collect().map(_.getLong(0)).toSeq == brute)
    // the pruned production config still reaches most of the true top-k
    // on this worst-case i.i.d. fixture
    val pruned = Similarity.ivfPqTopK(cand, q, 10, nlist = 8, nprobe = 4)
      .collect().map(_.getLong(0)).toSet
    assert((brute.toSet & pruned).size >= 5,
      s"compound recall too low: $brute vs $pruned")
    // scale shape: list pruning + ADC shortlist + re-rank shuffle NOTHING —
    // only the query vector's broadcast exchange may appear
    val p = Similarity.ivfPqTopK(cand, q, 10, nlist = 8, nprobe = 4)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"),
      s"unexpected shuffle in IVF+PQ plan:\n$p")
  }

  test("IVF+PQ persisted index: equals the in-memory operator; ADC scan prunes to codes") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter($"vec_id" === 0).select($"embedding".as("q_embedding"))
    val cand = e.filter($"vec_id" =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-idx").toString
    Similarity.writeIvfPqIndex(cand, dir, nlist = 8, nSub = 8, nCodes = 16)
    val viaIndex = Similarity.ivfPqIndexTopK(spark, dir, q, 10, nprobe = 4)
    val direct = Similarity.ivfPqTopK(cand, q, 10, nlist = 8, nprobe = 4)
    assert(viaIndex.collect().toSeq == direct.collect().toSeq,
      "persisted-index query must reproduce the in-memory pipeline exactly")
    // scale shape, from the formatted plan: (a) probe pruning reaches the
    // scan as a list_id PartitionFilter; (b) the ADC stage's scan reads
    // codes but NOT embedding (column pruning = ~8 B/vector shortlisting)
    val plan = Similarity.ivfPqIndexTopK(spark, dir, q, 10, nprobe = 4)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters"), s"no partition pruning:\n$plan")
    val adcScan = plan.linesIterator.filter(_.contains("ReadSchema"))
      .exists(l => l.contains("codes") && !l.contains("embedding"))
    assert(adcScan, s"ADC stage must scan codes without embedding:\n$plan")
  }

  test("multimodal plumbing: real per-modality decode + frame sampling, deterministic") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val media = Multimodal.synthesizeMedia(spark, docs)
    assert(media.schema("content").dataType.typeName == "binary")
    val feats = Multimodal.extractFeatures(spark, media)
    assert(feats.count() == docs.count())
    // every modality present and dispatched through its REAL decoder
    assert(feats.select("modality").distinct().collect().map(_.getString(0)).toSet
      == Set("image", "audio", "video"))
    // spot-check one video row against the synthesis arithmetic: doc 2 has
    // 4 frames of intensity mean ((2+f)%256 + (14+13f)%256 + (26+29f)%256)/3
    val v2 = feats.filter($"doc_id" === 2).head()
    assert(v2.getAs[Int]("n_units") == 4)
    val expect2 = (0 until 4).map(f =>
      ((2 + f) % 256 + (14 + 13 * f) % 256 + (26 + 29 * f) % 256) / 3.0).sum / 4
    assert(v2.getAs[Double]("feature") ==
      math.floor(expect2 * 10000 + 0.5) / 10000)
    val video = media.filter($"modality" === "video")
    val frames = Multimodal.sampleFrames(spark, video)
    // doc_id % 6 + 2 frames, every 2nd sampled -> ceil(n/2) in {1..4}
    val perDoc = frames.groupBy("doc_id").count().select("count").distinct().collect()
    assert(perDoc.map(_.getLong(0)).toSet.subsetOf(Set(1L, 2L, 3L, 4L)))
    // deterministic across runs: symmetric containment AND identical
    // cardinality (one-directional except() would miss extra/duplicate
    // rows in the second run)
    val again = Multimodal.sampleFrames(spark,
      Multimodal.synthesizeMedia(spark, docs).filter($"modality" === "video"))
    assert(frames.except(again).count() == 0)
    assert(again.except(frames).count() == 0)
    assert(frames.count() == again.count())
  }

  test("video decode is REAL: AVI container round-trip with validated structure") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val avis = Multimodal.synthesizeVideo(spark, docs)
    // genuine RIFF/AVI magic, not pseudo-content
    val head = avis.select("content").head().getAs[Array[Byte]](0)
    assert(new String(head.take(4), "US-ASCII") == "RIFF")
    assert(new String(head.slice(8, 12), "US-ASCII") == "AVI ")
    val feats = Multimodal.decodeVideo(spark, avis)
    // one row per frame: sum over docs of (doc_id % 6 + 2)
    val expectedRows = docs.select("doc_id").collect()
      .map(r => r.getLong(0) % 6 + 2).sum
    assert(feats.count() == expectedRows)
    // a corrupted container fails loudly instead of decoding garbage
    val bad = head.clone()
    bad(9) = 'X'.toByte // break the 'AVI ' fourcc
    val ex = intercept[Exception] {
      Multimodal.decodeVideo(spark,
        avis.limit(1).select($"doc_id", org.apache.spark.sql.functions.lit(bad).as("content")))
        .collect()
    }
    assert(ex.getMessage != null)
  }

  test("image decode is REAL: PNG encode -> javax.imageio decode round-trip") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val pngs = Multimodal.synthesizeImages(spark, docs)
    // the payloads are genuine PNGs (magic bytes), not pseudo-content
    val magic = pngs.select("content").head().getAs[Array[Byte]](0).take(8)
    assert(magic.sameElements(
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)))

    val feats = Multimodal.decodeImages(spark, pngs).collect()
    assert(feats.length == docs.count())
    feats.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == (id % 8 + 2).toInt, s"width mismatch doc $id")
      assert(r.getInt(2) == (id % 5 + 2).toInt, s"height mismatch doc $id")
      val expected = math.floor(
        (299L * (id % 256) + 587L * ((id * 7) % 256) +
          114L * ((id * 13) % 256)).toDouble / 1000 * 10000 + 0.5) / 10000
      assert(r.getDouble(3) == expected, s"mean_luma mismatch doc $id")
    }
  }

  test("audio decode is REAL: RIFF/WAV parse via AudioSystem, exact RMS") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val wavs = Multimodal.synthesizeAudio(spark, docs)
    // genuine RIFF container (magic bytes), not pseudo-content
    val head = wavs.select("content").head().getAs[Array[Byte]](0)
    assert(new String(head.take(4), "US-ASCII") == "RIFF")
    assert(new String(head.slice(8, 12), "US-ASCII") == "WAVE")
    val feats = Multimodal.decodeAudio(spark, wavs).collect()
    assert(feats.length == docs.count())
    feats.foreach { r =>
      val id = r.getLong(0)
      val n = (id % 50 + 20).toInt
      assert(r.getInt(1) == 8000 && r.getInt(2) == n, s"doc $id header")
      val sumSq = (0 until n).map { j =>
        val s = (id * 31 + j * 17) % 2001 - 1000; s * s
      }.sum
      val expected =
        math.floor(math.sqrt(sumSq.toDouble / n) * 10000 + 0.5) / 10000
      assert(r.getDouble(3) == expected, s"rms mismatch doc $id")
    }
    // the decode actually parses the container: corrupt bytes fail loudly
    val bad = Seq((0L, Array.fill[Byte](64)(7))).toDF("doc_id", "content")
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeAudio(spark, bad).collect()
    }
  }

  test("image resize is REAL: thumbnail preserves solid color at target dims") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val thumbs = Multimodal.resizeImages(
      spark, Multimodal.synthesizeImages(spark, docs), 3, 3)
    val feats = Multimodal.decodeImages(spark, thumbs).collect()
    assert(feats.length == docs.count())
    feats.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == 3 && r.getInt(2) == 3, s"dims mismatch doc $id")
      val expected = math.floor(
        (299L * (id % 256) + 587L * ((id * 7) % 256) +
          114L * ((id * 13) % 256)).toDouble / 1000 * 10000 + 0.5) / 10000
      assert(r.getDouble(3) == expected,
        s"solid color must survive bilinear resize, doc $id")
    }
  }
}
