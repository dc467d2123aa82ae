package graft

import org.apache.spark.sql.functions._

/** Round-14 hardening: compactIndex's crash window (the already-compact
  * move must never be able to gut the live lists table), the ISO-BMFF
  * absent-stss sync rule, and the fragmented-mp4 surface.
  */
class Round14OpsSpec extends GraftSparkSpec {

  test("compactIndex: crash inside the swap window is fully recovered") {
    import graft.operators.Similarity
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-ann-crash").toString
    Similarity.writeIvfIndex(e.filter(col("vec_id") % 4 === 0), s"$tmp/ivf", 8)
    (1 to 3).foreach { w =>
      Similarity.appendIvfIndex(e.filter(col("vec_id") % 4 === w), s"$tmp/ivf")
    }
    def q() = Similarity.ivfIndexTopK(spark, s"$tmp/ivf",
      e.filter(col("vec_id") === 7)
        .select(col("embedding").as("q_embedding")), 5, nprobe = 4)
      .collect().map(_.toSeq).toSeq
    val before = q()

    // reproduce the exact mid-swap crash state: live staged to .old,
    // one list dir already moved into .compacting, commit rename never
    // happened (the state the r13 protocol turned into permanent loss)
    val lists = new java.io.File(s"$tmp/ivf/lists")
    val old = new java.io.File(s"$tmp/ivf/lists.old")
    val staging = new java.io.File(s"$tmp/ivf/lists.compacting")
    assert(lists.renameTo(old))
    staging.mkdirs()
    val someDir = old.listFiles().filter(_.isDirectory)
      .filter(_.getName.startsWith("list_id=")).minBy(_.getName)
    assert(someDir.renameTo(new java.io.File(staging, someDir.getName)))

    // next maintenance run must restore the FULL original (merge the
    // moved dir back) and then compact normally
    val report = Similarity.compactIndex(spark, s"$tmp/ivf")
    assert(report("lists")._2 <= report("lists")._1)
    assert(q() == before, "crash recovery lost index rows")

    // phase-1 crash (orphaned .compacting with a REWRITTEN copy of a
    // still-live dir) must be discarded, not merged — no duplicates
    val liveDir = new java.io.File(s"$tmp/ivf/lists").listFiles()
      .filter(_.isDirectory).minBy(_.getName)
    val st2 = new java.io.File(s"$tmp/ivf/lists.compacting")
    st2.mkdirs()
    val copyDst = new java.io.File(st2, liveDir.getName)
    org.apache.hadoop.fs.FileUtil.copy(
      org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(liveDir.toString),
      org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(copyDst.toString),
      false, spark.sparkContext.hadoopConfiguration)
    Similarity.compactIndex(spark, s"$tmp/ivf")
    assert(q() == before, "orphaned rewrite copy was wrongly merged")
    assert(!st2.exists())
  }

  // the writers' deterministic per-track fill formulas — reproduced as
  // independent ground truth (same formulas as Round13OpsSpec pins for
  // the moov writer; the fragmented writer shares them by construction)
  private def videoFill(seed: Long, sizes: Array[Int]): Array[Array[Byte]] = {
    var j = 0L
    sizes.zipWithIndex.map { case (sz, i) =>
      Array.tabulate(sz) { _ =>
        val b = ((seed + 7 * i + j) % 256).toByte; j += 1; b }
    }
  }
  private def audioFill(seed: Long, sizes: Array[Int]): Array[Array[Byte]] = {
    var j = 0L
    sizes.zipWithIndex.map { case (sz, i) =>
      Array.tabulate(sz) { _ =>
        val b = java.lang.Math.floorMod(seed * 5 + 11 * i + j, 256L).toByte
        j += 1; b }
    }
  }

  test("fmp4: moof/traf/trun absolute offsets match writer ground truth") {
    import graft.operators.Multimodal
    for (explicitBase <- Seq(false, true)) {
      val vSizes = Array(20, 21, 22, 23, 24)
      val vDurs = Array(3000, 3000, 3600, 3600, 3600)
      val aSizes = Array(10, 11, 12)
      val bytes = Multimodal.mp4FragmentedBytes(32, 48, vSizes, vDurs,
        seed = 9L, samplesPerFragment = 2, audioSizes = aSizes,
        explicitBase = explicitBase)
      val m = Multimodal.parseMp4(bytes)
      assert(m.tracks.length == 2)
      // audio trak written FIRST in moov — selection still goes by hdlr
      assert(m.tracks(0).handler == "soun" && m.tracks(0).codec == "mp4a")
      val v = m.video
      assert(v.codec == "avc1" && v.width == 32 && v.height == 48)
      // first sample of each 2-sample fragment is the keyframe
      // (first_sample_flags vs the non-sync tfhd default)
      assert(v.syncs.toSeq == Seq(1, 3, 5))
      // each trun synthesizes one chunk: 2,2,1 samples
      val co = Multimodal.sampleChunkOffsets(v)
      assert(co.map(_._1).toSeq == Seq(0, 0, 1, 1, 2))
      // stts re-assembled from per-sample trun durations
      assert(v.sttsRuns.toSeq == Seq((2L, 3000L), (3L, 3600L)))
      // ABSOLUTE offsets read back the writer's exact payload bytes
      val vExp = videoFill(9L, vSizes)
      co.zipWithIndex.foreach { case ((_, off), j) =>
        assert(bytes.slice(off.toInt, off.toInt + vSizes(j)).toSeq ==
          vExp(j).toSeq,
          s"video sample $j at offset $off (explicitBase=$explicitBase)")
      }
      // audio: duration + sync resolve through trex (no trun fields)
      val a = m.tracks(0)
      assert(a.syncs.isEmpty && a.timescale == 48000L)
      assert(a.sttsRuns.toSeq == Seq((3L, 1024L)))
      val ao = Multimodal.sampleChunkOffsets(a)
      val aExp = audioFill(9L, aSizes)
      ao.zipWithIndex.foreach { case ((ci, off), i) =>
        assert(ci == i)
        assert(bytes.slice(off.toInt, off.toInt + aSizes(i)).toSeq ==
          aExp(i).toSeq,
          s"audio sample $i at offset $off (explicitBase=$explicitBase)")
      }
      // the audio sample shares its fragment's mdat with the video
      // samples: it starts right after them
      assert(ao(0)._2 == co(0)._2 + vSizes(0) + vSizes(1))
    }
  }

  test("fmp4: more audio fragments than video fragments still map") {
    import graft.operators.Multimodal
    // 1 video fragment, 4 audio fragments — trailing moofs carry audio
    // trafs only
    val bytes = Multimodal.mp4FragmentedBytes(16, 16, Array(20, 21),
      Array(3000, 3000), seed = 4L, samplesPerFragment = 2,
      audioSizes = Array(10, 11, 12, 13))
    val m = Multimodal.parseMp4(bytes)
    assert(m.video.sizes.length == 2)
    val a = m.tracks(0)
    assert(a.sizes.toSeq == Seq(10L, 11L, 12L, 13L))
    val aExp = audioFill(4L, Array(10, 11, 12, 13))
    Multimodal.sampleChunkOffsets(a).zipWithIndex.foreach {
      case ((_, off), i) =>
        assert(bytes.slice(off.toInt, off.toInt + aExp(i).length).toSeq ==
          aExp(i).toSeq, s"audio sample $i")
    }
  }

  test("fmp4: a corrupted tfdt fails loudly (timeline continuity)") {
    import graft.operators.Multimodal
    val bytes = Multimodal.mp4FragmentedBytes(16, 16, Array(20, 21, 22, 23),
      Array(3000, 3000, 3000, 3000), seed = 7L, samplesPerFragment = 2)
    assert(Multimodal.parseMp4(bytes).video.sizes.length == 4)
    // video-only file: the 2nd tfdt is fragment 1's video traf; bump
    // its declared baseMediaDecodeTime by one tick
    val marker = "tfdt".getBytes("US-ASCII").toSeq
    val first = bytes.toSeq.indexOfSlice(marker)
    val second = bytes.toSeq.indexOfSlice(marker, first + 4)
    assert(second > first && first >= 0)
    val mutated = bytes.clone()
    // u64 payload sits at marker + 4 (fourcc) + 4 (version/flags)
    val bb = java.nio.ByteBuffer.wrap(mutated)
    val old = bb.getLong(second + 8)
    bb.putLong(second + 8, old + 1)
    val ex = intercept[IllegalArgumentException] {
      Multimodal.parseMp4(mutated)
    }
    assert(ex.getMessage.contains("tfdt"))
  }

  test("fmp4: mp4SampleTable consumes fragmented files unchanged") {
    import graft.operators.Multimodal
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(12)
    val st = Multimodal.mp4SampleTable(spark,
      Multimodal.synthesizeFmp4(spark, docs))
      .collect()
    assert(st.nonEmpty)
    st.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val i = r.getAs[Int]("sample_idx")
      assert(r.getAs[Long]("n_bytes") == (id + i) % 50 + 20)
      assert(r.getAs[Int]("chunk_idx") == i / 2)
      assert(r.getAs[Boolean]("is_sync") == (i % 2 == 0))
    }
  }

  test("RecursionDoubling: composite (tenant, node) keys plan as HierarchyDoubling") {
    import org.apache.spark.sql.functions._
    // two tenants, each a 32-node binary forest — the multi-tenant
    // hierarchy shape keyed on (tenant_id, node)
    spark.range(64).select((col("id") % 2).as("tenant"),
        (col("id") / 2).cast("long").as("node"))
      .createOrReplaceTempView("r14_tn")
    val sql = """WITH RECURSIVE r AS (
                |  SELECT tenant, node, CAST(0 AS BIGINT) AS depth,
                |    node AS path_sum
                |  FROM r14_tn WHERE node = 0
                |  UNION ALL
                |  SELECT n.tenant, n.node, r.depth + 1,
                |    r.path_sum + n.node
                |  FROM r14_tn n JOIN r
                |    ON r.tenant = n.tenant
                |    AND r.node = CAST(floor(n.node / 2) AS BIGINT)
                |  WHERE n.node > 0)
                |SELECT tenant, node, depth, path_sum FROM r
                |ORDER BY tenant, node""".stripMargin
    val on = spark.sql(sql)
    assert(on.queryExecution.executedPlan.toString
      .contains("HierarchyDoubling"),
      s"composite key did not match:\n${on.queryExecution.optimizedPlan}")
    val onRows = on.collect().map(_.toSeq).toSeq
    assert(onRows.length == 64)
    spark.conf.set("spark.graft.recursionDoubling.enabled", "false")
    try {
      val off = spark.sql(sql)
      assert(!off.queryExecution.executedPlan.toString
        .contains("HierarchyDoubling"))
      assert(off.collect().map(_.toSeq).toSeq == onRows,
        "composite-key doubling diverged from the UnionLoop rows")
    } finally spark.conf.set("spark.graft.recursionDoubling.enabled", "true")
    // the tenants do NOT cross: every node's path_sum is the
    // within-tenant root-to-node sum
    assert(onRows.forall(r => r(3).asInstanceOf[Long] ==
      Iterator.iterate(r(1).asInstanceOf[Long])(_ / 2)
        .takeWhile(_ > 0).sum))
  }

  test("RecursionDoubling: THREE-column keys match (nested And unwrap)") {
    import org.apache.spark.sql.functions._
    spark.range(64).select((col("id") % 2).as("region"),
        ((col("id") / 2) % 2).as("tenant"),
        (col("id") / 4).cast("long").as("node"))
      .createOrReplaceTempView("r14_rtn")
    val sql = """WITH RECURSIVE r AS (
                |  SELECT region, tenant, node, CAST(0 AS BIGINT) AS depth
                |  FROM r14_rtn WHERE node = 0
                |  UNION ALL
                |  SELECT n.region, n.tenant, n.node, r.depth + 1
                |  FROM r14_rtn n JOIN r
                |    ON r.region = n.region AND r.tenant = n.tenant
                |    AND r.node = CAST(floor(n.node / 2) AS BIGINT)
                |  WHERE n.node > 0)
                |SELECT region, tenant, node, depth FROM r
                |ORDER BY region, tenant, node""".stripMargin
    val on = spark.sql(sql)
    assert(on.queryExecution.executedPlan.toString
      .contains("HierarchyDoubling"),
      s"3-col key did not match:\n${on.queryExecution.optimizedPlan}")
    val onRows = on.collect().map(_.toSeq).toSeq
    assert(onRows.length == 64)
    spark.conf.set("spark.graft.recursionDoubling.enabled", "false")
    try assert(spark.sql(sql).collect().map(_.toSeq).toSeq == onRows)
    finally spark.conf.set("spark.graft.recursionDoubling.enabled", "true")
  }

  test("q76 gate executes through HierarchyDoubling (not UnionLoop)") {
    // the oracle compare passes either way (UnionLoop is also correct) —
    // this pins that the composite-key rule actually FIRES on the gate
    val df = SparkEntry.queries("q76_recursive_composite")(spark, sfDir)
    assert(df.queryExecution.executedPlan.toString
      .contains("HierarchyDoubling"),
      s"q76 fell back to UnionLoop:\n${df.queryExecution.optimizedPlan}")
  }

  test("RecursionDoubling: composite keys with DAG multiplicity still fall back") {
    import spark.implicits._
    // same (tenant, child) reachable via two parents in tenant 0
    Seq((0L, 1L, 0L), (0L, 2L, 0L), (0L, 2L, 1L), (1L, 1L, 0L))
      .toDF("tenant", "child", "parent")
      .createOrReplaceTempView("r14_te")
    val sql = """WITH RECURSIVE r AS (
                |  SELECT CAST(0 AS BIGINT) AS tenant,
                |    CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS depth
                |  UNION ALL
                |  SELECT CAST(1 AS BIGINT), CAST(0 AS BIGINT),
                |    CAST(0 AS BIGINT)
                |  UNION ALL
                |  SELECT e.tenant, e.child, r.depth + 1
                |  FROM r14_te e JOIN r
                |    ON r.tenant = e.tenant AND r.node = e.parent)
                |SELECT tenant, node, depth FROM r
                |ORDER BY tenant, node, depth""".stripMargin
    val on = spark.sql(sql).collect().map(_.toSeq).toSeq
    spark.conf.set("spark.graft.recursionDoubling.enabled", "false")
    try {
      val off = spark.sql(sql).collect().map(_.toSeq).toSeq
      assert(on == off, s"composite fallback diverged: $on vs $off")
      // (0, 2) reached via 0 (depth 1) and via 1 (depth 2)
      assert(on.count(r => r(0) == 0L && r(1) == 2L) == 2)
    } finally spark.conf.set("spark.graft.recursionDoubling.enabled", "true")
  }

  test("RecursionDoubling: level-limit boundary matches UnionLoop exactly") {
    import org.apache.spark.sql.functions._
    // 0 -> 1 -> 2 -> 3: rows at depths 0..3
    spark.range(4).select(col("id").as("node"))
      .createOrReplaceTempView("r14_chain")
    val sql = """WITH RECURSIVE r AS (
                |  SELECT node, CAST(0 AS BIGINT) AS depth
                |  FROM r14_chain WHERE node = 0
                |  UNION ALL
                |  SELECT n.node, r.depth + 1
                |  FROM r14_chain n JOIN r ON r.node = n.node - 1
                |  WHERE n.node > 0)
                |SELECT node, depth FROM r ORDER BY node""".stripMargin
    def runWith(limit: Int, doubling: Boolean): Either[Throwable, Int] = {
      spark.conf.set("spark.sql.cteRecursionLevelLimit", limit.toString)
      spark.conf.set("spark.graft.recursionDoubling.enabled",
        doubling.toString)
      try Right(spark.sql(sql).collect().length)
      catch { case t: Throwable => Left(t) }
      finally {
        spark.conf.unset("spark.sql.cteRecursionLevelLimit")
        spark.conf.set("spark.graft.recursionDoubling.enabled", "true")
      }
    }
    // depth == levelLimit: BOTH paths reject (UnionLoop throws upon
    // entering level limit+1 while the frontier is non-empty)
    assert(runWith(3, doubling = false).isLeft,
      "vanilla UnionLoop accepted depth == levelLimit")
    assert(runWith(3, doubling = true).isLeft,
      "doubling accepted a hierarchy the UnionLoop form rejects")
    // one above: both complete with the full 4 rows
    assert(runWith(4, doubling = false) == Right(4))
    assert(runWith(4, doubling = true) == Right(4))
  }

  test("compactRun: folds committed waves, queries identical, waves keep working") {
    import graft.operators.PrepareRun
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val bench = docs.filter(col("doc_id") % 37 === 0)
      .select(col("doc_id"), col("text")).limit(5)
    val c1 = docs.filter(col("doc_id") % 4 === 0)
    val w1 = docs.filter(col("doc_id") % 4 === 1)
    val w2 = docs.filter(col("doc_id") % 4 === 2)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-prep-compact").toString
    PrepareRun.run(spark, c1, bench, tmp,
      minTokens = 10, threshold = 0.5, capacity = 512, valPct = 10)
    val mw1 = PrepareRun.runWave(spark, w1, tmp, 1).toMap
    PrepareRun.runWave(spark, w2, tmp, 2)

    def tableRows(t: String): Set[Seq[Any]] = {
      val df = spark.read.parquet(s"$tmp/$t")
      val cols = df.columns.filter(_ != "wave").sorted
      df.select(cols.map(col).toSeq: _*).collect().map(_.toSeq).toSet
    }
    val tables = Seq("train_docs", "val_docs", "train_spans", "dedup_index")
    val before = tables.map(t => t -> tableRows(t)).toMap

    val report = PrepareRun.compactRun(spark, tmp, targetBytes = 1L << 30)
    tables.foreach { t =>
      assert(report(t)._2 < report(t)._1,
        s"$t files did not drop: ${report(t)}")
      assert(tableRows(t) == before(t), s"$t rows changed under the fold")
      // everything folded into the single wave=0 partition
      val dirs = new java.io.File(s"$tmp/$t").listFiles()
        .filter(_.isDirectory).map(_.getName).toSet
      assert(dirs == Set("wave=0"), s"$t still has wave dirs: $dirs")
    }
    // wave markers re-homed into the compacted marker
    assert(!new java.io.File(s"$tmp/_stage_wave_1").exists())
    assert(new java.io.File(s"$tmp/_stage_compacted").exists())

    // replaying a FOLDED wave is an idempotent no-op with preserved
    // counts — never a duplicate-appending recompute
    val trainCount = spark.read.parquet(s"$tmp/train_docs").count()
    assert(PrepareRun.runWave(spark, w1, tmp, 1).toMap == mw1)
    assert(spark.read.parquet(s"$tmp/train_docs").count() == trainCount)

    // a NEW wave appends unchanged: epoch ranks continue per source,
    // span windows continue per lang, docs all land in wave=3
    val w3 = docs.filter(col("doc_id") % 4 === 3)
    val m3 = PrepareRun.runWave(spark, w3, tmp, 3).toMap
    assert(m3("train") > 0)
    val train = spark.read.parquet(s"$tmp/train_docs")
    val badRanks = train.groupBy("source")
      .agg(count(lit(1)).as("n"), min("epoch_rank").as("mn"),
        max("epoch_rank").as("mx"),
        countDistinct("epoch_rank").as("d"))
      .filter(!(col("mn") === 1 && col("mx") === col("n") &&
        col("d") === col("n")))
    assert(badRanks.count() == 0,
      "epoch ranks broke after compaction + append")
    val spans = spark.read.parquet(s"$tmp/train_spans")
    assert(spans.count() == train.count())
    val overlap = spans.filter(col("wave") === 0)
      .groupBy("lang").agg(max("end_window").as("base_max"))
      .join(spans.filter(col("wave") === 3)
        .groupBy("lang").agg(min("start_window").as("wave_min")), "lang")
      .filter(col("wave_min") <= col("base_max"))
    assert(overlap.count() == 0,
      "post-compaction wave reopened a folded pack window")

    // capture NOW: compaction below replaces the files this frame's
    // resolved listing points at
    val fullTrainCount = train.count()

    // a second compaction folds wave=3 too and keeps max_wave
    PrepareRun.compactRun(spark, tmp, targetBytes = 1L << 30)
    assert(PrepareRun.runWave(spark, w3, tmp, 3).toMap == m3)

    // crash inside the swap window: .old present, live missing —
    // recovered on the next run, rows intact
    val live = new java.io.File(s"$tmp/train_docs")
    assert(live.renameTo(new java.io.File(s"$tmp/train_docs.old")))
    spark.catalog.refreshByPath(tmp)
    val afterCrash = PrepareRun.compactRun(spark, tmp,
      targetBytes = 1L << 30)
    assert(afterCrash.contains("train_docs"))
    assert(spark.read.parquet(s"$tmp/train_docs").count() == fullTrainCount)
  }

  test("PrepareRun: a base recompute clears stale wave markers (no ghost waves)") {
    import graft.operators.PrepareRun
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val bench = docs.filter(col("doc_id") % 37 === 0)
      .select(col("doc_id"), col("text")).limit(5)
    val c1 = docs.filter(col("doc_id") % 2 === 0)
    val w1 = docs.filter(col("doc_id") % 2 === 1)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-prep-stale").toString
    PrepareRun.run(spark, c1, bench, tmp,
      minTokens = 10, threshold = 0.5, capacity = 512, valPct = 10)
    PrepareRun.runWave(spark, w1, tmp, 1)
    assert(new java.io.File(s"$tmp/_stage_wave_1").exists())

    // docs-front param change: the overwrite wipes wave partitions —
    // the stale wave marker and manifest must go with them
    PrepareRun.run(spark, c1, bench, tmp,
      minTokens = 12, threshold = 0.5, capacity = 512, valPct = 10)
    assert(!new java.io.File(s"$tmp/_stage_wave_1").exists(),
      "stale wave marker survived the base recompute")
    assert(!new java.io.File(s"$tmp/wave_manifest").exists())
    val dirs = new java.io.File(s"$tmp/train_docs").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("wave=0"))

    // the wave now REPLAYS (recompute, not a ghost no-op) and lands data
    val m = PrepareRun.runWave(spark, w1, tmp, 1).toMap
    assert(m("train") > 0)
    assert(spark.read.parquet(s"$tmp/train_docs")
      .filter(col("wave") === 1).count() == m("train"))

    // spans-only (capacity) recompute: wave markers cleared so waves
    // replay their spans under the new capacity; wave docs stay valid
    PrepareRun.run(spark, c1, bench, tmp,
      minTokens = 12, threshold = 0.5, capacity = 256, valPct = 10)
    assert(!new java.io.File(s"$tmp/_stage_wave_1").exists(),
      "wave marker survived a capacity-only recompute")
    val m2 = PrepareRun.runWave(spark, w1, tmp, 1).toMap
    assert(m2("train") == m("train"))
    // spans table is complete and duplicate-free: one row per train doc
    val train = spark.read.parquet(s"$tmp/train_docs")
    val spans = spark.read.parquet(s"$tmp/train_spans")
    assert(spans.count() == train.count(),
      "capacity recompute + replay duplicated or dropped spans")
  }

  test("semanticDedupWave: base + wave EQUALS the one-shot pass on the union") {
    import graft.operators.Similarity
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    // wave ids all ABOVE base ids: commit order == id order, so the
    // sequential pass must reproduce the one-shot x87 windowing exactly
    val base = e.filter(col("vec_id") < 250)
    val wave = e.filter(col("vec_id") >= 250)
    val tau = 0.3
    val (cents, remB, repsB) =
      Similarity.semanticDedupState(base, 128, 256, tau)
    val (remW, repsW) =
      Similarity.semanticDedupWave(wave, cents, repsB, 256, tau)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "cluster", "max_sim")
        .collect().map(_.toSeq).toSet
    val seqRemoval = rows(remB) ++ rows(remW)

    // one-shot reference over the union with the SAME centroids —
    // x87's exact windowed formula
    import org.apache.spark.sql.expressions.Window
    val asgU = Similarity.assignClusters(e, cents)
    val aside = asgU.withColumn("rnk", row_number().over(
        Window.partitionBy("cluster").orderBy("vec_id")))
      .filter(col("rnk") <= 256)
      .select(col("cluster"), col("vec_id").as("a_id"),
        col("embedding").as("a_emb"))
    val oneShot = aside.join(asgU, Seq("cluster"))
      .filter(col("a_id") < col("vec_id"))
      .withColumn("sim", graft.functions.VectorFunctions
        .vecCosine(col("a_emb"), col("embedding")))
      .groupBy("vec_id", "cluster")
      .agg(round(max("sim"), 6).as("max_sim"))
      .filter(col("max_sim") > tau)
    assert(rows(remB).nonEmpty && rows(remW).nonEmpty,
      "fixture produced no removals on one of the sides")
    assert(seqRemoval == rows(oneShot),
      "sequential wave pass diverged from the one-shot union pass")
    // the union windows agree too: base reps ∪ wave entrants == the
    // one-shot window
    val seqReps = repsB.select("cluster", "vec_id").collect()
      .map(_.toSeq).toSet ++
      repsW.select("cluster", "vec_id").collect().map(_.toSeq).toSet
    val oneShotReps = aside.select(col("cluster"), col("a_id"))
      .collect().map(_.toSeq).toSet
    assert(seqReps == oneShotReps)
  }

  test("assignClusters: literal and broadcast-join arms agree bit-for-bit") {
    import graft.operators.Similarity
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    // k chosen on BOTH sides of the 128 arm threshold with the same
    // centroid set is impossible — instead pin the join arm against the
    // literal arm by replicating the same 8 centroids 17x (136 > 128):
    // positions 0..7 are the literal arm's centroids, and the argmax's
    // lowest-id tie rule must pick exactly those (copies tie at equal
    // sim but carry HIGHER ids)
    val cents = Similarity.kmeansCentroids(e, 8, iters = 1)
    val literal = Similarity.assignClusters(e, cents)
      .select("vec_id", "cluster").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val replicated = Array.tabulate(136)(i => cents(i % 8))
    val joined = Similarity.assignClusters(e, replicated)
      .select("vec_id", "cluster").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(joined.size == literal.size)
    assert(joined == literal,
      "join-arm argmax diverged from the literal arm")
  }

  test("PrepareRun semantic stage: persisted state, immutable reps, no kept violations") {
    import graft.operators.{PrepareRun, Similarity}
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val corpus = docs.join(emb, "doc_id")
    val bench = docs.filter(col("doc_id") % 37 === 0)
      .select(col("doc_id"), col("text")).limit(5)
    val c1 = corpus.filter(col("doc_id") % 2 === 0)
    val w2 = corpus.filter(col("doc_id") % 2 === 1)
    val tau = 0.3
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-prep-sem").toString
    val mb = PrepareRun.run(spark, c1, bench, tmp, minTokens = 10,
      threshold = 0.5, capacity = 512, valPct = 10,
      semanticTau = tau).toMap
    assert(mb.contains("semantic_kept"))
    assert(mb("semantic_kept") < mb("dedup_survivors"),
      "semantic stage dropped nothing — fixture tau too high")

    def repSnap(): Map[String, Long] = {
      val d = new java.io.File(s"$tmp/semantic_reps/wave=0")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.length()).toMap
    }
    val baseReps = repSnap()
    val mw = PrepareRun.runWave(spark, w2, tmp, 1).toMap
    assert(mw.contains("semantic_kept"))
    assert(mw("semantic_kept") <= mw("cross_corpus_kept"))
    assert(repSnap() == baseReps, "wave touched committed wave-0 reps")

    // rep ranks stay contiguous per cluster across the append
    val reps = spark.read.parquet(s"$tmp/semantic_reps")
    val badRanks = reps.groupBy("cluster")
      .agg(count(lit(1)).as("n"), min("rep_rank").as("mn"),
        max("rep_rank").as("mx"), countDistinct("rep_rank").as("d"))
      .filter(!(col("mn") === 1 && col("mx") === col("n") &&
        col("d") === col("n")))
    assert(badRanks.count() == 0, "rep ranks not contiguous per cluster")

    // NO kept doc has an earlier-committed window neighbor above tau
    // under the persisted clustering — the semantic invariant over the
    // final outputs
    val cents = spark.read.parquet(s"$tmp/semantic_centroids")
      .orderBy("cluster").select("centroid").collect()
      .map(_.getSeq[Float](0).toArray)
    val kept = spark.read.parquet(s"$tmp/train_docs")
      .select("doc_id", "wave")
      .union(spark.read.parquet(s"$tmp/val_docs").select("doc_id", "wave"))
      .join(corpus.select("doc_id", "embedding"), "doc_id")
    val keptAsg = Similarity.assignClusters(
      kept.select(col("doc_id").as("vec_id"), col("embedding")), cents)
      .join(kept.select(col("doc_id").as("vec_id"), col("wave")), "vec_id")
    val violations = spark.read.parquet(s"$tmp/semantic_reps")
      .select(col("cluster"), col("vec_id").as("r_id"),
        col("embedding").as("r_emb"), col("wave").as("r_wave"))
      .join(keptAsg, Seq("cluster"))
      .filter(col("r_wave") < col("wave") ||
        (col("r_wave") === col("wave") && col("r_id") < col("vec_id")))
      .withColumn("sim", round(graft.functions.VectorFunctions
        .vecCosine(col("r_emb"), col("embedding")), 6))
      .filter(col("sim") > tau)
    assert(violations.count() == 0,
      "a kept doc has an earlier committed neighbor above tau")

    // marker discipline: same tau is a front no-op (committed front
    // counts served from the marker; train/val/spans totals now include
    // the wave); a different tau clears the wave state and recomputes
    val rerun = PrepareRun.run(spark, c1, bench, tmp, minTokens = 10,
      threshold = 0.5, capacity = 512, valPct = 10,
      semanticTau = tau).toMap
    Seq("input", "quality_pass", "dedup_survivors", "semantic_kept",
      "decontaminated").foreach(k => assert(rerun(k) == mb(k), k))
    assert(new java.io.File(s"$tmp/_stage_wave_1").exists())
    PrepareRun.run(spark, c1, bench, tmp, minTokens = 10,
      threshold = 0.5, capacity = 512, valPct = 10, semanticTau = 0.5)
    assert(!new java.io.File(s"$tmp/_stage_wave_1").exists(),
      "tau change kept the stale wave marker")
  }

  test("compactRun folds semantic_reps; post-fold waves keep the semantic invariant") {
    import graft.operators.{PrepareRun, Similarity}
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val corpus = docs.join(emb, "doc_id")
    val bench = docs.filter(col("doc_id") % 37 === 0)
      .select(col("doc_id"), col("text")).limit(5)
    val c1 = corpus.filter(col("doc_id") % 3 === 0)
    val w1 = corpus.filter(col("doc_id") % 3 === 1)
    val w2 = corpus.filter(col("doc_id") % 3 === 2)
    val tau = 0.3
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-sem-compact").toString
    PrepareRun.run(spark, c1, bench, tmp, minTokens = 10,
      threshold = 0.5, capacity = 512, valPct = 10, semanticTau = tau)
    val mw1 = PrepareRun.runWave(spark, w1, tmp, 1).toMap
    assert(mw1.contains("semantic_kept"))

    def repRows() = spark.read.parquet(s"$tmp/semantic_reps")
      .select("cluster", "rep_rank", "vec_id").collect()
      .map(_.toSeq).toSet
    val before = repRows()
    val report = PrepareRun.compactRun(spark, tmp, targetBytes = 1L << 30)
    assert(report.contains("semantic_reps"))
    assert(repRows() == before, "fold changed the rep window")
    // folded wave replay stays a no-op with semantic counts preserved
    assert(PrepareRun.runWave(spark, w1, tmp, 1).toMap == mw1)

    // a post-fold wave still extends the pass against the (now wave=0)
    // reps: rep ranks stay contiguous and no kept doc violates tau
    val mw2 = PrepareRun.runWave(spark, w2, tmp, 2).toMap
    assert(mw2.contains("semantic_kept"))
    val reps = spark.read.parquet(s"$tmp/semantic_reps")
    val badRanks = reps.groupBy("cluster")
      .agg(count(lit(1)).as("n"), min("rep_rank").as("mn"),
        max("rep_rank").as("mx"), countDistinct("rep_rank").as("d"))
      .filter(!(col("mn") === 1 && col("mx") === col("n") &&
        col("d") === col("n")))
    assert(badRanks.count() == 0,
      "rep ranks broke across the fold + append")
    // rep_rank is the fold-INVARIANT commit order (waves append ranks
    // after each cluster's committed count, and the fold preserves
    // values): a kept doc must have no same-cluster rep with a LOWER
    // rank above tau. Every kept doc here sits inside the repCap
    // window, so its own rank is its reps row — assert that coverage
    // so the invariant actually checks everything.
    val kept = spark.read.parquet(s"$tmp/train_docs").select("doc_id")
      .union(spark.read.parquet(s"$tmp/val_docs").select("doc_id"))
    val keptRanked = kept
      .join(reps.select(col("vec_id").as("doc_id"), col("cluster"),
        col("rep_rank"), col("embedding")), "doc_id")
    assert(keptRanked.count() == kept.count(),
      "a kept doc fell outside the rep window — widen the invariant")
    val violations = reps
      .select(col("cluster"), col("rep_rank").as("r_rank"),
        col("embedding").as("r_emb"))
      .join(keptRanked, Seq("cluster"))
      .filter(col("r_rank") < col("rep_rank"))
      .withColumn("sim", round(graft.functions.VectorFunctions
        .vecCosine(col("r_emb"), col("embedding")), 6))
      .filter(col("sim") > tau)
    assert(violations.count() == 0,
      "post-fold kept doc has an earlier-committed neighbor above tau")
  }

  test("semanticDedupIngest: per-batch flags equal the batch operator, replay-idempotent") {
    import graft.operators.Similarity
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val base = e.filter(col("vec_id") < 300)
    val tau = 0.3
    val (cents, _, reps) = Similarity.semanticDedupState(base, 128, 256, tau)
    val w1 = e.filter(col("vec_id") >= 300 && col("vec_id") < 400)
    val w2 = e.filter(col("vec_id") >= 400)
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "cluster", "max_sim")
        .collect().map(_.toSeq).toSet
    val exp1 = rowsOf(Similarity.semanticDedupWave(w1, cents, reps,
      256, tau)._1)
    val exp2 = rowsOf(Similarity.semanticDedupWave(w2, cents, reps,
      256, tau)._1)
    assert(exp1.nonEmpty && exp2.nonEmpty, "fixture flags nothing")

    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])]
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-sem-stream").toString
    val q = graft.streaming.StreamingAnalytics.semanticDedupIngest(
      in.toDF().toDF("doc_id", "embedding"), cents, reps, "doc_id",
      s"$tmp/out", s"$tmp/ckpt", tau = tau)
    try {
      def feed(df: org.apache.spark.sql.DataFrame): Unit = {
        in.addData(df.collect().map(r =>
          (r.getLong(0), r.getSeq[Float](1))).toSeq)
        q.processAllAvailable()
      }
      feed(w1); feed(w2)
      val out = spark.read.parquet(s"$tmp/out")
      assert(rowsOf(out.filter(col("wave") === 0)) == exp1)
      assert(rowsOf(out.filter(col("wave") === 1)) == exp2)
      // flags-only: the reps the server dedups against never grew —
      // each batch flags against the COMMITTED state, not prior batches
      assert(rowsOf(out) == (exp1 ++ exp2))
    } finally q.stop()
  }

  test("mp4/fmp4: composition offsets (B-frame pts) round-trip, v1 signed") {
    import graft.operators.Multimodal
    import spark.implicits._
    // closed-GOP B-frame shape with a NEGATIVE offset (v1 signedness):
    // decode I P B -> display I B P: cts = {0, +d, -d}
    val cts = Array(0, 3000, -3000, 0, 3000, -3000)
    val sizes = Array(20, 21, 22, 23, 24, 25)
    val durs = Array.fill(6)(3000)
    val moov = Multimodal.mp4Bytes(16, 16, sizes,
      Array((6, 3000)), syncs = Array(1, 4), seed = 8L,
      ctsOffsets = cts)
    val frag = Multimodal.mp4FragmentedBytes(16, 16, sizes, durs,
      seed = 8L, samplesPerFragment = 3, ctsOffsets = cts)
    for ((bytes, nm) <- Seq((moov, "moov"), (frag, "frag"))) {
      val v = Multimodal.parseMp4(bytes).video
      assert(v.ctsOffsets.toSeq ==
        Seq(0L, 3000L, -3000L, 0L, 3000L, -3000L), nm)
      val st = Multimodal.mp4SampleTable(spark,
          Seq((1L, bytes)).toDF("doc_id", "content"))
        .orderBy("sample_idx")
        .select("dts", "pts").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // pts order differs from dts order — the B-frame reorder is real
      assert(st.toSeq == Seq((0L, 0L), (3000L, 6000L), (6000L, 3000L),
        (9000L, 9000L), (12000L, 15000L), (15000L, 12000L)), nm)
    }
    // no ctts -> pts == dts (the r13 default preserved)
    val plain = Multimodal.mp4Bytes(16, 16, Array(20, 21),
      Array((2, 3000)), syncs = Array(1), seed = 2L)
    val pv = Multimodal.parseMp4(plain).video
    assert(pv.ctsOffsets.isEmpty)
  }

  test("WebVTT parser: real grammar (identifiers, NOTE blocks), loud failures") {
    import graft.operators.Multimodal
    // spec-shaped file with optional cue identifiers and a NOTE block —
    // both must parse/skip per the WebVTT grammar
    val vtt = """WEBVTT
                |
                |NOTE this block is a comment
                |
                |intro
                |00:00:01.000 --> 00:00:02.500
                |hello there
                |world
                |
                |00:01:00.250 --> 00:01:03.000
                |second cue""".stripMargin
    val cues = Multimodal.parseVtt(vtt)
    assert(cues == Seq((1000L, 2500L, "hello there world"),
      (60250L, 63000L, "second cue")))
    // the real-file forms: UTF-8 BOM, hour-less timestamps, trailing
    // cue settings, and a cue IDENTIFIER that merely starts with NOTE
    val real = "﻿WEBVTT\n\n" +
      "01:05.000 --> 01:07.250 align:start position:0%\nshort form\n\n" +
      "NOTEBOOK intro\n00:00:01.000 --> 00:00:02.000\nnot a comment"
    assert(Multimodal.parseVtt(real) == Seq(
      (65000L, 67250L, "short form"),
      (1000L, 2000L, "not a comment")))
    // missing header, malformed timing, and end-before-start all fail
    intercept[IllegalArgumentException] {
      Multimodal.parseVtt("00:00:01.000 --> 00:00:02.000\nx")
    }
    intercept[IllegalArgumentException] {
      Multimodal.parseVtt("WEBVTT\n\n00:00:01 --> 00:00:02.000\nx")
    }
    intercept[IllegalArgumentException] {
      Multimodal.parseVtt("WEBVTT\n\n00:00:03.000 --> 00:00:02.000\nx")
    }
  }

  test("mp4: edit lists shift the presented timeline (pre-roll trim + delay)") {
    import graft.operators.Multimodal
    import spark.implicits._
    val sizes = Array(20, 21, 22)
    def ptsOf(bytes: Array[Byte]): Seq[Long] =
      Multimodal.mp4SampleTable(spark,
          Seq((1L, bytes)).toDF("doc_id", "content"))
        .orderBy("sample_idx").select("pts")
        .collect().map(_.getLong(0)).toSeq
    // media_time trim: presentation starts 3000 media ticks in
    val trimmed = Multimodal.mp4Bytes(16, 16, sizes, Array((3, 3000)),
      Array(1), seed = 5L, editMediaTime = 3000)
    assert(ptsOf(trimmed) == Seq(-3000L, 0L, 3000L))
    // leading empty edit: 50 movie ticks (timescale 1000) delay the
    // media by 50 * 90000/1000 = 4500 media ticks
    val delayed = Multimodal.mp4Bytes(16, 16, sizes, Array((3, 3000)),
      Array(1), seed = 5L, editDelayMovie = 50)
    assert(ptsOf(delayed) == Seq(4500L, 7500L, 10500L))
    // both together, through the FRAGMENTED writer (trim only — elst
    // sits in moov either way)
    val fragTrim = Multimodal.mp4FragmentedBytes(16, 16, sizes,
      Array(3000, 3000, 3000), seed = 5L, samplesPerFragment = 2,
      editMediaTime = 3000, editDelayMovie = 50)
    assert(ptsOf(fragTrim) == Seq(1500L, 4500L, 7500L))
    // multi-segment lists have no single shift — loud reject: patch the
    // empty edit's media_time from -1 to 0 (two media edits)
    val mutated = delayed.clone()
    val at = mutated.toSeq.indexOfSlice("elst".getBytes("US-ASCII").toSeq)
    assert(at >= 0)
    java.nio.ByteBuffer.wrap(mutated).putInt(at + 16, 0)
    val v = Multimodal.parseMp4(mutated).video
    val ex = intercept[IllegalArgumentException] {
      Multimodal.editShift(1000L, v)
    }
    assert(ex.getMessage.contains("unsupported edit list"))
    // rate != 1.0 rejected where timestamps are EMITTED (the consumed
    // track), not at parse — an exotic audio edit must not kill a file
    val rated = delayed.clone()
    java.nio.ByteBuffer.wrap(rated).putInt(at + 20, 0x00020000)
    val rv = Multimodal.parseMp4(rated).video // parse itself succeeds
    val rex = intercept[IllegalArgumentException] {
      Multimodal.editShift(1000L, rv)
    }
    assert(rex.getMessage.contains("rate"))
  }

  test("mp4: absent stss means EVERY sample is sync (ISO 14496-12 §8.6.2)") {
    import graft.operators.Multimodal
    import spark.implicits._
    // all-intra fixture: the writer omits the stss box when syncs is
    // empty — exactly the file shape intra-only encoders produce
    val noStss = Multimodal.mp4Bytes(32, 48, Array(20, 21, 22),
      Array((3, 3000)), syncs = Array.empty, seed = 5L)
    val withStss = Multimodal.mp4Bytes(32, 48, Array(20, 21, 22),
      Array((3, 3000)), syncs = Array(1, 3), seed = 5L)
    val media = Seq((1L, noStss), (2L, withStss)).toDF("doc_id", "content")
    val rows = Multimodal.mp4SampleTable(spark, media)
      .select("doc_id", "sample_idx", "is_sync")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
      .toSet
    assert(rows == Set((1L, 0, true), (1L, 1, true), (1L, 2, true),
      (2L, 0, true), (2L, 1, false), (2L, 2, true)))

    // a PRESENT-but-EMPTY stss is the exact inverse: NO sample is a
    // seek point (ISO entry_count 0) — presence, not emptiness, is
    // what restricts the sync set
    val emptied = withStss.clone()
    val at = emptied.toSeq.indexOfSlice("stss".getBytes("US-ASCII").toSeq)
    assert(at >= 0)
    java.nio.ByteBuffer.wrap(emptied).putInt(at + 8, 0) // entry_count=0
    val m = Multimodal.parseMp4(emptied)
    assert(m.video.hasStss && m.video.syncs.isEmpty)
    val noneSync = Multimodal.mp4SampleTable(spark,
        Seq((3L, emptied)).toDF("doc_id", "content"))
      .select("is_sync").collect().map(_.getBoolean(0))
    assert(noneSync.length == 3 && noneSync.forall(_ == false))
  }
}
