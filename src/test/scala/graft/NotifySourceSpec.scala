package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.operators.PartitionConfig
import graft.sources.LogDataGenerator
import graft.streaming.{NotifyMicroBatchStream, NotifyOffset, NotifyQueue, StreamingPrePartition}
import org.apache.spark.sql.streaming.Trigger

/** The file-notification streaming source: event-driven triggering whose
  * per-trigger cost is independent of landing-dir history (the built-in
  * file source re-lists the landing dir every trigger).
  */
class NotifySourceSpec extends GraftSparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft-notify").toString

  private def writeBlob(path: String, lines: Seq[String], gzip: Boolean = false): Unit = {
    val raw = new java.io.FileOutputStream(path)
    val out = if (gzip) new java.util.zip.GZIPOutputStream(raw) else raw
    out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    out.close()
  }

  test("notify source: published blobs stream through; checkpoint restart is exact") {
    val queue = s"$tmp/queue"
    val blobs = s"$tmp/blobs"
    new java.io.File(blobs).mkdirs()

    writeBlob(s"$blobs/a.txt", Seq("a1", "a2", "a3"))
    writeBlob(s"$blobs/b.txt.gz", Seq("b1", "b2"), gzip = true)
    val s0 = NotifyQueue.publish(spark, queue, Seq(s"$blobs/a.txt"))
    val s1 = NotifyQueue.publish(spark, queue, Seq(s"$blobs/b.txt.gz"), seqHint = s0 + 1)
    assert(s0 == 0L && s1 == 1L)

    // foreachBatch sink (supports checkpoint recovery, unlike memory sink)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def startQ() = spark.readStream.format("graft-notify")
      .option("queueDir", queue).load()
      .writeStream
      .option("checkpointLocation", s"$tmp/ckpt-mem")
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r => seen.add(r.getString(0)))
      }
      .start()

    val q = startQ()
    q.processAllAvailable()
    assert(seen.iterator().asScala.toSet == Set("a1", "a2", "a3", "b1", "b2"),
      "gzip + plain blobs decoded")

    // a new notification lands mid-stream
    writeBlob(s"$blobs/c.txt", Seq("c1"))
    NotifyQueue.publish(spark, queue, Seq(s"$blobs/c.txt"), seqHint = 2)
    q.processAllAvailable()
    q.stop()
    assert(seen.size() == 6)

    // restart from the checkpoint: nothing replays, later publishes resume
    writeBlob(s"$blobs/d.txt", Seq("d1", "d2"))
    NotifyQueue.publish(spark, queue, Seq(s"$blobs/d.txt"), seqHint = 3)
    seen.clear()
    val q2 = startQ()
    q2.processAllAvailable()
    q2.stop()
    assert(seen.iterator().asScala.toSet == Set("d1", "d2"),
      s"restart must resume after seq 2, got ${seen.iterator().asScala.toSet}")
  }

  test("cold start on a not-yet-created queue dir: no crash, later publishes flow") {
    val queue = s"$tmp/queue-cold" // deliberately never mkdir'd
    val blobs = s"$tmp/blobs-cold"
    new java.io.File(blobs).mkdirs()
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val q = spark.readStream.format("graft-notify")
      .option("queueDir", queue).load()
      .writeStream
      .option("checkpointLocation", s"$tmp/ckpt-cold")
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r => seen.add(r.getString(0)))
      }
      .start()
    q.processAllAvailable() // empty queue, nonexistent dir: a clean no-op
    assert(seen.isEmpty)
    writeBlob(s"$blobs/late.txt", Seq("l1", "l2"))
    NotifyQueue.publish(spark, queue, Seq(s"$blobs/late.txt")) // creates the dir
    q.processAllAvailable()
    q.stop()
    assert(seen.iterator().asScala.toSet == Set("l1", "l2"))
  }

  test("publish rejects a gap-creating seqHint (consumer would stall at the gap)") {
    val queue = s"$tmp/queue-hint"
    // empty queue + hint far ahead: must claim seq 0, not seq 50
    assert(NotifyQueue.publish(spark, queue, Seq("a"), seqHint = 50) == 0L)
    // hint exactly at the tail is accepted
    assert(NotifyQueue.publish(spark, queue, Seq("b"), seqHint = 1) == 1L)
    // stale hint (already claimed) walks forward
    assert(NotifyQueue.publish(spark, queue, Seq("c"), seqHint = 0) == 2L)
  }

  test("probe cost is O(1) per idle trigger with 10k+ processed notifications") {
    val queue = s"$tmp/queue-big"
    new java.io.File(queue).mkdirs()
    // 10k already-processed notifications (bulk-created directly; the
    // protocol only needs the seq-named files to exist)
    (0 until 10000).foreach { i =>
      Files.write(Paths.get(queue, f"n-$i%012d"), "x\n".getBytes("UTF-8"))
    }
    val stream = new NotifyMicroBatchStream(queue, maxPerTrigger = 16)
    // restart state: the checkpoint says seq 9999 is committed
    stream.deserializeOffset("""{"seq":9999}""")

    def latest() = stream.latestOffset(
      stream.initialOffset(), stream.getDefaultReadLimit)
    val before = stream.probeCount
    val off1 = latest().asInstanceOf[NotifyOffset]
    assert(off1.seq == 9999L)
    assert(stream.probeCount - before == 1,
      s"idle trigger must cost exactly ONE exists-probe over 10k processed " +
        s"files, got ${stream.probeCount - before}")

    // 3 new notifications -> exactly 4 probes (3 hits + 1 miss), and the
    // bodies resolve to partitions
    val blob = s"$tmp/probe-blob.txt"
    writeBlob(blob, Seq("p1", "p2"))
    (10000 until 10003).foreach { i =>
      Files.write(Paths.get(queue, f"n-$i%012d"), s"$blob\n".getBytes("UTF-8"))
    }
    val mid = stream.probeCount
    val off2 = latest().asInstanceOf[NotifyOffset]
    assert(off2.seq == 10002L)
    assert(stream.probeCount - mid == 4,
      s"3 new notifications must cost 4 probes, got ${stream.probeCount - mid}")
    val parts = stream.planInputPartitions(off1, off2)
    assert(parts.length == 3)
  }

  test("notified SPLIT pipeline: paths mode feeds Split, manifest dedups replays") {
    val queue = s"$tmp/queue-split"
    val out = s"$tmp/shards-notify"
    val blobs = s"$tmp/blobs-split"
    new java.io.File(blobs).mkdirs()
    writeBlob(s"$blobs/one.txt", (1 to 500).map(i => s"line-$i"))
    writeBlob(s"$blobs/two.txt", (1 to 300).map(i => s"row-$i"))
    // ONE notification naming BOTH blobs: paths mode must flatten the
    // notification body into one partition per named blob
    NotifyQueue.publish(spark, queue, Seq(s"$blobs/one.txt", s"$blobs/two.txt"))

    val q = StreamingPrePartition.startNotifiedSplit(spark, queue, out,
      s"$tmp/ckpt-split", graft.operators.Split.SplitConfig(maxBytesPerShard = 4096),
      trigger = Trigger.ProcessingTime("1 second"))
    q.processAllAvailable()
    q.stop()
    assert(spark.read.text(s"$out/*.txt").count() == 800)
    val manifest = graft.operators.Split.manifest(spark, out)
    assert(manifest.select("source_file").distinct().count() == 2)

    // the same blob published AGAIN (duplicate event, at-least-once
    // delivery): Split's (source_file, shard) manifest makes it a no-op
    NotifyQueue.publish(spark, queue, Seq(s"$blobs/one.txt"), seqHint = 1)
    val q2 = StreamingPrePartition.startNotifiedSplit(spark, queue, out,
      s"$tmp/ckpt-split", graft.operators.Split.SplitConfig(maxBytesPerShard = 4096),
      trigger = Trigger.ProcessingTime("1 second"))
    q2.processAllAvailable()
    q2.stop()
    assert(spark.read.text(s"$out/*.txt").count() == 800, "duplicate event must not double data")
    assert(graft.operators.Split.manifest(spark, out).count() == manifest.count())
  }

  test("Trigger.AvailableNow drains the full backlog in rate-limited batches") {
    val queue = s"$tmp/queue-avail"
    val blobs = s"$tmp/blobs-avail"
    new java.io.File(blobs).mkdirs()
    // 10 blobs, maxFilesPerTrigger=3: AvailableNow must run ceil(10/3)
    // batches to the captured tail, then terminate on its own
    (0 until 10).foreach { i =>
      writeBlob(s"$blobs/b$i.txt", Seq(s"v$i"))
      NotifyQueue.publish(spark, queue, Seq(s"$blobs/b$i.txt"), seqHint = i)
    }
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val q = spark.readStream.format("graft-notify")
      // camelCase key deliberately: the rate limit must survive the
      // original-case properties map TableProvider.getTable receives
      .option("queueDir", queue).option("maxFilesPerTrigger", 3).load()
      .writeStream
      .option("checkpointLocation", s"$tmp/ckpt-avail")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.collect()
        rows.foreach(r => seen.add(r.getString(0)))
        if (rows.nonEmpty) batchSizes.add(rows.length)
        ()
      }
      .start()
    assert(q.awaitTermination(60000), "AvailableNow query must self-terminate")
    assert(seen.iterator().asScala.toSet == (0 until 10).map(i => s"v$i").toSet,
      s"full backlog must drain, got ${seen.size()} rows")
    // the rate limit must actually bite: 10 one-blob notifications at
    // maxFilesPerTrigger=3 is exactly ceil(10/3)=4 micro-batches of
    // 3+3+3+1 rows — a single 10-row batch means the option was dropped
    val sizes = batchSizes.iterator().asScala.toSeq
    assert(sizes.length == 4,
      s"expected ceil(10/3)=4 rate-limited micro-batches, got $sizes")
    assert(sizes.forall(_ <= 3), s"a batch exceeded maxFilesPerTrigger=3: $sizes")
  }

  test("spool claim mode: concurrent publishers on an overwrite-allowed (S3-like) FS lose nothing") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.owfs.impl", classOf[OverwriteAllowedFs].getName)
    val queue = s"owfs:$tmp/queue-spool"
    val fs = new org.apache.hadoop.fs.Path(queue).getFileSystem(conf)

    // sanity: the hazard this mode exists for — on this FS, rename onto an
    // EXISTING destination silently replaces it (what S3A's copy+delete
    // does), so the default rename-claim protocol would lose a racing
    // producer's notification without any error
    val hazardDir = new org.apache.hadoop.fs.Path(s"owfs:$tmp/hazard")
    fs.mkdirs(hazardDir)
    def put(p: org.apache.hadoop.fs.Path, s: String): Unit = {
      val o = fs.create(p, false); o.write(s.getBytes("UTF-8")); o.close()
    }
    val pA = new org.apache.hadoop.fs.Path(hazardDir, "a")
    val pB = new org.apache.hadoop.fs.Path(hazardDir, "b")
    put(pA, "first"); put(pB, "second")
    assert(fs.rename(pB, pA), "S3-like rename must 'succeed' onto an existing dest")
    val in = fs.open(pA)
    val buf = new Array[Byte](64)
    val n = in.read(buf); in.close()
    assert(new String(buf, 0, n, "UTF-8") == "second", "silent overwrite simulated")

    // 16 blobs published from 4 concurrent producer threads via the spool
    // protocol: unique names, zero rename contention
    val blobs = s"$tmp/blobs-spool"
    new java.io.File(blobs).mkdirs()
    val expected = (0 until 16).map(i => s"spool-v$i")
    (0 until 16).foreach(i => writeBlob(s"$blobs/sb$i.txt", Seq(s"spool-v$i")))
    val threads = (0 until 4).map { t =>
      new Thread(() => (0 until 4).foreach { j =>
        NotifyQueue.publishSpool(spark, queue, Seq(s"$blobs/sb${t * 4 + j}.txt"))
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())

    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def drain(): Unit = {
      val q = spark.readStream.format("graft-notify")
        .option("queueDir", queue).option("claimMode", "spool").load()
        .writeStream
        .option("checkpointLocation", s"$tmp/ckpt-spool")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r => seen.add(r.getString(0)))
        }
        .start()
      assert(q.awaitTermination(60000), "AvailableNow query must self-terminate")
    }
    drain()
    assert(seen.iterator().asScala.toSeq.sorted == expected.sorted,
      s"every concurrently-published notification must arrive exactly once, " +
        s"got ${seen.size()} rows")
    // spool drained: sequenced entries left the spool dir (listing cost is
    // O(backlog), not O(history))
    val spoolLeft = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$queue/spool"))
      .count(_.getPath.getName.startsWith("u-"))
    assert(spoolLeft == 0, s"sequenced entries must leave the spool, $spoolLeft remain")

    // a second wave while the stream is down; restart sequences + resumes
    // exactly after the checkpointed offset — no replays, no losses
    writeBlob(s"$blobs/late.txt", Seq("spool-late"))
    NotifyQueue.publishSpool(spark, queue, Seq(s"$blobs/late.txt"))
    seen.clear()
    drain()
    assert(seen.iterator().asScala.toSeq == Seq("spool-late"),
      s"restart must resume after the sequenced wave, got ${seen.iterator().asScala.toSeq}")
  }

  test("spool sequencer crash mid-assignment: survivors re-sequence, no loss, no doubles") {
    val queue = s"$tmp/queue-spool-crash"
    val blobs = s"$tmp/blobs-spool-crash"
    new java.io.File(blobs).mkdirs()
    (0 until 3).foreach(i => writeBlob(s"$blobs/cb$i.txt", Seq(s"crash-v$i")))
    (0 until 3).foreach(i =>
      NotifyQueue.publishSpool(spark, queue, Seq(s"$blobs/cb$i.txt")))

    // simulate a sequencer that died after assigning exactly ONE entry:
    // perform the first rename by hand (the same (modTime, name) order the
    // real sequencer uses) and leave the other two in the spool
    val conf = spark.sparkContext.hadoopConfiguration
    val qp = new org.apache.hadoop.fs.Path(queue)
    val fs = qp.getFileSystem(conf)
    val spool = new org.apache.hadoop.fs.Path(qp, "spool")
    val pending = fs.listStatus(spool)
      .filter(_.getPath.getName.startsWith("u-"))
      .sortBy(f => (f.getModificationTime, f.getPath.getName))
    assert(pending.length == 3)
    assert(fs.rename(pending.head.getPath,
      new org.apache.hadoop.fs.Path(qp, "n-000000000000")))

    // the next trigger's sequencer picks up from the true tail (seq 0
    // already assigned) and assigns the two survivors — every
    // notification arrives exactly once
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val q = spark.readStream.format("graft-notify")
      .option("queueDir", queue).option("claimMode", "spool").load()
      .writeStream
      .option("checkpointLocation", s"$tmp/ckpt-spool-crash")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r => seen.add(r.getString(0)))
      }
      .start()
    assert(q.awaitTermination(60000))
    assert(seen.iterator().asScala.toSeq.sorted ==
      Seq("crash-v0", "crash-v1", "crash-v2"),
      s"crash recovery lost or doubled data: ${seen.iterator().asScala.toSeq}")
    assert(fs.listStatus(spool).count(_.getPath.getName.startsWith("u-")) == 0)
  }

  test("notified prepartition pipeline: end-to-end with idempotent staging") {
    val queue = s"$tmp/queue-pp"
    val staging = s"$tmp/staging-pp"
    val blobs = s"$tmp/blobs-pp"
    new java.io.File(blobs).mkdirs()
    val cfg = PartitionConfig(columnIndex = 3, maxPartitionCount = 4, seed = 17)

    LogDataGenerator.toCsvLines(LogDataGenerator.generate(spark, 400, seed = 3))
      .coalesce(1).write.mode("overwrite").text(s"$blobs/wave1")
    val files = new java.io.File(s"$blobs/wave1").listFiles()
      .filter(_.getName.endsWith(".txt")).map(_.toString).toSeq
    NotifyQueue.publish(spark, queue, files)

    val q = StreamingPrePartition.startNotified(spark, queue, staging,
      s"$tmp/ckpt-pp", cfg, trigger = Trigger.ProcessingTime("1 second"))
    q.processAllAvailable()
    q.stop()
    assert(spark.read.text(s"$staging/data").count() == 400)

    // restart: checkpointed offsets mean zero reprocessing
    val q2 = StreamingPrePartition.startNotified(spark, queue, staging,
      s"$tmp/ckpt-pp", cfg, trigger = Trigger.ProcessingTime("1 second"))
    q2.processAllAvailable()
    q2.stop()
    assert(spark.read.text(s"$staging/data").count() == 400)
  }
}
