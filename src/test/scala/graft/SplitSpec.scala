package graft

import graft.operators.Split
import graft.operators.Split.SplitConfig
import graft.sources.{LogDataGenerator, Readers}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** M2 Split mode: size-bounded line-aligned shards, header propagation,
  * gzip output, zip-first-entry input, idempotent replay, B5/B6 tracking.
  */
class SplitSpec extends GraftSparkSpec {
  import spark.implicits._

  private lazy val tmp = Files.createTempDirectory("graft-split").toString

  private def writeLanding(n: Long, dir: String): Unit =
    LogDataGenerator.toCsvLines(LogDataGenerator.generate(spark, n))
      .coalesce(1).write.mode("overwrite").text(dir)

  test("split produces line-aligned shards bounded by maxBytes + one line") {
    writeLanding(3000, s"$tmp/landing1")
    val manifest = Split.run(spark, s"$tmp/landing1/*.txt", s"$tmp/shards1",
      SplitConfig(maxBytesPerShard = 64 * 1024))
    val shards = manifest.collect()
    assert(shards.length > 2, "expected multiple shards")
    // shard naming
    assert(shards.forall(_.getAs[String]("dest_file").matches(".*-\\d{5}\\.txt")))
    // no row lost or duplicated
    val out = spark.read.text(s"$tmp/shards1/*.txt").select("value")
    val in = spark.read.text(s"$tmp/landing1/*.txt")
    assert(out.count() == 3000)
    assert(out.except(in).count() == 0 && in.except(out).count() == 0)
    // size bound: every shard <= max + longest line (~200B)
    assert(shards.forall(_.getAs[Long]("n_bytes") <= 64 * 1024 + 300))
    // exactly one last-shard marker
    assert(shards.count(_.getAs[Boolean]("is_last_shard")) == 1)
  }

  test("B5/B6 tracker queries over the manifest") {
    // segments on disk are append-only and carry no is_last_shard; the
    // reader derives it
    val manifest = Split.manifest(spark, s"$tmp/shards1")
    val sc = Split.shardCount(manifest).collect()
    assert(sc.length == 1)
    assert(sc(0).getAs[Int]("shard_count") == manifest.count())
    val card = Split.loadedCardinality(manifest).collect()(0)
    assert(card.getAs[Long]("total_records") == 3000L)
  }

  test("idempotent replay: second run writes nothing new") {
    val before = spark.read.parquet(s"$tmp/shards1/_manifest").count()
    Split.run(spark, s"$tmp/landing1/*.txt", s"$tmp/shards1",
      SplitConfig(maxBytesPerShard = 64 * 1024))
    val after = spark.read.parquet(s"$tmp/shards1/_manifest").count()
    assert(before == after)
    assert(spark.read.text(s"$tmp/shards1/*.txt").count() == 3000)
  }

  test("first-wins commit: a committed shard survives a racing re-run untouched") {
    // simulate a zombie/speculative attempt racing committed output: wipe
    // the manifest (so the anti-join re-processes every shard) and re-run.
    // Every attempt's rename must LOSE against the committed dest and drop
    // its own tmp — the committed file is never deleted, not even
    // transiently. mtime is the witness: delete-then-rename would refresh
    // it; first-wins leaves the original inode untouched.
    val landing = s"$tmp/landing-race"
    val out = s"$tmp/shards-race"
    writeLanding(2000, landing)
    Split.run(spark, s"$landing/*.txt", out, SplitConfig(maxBytesPerShard = 64 * 1024))
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".txt"))
    assert(files.length > 1)
    val mtimes = files.map(f => f.getName -> f.lastModified()).toMap
    Thread.sleep(1100) // ensure a rewrite would move mtime past fs granularity

    // wipe the manifest: the re-run sees no committed shards and re-attempts all
    val fs = new org.apache.hadoop.fs.Path(s"$out/_manifest")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$out/_manifest"), true)
    Split.run(spark, s"$landing/*.txt", out, SplitConfig(maxBytesPerShard = 64 * 1024))

    val after = new java.io.File(out).listFiles().filter(_.getName.endsWith(".txt"))
    assert(after.map(_.getName).toSet == mtimes.keySet, "file set must not change")
    after.foreach { f =>
      assert(f.lastModified() == mtimes(f.getName),
        s"${f.getName} was rewritten — committed output must survive a losing attempt")
    }
    // losing attempts cleaned their tmp files
    assert(!new java.io.File(out).listFiles().exists(_.getName.startsWith("_tmp_")))
    assert(spark.read.text(s"$out/*.txt").count() == 2000)
  }

  test("header is propagated to every shard and not duplicated as data") {
    val withHeader = Seq("id,level,text") ++ (1 to 500).map(i => s"$i,Info,row$i")
    Files.write(Paths.get(s"$tmp/hdr.csv"),
      withHeader.mkString("", "\n", "\n").getBytes("UTF-8"))
    val manifest = Split.run(spark, s"$tmp/hdr.csv", s"$tmp/shards-hdr",
      SplitConfig(maxBytesPerShard = 2048, hasHeader = true))
    val nShards = manifest.count()
    assert(nShards > 1)
    val all = spark.read.text(s"$tmp/shards-hdr/*.txt")
    // every shard starts with the header
    assert(all.filter($"value" === "id,level,text").count() == nShards)
    assert(all.count() == 500 + nShards)
  }

  test("gzip output shards round-trip") {
    writeLanding(500, s"$tmp/landing-gz")
    Split.run(spark, s"$tmp/landing-gz/*.txt", s"$tmp/shards-gz",
      SplitConfig(maxBytesPerShard = 16 * 1024, gzipOutput = true))
    val files = new java.io.File(s"$tmp/shards-gz").listFiles()
      .filter(_.getName.endsWith(".txt.gz"))
    assert(files.nonEmpty)
    val out = spark.read.text(s"$tmp/shards-gz/*.txt.gz")
    assert(out.count() == 500)
  }

  test("gzip INPUT is split natively (codec-aware read)") {
    writeLanding(400, s"$tmp/landing-gzin-plain")
    // re-write compressed
    spark.read.text(s"$tmp/landing-gzin-plain/*.txt")
      .coalesce(1).write.mode("overwrite")
      .option("compression", "gzip").text(s"$tmp/landing-gzin")
    val manifest = Split.run(spark, s"$tmp/landing-gzin/*.txt.gz", s"$tmp/shards-gzin",
      SplitConfig(maxBytesPerShard = 8 * 1024))
    assert(spark.read.text(s"$tmp/shards-gzin/*.txt").count() == 400)
    // offsets within gz files are compressed-stream positions; shards still
    // line-aligned and complete (the guarantee that matters)
    assert(manifest.agg(sum("n_records")).collect()(0).getLong(0) == 400L)
  }

  test("zip input: only the first entry is read (reference semantics)") {
    val zipPath = s"$tmp/two-entries.zip"
    val zout = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(zipPath))
    zout.putNextEntry(new java.util.zip.ZipEntry("first.txt"))
    zout.write("a1\na2\na3\n".getBytes("UTF-8")); zout.closeEntry()
    zout.putNextEntry(new java.util.zip.ZipEntry("second.txt"))
    zout.write("b1\nb2\n".getBytes("UTF-8")); zout.closeEntry()
    zout.close()
    val lines = Readers.zipFirstEntryLines(spark, zipPath)
    assert(lines.select("value").as[String].collect().sorted.toSeq == Seq("a1", "a2", "a3"))
  }

  test("empty input produces no shards") {
    Files.write(Paths.get(s"$tmp/empty.txt"), Array.emptyByteArray)
    val manifest = Split.run(spark, s"$tmp/empty.txt", s"$tmp/shards-empty")
    assert(manifest.count() == 0)
    val outFiles = Option(new java.io.File(s"$tmp/shards-empty").listFiles())
      .getOrElse(Array.empty).filter(_.getName.endsWith(".txt"))
    assert(outFiles.isEmpty)
  }
}
