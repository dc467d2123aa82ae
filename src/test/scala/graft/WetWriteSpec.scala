package graft

import graft.sources.WarcSource
import org.apache.spark.sql.functions._

/** WET export (writeWet): real files on disk, re-ingested by the
  * engine's own reader AND structure-checked by a foreign gunzip
  * (python's gzip walks the concatenated members), exactly-once commit.
  */
class WetWriteSpec extends GraftSparkSpec {

  private def docsDf(n: Int) = {
    import spark.implicits._
    (0 until n).map(i =>
        (i.toLong, s"host${i % 3}.example", s"doc $i body text " * (i % 5 + 1)))
      .toDF("doc_id", "source", "text")
  }

  test("wet-write: sharded member-per-record archives re-ingest losslessly") {
    val dir = java.nio.file.Files.createTempDirectory("wetw").toFile
    try {
      val docs = docsDf(40)
      val n = WarcSource.writeWet(docs, dir.getAbsolutePath, 4)
      assert(n === 40)
      // the local Hadoop FS adds .crc sidecars — ignore hidden files
      val files = dir.listFiles().map(_.getName)
        .filterNot(_.startsWith(".")).sorted
      assert(files.toSeq === Seq("part-00000.warc.wet.gz",
        "part-00001.warc.wet.gz", "part-00002.warc.wet.gz",
        "part-00003.warc.wet.gz"))
      // no torn tmp files left behind
      assert(!files.exists(_.startsWith("_tmp")))
      // own reader roundtrip: every doc back, text intact, source
      // reconstructed from the http-form URI
      val back = WarcSource.wetDocs(spark,
        dir.getAbsolutePath + "/*.warc.wet.gz")
      val got = back.select("source", "text").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      val want = docs.select("source", "text").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(got === want)
      // member-per-record layout: each record its own gzip member
      val f = WarcSource.parseWarc(java.nio.file.Files.readAllBytes(
        new java.io.File(dir, "part-00000.warc.wet.gz").toPath))
      assert(f.gzip && f.nMembers === f.records.size)
      assert(f.records.head.warcType === "warcinfo")
      assert(f.records.tail.forall(_.warcType === "conversion"))
      // conversion records in doc_id order within the shard
      val ids = f.records.tail.map(_.targetUri.split("/").last.toLong)
      assert(ids === ids.sorted && ids.forall(_ % 4 == 0))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("wet-write: a foreign gzip reader accepts the archives") {
    val dir = java.nio.file.Files.createTempDirectory("wetwf").toFile
    try {
      WarcSource.writeWet(docsDf(12), dir.getAbsolutePath, 2)
      val pb = new ProcessBuilder("python3", "-c",
        """import gzip, sys, glob
          |total_conv = 0
          |for fn in sorted(glob.glob(sys.argv[1] + '/*.gz')):
          |    raw = gzip.open(fn, 'rb').read()  # walks all members
          |    assert raw.startswith(b'WARC/1.0\r\n'), fn
          |    total_conv += raw.count(b'WARC-Type: conversion')
          |print(total_conv)""".stripMargin,
        dir.getAbsolutePath)
      pb.redirectErrorStream(true)
      val p = pb.start()
      p.getOutputStream.close()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      assert(p.waitFor() === 0, s"python failed: $out")
      assert(out.trim === "12")
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("wet-write: plain (uncompressed) arm and empty-source fallback") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wetp").toFile
    try {
      val docs = Seq((5L, "", "body five")).toDF("doc_id", "source", "text")
      WarcSource.writeWet(docs, dir.getAbsolutePath, 1, gzip = false)
      val f = WarcSource.parseWarc(java.nio.file.Files.readAllBytes(
        new java.io.File(dir, "part-00000.warc.wet").toPath))
      assert(!f.gzip && f.records.size === 2)
      // empty source lands in the .invalid reserved TLD, not a bare //
      assert(f.records(1).targetUri === "http://unknown.invalid/graft/5")
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }
}
