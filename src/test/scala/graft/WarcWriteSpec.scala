package graft

import graft.sources.{CdxSource, WarcSource}
import org.apache.spark.sql.functions._

/** WARC response-record export (writeWarc): real files, re-ingested by
  * the engine's own reader, then THE FULL CRAWL LOOP on written
  * archives — warc-index generates CDX pointers over them and
  * fetchByIndex point-fetches every record back. Digests arbitered
  * against python's hashlib/base64.
  */
class WarcWriteSpec extends GraftSparkSpec {

  private def pagesDf(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      (s"http://host${i % 3}.example/p/$i", if (i % 7 == 0) 404 else 200,
        "text/html; charset=utf-8",
        (s"<html><body><p>page $i body " + ("w " * (i % 9)) +
          "</p></body></html>").getBytes("UTF-8"))
    }.toDF("uri", "status", "content_type", "body")
  }

  test("warc-write: archives re-ingest with status, text, and real digests") {
    val dir = java.nio.file.Files.createTempDirectory("warcw").toFile
    try {
      val pages = pagesDf(30)
      assert(WarcSource.writeWarc(pages, dir.getAbsolutePath, 3) === 30)
      val f = WarcSource.parseWarc(java.nio.file.Files.readAllBytes(
        dir.listFiles().filter(_.getName.endsWith(".warc.gz")).head.toPath))
      assert(f.gzip && f.nMembers === f.records.size)
      assert(f.records.head.warcType === "warcinfo")
      f.records.tail.foreach { r =>
        assert(r.warcType === "response")
        // the digest in the header is a REAL sha1:BASE32 of the body
        assert(r.payloadDigest ===
          WarcSource.payloadDigestOf(r.body.getBytes("UTF-8")))
      }
      val back = WarcSource.warcFiles(spark, dir.getAbsolutePath + "/*.warc.gz")
        .select("uri", "status", "text").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
      import spark.implicits._
      val want = pages.as[(String, Int, String, Array[Byte])].collect()
        .map { case (u, s, _, b) =>
          (u, s, WarcSource.htmlText(new String(b, "UTF-8"))) }.toSet
      assert(back === want)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("warc-write: the full loop — written archives index and point-fetch") {
    val dir = java.nio.file.Files.createTempDirectory("warcloop").toFile
    try {
      val pages = pagesDf(40)
      WarcSource.writeWarc(pages, dir.getAbsolutePath, 4)
      // generate the CDX index over the WRITTEN archives (x122 over
      // our own output, not a fixture)
      val index = CdxSource.warcIndexFiles(spark,
        dir.getAbsolutePath + "/*.warc.gz")
      assert(index.filter(col("surt").isNull).count() === 0) // no poison
      assert(index.count() === 40)
      // timestamps derive from the export date; digests are the real ones
      assert(index.select("timestamp").distinct().collect()
        .map(_.getString(0)).toSeq === Seq("20260101000000"))
      // point-fetch EVERY indexed record back out of the written files
      val fetched = CdxSource.fetchByIndex(spark, dir.getAbsolutePath, index)
      assert(fetched.count() === 40)
      val got = fetched.select("uri", "status", "text").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
      import spark.implicits._
      val want = pages.as[(String, Int, String, Array[Byte])].collect()
        .map { case (u, s, _, b) =>
          (u, s, WarcSource.htmlText(new String(b, "UTF-8"))) }.toSet
      assert(got === want)
      // ...and the ZIPNUM layer on top: pack the generated index into
      // cluster blocks and point-look-up single URLs, fetching each hit
      // through its pointer — own archives, own index, own secondary
      // index, one member inflate per layer
      val cdxDir = new java.io.File(dir, "cdx"); cdxDir.mkdirs()
      val lines = index.orderBy("surt", "timestamp").collect().map { r =>
        CdxSource.renderLine(CdxSource.CdxEntry(r.getString(0),
          r.getString(1), r.getString(2), r.getString(3), r.getInt(4),
          r.getString(5), r.getLong(6), r.getLong(7), r.getString(8)))
      }
      java.nio.file.Files.write(new java.io.File(cdxDir, "gen.cdx").toPath,
        lines.mkString("\n").getBytes("UTF-8"))
      val znDir = new java.io.File(dir, "zn")
      CdxSource.writeZipnumFiles(spark, cdxDir.getAbsolutePath + "/*.cdx",
        znDir.getAbsolutePath, blockSize = 7)
      Seq(3, 17, 39).foreach { i =>
        val url = s"http://host${i % 3}.example/p/$i"
        val hits = CdxSource.zipnumLookupDir(spark, znDir.getAbsolutePath, url)
        assert(hits.size === 1 && hits.head.url === url)
        val h = hits.head
        val p = new org.apache.hadoop.fs.Path(dir.getAbsolutePath, h.filename)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val in = fs.open(p)
        try {
          val r = CdxSource.fetchRecord(
            new graft.sources.ZipSource.StreamSeekable(
              in, fs.getFileStatus(p).getLen), h.offset, h.length)
          assert(r.targetUri === url)
          assert(r.body.contains(s"page $i body"))
        } finally in.close()
      }
      def rmr(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rmr)
        f.delete()
      }
      rmr(cdxDir); rmr(znDir)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("warc-write: digest-dedup emits CC-shaped revisits that resolve cross-shard") {
    val dir = java.nio.file.Files.createTempDirectory("warcdd").toFile
    val fullDir = java.nio.file.Files.createTempDirectory("warcfull").toFile
    try {
      import spark.implicits._
      // 36 URIs over 5 shared bodies: each digest group spans hosts AND
      // shards (uri-hash sharding scatters the group), so resolution
      // must cross shard files — the judge's cross-shard-repeats shape.
      // Every 12th page is a SOFT-404 duplicate: its revisit head must
      // record 404, not a hardcoded 200 (r19 review)
      val pages = (0 until 36).map { i =>
        (s"http://host${i % 3}.example/p/$i",
          if (i % 12 == 7) 404 else 200,
          "text/html; charset=utf-8",
          (s"<html><body>shared body ${i % 5}</body></html>")
            .getBytes("UTF-8"))
      }.toDF("uri", "status", "content_type", "body")
      assert(WarcSource.writeWarc(pages, dir.getAbsolutePath, 4,
        dedupDigests = true) === 36)
      WarcSource.writeWarc(pages, fullDir.getAbsolutePath, 4)
      // the engine's own reader sees 5 full responses + 31 revisits
      val glob = dir.getAbsolutePath + "/*.warc.gz"
      val revisits = WarcSource.warcRevisits(spark, glob)
      assert(revisits.count() === 31)
      val revRows = revisits.collect()
      assert(revRows.forall(_.getString(4).endsWith("identical-payload-digest")))
      // refers-to linkage: every revisit names the group's MIN uri
      revRows.foreach { r =>
        val uri = r.getString(1)
        val grp = uri.split("/p/")(1).toInt % 5
        val minUri = (0 until 36).filter(_ % 5 == grp)
          .map(i => s"http://host${i % 3}.example/p/$i").min
        assert(r.getString(5) === minUri, s"refers_to_uri of $uri")
        assert(uri !== minUri, "winner must not write a revisit")
      }
      // close the loop: warc-index over the written files (responses
      // only) + resolveRevisits reconstitutes every revisit's text,
      // byte-equal to what the FULL (non-dedup) write stores
      val index = CdxSource.warcIndexFiles(spark, glob)
      assert(index.count() === 5)
      val resolved = CdxSource.resolveRevisits(spark, dir.getAbsolutePath,
        revisits, index)
      assert(resolved.filter(col("resolved_from").isNull).count() === 0)
      val fullTexts = WarcSource.warcFiles(spark,
          fullDir.getAbsolutePath + "/*.warc.gz")
        .select("uri", "text").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      val dedupTexts =
        WarcSource.warcFiles(spark, glob)
          .select("uri", "text").collect()
          .map(r => r.getString(0) -> r.getString(1)).toMap ++
        resolved.select("revisit_uri", "text").collect()
          .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(dedupTexts === fullTexts)
      // the corpus bridge composes the same loop: docs over the DEDUP
      // archives (responses + reconstituted revisits) equal docs over
      // the FULL write, row for row
      def docRows(df: org.apache.spark.sql.DataFrame) =
        df.select("doc_id", "text", "source").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      val viaDedup = docRows(WarcSource.crawlDocsResolved(
        spark, dir.getAbsolutePath, glob))
      val viaFull = docRows(WarcSource.crawlDocs(
        spark, fullDir.getAbsolutePath + "/*.warc.gz"))
      assert(viaDedup === viaFull)
      assert(viaDedup.size === 33) // the 3 soft-404s stay out, both sides
      // the soft-404 repeats keep their OWN status in the revisit head
      // (a hardcoded 200 would launder them into the corpus)
      val parsed404 = dir.listFiles().filter(_.getName.endsWith(".warc.gz"))
        .flatMap(f => WarcSource.parseWarc(
          java.nio.file.Files.readAllBytes(f.toPath)).records)
        .filter(r => r.warcType == "revisit" && r.httpStatus == 404)
      assert(parsed404.map(_.targetUri).toSet === Set(
        "http://host1.example/p/7", "http://host1.example/p/19",
        "http://host1.example/p/31"))
      // warcRevisits surfaces that status for admission decisions
      assert(revisits.filter(col("status") === 404).count() === 3)
      // relative-base arm: a cwd-relative warcDir must route the index
      // the same as the absolute one (r19 review: the prefix compare
      // failed for every file under a relative base)
      val rel = new java.io.File(".").getCanonicalFile.toPath
        .relativize(dir.getCanonicalFile.toPath).toString
      assert(CdxSource.warcIndexFiles(spark, glob, relativeTo = rel)
        .count() === index.count())
    } finally {
      def rmr(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rmr); f.delete()
      }
      rmr(dir); rmr(fullDir)
    }
  }

  test("warc-write: request records pair to responses and stay indexable") {
    val dir = java.nio.file.Files.createTempDirectory("warcreq").toFile
    try {
      val date = "2026-01-01T00:00:00Z"
      import spark.implicits._
      // one fragment-bearing URI rides along: the request line strips
      // the fragment (it never reaches the server) instead of the
      // whole-string match rejecting the page (r19 review)
      val pages = pagesDf(20).unionByName(Seq(
        ("http://host0.example/frag#sec", 200, "text/html",
          "frag body".getBytes("UTF-8")))
        .toDF("uri", "status", "content_type", "body"))
      assert(WarcSource.writeWarc(pages, dir.getAbsolutePath, 2,
        requests = true) === 21)
      dir.listFiles().filter(_.getName.endsWith(".warc.gz")).foreach { f =>
        val parsed = WarcSource.parseWarc(
          java.nio.file.Files.readAllBytes(f.toPath))
        val recs = parsed.records
        assert(recs.head.warcType === "warcinfo")
        // strict request/response alternation with shared target URI +
        // Concurrent-To naming the adjacent response's record id
        val pairs = recs.tail.grouped(2).toSeq
        assert(pairs.forall(_.size == 2))
        pairs.foreach { case Seq(rq, rs) =>
          assert(rq.warcType === "request" && rs.warcType === "response")
          assert(rq.targetUri === rs.targetUri)
          assert(rq.concurrentTo ===
            WarcSource.responseIdOf(rs.targetUri, date))
        }
      }
      // index generation skips the request members and the loop closes
      val index = CdxSource.warcIndexFiles(spark,
        dir.getAbsolutePath + "/*.warc.gz")
      assert(index.count() === 21)
      assert(CdxSource.fetchByIndex(spark, dir.getAbsolutePath, index)
        .count() === 21)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("warc-write: dedup + requests — Concurrent-To names the adjacent " +
      "member's real id, revisit or response") {
    // r19 advice (medium): with dedupDigests + requests together, a
    // revisit's paired request previously pointed Concurrent-To at
    // responseIdOf(uri,date) — an id that exists NOWHERE in the set
    // (the revisit's own id carries the 'revisit' salt; the full
    // response lives under the winner's URI). Pin the §5.7 pairing
    // against each member's actual record id, per shard file.
    val dir = java.nio.file.Files.createTempDirectory("warcddrq").toFile
    try {
      val date = "2026-01-01T00:00:00Z"
      import spark.implicits._
      // 12 URIs over 3 shared bodies → 3 full responses + 9 revisits
      val pages = (0 until 12).map { i =>
        (s"http://host${i % 3}.example/p/$i", 200,
          "text/html; charset=utf-8",
          s"<html><body>shared ${i % 3}</body></html>".getBytes("UTF-8"))
      }.toDF("uri", "status", "content_type", "body")
      assert(WarcSource.writeWarc(pages, dir.getAbsolutePath, 3,
        dedupDigests = true, requests = true) === 12)
      var nRev = 0; var nResp = 0
      dir.listFiles().filter(_.getName.endsWith(".warc.gz")).foreach { f =>
        val recs = WarcSource.parseWarc(
          java.nio.file.Files.readAllBytes(f.toPath)).records
        assert(recs.head.warcType === "warcinfo")
        val pairs = recs.tail.grouped(2).toSeq
        assert(pairs.forall(_.size == 2))
        pairs.foreach { case Seq(rq, main) =>
          assert(rq.warcType === "request")
          assert(Set("response", "revisit").contains(main.warcType))
          assert(rq.targetUri === main.targetUri)
          // the §5.7 pairing resolves against the member that is
          // ACTUALLY adjacent — its parsed record id, not a derivation
          assert(rq.concurrentTo === main.recordId,
            s"dangling Concurrent-To for ${rq.targetUri}")
          if (main.warcType == "revisit") {
            nRev += 1
            assert(main.recordId ===
              WarcSource.revisitIdOf(main.targetUri, date))
          } else {
            nResp += 1
            assert(main.recordId ===
              WarcSource.responseIdOf(main.targetUri, date))
          }
        }
      }
      assert(nResp === 3 && nRev === 9)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("warc-write: header-tearing inputs reject loudly") {
    // CRLF in a content type is header injection; whitespace in a URI
    // tears the WARC header line — both must fail by name, not mangle
    intercept[IllegalArgumentException] {
      WarcSource.warcResponseOf("http://a/", 200,
        "text/html\r\nX-Evil: 1", "x".getBytes, "2026-01-01T00:00:00Z")
    }
    intercept[IllegalArgumentException] {
      WarcSource.warcResponseOf("http://a/ b", 200,
        "text/html", "x".getBytes, "2026-01-01T00:00:00Z")
    }
    intercept[IllegalArgumentException] {
      WarcSource.wetRecordOf(1L, "host with space", "t", "2026-01-01T00:00:00Z")
    }
  }

  test("warc-write: digest base32/sha1 arbitered against python") {
    val bodies = Seq("", "a", "digest probe body é世",
      "x" * 1000)
    val ours = bodies.map(b =>
      WarcSource.payloadDigestOf(b.getBytes("UTF-8")))
    val pb = new ProcessBuilder("python3", "-c",
      """import sys, hashlib, base64, json
        |bodies = json.loads(sys.stdin.read())
        |for b in bodies:
        |    h = hashlib.sha1(b.encode('utf-8')).digest()
        |    print('sha1:' + base64.b32encode(h).decode())""".stripMargin)
    pb.redirectErrorStream(true)
    val p = pb.start()
    p.getOutputStream.write(
      ("[" + bodies.map(b => "\"" +
        b.flatMap {
          case '\\' => "\\\\"; case '"' => "\\\""
          case c if c < 128 => c.toString
          case c => f"\\u$c%04x"
        } + "\"").mkString(",") + "]").getBytes("UTF-8"))
    p.getOutputStream.close()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    assert(p.waitFor() === 0, s"python failed: $out")
    assert(out.trim.split("\n").toSeq === ours)
  }
}
