package graft

import graft.sources.{CdxSource, WarcSource, ZipSource}

/** CDX crawl-index family: SURT canonicalization, the CDXJ line
  * grammar (flat JSON blobs), and the random-access fetch — measured
  * offsets into real archive bytes, one member per fetch.
  */
class CdxSpec extends GraftSparkSpec {

  test("cdx: SURT canonicalization — scheme/port drops, host reversal, path verbatim") {
    assert(CdxSource.surt("http://www.Example.org:80/A/b?q=1") ===
      "org,example,www)/A/b?q=1")
    assert(CdxSource.surt("https://sub.host.example.com/") ===
      "com,example,host,sub)/")
    assert(CdxSource.surt("https://example.com") === "com,example)/")
    assert(CdxSource.surt("http://example.com:8080/x") ===
      "com,example:8080)/x")
    assert(CdxSource.surt("HTTPS://EXAMPLE.com:443/Keep/Case") ===
      "com,example)/Keep/Case")
    // the default port is the SCHEME'S: :443 on plain http is a
    // different service and must not collide (r17 review)
    assert(CdxSource.surt("http://example.com:443/x") ===
      "com,example:443)/x")
    assert(CdxSource.surt("https://example.com:80/x") ===
      "com,example:80)/x")
    // userinfo carries no identity; query-only paths normalize to /?
    assert(CdxSource.surt("http://user@example.com/a") === "com,example)/a")
    assert(CdxSource.surt("http://example.com?q=1") ===
      CdxSource.surt("http://example.com/?q=1"))
    // fragments never reach the server: same key with or without, and
    // an https URL with a fragment is NOT "non-http(s)" (ADVICE r17)
    assert(CdxSource.surt("https://example.com/a/b#sec2") ===
      "com,example)/a/b")
    assert(CdxSource.surt("http://example.com#top") === "com,example)/")
    assert(CdxSource.surt("http://example.com/x?q=1#f") ===
      CdxSource.surt("http://example.com/x?q=1"))
    val e = intercept[RuntimeException] { CdxSource.surt("ftp://x/") }
    assert(e.getMessage.contains("non-http"))
  }

  test("cdx: flat JSON blobs parse with escapes; nesting and junk reject by name") {
    assert(CdxSource.parseFlatJson(
      """{"a": "1", "b": "x\"y\\z", "c": "n\nl"}""") ===
      Map("a" -> "1", "b" -> "x\"y\\z", "c" -> "n\nl"))
    assert(CdxSource.parseFlatJson("{}") === Map.empty[String, String])
    // real CDXJ escapes non-ASCII url chars as \uXXXX
    assert(CdxSource.parseFlatJson(
      "{\"url\": \"http://x/\\u0441\\u0442\"}")
      === Map("url" -> "http://x/ст"))
    val e1 = intercept[RuntimeException] {
      CdxSource.parseFlatJson("""{"a": {"b": "c"}}""")
    }
    assert(e1.getMessage.contains("flat string maps"))
    val e2 = intercept[RuntimeException] {
      CdxSource.parseFlatJson("""{"a": "1"} trailing""")
    }
    assert(e2.getMessage.contains("after json object"))
    val e3 = intercept[RuntimeException] {
      CdxSource.parseCdxLine("""org,x)/ 2026 {"url": "http://x/"}""")
    }
    assert(e3.getMessage.contains("bad timestamp"))
    // ASCII-only \u hex: a Unicode digit codepoint (Arabic-Indic one)
    // is NOT hex here, matching the WatSource.Jsons strictness
    val e4 = intercept[RuntimeException] {
      CdxSource.parseFlatJson("{\"a\": \"\\u0\u066141\"}")
    }
    assert(e4.getMessage.contains("bad \\u escape"))
  }

  test("cdx: measured pointers fetch exactly their record — gzip and plain arms") {
    Seq(4L, 7L).foreach { id => // gzip member-per-record / plain
      val text = "alpha beta gamma"
      val archive = new ZipSource.BytesSeekable(WarcSource.warcOf(id, text))
      val full = WarcSource.parseWarc(WarcSource.warcOf(id, text))
        .records.filter(_.warcType == "response")
      val entries = CdxSource.cdxOf(id, text).split("\n")
        .filter(_.nonEmpty).map(CdxSource.parseCdxLine)
      assert(entries.length === full.length)
      entries.zip(full).foreach { case (e, expect) =>
        val r = CdxSource.fetchRecord(archive, e.offset, e.length)
        assert(r.targetUri === expect.targetUri)
        assert(r.httpStatus === expect.httpStatus)
        assert(r.payloadDigest === e.digest)
        assert(r.body === expect.body) // wire form decoded identically
        assert(e.surtKey === CdxSource.surt(expect.targetUri))
      }
      // a slipped pointer cannot silently succeed: one byte off the
      // member start is not a gzip member / WARC version line
      val e0 = entries.head
      intercept[RuntimeException] {
        CdxSource.fetchRecord(archive, e0.offset + 1, e0.length)
      }
      intercept[RuntimeException] {
        CdxSource.fetchRecord(archive, e0.offset, archive.size + 5)
      }
    }
  }

  test("cdx: streaming index-driven fetch appends exactly-once across shards and restarts") {
    val root = java.nio.file.Files.createTempDirectory("cdxstream").toFile
    val landing = new java.io.File(root, "landing"); landing.mkdirs()
    val warcs = new java.io.File(root, "warcs"); warcs.mkdirs()
    val out = new java.io.File(root, "out").getAbsolutePath
    val ckpt = new java.io.File(root, "ckpt").getAbsolutePath
    try {
      val text = "stream fetch text"
      Seq(2L, 7L).foreach { id =>
        val ext = if (id % 2 == 0) "warc.gz" else "warc"
        java.nio.file.Files.write(new java.io.File(warcs, s"d$id.$ext").toPath,
          WarcSource.warcOf(id, text))
      }
      java.nio.file.Files.write(new java.io.File(landing, "i2.cdx").toPath,
        CdxSource.cdxOf(2L, text).getBytes("UTF-8"))
      val q = graft.streaming.StreamingAnalytics.cdxFetchIngest(
        spark, landing.getAbsolutePath, warcs.getAbsolutePath, out, ckpt)
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() === 3) // id=2: k=3 responses
      // a second shard (gzipped, the CC form) appends only its own rows
      java.nio.file.Files.write(new java.io.File(landing, "i7.cdx.gz").toPath,
        WarcSource.gzipOne(CdxSource.cdxOf(7L, text).getBytes("UTF-8")))
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() === 5) // + k=2
      q.stop()
      // restart from the checkpoint: nothing replays, nothing duplicates
      val q2 = graft.streaming.StreamingAnalytics.cdxFetchIngest(
        spark, landing.getAbsolutePath, warcs.getAbsolutePath, out, ckpt)
      q2.processAllAvailable()
      q2.stop()
      val rows = spark.read.parquet(out)
      assert(rows.count() === 5)
      assert(rows.select("uri").distinct().count() === 5)
      assert(rows.filter(rows("text").contains(text)).count() === 2) // j==0 pages
      // fetched rows carry the ARCHIVE filename (per-archive
      // accounting, the fetchByIndex shape)
      assert(rows.select("file").distinct().collect().map(_.getString(0))
        .toSet === Set("d2.warc.gz", "d7.warc"))
      // a pointer into a MISSING archive (an IOException, not a parse
      // error) poisons ITS LINE only — the shard's remaining lines
      // still fetch (r17 review: an escaping IOException would drop
      // them silently while the checkpoint marked the shard done)
      java.nio.file.Files.write(new java.io.File(landing, "bad.cdx").toPath,
        ("org,gone)/x 20260101000000 {\"url\": \"http://gone/x\", " +
          "\"status\": \"200\", \"length\": \"100\", \"offset\": \"0\", " +
          "\"filename\": \"missing.warc.gz\"}\n" +
          CdxSource.cdxOf(2L, text)).getBytes("UTF-8"))
      val q3 = graft.streaming.StreamingAnalytics.cdxFetchIngest(
        spark, landing.getAbsolutePath, warcs.getAbsolutePath, out, ckpt)
      q3.processAllAvailable()
      q3.stop()
      val all = spark.read.parquet(out)
      assert(all.count() === 9) // 5 + 1 poison + 3 survivors of bad.cdx
      assert(all.filter(all("status") === -1).count() === 1)
      assert(all.filter(all("status") === -1).head.getString(0)
        .endsWith("bad.cdx")) // poison provenance = the index shard
    } finally {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm)
        x.delete()
      }
      rm(root)
    }
  }

  test("cdx: generated index equals the fixture walk and fetches back — both arms") {
    val text = "alpha beta gamma"
    Seq(4L, 7L, 9L).foreach { id => // gzip / plain / gzip-with-revisit? 9%2=1 plain
      val bytes = WarcSource.warcOf(id, text)
      val fname = s"d$id.warc" + (if (id % 2 == 0) ".gz" else "")
      val gen = CdxSource.generateCdx(
        new java.io.ByteArrayInputStream(bytes), fname).toSeq
      // line-for-line equal to the fixture writer's independent walk
      assert(gen.map(CdxSource.renderLine) ===
        CdxSource.cdxOf(id, text).split("\n").filter(_.nonEmpty).toSeq)
      // every generated pointer fetches exactly its record
      val archive = new ZipSource.BytesSeekable(bytes)
      gen.foreach { e =>
        val r = CdxSource.fetchRecord(archive, e.offset, e.length)
        assert(r.targetUri === e.url)
        assert(r.payloadDigest === e.digest)
      }
      // timestamps derive from WARC-Date, not a constant
      assert(gen.forall(_.timestamp ===
        f"2026-01-${id % 28 + 1}%02d000000".replace("-", "")))
    }
    // a response SHARING its gzip member is un-indexable and says so:
    // splice two fixture records into ONE member
    val recs = WarcSource.parseWarc(WarcSource.warcOf(3L, text))
    val plain = WarcSource.warcOf(3L, text) // id=3 odd -> plain concatenation
    val shared = WarcSource.gzipOne(plain)  // every record in one member
    val e = intercept[IllegalArgumentException] {
      CdxSource.generateCdx(
        new java.io.ByteArrayInputStream(shared), "shared.warc.gz").toSeq
    }
    assert(e.getMessage.contains("shares a gzip member"))
    assert(recs.records.exists(_.warcType == "response")) // premise holds
  }

  test("zipnum: cluster build + point lookup — boundaries, duplicate spills, file arm") {
    // hand-built sorted lines with a DUPLICATE-KEY RUN spanning block
    // boundaries: the binary search must start strictly below the key
    def line(surtKey: String, ts: String, n: Int): String =
      surtKey + " " + ts + " {\"url\": \"http://u/" + n + "\", " +
        "\"status\": \"200\", \"length\": \"1\", \"offset\": \"0\", " +
        "\"filename\": \"f.warc\"}"
    val lines = Seq(
      line("com,a)/", "20260101000000", 0),
      line("com,b)/", "20260101000000", 1),
      line("com,b)/", "20260102000000", 2), // run of com,b spans blocks
      line("com,b)/", "20260103000000", 3),
      line("com,c)/", "20260101000000", 4),
      line("com,d)/", "20260101000000", 5))
    val (blocks, idx) = CdxSource.zipnumOf(lines, blockSize = 2)
    assert(idx.size === 3) // 6 lines / 2
    val seek = new ZipSource.BytesSeekable(blocks)
    def urls(k: String): Seq[String] =
      CdxSource.zipnumLookup(seek, idx.toIndexedSeq, k).map(_.url)
    assert(urls("com,b)/") === Seq("http://u/1", "http://u/2", "http://u/3"))
    assert(urls("com,a)/") === Seq("http://u/0")) // first block's first key
    assert(urls("com,d)/") === Seq("http://u/5")) // last line
    assert(urls("com,zz)/") === Seq.empty) // above every key
    assert(urls("com,0)/") === Seq.empty) // below every key
    // file arm: build from a sorted shard on disk, look up through the
    // directory router; an UNSORTED shard fails the build by name
    val dir = java.nio.file.Files.createTempDirectory("zipnum").toFile
    try {
      val text = "zip num text"
      val all = Seq(4L, 7L).flatMap(id =>
        CdxSource.cdxOf(id, text).split("\n").filter(_.nonEmpty)).sorted
      java.nio.file.Files.write(new java.io.File(dir, "part-0.cdx").toPath,
        (all.mkString("\n") + "\n").getBytes("UTF-8"))
      val zn = new java.io.File(dir, "zn").getAbsolutePath
      assert(CdxSource.writeZipnumFiles(spark,
        dir.getAbsolutePath + "/part-*.cdx", zn, blockSize = 2) === 1L)
      val hits = CdxSource.zipnumLookupDir(spark, zn,
        "http://site4.example/4/1")
      assert(hits.map(_.url) === Seq("http://site4.example/4/1"))
      assert(CdxSource.zipnumLookupDir(spark, zn,
        "http://site9.example/none").isEmpty)
      // the shard's .idx carries a trailing last-key sentinel so both
      // range ends of the routing skip are exact
      val idxLines = new String(java.nio.file.Files.readAllBytes(
        new java.io.File(zn, new java.io.File(zn).list()
          .find(_.endsWith(".idx")).get).toPath), "UTF-8")
        .split("\n").filter(_.nonEmpty)
      assert(idxLines.last.endsWith("\t-1\t0"))
      // probes below the min and above the max surt skip the shard
      assert(CdxSource.zipnumLookupDir(spark, zn, "http://a.a/").isEmpty)
      assert(CdxSource.zipnumLookupDir(spark, zn, "http://zzz.zzz/")
        .isEmpty)
      java.nio.file.Files.write(new java.io.File(dir, "bad.cdx").toPath,
        (all.reverse.mkString("\n") + "\n").getBytes("UTF-8"))
      val e = intercept[Exception] {
        CdxSource.writeZipnumFiles(spark, dir.getAbsolutePath + "/bad.cdx",
          zn + "2", blockSize = 2)
      }
      assert(e.getMessage.contains("not sorted") ||
        e.getCause != null)
    } finally {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm)
        x.delete()
      }
      rm(dir)
    }
  }

  test("zipnum: multi-shard routing — key runs spill across a shard boundary, non-candidates skip") {
    // three globally-sorted shards with a DUPLICATE-KEY RUN crossing
    // the shard 0 / shard 1 boundary (com,k ends shard 0 AND opens
    // shard 1): routing must search BOTH shards for that key and merge
    // the hits, while keys outside a shard's [first, last] range never
    // open its .zn — proved at the file level by deleting a shard's
    // block file and looking up keys routed elsewhere.
    def line(surtKey: String, ts: String, n: Int): String =
      surtKey + " " + ts + " {\"url\": \"http://u/" + n + "\", " +
        "\"status\": \"200\", \"length\": \"1\", \"offset\": \"0\", " +
        "\"filename\": \"f.warc\"}"
    val shard0 = Seq(
      line("com,a)/", "20260101000000", 0),
      line("com,b)/", "20260101000000", 1),
      line("com,k)/", "20260101000000", 2),
      line("com,k)/", "20260102000000", 3))
    val shard1 = Seq(
      line("com,k)/", "20260103000000", 4),
      line("com,m)/", "20260101000000", 5),
      line("com,n)/", "20260101000000", 6))
    val shard2 = Seq(
      line("com,p)/", "20260101000000", 7),
      line("com,q)/", "20260101000000", 8))
    val dir = java.nio.file.Files.createTempDirectory("zipnumms").toFile
    try {
      Seq(shard0, shard1, shard2).zipWithIndex.foreach { case (ls, i) =>
        java.nio.file.Files.write(
          new java.io.File(dir, s"part-$i.cdx").toPath,
          (ls.mkString("\n") + "\n").getBytes("UTF-8"))
      }
      val zn = new java.io.File(dir, "zn").getAbsolutePath
      assert(CdxSource.writeZipnumFiles(spark,
        dir.getAbsolutePath + "/part-*.cdx", zn, blockSize = 2) === 3L)
      def urls(u: String): Seq[String] =
        CdxSource.zipnumLookupDir(spark, zn, u)
          .sortBy(_.timestamp).map(_.url)
      // the boundary-spanning run: hits from shard 0 AND shard 1
      assert(urls("http://k.com/") ===
        Seq("http://u/2", "http://u/3", "http://u/4"))
      // single-shard keys, range edges, and between-shard gaps
      assert(urls("http://a.com/") === Seq("http://u/0"))
      assert(urls("http://q.com/") === Seq("http://u/8"))
      assert(urls("http://o.com/") === Seq.empty) // between n and p
      assert(urls("http://zz.com/") === Seq.empty)
      // file-level skip proof: with shard 2's BLOCK file gone, lookups
      // routed to shards 0/1 still succeed (its .zn was never opened);
      // a key inside shard 2's range now fails loudly
      assert(new java.io.File(zn, "part-2.zn").delete())
      assert(urls("http://k.com/").size === 3)
      assert(urls("http://b.com/") === Seq("http://u/1"))
      intercept[Exception] { urls("http://q.com/") }
    } finally {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm)
        x.delete()
      }
      rm(dir)
    }
  }

  test("cdx: revisit records resolve to their original's text through the index") {
    import spark.implicits._
    // fixture revisits exist on id%3==1; id=7 (plain) proves presence,
    // id=5 (5%3=2, no revisit) proves absence
    val docs = Seq((7L, "revisit body text"), (5L, "no revisit here"))
      .toDF("doc_id", "text")
    val rows = CdxSource.revisitTable(spark, docs).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getLong(0) === 7L)
    assert(r.getString(1) === "http://site0.example/7/0")
    assert(r.getString(3) === "http://site0.example/7/0")
    assert(r.getString(4).contains("revisit body text"))
    assert(r.getString(4).startsWith("doc 7 Doc 7"))
  }

  test("cdx: resolveRevisits on a HOT digest equals the windowed form — no fan-out") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the r18 plan joined the full index on bare digest before picking
    // a winner, fanning out |uris sharing d| × |captures with d| rows —
    // exactly the boilerplate/soft-404 skew shape of real crawls. The
    // r19 form pre-aggregates the index to one earliest capture per
    // digest (uri-independent pick), so this fixture plants ONE digest
    // shared by 50 revisit URIs and 41 captures and requires row
    // equality with the old windowed implementation.
    val dir = java.nio.file.Files.createTempDirectory("cdxhot").toFile
    try {
      val text = "hot digest body"
      java.nio.file.Files.write(new java.io.File(dir, "d7.warc").toPath,
        WarcSource.warcOf(7L, text))
      val real = CdxSource.cdxOf(7L, text).split("\n").filter(_.nonEmpty)
        .map(CdxSource.parseCdxLine)
      val e0 = real(0) // j=0 response — the hot digest's true original
      val e1 = real(1) // j=1 response — digest B's null-ts winner target
      // (digest, timestamp, filename, offset, length)
      val hotFakes = (0 until 40).map(i =>
        ("hotdigest", "20270101000000", "d7.warc", 4L + i, 9L))
      val index = (Seq(
        ("hotdigest", e0.timestamp, e0.filename, e0.offset, e0.length),
        // digest B: a NULL-timestamp capture row must win (asc nulls
        // first — the old window's order), pointing at a REAL record
        ("digB", null, e1.filename, e1.offset, e1.length),
        ("digB", "20260101000000", "d7.warc", 1L, 7L),
        // digest D: winner has a null filename -> unresolved
        ("digD", "20260101000000", null, 3L, 5L)) ++ hotFakes)
        .toDF("digest", "timestamp", "filename", "offset", "length")
      val revisits = ((0 until 50).map(i => (s"http://hot.example/$i", "hotdigest")) ++
        Seq(("http://b.example/x", "digB"), ("http://b.example/y", "digB"),
          ("http://c.example/", "digC"), ("http://d.example/", "digD")))
        .toDF("uri", "digest")
      val got = CdxSource.resolveRevisits(spark, dir.getAbsolutePath,
        revisits, index)
      // the OLD (r18) windowed form, verbatim — the semantics oracle
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("revisit_uri", "digest")
        .orderBy(col("timestamp"), col("filename"), col("offset"))
      val oldPicked = revisits
        .select(col("uri").as("revisit_uri"), col("digest")).distinct()
        .join(index.select(col("digest"), col("timestamp"), col("filename"),
          col("offset"), col("length")), Seq("digest"), "left")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .withColumn("ok", col("filename").isNotNull &&
          coalesce(col("offset") >= 0 && col("length") > 0, lit(false)))
      val oldResolved = CdxSource.fetchTagged(spark,
          dir.getAbsolutePath, oldPicked.filter(col("ok"))
            .select(col("filename"), col("offset"), col("length"),
              col("revisit_uri")))
        .select(col("tag").as("revisit_uri"), col("uri").as("resolved_from"),
          col("status"), col("text"))
      val oldAll = oldResolved.unionByName(oldPicked.filter(!col("ok"))
        .select(col("revisit_uri"),
          lit(null).cast("string").as("resolved_from"),
          lit(-1).as("status"), lit(null).cast("string").as("text")))
      def key(r: org.apache.spark.sql.Row) =
        (r.getString(0), Option(r.getString(1)), r.getInt(2),
          Option(r.getString(3)))
      assert(got.collect().map(key).sorted === oldAll.collect().map(key).sorted)
      val byUri = got.collect().map(r => r.getString(0) -> r).toMap
      assert(byUri.size === 54)
      // hot digest: all 50 URIs resolved from the TRUE original, never
      // a 2027 fake
      (0 until 50).foreach { i =>
        val r = byUri(s"http://hot.example/$i")
        assert(r.getString(1) === e0.url)
        assert(r.getString(3).contains("hot digest body"))
      }
      // digB: the null-timestamp capture wins under nulls-first
      assert(byUri("http://b.example/x").getString(1) === e1.url)
      // digC (unindexed) and digD (garbage pointer) both unresolved
      assert(byUri("http://c.example/").getInt(2) === -1)
      assert(byUri("http://d.example/").getInt(2) === -1)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("cdx: shard files parse through the Spark path; fetchByIndex round-trips a crawl") {
    val dir = java.nio.file.Files.createTempDirectory("cdxspec").toFile
    try {
      val text = "the data word table"
      Seq(2L, 7L).foreach { id =>
        val ext = if (id % 2 == 0) "warc.gz" else "warc"
        java.nio.file.Files.write(new java.io.File(dir, s"d$id.$ext").toPath,
          WarcSource.warcOf(id, text))
      }
      // one plain shard, one gzipped shard (the Common Crawl form)
      java.nio.file.Files.write(new java.io.File(dir, "idx-0.cdx").toPath,
        CdxSource.cdxOf(2L, text).getBytes("UTF-8"))
      java.nio.file.Files.write(new java.io.File(dir, "idx-1.cdx.gz").toPath,
        WarcSource.gzipOne(CdxSource.cdxOf(7L, text).getBytes("UTF-8")))
      val index = CdxSource.cdxFiles(spark, dir.getAbsolutePath + "/idx-*")
      val rows = index.collect()
      assert(rows.length === 5) // id=2: 3 responses; id=7: 2
      // timestamps derive from each record's WARC-Date (day = id%28+1)
      assert(rows.filter(_.getString(9) == "d2.warc.gz")
        .forall(_.getString(2) === "20260103000000"))
      assert(rows.filter(_.getString(9) == "d7.warc")
        .forall(_.getString(2) === "20260108000000"))
      // one stray malformed line cannot abort an index scan: it
      // degrades to a countable poison row (null surt, raw line kept)
      // and the good lines survive; strict mode stays loud
      java.nio.file.Files.write(new java.io.File(dir, "idx-2.cdx").toPath,
        ("org,x)/ notatimestamp {\"url\": \"http://x/\"}\n" +
          CdxSource.cdxOf(2L, text)).getBytes("UTF-8"))
      val withBad = CdxSource.cdxFiles(spark, dir.getAbsolutePath + "/idx-*")
        .collect()
      assert(withBad.length === 9) // 5 + 3 good + 1 poison
      assert(withBad.count(_.isNullAt(1)) === 1)
      intercept[Exception] {
        CdxSource.cdxFiles(spark, dir.getAbsolutePath + "/idx-2.cdx",
          lenient = false).collect()
      }
      java.nio.file.Files.delete(new java.io.File(dir, "idx-2.cdx").toPath)
      // fetch every indexed record straight out of the archives
      val fetched = CdxSource.fetchByIndex(spark, dir.getAbsolutePath, index)
        .collect().map(r => (r.getString(1), r.getInt(2), r.getString(3)))
        .sortBy(_._1)
      val walked = WarcSource.warcFiles(spark, dir.getAbsolutePath + "/*.warc*")
        .collect().map(r => (r.getString(1), r.getInt(2), r.getString(3)))
        .sortBy(_._1)
      assert(fetched.toSeq === walked.toSeq)
      // index-driven corpus build == the full-walk crawlDocs bridge
      // when the index covers the crawl (same docsShape derivation)
      val viaCdx = CdxSource.corpusFromCdx(spark, dir.getAbsolutePath, index)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).sortBy(_._1)
      val viaWalk = WarcSource.crawlDocs(spark,
          dir.getAbsolutePath + "/*.warc*")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).sortBy(_._1)
      assert(viaCdx.toSeq === viaWalk.toSeq)
      assert(viaCdx.nonEmpty)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }
}
