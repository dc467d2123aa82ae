package graft

import org.apache.spark.sql.functions._

/** Round-18 operator hardening: explicit missing-hint semantics in the
  * fetch scheduler (ADVICE r17) and the round's new components.
  */
class Round18OpsSpec extends GraftSparkSpec {

  test("scheduler: missing lastmod/changefreq are data, not damage") {
    import spark.implicits._
    val frontier = Seq(
      // (host, loc, priority_ppm, lastmod, changefreq)
      ("h1", "http://h1/a", 500000L, "2026-02-01", "daily"),
      ("h1", "http://h1/b", 900000L, null, "daily"), // never fetched
      ("h1", "http://h1/c", 900000L, "2026-02-01", null), // no hint
      ("h1", "http://h1/d", 100000L, "2026-02-01", "hourly"),
      ("h1", "http://h1/e", 100000L, "not-a-date", "daily"), // unparseable
      ("h1", "http://h1/f", 300000L, "2026-02-01", "always"),
      ("h1", "http://h1/g", 900000L, "2026-02-01", "never"),
      ("h1", "http://h1/h", 100000L, "2026-02-01", "fortnightly") // unknown
    ).toDF("host", "loc", "priority_ppm", "lastmod", "changefreq")
    val delays = Seq(("h1", 2000L)).toDF("host", "delay_ms")
    val rows = graft.sources.Sitemap
      .fetchSchedule(frontier, delays, "2026-02-15")
      .orderBy("seq").collect()
    assert(rows.length === 8) // nothing raised, nothing dropped
    val bySeq = rows.map(r => r.getString(1))
    // sentinels first (never-fetched /b /e and always-stale /f),
    // priority desc then loc among them; then hourly, daily, weekly
    // fallbacks, and `never` last
    assert(bySeq.toSeq === Seq("http://h1/b", "http://h1/f", "http://h1/e",
      "http://h1/d", "http://h1/a", "http://h1/c", "http://h1/h",
      "http://h1/g"))
    val overdue = rows.map(r => (r.getString(1), r.getLong(3))).toMap
    assert(overdue("http://h1/b") === graft.sources.Sitemap.NeverFetchedPpm)
    assert(overdue("http://h1/e") === graft.sources.Sitemap.NeverFetchedPpm)
    assert(overdue("http://h1/f") === graft.sources.Sitemap.NeverFetchedPpm)
    // 14 days: daily = 14e6, hourly = 336 hours on a 1-hour period
    assert(overdue("http://h1/a") === 14000000L)
    assert(overdue("http://h1/d") === 336000000L)
    // NULL and unknown changefreq both fall back to the weekly period
    assert(overdue("http://h1/c") === 2000000L)
    assert(overdue("http://h1/h") === 2000000L)
    // `never` is never due (but would still sentinel if never fetched)
    assert(overdue("http://h1/g") === 0L)
    // spacing still applies to every row (nothing unscheduled)
    assert(rows.map(r => r.getLong(5)).toSeq ===
      (0L until 8L).map(_ * 2000L))
  }

  test("graph: unit-weighted pagerankWeighted equals pagerank; weights shift mass per the integer formula") {
    import spark.implicits._
    import graft.operators.Graph
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
      .toDF("src", "dst")
    val unw = Graph.pagerank(edges, iters = 3, checkpointInterval = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val w1 = Graph.pagerankWeighted(edges.withColumn("w", lit(1L)),
        iters = 3, checkpointInterval = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(w1 === unw) // w=1 everywhere IS uniform splitting
    // skewed weights vs an in-memory reference running the SAME
    // decomposed integer formula
    val we = Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "a", 2L),
      ("c", "a", 5L)).toDF("src", "dst", "w")
    val got = Graph.pagerankWeighted(we, iters = 2, checkpointInterval = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val sw = Map("a" -> 4L, "b" -> 2L, "c" -> 5L)
    val adj = Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "a", 2L),
      ("c", "a", 5L))
    val n = 3L
    val unit = 1000000000000L / n
    val tp = (15L * unit) / 100L
    var r = Map("a" -> unit, "b" -> unit, "c" -> unit)
    (1 to 2).foreach { _ =>
      val in = adj.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _, w) =>
          (r(s) / sw(s)) * w + ((r(s) % sw(s)) * w) / sw(s)
        }.sum
      }
      r = r.keys.map(k => k -> (tp + (85L * in.getOrElse(k, 0L)) / 100L))
        .toMap
    }
    assert(got === r)
    // skew actually matters: b and c both feed only off a, and b's
    // 3-weight edge takes 3x the mass c's 1-weight edge does
    assert(got("b") > got("c"))
    // non-positive weights are loud, not a downstream div-by-zero
    val e = intercept[Exception] {
      Graph.pagerankWeighted(Seq(("x", "y", 0L)).toDF("src", "dst", "w"),
        iters = 1).collect()
    }
    assert(e.getMessage.contains("non-positive edge weight") ||
      e.getCause != null &&
        e.getCause.getMessage.contains("non-positive edge weight"))
  }

  test("warc: degraded bodies are counted by reason through the ingestion arm") {
    import graft.sources.WarcSource
    // hand-build an archive: one good page, one brotli-coded page (now
    // decoded for real by the own RFC 7932 decoder), one LZW-coded page
    // (the remaining honest capability gap), one damaged-gzip page
    def rec(uri: String, http: Array[Byte]): Array[Byte] = {
      val head = ("WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Target-URI: $uri\r\n" +
        "WARC-Date: 2026-01-01T00:00:00Z\r\n" +
        "Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${http.length}\r\n\r\n").getBytes("ISO-8859-1")
      head ++ http ++ "\r\n\r\n".getBytes("ISO-8859-1")
    }
    def http(headers: String, body: Array[Byte]): Array[Byte] =
      (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n$headers\r\n")
        .getBytes("ISO-8859-1") ++ body
    val good = rec("http://a/", http("", "<p>fine</p>".getBytes("UTF-8")))
    val br = rec("http://b/", http("Content-Encoding: br\r\n",
      graft.sources.Brotli.encodeStored("<p>br page</p>".getBytes("UTF-8"))))
    val lzw = rec("http://d/", http("Content-Encoding: compress\r\n",
      Array[Byte](0x1f, 0x9d.toByte, 1, 2))) // LZW we honestly cannot decode
    val broken = rec("http://c/", http("Content-Encoding: gzip\r\n",
      Array[Byte](0x1f, 0x8b.toByte, 8, 0))) // truncated member
    val dir = java.nio.file.Files.createTempDirectory("brctr").toFile
    try {
      java.nio.file.Files.write(new java.io.File(dir, "a.warc").toPath,
        good ++ br ++ lzw ++ broken)
      val rows = WarcSource.warcFiles(spark,
          dir.getAbsolutePath + "/*.warc", lenient = true)
        .collect().map(r => (r.getString(1), r.getString(3), r.getString(4)))
      assert(rows.length === 4)
      val byUri = rows.map(r => (r._1, (r._2, r._3))).toMap
      assert(byUri("http://a/") === (("fine", null)))
      // br now decodes for real (own RFC 7932 decoder)
      assert(byUri("http://b/") === (("br page", null)))
      assert(byUri("http://d/") === ((null, "coding:compress")))
      assert(byUri("http://c/") === ((null, "damage")))
      // strict mode still rejects the unsupported coding by name — the
      // degrade is a lenient accounting channel, not a weakened contract
      val e = intercept[Exception] {
        WarcSource.warcFiles(spark, dir.getAbsolutePath + "/*.warc",
          lenient = false).collect()
      }
      assert(e.getMessage.contains("unsupported content coding") ||
        e.getCause != null)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("sitemap: tree walk recurses index -> leaves; cycles/depth/count reject loudly") {
    import graft.sources.Sitemap
    val walked = Sitemap.walkSitemapTree(
      "http://site5.example/sitemap-index.xml", Sitemap.sitemapTreeFetch(5L))
    // id=5: n = 5%2+2 = 3 leaves; leaf p has (5+p)%3+1 urls -> 3+1+2 = 6
    assert(walked.size === 6)
    assert(walked.map(_._1).distinct.size === 3)
    assert(walked.forall { case (leaf, e) =>
      leaf.contains("/sitemaps/5/") && e.loc.startsWith("http://site5") })
    // a repeated URL terminates and never double-counts: a true cycle
    // (index advertising itself) walks once and yields nothing; a
    // duplicate sibling reference (legal, real indexes carry them)
    // contributes its entries ONCE
    val cyc = "<?xml version=\"1.0\"?><sitemapindex>" +
      "<sitemap><loc>http://x/i.xml</loc></sitemap></sitemapindex>"
    assert(Sitemap.walkSitemapTree("http://x/i.xml", _ => cyc).isEmpty)
    val dupIdx = "<?xml version=\"1.0\"?><sitemapindex>" +
      "<sitemap><loc>http://x/leaf.xml</loc></sitemap>" +
      "<sitemap><loc>http://x/leaf.xml</loc></sitemap></sitemapindex>"
    val oneLeaf = "<?xml version=\"1.0\"?><urlset>" +
      "<url><loc>http://x/p</loc></url></urlset>"
    assert(Sitemap.walkSitemapTree("http://x/root.xml",
      u => if (u.endsWith("root.xml")) dupIdx else oneLeaf).size === 1)
    // depth: index -> index -> index exceeds the one-nesting allowance
    def deep(url: String): String =
      "<?xml version=\"1.0\"?><sitemapindex><sitemap><loc>" +
        url + "x</loc></sitemap></sitemapindex>"
    val e2 = intercept[IllegalArgumentException] {
      Sitemap.walkSitemapTree("http://x/a", u => deep(u))
    }
    assert(e2.getMessage.contains("deeper"))
    // count: a sprawling index trips the file cap
    val wide = "<?xml version=\"1.0\"?><sitemapindex>" +
      (0 until 30).map(i =>
        s"<sitemap><loc>http://x/$i.xml</loc></sitemap>").mkString +
      "</sitemapindex>"
    val leaf = "<?xml version=\"1.0\"?><urlset>" +
      "<url><loc>http://x/p</loc></url></urlset>"
    val e3 = intercept[IllegalArgumentException] {
      Sitemap.walkSitemapTree("http://x/root.xml",
        u => if (u.endsWith("root.xml")) wide else leaf, maxSitemaps = 10)
    }
    assert(e3.getMessage.contains("exceeds"))
  }

  test("wat: host edges collapse outlinks to weighted host pairs") {
    import spark.implicits._
    import graft.sources.WatSource
    assert(WatSource.hostOf("http://Sub.Example.ORG:8080/p?q#f")
      === "sub.example.org")
    assert(WatSource.hostOf("not a url") === null)
    assert(WatSource.hostOf(null) === null)
    val media = WatSource.synthesizeWat(spark,
      Seq((5L, "t")).toDF("doc_id", "text"))
    val rows = graft.sources.WatSource.watHostEdges(spark, media)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    // doc 5: captures j=0..2, links m=0..(5+j)%4; m%3==2 -> ext2, else
    // self; rel=nofollow when (5+j+m)%5==0 drops the edge from rank
    // flow: j=0 drops m=0, j=2 drops m=3 -> self edges 1+2+2=5, ext2 2
    assert(rows === Map(
      ("site5.example", "site5.example") -> 5L,
      ("site5.example", "ext2.example") -> 2L))
    // the x121 edge rows keep nofollow links VISIBLE with the flag
    val edges = graft.sources.WatSource.watOutlinkTable(spark, media)
      .collect().map(r => ((r.getInt(1), r.getInt(2)), r.getInt(4))).toMap
    assert(edges((0, 0)) === 1) // (5+0+0)%5==0
    assert(edges((0, 1)) === 0)
    assert(edges((2, 3)) === 1) // (5+2+3)%5==0, the stacked-rel form
  }
}
