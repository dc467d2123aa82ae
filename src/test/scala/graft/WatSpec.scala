package graft

import graft.sources.WatSource
import graft.sources.WatSource._

/** WAT metadata family: the own JSON reader vs python's json in BOTH
  * directions, envelope fact extraction, fixture arithmetic, and the
  * lenient file arm.
  */
class WatSpec extends GraftSparkSpec {

  private def python(script: String, stdin: String): String = {
    val pb = new ProcessBuilder("python3", "-c", script)
    pb.redirectErrorStream(true)
    val p = pb.start()
    p.getOutputStream.write(stdin.getBytes("UTF-8"))
    p.getOutputStream.close()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    assert(p.waitFor() === 0, s"python failed: $out")
    out
  }

  test("json: python-written nested JSON parses to the same values") {
    // python WRITES (the foreign producer), we read
    // non-ASCII via escapes: argv crosses the process boundary in the
    // platform locale, which may not be UTF-8
    val esc = "caf\\u00e9 \\u201cq\\u201d" // single backslashes in python
    val py = python(
      s"""import json, sys
         |v = {"a": [1, 2.5, -3e2], "b": {"nested": {"deep": "x\\ny"}},
         |     "c": True, "d": None, "e": "$esc",
         |     "f": [], "g": {}}
         |sys.stdout.write(json.dumps(v))""".stripMargin, "")
    val v = Jsons.parse(py).asInstanceOf[JObj]
    assert(v.get("a") === Some(JArr(Vector(
      JNum("1"), JNum("2.5"), JNum("-300.0")))))
    assert(Jsons.path(v, "b", "nested", "deep") === Some(JStr("x\ny")))
    assert(v.get("c") === Some(JBool(true)))
    assert(v.get("d") === Some(JNull))
    assert(v.get("e") === Some(JStr("café “q”")))
    assert(v.get("f") === Some(JArr(Vector.empty)))
    assert(v.get("g") === Some(JObj(Vector.empty)))
  }

  test("json: python re-reads our rendered bytes value-for-value") {
    val ours = Jsons.parse(
      """{"k": ["v", {"n": 42, "t": true}], "s": "a\"b\\c\nd"}""")
    val rendered = WatSource.render(ours)
    // python parses our serialization and re-dumps with sorted keys —
    // comparing against its own dump of the same structure
    val check = python(
      """import json, sys
        |v = json.load(sys.stdin)
        |expect = {"k": ["v", {"n": 42, "t": True}], "s": "a\"b\\c\nd"}
        |print(v == expect)""".stripMargin, rendered)
    assert(check.trim === "True")
  }

  test("json: malformed shapes reject by name; depth cap holds") {
    Seq("{", "[1,", "{\"a\" 1}", "tru", "\"unterminated",
      "{\"a\": 1} extra", "01x", "{\"a\": .5}",
      // strictness matched to the python arbiter (r17 review):
      "01", "-012", // leading zeros
      "\"a\nb\"", // raw control character inside a string
      "[1\u0663]", // non-ASCII Unicode digit
      "\"\\u0\u0663\u06630\"" // Unicode digits inside a \u escape
    ).foreach { bad =>
      val e = intercept[IllegalArgumentException] { Jsons.parse(bad) }
      assert(e.getMessage.contains("json:"), s"input '$bad': $e")
    }
    val bomb = "[" * 100 + "]" * 100
    val e = intercept[IllegalArgumentException] { Jsons.parse(bomb) }
    assert(e.getMessage.contains("depth"))
    // duplicate keys: LAST wins, matching python's dict semantics
    assert(Jsons.parse("""{"s": 200, "s": 404}""")
      .asInstanceOf[JObj].get("s") === Some(JNum("404")))
    // an envelope without a target URI is DATA (the warcinfo-
    // description record real WAT files open with), never damage
    assert(WatSource.watFacts(
      """{"Envelope": {"WARC-Header-Metadata": {"WARC-Type": "warcinfo"},
        | "Payload-Metadata": {}}}""".stripMargin.replace("\n", ""))
      === WatSource.WatFacts("", "", 0, -1))
  }

  test("wat: outlink resolution covers the RFC 3986 reference forms; junk resolves to null") {
    import graft.sources.WatSource.resolveUrl
    val base = "http://site1.example/12/3"
    assert(resolveUrl(base, "/abs/path") === "http://site1.example/abs/path")
    assert(resolveUrl(base, "rel") === "http://site1.example/12/rel")
    assert(resolveUrl(base, "../up") === "http://site1.example/up")
    assert(resolveUrl(base, "http://other.example/x") ===
      "http://other.example/x")
    assert(resolveUrl(base, "//cdn.example/y") === "http://cdn.example/y")
    // fragments drop: crawl identity ends at the query
    assert(resolveUrl(base, "/p#frag") === "http://site1.example/p")
    assert(resolveUrl(base, "/p?q=1#frag") === "http://site1.example/p?q=1")
    // unresolvable junk is a countable null, never a throw
    assert(resolveUrl(base, "http://[broken") === null)
    // percent-encoding is IDENTITY: %2F in a path segment is not a
    // path separator and %26 in a query is not a parameter break —
    // decoding them would merge distinct outlink targets (ADVICE r17)
    assert(resolveUrl(base, "/a%2Fb/c") === "http://site1.example/a%2Fb/c")
    assert(resolveUrl(base, "/p?q=a%26b#f") ===
      "http://site1.example/p?q=a%26b")
    assert(resolveUrl(base, "http://h.example/x%20y?a=%3D#z") ===
      "http://h.example/x%20y?a=%3D")
    // envelope edges follow the fixture arithmetic
    val meta = graft.sources.WarcSource.parseWarc(WatSource.watOf(5L))
      .records.filter(_.warcType == "metadata")
    meta.zipWithIndex.foreach { case (r, j) =>
      val links = WatSource.outlinks(r.body)
      assert(links.size === ((5 + j) % 4 + 1))
      links.zipWithIndex.foreach { case (t, m) =>
        val expect = (m % 3) match {
          case 0 => s"http://site5.example/l$m"
          case 1 => s"http://site5.example/5/l$m"
          case _ => s"http://ext$m.example/p"
        }
        assert(t === expect, s"j=$j m=$m")
      }
    }
  }

  test("wat: fixture facts match the documented arithmetic; file arm is lenient") {
    Seq(2L, 7L).foreach { id => // gzip member-per-record / plain
      val f = graft.sources.WarcSource.parseWarc(
        WatSource.watOf(id))
      val meta = f.records.filter(_.warcType == "metadata")
      assert(meta.size === (id % 3 + 1).toInt)
      meta.zipWithIndex.foreach { case (r, j) =>
        val w = WatSource.watFacts(r.body)
        assert(w.uri === s"http://site${id % 7}.example/$id/$j")
        assert(w.title === s"doc $id $j")
        assert(w.nLinks === ((id + j) % 4 + 1).toInt)
        assert(w.status === (if ((id + j) % 5 == 0) 404 else 200))
      }
    }
    // python validates the whole fixture envelope (foreign reader)
    val body = graft.sources.WarcSource.parseWarc(WatSource.watOf(4L))
      .records.filter(_.warcType == "metadata").head.body
    val py = python(
      """import json, sys
        |v = json.load(sys.stdin)
        |m = v["Envelope"]["Payload-Metadata"]["HTTP-Response-Metadata"]
        |print(m["HTML-Metadata"]["Head"]["Title"],
        |      len(m["HTML-Metadata"]["Links"]),
        |      m["Response-Message"]["Status"])""".stripMargin, body)
    assert(py.trim === "doc 4 0 1 200")

    val dir = java.nio.file.Files.createTempDirectory("watspec").toFile
    try {
      Seq(2L, 7L).foreach { id =>
        val ext = if (id % 2 == 0) "warc.wat.gz" else "warc.wat"
        java.nio.file.Files.write(new java.io.File(dir, s"d$id.$ext").toPath,
          WatSource.watOf(id))
      }
      val rows = WatSource.watFiles(spark, dir.getAbsolutePath + "/*.wat*")
        .collect()
      assert(rows.length === 5) // k=3 + k=2
      assert(rows.forall(r => r.getInt(4) == 200 || r.getInt(4) == 404))
      // a damaged file poisons with uri NULL; survivors intact
      java.nio.file.Files.write(new java.io.File(dir, "bad.warc.wat").toPath,
        "not a wat".getBytes("UTF-8"))
      val withBad = WatSource.watFiles(spark, dir.getAbsolutePath + "/*.wat*")
        .collect()
      assert(withBad.length === 6)
      assert(withBad.count(_.isNullAt(1)) === 1)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("wat: streaming ingestion appends exactly-once across files and restarts") {
    val root = java.nio.file.Files.createTempDirectory("watstream").toFile
    val landing = new java.io.File(root, "landing"); landing.mkdirs()
    val out = new java.io.File(root, "out").getAbsolutePath
    val ckpt = new java.io.File(root, "ckpt").getAbsolutePath
    try {
      java.nio.file.Files.write(
        new java.io.File(landing, "d2.warc.wat.gz").toPath,
        WatSource.watOf(2L))
      val q = graft.streaming.StreamingAnalytics.watIngest(
        spark, landing.getAbsolutePath, out, ckpt)
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() === 3) // id=2 -> k=3 captures
      // a second landing file appends only its own rows; a damaged one
      // poisons as a single uri-NULL row without wedging the stream
      java.nio.file.Files.write(
        new java.io.File(landing, "d7.warc.wat").toPath, WatSource.watOf(7L))
      java.nio.file.Files.write(
        new java.io.File(landing, "bad.warc.wat").toPath,
        "not a wat".getBytes("UTF-8"))
      q.processAllAvailable()
      q.stop()
      val rows = spark.read.parquet(out)
      assert(rows.count() === 6) // 3 + 2 + 1 poison
      assert(rows.filter(rows("uri").isNull).count() === 1)
      // restart from the checkpoint: nothing replays, nothing duplicates
      val q2 = graft.streaming.StreamingAnalytics.watIngest(
        spark, landing.getAbsolutePath, out, ckpt)
      q2.processAllAvailable()
      q2.stop()
      val after = spark.read.parquet(out)
      assert(after.count() === 6)
      assert(after.filter(after("uri").isNotNull)
        .select("uri").distinct().count() === 5)
    } finally {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm)
        x.delete()
      }
      rm(root)
    }
  }
}
