package graft

import graft.sources.WarcSource

/** Foreign-producer WARC interop: GNU wget crawls a local HTTP server
  * with `--warc-file` and our walker parses the bytes wget actually
  * writes — warcinfo/request/response/metadata records, in BOTH the
  * uncompressed and the gzip (member-per-record) layouts. The same
  * both-directions discipline TarSpec/AvroContainerSpec established:
  * fixtures prove the grammar, a third-party writer proves the dialect.
  */
class WgetWarcSpec extends GraftSparkSpec {

  private def run(cmd: Seq[String], cwd: java.io.File,
                  okExit: Set[Int] = Set(0)): String = {
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(cwd); pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    assert(okExit(p.waitFor()), s"${cmd.mkString(" ")} failed: $out")
    out
  }

  private def withServer[A](docroot: java.io.File)(f: Int => A): A = {
    // ephemeral port: bind a ServerSocket to 0, free it, reuse the number
    val probe = new java.net.ServerSocket(0, 1,
      java.net.InetAddress.getByName("127.0.0.1"))
    val port = probe.getLocalPort
    probe.close()
    val pb = new ProcessBuilder("python3", "-m", "http.server",
      port.toString, "--bind", "127.0.0.1")
    pb.directory(docroot)
    pb.redirectOutput(ProcessBuilder.Redirect.DISCARD)
    pb.redirectErrorStream(true)
    val server = pb.start()
    try {
      // wait for readiness: poll the socket up to ~10 s
      var up = false
      var tries = 0
      while (!up && tries < 100) {
        try {
          val s = new java.net.Socket("127.0.0.1", port)
          s.close(); up = true
        } catch {
          case _: java.io.IOException => Thread.sleep(100); tries += 1
        }
      }
      assert(up, s"local http.server on $port never came up")
      f(port)
    } finally {
      server.destroy()
      server.waitFor(5, java.util.concurrent.TimeUnit.SECONDS)
    }
  }

  test("warc: wget-written archives parse — both compression layouts, record types, URIs, status") {
    val dir = java.nio.file.Files.createTempDirectory("wgetwarc").toFile
    val docroot = new java.io.File(dir, "root"); docroot.mkdirs()
    try {
      java.nio.file.Files.write(new java.io.File(docroot, "a.html").toPath,
        ("<html><head><title>pg a</title></head><body><h1>Alpha</h1>" +
          "<p>hello &amp; world</p></body></html>").getBytes("UTF-8"))
      java.nio.file.Files.write(new java.io.File(docroot, "b.html").toPath,
        "<html><body><p>beta page</p></body></html>".getBytes("UTF-8"))
      withServer(docroot) { port =>
        val base = s"http://127.0.0.1:$port"
        // uncompressed: plain concatenated records
        run(Seq("wget", "--warc-file=plain", "--no-warc-compression", "-q",
          "-O", "/dev/null", s"$base/a.html", s"$base/b.html"), dir)
        // default: gzip, one member per record (the spec annex layout)
        run(Seq("wget", "--warc-file=gz", "-q",
          "-O", "/dev/null", s"$base/a.html"), dir)

        val plain = WarcSource.parseWarc(java.nio.file.Files.readAllBytes(
          new java.io.File(dir, "plain.warc").toPath))
        assert(!plain.gzip && plain.nMembers === 0)
        val types = plain.records.map(_.warcType)
        assert(types.head === "warcinfo")
        assert(types.count(_ == "request") === 2)
        assert(types.count(_ == "response") === 2)
        assert(types.contains("metadata")) // wget's log record
        val resp = plain.records.filter(_.warcType == "response")
        assert(resp.map(_.targetUri).toSet ===
          Set(s"$base/a.html", s"$base/b.html"))
        assert(resp.forall(_.httpStatus === 200))
        assert(resp.forall(_.httpContentType.startsWith("text/html")))
        val a = resp.find(_.targetUri.endsWith("a.html")).get
        assert(WarcSource.htmlText(a.body) === "pg a Alpha hello & world")

        val gz = WarcSource.parseWarc(java.nio.file.Files.readAllBytes(
          new java.io.File(dir, "gz.warc.gz").toPath))
        assert(gz.gzip && gz.nMembers === gz.records.size) // member per record
        val gresp = gz.records.filter(_.warcType == "response")
        assert(gresp.map(_.targetUri) === Seq(s"$base/a.html"))
        assert(gresp.head.httpStatus === 200)
        assert(WarcSource.htmlText(gresp.head.body) ===
          "pg a Alpha hello & world")

        // the ingestion arm reads wget's files end-to-end (one task/file)
        val rows = WarcSource.warcFiles(spark, dir.getAbsolutePath + "/*.warc*")
          .collect()
        assert(rows.count(_.getInt(2) == 200) === 3) // 2 plain + 1 gz
        assert(rows.filter(_.getInt(2) == 200).forall(r =>
          r.getString(3).nonEmpty))
      }
    } finally {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm)
        x.delete()
      }
      rm(dir)
    }
  }

  test("cdx: generated index of wget archives fetches back record-for-record") {
    val dir = java.nio.file.Files.createTempDirectory("wgetcdx").toFile
    val docroot = new java.io.File(dir, "root"); docroot.mkdirs()
    try {
      Seq("a", "b", "c").foreach { p =>
        java.nio.file.Files.write(new java.io.File(docroot, s"$p.html").toPath,
          s"<html><body><p>page $p content</p></body></html>".getBytes("UTF-8"))
      }
      withServer(docroot) { port =>
        val base = s"http://127.0.0.1:$port"
        run(Seq("wget", "--warc-file=crawl", "-q", "-O", "/dev/null",
          s"$base/a.html", s"$base/b.html", s"$base/c.html"), dir)
        run(Seq("wget", "--warc-file=flat", "--no-warc-compression", "-q",
          "-O", "/dev/null", s"$base/a.html"), dir)
        // generation over a FOREIGN producer's bytes, both layouts
        Seq("crawl.warc.gz", "flat.warc").foreach { fname =>
          val bytes = java.nio.file.Files.readAllBytes(
            new java.io.File(dir, fname).toPath)
          val gen = graft.sources.CdxSource.generateCdx(
            new java.io.ByteArrayInputStream(bytes), fname).toSeq
          assert(gen.nonEmpty)
          assert(gen.forall(_.status == 200))
          assert(gen.forall(_.timestamp.matches("\\d{14}"))) // wget's WARC-Date
          val archive = new graft.sources.ZipSource.BytesSeekable(bytes)
          gen.foreach { e =>
            val r = graft.sources.CdxSource.fetchRecord(archive,
              e.offset, e.length, lenientHttp = true)
            assert(r.targetUri === e.url)
            assert(r.payloadDigest === e.digest) // wget writes sha1:base32
            assert(r.body.contains("content"))
          }
        }
        // the full Spark loop: warc-index arm -> fetchByIndex, exactly
        // the selective-refetch pipeline a crawl store runs
        val index = graft.sources.CdxSource.warcIndexFiles(spark,
          dir.getAbsolutePath + "/*.warc*")
        assert(index.filter(index("surt").isNull).count() === 0)
        val fetched = graft.sources.CdxSource.fetchByIndex(spark,
          dir.getAbsolutePath, index).collect()
        assert(fetched.length === 4) // 3 gz + 1 plain responses
        assert(fetched.forall(_.getInt(2) == 200))
        assert(fetched.forall(_.getString(3).contains("content")))
      }
    } finally {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm)
        x.delete()
      }
      rm(dir)
    }
  }

  /** Minimal raw-socket HTTP/1.1 server speaking the wire forms
    * python's http.server never emits: chunked transfer framing,
    * Content-Encoding: gzip, and both stacked — so wget records REAL
    * chunked/gzipped response bytes into the WARC and our decode path
    * is proven against a foreign producer, not our own fixture writer.
    */
  private def withRawServer[A](pages: Map[String, (String, String)])(f: Int => A): A = {
    val server = new java.net.ServerSocket(0, 8,
      java.net.InetAddress.getByName("127.0.0.1"))
    @volatile var running = true
    val t = new Thread(() => {
      while (running) {
        try {
          val s = server.accept()
          try {
            val in = s.getInputStream
            val req = new StringBuilder
            var prev4 = 0
            // stop EXACTLY at the header terminator — reading one byte
            // further would block: the client is now awaiting a response
            while (prev4 != 0x0d0a0d0a) {
              val b = in.read()
              if (b < 0) throw new java.io.EOFException("client closed")
              req.append(b.toChar)
              prev4 = (prev4 << 8) | b
            }
            val path = req.toString.split(" ")(1)
            val (mode, html) = pages.getOrElse(path, ("plain", "<p>404</p>"))
            val entity = html.getBytes("UTF-8")
            val out = new java.io.BufferedOutputStream(s.getOutputStream)
            def ascii(x: String): Unit = out.write(x.getBytes("ISO-8859-1"))
            def chunks(body: Array[Byte]): Unit = {
              var off = 0
              while (off < body.length) {
                val n = math.min(41, body.length - off)
                ascii(Integer.toHexString(n) + "\r\n")
                out.write(body, off, n); ascii("\r\n")
                off += n
              }
              ascii("0\r\nX-Served-By: raw\r\n\r\n")
            }
            val gz = graft.sources.WarcSource.gzipOne(entity)
            ascii("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
              "Connection: close\r\n")
            mode match {
              case "chunked" =>
                ascii("Transfer-Encoding: chunked\r\n\r\n"); chunks(entity)
              case "gzip" =>
                ascii("Content-Encoding: gzip\r\n" +
                  s"Content-Length: ${gz.length}\r\n\r\n")
                out.write(gz)
              case "both" =>
                ascii("Content-Encoding: gzip\r\n" +
                  "Transfer-Encoding: chunked\r\n\r\n"); chunks(gz)
              case _ =>
                ascii(s"Content-Length: ${entity.length}\r\n\r\n")
                out.write(entity)
            }
            out.flush()
          } finally s.close()
        } catch { case _: java.io.IOException => () } // closed during accept
      }
    })
    t.setDaemon(true); t.start()
    try f(server.getLocalPort)
    finally { running = false; server.close(); t.join(2000) }
  }

  test("warc: wget records chunked + content-gzipped wire forms; decode recovers the entity") {
    val dir = java.nio.file.Files.createTempDirectory("wgetchunk").toFile
    try {
      val pages = Map(
        "/chunked.html" -> ("chunked",
          "<html><body><h1>Chunky</h1><p>" + ("alpha beta " * 30).trim +
            "</p></body></html>"),
        "/gzip.html" -> ("gzip",
          "<html><body><p>gzip encoded entity body</p></body></html>"),
        "/both.html" -> ("both",
          "<html><body><p>" + ("stacked codings " * 20).trim +
            "</p></body></html>"))
      withRawServer(pages) { port =>
        val base = s"http://127.0.0.1:$port"
        run(Seq("wget", "--warc-file=wire", "--no-warc-compression", "-q",
          "-O", "/dev/null", "-t", "1",
          s"$base/chunked.html", s"$base/gzip.html", s"$base/both.html"),
          dir, okExit = Set(0, 8)) // 8 = some non-200 allowed; asserted below
        val raw = java.nio.file.Files.readAllBytes(
          new java.io.File(dir, "wire.warc").toPath)
        // the producer REALLY wrote chunk framing into the archive
        val rawStr = new String(raw, "ISO-8859-1")
        assert(rawStr.contains("Transfer-Encoding: chunked"))
        assert(rawStr.contains("Content-Encoding: gzip"))
        val f = WarcSource.parseWarc(raw)
        val resp = f.records.filter(_.warcType == "response")
        assert(resp.size === 3)
        pages.foreach { case (path, (_, html)) =>
          val r = resp.find(_.targetUri.endsWith(path)).get
          assert(r.httpStatus === 200)
          // byte count measures the DECODED entity, not the wire form
          assert(r.bodyBytes === html.getBytes("UTF-8").length.toLong)
          assert(r.body === html)
          assert(WarcSource.htmlText(r.body) === WarcSource.htmlText(html))
        }
      }
    } finally {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm)
        x.delete()
      }
      rm(dir)
    }
  }
}
