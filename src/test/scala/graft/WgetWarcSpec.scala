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
}
