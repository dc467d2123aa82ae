package graft.tools

/** Throughput + pressure probe for the own RFC 7932 decoder
  * ([[graft.sources.Brotli]]): real-encoder streams produced by the
  * system brotli (via the conda python used by the spec arbiters), then
  * decoded by the engine. Three arms:
  *
  *  - one ~256 MB-output stream at quality 5 (the CDN default for
  *    dynamic content — what br-coded crawl bodies mostly are),
  *  - one ~32 MB-output stream at quality 11 (static-asset shape:
  *    heaviest context modeling + dictionary use),
  *  - 20k ~6 KB page entities decoded one by one (the WARC ingestion
  *    shape — per-entity table setup cost must amortize).
  *
  * Run OUTSIDE sbt (2g: the 256 MB-output arm holds the result array
  * plus one doubling copy):
  *   java -Xmx2g <add-opens flags>
  *     -cp "target/scala-2.13/classes:<spark jars>"
  *     graft.tools.BrotliScale
  * Every output is hash-checked against the pre-compression bytes, so
  * the MB/s numbers are for VERIFIED decodes.
  */
object BrotliScale {
  def main(args: Array[String]): Unit = {
    // `--file <path>`: ad-hoc encode probe over an arbitrary corpus —
    // prints the own encoder's ratio/throughput and roundtrips it
    if (args.length >= 2 && args(0) == "--file") {
      val data = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(args(1)))
      var c: Array[Byte] = null
      var best = Double.MaxValue
      val reps = sys.props.getOrElse("graft.brotli.reps", "3").toInt
      (0 until reps).foreach { _ => // best-of-N: JIT out of the measure
        val t0 = System.nanoTime()
        c = graft.sources.Brotli.encode(data)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      require(java.util.Arrays.equals(graft.sources.Brotli.decode(c), data),
        "roundtrip mismatch")
      println(f"encode-file: ${data.length / 1e6}%.1f MB -> " +
        f"${c.length / 1e6}%.2f MB (${c.length * 100.0 / data.length}%.2f%%)" +
        f" in $best%.2f s (${data.length / 1e6 / best}%.1f MB/s in)")
      if (sys.props.contains("graft.brotli.stats"))
        println("stats: " + graft.sources.Brotli.statLine())
      return
    }
    val dir = new java.io.File("/tmp/graft-brotliscale")
    if (!dir.exists()) {
      dir.mkdirs()
      val py =
        """import brotlicffi, hashlib, random
          |d = '/tmp/graft-brotliscale'
          |rnd = random.Random(5)
          |page = (b'<div class="entry"><h2>Entry %d</h2><p>The description '
          |        b'of the implementation of the function was not available '
          |        b'before the development of the documentation %d.</p>'
          |        b'<a href="/e/%d">more information</a></div>')
          |big = b''.join(page % (i, i * 7, i) for i in range(1500000))
          |open(d + '/big.in.sha', 'w').write(hashlib.sha256(big).hexdigest())
          |open(d + '/big.br', 'wb').write(
          |    brotlicffi.compress(big, quality=5, lgwin=22))
          |open(d + '/big.len', 'w').write(str(len(big)))
          |q11 = b''.join(page % (i, i * 3, i) for i in range(190000))
          |open(d + '/q11.in.sha', 'w').write(hashlib.sha256(q11).hexdigest())
          |open(d + '/q11.br', 'wb').write(
          |    brotlicffi.compress(q11, quality=11, lgwin=24))
          |open(d + '/q11.len', 'w').write(str(len(q11)))
          |import struct
          |pages = bytearray()
          |index = []
          |for i in range(20000):
          |    ent = page % (i, i * 13, i) * 18
          |    c = brotlicffi.compress(ent, quality=5)
          |    index.append((len(c), len(ent), hashlib.sha256(ent).digest()))
          |    pages += c
          |open(d + '/pages.br', 'wb').write(bytes(pages))
          |with open(d + '/pages.idx', 'wb') as f:
          |    for (cl, el, h) in index:
          |        f.write(struct.pack('<II', cl, el) + h)
          |print('fixture written')
          |""".stripMargin
      val pb = new ProcessBuilder("/root/miniconda/bin/python3", "-c", py)
      pb.redirectErrorStream(true)
      val p = pb.start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      require(p.waitFor() == 0, s"fixture generation failed: $out")
      println(out.trim)
    }

    val peak = new java.util.concurrent.atomic.AtomicLong(0L)
    val sampler = new Thread(() => {
      while (true) {
        val used = Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory
        var p = peak.get()
        while (used > p && !peak.compareAndSet(p, used)) p = peak.get()
        Thread.sleep(5)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    def sha(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("SHA-256").digest(b)
        .map(x => f"${x & 0xff}%02x").mkString

    def one(name: String): Unit = {
      val c = java.nio.file.Files.readAllBytes(
        new java.io.File(dir, s"$name.br").toPath)
      val wantSha = new String(java.nio.file.Files.readAllBytes(
        new java.io.File(dir, s"$name.in.sha").toPath), "UTF-8").trim
      val wantLen = new String(java.nio.file.Files.readAllBytes(
        new java.io.File(dir, s"$name.len").toPath), "UTF-8").trim.toLong
      // warm once (table load + JIT), then measure
      graft.sources.Brotli.decode(c)
      val t0 = System.nanoTime()
      val out = graft.sources.Brotli.decode(c)
      val secs = (System.nanoTime() - t0) / 1e9
      require(out.length == wantLen && sha(out) == wantSha, s"$name mismatch")
      println(f"$name%6s: ${c.length / 1e6}%8.1f MB in -> " +
        f"${out.length / 1e6}%8.1f MB out in $secs%6.2f s " +
        f"(${out.length / 1e6 / secs}%6.1f MB/s out)")
    }
    one("big")
    one("q11")

    val pagesC = java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "pages.br").toPath)
    val idx = java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "pages.idx").toPath)
    val n = idx.length / 40
    val md = java.security.MessageDigest.getInstance("SHA-256")
    var off = 0
    var outBytes = 0L
    val t0 = System.nanoTime()
    var i = 0
    while (i < n) {
      val bb = java.nio.ByteBuffer.wrap(idx, i * 40, 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val cl = bb.getInt(); val el = bb.getInt()
      val out = graft.sources.Brotli.decode(
        java.util.Arrays.copyOfRange(pagesC, off, off + cl))
      require(out.length == el, s"page $i length")
      md.reset()
      require(java.util.Arrays.equals(md.digest(out),
        java.util.Arrays.copyOfRange(idx, i * 40 + 8, i * 40 + 40)),
        s"page $i hash")
      outBytes += el
      off += cl
      i += 1
    }
    val secs = (System.nanoTime() - t0) / 1e9
    println(f" pages: $n%d entities, ${outBytes / 1e6}%8.1f MB out in " +
      f"$secs%6.2f s (${outBytes / 1e6 / secs}%6.1f MB/s, " +
      f"${n / secs}%8.0f entities/s)")

    // the ENCODE side: the own greedy compressed encoder over the big
    // corpus, verified by the own decoder
    val bigC = java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "big.br").toPath)
    val big = graft.sources.Brotli.decode(bigC)
    graft.sources.Brotli.encode(
      java.util.Arrays.copyOfRange(big, 0, 1 << 22)) // warm
    val e0 = System.nanoTime()
    val enc = graft.sources.Brotli.encode(big)
    val esecs = (System.nanoTime() - e0) / 1e9
    require(java.util.Arrays.equals(graft.sources.Brotli.decode(enc), big))
    println(f"encode: ${big.length / 1e6}%8.1f MB -> ${enc.length / 1e6}%8.1f MB " +
      f"(${enc.length * 100.0 / big.length}%5.1f%%) in $esecs%6.2f s " +
      f"(${big.length / 1e6 / esecs}%6.1f MB/s in)")
    println(f"peak heap: ${peak.get() / 1e6}%.0f MB")
  }
}
