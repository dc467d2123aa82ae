package graft

import graft.sources.Brotli

/** Brotli (RFC 7932) decoder vs the system encoder/decoder, both
  * directions: real compressed streams across qualities, window sizes,
  * and content shapes decode byte-identically; the engine's stored-
  * metablock encoder is accepted by the reference decoder; hostile
  * truncation/flip input surfaces as typed data-damage errors; the
  * output bound holds before inflation.
  */
class BrotliSpec extends GraftSparkSpec {

  // brotlicffi lives in the conda python on this box; plain python3 is
  // the fallback for environments that install it system-wide
  private val pythons =
    Seq("/root/miniconda/bin/python3", "python3")

  private def python(script: String): String = {
    val exe = pythons.find(p => p.startsWith("python") ||
      new java.io.File(p).canExecute).getOrElse(pythons.last)
    val pb = new ProcessBuilder(exe, "-c", script)
    pb.redirectErrorStream(true)
    val p = pb.start()
    p.getOutputStream.close()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    assert(p.waitFor() === 0, s"python failed: $out")
    out
  }

  private def withTempDir[A](f: java.io.File => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("brotli").toFile
    try f(dir)
    finally { dir.listFiles().foreach(_.delete()); dir.delete() }
  }

  /** The corpus generator both directions share: varied shapes chosen to
    * exercise every decoder path — dictionary+transform-heavy English,
    * context modeling over UTF-8, uncompressed metablocks (incompressible
    * random), long-range copies (zeros, repeated blocks), tiny inputs.
    */
  private val genInputs =
    """import random
      |def inputs():
      |    rnd = random.Random(7)
      |    eng = (b'The quick brown fox jumps over the lazy dog. '
      |           b'Information about the documentation of the '
      |           b'implementation, which was not available before the '
      |           b'development of this function and the description. ')
      |    html = b''.join(
      |        b'<div class="row"><a href="/item/%d">Item %d</a>'
      |        b'<p>Some description of the element number %d with '
      |        b'additional text about the world.</p></div>' % (i, i, i)
      |        for i in range(500))
      |    utf8 = ('привет мир '
      |            '世界你好 مرحبا '
      |            'café \U0001f600 ').encode('utf-8') * 400
      |    rand = rnd.randbytes(300000)
      |    block = rnd.randbytes(4096)
      |    longrep = b''.join(block[:rnd.randrange(1024, 4096)]
      |                       for _ in range(300))
      |    return [(b'empty', b''), (b'one', b'a'), (b'eng', eng * 40),
      |            (b'html', html), (b'utf8', utf8), (b'rand', rand),
      |            (b'zeros', bytes(1 << 20)), (b'longrep', longrep)]
      |""".stripMargin

  test("decode: real-encoder streams roundtrip across qualities, windows, shapes") {
    withTempDir { dir =>
      val listing = python(
        s"""$genInputs
           |import brotlicffi, os
           |out = []
           |d = ${"\"" + dir.getAbsolutePath + "\""}
           |for name, data in inputs():
           |    open(os.path.join(d, name.decode() + '.in'), 'wb').write(data)
           |    cases = [(q, 22) for q in (0, 1, 2, 5, 7, 9, 11)]
           |    cases += [(5, w) for w in (10, 18, 24)]
           |    cases += [(11, w) for w in (10, 18, 24)]
           |    for q, w in cases:
           |        c = brotlicffi.compress(data, quality=q, lgwin=w)
           |        fn = '%s_q%d_w%d.br' % (name.decode(), q, w)
           |        open(os.path.join(d, fn), 'wb').write(c)
           |        out.append(fn)
           |print('\\n'.join(out))""".stripMargin)
      val cases = listing.split("\n").filter(_.nonEmpty)
      assert(cases.length === 8 * 13)
      cases.foreach { fn =>
        val name = fn.split("_")(0)
        val want = java.nio.file.Files.readAllBytes(
          new java.io.File(dir, name + ".in").toPath)
        val c = java.nio.file.Files.readAllBytes(
          new java.io.File(dir, fn).toPath)
        val got = Brotli.decode(c)
        assert(java.util.Arrays.equals(got, want),
          s"$fn: got ${got.length} bytes, want ${want.length}")
      }
    }
  }

  test("encodeStored: the reference decoder accepts our stored streams; own decode roundtrips") {
    val rnd = new scala.util.Random(11)
    val datas = Seq(
      Array.emptyByteArray,
      Array[Byte](42),
      { val a = new Array[Byte](200000); rnd.nextBytes(a); a }) // >64K: multi-metablock
    withTempDir { dir =>
      datas.zipWithIndex.foreach { case (d, i) =>
        java.nio.file.Files.write(new java.io.File(dir, s"$i.br").toPath,
          Brotli.encodeStored(d))
        java.nio.file.Files.write(new java.io.File(dir, s"$i.in").toPath, d)
        // own roundtrip
        assert(java.util.Arrays.equals(Brotli.decode(Brotli.encodeStored(d)), d))
      }
      val out = python(
        s"""import brotlicffi
           |d = ${"\"" + dir.getAbsolutePath + "\""}
           |for i in range(3):
           |    c = open('%s/%d.br' % (d, i), 'rb').read()
           |    raw = open('%s/%d.in' % (d, i), 'rb').read()
           |    assert brotlicffi.decompress(c) == raw, i
           |print('OK')""".stripMargin)
      assert(out.trim === "OK")
    }
  }

  test("encode: compressed streams decode identically in BOTH decoders and actually compress") {
    withTempDir { dir =>
      // the same corpus shapes as the decode matrix, compressed by the
      // ENGINE this time, decompressed by the system brotli
      python(
        s"""$genInputs
           |import os
           |d = ${"\"" + dir.getAbsolutePath + "\""}
           |for name, data in inputs():
           |    open(os.path.join(d, name.decode() + '.in'), 'wb').write(data)
           |print('ok')""".stripMargin)
      val names = Seq("empty", "one", "eng", "html", "utf8", "rand",
        "zeros", "longrep")
      names.foreach { name =>
        val data = java.nio.file.Files.readAllBytes(
          new java.io.File(dir, name + ".in").toPath)
        val c = Brotli.encode(data)
        java.nio.file.Files.write(
          new java.io.File(dir, name + ".enc.br").toPath, c)
        // own decoder roundtrip
        assert(java.util.Arrays.equals(Brotli.decode(c), data),
          s"$name: own decode mismatch")
        // compressible shapes must actually shrink; incompressible ones
        // must not inflate past framing
        if (name == "eng" || name == "html" || name == "zeros")
          assert(c.length < data.length / 3, s"$name: ratio ${c.length}/${data.length}")
        assert(c.length <= data.length + data.length / (1 << 16) * 4 + 16,
          s"$name: inflated ${c.length}/${data.length}")
      }
      val out = python(
        s"""import brotlicffi
           |d = ${"\"" + dir.getAbsolutePath + "\""}
           |for n in ['empty', 'one', 'eng', 'html', 'utf8', 'rand',
           |          'zeros', 'longrep']:
           |    c = open('%s/%s.enc.br' % (d, n), 'rb').read()
           |    raw = open('%s/%s.in' % (d, n), 'rb').read()
           |    assert brotlicffi.decompress(c) == raw, n
           |print('OK')""".stripMargin)
      assert(out.trim === "OK")
    }
  }

  test("encode: randomized stride/dictionary/binary fuzz roundtrips; system arbitrates a sample") {
    // the r19 encoder added two command forms — distance-code-0 reuse
    // and static-dictionary references — so the fuzz targets their
    // trigger shapes: fixed-stride repeats (the ring-reuse shape),
    // English built from common dictionary words, long runs, raw
    // randomness, and concatenated mixtures. Every case roundtrips
    // through the own decoder; a sample is decoded by the SYSTEM
    // brotli so an emission quirk our own decoder happens to tolerate
    // cannot hide.
    val rnd = new scala.util.Random(4719)
    val words = Seq("the", "of", "and", "that", "with", "from", "this",
      "world", "information", "different", "because", "people", "about",
      "through", "government", "development")
    def gen(): Array[Byte] = rnd.nextInt(5) match {
      case 0 =>
        val stride = rnd.nextInt(30) + 4
        val unit = Array.fill(stride)((rnd.nextInt(4) + 'a').toByte)
        Array.fill(rnd.nextInt(50) + 2)(unit).flatten
      case 1 =>
        (0 until rnd.nextInt(400) + 1)
          .map(_ => words(rnd.nextInt(words.size))).mkString(" ")
          .getBytes("UTF-8")
      case 2 =>
        Array.fill(rnd.nextInt(5000))(rnd.nextInt(256).toByte)
      case 3 =>
        val zeros = new Array[Byte](rnd.nextInt(3000) + 10)
        val island = Array.fill(rnd.nextInt(40))(rnd.nextInt(256).toByte)
        zeros ++ island ++ zeros
      case _ =>
        val a = (0 until rnd.nextInt(100) + 1)
          .map(_ => words(rnd.nextInt(words.size))).mkString(" ")
          .getBytes("UTF-8")
        val b = Array.fill(rnd.nextInt(500))(rnd.nextInt(256).toByte)
        val unit = Array.fill(rnd.nextInt(12) + 4)('x'.toByte)
        a ++ b ++ Array.fill(rnd.nextInt(30) + 1)(unit).flatten ++ a
    }
    val cases = (0 until 200).map(_ => gen())
    cases.zipWithIndex.foreach { case (data, i) =>
      val c = Brotli.encode(data)
      assert(java.util.Arrays.equals(Brotli.decode(c), data),
        s"fuzz case $i (len ${data.length}) roundtrip mismatch")
      assert(c.length <= data.length + data.length / (1 << 16) * 4 + 16,
        s"fuzz case $i inflated: ${c.length}/${data.length}")
    }
    withTempDir { dir =>
      val sample = cases.grouped(7).map(_.head).toSeq // every 7th
      sample.zipWithIndex.foreach { case (data, i) =>
        java.nio.file.Files.write(
          new java.io.File(dir, s"f$i.in").toPath, data)
        java.nio.file.Files.write(
          new java.io.File(dir, s"f$i.br").toPath, Brotli.encode(data))
      }
      val out = python(
        s"""import brotlicffi
           |d = ${"\"" + dir.getAbsolutePath + "\""}
           |for i in range(${sample.size}):
           |    c = open('%s/f%d.br' % (d, i), 'rb').read()
           |    raw = open('%s/f%d.in' % (d, i), 'rb').read()
           |    assert brotlicffi.decompress(c) == raw, i
           |print('OK')""".stripMargin)
      assert(out.trim === "OK")
    }
  }

  test("encode: multi-metablock (>4 MiB) and window-boundary inputs roundtrip") {
    val rnd = new scala.util.Random(23)
    // 6 MiB of structured text: spans two compressed metablocks
    val sb = new StringBuilder
    while (sb.length < (6 << 20))
      sb.append("record ").append(rnd.nextInt(1000))
        .append(" of the corpus with some description text; ")
    val big = sb.toString.getBytes("UTF-8")
    val c = Brotli.encode(big)
    assert(java.util.Arrays.equals(Brotli.decode(c), big))
    assert(c.length < big.length / 2)
    // exactly-window-sized and window+1 inputs (wbits selection edges)
    Seq((1 << 16) - 16, (1 << 16) - 15, 65536).foreach { n =>
      val d = new Array[Byte](n)
      rnd.nextBytes(d)
      assert(java.util.Arrays.equals(Brotli.decode(Brotli.encode(d)), d))
    }
    // fibonacci-skewed literal frequencies force a Huffman deeper than
    // 15 — the length-limit clamp + Kraft fixup must still emit a
    // complete code (an incomplete one fails the own decoder loudly)
    val skew = scala.collection.mutable.ArrayBuffer[Byte]()
    var (a, b) = (1L, 1L)
    (0 until 24).foreach { i =>
      (0L until math.min(a, 100000L)).foreach(_ => skew += i.toByte)
      val t = a + b; a = b; b = t
    }
    val sk = skew.toArray
    assert(java.util.Arrays.equals(Brotli.decode(Brotli.encode(sk)), sk))
    // a repeated random 256-byte permutation: LZ eats the repeats, the
    // literal histogram is EXACTLY uniform over all 256 bytes → every
    // length 8, single-symbol code-length code — the decoder reads
    // ZERO bits per symbol length there (auto-fill), so the emitter
    // must too
    val perm = rnd.shuffle((0 until 256).toVector).map(_.toByte).toArray
    val rep = Array.fill(1000)(perm).flatten
    val repC = Brotli.encode(rep)
    assert(java.util.Arrays.equals(Brotli.decode(repC), rep))
    assert(repC.length < rep.length / 10) // the compressed path ran
    // arbiter the zero-bit code-length-code stream against the system
    // decoder too — own-encode/own-decode agreement alone could hide a
    // shared misunderstanding of the auto-fill rule
    withTempDir { dir =>
      java.nio.file.Files.write(new java.io.File(dir, "rep.br").toPath, repC)
      java.nio.file.Files.write(new java.io.File(dir, "rep.in").toPath, rep)
      val out = python(
        s"""import brotlicffi
           |d = ${"\"" + dir.getAbsolutePath + "\""}
           |assert brotlicffi.decompress(open(d + '/rep.br', 'rb').read()) \\
           |    == open(d + '/rep.in', 'rb').read()
           |print('OK')""".stripMargin)
      assert(out.trim === "OK")
    }
  }

  test("decode: metadata metablocks are skipped; empty stream decodes") {
    // WBITS=16, non-last metadata metablock (no skip bytes), last-empty
    assert(Brotli.decode(Array[Byte](0x0c, 0x03)).isEmpty)
    // same with MSKIPBYTES=1, skip length 3 (stored 2), 3 payload bytes
    // bits: 0 | 0 | 11 | 0 | 01 | 00000010 (pad=0) then 3 bytes, then 0x03
    val bits = new java.io.ByteArrayOutputStream()
    var cur = 0; var n = 0
    def w(v: Int, k: Int): Unit = (0 until k).foreach { i =>
      cur |= ((v >> i) & 1) << n; n += 1
      if (n == 8) { bits.write(cur); cur = 0; n = 0 }
    }
    w(0, 1); w(0, 1); w(3, 2); w(0, 1); w(1, 2); w(2, 8)
    if (n > 0) { bits.write(cur); cur = 0; n = 0 }
    bits.write(Array[Byte](9, 9, 9)); bits.write(0x03)
    assert(Brotli.decode(bits.toByteArray).isEmpty)
  }

  test("hostile: truncation and byte flips surface as typed errors, never hangs or leaks") {
    withTempDir { dir =>
      python(
        s"""$genInputs
           |import brotlicffi
           |data = dict(inputs())[b'eng']
           |c = brotlicffi.compress(data, quality=11, lgwin=22)
           |open('${dir.getAbsolutePath}/eng.br', 'wb').write(c)
           |open('${dir.getAbsolutePath}/eng.in', 'wb').write(data)""".stripMargin)
      val c = java.nio.file.Files.readAllBytes(
        new java.io.File(dir, "eng.br").toPath)
      val want = java.nio.file.Files.readAllBytes(
        new java.io.File(dir, "eng.in").toPath)
      // every proper prefix must fail loudly (missing bits = damage)
      (0 until c.length).foreach { k =>
        intercept[IllegalArgumentException] {
          Brotli.decode(java.util.Arrays.copyOfRange(c, 0, k))
        }
      }
      // flips either throw the typed error or decode to SOMETHING (a
      // literal-byte flip legally changes content) — never another
      // exception class, never unbounded output
      var flippedOk = 0
      (0 until c.length).foreach { k =>
        val m = c.clone(); m(k) = (m(k) ^ 0x41).toByte
        try {
          val out = Brotli.decode(m, maxOut = want.length * 4L + 1024)
          flippedOk += 1
          assert(out.length <= want.length * 4 + 1024)
        } catch { case _: IllegalArgumentException => () }
      }
      info(s"flips decoded: $flippedOk / ${c.length}")
    }
  }

  test("hostile: pure-random inputs only ever fail typed, bounded, and fast") {
    // beyond the flip sweep: 20k seeded random byte strings (lengths
    // 0..512) — every decode must either succeed (vanishingly rare) or
    // throw the typed data error; nothing else may escape, and output
    // stays under the bound
    val rnd = new scala.util.Random(1009)
    var decoded = 0
    (0 until 20000).foreach { i =>
      val d = new Array[Byte](rnd.nextInt(513))
      rnd.nextBytes(d)
      try {
        val out = Brotli.decode(d, maxOut = 1 << 22)
        decoded += 1
        assert(out.length <= (1 << 22))
      } catch { case _: IllegalArgumentException => () }
    }
    info(s"random inputs that decoded: $decoded / 20000")
  }

  test("decode: the output bound is enforced before inflation") {
    withTempDir { dir =>
      python(
        s"""import brotlicffi
           |c = brotlicffi.compress(bytes(1 << 22), quality=9)
           |open('${dir.getAbsolutePath}/z.br', 'wb').write(c)""".stripMargin)
      val c = java.nio.file.Files.readAllBytes(
        new java.io.File(dir, "z.br").toPath)
      val e = intercept[IllegalArgumentException] {
        Brotli.decode(c, maxOut = 1000)
      }
      assert(e.getMessage.contains("output exceeds bound"))
      assert(Brotli.decode(c).length === (1 << 22))
    }
  }
}
