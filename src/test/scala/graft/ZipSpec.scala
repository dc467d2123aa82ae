package graft

import graft.sources.ZipSource

/** ZIP walker: system zip/unzip interop in BOTH directions, EOCD
  * comment scan-back, stored+deflate round-trips, CRC/encryption/zip64
  * tripwires, and the seek-based file arm.
  */
class ZipSpec extends GraftSparkSpec {

  private def run(cmd: Seq[String], cwd: java.io.File,
                  stdin: String = null): String = {
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(cwd); pb.redirectErrorStream(true)
    val p = pb.start()
    if (stdin != null) {
      p.getOutputStream.write(stdin.getBytes("UTF-8"))
    }
    p.getOutputStream.close()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    assert(p.waitFor() === 0, s"${cmd.mkString(" ")} failed: $out")
    out
  }

  private def withTmp[A](f: java.io.File => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("zipspec").toFile
    try f(dir) finally {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm)
        x.delete()
      }
      rm(dir)
    }
  }

  test("zip: the system unzip validates and extracts our writer's bytes") {
    withTmp { dir =>
      val bytes = ZipSource.zipOf(Seq(
        ("a.txt", "hello zip".getBytes("UTF-8"), false),
        ("b/c.bin", Array.tabulate(700)(_.toByte), true)),
        comment = "our comment")
      val f = new java.io.File(dir, "ours.zip")
      java.nio.file.Files.write(f.toPath, bytes)
      run(Seq("unzip", "-t", "ours.zip"), dir) // integrity (CRC) pass
      val listing = run(Seq("unzip", "-Z1", "ours.zip"), dir)
      assert(listing.split("\n").toSeq === Seq("a.txt", "b/c.bin"))
      assert(run(Seq("unzip", "-p", "ours.zip", "a.txt"), dir) === "hello zip")
      run(Seq("unzip", "-q", "ours.zip"), dir)
      assert(java.nio.file.Files.readAllBytes(
        new java.io.File(dir, "b/c.bin").toPath).toSeq ===
        Array.tabulate(700)(_.toByte).toSeq)
    }
  }

  test("zip: we parse system-zip archives — deflate, stored, archive comment") {
    withTmp { dir =>
      java.nio.file.Files.write(new java.io.File(dir, "x.txt").toPath,
        ("repeat " * 50).getBytes("UTF-8"))
      java.nio.file.Files.write(new java.io.File(dir, "y.txt").toPath,
        "tiny".getBytes("UTF-8"))
      run(Seq("zip", "-q", "-9", "theirs.zip", "x.txt"), dir)
      run(Seq("zip", "-q", "-0", "theirs.zip", "y.txt"), dir) // stored
      run(Seq("zip", "-q", "-z", "theirs.zip"), dir,
        stdin = "their comment\n")
      val in = new ZipSource.BytesSeekable(java.nio.file.Files.readAllBytes(
        new java.io.File(dir, "theirs.zip").toPath))
      val d = ZipSource.readDirectory(in)
      assert(d.comment === "their comment")
      assert(d.entries.map(_.name).toSet === Set("x.txt", "y.txt"))
      val x = d.entries.find(_.name == "x.txt").get
      val y = d.entries.find(_.name == "y.txt").get
      assert(x.method === 8 && x.csize < x.usize) // really deflated
      assert(y.method === 0 && y.csize === y.usize)
      assert(new String(ZipSource.entryBytes(in, x), "UTF-8") ===
        "repeat " * 50)
      assert(new String(ZipSource.entryBytes(in, y), "UTF-8") === "tiny")
    }
  }

  test("zip64: our forced form is read by unzip and python zipfile; we read python's forced form") {
    withTmp { dir =>
      // ours -> foreign readers
      val bytes = ZipSource.zipOf(Seq(
        ("a.txt", "zip64 hello".getBytes("UTF-8"), false),
        ("b.bin", Array.tabulate(300)(_.toByte), true)),
        comment = "sixty-four", zip64 = true)
      java.nio.file.Files.write(new java.io.File(dir, "ours64.zip").toPath, bytes)
      run(Seq("unzip", "-t", "ours64.zip"), dir) // CRC pass over zip64 layout
      assert(run(Seq("unzip", "-p", "ours64.zip", "a.txt"), dir) === "zip64 hello")
      val py = run(Seq("python3", "-c",
        """import zipfile
          |z = zipfile.ZipFile("ours64.zip")
          |print(z.testzip() is None)
          |print(z.read("a.txt").decode())
          |print(len(z.read("b.bin")))""".stripMargin), dir)
      assert(py.split("\n").take(3).toSeq === Seq("True", "zip64 hello", "300"))

      // foreign writer -> us: python's zipfile with force_zip64 writes
      // saturated local+central sizes resolved by 0x0001 extras
      run(Seq("python3", "-c",
        """import zipfile
          |z = zipfile.ZipFile("theirs64.zip", "w", allowZip64=True)
          |with z.open("p.txt", "w", force_zip64=True) as f:
          |    f.write(b"forced " * 40)
          |z.writestr("q.txt", "small entry")
          |z.close()""".stripMargin), dir)
      val in = new ZipSource.BytesSeekable(java.nio.file.Files.readAllBytes(
        new java.io.File(dir, "theirs64.zip").toPath))
      val d = ZipSource.readDirectory(in)
      assert(d.entries.map(_.name).toSet === Set("p.txt", "q.txt"))
      val p = d.entries.find(_.name == "p.txt").get
      assert(new String(ZipSource.entryBytes(in, p), "UTF-8") === "forced " * 40)
      // APPNOTE also lets a zip64 writer saturate the EOCD's disk
      // fields to 0xFFFF (real values live in the EOCD64): that form
      // must parse, not trip the multi-disk reject
      val sat = bytes.clone()
      val eocdAt = sat.length - 22 - "sixty-four".length
      assert((sat(eocdAt) & 0xff) === 0x50 && (sat(eocdAt + 1) & 0xff) === 0x4b)
      sat(eocdAt + 4) = 0xff.toByte; sat(eocdAt + 5) = 0xff.toByte
      sat(eocdAt + 6) = 0xff.toByte; sat(eocdAt + 7) = 0xff.toByte
      val satIn = new ZipSource.BytesSeekable(sat)
      assert(ZipSource.readDirectory(satIn).entries.map(_.name) ===
        Seq("a.txt", "b.bin"))
      // round-trip our zip64 through our own reader too
      val ours = new ZipSource.BytesSeekable(bytes)
      val od = ZipSource.readDirectory(ours)
      assert(od.comment === "sixty-four")
      assert(od.entries.map(_.name) === Seq("a.txt", "b.bin"))
      assert(new String(ZipSource.entryBytes(ours, od.entries.head), "UTF-8")
        === "zip64 hello")
      assert(ZipSource.entryBytes(ours, od.entries(1)).toSeq ===
        Array.tabulate(300)(_.toByte).toSeq)
    }
  }

  test("zip: hostile EOCD directory size is bounded before allocation") {
    val good = ZipSource.zipOf(Seq(
      ("a.txt", "bound me".getBytes("UTF-8"), true)))
    val c = good.clone()
    val eocd = c.length - 22
    // claim a ~1.9 GiB directory for a 1-entry archive
    c(eocd + 12) = 0x00.toByte; c(eocd + 13) = 0x00.toByte
    c(eocd + 14) = 0x00.toByte; c(eocd + 15) = 0x78.toByte
    val e = intercept[IllegalArgumentException] {
      ZipSource.readDirectory(new ZipSource.BytesSeekable(c))
    }
    assert(e.getMessage.contains("exceeds 1 entries' maximum") ||
      e.getMessage.contains("out of bounds"))
  }

  test("zip: CRC damage, encryption, and zip64 reject loudly by name") {
    val good = ZipSource.zipOf(Seq(
      ("a.txt", ("payload " * 20).getBytes("UTF-8"), false)))
    // flip a deflate byte: entry decode fails its CRC (or the inflate)
    val c1 = good.clone(); c1(40) = (c1(40) ^ 0x08).toByte
    val in1 = new ZipSource.BytesSeekable(c1)
    val e1 = intercept[Exception] {
      ZipSource.entryBytes(in1, ZipSource.readDirectory(in1).entries.head)
    }
    assert(e1.getMessage.contains("CRC") ||
      e1.getMessage.contains("deflate") || e1.getMessage.contains("size"))
    // set the encryption bit in the central entry's flags
    val c2 = good.clone()
    val cdOff = c2.length - 22 - 46 - 5 // EOCD(22) + central(46+name 5)
    assert((c2(cdOff) & 0xff) === 0x50 && (c2(cdOff + 1) & 0xff) === 0x4b)
    c2(cdOff + 8) = 1 // flags low byte
    val e2 = intercept[IllegalArgumentException] {
      ZipSource.readDirectory(new ZipSource.BytesSeekable(c2))
    }
    assert(e2.getMessage.contains("encrypted"))
    // zip64 sentinel: total entry count 0xFFFF in the EOCD
    val c3 = good.clone()
    val eocd = c3.length - 22
    c3(eocd + 10) = 0xff.toByte; c3(eocd + 11) = 0xff.toByte
    val e3 = intercept[Exception] {
      ZipSource.readDirectory(new ZipSource.BytesSeekable(c3))
    }
    assert(e3.getMessage.contains("zip64"))
  }

  test("zip: fixture facts match the documented arithmetic") {
    Seq(0L, 4L, 7L).foreach { id => // 0: comment+stored; 4: k=2; 7: k=2
      val in = new ZipSource.BytesSeekable(
        ZipSource.zipFixtureOf(id, "some doc text"))
      val d = ZipSource.readDirectory(in)
      val k = (id % 3 + 1).toInt
      assert(d.entries.size === k)
      assert(d.entries.count(_.method == 0) ===
        (0 until k).count(j => (id + j) % 4 == 0))
      assert(d.comment === (if (id % 5 == 0) s"doc $id" else ""))
      assert(new String(ZipSource.entryBytes(in,
        d.entries.find(_.name == "e0.txt").get), "UTF-8") === "some doc text")
    }
  }

  test("zip: streaming ingestion is exactly-once across restarts; damage poisons under lenient") {
    withTmp { root =>
      val landing = new java.io.File(root, "landing"); landing.mkdirs()
      val out = new java.io.File(root, "out").getAbsolutePath
      val ckpt = new java.io.File(root, "ckpt").getAbsolutePath
      java.nio.file.Files.write(new java.io.File(landing, "d2.zip").toPath,
        ZipSource.zipFixtureOf(2L, "first")) // k=3 entries
      java.nio.file.Files.write(new java.io.File(landing, "bad.zip").toPath,
        "no EOCD anywhere in this file at all......".getBytes("UTF-8"))
      val q = graft.streaming.StreamingAnalytics.zipIngest(
        spark, landing.getAbsolutePath, out, ckpt)
      q.processAllAvailable()
      q.stop()
      val rows = spark.read.parquet(out).collect()
      assert(rows.count(!_.isNullAt(1)) === 3) // d2's entries
      val poison = rows.filter(_.isNullAt(1))
      assert(poison.length === 1 && poison.head.getString(0).endsWith("bad.zip"))
      // restart: nothing replays
      val q2 = graft.streaming.StreamingAnalytics.zipIngest(
        spark, landing.getAbsolutePath, out, ckpt)
      q2.processAllAvailable()
      q2.stop()
      assert(spark.read.parquet(out).count() === rows.length)
    }
  }

  test("zip: coincidental PK\\x06\\x07 before the EOCD does not mis-detect zip64") {
    // the last CD entry's NAME is the final thing before the EOCD, so a
    // name whose last 20 bytes start with the locator signature plants
    // PK\x06\x07 exactly 20 bytes before the EOCD — a legal classic
    // archive that a signature-only sniff rejected as zip64 (ADVICE r17):
    // the locator CHAIN must validate before committing to the branch
    val name = "PK" + "A" * 16
    val data = "coincidence".getBytes("UTF-8")
    val bytes = ZipSource.zipOf(Seq((name, data, true)))
    val dir = ZipSource.readDirectory(new ZipSource.BytesSeekable(bytes))
    assert(dir.entries.map(_.name) === Seq(name))
    assert(ZipSource.entryBytes(new ZipSource.BytesSeekable(bytes),
      dir.entries.head).sameElements(data))
    // a REAL zip64 archive still resolves through its locator
    val z64 = ZipSource.zipOf(Seq(("e.txt", data, false)), zip64 = true)
    val d64 = ZipSource.readDirectory(new ZipSource.BytesSeekable(z64))
    assert(d64.entries.map(_.name) === Seq("e.txt"))
  }

  test("zip: file-path arm seeks the directory and CRC-checks every entry") {
    withTmp { dir =>
      Seq(2L, 5L).foreach { id =>
        java.nio.file.Files.write(new java.io.File(dir, s"d$id.zip").toPath,
          ZipSource.zipFixtureOf(id, s"text for $id"))
      }
      val rows = ZipSource.zipFiles(spark, dir.getAbsolutePath + "/*.zip")
        .collect()
      // id=2 -> k=3 entries, id=5 -> k=3
      assert(rows.length === 6)
      assert(rows.forall(_.getBoolean(4)))
      assert(rows.map(_.getString(1)).toSet === Set("e0.txt", "e1.txt", "e2.txt"))
    }
  }
}
