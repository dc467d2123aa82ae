package graft

import graft.sources.TarSource

/** ustar walker: system-tar interop in BOTH directions (it reads ours,
  * we read its — GNU and ustar formats, prefix-field long paths),
  * checksum/truncation/end-marker tripwires, and the WebDataset fixture
  * round-trip.
  */
class TarSpec extends GraftSparkSpec {

  private def run(cmd: Seq[String], cwd: java.io.File): String = {
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(cwd); pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    assert(p.waitFor() === 0, s"${cmd.mkString(" ")} failed: $out")
    out
  }

  private def withTmp[A](f: java.io.File => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("tarspec").toFile
    try f(dir) finally {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm)
        x.delete()
      }
      rm(dir)
    }
  }

  test("tar: the system tar binary lists and extracts our writer's bytes") {
    withTmp { dir =>
      val bytes = TarSource.tarOf(Seq(
        ("a.txt", "hello tar".getBytes("UTF-8")),
        ("b/c.bin", Array.tabulate(700)(_.toByte)))) // >512: block rounding
      val f = new java.io.File(dir, "ours.tar")
      java.nio.file.Files.write(f.toPath, bytes)
      val listing = run(Seq("tar", "-tf", "ours.tar"), dir)
      assert(listing.split("\n").toSeq === Seq("a.txt", "b/c.bin"))
      run(Seq("tar", "-xf", "ours.tar"), dir)
      assert(new String(java.nio.file.Files.readAllBytes(
        new java.io.File(dir, "a.txt").toPath), "UTF-8") === "hello tar")
      assert(java.nio.file.Files.readAllBytes(
        new java.io.File(dir, "b/c.bin").toPath).toSeq ===
        Array.tabulate(700)(_.toByte).toSeq)
    }
  }

  test("tar: we parse system-tar archives (GNU default AND --format=ustar, prefix paths)") {
    withTmp { dir =>
      val deep = new java.io.File(dir,
        "d" * 60 + "/" + "e" * 60) // forces the ustar prefix field
      deep.mkdirs()
      java.nio.file.Files.write(new java.io.File(deep, "x.txt").toPath,
        "deep content".getBytes("UTF-8"))
      java.nio.file.Files.write(new java.io.File(dir, "top.txt").toPath,
        "top".getBytes("UTF-8"))
      Seq(Seq("tar", "-cf", "gnu.tar", "top.txt"),
        Seq("tar", "--format=ustar", "-cf", "posix.tar", "top.txt",
          "d" * 60 + "/" + "e" * 60 + "/x.txt")).foreach(run(_, dir))
      val gnu = TarSource.parseTar(java.nio.file.Files.readAllBytes(
        new java.io.File(dir, "gnu.tar").toPath))
      assert(gnu.map(_.name) === Seq("top.txt"))
      assert(new String(gnu.head.data, "UTF-8") === "top")
      val posix = TarSource.parseTar(java.nio.file.Files.readAllBytes(
        new java.io.File(dir, "posix.tar").toPath))
      val files = posix.filter(_.typeflag == '0')
      assert(files.map(_.name).toSet ===
        Set("top.txt", "d" * 60 + "/" + "e" * 60 + "/x.txt"))
      assert(new String(files.find(_.name.endsWith("x.txt")).get.data,
        "UTF-8") === "deep content")
    }
  }

  test("tar: GNU 'L' long-name and PAX 'x' path entries resolve full paths") {
    withTmp { dir =>
      val deep = "p" * 80 + "/" + "q" * 80 // 161 chars: needs L or pax
      new java.io.File(dir, deep).mkdirs()
      java.nio.file.Files.write(
        new java.io.File(dir, deep + "/long.txt").toPath,
        "long path content".getBytes("UTF-8"))
      Seq("gnu", "pax").foreach { fmt =>
        run(Seq("tar", s"--format=$fmt", "-cf", s"$fmt.tar",
          deep + "/long.txt"), dir)
        val entries = TarSource.parseTar(java.nio.file.Files.readAllBytes(
          new java.io.File(dir, s"$fmt.tar").toPath))
        val files = entries.filter(_.typeflag == '0')
        assert(files.map(_.name) === Seq(deep + "/long.txt"),
          s"$fmt long name not resolved")
        assert(new String(files.head.data, "UTF-8") === "long path content")
        // the pseudo-entries themselves never surface as entries
        assert(!entries.exists(e => e.typeflag == 'L' || e.typeflag == 'x'))
      }
      // pax record grammar rejects malformed lengths loudly
      val e = intercept[IllegalArgumentException] {
        TarSource.paxRecords("999 path=x\n".getBytes("UTF-8"))
      }
      assert(e.getMessage.contains("pax record"))
    }
  }

  test("tar: checksum, truncation, and data-after-end-marker reject loudly") {
    val bytes = TarSource.tarOf(Seq(("a.txt", "abc".getBytes("UTF-8"))))
    val c = bytes.clone(); c(0) = 'z' // name byte -> checksum breaks
    val e1 = intercept[IllegalArgumentException] { TarSource.parseTar(c) }
    assert(e1.getMessage.contains("checksum"))
    val e2 = intercept[IllegalArgumentException] {
      TarSource.parseTar(java.util.Arrays.copyOfRange(bytes, 0, 700))
    }
    assert(e2.getMessage.contains("overruns") ||
      e2.getMessage.contains("end-of-archive"))
    val e3 = intercept[IllegalArgumentException] {
      TarSource.parseTar(bytes ++ TarSource.tarEntryBytes(
        "late.txt", "x".getBytes("UTF-8")) ++ new Array[Byte](1024))
    }
    assert(e3.getMessage.contains("after end-of-archive"))
    // a gzip-layer fault in a .tar.gz keeps ITS name — the header-block
    // refill must not relabel a CRC/ISIZE/deflate error as a missing
    // end-of-archive marker (r16 advice)
    val bigTar = TarSource.tarOf(Seq(
      ("big.txt", Array.tabulate(200000)(i => (i * 31 % 251).toByte))))
    val gz = graft.sources.WarcSource.gzipOne(bigTar)
    val dmg = gz.clone()
    dmg(dmg.length - 2) = (dmg(dmg.length - 2) ^ 0x40).toByte // ISIZE
    val e4 = intercept[IllegalArgumentException] {
      TarSource.parseShard(dmg)
    }
    assert(e4.getMessage.contains("gzip"),
      s"gzip damage relabeled as: ${e4.getMessage}")
  }

  test("tar: file-path arm reads mixed .tar/.tar.gz shards one task per shard") {
    withTmp { dir =>
      Seq(2L, 7L).foreach { id =>
        val ext = if (id % 2 == 0) "tar.gz" else "tar"
        java.nio.file.Files.write(
          new java.io.File(dir, s"shard$id.$ext").toPath,
          TarSource.shardOf(id, s"text $id"))
      }
      val rows = TarSource.tarFiles(spark, dir.getAbsolutePath + "/shard*")
        .collect()
      // id=2 -> k=3 sample keys, id=7 -> k=4
      assert(rows.map(_.getString(2)).distinct.length === 7)
      assert(rows.forall(_.getLong(3) >= 0))
      val byShard = rows.groupBy(_.getString(0)).view.mapValues(_.length)
      assert(byShard.values.toSet.nonEmpty)
    }
  }

  test("tar: streaming ingestion appends exactly-once across shards and restarts") {
    withTmp { root =>
      val landing = new java.io.File(root, "landing"); landing.mkdirs()
      val out = new java.io.File(root, "out").getAbsolutePath
      val ckpt = new java.io.File(root, "ckpt").getAbsolutePath
      java.nio.file.Files.write(new java.io.File(landing, "s2.tar.gz").toPath,
        TarSource.shardOf(2L, "first shard")) // k=3 samples
      val q = graft.streaming.StreamingAnalytics.tarIngest(
        spark, landing.getAbsolutePath, out, ckpt)
      q.processAllAvailable()
      val n1 = spark.read.parquet(out).count()
      // id=2: k=3 samples -> 3 .txt + cls (skip (2+j)%5==0: j=3 no; none
      // in 0..2) + bins on even j (j=0,2) = 3 + 3 + 2 = 8 entries
      assert(n1 === 8)
      java.nio.file.Files.write(new java.io.File(landing, "s7.tar").toPath,
        TarSource.shardOf(7L, "second shard"))
      q.processAllAvailable()
      val rows2 = spark.read.parquet(out)
      assert(rows2.count() > n1)
      q.stop()
      // restart from the checkpoint: nothing replays, nothing duplicates
      val q2 = graft.streaming.StreamingAnalytics.tarIngest(
        spark, landing.getAbsolutePath, out, ckpt)
      q2.processAllAvailable()
      q2.stop()
      val fin = spark.read.parquet(out)
      assert(fin.count() === rows2.count())
      assert(fin.select("name").distinct().count() === fin.count())
    }
  }

  test("tar: lenient streaming poisons a damaged shard with one null-name row") {
    withTmp { root =>
      val landing = new java.io.File(root, "landing"); landing.mkdirs()
      java.nio.file.Files.write(new java.io.File(landing, "bad.tar").toPath,
        "this is not a tar archive at all".getBytes("UTF-8"))
      java.nio.file.Files.write(new java.io.File(landing, "s7.tar").toPath,
        TarSource.shardOf(7L, "fine"))
      val q = graft.streaming.StreamingAnalytics.tarIngest(
        spark, landing.getAbsolutePath,
        new java.io.File(root, "out").getAbsolutePath,
        new java.io.File(root, "ckpt").getAbsolutePath)
      q.processAllAvailable()
      q.stop()
      val rows = spark.read
        .parquet(new java.io.File(root, "out").getAbsolutePath).collect()
      val poison = rows.filter(_.isNullAt(1))
      assert(poison.length === 1)
      assert(poison.head.getString(0).endsWith("bad.tar"))
      assert(poison.head.getLong(3) === -1L)
      // the good shard's entries land next to the marker
      assert(rows.count(!_.isNullAt(1)) > 0)
    }
  }

  test("webdataset: fixture groups samples, flags incomplete ones, gz arm CRC-checked") {
    Seq(10L, 7L).foreach { id => // 10: gz, k=3, j=0 hits (id+j)%5==0; 7: plain
      val entries = TarSource.parseShard(TarSource.shardOf(id, "some text"))
      val k = (id % 4 + 1).toInt
      val keys = entries.map(_.name.takeWhile(_ != '.')).distinct
      assert(keys.size === k)
      assert(entries.count(_.name.endsWith(".txt")) === k)
      val missing = (0 until k).count(j => (id + j) % 5 == 0)
      assert(entries.count(_.name.endsWith(".cls")) === k - missing)
      assert(entries.count(_.name.endsWith(".bin")) === (0 until k).count(_ % 2 == 0))
    }
    // gz arm integrity: flip one byte of the compressed shard
    val gz = TarSource.shardOf(10L, "some text").clone()
    gz(gz.length / 2) = (gz(gz.length / 2) ^ 0x01).toByte
    val e = intercept[Exception] { TarSource.parseShard(gz) }
    assert(e.isInstanceOf[java.util.zip.DataFormatException] ||
      e.getMessage.contains("CRC") || e.getMessage.contains("gzip") ||
      e.getMessage.contains("deflate") || e.getMessage.contains("tar"))
  }
}
