package graft

import graft.sources.OrcFooter

/** ORC tail reader: pinned against the OFFICIAL ORC reader on the same
  * Spark-written files (row counts, compression, stripe geometry, column
  * statistics), plus the none-codec arm, unsupported-codec loud reject,
  * and corruption/truncation tripwires.
  */
class OrcFooterSpec extends GraftSparkSpec {

  private def withTmp[A](f: java.io.File => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("orcspec").toFile
    try f(dir) finally {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm)
        x.delete()
      }
      rm(dir)
    }
  }

  private def writeOrc(dir: java.io.File, codec: String): String = {
    import spark.implicits._
    val out = new java.io.File(dir, s"t_$codec").getAbsolutePath
    (0L until 1000L).map(i => (i, i * 7 - 300, s"name$i"))
      .toDF("id", "v", "name")
      .coalesce(1)
      .write.mode("overwrite").option("compression", codec).orc(out)
    new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".orc")).head.getAbsolutePath
  }

  test("orc: our tail read matches the official ORC reader field for field") {
    withTmp { dir =>
      Seq("zlib", "none").foreach { codec =>
        val path = writeOrc(dir, codec)
        val ours = OrcFooter.readTail(path)
        val reader = org.apache.orc.OrcFile.createReader(
          new org.apache.hadoop.fs.Path(path),
          org.apache.orc.OrcFile.readerOptions(
            new org.apache.hadoop.conf.Configuration()))
        assert(ours.compression === codec)
        assert(reader.getCompressionKind.name.toLowerCase === codec)
        assert(ours.nRows === reader.getNumberOfRows)
        val offStripes = reader.getStripes
        assert(ours.stripes.size === offStripes.size)
        ours.stripes.zip(offStripes.toArray(Array.empty[org.apache.orc.StripeInformation]))
          .foreach { case (m, o) =>
            assert(m.offset === o.getOffset)
            assert(m.indexLen === o.getIndexLength)
            assert(m.dataLen === o.getDataLength)
            assert(m.footerLen === o.getFooterLength)
            assert(m.rows === o.getNumberOfRows)
          }
        assert(ours.rootFields === Seq("id", "v", "name"))
        val offStats = reader.getStatistics
        assert(ours.stats.size === offStats.length)
        Seq("id", "v").foreach { c =>
          val mine = ours.colStats(c)
          val theirs = offStats(ours.rootFields.indexOf(c) + 1)
            .asInstanceOf[org.apache.orc.IntegerColumnStatistics]
          assert(mine.values === theirs.getNumberOfValues, s"col $c")
          assert(mine.ints.get.min.get === theirs.getMinimum, s"col $c")
          assert(mine.ints.get.max.get === theirs.getMaximum, s"col $c")
          assert(mine.ints.get.sum.get === theirs.getSum, s"col $c")
        }
        reader.close()
      }
    }
  }

  test("orc: unsupported codecs reject by name; stats locate columns by name") {
    withTmp { dir =>
      val path = writeOrc(dir, "snappy")
      val e = intercept[RuntimeException] { OrcFooter.readTail(path) }
      assert(e.getMessage.contains("unsupported compression snappy"))
      val good = OrcFooter.readTail(writeOrc(dir, "zlib"))
      val e2 = intercept[IllegalArgumentException] { good.colStats("nope") }
      assert(e2.getMessage.contains("no column 'nope'"))
    }
  }

  test("orc: structural corruption and truncation reject loudly") {
    // NOTE: the ORC tail carries NO integrity checksum (no CRC anywhere
    // in the format — unlike gzip members or PNG chunks), so a flipped
    // byte inside a compressed footer chunk is NOT guaranteed to fail
    // structurally; only structural damage is detectable. That is a
    // property of the format, and why the x105 gate checks decoded
    // VALUES against the source table rather than trusting the parse.
    withTmp { dir =>
      val path = writeOrc(dir, "zlib")
      val bytes = java.nio.file.Files.readAllBytes(
        new java.io.File(path).toPath)
      // zeroed postscript length
      val c1 = bytes.clone(); c1(c1.length - 1) = 0
      val e1 = intercept[IllegalArgumentException] { OrcFooter.parseOrc(c1) }
      assert(e1.getMessage.contains("postscript length"))
      // damaged file magic
      val c2 = bytes.clone(); c2(0) = 'X'
      val e2 = intercept[IllegalArgumentException] { OrcFooter.parseOrc(c2) }
      assert(e2.getMessage.contains("bad magic"))
      // truncations: inside the header, mid-file, and just before the tail
      Seq(2, bytes.length / 2, bytes.length - 5).foreach { cut =>
        val e = intercept[Exception] {
          OrcFooter.parseOrc(java.util.Arrays.copyOfRange(bytes, 0, cut))
        }
        assert(e.getMessage.contains("orc"), s"cut=$cut got $e")
      }
    }
  }
}
