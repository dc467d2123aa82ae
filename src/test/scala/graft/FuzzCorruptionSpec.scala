package graft

import graft.sources._

/** Hostile-byte sweep over every container parser: flip each byte of a
  * representative fixture and require the parse to either succeed
  * (CRC-less regions can legally change meaning — a TIFF pixel, a zip
  * entry name) or fail with a NAMED error (IllegalArgument/
  * IllegalState/NumberFormat/sys.error RuntimeException, or a zip
  * DataFormatException from the inflater). What must NEVER escape:
  * ArrayIndexOutOfBounds, NegativeArraySize, NullPointer, StackOverflow
  * — the unnamed crash classes a 100 TB crawl of attacker-supplied
  * bytes would otherwise surface as executor deaths instead of
  * countable poison rows. (The lenient ingestion guards absorb
  * RuntimeExceptions; an Error would kill the task.)
  */
class FuzzCorruptionSpec extends GraftSparkSpec {

  private def sweep(name: String, bytes: Array[Byte],
                    parse: Array[Byte] => Any,
                    stride: Int = 1): Unit = {
    var i = 0
    while (i < bytes.length) {
      val c = bytes.clone()
      c(i) = (c(i) ^ 0x5b).toByte
      try { parse(c); () }
      catch {
        case _: IllegalArgumentException => () // named require/NFE
        case _: IllegalStateException => ()
        case _: java.util.zip.DataFormatException => ()
        case e: RuntimeException
            if e.getClass == classOf[RuntimeException] => () // sys.error
        case e: Throwable =>
          fail(s"$name: flip at byte $i escaped as " +
            s"${e.getClass.getName}: ${e.getMessage}")
      }
      i += stride
    }
  }

  test("fuzz: zip (classic + zip64) directory and entry decode") {
    val classic = ZipSource.zipOf(Seq(
      ("a.txt", ("payload " * 30).getBytes("UTF-8"), false),
      ("b.bin", Array.tabulate(257)(_.toByte), true)), "c")
    val z64 = ZipSource.zipOf(Seq(
      ("a.txt", ("payload " * 30).getBytes("UTF-8"), false)),
      "c", zip64 = true)
    def full(b: Array[Byte]): Unit = {
      val in = new ZipSource.BytesSeekable(b)
      ZipSource.readDirectory(in).entries
        .foreach(e => ZipSource.entryBytes(in, e))
    }
    sweep("zip-classic", classic, full)
    sweep("zip64", z64, full)
  }

  test("fuzz: warc record walk + http decode (chunked/gzip wire forms)") {
    Seq(1L, 2L, 4L).foreach { id => // plain+chunked, gzip, requests
      sweep(s"warc-$id", WarcSource.warcOf(id, "alpha beta gamma"),
        b => WarcSource.parseWarc(b))
    }
  }

  test("fuzz: brotli stream decode (stored metablocks; real-encoder streams swept in BrotliSpec)") {
    val data = ("brotli fuzz payload " * 40).getBytes("UTF-8")
    sweep("brotli", Brotli.encodeStored(data),
      b => Brotli.decode(b, maxOut = 1 << 20))
  }

  test("fuzz: avro OCF across all four codecs") {
    Seq(0L, 1L, 2L, 3L).foreach { id => // deflate/null/snappy/zstandard
      sweep(s"avro-${id % 4}", AvroContainer.ocfOf(id),
        b => AvroContainer.parseOcf(b))
    }
  }

  test("fuzz: tiff strips, tiles, and multi-page chains") {
    Seq(0L, 5L, 6L, 61L).foreach { id =>
      sweep(s"tiff-$id", TiffSource.tiffOf(id),
        b => TiffSource.parseTiff(b))
    }
  }

  test("fuzz: matroska EBML walk (sized + unknown-size forms)") {
    Seq(3L, 5L).foreach { id => // sized / MediaRecorder unknown-size
      sweep(s"mkv-$id", MkvSource.mkvOf(id), b => MkvSource.parseMkv(b))
    }
  }

  test("fuzz: gif container + LZW decode") {
    Seq(1L, 3L).foreach { id =>
      sweep(s"gif-$id", GifSource.gifOf(id), b => GifSource.parseGif(b))
    }
  }

  test("fuzz: wat metadata envelopes (nested JSON through the record walk)") {
    Seq(2L, 7L).foreach { id =>
      sweep(s"wat-$id", WatSource.watOf(id), { b =>
        WarcSource.parseWarc(b).records
          .filter(r => r.warcType == "metadata" && r.body != null)
          .foreach(r => WatSource.watFacts(r.body))
      })
    }
  }

  test("fuzz: tar shards (plain) and cdx index lines") {
    sweep("tar", TarSource.tarOf(Seq(
      ("a.txt", ("data " * 40).getBytes("UTF-8")),
      ("b/c.txt", "x".getBytes("UTF-8")))),
      b => TarSource.parseTar(b))
    val cdxText = CdxSource.cdxOf(4L, "alpha beta")
    val bytes = cdxText.getBytes("UTF-8")
    sweep("cdx", bytes, { b =>
      new String(b, "UTF-8").split("\n").filter(_.nonEmpty)
        .foreach(CdxSource.parseCdxLine)
    })
  }
}
