package graft

import graft.sources.GifSource

/** GIF walker + LZW codec: javax.imageio interop BOTH ways (it reads
  * our frames pixel-for-pixel, we decode its real LZW streams),
  * dictionary-reset round-trips, interlace, and grammar tripwires.
  */
class GifSpec extends GraftSparkSpec {

  test("gif: javax.imageio reads our writer's bytes pixel-for-pixel (2 frames, interlace)") {
    val id = 7L // odd: 2 frames, second interlaced; w=24 h=16
    val bytes = GifSource.gifOf(id)
    val ours = GifSource.parseGif(bytes)
    assert(ours.frames.size === 2 && ours.frames(1).interlaced)
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
    reader.setInput(iis)
    assert(reader.getNumImages(true) === 2)
    (0 until 2).foreach { j =>
      val img = reader.read(j)
      val fr = ours.frames(j)
      assert(img.getWidth === fr.w && img.getHeight === fr.h)
      for (y <- 0 until fr.h; x <- 0 until fr.w) {
        val theirs = img.getRGB(x, y) & 0xffffff
        val mine = ours.palette(fr.pixels(y * fr.w + x) & 0xff)
        assert(theirs === mine, s"frame $j pixel ($x,$y)")
      }
    }
    reader.dispose(); iis.close()
  }

  test("gif: we decode javax.imageio-written GIFs (real LZW over 256 colors)") {
    val w = 61; val h = 47
    val r = new Array[Byte](256); val g = new Array[Byte](256)
    val b = new Array[Byte](256)
    (0 until 256).foreach { i =>
      r(i) = i.toByte; g(i) = ((i * 3) % 256).toByte; b(i) = (255 - i).toByte
    }
    val cm = new java.awt.image.IndexColorModel(8, 256, r, g, b)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    val raster = img.getRaster
    for (y <- 0 until h; x <- 0 until w)
      raster.setSample(x, y, 0, (x * 31 + y * 17) % 256)
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", baos))
    val f = GifSource.parseGif(baos.toByteArray)
    assert(f.w === w && f.h === h && f.frames.size === 1)
    val fr = f.frames.head
    for (y <- 0 until h; x <- 0 until w) {
      val theirs = img.getRGB(x, y) & 0xffffff
      val mine = f.palette(fr.pixels(y * fr.w + x) & 0xff)
      assert(mine === theirs, s"pixel ($x,$y)")
    }
  }

  test("gif: LZW round-trips noise through dictionary resets; interlace round-trips") {
    val rnd = new scala.util.Random(11)
    val px = Array.fill(200 * 200)((rnd.nextInt(256)).toByte)
    // 40k random pixels overflow the 4096-entry dictionary repeatedly
    val enc = GifSource.lzwEncode(px, 8)
    assert(GifSource.lzwDecode(enc, 8, px.length).toSeq === px.toSeq)
    // 16-color path (the fixture's min code size)
    val px4 = Array.tabulate(37 * 23)(i => (i % 16).toByte)
    assert(GifSource.lzwDecode(GifSource.lzwEncode(px4, 4), 4,
      px4.length).toSeq === px4.toSeq)
    // deinterlace inverts the fixture writer's pass ordering (pinned
    // against the parse in the imageio test; here the pure function)
    val w = 8; val h = 11
    val logical = Array.tabulate(w * h)(i => (i % 16).toByte)
    val rows = Seq((0, 8), (4, 8), (2, 4), (1, 2)).flatMap {
      case (s, st) => s until h by st
    }
    val stored = new Array[Byte](logical.length)
    rows.zipWithIndex.foreach { case (row, i) =>
      System.arraycopy(logical, row * w, stored, i * w, w)
    }
    assert(GifSource.deinterlace(stored, w, h).toSeq === logical.toSeq)
  }

  test("gif: fixture facts match the documented arithmetic") {
    Seq(0L, 6L, 7L).foreach { id =>
      val f = GifSource.parseGif(GifSource.gifOf(id))
      assert(f.version === "89a" && f.gctSize === 16)
      assert(f.w === 16 + (id % 5).toInt * 4)
      assert(f.h === 12 + (id % 3).toInt * 4)
      assert(f.frames.size === (id % 2).toInt + 1)
      assert(f.frames.zipWithIndex.forall { case (fr, j) =>
        fr.delayCs == ((id + j) % 10 + 1).toInt
      })
      assert(f.comments === (if (id % 3 == 0) Seq(s"doc $id") else Seq()))
      assert(f.loopCount === (if (id % 2 == 0) (id % 5).toInt else -1))
    }
  }

  test("gif: grammar violations reject loudly by name") {
    val good = GifSource.gifOf(3L)
    val e1 = intercept[IllegalArgumentException] {
      GifSource.parseGif("NOTGIF".getBytes("ISO-8859-1") ++ good.drop(6))
    }
    assert(e1.getMessage.contains("signature"))
    // truncate mid-LZW: the sub-block framing or the bit reader trips
    val e2 = intercept[IllegalArgumentException] {
      GifSource.parseGif(java.util.Arrays.copyOfRange(good, 0, good.length - 8))
    }
    assert(e2.getMessage.contains("truncated"))
    // unknown top-level block byte
    val bad = good.clone()
    bad(good.length - 1) = 0x99.toByte // overwrite the trailer
    val e3 = intercept[RuntimeException] { GifSource.parseGif(bad) }
    assert(e3.getMessage.contains("unknown block") ||
      e3.getMessage.contains("truncated"))
  }
}
