package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TIFF walker — the fifth image family (PNG x93/x94/x99, JPEG x95,
  * MJPEG x67, GIF x113/x114): the scanned-document and scientific-image
  * format crawled corpora carry in volume, and the same IFD tag grammar
  * EXIF embeds in JPEG (x95 parses it inside APP1; this is the
  * standalone container). Implemented from the TIFF 6.0 specification:
  *
  *  - both byte orders ("II" little / "MM" big endian), the IFD chain
  *    (multi-page), 12-byte entries with inline-vs-offset values by
  *    type size, LONG/SHORT promotion.
  *  - strip-organized image data (StripOffsets/StripByteCounts/
  *    RowsPerStrip) AND the tiled layout (§15: TileWidth/TileLength
  *    multiples of 16, full-size edge tiles clipped on assembly — the
  *    organization scanned-document and GeoTIFF corpora predominantly
  *    use), 8-bit samples, chunky planar layout.
  *  - codecs: uncompressed, PackBits (the spec's RLE), TIFF-LZW — which
  *    is NOT GIF-LZW: MSB-first bit packing, fixed 256/257
  *    clear/EOI codes, and the spec's "early change" (code width grows
  *    one code earlier than the dictionary strictly requires) — and
  *    zlib DEFLATE (both the 8 and 32946 tag values), plus the
  *    horizontal-differencing predictor (tag 317 = 2) LZW/deflate
  *    writers pair with it.
  *
  * TiffSpec pins interop BOTH ways against the JDK's ImageIO TIFF
  * plugin (None/PackBits/LZW/Deflate written by it all decode to its
  * own pixels; it reads our writer's bytes); x115 gates container facts
  * and x116 decoded pixel sums against DuckDB doc_id arithmetic.
  * Out-of-subset shapes (planar, non-8-bit) reject loudly.
  * Caveat (the ORC-tail lesson): TIFF strips carry NO integrity check —
  * only structural damage is detectable; a flipped payload bit is a
  * legal different pixel, which is why the gates check decoded VALUES.
  *
  * 100 TB shape: per-row decode kernels, zero shuffle (the x67/x94/x114
  * discipline).
  */
object TiffSource {

  private[graft] case class TiffPage(w: Int, h: Int, compression: Int,
      samplesPerPixel: Int, rowsPerStrip: Int, nStrips: Int,
      predictor: Int, pixels: Array[Byte], // row-major, chunky
      tiled: Boolean = false) // tiled: rowsPerStrip=TileLength, nStrips=#tiles
  private[graft] case class TiffFile(littleEndian: Boolean,
      pages: Seq[TiffPage])

  // ------------------------------------------------------------ decode

  private final class Rd(bytes: Array[Byte], le: Boolean) {
    def u8(p: Int): Int = {
      require(p >= 0 && p < bytes.length, "tiff: truncated")
      bytes(p) & 0xff
    }
    def u16(p: Int): Int =
      if (le) u8(p) | (u8(p + 1) << 8) else (u8(p) << 8) | u8(p + 1)
    def u32(p: Int): Long =
      if (le) u16(p).toLong | (u16(p + 2).toLong << 16)
      else (u16(p).toLong << 16) | u16(p + 2).toLong
    def slice(off: Long, len: Int): Array[Byte] = {
      require(off >= 0 && off + len <= bytes.length, "tiff: slice overruns")
      java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + len)
    }
  }

  /** PackBits (TIFF 6.0 §9) decode to exactly `expected` bytes. */
  private[graft] def packBitsDecode(data: Array[Byte], expected: Int): Array[Byte] = {
    val out = new Array[Byte](expected)
    var ip = 0
    var op = 0
    while (op < expected) {
      require(ip < data.length, "tiff: packbits truncated")
      val n = data(ip); ip += 1
      if (n >= 0) { // n+1 literals
        require(ip + n + 1 <= data.length && op + n + 1 <= expected,
          "tiff: packbits overruns")
        System.arraycopy(data, ip, out, op, n + 1)
        ip += n + 1; op += n + 1
      } else if (n != -128) { // repeat next byte 1-n times
        require(ip < data.length && op + (1 - n) <= expected,
          "tiff: packbits overruns")
        java.util.Arrays.fill(out, op, op + 1 - n, data(ip))
        ip += 1; op += 1 - n
      } // -128: no-op
    }
    out
  }

  /** TIFF-LZW decode (§13): MSB-first bits, clear=256/EOI=257, width
    * 9→12 with the spec's EARLY CHANGE (grow at capacity − 1).
    */
  private[graft] def tiffLzwDecode(data: Array[Byte], expected: Int): Array[Byte] = {
    val clear = 256; val eoi = 257
    val out = new Array[Byte](expected)
    var outPos = 0
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var next = clear + 2
    var width = 9
    var bitPos = 0
    def readCode(): Int = {
      var v = 0
      var got = 0
      while (got < width) {
        val byteI = bitPos >> 3
        require(byteI < data.length, "tiff: LZW stream truncated")
        val avail = 8 - (bitPos & 7)
        val take = math.min(avail, width - got)
        // MSB-first: take the HIGH bits of the current byte
        v = (v << take) |
          (((data(byteI) & 0xff) >> (avail - take)) & ((1 << take) - 1))
        got += take; bitPos += take
      }
      v
    }
    def emit(code: Int): Byte = {
      var stack = List.empty[Byte]
      var c = code
      while (c >= clear + 2) { stack = suffix(c) :: stack; c = prefix(c) }
      require(c < clear, s"tiff: corrupt LZW chain at $c")
      stack = c.toByte :: stack
      val first = stack.head
      stack.foreach { b =>
        require(outPos < expected, "tiff: LZW emits more bytes than the strip")
        out(outPos) = b; outPos += 1
      }
      first
    }
    var prev = -1
    var done = false
    while (!done && outPos < expected) {
      val code = readCode()
      if (code == clear) { next = clear + 2; width = 9; prev = -1 }
      else if (code == eoi) done = true
      else if (prev < 0) {
        require(code < clear, "tiff: first LZW code not a literal")
        emit(code); prev = code
      } else {
        require(code <= next, s"tiff: LZW code $code beyond dictionary")
        val first =
          if (code < next) emit(code)
          else { // KwKwK: code == next, string = prev's string + its first byte
            val f = emit(prev)
            require(outPos < expected, "tiff: LZW emits more bytes than the strip")
            out(outPos) = f; outPos += 1
            f
          }
        if (next < 4096) {
          prefix(next) = prev; suffix(next) = first; next += 1
          // EARLY CHANGE: one earlier than the GIF schedule
          if (next == (1 << width) - 1 && width < 12) width += 1
        }
        prev = code
      }
    }
    require(outPos == expected,
      s"tiff: LZW decoded $outPos bytes, strip needs $expected")
    out
  }

  private def inflate(data: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater() // zlib-wrapped per the spec
    inf.setInput(data)
    val out = new Array[Byte](expected)
    var pos = 0
    while (!inf.finished() && pos < expected) {
      val k = try inf.inflate(out, pos, expected - pos) catch {
        case e: java.util.zip.DataFormatException =>
          throw new IllegalArgumentException("tiff: corrupt deflate: " + e.getMessage)
      }
      require(k > 0 || inf.finished(), "tiff: truncated deflate strip")
      pos += k
    }
    inf.end()
    require(pos == expected, s"tiff: deflate strip decoded $pos of $expected")
    out
  }

  private[graft] def parseTiff(bytes: Array[Byte]): TiffFile = {
    require(bytes.length >= 8, "tiff: too short for a header")
    val le = (bytes(0), bytes(1)) match {
      case (0x49, 0x49) => true
      case (0x4D, 0x4D) => false
      case _ => sys.error("tiff: bad byte-order mark")
    }
    val r = new Rd(bytes, le)
    require(r.u16(2) == 42, "tiff: bad magic")
    val pages = scala.collection.mutable.ArrayBuffer[TiffPage]()
    var ifdOff = r.u32(4)
    var guard = 0
    while (ifdOff != 0) {
      guard += 1
      require(guard <= 64, "tiff: IFD chain too long (cycle?)")
      val n = r.u16(ifdOff.toInt)
      val tags = scala.collection.mutable.Map[Int, (Int, Long, Long)]()
      (0 until n).foreach { i =>
        val e = ifdOff.toInt + 2 + i * 12
        val tag = r.u16(e)
        val typ = r.u16(e + 2)
        val count = r.u32(e + 4)
        tags(tag) = (typ, count, e + 8L)
      }
      val typeSize = Map(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 4, 5 -> 8)
      def values(tag: Int): Seq[Long] = tags.get(tag) match {
        case None => Seq.empty
        case Some((typ, count, at)) =>
          val sz = typeSize.getOrElse(typ,
            sys.error(s"tiff: unsupported type $typ for tag $tag"))
          val total = sz * count
          val base = if (total <= 4) at else r.u32(at.toInt)
          (0L until count).map { i =>
            val p = (base + i * sz).toInt
            typ match {
              case 1 | 2 => r.u8(p).toLong
              case 3 => r.u16(p).toLong
              case 4 => r.u32(p)
              case 5 => r.u32(p) // rational numerator is enough here
            }
          }
      }
      def one(tag: Int, default: Long = -1L): Long =
        values(tag).headOption.getOrElse(default)

      val w = one(256).toInt
      val h = one(257).toInt
      require(w > 0 && h > 0, "tiff: missing image dimensions")
      val spp = one(277, 1L).toInt
      require(spp >= 1 && spp <= 4, s"tiff: $spp samples/pixel unsupported")
      // u32 dims are legal up to 2^32-1: bound the DECODED size before
      // any arithmetic so w*h*spp can neither wrap Int nor OOM-allocate
      // (a crafted 65536x65536 header wrapped to a 0-byte buffer and
      // "decoded" to zero pixels before this check existed)
      require(w.toLong * h * spp <= (1L << 28),
        "tiff: image exceeds supported decoded size (256 MB)")
      val bps = values(258)
      require(bps.isEmpty || bps.forall(_ == 8L),
        s"tiff: only 8-bit samples supported (got ${bps.mkString(",")})")
      require(one(284, 1L) == 1L, "tiff: planar configuration unsupported")
      val comp = one(259, 1L).toInt
      val predictor = one(317, 1L).toInt
      require(predictor == 1 || predictor == 2,
        s"tiff: predictor $predictor unsupported")
      def decodeSeg(raw: Array[Byte], expected: Int): Array[Byte] =
        comp match {
          case 1 => require(raw.length == expected,
            "tiff: uncompressed strip size mismatch"); raw
          case 5 => tiffLzwDecode(raw, expected)
          case 8 | 32946 => inflate(raw, expected)
          case 32773 => packBitsDecode(raw, expected)
          case other => sys.error(s"tiff: compression $other unsupported")
        }
      // horizontal differencing resets per ROW — strip rows are image
      // rows, tile rows are TileWidth wide
      def undoPredictor(buf: Array[Byte], rows: Int, rowBytes: Int): Unit =
        if (predictor == 2) (0 until rows).foreach { y =>
          val base = y * rowBytes
          (spp until rowBytes).foreach { i =>
            buf(base + i) = (buf(base + i) + buf(base + i - spp)).toByte
          }
        }
      val rowBytes = w * spp
      val out = new Array[Byte](rowBytes * h)
      val tiled = tags.contains(322) || tags.contains(323) ||
        tags.contains(324) || tags.contains(325)
      val (rpsOut, nSegs) =
        if (!tiled) {
          val rps = one(278, h.toLong).toInt
          val offs = values(273)
          val counts = values(279)
          require(offs.nonEmpty && offs.size == counts.size,
            "tiff: strip offsets/counts mismatch")
          var row = 0
          offs.zip(counts).foreach { case (off, cnt) =>
            val stripRows = math.min(rps, h - row)
            val expected = stripRows * rowBytes
            val data = decodeSeg(r.slice(off, cnt.toInt), expected)
            System.arraycopy(data, 0, out, row * rowBytes, expected)
            row += stripRows
          }
          require(row == h, s"tiff: strips cover $row of $h rows")
          undoPredictor(out, h, rowBytes)
          (rps, offs.size)
        } else {
          // tiled layout (TIFF 6.0 §15): TileWidth/TileLength multiples
          // of 16; EVERY tile decodes to the full tw×tl — right/bottom
          // edge tiles are writer-padded and clipped on assembly; the
          // predictor undoes per TILE row before clipping
          val tw = one(322).toInt
          val tl = one(323).toInt
          require(tw > 0 && tl > 0 && tw % 16 == 0 && tl % 16 == 0,
            s"tiff: tile size ${tw}x$tl not positive multiples of 16")
          val offs = values(324)
          val counts = values(325)
          require(offs.nonEmpty && offs.size == counts.size,
            "tiff: tile offsets/counts mismatch")
          val across = (w + tw - 1) / tw
          val down = (h + tl - 1) / tl
          require(offs.size == across * down,
            s"tiff: ${offs.size} tiles for a ${across}x$down grid")
          val tileRowBytes = tw * spp
          require(tileRowBytes.toLong * tl <= (1L << 28),
            "tiff: tile exceeds supported decoded size (256 MB)")
          val expected = tileRowBytes * tl
          offs.zip(counts).zipWithIndex.foreach { case ((off, cnt), t) =>
            val data = decodeSeg(r.slice(off, cnt.toInt), expected)
            undoPredictor(data, tl, tileRowBytes)
            val tx = t % across
            val ty = t / across
            val copyRows = math.min(tl, h - ty * tl)
            val copyBytes = math.min(tw, w - tx * tw) * spp
            (0 until copyRows).foreach { yy =>
              System.arraycopy(data, yy * tileRowBytes,
                out, ((ty * tl + yy) * w + tx * tw) * spp, copyBytes)
            }
          }
          (tl, offs.size)
        }
      pages += TiffPage(w, h, comp, spp, rpsOut, nSegs, predictor, out, tiled)
      ifdOff = r.u32(ifdOff.toInt + 2 + n * 12)
    }
    require(pages.nonEmpty, "tiff: no pages")
    TiffFile(le, pages.toSeq)
  }

  // ------------------------------------------------------------ encode

  /** PackBits encode (literal runs + repeats, the spec's suggestion). */
  private[graft] def packBitsEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < data.length) {
      var run = 1
      while (i + run < data.length && run < 128 &&
        data(i + run) == data(i)) run += 1
      if (run >= 2) {
        out.write(1 - run) // -(run-1)
        out.write(data(i)); i += run
      } else {
        var lit = 1
        while (i + lit < data.length && lit < 128 &&
          (i + lit + 1 >= data.length || data(i + lit) != data(i + lit + 1)))
          lit += 1
        out.write(lit - 1)
        out.write(data, i, lit); i += lit
      }
    }
    out.toByteArray
  }

  /** TIFF-LZW encode mirroring [[tiffLzwDecode]]'s early-change width
    * schedule (shifted one entry for the decoder's dictionary lag, the
    * GIF lesson) — fixtures carry real dictionary compression.
    */
  private[graft] def tiffLzwEncode(data: Array[Byte]): Array[Byte] = {
    val clear = 256; val eoi = 257
    val out = new java.io.ByteArrayOutputStream()
    var cur = 0L
    var bits = 0
    var width = 9
    def write(code: Int): Unit = { // MSB-first packing
      cur = (cur << width) | code
      bits += width
      while (bits >= 8) {
        out.write(((cur >> (bits - 8)) & 0xff).toInt); bits -= 8
      }
    }
    var dict = scala.collection.mutable.Map[(Int, Int), Int]()
    var next = clear + 2
    write(clear)
    var prev = -1
    data.foreach { pb =>
      val k = pb & 0xff
      if (prev < 0) prev = k
      else dict.get((prev, k)) match {
        case Some(code) => prev = code
        case None =>
          write(prev)
          dict((prev, k)) = next
          next += 1
          // early change + the one-entry decoder lag: grow at capacity
          if (next == (1 << width) && width < 12) width += 1
          if (next >= 4094) { // reset before the 12-bit ceiling
            write(clear)
            dict = scala.collection.mutable.Map[(Int, Int), Int]()
            next = clear + 2
            width = 9
          }
          prev = k
      }
    }
    if (prev >= 0) write(prev)
    write(eoi)
    if (bits > 0) out.write(((cur << (8 - bits)) & 0xff).toInt)
    out.toByteArray
  }

  // Fixture arithmetic (the DuckDB oracle re-derives everything):
  //   little-endian, 8-bit grayscale, w = 24+(id%4)*8, h = 10+(id%5)*2,
  //   page-1 pixel v(x,y) = (id + 5x + 11y) % 256; compression by id%3:
  //   0 = none, 1 = PackBits, 2 = LZW (real dictionaries). Layout:
  //   TILED 16x16 when id%7==5 (edge tiles clipped — w/h are never
  //   multiples of 16; pads are 0), else strips with RowsPerStrip = 4.
  //   A SECOND page (IFD chain — the multi-page scanned-document shape)
  //   when id%11==6: same dims/compression, strips, pixel
  //   v2(x,y) = (3·id + 7x + 13y) % 256. Pixel facts are
  //   layout-invariant, so a tile-grid, clipping, or chain slip fails
  //   the x116 hash.

  /** One page block = [IFD][offset/count arrays][segment data], all
    * internal offsets absolute via `base`; the IFD's next pointer is
    * `nextIfd` (0 = end of chain).
    */
  private def pageBlock(id: Long, page: Int, base: Long,
                        nextIfd: Long): Array[Byte] = {
    val w = 24 + (id % 4).toInt * 8
    val h = 10 + (id % 5).toInt * 2
    val comp = (id % 3).toInt match {
      case 0 => 1
      case 1 => 32773
      case _ => 5
    }
    def px(x: Int, y: Int): Byte =
      if (page == 0) ((id + 5 * x + 11 * y) % 256).toByte
      else ((3 * id + 7 * x + 13 * y) % 256).toByte
    val tiled = page == 0 && id % 7 == 5
    def pack(raw: Array[Byte]): Array[Byte] = comp match {
      case 1 => raw
      case 32773 => packBitsEncode(raw)
      case 5 => tiffLzwEncode(raw)
    }
    val rps = 4
    val (segs, segTags) =
      if (!tiled) {
        val nStrips = (h + rps - 1) / rps
        val strips = (0 until nStrips).map { s =>
          val rows = math.min(rps, h - s * rps)
          pack(Array.tabulate(rows * w)(p => px(p % w, s * rps + p / w)))
        }
        (strips, Seq((273, 4, nStrips.toLong), (278, 4, 1L),
          (279, 4, nStrips.toLong)))
      } else {
        val tw = 16; val tl = 16
        val across = (w + tw - 1) / tw
        val down = (h + tl - 1) / tl
        val tiles = (0 until across * down).map { t =>
          val tx = t % across; val ty = t / across
          pack(Array.tabulate(tw * tl) { p =>
            val x = tx * tw + p % tw; val y = ty * tl + p / tw
            if (x < w && y < h) px(x, y)
            else 0.toByte // edge-tile padding (spec: contents undefined)
          })
        }
        (tiles, Seq((322, 4, 1L), (323, 4, 1L),
          (324, 4, tiles.size.toLong), (325, 4, tiles.size.toLong)))
      }
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = (0 until 4).foreach(i =>
      out.write(((v >> (8 * i)) & 0xff).toInt))
    val nTags = 6 + segTags.size
    val ifdSize = 2 + nTags * 12 + 4
    val multi = segs.size > 1
    val offsArraySize = if (multi) segs.size * 4 else 0
    val cntsArraySize = if (multi) segs.size * 4 else 0
    var dataOff = base + ifdSize + offsArraySize + cntsArraySize
    val segOffs = segs.map { s => val o = dataOff; dataOff += s.length; o }
    le16(nTags)
    def entry(tag: Int, typ: Int, count: Long, value: Long): Unit = {
      le16(tag); le16(typ); le32(count); le32(value)
    }
    val offsAt = base + ifdSize
    val cntsAt = offsAt + offsArraySize
    // tags must appear in ascending order per the spec — fold the
    // layout-specific ones into the fixed set sorted by tag id
    val fixed = Seq(
      (256, 4, 1L, w.toLong), (257, 4, 1L, h.toLong), (258, 3, 1L, 8L),
      (259, 3, 1L, comp.toLong), (262, 3, 1L, 1L), (277, 3, 1L, 1L))
    val layout = segTags.map {
      case (273, typ, cnt) =>
        (273, typ, cnt, if (multi) offsAt else segOffs.head)
      case (279, typ, cnt) =>
        (279, typ, cnt, if (multi) cntsAt else segs.head.length.toLong)
      case (278, typ, cnt) => (278, typ, cnt, rps.toLong)
      case (322, typ, cnt) => (322, typ, cnt, 16L)
      case (323, typ, cnt) => (323, typ, cnt, 16L)
      case (324, typ, cnt) =>
        (324, typ, cnt, if (multi) offsAt else segOffs.head)
      case (325, typ, cnt) =>
        (325, typ, cnt, if (multi) cntsAt else segs.head.length.toLong)
    }
    (fixed ++ layout).sortBy(_._1).foreach { case (t, ty, c, v) =>
      entry(t, ty, c, v)
    }
    le32(nextIfd)
    if (multi) {
      segOffs.foreach(le32)
      segs.foreach(s => le32(s.length.toLong))
    }
    segs.foreach(out.write)
    out.toByteArray
  }

  private[graft] def tiffOf(id: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = (0 until 4).foreach(i =>
      out.write(((v >> (8 * i)) & 0xff).toInt))
    out.write('I'); out.write('I'); le16(42); le32(8)
    val twoPages = id % 11 == 6
    if (!twoPages) out.write(pageBlock(id, 0, 8L, 0L))
    else {
      // the second IFD's position depends on the first block's size:
      // lay out page 0 once with a placeholder to measure it
      val len0 = pageBlock(id, 0, 8L, 0L).length
      out.write(pageBlock(id, 0, 8L, 8L + len0))
      out.write(pageBlock(id, 1, 8L + len0, 0L))
    }
    out.toByteArray
  }

  def synthesizeTiff(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .map(id => graft.operators.Multimodal.ImageRow(id, tiffOf(id)))
      .toDF()
  }

  /** x115 gate: container facts per file. For tiled pages
    * `rows_per_strip` reports TileLength and `n_strips` the tile count
    * — layout facts stay one schema across both organizations.
    */
  def tiffTable(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("content")).as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val f = parseTiff(bytes)
        val p = f.pages.head
        (id, if (f.littleEndian) "II" else "MM", f.pages.size,
          p.w, p.h, p.compression, p.samplesPerPixel, p.rowsPerStrip,
          p.nStrips, if (p.tiled) 1 else 0)
      }
      .toDF("doc_id", "endian", "n_pages", "w", "h", "compression",
        "spp", "rows_per_strip", "n_strips", "is_tiled")
  }

  /** x116 gate: decoded pixel sum over ALL pages — the three codecs
    * must land the same arithmetic, and a multi-page chain slip
    * (missed or double-walked second IFD) moves the sum.
    */
  def tiffPixelTable(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("content")).as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val f = parseTiff(bytes)
        val p = f.pages.head
        var sum = 0L
        f.pages.foreach(_.pixels.foreach(b => sum += (b & 0xff).toLong))
        (id, p.w, p.h, p.compression, sum)
      }
      .toDF("doc_id", "w", "h", "compression", "px_sum")
  }
}
