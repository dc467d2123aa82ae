package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GIF (87a/89a) walker + LZW codec — the fourth image family next to
  * PNG (x93/x94/x99), JPEG (x95), and MJPEG (x67) in
  * `operators/ImageCodecs.scala`: GIFs are still everywhere in crawled
  * web content, and their variable-width LZW is a genuinely different
  * codec from DEFLATE/DCT. Implemented from the GIF89a specification:
  *
  *  - container: header + logical screen descriptor (global color table
  *    size/presence), extension blocks (Graphic Control: delay,
  *    transparency, disposal; Comment; Application — NETSCAPE 2.0 loop
  *    counts), image descriptors (offsets, local color tables,
  *    INTERLACE flag), sub-block framing everywhere, trailer required.
  *  - codec: GIF-LZW both directions — decoder with variable code width
  *    (up to 12 bits), CLEAR/EOI codes, the KwKwK case, dictionary
  *    reset; encoder building the same dictionary (reset at 4096) so
  *    fixtures carry REAL compression, not the no-compression trick.
  *  - interlaced frames de-interlace (the four-pass row order) so
  *    consumers always see logical row order.
  *
  * GifSpec pins interop BOTH ways against javax.imageio (it reads our
  * bytes pixel-for-pixel, we read its — including its real LZW streams
  * and multi-frame readers); x113 gates container facts and x114 the
  * decoded pixels against DuckDB re-deriving both from doc_id
  * arithmetic. Anything outside the grammar rejects loudly by name.
  *
  * 100 TB shape: per-row decode kernels, zero shuffle — the x67/x94
  * discipline; one task per file in the glob arm.
  */
object GifSource {

  private[graft] case class GifFrame(left: Int, top: Int, w: Int, h: Int,
      interlaced: Boolean, delayCs: Int, transparentIdx: Int,
      pixels: Array[Byte]) // palette indices, logical row order
  private[graft] case class GifFile(version: String, w: Int, h: Int,
      gctSize: Int, bgIndex: Int, palette: Array[Int], // 0xRRGGBB
      frames: Seq[GifFrame], comments: Seq[String], loopCount: Int)

  // ------------------------------------------------------------ decode

  private final class Rd(bytes: Array[Byte]) {
    var pos = 0
    def u8(): Int = {
      require(pos < bytes.length, "gif: truncated")
      val b = bytes(pos) & 0xff; pos += 1; b
    }
    def u16(): Int = u8() | (u8() << 8)
    def take(n: Int): Array[Byte] = {
      require(pos + n <= bytes.length, "gif: truncated")
      val a = java.util.Arrays.copyOfRange(bytes, pos, pos + n); pos += n; a
    }
    /** Concatenated data sub-blocks up to the 0 terminator. */
    def subBlocks(): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var n = u8()
      while (n != 0) { out.write(take(n)); n = u8() }
      out.toByteArray
    }
  }

  /** GIF-LZW decode of `data` with the given minimum code size into
    * exactly `expected` palette indices.
    */
  private[graft] def lzwDecode(data: Array[Byte], minCodeSize: Int,
                               expected: Int): Array[Byte] = {
    require(minCodeSize >= 2 && minCodeSize <= 8, "gif: bad LZW code size")
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new Array[Byte](expected)
    var outPos = 0
    // dictionary as prefix links: suffix byte + prefix code per entry
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var next = clear + 2
    var width = minCodeSize + 1
    var bitPos = 0
    def readCode(): Int = {
      var v = 0
      var got = 0
      while (got < width) {
        val byteI = bitPos >> 3
        require(byteI < data.length, "gif: LZW stream truncated")
        val avail = 8 - (bitPos & 7)
        val take = math.min(avail, width - got)
        v |= (((data(byteI) & 0xff) >> (bitPos & 7)) & ((1 << take) - 1)) << got
        got += take; bitPos += take
      }
      v
    }
    def emit(code: Int): Byte = { // writes the string for `code`, returns its first byte
      var stack = List.empty[Byte]
      var c = code
      while (c >= clear + 2) { stack = suffix(c) :: stack; c = prefix(c) }
      require(c < clear, s"gif: corrupt LZW code chain at $c")
      stack = c.toByte :: stack
      val first = stack.head
      stack.foreach { b =>
        require(outPos < expected, "gif: LZW emits more pixels than the frame")
        out(outPos) = b; outPos += 1
      }
      first
    }
    var prev = -1
    var done = false
    while (!done) {
      val code = readCode()
      if (code == clear) {
        next = clear + 2; width = minCodeSize + 1; prev = -1
      } else if (code == eoi) {
        done = true
      } else if (prev < 0) {
        require(code < clear, "gif: first LZW code not a literal")
        emit(code)
        prev = code
      } else {
        require(code <= next, s"gif: LZW code $code beyond dictionary")
        val first =
          if (code < next) emit(code)
          else { // KwKwK: code == next, string = prev's string + its first byte
            val f = emit(prev)
            require(outPos < expected, "gif: LZW emits more pixels than the frame")
            out(outPos) = f; outPos += 1
            f
          }
        if (next < 4096) {
          prefix(next) = prev; suffix(next) = first; next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    require(outPos == expected,
      s"gif: LZW decoded $outPos pixels, frame needs $expected")
    out
  }

  /** The four interlace passes' logical row for stored row `i` of `h`. */
  private[graft] def deinterlace(pixels: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](pixels.length)
    var src = 0
    Seq((0, 8), (4, 8), (2, 4), (1, 2)).foreach { case (start, step) =>
      var row = start
      while (row < h) {
        System.arraycopy(pixels, src * w, out, row * w, w)
        src += 1; row += step
      }
    }
    out
  }

  private[graft] def parseGif(bytes: Array[Byte]): GifFile = {
    val r = new Rd(bytes)
    val sig = new String(r.take(6), "ISO-8859-1")
    require(sig == "GIF87a" || sig == "GIF89a", s"gif: bad signature '$sig'")
    val w = r.u16(); val h = r.u16()
    val flags = r.u8()
    val bg = r.u8()
    r.u8() // aspect ratio
    val hasGct = (flags & 0x80) != 0
    val gctSize = if (hasGct) 2 << (flags & 7) else 0
    require(hasGct, "gif: files without a global color table unsupported")
    // u16×u16 screens can reach 4.3G pixels — bound the decode budget
    require(w > 0 && h > 0 && w.toLong * h <= (1L << 28),
      "gif: logical screen exceeds supported decoded size (256M px)")
    val palette = new Array[Int](gctSize)
    (0 until gctSize).foreach { i =>
      palette(i) = (r.u8() << 16) | (r.u8() << 8) | r.u8()
    }
    val frames = scala.collection.mutable.ArrayBuffer[GifFrame]()
    val comments = scala.collection.mutable.ArrayBuffer[String]()
    var loopCount = -1
    var delayCs = 0
    var transparentIdx = -1
    var trailer = false
    while (!trailer) {
      r.u8() match {
        case 0x3B => trailer = true
        case 0x21 => // extension
          r.u8() match {
            case 0xF9 => // graphic control: applies to the NEXT image
              val d = r.subBlocks()
              require(d.length == 4, "gif: bad graphic control block")
              delayCs = (d(1) & 0xff) | ((d(2) & 0xff) << 8)
              transparentIdx = if ((d(0) & 1) != 0) d(3) & 0xff else -1
            case 0xFE =>
              comments += new String(r.subBlocks(), "ISO-8859-1")
            case 0xFF =>
              val d = r.subBlocks()
              // NETSCAPE 2.0 loop block: app id (11) + [1, lo, hi]
              if (d.length >= 14 &&
                new String(d, 0, 11, "ISO-8859-1") == "NETSCAPE2.0" &&
                d(11) == 1)
                loopCount = (d(12) & 0xff) | ((d(13) & 0xff) << 8)
            case _ => r.subBlocks() // plain text etc.: skip by framing
          }
        case 0x2C => // image descriptor
          val left = r.u16(); val top = r.u16()
          val fw = r.u16(); val fh = r.u16()
          // validate BEFORE lzwDecode allocates fw*fh: a <100-byte
          // hostile GIF must not force a 2 GB allocation (and u16×u16
          // can wrap Int); the screen bound below caps the product
          require(fw > 0 && fh > 0 && left + fw <= w && top + fh <= h,
            "gif: frame exceeds the logical screen")
          val f = r.u8()
          require((f & 0x80) == 0, "gif: local color tables unsupported")
          val interlaced = (f & 0x40) != 0
          val minCode = r.u8()
          val raw = lzwDecode(r.subBlocks(), minCode, fw * fh)
          val px = if (interlaced) deinterlace(raw, fw, fh) else raw
          frames += GifFrame(left, top, fw, fh, interlaced, delayCs,
            transparentIdx, px)
          delayCs = 0; transparentIdx = -1 // GCE applies to one image
        case other => sys.error(f"gif: unknown block 0x$other%02X")
      }
    }
    require(r.pos == bytes.length, "gif: bytes after trailer")
    require(frames.nonEmpty, "gif: no image data")
    GifFile(sig.substring(3), w, h, gctSize, bg, palette, frames.toSeq,
      comments.toSeq, loopCount)
  }

  // ------------------------------------------------------------ encode

  /** GIF-LZW encode (real dictionary compression, reset at 4096). */
  private[graft] def lzwEncode(pixels: Array[Byte], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var cur = 0L
    var bits = 0
    var width = minCodeSize + 1
    def write(code: Int): Unit = {
      cur |= code.toLong << bits; bits += width
      while (bits >= 8) { out.write((cur & 0xff).toInt); cur >>= 8; bits -= 8 }
    }
    var dict = scala.collection.mutable.Map[(Int, Int), Int]()
    var next = clear + 2
    write(clear)
    var prev = -1
    pixels.foreach { pb =>
      val k = pb & 0xff
      if (prev < 0) prev = k
      else dict.get((prev, k)) match {
        case Some(code) => prev = code
        case None =>
          write(prev)
          dict((prev, k)) = next
          next += 1
          // width schedule mirrors the decoder's LAG: the decoder only
          // learns an entry one code after the encoder assigns it (the
          // first post-clear code adds nothing), so the encoder grows
          // one entry LATER than its own capacity — at capacity+1 —
          // to keep both sides reading/writing the same widths
          if (next == (1 << width) + 1 && width < 12) width += 1
          if (next >= 4096) { // dictionary full: reset, like real writers
            write(clear)
            dict = scala.collection.mutable.Map[(Int, Int), Int]()
            next = clear + 2
            width = minCodeSize + 1
          }
          prev = k
      }
    }
    if (prev >= 0) write(prev)
    write(eoi)
    if (bits > 0) out.write((cur & 0xff).toInt)
    out.toByteArray
  }

  private def subBlocked(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var pos = 0
    while (pos < data.length) {
      val n = math.min(255, data.length - pos)
      out.write(n); out.write(data, pos, n); pos += n
    }
    out.write(0)
    out.toByteArray
  }

  // Fixture arithmetic (the DuckDB oracle re-derives everything):
  //   logical screen w = 16+(id%5)*4, h = 12+(id%3)*4; 16-color GCT with
  //   palette[i] = (i*15, (i*9)%128, 255-i*10); frames = id%2+1 — frame 0
  //   full-screen, and on ODD ids a second frame at (2,1) sized
  //   (w-4, h-2) INTERLACED; pixel index (x,y) of frame j =
  //   (id + j + 3x + 7y) % 16 in LOCAL coordinates; GCE delay
  //   (id+j)%10+1 cs; comment "doc {id}" when id%3==0; NETSCAPE loop
  //   id%5 when id%2==0.
  private[graft] def palR(i: Int): Int = i * 15
  private[graft] def palG(i: Int): Int = (i * 9) % 128
  private[graft] def palB(i: Int): Int = 255 - i * 10

  private[graft] def gifOf(id: Long): Array[Byte] = {
    val w = 16 + (id % 5).toInt * 4
    val h = 12 + (id % 3).toInt * 4
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("ISO-8859-1"))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    le16(w); le16(h)
    out.write(0x80 | 3) // GCT present, 2<<3 = 16 entries
    out.write(0); out.write(0)
    (0 until 16).foreach { i =>
      out.write(palR(i)); out.write(palG(i)); out.write(palB(i))
    }
    if (id % 2 == 0) { // NETSCAPE loop block
      out.write(0x21); out.write(0xFF); out.write(11)
      out.write("NETSCAPE2.0".getBytes("ISO-8859-1"))
      out.write(3); out.write(1)
      out.write((id % 5).toInt); out.write(0)
      out.write(0)
    }
    if (id % 3 == 0) { // comment
      out.write(0x21); out.write(0xFE)
      out.write(subBlocked(s"doc $id".getBytes("ISO-8859-1")))
    }
    val nFrames = (id % 2).toInt + 1
    (0 until nFrames).foreach { j =>
      // graphic control (delay in cs)
      out.write(0x21); out.write(0xF9); out.write(4)
      out.write(0)
      val delay = ((id + j) % 10).toInt + 1
      out.write(delay & 0xff); out.write((delay >> 8) & 0xff)
      out.write(0); out.write(0)
      // image descriptor
      val (left, top, fw, fh, inter) =
        if (j == 0) (0, 0, w, h, false) else (2, 1, w - 4, h - 2, true)
      out.write(0x2C)
      le16(left); le16(top); le16(fw); le16(fh)
      out.write(if (inter) 0x40 else 0)
      val logical = Array.tabulate(fw * fh) { p =>
        val x = p % fw; val y = p / fw
        ((id + j + 3 * x + 7 * y) % 16).toByte
      }
      val stored =
        if (!inter) logical
        else { // inverse of deinterlace: emit rows in pass order
          val rows = Seq((0, 8), (4, 8), (2, 4), (1, 2)).flatMap {
            case (s, st) => s until fh by st
          }
          val a = new Array[Byte](logical.length)
          rows.zipWithIndex.foreach { case (row, i) =>
            System.arraycopy(logical, row * fw, a, i * fw, fw)
          }
          a
        }
      out.write(4) // min code size (16 colors)
      out.write(subBlocked(lzwEncode(stored, 4)))
    }
    out.write(0x3B)
    out.toByteArray
  }

  def synthesizeGif(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .map(id => graft.operators.Multimodal.ImageRow(id, gifOf(id)))
      .toDF()
  }

  /** x113 gate: container facts per file. */
  def gifTable(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("content")).as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val f = parseGif(bytes)
        (id, f.version, f.w, f.h, f.gctSize, f.frames.size,
          f.frames.map(_.delayCs.toLong).sum,
          f.frames.count(_.interlaced),
          f.comments.size, f.loopCount)
      }
      .toDF("doc_id", "version", "w", "h", "gct_size", "n_frames",
        "delay_sum_cs", "n_interlaced", "n_comments", "loop_count")
  }

  /** x114 gate: decoded pixels — per frame, the palette-resolved RGB
    * component sum (LZW decode + de-interlace must both be exact).
    */
  def gifPixelTable(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("content")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val f = parseGif(bytes)
        f.frames.zipWithIndex.map { case (fr, j) =>
          var sum = 0L
          fr.pixels.foreach { p =>
            val i = p & 0xff
            sum += palR(i) + palG(i) + palB(i)
          }
          (id, j, fr.w, fr.h, if (fr.interlaced) 1 else 0, sum)
        }
      }
      .toDF("doc_id", "frame", "w", "h", "interlaced", "rgb_sum")
  }
}
