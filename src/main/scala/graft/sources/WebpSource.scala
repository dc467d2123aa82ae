package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WebP — RIFF container walk (x131) and a from-scratch VP8L lossless
  * pixel decoder (x132), closing the image family's largest format gap
  * (reference seam: the reference has no media handling; this is
  * extension surface following the GIF/TIFF discipline —
  * `GifSource`/`TiffSource`). WebP is several percent of modern crawl
  * images and the default output of image CDNs.
  *
  * Surface:
  *  - container: VP8X (canvas dims, ICC/alpha/EXIF/XMP/animation
  *    flags), ANIM/ANMF animation frames (offsets, dims, durations,
  *    nested payloads), VP8 lossy frame-header facts (keyframe bit,
  *    start code, 14-bit dims), VP8L header facts, ALPH presence.
  *  - VP8L decode (the complete lossless bitstream): LSB-first bit
  *    reading, simple and code-length-coded canonical prefix codes
  *    (DEFLATE-style assignment, code bits MSB-first in the stream,
  *    including the 16/17/18 repeat machinery and the max-symbol
  *    shortcut), meta prefix-code groups via the entropy image, color
  *    cache (0x1e35a7bd multiplicative hash), LZ77 backward references
  *    with the 40-symbol prefix-coded distances and the 120-entry
  *    two-dimensional distance mapping, and all four transforms —
  *    predictor (14 modes), color (cross-channel deltas),
  *    subtract-green, color-indexing (unbundled palettes).
  *
  * NAMED REFUSALS (the MkvSource/mp4 honesty discipline):
  *  - lossy VP8 pixel decode (boolean entropy coder + DCT — a codec,
  *    not a container; header facts only).
  *  - pixel-bundled color indexing (palette ≤ 16 colors packs several
  *    pixels per byte); unbundled palettes (17..256) decode.
  * ALPH planes DECODE ([[decodeAlpha]]): raw (method 0) and
  * VP8L-compressed (method 1 — a headerless image stream through the
  * same decoder), with the horizontal/vertical/gradient prediction
  * filters inverted; reserved methods refuse by name.
  *
  * The 2D distance table is TRANSCRIBED verbatim from the spec's
  * published 120-entry table (the r20 generator's d^2-cut rule
  * diverged from it at index 96 — ADVICE r20 high); WebpSpec pins all
  * 120 entries.
  *
  * Hostile-input rules: 14-bit dims bound allocation by construction,
  * but the pixel-count budget is still checked BEFORE the ARGB
  * allocation (16383x16383 is 256M pixels = 1 GiB); RIFF/chunk sizes
  * are validated against the buffer before any slice; truncated
  * bitstreams and incomplete prefix codes fail by name.
  *
  * 100 TB shape: narrow per-row kernels over a binary column — no
  * shuffle, no driver state, O(w*h) per image with caps enforced
  * before allocation.
  */
object WebpSource {

  // ------------------------------------------------------------ bits

  /** LSB-first bit reader over a byte slice; loud on truncation. */
  private final class Br(b: Array[Byte], off: Int, len: Int) {
    private var pos = 0L // bit position within the slice
    private val end = len.toLong * 8
    def bits(n: Int): Int = {
      require(pos + n <= end, s"webp: bitstream truncated at bit $pos")
      var v = 0
      var i = 0
      while (i < n) {
        val p = pos + i
        val bit = (b(off + (p >> 3).toInt) >> (p & 7).toInt) & 1
        v |= bit << i
        i += 1
      }
      pos += n
      v
    }
    def bit(): Int = bits(1)
  }

  // --------------------------------------------------------- huffman

  /** One decodable prefix code. */
  private sealed trait Code { def read(br: Br): Int }

  /** 0-bit single-symbol code (VP8L: emits without consuming). */
  private final class Single(sym: Int) extends Code {
    def read(br: Br): Int = sym
  }

  /** Simple 2-symbol code: VP8L assigns code 0 to the FIRST symbol as
    * read off the stream (NOT canonical order — the two may arrive
    * descending).
    */
  private final class SimplePair(s0: Int, s1: Int) extends Code {
    def read(br: Br): Int = if (br.bit() == 0) s0 else s1
  }

  /** Per-decode prefix-tree allocation budget (ADVICE r20 low, reworked
    * r22): a hostile entropy image can declare up to 65536 meta groups ×
    * 5 codes — unbounded, a few-MB crafted file could drive huge
    * allocations even though MaxPixels bounds the ARGB buffer. Every
    * tree charges its ACTUAL allocation (2·used ints — node-count-sized
    * since r22, so depth-15 codes no longer charge the 2<<15 worst case)
    * BEFORE allocating. The budget scales with the declared image size —
    * max(8M ints, 4 ints/pixel) — so total tree memory stays O(pixel
    * buffer) (which the decoder commits to anyway) while photo-scale
    * images with thousands of full-alphabet meta groups sit orders of
    * magnitude under it (ADVICE r21: the flat 8M-int budget charged at
    * the declared 2<<depth worst case could refuse legitimate deep-tree
    * photos). Hostile small-dims floods still fail by name at the floor.
    */
  private final class TreeBudget(pixels: Long) {
    private var remaining: Long =
      math.max(8L * 1024 * 1024, 4L * pixels)
    def charge(ints: Long): Unit = {
      remaining -= ints
      require(remaining >= 0,
        "webp: prefix-tree allocation budget exceeded " +
          "(hostile meta-group / code-depth shape)")
    }
  }

  /** Canonical prefix code over `lengths` (DEFLATE assignment: codes
    * ordered by (length, symbol); the stream carries each code's bits
    * most-significant first). A code with exactly one used symbol is
    * 0-bit (emits without consuming, per VP8L).
    */
  private final class Huff(lengths: Array[Int], budget: TreeBudget)
      extends Code {
    private val used = lengths.count(_ > 0)
    require(used > 0, "webp: prefix code with no symbols")
    val single: Int = if (used == 1) lengths.indexWhere(_ > 0) else -1
    // array tree: node i has children at tree(2i), tree(2i+1); leaves
    // are encoded as -(symbol+2), 0 = absent. Node ids are assigned
    // SEQUENTIALLY, so the array is sized by node count, not code depth
    // (r22): a complete code over `used` leaves has exactly used-1
    // internal nodes (ids 0..used-2), so 2*used slots always suffice —
    // the previous 2<<maxLen sizing allocated and zeroed up to 64Ki ints
    // per depth-15 tree for the same ≤2*used live slots (x131/x132
    // decode path, and the reason the budget overcharged deep codes).
    private val tree = {
      if (single >= 0) null
      else {
        val maxLen = lengths.max
        val blCount = new Array[Int](maxLen + 1)
        lengths.foreach(l => if (l > 0) blCount(l) += 1)
        // completeness check: a decoder walking an over/under-subscribed
        // code would read past leaves or hang — fail by name instead
        var code = 0
        val nextCode = new Array[Int](maxLen + 1)
        var l = 1
        var space = 1 << maxLen
        while (l <= maxLen) {
          code = (code + blCount(l - 1)) << 1
          nextCode(l) = code
          space -= blCount(l) << (maxLen - l)
          l += 1
        }
        require(space == 0,
          s"webp: incomplete or oversubscribed prefix code (slack $space)")
        budget.charge(2L * used)
        val t = new Array[Int](2 * used)
        var nodes = 1
        var sym = 0
        while (sym < lengths.length) {
          val len = lengths(sym)
          if (len > 0) {
            val c = nextCode(len); nextCode(len) += 1
            var node = 0
            var d = len - 1
            while (d >= 0) {
              val bit = (c >> d) & 1
              val slot = 2 * node + bit
              if (d == 0) t(slot) = -(sym + 2)
              else {
                if (t(slot) == 0) { t(slot) = nodes; nodes += 1 }
                node = t(slot)
              }
              d -= 1
            }
          }
          sym += 1
        }
        t
      }
    }
    def read(br: Br): Int = {
      if (single >= 0) return single
      var node = 0
      while (true) {
        val v = tree(2 * node + br.bit())
        if (v < 0) return -v - 2
        node = v
      }
      -1 // unreachable
    }
  }

  /** Code-length symbol read order (VP8L, same 19-symbol alphabet as
    * DEFLATE but this order).
    */
  private val ClOrder: Array[Int] =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** One prefix code off the stream: simple (1–2 symbols) or
    * code-length-coded (with 16/17/18 repeats and the max-symbol
    * shortcut).
    */
  private def readCode(br: Br, alphabetSize: Int,
                       budget: TreeBudget): Code = {
    if (br.bit() == 1) { // simple
      val nSyms = br.bit() + 1
      val first8 = br.bit()
      val s0 = br.bits(if (first8 == 1) 8 else 1)
      require(s0 < alphabetSize, s"webp: simple-code symbol $s0 out of range")
      if (nSyms == 1) return new Single(s0)
      val s1 = br.bits(8)
      require(s1 < alphabetSize && s1 != s0,
        s"webp: simple-code symbol $s1 invalid")
      new SimplePair(s0, s1)
    } else {
      val numCl = 4 + br.bits(4)
      require(numCl <= 19, "webp: too many code-length codes")
      val clLens = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLens(ClOrder(i)) = br.bits(3); i += 1 }
      val clCode = new Huff(clLens, budget)
      var maxSymbol =
        if (br.bit() == 1) {
          val nb = 2 + 2 * br.bits(3)
          2 + br.bits(nb)
        } else alphabetSize
      val lens = new Array[Int](alphabetSize)
      var sym = 0
      var prev = 8
      while (sym < alphabetSize && maxSymbol > 0) {
        maxSymbol -= 1
        val cl = clCode.read(br)
        if (cl < 16) {
          lens(sym) = cl; sym += 1
          if (cl != 0) prev = cl
        } else {
          val (rep, value) = cl match {
            case 16 => (3 + br.bits(2), prev)
            case 17 => (3 + br.bits(3), 0)
            case _ => (11 + br.bits(7), 0)
          }
          require(sym + rep <= alphabetSize,
            s"webp: code-length repeat overruns the alphabet at $sym")
          var j = 0
          while (j < rep) { lens(sym) = value; sym += 1; j += 1 }
        }
      }
      new Huff(lens, budget)
    }
  }

  // ----------------------------------------------------- vp8l decode

  /** Prefix-coded value for length/distance symbols: codes 0..3 are
    * the values 1..4; above that, (code-2)>>1 extra bits.
    */
  private def prefixValue(code: Int, br: Br): Int = {
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      offset + br.bits(extra) + 1
    }
  }

  /** The 120-entry 2D distance map, TRANSCRIBED verbatim from the VP8L
    * spec's published table (RFC 9649 §5.2.2). Entry i (0-based) is
    * (dx, dy). The r20 generator cut the candidate window at d² ≤ 74,
    * which diverged from the published table from index 96 on (the
    * spec's true window is dx ∈ [-7, 8], dy ∈ [0, 7], sorted by
    * (d², larger dy first, positive dx first, |dx|)); streams using
    * plane codes 97..120 decoded to wrong pixels. WebpSpec pins all
    * 120 entries against this literal table.
    */
  private[graft] val DistanceMap: Array[(Int, Int)] = Array(
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7))

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException("webp: " + msg)

  private case class Transform(kind: Int, sizeBits: Int,
                               data: Array[Int], extra: Int)

  private val MaxPixels = 1 << 26 // 64M px — checked BEFORE allocation

  private def subSize(size: Int, bits: Int): Int =
    (size + (1 << bits) - 1) >> bits

  /** Decode one VP8L "image stream" at the current bit position —
    * transforms and meta prefix codes only at level 0 (the spec's
    * spatially-coded vs entropy-coded image split).
    */
  private def readImageStream(br: Br, w0: Int, h: Int, isLevel0: Boolean,
                              budget: TreeBudget)
      : Array[Int] = {
    require(w0 > 0 && h > 0 && w0.toLong * h <= MaxPixels,
      s"webp: image ${w0}x$h exceeds the decode budget")
    var w = w0
    val transforms = scala.collection.mutable.ArrayBuffer.empty[Transform]
    if (isLevel0) {
      val seen = new Array[Boolean](4)
      while (br.bit() == 1) {
        val kind = br.bits(2)
        require(!seen(kind), s"webp: duplicate transform $kind")
        seen(kind) = true
        kind match {
          case 0 | 1 => // predictor / color transform: block subimage
            val sizeBits = br.bits(3) + 2
            val img = readImageStream(br,
              subSize(w, sizeBits), subSize(h, sizeBits), isLevel0 = false,
              budget)
            transforms += Transform(kind, sizeBits, img, 0)
          case 2 => transforms += Transform(2, 0, null, 0)
          case _ =>
            val paletteSize = br.bits(8) + 1
            require(paletteSize > 16, "webp: pixel-bundled color " +
              "indexing (palette <= 16) is a named refusal; " +
              "unbundled palettes decode")
            val deltas = readImageStream(br, paletteSize, 1,
              isLevel0 = false, budget)
            // palette entries are component-wise sums of all deltas
            val pal = new Array[Int](paletteSize)
            var prev = 0
            var i = 0
            while (i < paletteSize) {
              val d = deltas(i)
              val a = (((prev >>> 24) + (d >>> 24)) & 0xff) << 24
              val r = ((((prev >> 16) & 0xff) + ((d >> 16) & 0xff)) & 0xff) << 16
              val g = ((((prev >> 8) & 0xff) + ((d >> 8) & 0xff)) & 0xff) << 8
              val b2 = (((prev & 0xff) + (d & 0xff)) & 0xff)
              prev = a | r | g | b2
              pal(i) = prev
              i += 1
            }
            transforms += Transform(3, 0, pal, paletteSize)
        }
      }
    }
    val cacheBits =
      if (br.bit() == 1) {
        val cb = br.bits(4)
        require(cb >= 1 && cb <= 11, s"webp: color cache bits $cb out of range")
        cb
      } else 0
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    // meta prefix codes (level 0 only)
    var metaBits = 0
    var metaImg: Array[Int] = null
    var metaW = 0
    var numGroups = 1
    if (isLevel0 && br.bit() == 1) {
      metaBits = br.bits(3) + 2
      metaW = subSize(w, metaBits)
      metaImg = readImageStream(br, metaW, subSize(h, metaBits),
        isLevel0 = false, budget)
      var mx = 0
      metaImg.foreach(p => mx = math.max(mx, (p >> 8) & 0xffff))
      numGroups = mx + 1
    }
    val greenAlpha = 256 + 24 + cacheSize
    // each group: green+len+cache, red, blue, alpha, distance
    val groups = Array.fill(numGroups) {
      Array(readCode(br, greenAlpha, budget), readCode(br, 256, budget),
        readCode(br, 256, budget), readCode(br, 256, budget),
        readCode(br, 40, budget))
    }
    val npix = w * h
    val out = new Array[Int](npix)
    val cache = if (cacheBits > 0) new Array[Int](cacheSize) else null
    def cacheInsert(argb: Int): Unit =
      if (cache != null)
        cache((0x1e35a7bd * argb) >>> (32 - cacheBits)) = argb
    var pos = 0
    while (pos < npix) {
      val x = pos % w
      val g =
        if (numGroups == 1) groups(0)
        else {
          val y = pos / w
          val mp = metaImg((y >> metaBits) * metaW + (x >> metaBits))
          val idx = (mp >> 8) & 0xffff
          require(idx < numGroups, s"webp: meta group $idx out of range")
          groups(idx)
        }
      val s = g(0).read(br)
      if (s < 256) {
        val red = g(1).read(br)
        val blue = g(2).read(br)
        val alpha = g(3).read(br)
        val argb = (alpha << 24) | (red << 16) | (s << 8) | blue
        out(pos) = argb
        cacheInsert(argb)
        pos += 1
      } else if (s < 280) {
        val length = prefixValue(s - 256, br)
        val distVal = prefixValue(g(4).read(br), br)
        val dist0 =
          if (distVal > 120) distVal - 120
          else {
            val (dx, dy) = DistanceMap(distVal - 1)
            math.max(1, dy * w + dx)
          }
        require(dist0 <= pos,
          s"webp: backward reference past the image start at pixel $pos")
        require(pos + length <= npix,
          s"webp: backward reference overruns the image at pixel $pos")
        var i = 0
        while (i < length) {
          val v = out(pos - dist0)
          out(pos) = v
          cacheInsert(v)
          pos += 1
          i += 1
        }
      } else {
        val idx = s - 280
        require(cache != null && idx < cacheSize,
          s"webp: color cache index $idx without a cache that size")
        out(pos) = cache(idx)
        pos += 1
      }
    }
    // inverse transforms, reverse of read order
    var result = out
    transforms.reverseIterator.foreach { t =>
      result = t.kind match {
        case 0 => inversePredictor(result, w, h, t.sizeBits, t.data)
        case 1 => inverseColorTransform(result, w, h, t.sizeBits, t.data)
        case 2 => inverseSubtractGreen(result)
        case _ => inverseColorIndex(result, t.data)
      }
    }
    result
  }

  private def inverseSubtractGreen(px: Array[Int]): Array[Int] = {
    var i = 0
    while (i < px.length) {
      val p = px(i)
      val g = (p >> 8) & 0xff
      val r = (((p >> 16) & 0xff) + g) & 0xff
      val b = ((p & 0xff) + g) & 0xff
      px(i) = (p & 0xff00ff00.toInt) | (r << 16) | b
      i += 1
    }
    px
  }

  private def inverseColorIndex(px: Array[Int], pal: Array[Int]): Array[Int] = {
    var i = 0
    while (i < px.length) {
      val idx = (px(i) >> 8) & 0xff
      require(idx < pal.length, s"webp: palette index $idx out of range")
      px(i) = pal(idx)
      i += 1
    }
    px
  }

  private def inverseColorTransform(px: Array[Int], w: Int, h: Int,
                                    bits: Int, cte: Array[Int]): Array[Int] = {
    val cw = subSize(w, bits)
    def delta(t: Int, c: Int): Int = {
      val ts = (t << 24) >> 24 // sign-extend both operands
      val cs = (c << 24) >> 24
      (ts * cs) >> 5
    }
    var y = 0
    var pos = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val e = cte((y >> bits) * cw + (x >> bits))
        val g2r = e & 0xff
        val g2b = (e >> 8) & 0xff
        val r2b = (e >> 16) & 0xff
        val p = px(pos)
        val g = (p >> 8) & 0xff
        val r = (((p >> 16) & 0xff) + delta(g2r, g)) & 0xff
        val b = ((p & 0xff) + delta(g2b, g) + delta(r2b, r)) & 0xff
        px(pos) = (p & 0xff00ff00.toInt) | (r << 16) | b
        pos += 1; x += 1
      }
      y += 1
    }
    px
  }

  private def avg2(a: Int, b: Int): Int =
    ((((a ^ b) & 0xfefefefe) >>> 1) + (a & b))

  private def inversePredictor(px: Array[Int], w: Int, h: Int,
                               bits: Int, modes: Array[Int]): Array[Int] = {
    val mw = subSize(w, bits)
    def addPixels(a: Int, b: Int): Int = {
      val rb = ((a & 0x00ff00ff) + (b & 0x00ff00ff)) & 0x00ff00ff
      val ag = (((a >>> 8) & 0x00ff00ff) + ((b >>> 8) & 0x00ff00ff)) & 0x00ff00ff
      (ag << 8) | rb
    }
    def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
    def chan(p: Int, s: Int): Int = (p >>> s) & 0xff
    def select(l: Int, t: Int, tl: Int): Int = {
      var pl = 0; var pt = 0
      var s = 0
      while (s < 32) {
        val pc = chan(l, s) + chan(t, s) - chan(tl, s)
        pl += math.abs(pc - chan(l, s))
        pt += math.abs(pc - chan(t, s))
        s += 8
      }
      if (pl < pt) l else t
    }
    def casFull(l: Int, t: Int, tl: Int): Int = {
      var out = 0
      var s = 0
      while (s < 32) {
        out |= clamp(chan(l, s) + chan(t, s) - chan(tl, s)) << s
        s += 8
      }
      out
    }
    def casHalf(ave: Int, tl: Int): Int = {
      var out = 0
      var s = 0
      while (s < 32) {
        val a = chan(ave, s)
        out |= clamp(a + (a - chan(tl, s)) / 2) << s
        s += 8
      }
      out
    }
    var pos = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pred =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) px(pos - 1) // top row: L
          else if (x == 0) px(pos - w) // left column: T
          else {
            val mode = (modes((y >> bits) * mw + (x >> bits)) >> 8) & 0xff
            val l = px(pos - 1)
            val t = px(pos - w)
            val tl = px(pos - w - 1)
            // TR at the right edge wraps to the current row's first
            // pixel via the flat index pos - w + 1 (already decoded)
            val tr = px(pos - w + 1)
            mode match {
              case 0 => 0xff000000
              case 1 => l
              case 2 => t
              case 3 => tr
              case 4 => tl
              case 5 => avg2(avg2(l, tr), t)
              case 6 => avg2(l, tl)
              case 7 => avg2(l, t)
              case 8 => avg2(tl, t)
              case 9 => avg2(t, tr)
              case 10 => avg2(avg2(l, tl), avg2(t, tr))
              case 11 => select(l, t, tl)
              case 12 => casFull(l, t, tl)
              case 13 => casHalf(avg2(l, t), tl)
              case m => fail(s"predictor mode $m out of range")
            }
          }
        px(pos) = addPixels(px(pos), pred)
        pos += 1; x += 1
      }
      y += 1
    }
    px
  }

  /** Decode a VP8L chunk payload: (width, height, alphaHint, ARGB). */
  private[graft] def decodeVp8l(b: Array[Byte], off: Int, len: Int)
      : (Int, Int, Boolean, Array[Int]) = {
    require(len >= 5, "webp: VP8L payload shorter than its header")
    require((b(off) & 0xff) == 0x2f,
      f"webp: bad VP8L signature 0x${b(off) & 0xff}%02x")
    val br = new Br(b, off + 1, len - 1)
    val w = br.bits(14) + 1
    val h = br.bits(14) + 1
    val alphaHint = br.bit() == 1
    val version = br.bits(3)
    require(version == 0, s"webp: VP8L version $version unsupported")
    (w, h, alphaHint, readImageStream(br, w, h, isLevel0 = true,
      new TreeBudget(w.toLong * h)))
  }

  // -------------------------------------------------------- container

  private[graft] case class WebpFrame(
      kind: String, // "lossy" | "lossless"
      x: Int, y: Int, w: Int, h: Int, durationMs: Int,
      payloadOff: Int, payloadLen: Int, hasAlph: Boolean,
      alphOff: Int = -1, alphLen: Int = 0)

  private[graft] case class WebpFile(
      fmt: String, // "lossy" | "lossless" | "extended"
      canvasW: Int, canvasH: Int,
      hasAlpha: Boolean, hasAnim: Boolean,
      hasIcc: Boolean, hasExif: Boolean, hasXmp: Boolean,
      loopCount: Int, frames: Seq[WebpFrame], bytes: Array[Byte])

  private def le32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL)) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def le24(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "ISO-8859-1")

  /** VP8 (lossy) frame-header facts: (w, h). Keyframe only. */
  private def vp8Dims(b: Array[Byte], off: Int, len: Int): (Int, Int) = {
    require(len >= 10, "webp: VP8 payload shorter than its header")
    val t0 = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16)
    require((t0 & 1) == 0, "webp: VP8 interframe cannot stand alone")
    require((b(off + 3) & 0xff) == 0x9d && (b(off + 4) & 0xff) == 0x01 &&
      (b(off + 5) & 0xff) == 0x2a, "webp: bad VP8 keyframe start code")
    (le16(b, off + 6) & 0x3fff, le16(b, off + 8) & 0x3fff)
  }

  /** Walk chunks in [from, to): returns (frames, hasAlph). Used for
    * both the top level and ANMF nesting.
    */
  private def walkChunks(b: Array[Byte], from: Int, to: Int,
                         frames: scala.collection.mutable.ArrayBuffer[WebpFrame],
                         fx: Int, fy: Int, fdur: Int): Boolean = {
    var off = from
    var alph = false
    var aOff = -1
    var aLen = 0
    while (off < to) {
      require(off + 8 <= to, s"webp: torn chunk header at offset $off")
      val t = tag(b, off)
      val sz = le32(b, off + 4)
      require(sz <= (to - off - 8).toLong,
        s"webp: chunk $t advertises $sz bytes past its container")
      val pOff = off + 8
      val pLen = sz.toInt
      t match {
        case "VP8 " =>
          val (w, h) = vp8Dims(b, pOff, pLen)
          frames += WebpFrame("lossy", fx, fy, w, h, fdur, pOff, pLen,
            alph, aOff, aLen)
        case "VP8L" =>
          require(pLen >= 5, "webp: VP8L chunk too small")
          require((b(pOff) & 0xff) == 0x2f, "webp: bad VP8L signature")
          val hdr = le32(b, pOff + 1)
          val w = ((hdr & 0x3fff) + 1).toInt
          val h = (((hdr >> 14) & 0x3fff) + 1).toInt
          frames += WebpFrame("lossless", fx, fy, w, h, fdur, pOff, pLen,
            alph, aOff, aLen)
        case "ALPH" => alph = true; aOff = pOff; aLen = pLen
        case _ => () // ICCP/EXIF/XMP payloads skipped by framing
      }
      off = pOff + pLen + (pLen & 1)
    }
    alph
  }

  private[graft] def parseWebp(bytes: Array[Byte]): WebpFile = {
    require(bytes.length >= 20, "webp: shorter than the smallest header")
    require(tag(bytes, 0) == "RIFF", "webp: not a RIFF file")
    val riffSz = le32(bytes, 4)
    require(riffSz + 8 <= bytes.length,
      s"webp: RIFF advertises ${riffSz + 8} bytes, file has ${bytes.length}")
    require(tag(bytes, 8) == "WEBP", "webp: RIFF form is not WEBP")
    val end = (8 + riffSz).toInt
    val frames = scala.collection.mutable.ArrayBuffer.empty[WebpFrame]
    val first = tag(bytes, 12)
    if (first == "VP8 " || first == "VP8L") {
      // plain (non-extended) file: exactly one bitstream chunk
      walkChunks(bytes, 12, end, frames, 0, 0, 0)
      require(frames.size == 1, "webp: plain file must carry one bitstream")
      val f = frames.head
      val hint = f.kind == "lossless" &&
        ((le32(bytes, f.payloadOff + 1) >> 28) & 1) == 1
      WebpFile(if (f.kind == "lossy") "lossy" else "lossless",
        f.w, f.h, hint, hasAnim = false, hasIcc = false, hasExif = false,
        hasXmp = false, loopCount = 0, frames.toSeq, bytes)
    } else {
      require(first == "VP8X", s"webp: unknown leading chunk '$first'")
      require(le32(bytes, 16) == 10L, "webp: VP8X must be 10 bytes")
      val flags = bytes(20) & 0xff
      val hasIcc = (flags & 0x20) != 0
      val hasAlpha = (flags & 0x10) != 0
      val hasExif = (flags & 0x08) != 0
      val hasXmp = (flags & 0x04) != 0
      val hasAnim = (flags & 0x02) != 0
      val cw = le24(bytes, 24) + 1
      val ch = le24(bytes, 27) + 1
      var loop = 0
      var off = 30
      var pendingAlph = false // an ALPH chunk pairs with the NEXT VP8
      var pendAOff = -1
      var pendALen = 0
      while (off < end) {
        require(off + 8 <= end, s"webp: torn chunk header at offset $off")
        val t = tag(bytes, off)
        val sz = le32(bytes, off + 4)
        require(sz <= (end - off - 8).toLong,
          s"webp: chunk $t advertises $sz bytes past the file")
        val pOff = off + 8
        val pLen = sz.toInt
        t match {
          case "ANIM" =>
            require(pLen == 6, "webp: ANIM must be 6 bytes")
            loop = le16(bytes, pOff + 4)
          case "ANMF" =>
            require(pLen >= 16, "webp: ANMF shorter than its header")
            val x = le24(bytes, pOff) * 2
            val y = le24(bytes, pOff + 3) * 2
            val dur = le24(bytes, pOff + 12)
            walkChunks(bytes, pOff + 16, pOff + pLen, frames, x, y, dur)
          case "ALPH" =>
            pendingAlph = true; pendAOff = pOff; pendALen = pLen
          case "VP8 " =>
            val (w, h) = vp8Dims(bytes, pOff, pLen)
            frames += WebpFrame("lossy", 0, 0, w, h, 0, pOff, pLen,
              pendingAlph, pendAOff, pendALen)
            pendingAlph = false; pendAOff = -1; pendALen = 0
          case "VP8L" =>
            require(pLen >= 5 && (bytes(pOff) & 0xff) == 0x2f,
              "webp: bad VP8L chunk")
            val hdr = le32(bytes, pOff + 1)
            frames += WebpFrame("lossless", 0, 0,
              ((hdr & 0x3fff) + 1).toInt, (((hdr >> 14) & 0x3fff) + 1).toInt,
              0, pOff, pLen, pendingAlph, pendAOff, pendALen)
            pendingAlph = false; pendAOff = -1; pendALen = 0
          case _ => () // ICCP/EXIF/XMP
        }
        off = pOff + pLen + (pLen & 1)
      }
      WebpFile("extended", cw, ch, hasAlpha, hasAnim, hasIcc, hasExif,
        hasXmp, loop, frames.toSeq, bytes)
    }
  }

  /** Decode an ALPH chunk's alpha plane for a w x h frame — closing
    * what r20 first shipped as a named refusal, because both halves
    * were already on the shelf: compression 0 is the raw plane, and
    * compression 1 is a VP8L image STREAM without the 5-byte header
    * (the spec's "spatially-coded image"; alpha rides the green
    * channel) — the same [[readImageStream]] the lossless path runs.
    * The filter byte's prediction (horizontal/vertical/gradient,
    * borders: (0,0) from 0, first row from left, first column from
    * top) inverts after decode. Reserved compression methods and
    * reserved header bits fail by name.
    */
  private[graft] def decodeAlpha(b: Array[Byte], off: Int, len: Int,
                                 w: Int, h: Int): Array[Int] = {
    require(len >= 1, "webp: empty ALPH chunk")
    require(w > 0 && h > 0 && w.toLong * h <= MaxPixels,
      s"webp: alpha plane ${w}x$h exceeds the decode budget")
    val head = b(off) & 0xff
    require((head >> 6) == 0, "webp: reserved ALPH header bits set")
    val comp = head & 3
    val filter = (head >> 2) & 3
    val plane: Array[Int] = comp match {
      case 0 =>
        require(len - 1 >= w * h,
          s"webp: raw alpha plane needs ${w * h} bytes, ALPH has ${len - 1}")
        Array.tabulate(w * h)(i => b(off + 1 + i) & 0xff)
      case 1 =>
        val br = new Br(b, off + 1, len - 1)
        readImageStream(br, w, h, isLevel0 = true,
          new TreeBudget(w.toLong * h)).map(p => (p >> 8) & 0xff)
      case other =>
        fail(s"ALPH compression method $other is reserved")
    }
    if (filter == 0) return plane
    def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
    var y = 0
    var pos = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pred =
          if (x == 0 && y == 0) 0
          else if (y == 0) plane(pos - 1)
          else if (x == 0) plane(pos - w)
          else filter match {
            case 1 => plane(pos - 1)
            case 2 => plane(pos - w)
            case _ => clamp(plane(pos - 1) + plane(pos - w)
              - plane(pos - w - 1))
          }
        plane(pos) = (plane(pos) + pred) & 0xff
        pos += 1; x += 1
      }
      y += 1
    }
    plane
  }

  /** Alpha plane of frame `i` of a parsed file, if it carries one. */
  private[graft] def decodeAlphaOf(f: WebpFile, i: Int): Option[Array[Int]] = {
    val fr = f.frames(i)
    if (fr.alphOff < 0) None
    else Some(decodeAlpha(f.bytes, fr.alphOff, fr.alphLen, fr.w, fr.h))
  }

  /** Decode every lossless frame of a parsed file: (frameIdx, w, h,
    * argb). Lossy frames are a named refusal.
    */
  private[graft] def decodeFrames(f: WebpFile): Seq[(Int, Int, Int, Array[Int])] =
    f.frames.zipWithIndex.collect {
      case (fr, i) if fr.kind == "lossless" =>
        val (w, h, _, px) = decodeVp8l(f.bytes, fr.payloadOff, fr.payloadLen)
        require(w == fr.w && h == fr.h,
          "webp: VP8L header dims disagree with the container")
        (i, w, h, px)
    }

  private[graft] def decodePixels(bytes: Array[Byte])
      : Seq[(Int, Int, Int, Array[Int])] = decodeFrames(parseWebp(bytes))

  // ---------------------------------------------------------- encode

  /** LSB-first bit writer for the fixture encoder. */
  private[graft] final class Bw {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var n = 0
    def w(v: Int, k: Int): Unit = {
      var i = 0
      while (i < k) {
        cur |= ((v >> i) & 1) << n
        n += 1
        if (n == 8) { out.write(cur); cur = 0; n = 0 }
        i += 1
      }
    }
    def bytes(): Array[Byte] = {
      if (n > 0) { out.write(cur); cur = 0; n = 0 }
      out.toByteArray
    }
  }

  /** A simple prefix code: 1 symbol (0 bits/use) or 2 (1 bit/use). */
  private def writeSimpleCode(bw: Bw, syms: Seq[Int]): Unit = {
    bw.w(1, 1) // simple
    bw.w(syms.size - 1, 1)
    bw.w(1, 1) // first symbol in 8 bits
    bw.w(syms.head, 8)
    if (syms.size == 2) bw.w(syms(1), 8)
  }

  /** Fixture pixel formula — the x132 oracle re-derives it: two-valued
    * channels (simple 2-symbol prefix codes are the whole alphabet).
    * Odd ids store with SUBTRACT_GREEN (r/b are green plus a constant,
    * so the residual channels are 1-symbol codes).
    */
  private[graft] def pixelOf(id: Long, frame: Int, x: Int, y: Int)
      : (Int, Int, Int) = {
    val g = 32 + 128 * (((id + frame + 3 * x + 7 * y) % 2).toInt)
    if (id % 2 == 0)
      (16 + 64 * (((id + frame + 5 * x + y) % 2).toInt), g,
        8 + 32 * (((id + frame + x + 11 * y) % 2).toInt))
    else ((g + 70) % 256, g, (g + 13) % 256)
  }

  /** One VP8L payload for frame `frame` of doc `id` at w x h. */
  private[graft] def vp8lOf(id: Long, frame: Int, w: Int, h: Int)
      : Array[Byte] = {
    val bw = new Bw
    bw.w(0x2f, 8)
    bw.w(w - 1, 14); bw.w(h - 1, 14)
    bw.w(0, 1) // alpha hint
    bw.w(0, 3) // version
    val subGreen = id % 2 == 1
    if (subGreen) { bw.w(1, 1); bw.w(2, 2) } // SUBTRACT_GREEN
    bw.w(0, 1) // no more transforms / no transforms
    bw.w(0, 1) // no color cache
    bw.w(0, 1) // no meta prefix codes
    // channel alphabets actually used (stored values, post-transform)
    def stored(x: Int, y: Int): (Int, Int, Int) = {
      val (r, g, b) = pixelOf(id, frame, x, y)
      if (subGreen) (((r - g) + 256) % 256, g, ((b - g) + 256) % 256)
      else (r, g, b)
    }
    val all = (0 until h).flatMap(y => (0 until w).map(x => stored(x, y)))
    val gs = all.map(_._2).distinct.sorted
    val rs = all.map(_._1).distinct.sorted
    val bs = all.map(_._3).distinct.sorted
    require(gs.size <= 2 && rs.size <= 2 && bs.size <= 2,
      "webp fixture: channel alphabet outgrew the simple-code budget")
    writeSimpleCode(bw, gs) // green
    writeSimpleCode(bw, rs) // red
    writeSimpleCode(bw, bs) // blue
    writeSimpleCode(bw, Seq(255)) // alpha
    writeSimpleCode(bw, Seq(0)) // distance (never used)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = stored(x, y)
        if (gs.size == 2) bw.w(if (g == gs(1)) 1 else 0, 1)
        if (rs.size == 2) bw.w(if (r == rs(1)) 1 else 0, 1)
        if (bs.size == 2) bw.w(if (b == bs(1)) 1 else 0, 1)
        x += 1
      }
      y += 1
    }
    bw.bytes()
  }

  /** Minimal VALID VP8 keyframe header (meta only — the walker parses
    * exactly this much; the "coefficient" tail is deterministic filler,
    * honest because pixel decode of lossy VP8 is a named refusal).
    */
  private[graft] def vp8StubOf(id: Long, w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val partSize = 20
    val t0 = (partSize << 5) | (1 << 4) // keyframe, version 0, show=1
    out.write(t0 & 0xff); out.write((t0 >> 8) & 0xff)
    out.write((t0 >> 16) & 0xff)
    out.write(0x9d); out.write(0x01); out.write(0x2a)
    out.write(w & 0xff); out.write((w >> 8) & 0x3f)
    out.write(h & 0xff); out.write((h >> 8) & 0x3f)
    var i = 0
    while (i < partSize + 8) { out.write(((id + i) % 251).toInt); i += 1 }
    out.toByteArray
  }

  private def chunk(t: String, payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    t.foreach(c => out.write(c))
    val n = payload.length
    out.write(n & 0xff); out.write((n >> 8) & 0xff)
    out.write((n >> 16) & 0xff); out.write((n >> 24) & 0xff)
    out.write(payload, 0, n)
    if ((n & 1) == 1) out.write(0)
    out.toByteArray
  }

  private def riff(chunks: Array[Byte]*): Array[Byte] = {
    val body = chunks.foldLeft(Array.emptyByteArray)(_ ++ _)
    val out = new java.io.ByteArrayOutputStream()
    "RIFF".foreach(c => out.write(c))
    val n = body.length + 4
    out.write(n & 0xff); out.write((n >> 8) & 0xff)
    out.write((n >> 16) & 0xff); out.write((n >> 24) & 0xff)
    "WEBP".foreach(c => out.write(c))
    out.write(body, 0, body.length)
    out.toByteArray
  }

  private def vp8x(flags: Int, w: Int, h: Int): Array[Byte] = {
    val p = new Array[Byte](10)
    p(0) = flags.toByte
    p(4) = ((w - 1) & 0xff).toByte; p(5) = (((w - 1) >> 8) & 0xff).toByte
    p(6) = (((w - 1) >> 16) & 0xff).toByte
    p(7) = ((h - 1) & 0xff).toByte; p(8) = (((h - 1) >> 8) & 0xff).toByte
    p(9) = (((h - 1) >> 16) & 0xff).toByte
    chunk("VP8X", p)
  }

  private def anmf(x: Int, y: Int, w: Int, h: Int, durMs: Int,
                   inner: Array[Byte]): Array[Byte] = {
    val head = new Array[Byte](16)
    def p24(i: Int, v: Int): Unit = {
      head(i) = (v & 0xff).toByte; head(i + 1) = ((v >> 8) & 0xff).toByte
      head(i + 2) = ((v >> 16) & 0xff).toByte
    }
    p24(0, x / 2); p24(3, y / 2); p24(6, w - 1); p24(9, h - 1)
    p24(12, durMs)
    head(15) = 0
    chunk("ANMF", head ++ inner)
  }

  /** Deterministic WebP per doc (the x131/x132 fixtures):
    * id%6 = 0,2 plain lossless; 1 plain lossy; 3 extended lossy with
    * alpha (ALPH present, flag set); 4 extended lossless (EXIF flag);
    * 5 extended animation with two lossless frames (full canvas, then
    * an inset (w-4)x(h-2) at (2,2)).
    */
  private[graft] def webpOf(id: Long): Array[Byte] = {
    val w = 8 + ((id % 5) * 4).toInt
    val h = 6 + ((id % 4) * 3).toInt
    (id % 6) match {
      case 0 | 2 => riff(chunk("VP8L", vp8lOf(id, 0, w, h)))
      case 1 => riff(chunk("VP8 ", vp8StubOf(id, w, h)))
      case 3 =>
        // a REAL raw alpha plane (method 0, no filter): decodeAlpha
        // reconstructs it; WebpSpec pins the formula
        val alph = new Array[Byte](1 + w * h)
        var p = 1
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            alph(p) = (255 - ((id + 3 * x + 5 * y) % 97)).toByte
            p += 1; x += 1
          }
          y += 1
        }
        riff(vp8x(0x10, w, h), chunk("ALPH", alph),
          chunk("VP8 ", vp8StubOf(id, w, h)))
      case 4 =>
        val exif = Array[Byte]('I', 'I', 42, 0)
        riff(vp8x(0x08, w, h), chunk("VP8L", vp8lOf(id, 0, w, h)),
          chunk("EXIF", exif))
      case _ =>
        riff(vp8x(0x02, w, h),
          chunk("ANIM", Array[Byte](0, 0, 0, 0, 3, 0)),
          anmf(0, 0, w, h, 40, chunk("VP8L", vp8lOf(id, 0, w, h))),
          anmf(2, 2, w - 4, h - 2, 60,
            chunk("VP8L", vp8lOf(id, 1, w - 4, h - 2))))
    }
  }

  private case class ImageDoc(doc_id: Long, content: Array[Byte])

  def synthesizeWebp(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .map(id => ImageDoc(id, webpOf(id)))
      .toDF()
  }

  /** Container facts per doc — the x131 gate. */
  def webpTable(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val f = parseWebp(bytes)
        (id, f.fmt, f.canvasW, f.canvasH, f.hasAlpha, f.hasAnim,
          f.frames.size, f.frames.count(_.kind == "lossless"))
      }
      .toDF("doc_id", "fmt", "canvas_w", "canvas_h", "has_alpha",
        "has_anim", "n_frames", "lossless_frames")
  }

  /** Decoded-pixel facts per lossless frame — the x132 gate. */
  def webpPixelTable(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        decodePixels(bytes).map { case (i, w, h, px) =>
          var rgb = 0L
          px.foreach { p =>
            rgb += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
          }
          (id, i, w, h, rgb)
        }
      }
      .toDF("doc_id", "frame", "w", "h", "rgb_sum")
  }
}
