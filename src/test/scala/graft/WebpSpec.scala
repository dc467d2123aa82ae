package graft

import graft.sources.WebpSource

/** WebP container walk (x131) + VP8L decode (x132): fixture roundtrip
  * against the pixel formula, the container pinned against a REAL
  * libwebp-encoded file (CPython's test-suite python.webp, PSF-
  * licensed public test data, embedded below), hand-built VP8L
  * bitstreams exercising every decoder path the fixture encoder does
  * not emit (code-length-coded prefix codes, max-symbol shortcut,
  * color cache, LZ77 direct and plane-coded distances, predictor /
  * color / color-indexing transforms), and the hostile-input rules.
  *
  * No external WebP decoder exists in this environment, so VP8L
  * bit-exactness is pinned through hand-derived vectors (each vector's
  * expected ARGB is computed from the spec by hand, not through the
  * engine's own encoder).
  */
class WebpSpec extends GraftSparkSpec {

  // CPython test-suite python.webp: VP8X + ALPH + lossy VP8, 16x16.
  private val realWebp: Array[Byte] = java.util.Base64.getDecoder.decode(
    "UklGRqgBAABXRUJQVlA4WAoAAAAQAAAADwAADwAAQUxQSMMAAAABJ6KokSTleucYX+ffKpmImP90" +
    "cY3gJjDi4Yt3MsjBEVyDKzDosHgVjnhRNcEIDAJPkqBqsFUZHNa2bUYvTsZ2PLbtd/uvKa4hov9J" +
    "0f2PkPe6REkkGzolkTTzFG0Ox9PlFiD0CxS+kOGDtxoynjaCfx0pfk52CPuInrOR75lzRugygtv4" +
    "zEiy90UwfSD9NheMITJWLaXWayO8XeOlWRXVnIGk2W6WdYoYMQ+KqixQNPowgt+6a1BSKbUtz+lU" +
    "FAoBAAAAVlA4IL4AAACQAgCdASoQABAAAwA0JbACdDBPCIUMfAMdCCz96AD+/XSg/QKbH4r3Q3yc" +
    "N/bSDK/T/zVo4u6nvclvG/SqxWOuup+XhN9BojvaW+Tv+MvxvX/hr/o/5Qns9LtmX/+qKdl/yWzn" +
    "huasl7nkxvSTI4xf3Y85VSB/lU/8Ofj/b9JrA+ifvIOYZm2x1RP/dhfmsf5diuSfR7+z+r/+HR3z" +
    "Eo/+XM/B+vkYw73Pzx+ROaAB/ZoBSzEs3rzZe6qsAAAA")

  private def vp8lHeader(bw: WebpSource.Bw, w: Int, h: Int): Unit = {
    bw.w(0x2f, 8)
    bw.w(w - 1, 14); bw.w(h - 1, 14)
    bw.w(0, 1) // alpha hint
    bw.w(0, 3) // version
  }

  private def singleCode(bw: WebpSource.Bw, sym: Int): Unit = {
    bw.w(1, 1); bw.w(0, 1); bw.w(1, 1); bw.w(sym, 8)
  }

  private def pairCode(bw: WebpSource.Bw, s0: Int, s1: Int): Unit = {
    bw.w(1, 1); bw.w(1, 1); bw.w(1, 1); bw.w(s0, 8); bw.w(s1, 8)
  }

  private def decode(bw: WebpSource.Bw): Seq[Int] = {
    val b = bw.bytes()
    val (_, _, _, px) = WebpSource.decodeVp8l(b, 0, b.length)
    px.toSeq
  }

  test("webp: the real libwebp container parses — VP8X flags, ALPH " +
      "pairing, lossy dims; lossy pixels are a named refusal") {
    val f = WebpSource.parseWebp(realWebp)
    assert(f.fmt === "extended")
    assert(f.canvasW === 16 && f.canvasH === 16)
    assert(f.hasAlpha && !f.hasAnim && !f.hasIcc && !f.hasExif && !f.hasXmp)
    assert(f.frames.size === 1)
    val fr = f.frames.head
    assert(fr.kind === "lossy" && fr.w === 16 && fr.h === 16)
    assert(fr.hasAlph, "the ALPH chunk must pair with the VP8 frame")
    // lossy pixel decode refuses by name (VP8L signature check)
    assert(WebpSource.decodeFrames(f).isEmpty)
    assert(intercept[IllegalArgumentException] {
      WebpSource.decodeVp8l(realWebp, fr.payloadOff, fr.payloadLen)
    }.getMessage.contains("signature"))
  }

  test("webp: fixture roundtrip — every lossless frame decodes to the " +
      "pixel formula, both transform parities") {
    (0L until 12L).foreach { id =>
      val f = WebpSource.parseWebp(WebpSource.webpOf(id))
      WebpSource.decodeFrames(f).foreach { case (i, w, h, px) =>
        var p = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val (r, g, b) = WebpSource.pixelOf(id, i, x, y)
            val want = 0xff000000 | (r << 16) | (g << 8) | b
            assert(px(p) === want, s"doc $id frame $i pixel ($x,$y)")
            p += 1; x += 1
          }
          y += 1
        }
      }
      // the lossless population matches the fixture plan
      val expect = (id % 6) match {
        case 0 | 2 | 4 => 1
        case 5 => 2
        case _ => 0
      }
      assert(f.frames.count(_.kind == "lossless") === expect)
    }
  }

  test("webp: hand-built vector — code-length-coded prefix code with " +
      "the max-symbol shortcut") {
    // prefix-code bits ride the stream MSB-of-code-first, so every
    // code below is written bit by bit (a multi-bit w() would reverse)
    val bw2 = new WebpSource.Bw
    vp8lHeader(bw2, 4, 1)
    bw2.w(0, 1); bw2.w(0, 1); bw2.w(0, 1) // no transforms/cache/meta
    // green: normal code, lens[10]=1 lens[20]=2 lens[30]=2
    bw2.w(0, 1) // not simple
    bw2.w(1, 4) // numCodeLengths = 5: order 17,18,0,1,2
    Seq(1, 0, 0, 2, 2).foreach(l => bw2.w(l, 3))
    bw2.w(1, 1) // use max-symbol
    bw2.w(1, 3) // lengthNBits = 4
    bw2.w(4, 4) // maxSymbol = 6 tokens
    def code(bw: WebpSource.Bw, bits: Int*): Unit =
      bits.foreach(b => bw.w(b, 1))
    // cl canonical: 17->0 (len1), 1->10, 2->11
    code(bw2, 0); bw2.w(7, 3)      // 17 x10 zeros
    code(bw2, 1, 0)                // literal len 1 (sym 10)
    code(bw2, 0); bw2.w(6, 3)      // 17 x9 zeros
    code(bw2, 1, 1)                // literal len 2 (sym 20)
    code(bw2, 0); bw2.w(6, 3)      // 17 x9 zeros
    code(bw2, 1, 1)                // literal len 2 (sym 30)
    singleCode(bw2, 5)             // red
    singleCode(bw2, 6)             // blue
    singleCode(bw2, 255)           // alpha
    singleCode(bw2, 0)             // distance
    // pixels: greens 10,20,10,30 -> codes 0 / 10 / 0 / 11
    code(bw2, 0)
    code(bw2, 1, 0)
    code(bw2, 0)
    code(bw2, 1, 1)
    assert(decode(bw2) ===
      Seq(0xff050a06, 0xff051406, 0xff050a06, 0xff051e06))
  }

  test("webp: hand-built vector — color cache literal + hit") {
    val bw = new WebpSource.Bw
    def code(bits: Int*): Unit = bits.foreach(b => bw.w(b, 1))
    vp8lHeader(bw, 2, 1)
    bw.w(0, 1)      // no transforms
    bw.w(1, 1); bw.w(1, 4) // color cache, 1 bit (size 2)
    bw.w(0, 1)      // no meta
    // green alphabet 282: lens[40]=1, lens[281]=1 (cache index 1)
    bw.w(0, 1)      // normal code
    bw.w(0, 4)      // numCodeLengths = 4: order 17,18,0,1
    Seq(0, 1, 0, 1).foreach(l => bw.w(l, 3)) // 18->len1, 1->len1
    bw.w(0, 1)      // no max-symbol: read to the end of the alphabet
    // cl canonical: 1->0, 18->1
    code(1); bw.w(29, 7)   // 18: 11+29 = 40 zeros
    code(0)                // literal len 1 (sym 40)
    code(1); bw.w(127, 7)  // 18: 138 zeros (41..178)
    code(1); bw.w(91, 7)   // 18: 102 zeros (179..280)
    code(0)                // literal len 1 (sym 281) -> alphabet done
    singleCode(bw, 2)      // red
    singleCode(bw, 7)      // blue
    singleCode(bw, 255)    // alpha
    singleCode(bw, 0)      // distance
    // pixel 0: literal green 40 (code 0) -> 0xff022807, hashes to
    // cache slot 1 ((0x1e35a7bd * 0xff022807) >>> 31 = 1, pinned);
    // pixel 1: cache symbol 281 (code 1) -> slot 1
    code(0)
    code(1)
    assert(decode(bw) === Seq(0xff022807, 0xff022807))
  }

  test("webp: hand-built vector — LZ77 with a direct distance and a " +
      "plane-coded distance") {
    def build(w: Int, h: Int, direct: Boolean): Seq[Int] = {
      val bw = new WebpSource.Bw
      def code(bits: Int*): Unit = bits.foreach(b => bw.w(b, 1))
      vp8lHeader(bw, w, h)
      bw.w(0, 1); bw.w(0, 1); bw.w(0, 1)
      // green: lens[50]=2, lens[60]=2, lens[257]=1 (length code 1 -> 2)
      bw.w(0, 1)
      bw.w(1, 4) // numCodeLengths = 5
      Seq(2, 2, 0, 2, 2).foreach(l => bw.w(l, 3)) // 17,18,1,2 all len2
      bw.w(1, 1); bw.w(1, 3); bw.w(5, 4) // maxSymbol = 7 tokens
      // cl canonical (len 2, by symbol): 1->00, 2->01, 17->10, 18->11
      code(1, 1); bw.w(39, 7)  // 18: 50 zeros (0..49)
      code(0, 1)               // literal len 2 (sym 50)
      code(1, 0); bw.w(6, 3)   // 17: 9 zeros (51..59)
      code(0, 1)               // literal len 2 (sym 60)
      code(1, 1); bw.w(127, 7) // 18: 138 zeros (61..198)
      code(1, 1); bw.w(47, 7)  // 18: 58 zeros (199..256)
      code(0, 0)               // literal len 1 (sym 257)
      singleCode(bw, 5)        // red
      singleCode(bw, 6)        // blue
      singleCode(bw, 255)      // alpha
      // distance: single symbol — 13 (direct, 5 extra bits) or 0
      singleCode(bw, if (direct) 13 else 0)
      // green canonical: 257->0, 50->10, 60->11
      code(1, 0)               // literal 50
      code(1, 1)               // literal 60
      code(0)                  // length sym 257 -> length 2, no extra
      if (direct) bw.w(25, 5)  // dist value 96+25+1 = 122 -> direct 2
      // plane arm: dist sym 0 -> value 1 -> (0,1) -> dy*w = 2 for w=2
      decode(bw)
    }
    val a = 0xff053206; val b = 0xff053c06
    assert(build(4, 1, direct = true) === Seq(a, b, a, b))
    // 2x2, plane code (0,1): row 2 copies row 1 — pins DistanceMap(0)
    assert(build(2, 2, direct = false) === Seq(a, b, a, b))
  }

  test("webp: hand-built vector — predictor transform, mode L") {
    val bw = new WebpSource.Bw
    def code(bits: Int*): Unit = bits.foreach(b => bw.w(b, 1))
    vp8lHeader(bw, 2, 2)
    bw.w(1, 1); bw.w(0, 2) // predictor transform
    bw.w(0, 3)             // sizeBits = 2 -> 1x1 mode image
    // mode subimage (1x1, entropy-coded): no cache; 5 codes; pixel
    bw.w(0, 1)             // no cache
    singleCode(bw, 1)      // green = 1 -> mode 1 (L)
    singleCode(bw, 0); singleCode(bw, 0) // red, blue
    singleCode(bw, 0)      // alpha
    singleCode(bw, 0)      // distance
    // (single-symbol codes: the mode pixel costs zero bits)
    bw.w(0, 1)             // no more transforms
    bw.w(0, 1); bw.w(0, 1) // no cache, no meta
    pairCode(bw, 1, 2)     // green residuals {1, 2}
    pairCode(bw, 1, 2)     // red
    pairCode(bw, 1, 2)     // blue
    singleCode(bw, 0)      // alpha residual 0
    singleCode(bw, 0)      // distance
    // residual pixels (g,r,b bits): (1,1,1) (1,1,1) (2,2,2) (2,2,2)
    code(0, 0, 0)
    code(0, 0, 0)
    code(1, 1, 1)
    code(1, 1, 1)
    // (0,0)+black=ff010101; (1,0)+L=ff020202; (0,1)+T=ff030303;
    // (1,1)+L(=out01)=ff050505
    assert(decode(bw) ===
      Seq(0xff010101, 0xff020202, 0xff030303, 0xff050505))
  }

  test("webp: hand-built vector — color transform (green-to-red delta, " +
      "signed at both ends)") {
    val bw = new WebpSource.Bw
    def code(bits: Int*): Unit = bits.foreach(b => bw.w(b, 1))
    vp8lHeader(bw, 2, 1)
    bw.w(1, 1); bw.w(1, 2) // color transform
    bw.w(0, 3)             // sizeBits = 2 -> 1x1 element image
    bw.w(0, 1)             // subimage: no cache
    singleCode(bw, 0)      // green (g2b = 0)
    singleCode(bw, 0)      // red (r2b = 0)
    singleCode(bw, 2)      // blue (g2r = 2)
    singleCode(bw, 0)      // alpha
    singleCode(bw, 0)      // distance
    bw.w(0, 1)             // no more transforms
    bw.w(0, 1); bw.w(0, 1)
    pairCode(bw, 64, 192)  // green {64, 192}
    singleCode(bw, 100)    // stored red
    singleCode(bw, 50)     // stored blue
    singleCode(bw, 255)    // alpha
    singleCode(bw, 0)      // distance
    code(0)                // pixel 0: g=64  -> r = 100 + (2*64>>5)  = 104
    code(1)                // pixel 1: g=192 -> r = 100 + (2*-64>>5) = 96
    assert(decode(bw) === Seq(0xff684032, 0xff60c032))
  }

  test("webp: hand-built vector — color indexing, unbundled 18-entry " +
      "delta-coded palette") {
    val bw = new WebpSource.Bw
    def code(bits: Int*): Unit = bits.foreach(b => bw.w(b, 1))
    vp8lHeader(bw, 2, 1)
    bw.w(1, 1); bw.w(3, 2) // color indexing
    bw.w(17, 8)            // palette size 18 (> 16: unbundled)
    // palette image (18x1): deltas p0=(a255,r0,g10,b5), rest (0,1,1,0)
    bw.w(0, 1)             // no cache
    pairCode(bw, 10, 1)    // green deltas
    pairCode(bw, 0, 1)     // red deltas
    pairCode(bw, 5, 0)     // blue deltas
    pairCode(bw, 255, 0)   // alpha deltas
    singleCode(bw, 0)      // distance
    code(0, 0, 0, 0)       // delta 0 (g,r,b,a = first of each pair)
    (1 until 18).foreach(_ => code(1, 1, 1, 1))
    bw.w(0, 1)             // no more transforms
    bw.w(0, 1); bw.w(0, 1)
    pairCode(bw, 0, 17)    // green = palette index
    singleCode(bw, 0); singleCode(bw, 0); singleCode(bw, 0)
    singleCode(bw, 0)
    code(0)                // index 0  -> (255, 0, 10, 5)
    code(1)                // index 17 -> (255, 17, 27, 5)
    assert(decode(bw) === Seq(0xff000a05, 0xff111b05))
  }

  test("webp: ALPH planes decode — raw, all three prediction filters, " +
      "VP8L-compressed, and the REAL libwebp alpha") {
    // fixture: id%6==3 carries a raw unfiltered plane the formula pins
    val id = 3L
    val f = WebpSource.parseWebp(WebpSource.webpOf(id))
    val fr = f.frames.head
    assert(fr.hasAlph && fr.alphOff > 0)
    val plane = WebpSource.decodeAlphaOf(f, 0).get
    val w = fr.w; val h = fr.h
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        assert(plane(y * w + x) === 255 - ((id + 3 * x + 5 * y) % 97).toInt,
          s"raw alpha at ($x,$y)")
      }
    }
    // prediction filters: residual-code a known 3x2 plane by hand and
    // assert each filter reconstructs it. Borders: (0,0) from 0, first
    // row from left, first column from top.
    val want = Array(10, 20, 30, 40, 50, 60)
    def residuals(filter: Int): Array[Int] = {
      val out = new Array[Int](6)
      (0 until 2).foreach { y =>
        (0 until 3).foreach { x =>
          val pos = y * 3 + x
          val pred =
            if (x == 0 && y == 0) 0
            else if (y == 0) want(pos - 1)
            else if (x == 0) want(pos - 3)
            else filter match {
              case 1 => want(pos - 1)
              case 2 => want(pos - 3)
              case _ => math.max(0, math.min(255,
                want(pos - 1) + want(pos - 3) - want(pos - 4)))
            }
          out(pos) = (want(pos) - pred) & 0xff
        }
      }
      out
    }
    Seq(1, 2, 3).foreach { filt =>
      val payload = Array((filt << 2).toByte) ++
        residuals(filt).map(_.toByte)
      assert(WebpSource.decodeAlpha(payload, 0, payload.length, 3, 2)
        .toSeq === want.toSeq, s"filter $filt")
    }
    // method 1: a headerless VP8L stream (alpha in the green channel),
    // 2x1 plane of {100, 200} via one 2-symbol code
    val bw = new WebpSource.Bw
    bw.w(1, 8) // ALPH header: compression 1, no filter
    bw.w(0, 1); bw.w(0, 1); bw.w(0, 1) // no transforms/cache/meta
    pairCode(bw, 100, 200) // green = alpha
    singleCode(bw, 0); singleCode(bw, 0); singleCode(bw, 0)
    singleCode(bw, 0)
    bw.w(0, 1); bw.w(1, 1) // pixels: 100 then 200
    val vb = bw.bytes()
    assert(WebpSource.decodeAlpha(vb, 0, vb.length, 2, 1).toSeq ===
      Seq(100, 200))
    // the REAL libwebp file's 195-byte ALPH (VP8L-compressed) decodes
    // through the full machinery to a 16x16 in-range plane
    val real = WebpSource.parseWebp(realWebp)
    val rp = WebpSource.decodeAlphaOf(real, 0).get
    assert(rp.length === 256)
    assert(rp.forall(v => v >= 0 && v <= 255))
    assert(rp.distinct.length > 1, "a logo alpha plane is not constant")
    // reserved compression method refuses by name
    assert(intercept[IllegalArgumentException] {
      WebpSource.decodeAlpha(Array[Byte](2, 0, 0), 0, 3, 1, 2)
    }.getMessage.contains("reserved"))
  }

  test("webp: hostile inputs fail by name, caps before allocation") {
    // bad VP8L signature
    assert(intercept[IllegalArgumentException] {
      WebpSource.decodeVp8l(Array[Byte](0x30, 0, 0, 0, 0), 0, 5)
    }.getMessage.contains("signature"))
    // decode budget: 16384x16384 = 256M px rejected BEFORE allocation
    val big = new WebpSource.Bw
    vp8lHeader(big, 16384, 16384)
    val bb = big.bytes()
    assert(intercept[IllegalArgumentException] {
      WebpSource.decodeVp8l(bb, 0, bb.length)
    }.getMessage.contains("decode budget"))
    // truncation mid-stream
    val bw = new WebpSource.Bw
    vp8lHeader(bw, 4, 4)
    val cut = bw.bytes()
    assert(intercept[IllegalArgumentException] {
      WebpSource.decodeVp8l(cut, 0, cut.length)
    }.getMessage.contains("truncated"))
    // bundled palette: a named refusal
    val bp = new WebpSource.Bw
    vp8lHeader(bp, 2, 1)
    bp.w(1, 1); bp.w(3, 2); bp.w(15, 8) // palette size 16
    val bpb = bp.bytes()
    assert(intercept[IllegalArgumentException] {
      WebpSource.decodeVp8l(bpb, 0, bpb.length)
    }.getMessage.contains("named refusal"))
    // incomplete prefix code (lens 2 and 3 leave slack)
    val ic = new WebpSource.Bw
    vp8lHeader(ic, 2, 1)
    ic.w(0, 1); ic.w(0, 1); ic.w(0, 1)
    ic.w(0, 1)  // normal green code
    ic.w(0, 4)  // numCodeLengths = 4: 17,18,0,1
    Seq(0, 0, 2, 3).foreach(l => ic.w(l, 3)) // sym0 len2, sym1 len3
    ic.w(1, 1); ic.w(0, 3); ic.w(0, 2) // maxSymbol = 2
    // cl canonical: 0->0 (len2? no: cl code over {0:len2, 1:len3}) —
    // tokens: two literals: 0 then 1
    // cl codes: sym0 len2 -> 00, sym1 len3 -> 010
    ic.w(0, 1); ic.w(0, 1)            // literal len 2 (sym 0... )
    val icb = ic.bytes()
    assert(intercept[IllegalArgumentException] {
      WebpSource.decodeVp8l(icb, 0, icb.length)
    }.getMessage.contains("prefix code"))
    // container: RIFF size lie
    val lie = WebpSource.webpOf(0L)
    lie(4) = (lie(4) + 64).toByte
    assert(intercept[IllegalArgumentException] {
      WebpSource.parseWebp(lie)
    }.getMessage.contains("RIFF advertises"))
    // container: chunk size past the file
    val ch = WebpSource.webpOf(0L)
    ch(16) = (ch(16) + 64).toByte
    assert(intercept[IllegalArgumentException] {
      WebpSource.parseWebp(ch)
    }.getMessage.toLowerCase.contains("advertises"))
  }

  test("webp: the 2D distance map matches the spec's published " +
      "120-entry table, all entries pinned (r20 ADVICE high)") {
    // RFC 9649 §5.2.2, transcribed verbatim. The r20 generator's
    // d^2 <= 74 cut diverged from index 96 on; the spec's window is
    // dx in [-7, 8], dy in [0, 7] (so (8,0) sits at index 96, (8,4)
    // and (6,7) with d^2 > 74 are present, (-8,*) and (0,8) are not).
    val want = Seq(
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
    assert(want.length === 120)
    assert(WebpSource.DistanceMap.toSeq === want)
    // the published table equals the spec's window rule, sorted by
    // (d^2, larger dy first, positive dx first, |dx|) — cross-check the
    // transcription against the rule so a typo in either is caught
    val ruled = (for {
      dy <- 0 to 7
      dx <- -7 to 8
      if dy > 0 || dx > 0
    } yield (dx, dy)).sortBy { case (dx, dy) =>
      (dx * dx + dy * dy, -dy, if (dx > 0) 0 else 1, math.abs(dx))
    }
    assert(ruled === want)
  }

  test("webp: hostile meta-group prefix-tree flood fails on the " +
      "allocation budget, by name (r20 ADVICE low)") {
    val bw = new WebpSource.Bw
    vp8lHeader(bw, 2, 2)
    bw.w(0, 1) // no transforms
    bw.w(0, 1) // no color cache
    bw.w(1, 1) // meta prefix codes present
    bw.w(0, 3) // metaBits = 2 -> 1x1 meta image
    // meta subimage (1x1, entropy-coded): no cache; 5 single-symbol
    // codes; index = (red << 8) | green = (31 << 8) | 255 = 8191 ->
    // numGroups = 8192
    bw.w(0, 1)
    singleCode(bw, 255); singleCode(bw, 31); singleCode(bw, 0)
    singleCode(bw, 0); singleCode(bw, 0)
    // the budget charges ACTUAL tree allocation (2*used ints, r22), so
    // the hostile shape is a GROUP FLOOD of full-alphabet codes: each
    // group's 5 complete codes (256 len-8 symbols x4, 32 len-5 distance
    // symbols) charge 4*512 + 64 = 2112 ints, so the 2x2 image's 8M-int
    // floor trips near group 3970 — in a ~500 KB stream declaring
    // 8192 groups, the tiny-dims/huge-group-count shape the budget
    // exists to refuse (a legit photo's budget scales with its pixels).
    // Wire form per code: cl-code over {len, 16} (1 bit each), the
    // max-symbol shortcut, one explicit `len`, then repeat-16 runs.
    def fullCode(len: Int, nSyms: Int, alphabet: Int): Unit = {
      // repeat plan first: the max-symbol shortcut counts CL TOKENS read
      // (libwebp semantics), so it must equal 1 + the repeat-run count
      var rem = nSyms - 1
      val takes = scala.collection.mutable.ArrayBuffer.empty[Int]
      while (rem > 0) {
        val take =
          if (rem >= 3 && rem <= 6) rem
          else if (rem == 7) 4
          else 6
        takes += take
        rem -= take
      }
      bw.w(0, 1) // code-length-coded (not simple)
      bw.w(8, 4) // numCl = 12: ClOrder positions cover cl symbols 16, len
      val order = Array(17, 18, 0, 1, 2, 3, 4, 5, 16,
        6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
      (0 until 12).foreach { i =>
        val s = order(i)
        bw.w(if (s == 16 || s == len) 1 else 0, 3)
      }
      if (nSyms < alphabet) {
        bw.w(1, 1)              // max-symbol shortcut: stop after the
        bw.w(3, 3)              // emitted tokens (nb = 2 + 2*3 = 8)
        bw.w(takes.size - 1, 8) // maxSymbol tokens = 2 + (1 + takes) - 2
      } else bw.w(0, 1)         // nSyms == alphabet: loop ends at sym cap
      // canonical CL code over {len, 16}: len < 16 -> len = "0", 16 = "1"
      bw.w(0, 1)                // first symbol: cl = len (sets prev)
      takes.foreach { take =>
        bw.w(1, 1)              // cl 16: repeat prev
        bw.w(take - 3, 2)       // 3 + extra
      }
    }
    // write enough groups to trip the floor (decode fails mid-stream,
    // well before the declared 8192nd group)
    (0 until 4200).foreach { _ =>
      fullCode(8, 256, 280) // green (shortcut stops the token loop)
      fullCode(8, 256, 256); fullCode(8, 256, 256) // red/blue
      fullCode(8, 256, 256)                        // alpha
      fullCode(5, 32, 40)   // distance
    }
    val b = bw.bytes()
    assert(intercept[IllegalArgumentException] {
      WebpSource.decodeVp8l(b, 0, b.length)
    }.getMessage.contains("budget"))
  }

  test("webp: the Spark tables run distributed over the fixture corpus") {
    import spark.implicits._
    val docs = (0L until 36L).toDF("doc_id")
    val meta = WebpSource.webpTable(spark, WebpSource.synthesizeWebp(spark, docs))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(meta.size === 36)
    (0L until 36L).foreach { id =>
      val r = meta(id)
      val m = (id % 6).toInt
      assert(r.getString(1) ===
        (if (m == 1) "lossy" else if (m == 0 || m == 2) "lossless"
         else "extended"), s"doc $id fmt")
      assert(r.getInt(2) === 8 + (id % 5).toInt * 4)
      assert(r.getBoolean(4) === (m == 3), s"doc $id alpha")
      assert(r.getBoolean(5) === (m == 5), s"doc $id anim")
      assert(r.getInt(6) === (if (m == 5) 2 else 1))
    }
    val px = WebpSource.webpPixelTable(
      spark, WebpSource.synthesizeWebp(spark, docs))
    // lossless frames only: m in {0,2,4} once, m=5 twice
    assert(px.count() === (0L until 36L).map(id => (id % 6) match {
      case 0 | 2 | 4 => 1L; case 5 => 2L; case _ => 0L
    }).sum)
  }
}
