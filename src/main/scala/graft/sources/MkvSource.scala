package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Matroska / WebM (EBML) container walker — the second web-video
  * container family after the ISO-BMFF walker in
  * `operators/Multimodal.scala` (mp4/fmp4): WebM is what browser-captured
  * and royalty-free web video ships as, so a crawled corpus carries it in
  * volume. Same discipline as the mp4 walker: tracks are selected by
  * TYPE, never position; keyframes come from the PARSED SimpleBlock flag
  * bit (BlockGroup form: absence of a ReferenceBlock); per-frame
  * presentation times are cluster-absolute (cluster Timestamp + the
  * block's signed relative offset, in TimestampScale units); all three
  * LACING modes (Xiph / fixed / EBML) unpack into per-frame rows;
  * unknown-size Segment/Cluster (the live-streaming form MediaRecorder
  * WebM writes) terminate at the first sibling-or-higher element ID per
  * RFC 8794 §6.2; anything outside the understood grammar — including
  * unknown-size in any OTHER context, where termination is ambiguous —
  * rejects loudly by name.
  *
  * EBML wire grammar (RFC 8794): element IDs are VINTs stored WITH their
  * length marker (1–4 bytes); sizes are VINTs with the marker stripped
  * (1–8 bytes; all-value-bits-ones means "unknown size", rejected here);
  * integers are big-endian size-packed; floats are 4- or 8-byte IEEE 754.
  * Unknown elements are skipped by size — which is what makes EBML
  * forward-compatible and a sequential walk O(file).
  *
  * 100 TB shape: one task per file (the codec-blob discipline); the walk
  * is a single pass and the per-frame table streams out of it. The x102
  * gate checks container facts, x103 derives keyframe-to-keyframe
  * segments from the parsed frame table with a window over (doc, pts) —
  * parse map-side, one exchange for the segment aggregation.
  */
object MkvSource {

  // element IDs (stored with marker bits, as the spec writes them)
  private val EBML = 0x1A45DFA3L
  private val DocTypeId = 0x4282L
  private val Segment = 0x18538067L
  private val Info = 0x1549A966L
  private val TimestampScale = 0x2AD7B1L
  private val DurationId = 0x4489L
  private val Tracks = 0x1654AE6BL
  private val TrackEntry = 0xAEL
  private val TrackNumber = 0xD7L
  private val TrackType = 0x83L
  private val CodecID = 0x86L
  private val DefaultDuration = 0x23E383L
  private val VideoEl = 0xE0L
  private val PixelWidth = 0xB0L
  private val PixelHeight = 0xBAL
  private val AudioEl = 0xE1L
  private val SamplingFrequency = 0xB5L
  private val Channels = 0x9FL
  private val Cluster = 0x1F43B675L
  private val ClusterTimestamp = 0xE7L
  private val SimpleBlock = 0xA3L
  private val BlockGroup = 0xA0L
  private val BlockEl = 0xA1L
  private val ReferenceBlock = 0xFBL

  private[graft] case class MkvTrack(number: Long, trackType: Int,
      codec: String, width: Int, height: Int, channels: Int,
      defaultDurNs: Long)
  private[graft] case class MkvBlock(track: Long, tsAbs: Long,
      keyframe: Boolean, frameBytes: Int)
  private[graft] case class MkvFile(docType: String, timestampScale: Long,
      durationTs: Double, tracks: Seq[MkvTrack], nClusters: Int,
      blocks: Seq[MkvBlock])

  private final class Rd(val bytes: Array[Byte], var pos: Int, val end: Int) {
    def u8(): Int = {
      require(pos < end, "ebml: truncated")
      val b = bytes(pos) & 0xff; pos += 1; b
    }
    /** Element ID: VINT kept with its marker (1–4 bytes). */
    def readId(): Long = {
      val b0 = u8()
      val len = if ((b0 & 0x80) != 0) 1 else if ((b0 & 0x40) != 0) 2
        else if ((b0 & 0x20) != 0) 3 else if ((b0 & 0x10) != 0) 4
        else sys.error("ebml: bad element ID leading byte")
      var v = b0.toLong
      (1 until len).foreach(_ => v = (v << 8) | u8())
      v
    }
    /** Plain data VINT, marker stripped — no all-ones reservation (a
      * block's track number 127 is legitimately coded 0xFF). Returns
      * (value, encodedLength); EBML-lacing deltas need the length for
      * their signed bias.
      */
    def readVintLen(): (Long, Int) = {
      val b0 = u8()
      var len = 1
      var mask = 0x80
      while (len <= 8 && (b0 & mask) == 0) { len += 1; mask >>= 1 }
      require(len <= 8, "ebml: bad size leading byte")
      var v = (b0 & (mask - 1)).toLong
      (1 until len).foreach(_ => v = (v << 8) | u8())
      (v, len)
    }
    def readVint(): Long = readVintLen()._1
    /** ELEMENT SIZE VINT, unknown-size aware: all-value-bits-ones means
      * "unknown size" (the live-streaming form MediaRecorder WebM
      * writes) and returns -1 — the reservation applies only to element
      * sizes, not to data VINTs like block track numbers.
      */
    def readSizeOrUnknown(): Long = {
      val p0 = pos
      val v = readVint()
      val len = pos - p0
      if (v == (1L << (7 * len)) - 1) -1L else v
    }
    /** ELEMENT SIZE VINT where unknown-size is ambiguous and rejects:
      * only Segment and Cluster (master elements with an RFC 8794 §6.2
      * sibling-or-higher termination rule) may be unknown-size; a leaf
      * or other master with no size cannot be bounded.
      */
    def readSize(): Long = {
      val v = readSizeOrUnknown()
      require(v >= 0,
        "ebml: unknown-size element unsupported here (only Segment/Cluster)")
      v
    }
    /** Element ID at the cursor without consuming it. */
    def peekId(): Long = { val p = pos; val id = readId(); pos = p; id }
    def uint(n: Int): Long = {
      // an element declaring an integer wider than 8 bytes would silently
      // wrap the Long — reject by name like every other malformed shape
      require(n <= 8, s"ebml: integer wider than 8 bytes ($n)")
      var v = 0L
      (0 until n).foreach(_ => v = (v << 8) | u8())
      v
    }
    def float(n: Int): Double = n match {
      case 4 => java.lang.Float.intBitsToFloat(uint(4).toInt).toDouble
      case 8 => java.lang.Double.longBitsToDouble(uint(8))
      case _ => sys.error(s"ebml: bad float size $n")
    }
    def str(n: Int): String = {
      require(pos + n <= end, "ebml: string overruns")
      val s = new String(bytes, pos, n, "UTF-8"); pos += n; s
    }
    def skip(n: Long): Unit = {
      require(n >= 0 && pos + n <= end, "ebml: element overruns parent")
      pos += n.toInt
    }
    def child(n: Long): Rd = {
      require(n >= 0 && pos + n <= end, "ebml: element overruns parent")
      val r = new Rd(bytes, pos, pos + n.toInt); pos += n.toInt; r
    }
  }

  /** (track, absolute ts, per-frame byte sizes, flags) of one
    * (Simple)Block body; consumes the reader. All three LACING modes
    * parse (real WebM audio — Vorbis especially — ships Xiph-laced):
    * Xiph = 255-run size bytes for all but the last frame, fixed =
    * equal split, EBML = first size as a VINT then signed-VINT deltas
    * (bias 2^(7·len−1)−1). Laced frames share the block timestamp; the
    * last frame's size is the remainder and must be non-negative.
    */
  private def blockFields(b: Rd, clusterTs: Long): (Long, Long, Seq[Int], Int) = {
    val track = b.readVint()
    val rel = { val v = b.uint(2); (v ^ 0x8000L) - 0x8000L } // sign-extend s16
    val flags = b.u8()
    val sizes: Seq[Int] = (flags & 0x06) match {
      case 0x00 => Seq(b.end - b.pos)
      case lacing =>
        val nFrames = b.u8() + 1
        val head: Seq[Int] = lacing match {
          case 0x02 => // Xiph
            (0 until nFrames - 1).map { _ =>
              var s = 0; var v = 255
              while (v == 255) { v = b.u8(); s += v }
              s
            }
          case 0x04 => // fixed-size: no size table
            val rem = b.end - b.pos
            require(nFrames > 0 && rem % nFrames == 0,
              s"mkv: fixed lacing $rem bytes not divisible into $nFrames")
            Seq.fill(nFrames - 1)(rem / nFrames)
          case _ => // 0x06 EBML
            var cur = 0L
            (0 until nFrames - 1).map { k =>
              val (v, len) = b.readVintLen()
              cur = if (k == 0) v
                else cur + (v - ((1L << (7 * len - 1)) - 1)) // signed delta
              require(cur >= 0, "mkv: EBML lace size negative")
              cur.toInt
            }
        }
        val last = (b.end - b.pos) - head.sum
        require(last >= 0, "mkv: lace sizes overrun block payload")
        head :+ last
    }
    b.pos = b.end
    (track, clusterTs + rel, sizes, flags)
  }

  // IDs legal at segment level — what an unknown-size Cluster terminates
  // at, per RFC 8794 §6.2 (first sibling-or-higher element ID)
  private val SeekHead = 0x114D9B74L
  private val Cues = 0x1C53BB6BL
  private val Chapters = 0x1043A770L
  private val Tags = 0x1254C367L
  private val Attachments = 0x1941A469L
  private def isSegmentLevel(id: Long): Boolean =
    id == Cluster || id == Info || id == Tracks || id == SeekHead ||
      id == Cues || id == Chapters || id == Tags || id == Attachments

  /** Leaf-payload bound checked BEFORE allocation (the decode-bound
    * discipline): a hostile element size cannot force a giant buffer.
    * Real leaves (Info, a TrackEntry, one laced block) are KB-to-MB.
    */
  private val MaxLeaf = 1 << 28

  /** Feed-backed EBML cursor — the streaming sibling of [[Rd]]: same
    * VINT grammar, but the walk consumes a bounded [[ByteFeed]] window
    * instead of an in-memory array, with `end` the ABSOLUTE stream
    * offset of the current master element's bound (Long.MaxValue =
    * unknown-size / EOF-terminated). Master elements nest as further
    * [[ERd]]s over the SAME feed (the walk is strictly sequential);
    * leaf payloads read into bounded arrays and reuse the [[Rd]]
    * sub-parsers — so the only O(element) allocation is one leaf, never
    * a cluster or the file.
    */
  private final class ERd(feed: ByteFeed, val end: Long) {
    def pos: Long = feed.consumedBytes
    def atEnd: Boolean =
      if (end != Long.MaxValue) pos >= end else feed.atEof
    private def chk(n: Long): Unit =
      require(n >= 0 && pos + n <= end, "ebml: element overruns parent")
    def u8(): Int = { chk(1); feed.u8("ebml: truncated") }
    def readId(): Long = {
      val b0 = u8()
      val len = if ((b0 & 0x80) != 0) 1 else if ((b0 & 0x40) != 0) 2
        else if ((b0 & 0x20) != 0) 3 else if ((b0 & 0x10) != 0) 4
        else sys.error("ebml: bad element ID leading byte")
      var v = b0.toLong
      (1 until len).foreach(_ => v = (v << 8) | u8())
      v
    }
    def readVintLen(): (Long, Int) = {
      val b0 = u8()
      var len = 1
      var mask = 0x80
      while (len <= 8 && (b0 & mask) == 0) { len += 1; mask >>= 1 }
      require(len <= 8, "ebml: bad size leading byte")
      var v = (b0 & (mask - 1)).toLong
      (1 until len).foreach(_ => v = (v << 8) | u8())
      (v, len)
    }
    def readSizeOrUnknown(): Long = {
      val (v, len) = readVintLen()
      if (v == (1L << (7 * len)) - 1) -1L else v
    }
    def readSize(): Long = {
      val v = readSizeOrUnknown()
      require(v >= 0,
        "ebml: unknown-size element unsupported here (only Segment/Cluster)")
      v
    }
    /** Element ID at the cursor without consuming it (≤4-byte window
      * lookahead) — the §6.2 sibling-or-higher termination probe.
      */
    def peekId(): Long = {
      require(feed.ensureN(1), "ebml: truncated")
      val b0 = feed.peek(0)
      val len = if ((b0 & 0x80) != 0) 1 else if ((b0 & 0x40) != 0) 2
        else if ((b0 & 0x20) != 0) 3 else if ((b0 & 0x10) != 0) 4
        else sys.error("ebml: bad element ID leading byte")
      require(feed.ensureN(len), "ebml: truncated")
      var v = 0L
      (0 until len).foreach(i => v = (v << 8) | feed.peek(i))
      v
    }
    /** Leaf payload into a fresh array, size-bounded before allocation. */
    def leaf(n: Long): Rd = {
      require(n <= MaxLeaf, "ebml: element exceeds 256 MiB leaf bound")
      chk(n)
      val a = feed.bytes(n.toInt, "ebml: truncated")
      new Rd(a, 0, a.length)
    }
    def skip(n: Long): Unit = { chk(n); feed.skip(n, "ebml: truncated") }
    def child(n: Long): ERd = { chk(n); new ERd(feed, pos + n) }
  }

  /** Array convenience over [[parseMkvStream]] — gate/spec call shape. */
  private[graft] def parseMkv(bytes: Array[Byte]): MkvFile =
    parseMkvStream(ByteFeed.wrap(bytes))

  /** Streaming EBML walk — O(largest leaf element) memory, never the
    * file or a cluster: master elements (Segment, sized/unknown-size
    * Clusters) are walked in place off the feed, leaf payloads (Info,
    * Tracks, one (Simple)Block) drop into bounded arrays for the [[Rd]]
    * sub-parsers. The r16 verdict flagged the whole-file `pds.toArray()`
    * read here: real Matroska media is multi-GB, and 32 concurrent
    * whole-file tasks are the OOM shape the WARC/tar/zip trio escaped;
    * `tools/MkvScale --single` proves the bound at a >1 GB file under a
    * pressure-bound heap.
    */
  private[graft] def parseMkvStream(feed: ByteFeed): MkvFile = {
    val r = new ERd(feed, Long.MaxValue)
    require(r.readId() == EBML, "ebml: missing EBML header")
    val hdr = r.leaf(r.readSize())
    var docType = "matroska"
    while (hdr.pos < hdr.end) {
      val id = hdr.readId(); val sz = hdr.readSize()
      if (id == DocTypeId) docType = hdr.str(sz.toInt)
      else hdr.skip(sz)
    }
    require(!feed.atEof && r.readId() == Segment, "ebml: missing Segment")
    // MediaRecorder WebM writes Segment (and Clusters) with unknown size;
    // an unknown-size Segment runs to the next sibling Segment ID or EOF
    val seg = r.readSizeOrUnknown() match {
      case sz if sz >= 0 => r.child(sz)
      case _ => new ERd(feed, Long.MaxValue)
    }
    var tsScale = 1000000L // spec default: 1 ms
    var duration = 0.0
    val tracks = scala.collection.mutable.ArrayBuffer[MkvTrack]()
    val blocks = scala.collection.mutable.ArrayBuffer[MkvBlock]()
    var nClusters = 0
    while (!seg.atEnd && seg.peekId() != Segment) {
      val id = seg.readId()
      val sz = if (id == Cluster) seg.readSizeOrUnknown() else seg.readSize()
      id match {
        case Info =>
          val in = seg.leaf(sz)
          while (in.pos < in.end) {
            val i2 = in.readId(); val s2 = in.readSize()
            i2 match {
              case TimestampScale => tsScale = in.uint(s2.toInt)
              case DurationId => duration = in.float(s2.toInt)
              case _ => in.skip(s2)
            }
          }
        case Tracks =>
          val tr = seg.leaf(sz)
          while (tr.pos < tr.end) {
            val i2 = tr.readId(); val s2 = tr.readSize()
            if (i2 == TrackEntry) {
              val te = tr.child(s2)
              var num = -1L; var typ = -1; var codec = ""
              var w = 0; var h = 0; var ch = 0; var dd = 0L
              while (te.pos < te.end) {
                val i3 = te.readId(); val s3 = te.readSize()
                i3 match {
                  case TrackNumber => num = te.uint(s3.toInt)
                  case TrackType => typ = te.uint(s3.toInt).toInt
                  case CodecID => codec = te.str(s3.toInt)
                  case DefaultDuration => dd = te.uint(s3.toInt)
                  case VideoEl =>
                    val v = te.child(s3)
                    while (v.pos < v.end) {
                      val i4 = v.readId(); val s4 = v.readSize()
                      i4 match {
                        case PixelWidth => w = v.uint(s4.toInt).toInt
                        case PixelHeight => h = v.uint(s4.toInt).toInt
                        case _ => v.skip(s4)
                      }
                    }
                  case AudioEl =>
                    val a = te.child(s3)
                    while (a.pos < a.end) {
                      val i4 = a.readId(); val s4 = a.readSize()
                      if (i4 == Channels) ch = a.uint(s4.toInt).toInt
                      else a.skip(s4)
                    }
                  case _ => te.skip(s3)
                }
              }
              require(num > 0 && typ > 0, "mkv: TrackEntry missing number/type")
              tracks += MkvTrack(num, typ, codec, w, h, ch, dd)
            } else tr.skip(s2)
          }
        case Cluster =>
          nClusters += 1
          var clusterTs = 0L
          var sawTs = false
          def clusterChild(cl: ERd, i2: Long, s2: Long): Unit = i2 match {
            case ClusterTimestamp =>
              val t = cl.leaf(s2)
              clusterTs = t.uint(s2.toInt); sawTs = true
            case SimpleBlock =>
              require(sawTs, "mkv: SimpleBlock before cluster Timestamp")
              val sb = cl.leaf(s2)
              val (track, ts, sizes, flags) = blockFields(sb, clusterTs)
              sizes.foreach(nb =>
                blocks += MkvBlock(track, ts, (flags & 0x80) != 0, nb))
            case BlockGroup =>
              // the Block form: no keyframe FLAG — a block is a
              // keyframe iff its group carries no ReferenceBlock
              require(sawTs, "mkv: BlockGroup before cluster Timestamp")
              val bg = cl.leaf(s2)
              var blk: Option[(Long, Long, Seq[Int])] = None
              var hasRef = false
              while (bg.pos < bg.end) {
                val i3 = bg.readId(); val s3 = bg.readSize()
                i3 match {
                  case BlockEl =>
                    require(blk.isEmpty, "mkv: BlockGroup with two Blocks")
                    val b = bg.child(s3)
                    val (track, ts, sizes, _) = blockFields(b, clusterTs)
                    blk = Some((track, ts, sizes))
                  case ReferenceBlock => bg.skip(s3); hasRef = true
                  case _ => bg.skip(s3) // BlockDuration etc.
                }
              }
              val (track, ts, sizes) = blk.getOrElse(
                sys.error("mkv: BlockGroup without Block"))
              sizes.foreach(nb =>
                blocks += MkvBlock(track, ts, keyframe = !hasRef, nb))
            case _ => cl.skip(s2)
          }
          if (sz >= 0) {
            val cl = seg.child(sz)
            while (!cl.atEnd) clusterChild(cl, cl.readId(), cl.readSize())
          } else {
            // unknown-size Cluster (MediaRecorder form): children parse
            // in place until the first segment-level ID — the RFC 8794
            // §6.2 sibling-or-higher termination — or parent end; child
            // elements still carry sizes, so unknown ones skip normally
            var open = true
            while (open && !seg.atEnd) {
              val nid = seg.peekId()
              if (isSegmentLevel(nid) || nid == Segment) open = false
              else clusterChild(seg, seg.readId(), seg.readSize())
            }
          }
        case _ => seg.skip(sz)
      }
    }
    require(seg.atEnd && feed.atEof, "ebml: bytes after Segment")
    MkvFile(docType, tsScale, duration, tracks.toSeq, nClusters, blocks.toSeq)
  }

  // ------------------------------------------------------------- writer

  private[graft] def vintSize(n: Long): Array[Byte] = {
    var w = 1
    while (w < 8 && n >= (1L << (7 * w)) - 1) w += 1
    require(n < (1L << (7 * w)) - 1, "ebml: size too large")
    val v = n | (1L << (7 * w))
    Array.tabulate(w)(i => ((v >> (8 * (w - 1 - i))) & 0xff).toByte)
  }
  private[graft] def idBytes(id: Long): Array[Byte] = {
    val w = if (id <= 0xffL) 1 else if (id <= 0xffffL) 2
      else if (id <= 0xffffffL) 3 else 4
    Array.tabulate(w)(i => ((id >> (8 * (w - 1 - i))) & 0xff).toByte)
  }
  private[graft] def el(id: Long, payload: Array[Byte]): Array[Byte] =
    idBytes(id) ++ vintSize(payload.length.toLong) ++ payload
  /** Element in the UNKNOWN-SIZE form (size VINT 0xFF) — what
    * MediaRecorder writes for Segment and Cluster while recording.
    */
  private[graft] def elUnknown(id: Long, payload: Array[Byte]): Array[Byte] =
    idBytes(id) ++ Array(0xff.toByte) ++ payload
  private[graft] def uintBytes(v: Long): Array[Byte] = {
    var w = 1
    while (w < 8 && v >= (1L << (8 * w))) w += 1
    Array.tabulate(w)(i => ((v >> (8 * (w - 1 - i))) & 0xff).toByte)
  }
  private[graft] def elU(id: Long, v: Long): Array[Byte] = el(id, uintBytes(v))
  private[graft] def elF(id: Long, v: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(v)
    el(id, Array.tabulate(8)(i => ((bits >> (8 * (7 - i))) & 0xff).toByte))
  }
  private[graft] def elS(id: Long, s: String): Array[Byte] = el(id, s.getBytes("UTF-8"))

  // Fixture arithmetic (the DuckDB oracle re-derives everything):
  //   doctype webm on even doc_ids, matroska on odd; video track always
  //   (number 1, V_VP9, w=320+(id%5)*16, h=240+(id%3)*16, DefaultDuration
  //   40ms); audio track on even ids (number 2, A_OPUS, ch=1+id%3);
  //   c=id%3+1 clusters at ts i*1000; per cluster b=id%4+2 video blocks
  //   (rel ts j*40, keyframe iff j==0 or (id+i+j)%7==0, frame bytes
  //   (id+j)%17+1) and, when audio exists, 2 audio blocks (rel ts j*20,
  //   always key per the opus convention, 3 bytes); Duration = c*1000.
  private[graft] def mkvOf(id: Long): Array[Byte] = {
    val webm = id % 2 == 0
    val hdr = el(EBML,
      elU(0x4286L, 1) ++ elU(0x42F7L, 1) ++ elU(0x42F2L, 4) ++
        elU(0x42F3L, 8) ++ elS(DocTypeId, if (webm) "webm" else "matroska") ++
        elU(0x4287L, 4) ++ elU(0x4285L, 2))
    val c = (id % 3 + 1).toInt
    val b = (id % 4 + 2).toInt
    val info = el(Info,
      elU(TimestampScale, 1000000L) ++ elF(DurationId, c * 1000.0))
    val video = el(TrackEntry,
      elU(TrackNumber, 1) ++ elU(TrackType, 1) ++ elS(CodecID, "V_VP9") ++
        elU(DefaultDuration, 40000000L) ++
        el(VideoEl, elU(PixelWidth, 320 + (id % 5) * 16) ++
          elU(PixelHeight, 240 + (id % 3) * 16)))
    val audio = if (!webm) Array.emptyByteArray
      else el(TrackEntry,
        elU(TrackNumber, 2) ++ elU(TrackType, 2) ++ elS(CodecID, "A_OPUS") ++
          el(AudioEl,
            elF(SamplingFrequency, 48000.0) ++ elU(Channels, 1 + id % 3)))
    val tracks = el(Tracks, video ++ audio)
    def blockBody(track: Int, rel: Int, flags: Int, n: Int, fill: Int): Array[Byte] =
      Array((0x80 | track).toByte, ((rel >> 8) & 0xff).toByte,
        (rel & 0xff).toByte, flags.toByte) ++ Array.fill(n)(fill.toByte)
    def block(track: Int, rel: Int, key: Boolean, n: Int, fill: Int): Array[Byte] =
      el(SimpleBlock, blockBody(track, rel, if (key) 0x80 else 0x00, n, fill))
    // the BlockGroup form: keyframe-ness is the ABSENCE of a
    // ReferenceBlock (whose value is the signed relative ts of the
    // referenced frame, -40 = the previous one)
    def group(track: Int, rel: Int, key: Boolean, n: Int, fill: Int): Array[Byte] =
      el(BlockGroup,
        el(BlockEl, blockBody(track, rel, 0x00, n, fill)) ++
          (if (key) Array.emptyByteArray
           else el(ReferenceBlock, Array(0xD8.toByte))))
    val clusters = (0 until c).flatMap { i =>
      val vb = (0 until b).flatMap { j =>
        // j==1 ships as BlockGroup/Block (the form B-frame video and
        // subtitles use), the rest as SimpleBlock — same facts, so the
        // oracles are unchanged and both forms are gate-exercised
        val form = if (j == 1) group _ else block _
        form(1, j * 40, j == 0 || (id + i + j) % 7 == 0,
          ((id + j) % 17 + 1).toInt, ((id * 31 + j) % 256).toInt)
      }
      // audio ships as ONE Xiph-laced SimpleBlock carrying both 3-byte
      // packets (flags 0x80|0x02; lace header: nFrames-1=1, size0=3) —
      // the layout real WebM audio uses; the parser still yields two
      // frame rows, so the x102 facts are unchanged
      val ab = if (!webm) Seq.empty[Byte]
        else MkvSource.el(SimpleBlock,
          Array((0x80 | 2).toByte, 0.toByte, 0.toByte, 0x82.toByte,
            1.toByte, 3.toByte) ++ Array.fill(6)(0x55.toByte)).toSeq
      // doc_id%5==0 ships the MediaRecorder shape: unknown-size clusters
      // (terminated at the next Cluster ID or segment end) under an
      // unknown-size Segment (terminated at EOF) — same facts, so the
      // x102/x103 oracles are unchanged and the §6.2 rule is gate-checked
      val form = if (id % 5 == 0) elUnknown _ else el _
      form(Cluster, elU(ClusterTimestamp, i * 1000L) ++ vb.toArray ++ ab.toArray)
    }.toArray
    val segForm = if (id % 5 == 0) elUnknown _ else el _
    hdr ++ segForm(Segment, info ++ tracks ++ clusters)
  }

  def synthesizeMkv(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .map(id => graft.operators.Multimodal.ImageRow(id, mkvOf(id)))
      .toDF()
  }

  /** x102 gate: container facts per file — track facts selected by TYPE. */
  def mkvTable(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("content")).as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val f = parseMkv(bytes)
        val v = f.tracks.find(_.trackType == 1)
          .getOrElse(sys.error(s"mkv: no video track in doc $id"))
        val a = f.tracks.find(_.trackType == 2)
        val vb = f.blocks.filter(_.track == v.number)
        val ab = a.map(t => f.blocks.filter(_.track == t.number))
          .getOrElse(Seq.empty)
        (id, f.docType, f.tracks.size, v.codec, v.width, v.height,
          a.map(_.channels).getOrElse(0), f.nClusters, vb.size, ab.size,
          vb.count(_.keyframe),
          (f.durationTs * f.timestampScale / 1000000L).toLong,
          vb.map(_.tsAbs).sum, vb.map(_.frameBytes.toLong).sum)
      }
      .toDF("doc_id", "doctype", "n_tracks", "v_codec", "width", "height",
        "audio_ch", "n_clusters", "n_vblocks", "n_ablocks", "n_keyframes",
        "dur_ms", "ts_sum", "frame_bytes")
  }

  /** File-path arm: walk `.mkv`/`.webm` files under a glob — one task
    * per file, streaming `pds.open()` through [[parseMkvStream]]
    * (O(largest leaf) memory, never `pds.toArray()` — multi-GB media ×
    * 32 concurrent tasks is the OOM shape the WARC/tar/zip trio fixed).
    */
  def mkvFiles(spark: SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(glob)
      .map { case (path, pds) =>
        val in = pds.open()
        val f = try parseMkvStream(new ByteFeed(in)) finally in.close()
        val v = f.tracks.find(_.trackType == 1)
        (path, f.docType, f.tracks.size, v.map(_.codec).getOrElse(""),
          v.map(_.width).getOrElse(0), v.map(_.height).getOrElse(0),
          f.nClusters, f.blocks.size,
          v.map(t => f.blocks.count(b => b.track == t.number && b.keyframe))
            .getOrElse(0))
      }
      .toDF("file", "doctype", "n_tracks", "v_codec", "width", "height",
        "n_clusters", "n_blocks", "n_keyframes")
  }

  /** x103 gate: keyframe-to-keyframe segments of the VIDEO track — the
    * mkv sibling of x86/x89. Parse is map-side; the running keyframe
    * count is one window over (doc, pts); segment rollup is one exchange.
    * The last frame's extent comes from the track's PARSED
    * DefaultDuration, not a fixture constant.
    */
  def mkvSegments(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val frames = media.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val f = parseMkv(bytes)
        val v = f.tracks.find(_.trackType == 1)
          .getOrElse(sys.error(s"mkv: no video track in doc $id"))
        val durMs = v.defaultDurNs / 1000000L
        f.blocks.filter(_.track == v.number)
          .map(bk => (id, bk.tsAbs, if (bk.keyframe) 1 else 0, durMs))
      }
      .toDF("doc_id", "ts", "is_key", "frame_ms")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("ts")
    frames
      .withColumn("seg", sum(col("is_key")).over(w))
      .groupBy(col("doc_id"), col("seg"))
      .agg(min("ts").as("start_ms"), count(lit(1)).as("n_frames"),
        (max("ts") + max("frame_ms") - min("ts")).as("dur_ms"))
      .orderBy("doc_id", "seg")
  }
}
