package graft

import graft.sources.MkvSource

/** EBML/Matroska walker: VINT width edges, unknown-size and lacing
  * rejects, signed relative timestamps, forward-compat skip of unknown
  * elements, and fixture round-trip invariants.
  */
class MkvSpec extends GraftSparkSpec {

  private val EBML = 0x1A45DFA3L
  private val Segment = 0x18538067L
  private val Info = 0x1549A966L
  private val Tracks = 0x1654AE6BL
  private val TrackEntry = 0xAEL
  private val Cluster = 0x1F43B675L
  private val ClusterTs = 0xE7L
  private val SimpleBlock = 0xA3L

  private def header(doctype: String): Array[Byte] =
    MkvSource.el(EBML, MkvSource.elS(0x4282L, doctype))

  private def videoTrack(num: Int): Array[Byte] =
    MkvSource.el(TrackEntry,
      MkvSource.elU(0xD7L, num.toLong) ++ MkvSource.elU(0x83L, 1) ++
        MkvSource.elS(0x86L, "V_VP9") ++
        MkvSource.el(0xE0L, MkvSource.elU(0xB0L, 64) ++ MkvSource.elU(0xBAL, 48)))

  private def block(track: Int, rel: Int, key: Boolean, n: Int): Array[Byte] =
    MkvSource.el(SimpleBlock,
      Array((0x80 | track).toByte, ((rel >> 8) & 0xff).toByte,
        (rel & 0xff).toByte, (if (key) 0x80 else 0x00).toByte) ++
        Array.fill(n)(0x11.toByte))

  test("mkv: fixture round-trips; tracks selected by type; audio never pollutes video facts") {
    Seq(4L, 7L).foreach { id => // 4: webm + audio; 7: matroska video-only
      val f = MkvSource.parseMkv(MkvSource.mkvOf(id))
      val c = (id % 3 + 1).toInt; val b = (id % 4 + 2).toInt
      assert(f.docType === (if (id % 2 == 0) "webm" else "matroska"))
      assert(f.nClusters === c)
      val v = f.tracks.find(_.trackType == 1).get
      assert(v.codec === "V_VP9" && v.defaultDurNs === 40000000L)
      val vb = f.blocks.filter(_.track == v.number)
      assert(vb.size === c * b)
      assert(vb.map(_.tsAbs) === (0 until c).flatMap(i =>
        (0 until b).map(j => i * 1000L + j * 40L)))
      if (id % 2 == 0) {
        val a = f.tracks.find(_.trackType == 2).get
        assert(a.codec === "A_OPUS")
        assert(f.blocks.count(_.track == a.number) === c * 2)
      } else assert(f.tracks.size === 1)
    }
  }

  test("ebml: size VINTs cross 1/2/3-byte widths (frame >127 and >16383 bytes)") {
    // a 20 000-byte frame forces a 3-byte size on the SimpleBlock and a
    // 3-byte (or wider) size on the enclosing Cluster/Segment
    val bytes = header("matroska") ++ MkvSource.el(Segment,
      MkvSource.el(Tracks, videoTrack(1)) ++
        MkvSource.el(Cluster, MkvSource.elU(ClusterTs, 0L) ++
          block(1, 0, key = true, 200) ++ block(1, 40, key = false, 20000)))
    val f = MkvSource.parseMkv(bytes)
    assert(f.blocks.map(_.frameBytes) === Seq(200, 20000))
    // writer-side width check: 200+4 needs 2 bytes, 20000+4 needs 3
    assert(MkvSource.vintSize(204L).length === 2)
    assert(MkvSource.vintSize(20004L).length === 3)
    assert(MkvSource.vintSize(127L).length === 2) // 127 is the 1-byte all-ones
    assert(MkvSource.vintSize(126L).length === 1)
  }

  test("ebml: unknown-size Segment/Cluster parse (MediaRecorder form); other contexts reject") {
    // the same content in sized and unknown-size forms must yield the
    // same facts: unknown-size Cluster terminates at the next Cluster ID
    // (sibling), the last at segment end; unknown-size Segment at EOF
    val content = MkvSource.el(Tracks, videoTrack(1)) ++
      MkvSource.elUnknown(Cluster,
        MkvSource.elU(ClusterTs, 0L) ++ block(1, 0, key = true, 5)) ++
      MkvSource.elUnknown(Cluster,
        MkvSource.elU(ClusterTs, 1000L) ++ block(1, 40, key = false, 6))
    val f = MkvSource.parseMkv(header("webm") ++
      MkvSource.elUnknown(Segment, content))
    assert(f.nClusters === 2)
    assert(f.blocks.map(b => (b.tsAbs, b.keyframe, b.frameBytes)) ===
      Seq((0L, true, 5), (1040L, false, 6)))
    // nested: unknown-size Cluster under a SIZED Segment also terminates
    val g = MkvSource.parseMkv(header("webm") ++ MkvSource.el(Segment, content))
    assert(g.nClusters === 2 && g.blocks.size === 2)
    // a non-cluster-child segment-level ID (here Info) also closes an
    // unknown-size cluster
    val h = MkvSource.parseMkv(header("webm") ++ MkvSource.elUnknown(Segment,
      MkvSource.el(Tracks, videoTrack(1)) ++
        MkvSource.elUnknown(Cluster,
          MkvSource.elU(ClusterTs, 0L) ++ block(1, 0, key = true, 3)) ++
        MkvSource.el(Info, MkvSource.elU(0x2AD7B1L, 1000000L))))
    assert(h.nClusters === 1 && h.blocks.size === 1)
    // unknown-size is AMBIGUOUS anywhere else and rejects by name
    val bad = header("matroska") ++ MkvSource.el(Segment,
      MkvSource.idBytes(Info) ++ Array(0xff.toByte))
    val e = intercept[Exception] { MkvSource.parseMkv(bad) }
    assert(e.getMessage.contains("unknown-size"))
  }

  test("mkv: all three lacing modes unpack per-frame; malformed laces reject") {
    def file(cluster: Array[Byte]): Array[Byte] =
      header("matroska") ++ MkvSource.el(Segment,
        MkvSource.el(Tracks, videoTrack(1)) ++ MkvSource.el(Cluster, cluster))
    def parse(body: Array[Byte]) = MkvSource.parseMkv(file(
      MkvSource.elU(ClusterTs, 0L) ++ MkvSource.el(SimpleBlock, body)))
    // Xiph with a 255-run size byte: frame0 = 300 (255+45), frame1 = 10
    val xiph = parse(Array[Byte](0x81.toByte, 0, 0, 0x82.toByte, 1,
      255.toByte, 45) ++ Array.fill(310)(7.toByte))
    assert(xiph.blocks.map(_.frameBytes) === Seq(300, 10))
    assert(xiph.blocks.forall(_.keyframe)) // block flag applies to all laces
    // fixed-size: 3 equal frames
    val fixed = parse(Array[Byte](0x81.toByte, 0, 0, 0x84.toByte, 2) ++
      Array.fill(9)(7.toByte))
    assert(fixed.blocks.map(_.frameBytes) === Seq(3, 3, 3))
    // EBML: first size VINT 5, then signed delta -2 (0xBD = 61 - 63)
    val ebml = parse(Array[Byte](0x81.toByte, 0, 0, 0x86.toByte, 2,
      0x85.toByte, 0xBD.toByte) ++ Array.fill(12)(7.toByte))
    assert(ebml.blocks.map(_.frameBytes) === Seq(5, 3, 4))
    // malformed: fixed lacing not divisible; Xiph sizes overrun payload
    val e1 = intercept[IllegalArgumentException] {
      parse(Array[Byte](0x81.toByte, 0, 0, 0x84.toByte, 2) ++
        Array.fill(10)(7.toByte))
    }
    assert(e1.getMessage.contains("not divisible"))
    val e2 = intercept[IllegalArgumentException] {
      parse(Array[Byte](0x81.toByte, 0, 0, 0x82.toByte, 1, 50) ++
        Array.fill(20)(7.toByte))
    }
    assert(e2.getMessage.contains("overrun block payload"))
    val e3 = intercept[Exception] {
      MkvSource.parseMkv(file(block(1, 0, key = true, 4)))
    }
    assert(e3.getMessage.contains("before cluster Timestamp"))
  }

  test("mkv: BlockGroup/Block form parses; keyframe = absence of ReferenceBlock") {
    // the fixture ships j==1 as BlockGroup — id=5 makes cluster i=1's
    // group block a KEYFRAME ((5+1+1)%7==0), so both branches (no-ref =>
    // key, ref => non-key) are genuinely asserted
    val id = 5L
    val f = MkvSource.parseMkv(MkvSource.mkvOf(id))
    val v = f.tracks.find(_.trackType == 1).get
    val vb = f.blocks.filter(_.track == v.number)
    val c = (id % 3 + 1).toInt; val b = (id % 4 + 2).toInt
    assert(vb.size === c * b)
    val groupKeys = (0 until c).map { i =>
      val blk = vb(i * b + 1) // the j==1 BlockGroup block
      assert(blk.tsAbs === i * 1000L + 40L)
      assert(blk.keyframe === ((id + i + 1) % 7 == 0))
      blk.keyframe
    }
    assert(groupKeys.contains(true) && groupKeys.contains(false),
      "fixture must exercise BOTH BlockGroup keyframe branches")
    // malformed groups reject by name
    def file(cluster: Array[Byte]): Array[Byte] =
      header("matroska") ++ MkvSource.el(Segment,
        MkvSource.el(Tracks, videoTrack(1)) ++ MkvSource.el(Cluster, cluster))
    val e = intercept[Exception] {
      MkvSource.parseMkv(file(MkvSource.elU(ClusterTs, 0L) ++
        MkvSource.el(0xA0L, MkvSource.el(0xFBL, Array(0xD8.toByte)))))
    }
    assert(e.getMessage.contains("BlockGroup without Block"))
  }

  test("mkv: track number 127 coded as the single byte 0xFF is a valid VINT") {
    // the all-ones reservation applies to element SIZES only — a track
    // VINT 0xFF must not trip the unknown-size reject
    val blk = MkvSource.el(0xA3L, // SimpleBlock
      Array[Byte](0xff.toByte, 0, 0, 0x80.toByte) ++ Array.fill(4)(1.toByte))
    val track127 = MkvSource.el(TrackEntry,
      MkvSource.elU(0xD7L, 127L) ++ MkvSource.elU(0x83L, 1) ++
        MkvSource.elS(0x86L, "V_VP9") ++
        MkvSource.el(0xE0L, MkvSource.elU(0xB0L, 64) ++ MkvSource.elU(0xBAL, 48)))
    val bytes = header("matroska") ++ MkvSource.el(Segment,
      MkvSource.el(Tracks, track127) ++
        MkvSource.el(Cluster, MkvSource.elU(ClusterTs, 0L) ++ blk))
    val f = MkvSource.parseMkv(bytes)
    assert(f.blocks.map(_.track) === Seq(127L))
    assert(f.blocks.head.keyframe)
  }

  test("mkv: negative relative timestamps sign-extend (block before cluster ts)") {
    val bytes = header("matroska") ++ MkvSource.el(Segment,
      MkvSource.el(Tracks, videoTrack(1)) ++
        MkvSource.el(Cluster, MkvSource.elU(ClusterTs, 1000L) ++
          block(1, -40, key = true, 4) ++ block(1, 40, key = false, 4)))
    val f = MkvSource.parseMkv(bytes)
    assert(f.blocks.map(_.tsAbs) === Seq(960L, 1040L))
  }

  test("ebml: unknown elements are skipped by size (Void, custom ids)") {
    val void = MkvSource.el(0xECL, Array.fill(13)(0.toByte))
    val bytes = header("matroska") ++ MkvSource.el(Segment,
      void ++ MkvSource.el(Tracks, void ++ videoTrack(1) ++ void) ++
        MkvSource.el(Cluster, MkvSource.elU(ClusterTs, 0L) ++ void ++
          block(1, 0, key = true, 4)))
    val f = MkvSource.parseMkv(bytes)
    assert(f.tracks.size === 1 && f.blocks.size === 1)
  }

  test("mkv: file-path arm reads .webm files one task per file") {
    val dir = java.nio.file.Files.createTempDirectory("mkvfiles").toFile
    try {
      Seq(2L, 5L).foreach { id =>
        val ext = if (id % 2 == 0) "webm" else "mkv"
        java.nio.file.Files.write(new java.io.File(dir, s"v$id.$ext").toPath,
          MkvSource.mkvOf(id))
      }
      val rows = MkvSource.mkvFiles(spark, dir.getAbsolutePath + "/v*")
        .collect().sortBy(_.getString(0))
      assert(rows.length === 2)
      assert(rows.map(_.getString(1)).toSeq === Seq("webm", "matroska"))
      assert(rows.forall(_.getString(3) == "V_VP9"))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("ebml: truncation anywhere rejects loudly") {
    val whole = MkvSource.mkvOf(4L)
    Seq(whole.length - 3, whole.length / 2, 7).foreach { cut =>
      val e = intercept[Exception] {
        MkvSource.parseMkv(java.util.Arrays.copyOfRange(whole, 0, cut))
      }
      assert(e.getMessage.contains("ebml") || e.getMessage.contains("mkv"),
        s"cut=$cut got ${e.getMessage}")
    }
    // trailing garbage after the Segment rejects too
    val e = intercept[Exception] {
      MkvSource.parseMkv(whole ++ Array(0x00.toByte))
    }
    assert(e.getMessage.contains("ebml"))
  }
}
