package graft

import graft.sources.AvroContainer
import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}

/** OCF parser vs the official Avro library: the fixtures here are written
  * with library-default block flushing (multi-record blocks whose layout
  * we do NOT control), read back by both implementations, and compared
  * row-for-row — plus the loud-reject container-integrity cases.
  */
class AvroContainerSpec extends GraftSparkSpec {

  private val schema = new Schema.Parser().parse(
    """{"type":"record","name":"doc","fields":[
      |{"name":"id","type":"long"},{"name":"name","type":"string"}]}"""
      .stripMargin)

  private def writeFile(path: java.io.File, n: Int,
                        codec: Option[CodecFactory]): Unit = {
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    codec.foreach(w.setCodec)
    w.create(schema, path)
    (0 until n).foreach { i =>
      val rec = new GenericData.Record(schema)
      rec.put("id", i * 31L)
      rec.put("name", s"row$i")
      w.append(rec) // library decides block boundaries
    }
    w.close()
  }

  test("parser agrees with DataFileReader on library-blocked files, all four codecs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-avro").toFile
    for ((codec, label) <- Seq(None -> "null",
        Some(CodecFactory.deflateCodec(6)) -> "deflate",
        Some(CodecFactory.snappyCodec()) -> "snappy",
        Some(CodecFactory.zstandardCodec(3)) -> "zstandard")) {
      val f = new java.io.File(dir, s"$label.avro")
      writeFile(f, 500, codec)
      val ours = AvroContainer.parseOcf(
        java.nio.file.Files.readAllBytes(f.toPath))
      assert(ours.codec === label)
      assert(ours.nRows === 500L)
      assert(ours.blocks.nonEmpty)
      // official read: same ids/names our decoder summed
      val rd = new DataFileReader(f, new GenericDatumReader[GenericRecord]())
      var idSum = 0L; var nameChars = 0L; var n = 0
      while (rd.hasNext) {
        val r = rd.next()
        idSum += r.get("id").asInstanceOf[Long]
        nameChars += r.get("name").toString.getBytes("UTF-8").length
        n += 1
      }
      rd.close()
      assert(n === 500 && ours.idSum === idSum && ours.nameChars === nameChars,
        s"$label content")
    }
  }

  test("avroRows reads a glob of OCF files through the Spark path") {
    val dir = java.nio.file.Files.createTempDirectory("graft-avro2").toFile
    writeFile(new java.io.File(dir, "a.avro"), 300, None)
    writeFile(new java.io.File(dir, "b.avro"), 200,
      Some(CodecFactory.deflateCodec(4)))
    writeFile(new java.io.File(dir, "c.avro"), 100,
      Some(CodecFactory.snappyCodec()))
    val got = AvroContainer.avroRows(spark, s"$dir/*.avro")
      .collect().map(r => (r.getString(3), r.getLong(2))).sorted
    assert(got.toSeq ===
      Seq(("deflate", 200L), ("null", 300L), ("snappy", 100L)))
  }

  test("snappy block CRC damage rejects by name") {
    // one record per block so the CRC quad sits right before the sync
    val f = AvroContainer.parseOcf(AvroContainer.ocfOf(2L)) // snappy
    assert(f.codec === "snappy")
    val bytes = AvroContainer.ocfOf(2L).clone()
    // flip a byte in the LAST block's CRC suffix: 16 sync bytes end the
    // file, the 4 CRC bytes precede them
    val at = bytes.length - 16 - 2
    bytes(at) = (bytes(at) ^ 0x11).toByte
    val e = intercept[Exception] { AvroContainer.parseOcf(bytes) }
    assert(e.getMessage.contains("snappy block CRC") ||
      e.getMessage.contains("FAILED_TO_UNCOMPRESS"))
  }

  test("a corrupted block sync marker rejects loudly") {
    val bytes = AvroContainer.ocfOf(3L).clone() // null codec
    bytes(bytes.length - 1) = (bytes(bytes.length - 1) ^ 0x5a).toByte
    val e = intercept[IllegalArgumentException] {
      AvroContainer.parseOcf(bytes)
    }
    assert(e.getMessage.contains("sync marker"))
  }

  test("unsupported codec and truncation reject loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-avro3").toFile
    val f = new java.io.File(dir, "bzip2.avro")
    writeFile(f, 10, Some(CodecFactory.bzip2Codec()))
    val e1 = intercept[RuntimeException] {
      AvroContainer.parseOcf(java.nio.file.Files.readAllBytes(f.toPath))
    }
    assert(e1.getMessage.contains("unsupported codec"))
    val good = AvroContainer.ocfOf(5L)
    val e2 = intercept[IllegalArgumentException] {
      AvroContainer.parseOcf(good.take(good.length - 7))
    }
    assert(e2.getMessage.contains("avro:"))
  }

  test("per-record sync makes one block per record (the x98 block contract)") {
    val f = AvroContainer.parseOcf(AvroContainer.ocfOf(8L))
    assert(f.blocks.size === (8 % 5 + 2))
    assert(f.blocks.forall(_.nRows === 1L))
  }
}
