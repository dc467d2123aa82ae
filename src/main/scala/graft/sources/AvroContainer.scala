package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hand-rolled Avro OBJECT CONTAINER FILE (OCF) parser — the third leg of
  * the data-lake container family (parquet footers in [[ParquetFooter]],
  * zstd blobs in [[Readers]]).
  *
  * The container grammar per the Avro 1.12 spec: magic `Obj\x01`, a
  * file-metadata map (zigzag-varint-counted string→bytes entries;
  * `avro.schema` JSON + `avro.codec`), a 16-byte sync marker, then data
  * blocks of (row count, byte length, payload, sync) where EVERY block's
  * trailing sync must equal the header's — that equality is the
  * container's integrity check and this parser enforces it loudly. All
  * four mainstream codecs decode: null, deflate (RAW Deflate streams,
  * no zlib wrapper — `Inflater(nowrap = true)`), snappy (with the
  * spec's big-endian CRC32 suffix over the uncompressed bytes), and
  * zstandard (streamed, bound-checked).
  *
  * Row decode is implemented for the fixture's flat record shape
  * `{long id, string name}` — avro binary encoding is zigzag varints and
  * length-prefixed UTF-8, the same wire vocabulary as the thrift-compact
  * footer reader. The x98 gate checks decoded CONTENT (row counts, id
  * sums, name byte lengths) against DuckDB arithmetic; AvroContainerSpec
  * pins structure and rows against the OFFICIAL avro library
  * (DataFileReader / DataFileWriter — which also WRITES every fixture, so
  * our parser is consuming a third-party writer's bytes, never its own).
  */
object AvroContainer {

  private[graft] case class OcfBlock(nRows: Long, rawBytes: Long)
  private[graft] case class OcfFile(codec: String, schemaJson: String,
      blocks: Seq[OcfBlock], idSum: Long, nameChars: Long) {
    def nRows: Long = blocks.map(_.nRows).sum
  }

  private final class R(val bytes: Array[Byte]) {
    var pos = 0
    def u8(): Int = {
      require(pos < bytes.length, "avro: truncated")
      val b = bytes(pos) & 0xff; pos += 1; b
    }
    def varlong(): Long = {
      var r = 0L; var shift = 0
      while (true) {
        val b = u8()
        r |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return (r >>> 1) ^ -(r & 1L) // zigzag
        shift += 7
        require(shift < 64, "avro: varint overflow")
      }
      0L
    }
    def bin(n: Int): Array[Byte] = {
      require(n >= 0 && pos + n <= bytes.length, "avro: binary overruns")
      val a = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
      pos += n; a
    }
    def str(): String = new String(bin(varlong().toInt), "UTF-8")
  }

  /** One OCF data block may be hostile-sized; its byte length is bounded
    * BEFORE allocation (the GIF/TIFF decode-bound discipline). The spec's
    * default sync interval is 64 KB; 256 MiB is far past any legitimate
    * writer while keeping 32 concurrent tasks under control.
    */
  private val MaxBlock = 1 << 28

  /** Feed-backed varint/bytes reader — the streaming sibling of [[R]]:
    * same zigzag-varint grammar, O(read) memory off a bounded window.
    */
  private final class FR(feed: ByteFeed) {
    def u8(): Int = feed.u8("avro: truncated")
    def varlong(): Long = {
      var r = 0L; var shift = 0
      while (true) {
        val b = u8()
        r |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return (r >>> 1) ^ -(r & 1L) // zigzag
        shift += 7
        require(shift < 64, "avro: varint overflow")
      }
      0L
    }
    def bin(n: Int): Array[Byte] = {
      require(n >= 0 && n <= MaxBlock, "avro: binary exceeds 256 MiB bound")
      feed.bytes(n, "avro: binary overruns")
    }
    def str(): String = new String(bin(varlong().toInt), "UTF-8")
  }

  /** Streaming OCF walk: magic + metadata map + sync off the feed, then
    * block-at-a-time (count, length, payload, sync-equality) — O(largest
    * block) memory, never the file (the ByteFeed discipline the WARC/
    * tar/zip trio established; a 100 TB lake's Avro shards are multi-GB
    * and 32 concurrent whole-file reads are an OOM). Decodes rows iff
    * the schema is the fixture's flat `{long id, string name}` record;
    * other schemas parse structurally (counts and codec) with
    * idSum/nameChars = 0 — a sweep wants the block map even when it
    * doesn't know the records.
    */
  private[graft] def parseOcfStream(feed: ByteFeed): OcfFile = {
    val r = new FR(feed)
    require(feed.ensureN(4) && r.u8() == 'O' && r.u8() == 'b' &&
      r.u8() == 'j' && r.u8() == 1, "avro: bad OCF magic")
    // file metadata map: count-prefixed runs, 0-terminated; a negative
    // count means (|count| entries, long byte-size follows) per the spec
    val meta = scala.collection.mutable.Map[String, Array[Byte]]()
    var n = r.varlong()
    while (n != 0) {
      val cnt = if (n < 0) { r.varlong(); -n } else n
      (0L until cnt).foreach { _ =>
        val k = r.str(); meta(k) = r.bin(r.varlong().toInt)
      }
      n = r.varlong()
    }
    val codec = meta.get("avro.codec").map(new String(_, "UTF-8"))
      .getOrElse("null")
    val schemaJson = meta.get("avro.schema").map(new String(_, "UTF-8"))
      .getOrElse(sys.error("avro: missing avro.schema"))
    require(codec == "null" || codec == "deflate" || codec == "snappy" ||
      codec == "zstandard", s"avro: unsupported codec $codec")
    val sync = r.bin(16)
    val blocks = scala.collection.mutable.ArrayBuffer[OcfBlock]()
    var idSum = 0L; var nameChars = 0L
    // decode rows only for the known flat shape
    val flat = schemaJson.contains("\"type\":\"record\"") &&
      schemaJson.contains("\"type\":\"long\"") &&
      schemaJson.contains("\"type\":\"string\"")
    while (!feed.atEof) {
      val rows = r.varlong()
      val blen = r.varlong().toInt
      val payload = r.bin(blen)
      val data = codec match {
        case "null" => payload
        case "deflate" =>
          val inf = new java.util.zip.Inflater(true) // RAW deflate
          inf.setInput(payload)
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](4096)
          while (!inf.finished()) {
            val k = inf.inflate(buf)
            require(k > 0 || inf.finished(), "avro: truncated deflate block")
            out.write(buf, 0, k)
            require(out.size <= MaxBlock, "avro: block exceeds 256 MiB bound")
          }
          inf.end(); out.toByteArray
        case "snappy" =>
          // spec: snappy(data) + 4-byte BIG-ENDIAN CRC32 of the
          // UNCOMPRESSED bytes — the one avro codec with its own check
          require(payload.length >= 4, "avro: snappy block too short")
          val bodyLen = payload.length - 4
          // snappy-java surfaces corruption as a raw IOException
          // (FAILED_TO_UNCOMPRESS) — relabel it as data damage, not
          // I/O: an IOException reads as infra failure and gets
          // RETRIED by schedulers, which corrupt bytes never deserve
          // (found by the FuzzCorruptionSpec byte sweep)
          def named[A](body: => A): A =
            try body catch {
              case e: java.io.IOException =>
                throw new IllegalArgumentException(
                  "avro: corrupt snappy block: " + e.getMessage)
            }
          val un = named(org.xerial.snappy.Snappy.uncompressedLength(
            payload, 0, bodyLen))
          require(un >= 0 && un <= MaxBlock,
            "avro: block exceeds 256 MiB bound")
          val outB = new Array[Byte](un)
          named(org.xerial.snappy.Snappy.uncompress(payload, 0, bodyLen, outB, 0))
          val crc = new java.util.zip.CRC32(); crc.update(outB)
          val want = ((payload(bodyLen) & 0xffL) << 24) |
            ((payload(bodyLen + 1) & 0xffL) << 16) |
            ((payload(bodyLen + 2) & 0xffL) << 8) |
            (payload(bodyLen + 3) & 0xffL)
          require(crc.getValue == want, "avro: snappy block CRC mismatch")
          outB
        case "zstandard" =>
          // streamed decode so a zstd bomb hits the bound, not the heap;
          // zstd-jni's corruption signal is a ZstdIOException (an
          // IOException) — relabeled as data damage like the snappy arm
          val zin = new com.github.luben.zstd.ZstdInputStream(
            new java.io.ByteArrayInputStream(payload))
          val out = new java.io.ByteArrayOutputStream()
          try {
            val buf = new Array[Byte](1 << 16)
            var k = zin.read(buf)
            while (k >= 0) {
              out.write(buf, 0, k)
              require(out.size <= MaxBlock,
                "avro: block exceeds 256 MiB bound")
              k = zin.read(buf)
            }
          } catch {
            case e: java.io.IOException =>
              throw new IllegalArgumentException(
                "avro: corrupt zstandard block: " + e.getMessage)
          } finally zin.close()
          out.toByteArray
      }
      if (flat) {
        val br = new R(data)
        (0L until rows).foreach { _ =>
          idSum += br.varlong()
          val nb = br.varlong().toInt
          nameChars += nb
          br.bin(nb)
        }
        require(br.pos == data.length,
          s"avro: block decoded ${br.pos} of ${data.length} bytes")
      }
      val bsync = r.bin(16)
      require(java.util.Arrays.equals(bsync, sync),
        "avro: block sync marker mismatch")
      blocks += OcfBlock(rows, blen.toLong)
    }
    OcfFile(codec, schemaJson, blocks.toSeq, idSum, nameChars)
  }

  /** Array convenience over [[parseOcfStream]] — gate/spec call shape. */
  private[graft] def parseOcf(bytes: Array[Byte]): OcfFile =
    parseOcfStream(ByteFeed.wrap(bytes))

  // Fixture arithmetic (oracle re-derives everything): per doc,
  // k = id%5+2 records {id: doc_id*1000 + 7j, name: "n" + (doc_id+j)%23},
  // one record per block (explicit sync() per append); codec by id%4:
  // 0 deflate, 1 null, 2 snappy (CRC32-suffixed per the spec),
  // 3 zstandard — all four official-library-written.
  // hoisted: the fixture schema is a constant — parsing its JSON per
  // row cost a Jackson pass per document (r21 kernel sweep); Schema is
  // immutable and thread-safe to share across executor threads
  private lazy val ocfSchema: org.apache.avro.Schema =
    new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"doc","fields":[
        |{"name":"id","type":"long"},{"name":"name","type":"string"}]}"""
        .stripMargin)

  private[graft] def ocfOf(id: Long): Array[Byte] = {
    val schema = ocfSchema
    val out = new java.io.ByteArrayOutputStream()
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](schema))
    (id % 4) match {
      case 0 => w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
      case 1 => () // null codec
      case 2 => w.setCodec(org.apache.avro.file.CodecFactory.snappyCodec())
      case _ => w.setCodec(org.apache.avro.file.CodecFactory.zstandardCodec(3))
    }
    w.create(schema, out)
    val k = (id % 5 + 2).toInt
    (0 until k).foreach { j =>
      val rec = new org.apache.avro.generic.GenericData.Record(schema)
      rec.put("id", id * 1000 + 7L * j)
      rec.put("name", s"n${(id + j) % 23}")
      w.append(rec)
      w.sync() // one record per block: block count becomes oracle-predictable
    }
    w.close()
    out.toByteArray
  }

  def synthesizeOcf(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .map(id => graft.operators.Multimodal.ImageRow(id, ocfOf(id)))
      .toDF()
  }

  /** x98 gate: structural + decoded facts per container. */
  def ocfTable(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("content")).as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val f = parseOcf(bytes)
        (id, f.blocks.size, f.nRows, f.codec, f.idSum, f.nameChars)
      }
      .toDF("doc_id", "n_blocks", "n_rows", "codec", "id_sum", "name_chars")
  }

  /** File-path arm: decode rows of `.avro` files under a glob with OUR
    * parser — one task per file, the walk STREAMS `pds.open()` through
    * [[parseOcfStream]] block by block (O(largest block) memory, never
    * `pds.toArray()`; proven by `tools/AvroScale` at a >1 GB container
    * under a pressure-bound heap).
    */
  def avroRows(spark: SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(glob)
      .map { case (path, pds) =>
        val in = pds.open()
        val f = try parseOcfStream(new ByteFeed(in)) finally in.close()
        (path, f.blocks.size, f.nRows, f.codec, f.idSum, f.nameChars)
      }
      .toDF("file", "n_blocks", "n_rows", "codec", "id_sum", "name_chars")
  }
}
