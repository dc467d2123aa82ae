package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hand-rolled ORC tail reader — the data-lake container family's fourth
  * member (parquet/thrift-compact x96, avro OCF x98, WARC x100): ORC's
  * tail is PROTOBUF, so this is our third wire format implemented from
  * the spec. Layout per the ORC v1 spec: stripes, file metadata, Footer
  * (protobuf, chunk-compressed), PostScript (protobuf, NEVER compressed),
  * one trailing byte = postscript length. Compressed regions are framed
  * as chunks of [3-byte little-endian header: length<<1 | isOriginal]
  * then payload — ZLIB means RAW deflate inside those chunks.
  *
  * The protobuf reader implements the wire format directly: varint keys
  * (field<<3 | wiretype), wiretypes 0/1/2/5, zigzag sint64 for the
  * integer statistics, packed repeated uints for subtypes — unknown
  * fields are skipped structurally (what makes protobuf tails forward-
  * compatible), group wiretypes reject loudly.
  *
  * Column statistics are matched to columns BY NAME through the root
  * struct's fieldNames (type ids are preorder: root=0, column i = i+1 on
  * flat schemas) — never by hardcoded position. The x105 gate writes ORC
  * with Spark's writer (official third-party bytes; our parser never
  * reads its own writer's output — there is no writer here) and DuckDB
  * re-derives row counts and int min/max/sum from the source table.
  * OrcFooterSpec additionally pins stripes, compression, and statistics
  * against the official ORC reader on the same files.
  *
  * 100 TB shape: like x96 — a footer read is O(tail bytes), so planning
  * a scan over a lake of ORC files touches KBs per file, never data; the
  * stats enable the same row-group-style pruning `pruneRowGroups` does
  * for parquet (stripe granularity here).
  */
object OrcFooter {

  private[graft] case class OrcStripe(offset: Long, indexLen: Long,
      dataLen: Long, footerLen: Long, rows: Long)
  private[graft] case class OrcIntStats(min: Option[Long], max: Option[Long],
      sum: Option[Long])
  private[graft] case class OrcColStats(values: Long, ints: Option[OrcIntStats])
  private[graft] case class OrcTail(compression: String, blockSize: Long,
      writerVersion: Long, nRows: Long, rootFields: Seq[String],
      typeKinds: Seq[Int], stripes: Seq[OrcStripe], stats: Seq[OrcColStats]) {
    /** statistics of a root-level column, located by NAME. */
    def colStats(name: String): OrcColStats = {
      val i = rootFields.indexOf(name)
      require(i >= 0, s"orc: no column '$name' in $rootFields")
      stats(i + 1) // preorder ids: root struct = 0
    }
  }

  // ------------------------------------------------------------ protobuf

  private final class Pb(val bytes: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def u8(): Int = {
      require(pos < end, "orc: protobuf truncated")
      val b = bytes(pos) & 0xff; pos += 1; b
    }
    def varint(): Long = {
      var v = 0L; var shift = 0
      while (true) {
        val b = u8()
        v |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
        require(shift < 64, "orc: varint overflow")
      }
      0L
    }
    def zigzag(): Long = { val v = varint(); (v >>> 1) ^ -(v & 1L) }
    /** Returns (fieldNumber, wireType). */
    def key(): (Int, Int) = {
      val k = varint()
      ((k >>> 3).toInt, (k & 7).toInt)
    }
    def lenDelim(): Pb = {
      val n = varint().toInt
      require(n >= 0 && pos + n <= end, "orc: length-delimited overruns")
      val p = new Pb(bytes, pos, pos + n); pos += n; p
    }
    def str(): String = {
      val p = lenDelim()
      new String(p.bytes, p.pos, p.end - p.pos, "UTF-8")
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint(); ()
      case 1 => require(pos + 8 <= end, "orc: fixed64 overruns"); pos += 8
      case 2 => lenDelim(); ()
      case 5 => require(pos + 4 <= end, "orc: fixed32 overruns"); pos += 4
      case other => sys.error(s"orc: unsupported wire type $other")
    }
  }

  // ---------------------------------------------------------------- tail

  private def decompress(bytes: Array[Byte], from: Int, until: Int,
                         codec: String): Array[Byte] = codec match {
    case "none" => java.util.Arrays.copyOfRange(bytes, from, until)
    case "zlib" =>
      val out = new java.io.ByteArrayOutputStream()
      var pos = from
      while (pos < until) {
        require(pos + 3 <= until, "orc: truncated chunk header")
        val h = (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8) |
          ((bytes(pos + 2) & 0xff) << 16)
        pos += 3
        val n = h >>> 1
        require(pos + n <= until, "orc: chunk overruns region")
        if ((h & 1) == 1) out.write(bytes, pos, n) // stored as-original
        else {
          val inf = new java.util.zip.Inflater(true) // raw deflate
          inf.setInput(bytes, pos, n)
          val buf = new Array[Byte](8192)
          while (!inf.finished()) {
            val k = inf.inflate(buf)
            require(k > 0 || inf.finished(), "orc: truncated deflate chunk")
            out.write(buf, 0, k)
          }
          inf.end()
        }
        pos += n
      }
      out.toByteArray
    case other =>
      sys.error(s"orc: unsupported compression $other (only none/zlib here)")
  }

  private val codecs = Map(0 -> "none", 1 -> "zlib", 2 -> "snappy",
    3 -> "lzo", 4 -> "lz4", 5 -> "zstd", 6 -> "brotli")

  private[graft] def parseOrc(bytes: Array[Byte]): OrcTail = {
    require(bytes.length > 16 && bytes(0) == 'O' && bytes(1) == 'R' &&
      bytes(2) == 'C', "orc: bad magic")
    val psLen = bytes(bytes.length - 1) & 0xff
    require(psLen > 0 && bytes.length - 1 - psLen > 3, "orc: bad postscript length")
    val ps = new Pb(bytes, bytes.length - 1 - psLen, bytes.length - 1)
    var footerLen = -1L; var codecId = 0; var blockSize = 0L
    var writerVersion = 0L; var magic = ""
    while (ps.hasMore) {
      val (f, w) = ps.key()
      f match {
        case 1 => footerLen = ps.varint()
        case 2 => codecId = ps.varint().toInt
        case 3 => blockSize = ps.varint()
        case 6 => writerVersion = ps.varint()
        case 8000 => magic = ps.str()
        case _ => ps.skip(w)
      }
    }
    require(magic == "ORC", s"orc: postscript magic '$magic'")
    require(footerLen > 0, "orc: postscript missing footerLength")
    val codec = codecs.getOrElse(codecId,
      sys.error(s"orc: unknown compression id $codecId"))
    val fEnd = bytes.length - 1 - psLen
    val fStart = fEnd - footerLen.toInt
    require(fStart > 3, "orc: footer overruns file head")
    val fb = decompress(bytes, fStart, fEnd, codec)
    val ft = new Pb(fb, 0, fb.length)
    var nRows = 0L
    val stripes = scala.collection.mutable.ArrayBuffer[OrcStripe]()
    val kinds = scala.collection.mutable.ArrayBuffer[Int]()
    var rootFields = Seq.empty[String]
    val stats = scala.collection.mutable.ArrayBuffer[OrcColStats]()
    while (ft.hasMore) {
      val (f, w) = ft.key()
      f match {
        case 3 => // StripeInformation
          val m = ft.lenDelim()
          var off = 0L; var il = 0L; var dl = 0L; var fl = 0L; var r = 0L
          while (m.hasMore) {
            val (f2, w2) = m.key()
            f2 match {
              case 1 => off = m.varint()
              case 2 => il = m.varint()
              case 3 => dl = m.varint()
              case 4 => fl = m.varint()
              case 5 => r = m.varint()
              case _ => m.skip(w2)
            }
          }
          stripes += OrcStripe(off, il, dl, fl, r)
        case 4 => // Type
          val m = ft.lenDelim()
          var kind = -1
          val names = scala.collection.mutable.ArrayBuffer[String]()
          while (m.hasMore) {
            val (f2, w2) = m.key()
            f2 match {
              case 1 => kind = m.varint().toInt
              case 3 => names += m.str()
              case _ => m.skip(w2)
            }
          }
          require(kind >= 0, "orc: Type missing kind")
          if (kinds.isEmpty) { // root struct carries the column names
            require(kind == 12, s"orc: root type kind $kind, expected struct")
            rootFields = names.toSeq
          }
          kinds += kind
        case 6 => nRows = ft.varint()
        case 7 => // ColumnStatistics
          val m = ft.lenDelim()
          var values = 0L
          var ints: Option[OrcIntStats] = None
          while (m.hasMore) {
            val (f2, w2) = m.key()
            f2 match {
              case 1 => values = m.varint()
              case 2 =>
                val s = m.lenDelim()
                var mn: Option[Long] = None; var mx: Option[Long] = None
                var sm: Option[Long] = None
                while (s.hasMore) {
                  val (f3, w3) = s.key()
                  f3 match {
                    case 1 => mn = Some(s.zigzag())
                    case 2 => mx = Some(s.zigzag())
                    case 3 => sm = Some(s.zigzag())
                    case _ => s.skip(w3)
                  }
                }
                ints = Some(OrcIntStats(mn, mx, sm))
              case _ => m.skip(w2)
            }
          }
          stats += OrcColStats(values, ints)
        case _ => ft.skip(w)
      }
    }
    require(kinds.nonEmpty, "orc: footer has no types")
    require(stats.isEmpty || stats.size == kinds.size,
      s"orc: ${stats.size} statistics for ${kinds.size} types")
    require(stripes.map(_.rows).sum == nRows,
      "orc: stripe row counts disagree with footer numberOfRows")
    OrcTail(codec, blockSize, writerVersion, nRows, rootFields,
      kinds.toSeq, stripes.toSeq, stats.toSeq)
  }

  private[graft] def readTail(path: String): OrcTail = {
    val f = new java.io.File(path)
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    parseOrc(bytes)
  }

  /** x105 gate: write one zlib ORC file per l_returnflag group with
    * Spark's ORC writer (official bytes), then read the tails back with
    * OUR parser — row counts and l_partkey int statistics are re-derived
    * by DuckDB from the same table.
    */
  def orcFooterTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val groups = li.select(col("l_returnflag")).distinct()
      .as[String].collect().sorted // 3 values — driver-side by design
    val tmp = java.nio.file.Files.createTempDirectory("graft-orc").toFile
    // the three per-group writes are independent single-task (coalesce 1)
    // zlib encodes — submitted sequentially they serialized on one core
    // each in turn (guide §2.6: overlap independent jobs); a small pool
    // runs them concurrently, wall ≈ the slowest group instead of the sum.
    // Empty input ⇒ no pool (newFixedThreadPool(0) throws where the old
    // sequential loop produced an empty list); worker failures rethrow
    // the ORIGINAL exception, not the ExecutionException wrapper (ADVICE).
    val files = if (groups.isEmpty) Array.empty[(String, String)] else {
      val pool =
        java.util.concurrent.Executors.newFixedThreadPool(groups.length)
      try {
        import scala.jdk.CollectionConverters._
        pool.invokeAll(groups.map { g =>
          new java.util.concurrent.Callable[(String, String)] {
            def call(): (String, String) = {
              val out = new java.io.File(tmp, s"rf_$g").getAbsolutePath
              li.filter(col("l_returnflag") === g)
                .coalesce(1)
                .write.mode("overwrite").option("compression", "zlib").orc(out)
              val part = new java.io.File(out).listFiles()
                .filter(_.getName.endsWith(".orc"))
              require(part.length == 1,
                s"orc: expected one part file, got ${part.length}")
              (g, part.head.getAbsolutePath)
            }
          }
        }.toList.asJava).asScala.map { f =>
          try f.get()
          catch {
            case e: java.util.concurrent.ExecutionException =>
              throw e.getCause
          }
        }.toArray
      } finally pool.shutdown()
    }
    def rm(x: java.io.File): Unit = {
      if (x.isDirectory) x.listFiles().foreach(rm)
      x.delete()
    }
    val rows = try {
      files.map { case (g, path) =>
        val t = readTail(path)
        val pk = t.colStats("l_partkey")
        val ints = pk.ints.getOrElse(sys.error("orc: l_partkey missing int stats"))
        (g, t.compression, t.nRows, t.typeKinds.size, t.stripes.size,
          pk.values, ints.min.get, ints.max.get, ints.sum.get)
      }.toSeq
    } finally rm(tmp)
    spark.createDataset(rows)
      .toDF("l_returnflag", "compression", "n_rows", "n_types",
        "n_stripes", "pk_values", "pk_min", "pk_max", "pk_sum")
      .orderBy("l_returnflag")
  }
}
