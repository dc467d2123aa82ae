package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hand-rolled parquet FOOTER parser — thrift compact protocol, no
  * parquet-mr involvement.
  *
  * Why an analytics engine wants its own footer walk: at 100 TB the scan
  * planner's first act is reading ONLY the last tens of KB of every file
  * (footer length + FileMetaData) to know row groups, value counts,
  * codecs, byte ranges, and min/max statistics — that is what row-group
  * pruning, split planning, and size estimation run on, long before any
  * data page is touched. This parser does exactly that read
  * (RandomAccessFile: 8-byte tail, then the footer slice; never the
  * data), the same cheap-path contract as the mp4 walker (x85) and the
  * image metadata sweep (x93).
  *
  * Verification triangle: the x96 gate checks LOGICAL facts (per-column
  * value counts, key-column min/max from row-group statistics) against
  * DuckDB's independent read of the same files; ParquetFooterSpec pins
  * the PHYSICAL facts (offsets, compressed/uncompressed sizes, codec
  * ids) field-by-field against parquet-mr's own footer decoder — three
  * independent implementations over files written by a fourth (pyarrow).
  *
  * Thrift compact protocol per the published spec: ULEB128 varints,
  * zigzag i16/i32/i64, short-form field headers (delta<<4|type) with
  * bools in the type nibble, size-15 long-form list headers. Unknown
  * fields are skipped STRUCTURALLY (recursive skip by wire type), so
  * footers written by newer writers with extra fields still parse.
  */
object ParquetFooter {

  // parquet-format enums (format/src/main/thrift/parquet.thrift)
  private val PhysNames = Array("BOOLEAN", "INT32", "INT64", "INT96",
    "FLOAT", "DOUBLE", "BYTE_ARRAY", "FIXED_LEN_BYTE_ARRAY")
  private val CodecNames = Array("UNCOMPRESSED", "SNAPPY", "GZIP", "LZO",
    "BROTLI", "LZ4", "ZSTD", "LZ4_RAW")
  private[graft] def physName(t: Int): String =
    if (t >= 0 && t < PhysNames.length) PhysNames(t) else s"UNKNOWN($t)"
  private[graft] def codecName(c: Int): String =
    if (c >= 0 && c < CodecNames.length) CodecNames(c) else s"UNKNOWN($c)"

  private[graft] case class PqSchemaCol(name: String, physType: Int,
      numChildren: Int, hasLogical: Boolean, hasConverted: Boolean)
  private[graft] case class PqColChunk(pathInSchema: Seq[String],
      physType: Int, codec: Int, numValues: Long, totalUncompressed: Long,
      totalCompressed: Long, dataPageOffset: Long,
      dictPageOffset: Option[Long],
      minI64: Option[Long], maxI64: Option[Long]) {
    /** First byte of this chunk in the file (dictionary page precedes
      * data pages when present).
      */
    def startOffset: Long = dictPageOffset.filter(_ > 0).getOrElse(dataPageOffset)
  }
  private[graft] case class PqRowGroup(numRows: Long, totalByteSize: Long,
      columns: Seq[PqColChunk])
  private[graft] case class PqFooter(numRows: Long, createdBy: String,
      schema: Seq[PqSchemaCol], rowGroups: Seq[PqRowGroup])

  // thrift compact wire types
  private final val TStop = 0
  private final val TBoolTrue = 1
  private final val TBoolFalse = 2
  private final val TByte = 3
  private final val TI16 = 4
  private final val TI32 = 5
  private final val TI64 = 6
  private final val TDouble = 7
  private final val TBinary = 8
  private final val TList = 9
  private final val TSet = 10
  private final val TMap = 11
  private final val TStruct = 12

  private final class Reader(val bytes: Array[Byte]) {
    var pos = 0
    def u8(): Int = { val b = bytes(pos) & 0xff; pos += 1; b }
    def varint(): Long = {
      var r = 0L; var shift = 0
      while (true) {
        val b = u8()
        r |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return r
        shift += 7
        require(shift < 64, "thrift: varint overflow")
      }
      r
    }
    def zigzag(): Long = { val v = varint(); (v >>> 1) ^ -(v & 1L) }
    def binary(): Array[Byte] = {
      val n = varint().toInt
      require(n >= 0 && pos + n <= bytes.length, "thrift: binary overruns")
      val a = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
      pos += n; a
    }
    def str(): String = new String(binary(), "UTF-8")

    def listHeader(): (Int, Int) = {
      val b = u8()
      val t = b & 0x0f
      val sz = (b >>> 4) & 0x0f
      (if (sz == 15) varint().toInt else sz, t)
    }

    /** Structurally skip one value of wire type `t`. */
    def skip(t: Int): Unit = t match {
      case TBoolTrue | TBoolFalse => () // value lived in the nibble
      case TByte => pos += 1
      case TI16 | TI32 | TI64 => varint(); ()
      case TDouble => pos += 8
      case TBinary =>
        val n = varint().toInt
        require(n >= 0 && pos + n <= bytes.length, "thrift: binary skip overruns")
        pos += n
      case TList | TSet =>
        val (n, et) = listHeader()
        // inside collections, bools are one byte each (not nibble-packed)
        var i = 0
        while (i < n) { if (et == TBoolTrue || et == TBoolFalse) pos += 1 else skip(et); i += 1 }
      case TMap =>
        val n = varint().toInt
        if (n > 0) {
          val kv = u8(); val kt = (kv >>> 4) & 0x0f; val vt = kv & 0x0f
          var i = 0
          while (i < n) { skip(kt); skip(vt); i += 1 }
        }
      case TStruct => skipStruct()
      case other => throw new IllegalArgumentException(
        s"thrift: unknown wire type $other at $pos")
    }

    def skipStruct(): Unit = struct((_, t) => skip(t))

    /** Walk a struct's fields, dispatching on field id; `f` must consume
      * the value (or call skip).
      */
    def struct(f: (Int, Int) => Unit): Unit = {
      var last = 0
      var b = u8()
      while (b != TStop) {
        val t = b & 0x0f
        val delta = (b >>> 4) & 0x0f
        last = if (delta == 0) zigzag().toInt else last + delta
        f(last, t)
        b = u8()
      }
    }
  }

  /** Decode a plain-encoded integer statistics binary: INT64 = 8-byte LE,
    * INT32 = 4-byte LE sign-extended.
    */
  private def intStat(b: Array[Byte]): Option[Long] = b.length match {
    case 8 => Some((0 until 8).foldLeft(0L)((acc, i) =>
      acc | ((b(i) & 0xffL) << (8 * i))))
    case 4 => Some(((0 until 4).foldLeft(0L)((acc, i) =>
      acc | ((b(i) & 0xffL) << (8 * i))).toInt).toLong)
    case _ => None
  }

  private def parseStatistics(r: Reader, physType: Int): (Option[Long], Option[Long]) = {
    var minB: Array[Byte] = null
    var maxB: Array[Byte] = null
    var minDep: Array[Byte] = null
    var maxDep: Array[Byte] = null
    r.struct { (id, t) =>
      (id, t) match {
        case (1, TBinary) => maxDep = r.binary() // deprecated max
        case (2, TBinary) => minDep = r.binary() // deprecated min
        case (5, TBinary) => maxB = r.binary()   // max_value
        case (6, TBinary) => minB = r.binary()   // min_value
        case _ => r.skip(t)
      }
    }
    val minRaw = if (minB != null) minB else minDep
    val maxRaw = if (maxB != null) maxB else maxDep
    if (physType != 1 && physType != 2) (None, None) // INT32/INT64 only
    else (Option(minRaw).flatMap(intStat), Option(maxRaw).flatMap(intStat))
  }

  private def parseColumnMeta(r: Reader): PqColChunk = {
    var physType = -1; var codec = -1
    var numValues = -1L; var totUnc = -1L; var totComp = -1L
    var dataOff = -1L
    var dictOff: Option[Long] = None
    var path: Seq[String] = Nil
    var mn: Option[Long] = None; var mx: Option[Long] = None
    r.struct { (id, t) =>
      (id, t) match {
        case (1, TI32) => physType = r.zigzag().toInt
        case (3, TList) =>
          val (n, et) = r.listHeader()
          require(et == TBinary, "parquet: path_in_schema element type")
          path = (0 until n).map(_ => r.str())
        case (4, TI32) => codec = r.zigzag().toInt
        case (5, TI64) => numValues = r.zigzag()
        case (6, TI64) => totUnc = r.zigzag()
        case (7, TI64) => totComp = r.zigzag()
        case (9, TI64) => dataOff = r.zigzag()
        case (11, TI64) => dictOff = Some(r.zigzag())
        case (12, TStruct) =>
          val (a, b) = parseStatistics(r, physType); mn = a; mx = b
        case _ => r.skip(t)
      }
    }
    require(physType >= 0 && numValues >= 0 && path.nonEmpty,
      "parquet: incomplete ColumnMetaData")
    PqColChunk(path, physType, codec, numValues, totUnc, totComp, dataOff,
      dictOff, mn, mx)
  }

  private def parseColumnChunk(r: Reader): PqColChunk = {
    var meta: PqColChunk = null
    r.struct { (id, t) =>
      (id, t) match {
        case (3, TStruct) => meta = parseColumnMeta(r)
        case _ => r.skip(t)
      }
    }
    require(meta != null, "parquet: ColumnChunk without meta_data")
    meta
  }

  private def parseRowGroup(r: Reader): PqRowGroup = {
    var cols: Seq[PqColChunk] = Nil
    var totalBytes = -1L; var numRows = -1L
    r.struct { (id, t) =>
      (id, t) match {
        case (1, TList) =>
          val (n, et) = r.listHeader()
          require(et == TStruct, "parquet: RowGroup.columns element type")
          cols = (0 until n).map(_ => parseColumnChunk(r))
        case (2, TI64) => totalBytes = r.zigzag()
        case (3, TI64) => numRows = r.zigzag()
        case _ => r.skip(t)
      }
    }
    require(numRows >= 0 && cols.nonEmpty, "parquet: incomplete RowGroup")
    PqRowGroup(numRows, totalBytes, cols)
  }

  private def parseSchemaElement(r: Reader): PqSchemaCol = {
    var name: String = null
    var physType = -1; var numChildren = 0
    var hasLogical = false; var hasConverted = false
    r.struct { (id, t) =>
      (id, t) match {
        case (1, TI32) => physType = r.zigzag().toInt
        case (4, TBinary) => name = r.str()
        case (5, TI32) => numChildren = r.zigzag().toInt
        case (6, TI32) => hasConverted = true; r.zigzag()
        case (10, TStruct) => hasLogical = true; r.skipStruct()
        case _ => r.skip(t)
      }
    }
    require(name != null, "parquet: SchemaElement without name")
    PqSchemaCol(name, physType, numChildren, hasLogical, hasConverted)
  }

  private[graft] def parseFileMetaData(bytes: Array[Byte]): PqFooter = {
    val r = new Reader(bytes)
    var numRows = -1L
    var createdBy = ""
    var schema: Seq[PqSchemaCol] = Nil
    var rowGroups: Seq[PqRowGroup] = Nil
    r.struct { (id, t) =>
      (id, t) match {
        case (2, TList) =>
          val (n, et) = r.listHeader()
          require(et == TStruct, "parquet: schema element type")
          schema = (0 until n).map(_ => parseSchemaElement(r))
        case (3, TI64) => numRows = r.zigzag()
        case (4, TList) =>
          val (n, et) = r.listHeader()
          require(et == TStruct, "parquet: row_groups element type")
          rowGroups = (0 until n).map(_ => parseRowGroup(r))
        case (6, TBinary) => createdBy = r.str()
        case _ => r.skip(t)
      }
    }
    require(numRows >= 0 && schema.nonEmpty, "parquet: incomplete FileMetaData")
    PqFooter(numRows, createdBy, schema, rowGroups)
  }

  /** Footer-only read: the 8-byte tail (length + PAR1), then the
    * FileMetaData slice. Data pages are never touched — on a 1 GB file
    * this reads tens of KB.
    */
  private[graft] def readFooter(path: String): PqFooter = {
    val raf = new java.io.RandomAccessFile(path, "r")
    try {
      val len = raf.length()
      require(len >= 12, s"parquet: $path too small")
      raf.seek(len - 8)
      val tail = new Array[Byte](8)
      raf.readFully(tail)
      require(tail(4) == 'P' && tail(5) == 'A' && tail(6) == 'R' &&
        tail(7) == '1', s"parquet: $path missing PAR1 magic")
      val fl = (tail(0) & 0xffL) | ((tail(1) & 0xffL) << 8) |
        ((tail(2) & 0xffL) << 16) | ((tail(3) & 0xffL) << 24)
      require(fl > 0 && fl <= len - 12, s"parquet: $path bad footer length $fl")
      raf.seek(len - 8 - fl)
      val buf = new Array[Byte](fl.toInt)
      raf.readFully(buf)
      parseFileMetaData(buf)
    } finally raf.close()
  }

  /** x96 gate: logical footer facts for every sf table, DuckDB-checkable —
    * per top-level scalar column (path_in_schema depth 1), the value count
    * summed across row groups (== row count for flat leaves), plus
    * min/max decoded from row-group statistics for each table's INT64 key
    * column. Parsing fans out one task per file.
    */
  val tables: Seq[(String, String)] = Seq(
    "region" -> "r_regionkey", "nation" -> "n_nationkey",
    "customer" -> "c_custkey", "supplier" -> "s_suppkey",
    "part" -> "p_partkey", "orders" -> "o_orderkey",
    "lineitem" -> "l_orderkey", "events" -> "event_id",
    "documents" -> "doc_id", "embeddings" -> "vec_id")

  private[graft] case class RgPlan(rgIdx: Int, numRows: Long,
      startOffset: Long, totalCompressed: Long,
      mn: Option[Long], mx: Option[Long], keep: Boolean)

  /** Row-group pruning plan for an integer range predicate
    * `column BETWEEN lo AND hi` — THE reason a planner reads footers: a
    * group whose [min,max] statistics are disjoint from the predicate is
    * never scanned. Groups without usable statistics are kept (pruning
    * must be sound, never clairvoyant). Returns every group with its
    * byte range so a scheduler can assign exactly the surviving splits;
    * on a sorted table this turns a point/range lookup into O(groups
    * overlapping the range) I/O, independent of file size.
    */
  private[graft] def pruneRowGroups(path: String, column: String,
      lo: Long, hi: Long): Seq[RgPlan] = {
    val f = readFooter(path)
    f.rowGroups.zipWithIndex.map { case (rg, i) =>
      val start = rg.columns.map(_.startOffset).min
      val bytes = rg.columns.map(_.totalCompressed).sum
      val chunk = rg.columns.find(_.pathInSchema == Seq(column))
      val (mn, mx) = chunk.map(c => (c.minI64, c.maxI64)).getOrElse((None, None))
      val keep = (mn, mx) match {
        case (Some(a), Some(b)) => b >= lo && a <= hi
        case _ => true // no stats -> cannot prune soundly
      }
      RgPlan(i, rg.numRows, start, bytes, mn, mx, keep)
    }
  }

  def footerTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.createDataset(tables)
      .repartition(tables.size)
      .flatMap { case (t, keyCol) =>
        val f = readFooter(s"$dir/$t.parquet")
        f.rowGroups.flatMap(_.columns)
          .filter(_.pathInSchema.length == 1)
          .groupBy(_.pathInSchema.head)
          .map { case (col, chunks) =>
            val isKey = col == keyCol
            (t, col, chunks.map(_.numValues).sum,
              if (isKey) chunks.flatMap(_.minI64).minOption else None,
              if (isKey) chunks.flatMap(_.maxI64).maxOption else None)
          }
      }
      .toDF("table_name", "col_name", "num_values", "min_i64", "max_i64")
      .orderBy("table_name", "col_name")
  }
}
