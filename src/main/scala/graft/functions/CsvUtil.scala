package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Byte-level CSV helpers shared by interpreted eval and generated code.
  *
  * Dialect (reference: code/KustoPreForgeLib/Transforms/CsvParseTransform.cs:60-115):
  *   - comma delimiter, `"` quoting, `""` escape-by-doubling inside quotes
  *   - commas/newlines inside quotes are data
  *   - extracted field is the raw byte slice, quotes INCLUDED (the reference
  *     passes the slice verbatim to the partition function,
  *     CsvParseTransform.cs:86-92) — we never reserialize.
  *
  * Kept as a plain object with JVM-static-reachable methods so generated
  * Java (whole-stage codegen) can call `graft.functions.CsvUtil.columnAt(...)`
  * without breaking the codegen span.
  */
object CsvUtil {

  /** Raw byte slice of 0-based field `idx` of a CSV line, or null when the
    * line has fewer than idx+1 fields. Operates on UTF-8 bytes directly —
    * no decode, no copy (UTF8String.substring-style slice).
    */
  def columnAt(line: UTF8String, idx: Int): UTF8String =
    columnAt(line, idx, ','.toByte)

  /** Delimiter-parameterized variant — the reference's intended test
    * matrix declares `Format=psv` as a default dimension alongside csv
    * (code/IntegrationTests/TestCaseConfiguration.cs:17-29); quoting
    * rules are unchanged (`"` quote, `""` escape — only the separator
    * byte varies across the csv/psv/tsv family).
    */
  def columnAt(line: UTF8String, idx: Int, delim: Byte): UTF8String = {
    if (line == null || idx < 0) return null
    val n = line.numBytes()
    var i = 0
    var field = 0
    var start = 0
    var inQuotes = false
    while (i < n) {
      val b = line.getByte(i)
      if (inQuotes) {
        if (b == '"') {
          // `""` inside quotes = escaped quote; lone `"` closes the quote
          if (i + 1 < n && line.getByte(i + 1) == '"') i += 1
          else inQuotes = false
        }
      } else if (b == '"') {
        inQuotes = true
      } else if (b == delim) {
        if (field == idx) return slice(line, start, i)
        field += 1
        start = i + 1
      }
      i += 1
    }
    if (field == idx) slice(line, start, n) else null
  }

  /** Number of fields in the line under the same dialect (empty line = 1). */
  def fieldCount(line: UTF8String): Int = fieldCount(line, ','.toByte)

  def fieldCount(line: UTF8String, delim: Byte): Int = {
    if (line == null) return 0
    val n = line.numBytes()
    var i = 0
    var fields = 1
    var inQuotes = false
    while (i < n) {
      val b = line.getByte(i)
      if (inQuotes) {
        if (b == '"') {
          if (i + 1 < n && line.getByte(i + 1) == '"') i += 1
          else inQuotes = false
        }
      } else if (b == '"') inQuotes = true
      else if (b == delim) fields += 1
      i += 1
    }
    fields
  }

  // copy ONLY the field's bytes: line.getBytes would copy the whole line
  // for every field extraction on UnsafeRow-backed strings (3 extractions
  // per record in the validation frame = 3 full-line copies on the hot path)
  private def slice(line: UTF8String, from: Int, until: Int): UTF8String = {
    import org.apache.spark.unsafe.Platform
    val len = until - from
    val out = new Array[Byte](len)
    Platform.copyMemory(line.getBaseObject, line.getBaseOffset + from,
      out, Platform.BYTE_ARRAY_OFFSET, len)
    UTF8String.fromBytes(out)
  }
}

/** XOR-fold hash — bit-parity with the reference's partition function
  * (code/KustoPreForgeLib/Transforms/PartitioningHelper.cs:15-25):
  *   hash = seed; foreach byte b: hash ^= b; return hash % maxPartitionCount
  * Operates on the raw UTF-8 bytes of the (verbatim, quotes-included) field.
  * Note the range of the fold is tiny (seed ⊕ [0,255]) — at most 256 distinct
  * values regardless of maxPartitionCount; the reference inherits the same
  * skew. Parity requires replicating it exactly; built-in hash/xxhash64 are
  * NOT bit-compatible.
  */
object HashUtil {
  def xorFold(value: UTF8String, seed: Int): Int = {
    if (value == null) return seed
    var h = seed
    var i = 0
    val n = value.numBytes()
    while (i < n) {
      h = h ^ (value.getByte(i) & 0xff)
      i += 1
    }
    h
  }

  def xorFoldMod(value: UTF8String, seed: Int, maxPartitionCount: Int): Int =
    xorFold(value, seed) % maxPartitionCount

  /** Karp–Rabin polynomial rolling hash over the raw UTF-8 bytes:
    * h = (h * 31 + b) mod 1e9+7. Single pass, no allocation; the standard
    * content fingerprint for document identity / chunk dedup. For ASCII
    * input this equals the same fold over code points (how the DuckDB
    * oracle computes it).
    */
  def rollingHash(value: UTF8String): Long = {
    if (value == null) return 0L
    val M = 1000000007L
    var h = 0L
    var i = 0
    val n = value.numBytes()
    while (i < n) {
      h = (h * 31L + (value.getByte(i) & 0xff)) % M
      i += 1
    }
    h
  }
}
