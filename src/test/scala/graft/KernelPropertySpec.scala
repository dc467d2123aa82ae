package graft

import graft.functions.{CsvUtil, HashUtil}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the byte-level kernels (no SparkSession needed):
  * a model CSV serializer drives csv_column_at/csv_field_count over
  * arbitrary field content including commas, quotes, and empties; the hash
  * kernels are checked against independent fold models.
  */
class KernelPropertySpec extends AnyFunSuite {

  private def check(prop: Prop, n: Int = 500): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  /** Model serializer for the reference dialect: quote when the field
    * contains a comma or quote; escape quotes by doubling.
    */
  private def quote(f: String): String =
    if (f.contains(",") || f.contains("\""))
      "\"" + f.replace("\"", "\"\"") + "\""
    else f

  private val fieldGen: Gen[String] = Gen.oneOf(
    Gen.stringOfN(6, Gen.alphaNumChar),
    Gen.stringOf(Gen.oneOf('a', 'Z', '0', ',', '"', ' ', '.')).map(_.take(10)),
    Gen.const(""))

  private val rowGen: Gen[List[String]] =
    Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, fieldGen))

  test("csv_column_at returns the verbatim serialized slice of every field") {
    check(Prop.forAll(rowGen) { fields =>
      val line = UTF8String.fromString(fields.map(quote).mkString(","))
      fields.indices.forall { i =>
        val got = CsvUtil.columnAt(line, i)
        got != null && got.toString == quote(fields(i))
      }
    })
  }

  test("csv_field_count equals the model field count; beyond-range is null") {
    check(Prop.forAll(rowGen) { fields =>
      val line = UTF8String.fromString(fields.map(quote).mkString(","))
      CsvUtil.fieldCount(line) == fields.length &&
        CsvUtil.columnAt(line, fields.length) == null
    })
  }

  test("xor_fold_hash equals the byte-fold model for any string and seed") {
    check(Prop.forAll(Gen.asciiPrintableStr, Gen.chooseNum(0, 1 << 20)) { (s, seed) =>
      val expected = s.getBytes("UTF-8").foldLeft(seed)((h, b) => h ^ (b & 0xff))
      HashUtil.xorFold(UTF8String.fromString(s), seed) == expected
    })
  }

  test("rolling_hash equals the polynomial fold model (incl. non-ASCII bytes)") {
    check(Prop.forAll(Gen.stringOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('é', '漢', 'ß')))) { s =>
      val expected = s.getBytes("UTF-8")
        .foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % 1000000007L)
      HashUtil.rollingHash(UTF8String.fromString(s)) == expected
    })
  }

  test("token_count equals size(split(trim, \\s+, -1)) for any string") {
    // mixed alphanumerics, every ASCII \s char, and multi-byte chars whose
    // UTF-8 continuation bytes must never read as whitespace
    val tokenCharGen = Gen.oneOf(
      Gen.alphaNumChar,
      Gen.oneOf(' ', '\t', '\n', '\u000B', '\f', '\r'),
      Gen.oneOf('é', '漢', 'ß'))
    check(Prop.forAll(Gen.stringOf(tokenCharGen)) { s =>
      // the Spark-side model: trim() strips 0x20 only, then Java split
      // with -1 limit (trailing empties kept)
      val trimmed = {
        var a = 0; var b = s.length
        while (a < b && s.charAt(a) == ' ') a += 1
        while (b > a && s.charAt(b - 1) == ' ') b -= 1
        s.substring(a, b)
      }
      val expected = trimmed.split("\\s+", -1).length
      graft.functions.SketchUtil.tokenCount(UTF8String.fromString(s)) == expected
    })
  }

  test("pair_encode emits exactly the n-choose-2 unordered pairs, order-canonical") {
    // full 64-bit id range — the old packed-long form capped ids at 2^32;
    // the struct form must handle any long (a 100 TB corpus can exceed
    // 4.3B documents)
    def decode(ad: org.apache.spark.sql.catalyst.util.ArrayData): Seq[(Long, Long)] =
      (0 until ad.numElements()).map { i =>
        val r = ad.getStruct(i, 2); (r.getLong(0), r.getLong(1))
      }
    val idsGen = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Long.MinValue, Long.MaxValue)))
    check(Prop.forAll(idsGen) { ids =>
      val got = decode(graft.functions.SketchUtil.pairEncode(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(ids.toArray)))
      // model: every unordered (min, max) pair from the sorted ids
      val s = ids.sorted
      val expected = for {
        i <- s.indices; j <- (i + 1) until s.length
      } yield (s(i), s(j))
      got == expected
    })
    // shuffling the input must not change the encoding (order-canonical)
    check(Prop.forAll(idsGen) { ids =>
      val enc = (l: Seq[Long]) => decode(graft.functions.SketchUtil.pairEncode(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(l.toArray)))
      enc(ids) == enc(ids.reverse)
    })
    // ids past the old 2^32 ceiling round-trip exactly
    val big = decode(graft.functions.SketchUtil.pairEncode(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array(5_000_000_000L, 7L, Long.MaxValue))))
    assert(big == Seq((7L, 5_000_000_000L), (7L, Long.MaxValue),
      (5_000_000_000L, Long.MaxValue)))
  }

  // ---- PQ kernels vs an independent model over random geometry

  private val pqGen: Gen[(Array[Float], Array[Float], Int, Int)] = for {
    nSub <- Gen.oneOf(1, 2, 4)
    d <- Gen.oneOf(1, 2, 3)
    nCodes <- Gen.oneOf(1, 2, 5)
    vec <- Gen.listOfN(nSub * d, Gen.chooseNum(-10.0f, 10.0f))
    cb <- Gen.listOfN(nSub * nCodes * d, Gen.chooseNum(-10.0f, 10.0f))
  } yield (vec.toArray, cb.toArray, nSub, nCodes)

  private def modelEncode(v: Array[Float], cb: Array[Float],
                          nSub: Int, nCodes: Int): Seq[Int] = {
    val d = v.length / nSub
    (0 until nSub).map { s =>
      val dists = (0 until nCodes).map { c =>
        (0 until d).foldLeft(0.0) { (acc, i) =>
          val diff = v(s * d + i).toDouble - cb((s * nCodes + c) * d + i).toDouble
          acc + diff * diff
        }
      }
      dists.indexOf(dists.min) // first minimum = lowest code
    }
  }

  test("pq_encode matches the model argmin with lowest-code tie-break") {
    check(Prop.forAll(pqGen) { case (v, cb, nSub, nCodes) =>
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      val got = graft.functions.VectorUtil
        .pqEncode(new GenericArrayData(v), new GenericArrayData(cb), nSub)
        .toIntArray().toSeq
      got == modelEncode(v, cb, nSub, nCodes)
    })
  }

  test("pq_adc_dot equals the model fold bit-exactly") {
    check(Prop.forAll(pqGen) { case (v, cb, nSub, nCodes) =>
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      val d = v.length / nSub
      val codes = modelEncode(v, cb, nSub, nCodes)
      val model = (0 until nSub).foldLeft(0.0) { (acc, s) =>
        (0 until d).foldLeft(acc) { (a, i) =>
          a + v(s * d + i).toDouble * cb((s * nCodes + codes(s)) * d + i).toDouble
        }
      }
      val got = graft.functions.VectorUtil.pqAdcDot(
        new GenericArrayData(v),
        new GenericArrayData(codes.toArray),
        new GenericArrayData(cb), nSub)
      got == model // bit-exact: same ops in the same order
    })
  }
}
