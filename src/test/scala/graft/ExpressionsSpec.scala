package graft

import graft.functions.{CsvUtil, GraftFunctions, HashUtil}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level fixtures from FIXTURES.md §3 (CSV dialect) and §4 (hash). */
class ExpressionsSpec extends GraftSparkSpec {
  import spark.implicits._

  private def col(line: String, idx: Int): String = {
    val r = CsvUtil.columnAt(UTF8String.fromString(line), idx)
    if (r == null) null else r.toString
  }

  test("csv_column_at: plain fields") {
    assert(col("a,b,c", 0) == "a")
    assert(col("a,b,c", 1) == "b")
    assert(col("a,b,c", 2) == "c")
    assert(col("a,b,c", 3) == null)
  }

  test("csv_column_at: quoted field kept verbatim (quotes included)") {
    assert(col("a,\"b,x\",c", 1) == "\"b,x\"")
    assert(col("a,\"b,x\",c", 2) == "c")
  }

  test("csv_column_at: escaped quote \"\" inside quotes") {
    assert(col("a,\"b\"\"x\",c", 1) == "\"b\"\"x\"")
    assert(col("a,\"b\"\"x\",c", 2) == "c")
  }

  test("csv_column_at: newline inside quotes is data (FIXTURES.md §3)") {
    // expression-level: a quoted \n does not terminate the field
    assert(col("a,\"b\nx\",c", 1) == "\"b\nx\"")
    assert(col("a,\"b\nx\",c", 2) == "c")
    // read-path divergence is documented in PrePartition: line sources
    // split at every \n (same behavior as the reference's Split-mode
    // TextLineParsingSink; the reference's own corpus never emits quoted
    // newlines, templates/script.kql:3-16)
  }

  test("csv_column_at: empty field and trailing field") {
    assert(col("a,,c", 1) == "")
    assert(col("a,b,", 2) == "")
    assert(col("", 0) == "")
  }

  test("csv_column_at: index beyond field count -> null") {
    assert(col("a,b,c", 5) == null)
    assert(col("a", 1) == null)
  }

  test("csv_field_count") {
    assert(CsvUtil.fieldCount(UTF8String.fromString("a,b,c")) == 3)
    assert(CsvUtil.fieldCount(UTF8String.fromString("a,\"b,x\",c")) == 3)
    assert(CsvUtil.fieldCount(UTF8String.fromString("")) == 1)
  }

  test("psv: delimiter-parameterized extraction (Format=psv dimension)") {
    def pcol(line: String, idx: Int): String = {
      val r = CsvUtil.columnAt(UTF8String.fromString(line), idx, '|'.toByte)
      if (r == null) null else r.toString
    }
    assert(pcol("a|b|c", 1) == "b")
    assert(pcol("a|b|c", 3) == null)
    // quoting rules unchanged: pipes inside quotes are data, commas are plain bytes
    assert(pcol("a|\"b|x\"|c", 1) == "\"b|x\"")
    assert(pcol("a,b|c,d", 0) == "a,b")
    assert(CsvUtil.fieldCount(UTF8String.fromString("a|\"b|x\"|c"), '|'.toByte) == 3)
    // SQL surface: 3-arg form, literal-only delimiter
    val row = spark.sql(
      "SELECT csv_column_at('a|b|c', 1, '|') AS f, csv_field_count('a|b|c', '|') AS n")
      .collect()(0)
    assert(row.getString(0) == "b" && row.getInt(1) == 3)
    intercept[Exception] {
      spark.sql("SELECT csv_column_at('a|b', 1, '||')").collect()
    }
  }

  test("xor_fold_hash fixtures (FIXTURES.md §4)") {
    def h(s: String, seed: Int, n: Int): Int =
      HashUtil.xorFoldMod(UTF8String.fromString(s), seed, n)
    assert(h("", 7, 10) == 7)
    assert(h("a", 0, 16) == 1)   // 0x61 % 16
    assert(h("ab", 0, 16) == 3)  // 0x61^0x62 = 0x03
    // "Machine7": xor of bytes M,a,c,h,i,n,e,7 with seed 17
    val expected = ("Machine7".getBytes("UTF-8").foldLeft(17) {
      (acc, b) => acc ^ (b & 0xff)
    }) % 8
    assert(h("Machine7", 17, 8) == expected)
  }

  test("expressions work through codegen on a DataFrame (and in SQL)") {
    val df = Seq("1,2024-01-01,Information,Machine7", "2,2024-01-02,\"Wa,rning\",Machine3")
      .toDF("value")
    val out = df.select(
      GraftFunctions.csvColumnAt($"value", 2).as("level"),
      GraftFunctions.csvFieldCount($"value").as("nf"),
      GraftFunctions.xorFoldHash(GraftFunctions.csvColumnAt($"value", 3), 17, 8).as("pid")
    ).collect()
    assert(out(0).getString(0) == "Information")
    assert(out(1).getString(0) == "\"Wa,rning\"")
    assert(out.forall(_.getInt(1) == 4))
    assert(out(0).getInt(2) == HashUtil.xorFoldMod(UTF8String.fromString("Machine7"), 17, 8))

    df.createOrReplaceTempView("csv_lines")
    val viaSql = spark.sql(
      "SELECT csv_column_at(value, 2) AS level, xor_fold_hash(csv_column_at(value, 3), 17, 8) AS pid FROM csv_lines")
      .collect()
    assert(viaSql(0).getString(0) == "Information")
  }

  test("xor_fold_hash: null input hashes to seed % n") {
    val out = Seq(("x")).toDF("v")
      .select(GraftFunctions.xorFoldHash(lit(null).cast("string"), 7, 10).as("h"))
      .collect()
    assert(out(0).getInt(0) == 7)
  }
}
