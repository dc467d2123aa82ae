package graft

import graft.operators.Export
import graft.sources.LogDataGenerator
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** B9 export + B10 DDL surface. */
class ExportDdlSpec extends GraftSparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft-export").toString

  test("B9: single-file csv export with headers") {
    val df = LogDataGenerator.generate(spark, 200)
    Export.toCsv(df, s"$tmp/exp1", includeHeaders = true)
    val files = new java.io.File(s"$tmp/exp1").listFiles()
      .filter(_.getName.endsWith(".csv"))
    assert(files.length == 1) // distribution="single"
    val back = spark.read.option("header", true).csv(s"$tmp/exp1")
    assert(back.count() == 200)
    assert(back.columns.toSeq == df.columns.toSeq)
  }

  test("B9: compressed export with size limit splits into multiple files") {
    // coalesce(1): without the size limit this would be ONE output file,
    // so every extra file is attributable to sizeLimitBytes alone
    val df = LogDataGenerator.generate(spark, 2000).coalesce(1)
    Export.toCsv(df, s"$tmp/exp2", includeHeaders = false, compressed = true,
      sizeLimitBytes = Some(8 * 1024), single = false)
    val files = new java.io.File(s"$tmp/exp2").listFiles()
      .filter(_.getName.endsWith(".csv.gz"))
    assert(files.length > 1, s"size limit did not split: ${files.length} file(s)")
    assert(spark.read.csv(s"$tmp/exp2").count() == 2000)
    // control: same single-partition frame without a limit -> one file
    Export.toCsv(df, s"$tmp/exp2nolimit", includeHeaders = false,
      compressed = true, sizeLimitBytes = None, single = false)
    val control = new java.io.File(s"$tmp/exp2nolimit").listFiles()
      .filter(_.getName.endsWith(".csv.gz"))
    assert(control.length == 1)
  }

  test("jsonl export round-trips and size limit splits files") {
    val df = LogDataGenerator.generate(spark, 500).coalesce(1)
    Export.toJsonl(df, s"$tmp/expj", single = true)
    val files = new java.io.File(s"$tmp/expj").listFiles()
      .filter(_.getName.endsWith(".json"))
    assert(files.length == 1)
    val back = spark.read.json(s"$tmp/expj")
    assert(back.count() == 500)
    assert(back.columns.sorted.toSeq == df.columns.sorted.toSeq)
    // split under a byte bound (every extra file attributable to the limit)
    Export.toJsonl(df, s"$tmp/expj2", compressed = true,
      sizeLimitBytes = Some(8 * 1024))
    val parts = new java.io.File(s"$tmp/expj2").listFiles()
      .filter(_.getName.endsWith(".json.gz"))
    assert(parts.length > 1, s"size limit did not split: ${parts.length}")
    assert(spark.read.json(s"$tmp/expj2").count() == 500)
  }

  test("B10: DDL — create table, CTAS limit 0, drop if exists") {
    spark.sql("DROP TABLE IF EXISTS t_landing")
    // .create table T(Text:string)
    spark.sql("CREATE TABLE t_landing (Text STRING) USING parquet")
    assert(spark.table("t_landing").schema.fieldNames.toSeq == Seq("Text"))
    // .set T <| F() | take 0  (CTAS-empty from a generator query)
    spark.sql("DROP TABLE IF EXISTS t_typed")
    LogDataGenerator.generate(spark, 10).limit(0)
      .write.saveAsTable("t_typed")
    assert(spark.table("t_typed").count() == 0)
    assert(spark.table("t_typed").schema.fieldNames.length == 6)
    // drop ifexists
    spark.sql("DROP TABLE IF EXISTS t_landing")
    spark.sql("DROP TABLE IF EXISTS t_typed")
    spark.sql("DROP TABLE IF EXISTS t_never_existed")
    assert(!spark.catalog.tableExists("t_landing"))
  }
}
