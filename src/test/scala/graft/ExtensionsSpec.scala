package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.graft.Shims

/** The spark.sql.extensions injection path: GraftExtensions registers every
  * custom function on a fresh registry (what session construction does with
  * `--conf spark.sql.extensions=graft.GraftExtensions`), and the functions
  * evaluate correctly through SQL.
  */
class ExtensionsSpec extends GraftSparkSpec {

  test("GraftExtensions registers all custom functions") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val registry = spark.sessionState.functionRegistry.clone()
    Seq("csv_column_at", "csv_field_count", "xor_fold_hash", "rolling_hash")
      .foreach(f => registry.dropFunction(FunctionIdentifier(f)))
    Shims.applyExtensionFunctions(ext, registry)
    Seq("csv_column_at", "csv_field_count", "xor_fold_hash", "rolling_hash")
      .foreach(f => assert(registry.functionExists(FunctionIdentifier(f)), f))
  }

  test("custom functions evaluate through SQL") {
    val r = spark.sql(
      """SELECT csv_column_at('a,"b,c",d', 1) AS f,
        |  csv_field_count('a,"b,c",d') AS n,
        |  xor_fold_hash('Machine7', 17, 8) AS pid,
        |  rolling_hash('abc') AS rh""".stripMargin).head()
    assert(r.getString(0) == "\"b,c\"")
    assert(r.getInt(1) == 3)
    var h = 17; "Machine7".getBytes.foreach(b => h = h ^ (b & 0xff))
    assert(r.getInt(2) == h % 8)
    var rh = 0L; "abc".getBytes.foreach(b => rh = (rh * 31 + (b & 0xff)) % 1000000007L)
    assert(r.getLong(3) == rh)
  }
}
