package graft

import graft.functions.{CsvColumnAt, CsvFieldCount, RollingHash, XorFoldHash}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Catalyst injection point: register the graft expressions on every session
  * via `--conf spark.sql.extensions=graft.GraftExtensions` — the idiomatic
  * cluster deployment (no driver-side register() call needed; executors and
  * Thrift/Connect sessions all see the functions). `GraftFunctions.register`
  * remains the programmatic equivalent for embedded use.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("csv_column_at"),
      info("csv_column_at", "_FUNC_(line, idx) - raw CSV field slice (reference dialect)"),
      (exprs: Seq[Expression]) => CsvColumnAt(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("csv_field_count"),
      info("csv_field_count", "_FUNC_(line) - field count under the reference dialect"),
      (exprs: Seq[Expression]) => CsvFieldCount(exprs.head)))
    ext.injectFunction((FunctionIdentifier("xor_fold_hash"),
      info("xor_fold_hash", "_FUNC_(value, seed, n) - reference partition hash"),
      (exprs: Seq[Expression]) => XorFoldHash(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction((FunctionIdentifier("rolling_hash"),
      info("rolling_hash", "_FUNC_(value) - Karp-Rabin polynomial fingerprint"),
      (exprs: Seq[Expression]) => RollingHash(exprs.head)))
  }
}
