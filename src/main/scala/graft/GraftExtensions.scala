package graft

import graft.functions.{CsvColumnAt, CsvFieldCount, HyperplaneSig, MinHashSig, MisraGriesAgg, PairEncode, PqAdcDot, PqEncode, RollingHash, SimHash64, TokenCount, VecCosine, VecDot, WordShingles, XorFoldHash}
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
    // whole-operator extension: the native as-of join physical strategy
    ext.injectPlannerStrategy(_ => graft.plans.AsofStrategy)
    // composed union+window as-of idiom -> AsofJoinPlan, for free
    ext.injectOptimizerRule(_ => graft.plans.AsofRewrite)
    // linear recursive CTE (UnionLoop) -> pointer doubling
    ext.injectPlannerStrategy(_ => graft.plans.HierarchyDoublingStrategy)
    ext.injectOptimizerRule(_ => graft.plans.RecursionDoubling)
    ext.injectFunction((FunctionIdentifier("csv_column_at"),
      info("csv_column_at", "_FUNC_(line, idx[, delim]) - raw CSV-family field slice (reference dialect)"),
      (exprs: Seq[Expression]) =>
        if (exprs.size >= 3) CsvColumnAt(exprs(0), exprs(1),
          graft.functions.GraftFunctions.delimOf(exprs(2), "csv_column_at"))
        else CsvColumnAt(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("csv_field_count"),
      info("csv_field_count", "_FUNC_(line[, delim]) - field count under the reference dialect"),
      (exprs: Seq[Expression]) =>
        if (exprs.size >= 2) CsvFieldCount(exprs.head,
          graft.functions.GraftFunctions.delimOf(exprs(1), "csv_field_count"))
        else CsvFieldCount(exprs.head)))
    ext.injectFunction((FunctionIdentifier("xor_fold_hash"),
      info("xor_fold_hash", "_FUNC_(value, seed, n) - reference partition hash"),
      (exprs: Seq[Expression]) => XorFoldHash(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction((FunctionIdentifier("rolling_hash"),
      info("rolling_hash", "_FUNC_(value) - Karp-Rabin polynomial fingerprint"),
      (exprs: Seq[Expression]) => RollingHash(exprs.head)))
    ext.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", "_FUNC_(text, n) - distinct n-word shingles"),
      (exprs: Seq[Expression]) => WordShingles(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "_FUNC_(shingles, k) - k-element MinHash signature"),
      (exprs: Seq[Expression]) => MinHashSig(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "_FUNC_(tokens) - 64-bit SimHash fingerprint"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    ext.injectFunction((FunctionIdentifier("token_count"),
      info("token_count", "_FUNC_(text) - whitespace token count"),
      (exprs: Seq[Expression]) => TokenCount(exprs.head)))
    ext.injectFunction((FunctionIdentifier("pair_encode"),
      info("pair_encode", "_FUNC_(ids) - packed unordered id pairs"),
      (exprs: Seq[Expression]) => PairEncode(exprs.head)))
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "_FUNC_(a, b) - float-vector dot product"),
      (exprs: Seq[Expression]) => VecDot(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("vec_cosine"),
      info("vec_cosine", "_FUNC_(a, b) - float-vector cosine similarity"),
      (exprs: Seq[Expression]) => VecCosine(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("hyperplane_sig"),
      info("hyperplane_sig", "_FUNC_(vec, planes) - hyperplane LSH signature"),
      (exprs: Seq[Expression]) => HyperplaneSig(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("pq_encode"),
      info("pq_encode", "_FUNC_(vec, codebook, subspaces) - product-quantization codes"),
      (exprs: Seq[Expression]) => PqEncode(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction((FunctionIdentifier("pq_adc_dot"),
      info("pq_adc_dot",
        "_FUNC_(query, codes, codebook, subspaces) - asymmetric PQ inner product"),
      (exprs: Seq[Expression]) => PqAdcDot(exprs(0), exprs(1), exprs(2), exprs(3))))
    ext.injectFunction((FunctionIdentifier("misra_gries"),
      info("misra_gries",
        "_FUNC_(col, k) - Misra-Gries heavy-hitter candidate aggregate"),
      (exprs: Seq[Expression]) => MisraGriesAgg(exprs.head,
        exprs(1).eval(null).asInstanceOf[Int]).toAggregateExpression()))
  }
}
