package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types._

/** Vector kernels shared by interpreted eval and generated code. Inputs
  * are typed array<float> (ExpectsInputTypes -> analysis-time error on
  * anything else); a length mismatch folds over the common prefix —
  * callers with heterogeneous dims must align upstream. All folds
  * are double-of-float products summed LEFT-TO-RIGHT from 0.0 — bit-
  * identical to the `zip_with`+`aggregate` trees they replace AND to the
  * DuckDB oracle's `list_reduce` (VectorQueries' parity discipline), so
  * swapping the implementations cannot change a hash-compared result.
  */
object VectorUtil {

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def cosine(a: ArrayData, b: ArrayData): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  /** Deterministic pseudo-random hyperplanes: Rademacher ±1 entries drawn
    * from xxhash64(p << 32 | d) — mutually independent across planes, unlike
    * the lattice-correlated sin(p*a + d*b) formula this replaced (adjacent
    * sin planes share phase structure, collapsing the effective plane count
    * and the LSH's recall). Cached per (planes, dim) so generated code pays
    * one array lookup per plane.
    */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def planes(nPlanes: Int, dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((nPlanes, dim), { case (p, d) =>
      import org.apache.spark.sql.catalyst.expressions.XXH64
      Array.tabulate(p, d)((pp, dd) =>
        if ((XXH64.hashLong((pp.toLong << 32) | dd.toLong, 0x517cc1b7L) & 1L) == 0L)
          1.0 else -1.0)
    })

  /** Packed sign-bit signature of `emb` against `nPlanes` hyperplanes. */
  def hyperplaneSig(emb: ArrayData, nPlanes: Int): Long = {
    val dim = emb.numElements()
    val ps = planes(nPlanes, dim)
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      val plane = ps(p)
      var acc = 0.0
      var i = 0
      while (i < dim) {
        acc += emb.getFloat(i).toDouble * plane(i)
        i += 1
      }
      if (acc >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** PQ codes: for each of `subspaces` contiguous subvectors, the index of
    * the squared-L2-nearest codebook entry. Codebook layout is flat
    * row-major [subspace][code][component]; d = dim/subspaces and
    * C = cb.len/(subspaces*d) are derived. Strict `<` keeps the first
    * (lowest-code) minimum; component fold is ascending in double.
    */
  def pqEncode(vec: ArrayData, cb: ArrayData, subspaces: Int): ArrayData = {
    val d = vec.numElements() / subspaces
    val nCodes = cb.numElements() / (subspaces * d)
    val codes = new Array[Any](subspaces)
    var s = 0
    while (s < subspaces) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < nCodes) {
        var acc = 0.0
        var i = 0
        while (i < d) {
          val diff = vec.getFloat(s * d + i).toDouble -
            cb.getFloat((s * nCodes + c) * d + i).toDouble
          acc += diff * diff
          i += 1
        }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  /** ADC inner product: query (full precision) against a PQ-coded vector —
    * sum over subspaces of dot(query subvector, coded centroid).
    * Accumulation subspace-ascending, component-ascending, in double.
    */
  def pqAdcDot(q: ArrayData, codes: ArrayData, cb: ArrayData,
               subspaces: Int): Double = {
    val d = q.numElements() / subspaces
    val nCodes = cb.numElements() / (subspaces * d)
    var acc = 0.0
    var s = 0
    while (s < subspaces) {
      val code = codes.getInt(s)
      var i = 0
      while (i < d) {
        acc += q.getFloat(s * d + i).toDouble *
          cb.getFloat((s * nCodes + code) * d + i).toDouble
        i += 1
      }
      s += 1
    }
    acc
  }
}

/** `vec_dot(a, b)` — double dot product of two array<float> columns. */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.Shims.AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorUtil.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorUtil.dot($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `vec_cosine(a, b)` — cosine similarity of two array<float> columns. */
case class VecCosine(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.Shims.AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorUtil.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorUtil.cosine($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `hyperplane_sig(emb, planes)` — packed sign-bit LSH signature. */
case class HyperplaneSig(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.Shims.AbstractDataType] =
    Seq(ArrayType(FloatType), IntegerType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_sig"

  override protected def nullSafeEval(emb: Any, p: Any): Any =
    VectorUtil.hyperplaneSig(emb.asInstanceOf[ArrayData], p.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (e, p) => s"graft.functions.VectorUtil.hyperplaneSig($e, $p)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `pq_encode(vec, codebook, subspaces)` — product-quantization codes
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011): the vector splits into `subspaces` contiguous subvectors;
  * each maps to the index of its squared-L2-nearest codebook entry.
  * Codebook is a flat row-major [subspace][code][component] array<float>
  * literal (constant-folded — one reference per row, not re-built).
  * Ties break to the LOWEST code (strict `<` keeps the first minimum) —
  * the oracle's `ORDER BY d2, c` mirror.
  */
case class PqEncode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[Shims.AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType), IntegerType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(vec: Any, cb: Any, s: Any): Any =
    VectorUtil.pqEncode(vec.asInstanceOf[ArrayData],
      cb.asInstanceOf[ArrayData], s.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, c, s) => s"graft.functions.VectorUtil.pqEncode($v, $c, $s)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** `pq_adc_dot(query, codes, codebook, subspaces)` — asymmetric distance
  * computation: the query stays full-precision, the database vector is
  * represented by its PQ codes; the approximate inner product is the sum
  * of per-subspace dots against the coded centroid. Accumulation is
  * subspace-ascending then component-ascending, in double — the same
  * left-to-right fold the oracle's ordered list_reduce performs.
  */
case class PqAdcDot(first: Expression, second: Expression,
                    third: Expression, fourth: Expression)
    extends QuaternaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[Shims.AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(IntegerType), ArrayType(FloatType),
      IntegerType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc_dot"

  override protected def nullSafeEval(q: Any, codes: Any, cb: Any, s: Any): Any =
    VectorUtil.pqAdcDot(q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData],
      cb.asInstanceOf[ArrayData], s.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (q, co, c, s) => s"graft.functions.VectorUtil.pqAdcDot($q, $co, $c, $s)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

object VectorFunctions {
  import org.apache.spark.sql.functions.lit

  def vecDot(a: Column, b: Column): Column =
    Shims.column(VecDot(Shims.expression(a), Shims.expression(b)))

  def vecCosine(a: Column, b: Column): Column =
    Shims.column(VecCosine(Shims.expression(a), Shims.expression(b)))

  def hyperplaneSig(emb: Column, planes: Int): Column =
    Shims.column(HyperplaneSig(Shims.expression(emb), Shims.expression(lit(planes))))

  def pqEncode(vec: Column, codebook: Column, subspaces: Int): Column =
    Shims.column(PqEncode(Shims.expression(vec), Shims.expression(codebook),
      Shims.expression(lit(subspaces))))

  def pqAdcDot(query: Column, codes: Column, codebook: Column,
               subspaces: Int): Column =
    Shims.column(PqAdcDot(Shims.expression(query), Shims.expression(codes),
      Shims.expression(codebook), Shims.expression(lit(subspaces))))
}
