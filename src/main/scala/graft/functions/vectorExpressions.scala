package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
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

object VectorFunctions {
  import org.apache.spark.sql.functions.lit

  def vecDot(a: Column, b: Column): Column =
    Shims.column(VecDot(Shims.expression(a), Shims.expression(b)))

  def vecCosine(a: Column, b: Column): Column =
    Shims.column(VecCosine(Shims.expression(a), Shims.expression(b)))

  def hyperplaneSig(emb: Column, planes: Int): Column =
    Shims.column(HyperplaneSig(Shims.expression(emb), Shims.expression(lit(planes))))
}
