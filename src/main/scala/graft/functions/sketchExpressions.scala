package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types._

/** `min_hash(tokens, k)` — k-permutation MinHash signature (array<bigint>)
  * of a string-array column, one pass (Kirsch-Mitzenmacher double hashing).
  * The signature estimates Jaccard similarity: matching positions / k.
  */
case class MinHashSig(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "min_hash"

  override protected def nullSafeEval(tokens: Any, k: Any): Any =
    SketchUtil.minHash(tokens.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k) => s"graft.functions.SketchUtil.minHash($t, $k)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `sim_hash(tokens)` — 64-bit SimHash (bigint) of a string-array column.
  * Hamming-close hashes ⇒ similar token bags.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sim_hash"

  override protected def nullSafeEval(tokens: Any): Any =
    SketchUtil.simHash(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.SketchUtil.simHash($t)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `word_shingles(text, n)` — distinct n-word shingles (array<string>) of a
  * whitespace-tokenized text column, first-occurrence order. Single-pass
  * kernel; see SketchUtil.wordShingles for the exact tokenization contract.
  */
case class WordShingles(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(text: Any, n: Any): Any =
    SketchUtil.wordShingles(
      text.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) => s"graft.functions.SketchUtil.wordShingles($t, $n)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `token_count(text)` — whitespace-token count (int), identical to
  * `size(split(trim(text), "\s+", -1))` but one byte-level pass with no
  * array materialization. See SketchUtil.tokenCount for the contract.
  */
case class TokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_count"

  override protected def nullSafeEval(text: Any): Any =
    SketchUtil.tokenCount(
      text.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.SketchUtil.tokenCount($t)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `pair_encode(ids)` — every unordered pair of a bigint-array column, as
  * `array<struct<a, b>>` with `a <= b` per pair (full 64-bit id range —
  * no 2^32 ceiling). Feeds bucket-local pair generation in the dedup
  * family; see SketchUtil.pairEncode.
  */
case class PairEncode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pair_encode"

  override protected def nullSafeEval(ids: Any): Any =
    SketchUtil.pairEncode(ids.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.SketchUtil.pairEncode($t)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SketchFunctions {
  import org.apache.spark.sql.functions.lit

  def tokenCount(text: Column): Column =
    Shims.column(TokenCount(Shims.expression(text)))

  def pairEncode(ids: Column): Column =
    Shims.column(PairEncode(Shims.expression(ids)))

  def minHash(tokens: Column, k: Int): Column =
    Shims.column(MinHashSig(Shims.expression(tokens), Shims.expression(lit(k))))

  def simHash(tokens: Column): Column =
    Shims.column(SimHash64(Shims.expression(tokens)))

  def wordShingles(text: Column, n: Int): Column =
    Shims.column(WordShingles(Shims.expression(text), Shims.expression(lit(n))))
}
