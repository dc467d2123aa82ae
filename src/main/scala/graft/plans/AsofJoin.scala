package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types.{DateType, IntegerType, LongType, TimestampNTZType, TimestampType}

/** Native AS-OF join — the whole-operator Catalyst extension (SURVEY §7.2
  * preference (c): LogicalPlan + Strategy + SparkPlan, injected via
  * `SparkSessionExtensions`/`experimental.extraStrategies`).
  *
  * Spark has no as-of join; the composed form (q26: union both sides,
  * `last(value, ignoreNulls)` over a (key, time) window) carries every
  * right PAYLOAD column through the union and the window's sort buffer.
  * This operator instead merges the two sides in ONE forward pass per
  * partition: both children hash-partition on the key and sort by
  * (key, time) — the same exchange the window form pays — but the merge
  * keeps exactly ONE candidate right row in memory (no window buffer, no
  * union superset), and emits left rows joined to the latest right row
  * with `right.time <= left.time` (inclusive, LEFT-outer semantics:
  * unmatched left rows get nulls — DuckDB's `ASOF LEFT JOIN ... ON
  * l.key = r.key AND l.time >= r.time` exactly).
  *
  * Scope (documented, checked at construction): the key must be an
  * integral type and the time integral-backed (timestamp/date/int/long) —
  * covers the engine's event/order shapes without generic-ordering
  * machinery in the hot loop.
  */
case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute,
    rightValues: Seq[Attribute]) extends BinaryNode {
  AsofJoin.requireIntegral(leftKey, rightKey, leftTime, rightTime)
  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): AsofJoinPlan = copy(left = l, right = r)
}

/** Planner rule: AsofJoinPlan → AsofJoinExec. */
object AsofStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, lt, rk, rt, rv) =>
      AsofJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, rv) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute,
    rightValues: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  // EnsureRequirements co-partitions the children on the keys and sorts
  // each partition by (key, time) — identical exchanges to a sort-merge
  // join on the key
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)) ::
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) :: Nil
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey: Expression, left.output)
    val lt = BindReferences.bindReference(leftTime: Expression, left.output)
    val rk = BindReferences.bindReference(rightKey: Expression, right.output)
    val rt = BindReferences.bindReference(rightTime: Expression, right.output)
    val rvSchema = rightValues
    val rOut = right.output
    val outSchema = output
    val leftOut = left.output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val valueProj = UnsafeProjection.create(rvSchema, rOut)
      // bind against NULLABLE-marked right values: binding against the
      // original non-null attrs would elide the null check and read 0/0.0
      // out of the all-null unmatched row
      val resultProj = UnsafeProjection.create(outSchema,
        leftOut ++ rvSchema.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rvSchema.length)
      val joined = new JoinedRow
      def longOf(e: Expression, row: InternalRow): Long =
        e.eval(row) match { case i: Int => i.toLong; case l: Long => l }
      new Iterator[InternalRow] {
        private var rNext: InternalRow =
          if (rIter.hasNext) rIter.next() else null
        private var candidate: InternalRow = null // copied; latest match
        private var candidateKey = 0L
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val key = longOf(lk, l)
          val time = longOf(lt, l)
          // advance the right side through every row at-or-before (key, time)
          while (rNext != null && {
            val k = longOf(rk, rNext)
            k < key || (k == key && longOf(rt, rNext) <= time)
          }) {
            if (longOf(rk, rNext) == key) {
              // latest-so-far for this key; .copy() — the child iterator
              // reuses its row buffer
              candidate = valueProj(rNext).copy()
              candidateKey = key
            }
            rNext = if (rIter.hasNext) rIter.next() else null
          }
          val matched = candidate != null && candidateKey == key
          resultProj(joined(l, if (matched) candidate else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): AsofJoinExec = copy(left = l, right = r)
}

/** DataFrame-level API + strategy registration. */
object AsofJoin {
  private[plans] def requireIntegral(keys: Attribute*): Unit = keys.foreach { a =>
    require(Seq(LongType, IntegerType, TimestampType, TimestampNTZType,
      DateType).contains(a.dataType),
      s"asof join: ${a.name} must be integral-backed, got ${a.dataType}")
  }

  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsofStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofStrategy

  /** Left as-of join: for each left row, the latest right row of the same
    * `key` with `right.time <= left.time` (nulls when none). `valueCols`
    * are the right columns carried into the output.
    */
  def joinAsof(leftDf: DataFrame, rightDf: DataFrame,
               key: String, time: String,
               valueCols: Seq[String]): DataFrame = {
    val spark = leftDf.sparkSession
    register(spark)
    val lp = leftDf.queryExecution.analyzed
    val rp = rightDf.queryExecution.analyzed
    def att(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"asof join: no column '$name' in ${plan.output.map(_.name)}"))
    Shims.ofRows(spark, AsofJoinPlan(lp, rp,
      att(lp, key), att(lp, time), att(rp, key), att(rp, time),
      valueCols.map(att(rp, _))))
  }
}
