package graft.plans

import org.apache.spark.SparkException
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Add, Alias, Attribute, AttributeSet, EqualTo, Expression, Greatest, IsNotNull, Least}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LeafNode, LogicalPlan, Project, UnionLoop, UnionLoopRef}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Shims

/** Optimizer rule: recognize a LINEAR recursive CTE (`WITH RECURSIVE`
  * whose recursive term derives each new row from exactly ONE recursive
  * row equi-joined to a static relation, with additively-accumulating
  * columns — the hierarchy-traversal shape) and rewrite Spark's
  * `UnionLoop` to a pointer-doubling plan.
  *
  * Why: UnionLoop executes ONE sequential join per LEVEL — wall time
  * scales with hierarchy DEPTH regardless of per-level row volume, and
  * it retains every level's shuffle files. Pointer doubling resolves
  * the same forest in ceil(log2 depth) self-joins — measured 119.9×
  * (13.8 s vs 1659.6 s on a 5000-deep × 200-wide chain,
  * `tools/RecursionScale`, SCALE.md) — because round k covers 2^k hops.
  *
  * Matched shape (all conditions REQUIRED; anything else leaves the
  * plan untouched — the rule can only upgrade, never break):
  *
  * {{{
  *   WITH RECURSIVE r AS (
  *     <anchor>                                   -- any static plan
  *     UNION ALL
  *     SELECT s.key, r.c1 + e1(s), r.c2 + e2(s), ...
  *     FROM static s JOIN r ON r.key = h(s)       -- one equi-join
  *     [WHERE p(s)]                               -- static-side only
  *   )
  * }}}
  *
  * i.e. after optimization: `Project` over an Inner `Join` of a static
  * subplan (no UnionLoopRef inside, all expressions deterministic) with
  * the loop's own `UnionLoopRef` (non-accumulated), whose condition is
  * `refKey = h(static)`, and whose projection has exactly one column
  * sourced purely from the static side (the NEW key) with every other
  * column at the SAME position being one of the three PATH MONOIDS —
  * `refCol + e(static)` (`Add`), `greatest(refCol, e(static)...)`, or
  * `least(refCol, e(static)...)` — or a plain carry-through. The
  * accumulation must be associative along the path for
  * segment-composition to be sound; sums, path-max and path-min are
  * (greatest/least are also null-skipping IDENTICALLY in the level and
  * segment forms, so nulls compose), string concat / multiplication
  * are not matched. `UnionLoop.limit` set (a pushed LIMIT) bails out:
  * limit semantics depend on level order, which doubling does not
  * reproduce.
  *
  * Execution (`HierarchyDoublingExec`) handles the data-dependent parts
  * the plan cannot know statically:
  *   - child keys must be UNIQUE (a DAG/multi-parent node multiplies
  *     rows per PATH in the original — doubling would compose counts
  *     multiplicatively); checked at runtime, falls back to faithful
  *     level-at-a-time iteration when violated;
  *   - an anchor key appearing as a CHILD in the static relation means
  *     interior anchors (a node can be reached both as an anchor and as
  *     a descendant, so UNION ALL emits it twice) — same fallback;
  *   - the recursion limits (`spark.sql.cteRecursionLevelLimit` /
  *     `cteRecursionRowLimit`) are enforced on BOTH paths, so a
  *     hierarchy the original would reject still errors (doubling
  *     computes depth cheaply and checks it after the fact).
  *
  * Disable with `spark.graft.recursionDoubling.enabled=false` (specs
  * measuring the UnionLoop form itself, and RecursionScale's cte arm).
  */
object RecursionDoubling extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.recursionDoubling.enabled", "true")
        .toBoolean) plan
    else plan.transformUp {
      case loop: UnionLoop => rewrite(loop).getOrElse(loop)
    }

  private def unalias(e: Expression): Expression = e match {
    case Alias(c, _) => unalias(c)
    case other => other
  }

  private def rewrite(loop: UnionLoop): Option[LogicalPlan] = {
    if (loop.limit.isDefined || loop.maxDepth.isDefined) return None
    val (projList, join) = loop.recursion match {
      case Project(list, j: Join) => (list, j)
      case _ => return None
    }
    if (join.joinType != Inner || join.condition.isEmpty) return None
    // the optimizer infers `isnotnull(refKey)` above the ref from the
    // join condition (InferFiltersFromConstraints) — semantics-neutral
    // (a null key never equi-joins), so unwrap it; any OTHER predicate
    // over the recursive side would prune mid-chain and is not matched
    def unwrapRef(p: LogicalPlan): Option[(UnionLoopRef, Seq[Attribute])] =
      p match {
        case r: UnionLoopRef => Some((r, Nil))
        case Filter(cond, r: UnionLoopRef) =>
          val conjuncts = cond match {
            case and: org.apache.spark.sql.catalyst.expressions.And =>
              Seq(and.left, and.right)
            case single => Seq(single)
          }
          val attrs = conjuncts.map {
            case IsNotNull(a: Attribute) => a
            case _ => return None
          }
          Some((r, attrs))
        case _ => None
      }
    val (static, ref, nnAttrs) = (join.left, join.right) match {
      case (s, u) if unwrapRef(u).exists(r =>
          r._1.loopId == loop.id && !r._1.accumulated) =>
        val (r, nn) = unwrapRef(u).get; (s, r, nn)
      case (u, s) if unwrapRef(u).exists(r =>
          r._1.loopId == loop.id && !r._1.accumulated) =>
        val (r, nn) = unwrapRef(u).get; (s, r, nn)
      case _ => return None
    }
    // the static side must be genuinely static (no second recursive
    // reference) and deterministic (the doubling re-evaluates it)
    if (static.collectFirst { case r: UnionLoopRef => r }.isDefined)
      return None
    if (static.exists(_.expressions.exists(e =>
        e.exists(!_.deterministic)))) return None

    val staticOut = AttributeSet(static.output)
    val refOut = ref.output // positionally aligned with loop.output
    val refSet = AttributeSet(refOut)

    val (refKeyAttr, parentKey) = join.condition.get match {
      case EqualTo(a: Attribute, e)
          if refSet.contains(a) && e.references.subsetOf(staticOut) =>
        (a, e)
      case EqualTo(e, a: Attribute)
          if refSet.contains(a) && e.references.subsetOf(staticOut) =>
        (a, e)
      case _ => return None
    }
    val keyPos = refOut.indexWhere(_.exprId == refKeyAttr.exprId)
    if (keyPos < 0 || projList.length != refOut.length) return None
    // any unwrapped isnotnull must be on the join key itself — a
    // not-null constraint on a non-key recursive column is a real
    // filter, not the inferred artifact
    if (nnAttrs.exists(_.exprId != refKeyAttr.exprId)) return None

    var childKey: Expression = null
    val deltas = Seq.newBuilder[(Int, Expression, String)]
    val carries = Seq.newBuilder[Int]
    projList.zipWithIndex.foreach { case (ne, i) =>
      val e = unalias(ne)
      if (i == keyPos) {
        if (!e.references.subsetOf(staticOut)) return None
        childKey = e
      } else {
        val refAttr = refOut(i)
        // greatest/least are variadic: match when EXACTLY one child is
        // the recursive column and every other child is static (the
        // extra statics fold into one delta — greatest(r.c, a, b) ==
        // greatest(r.c, greatest(a, b)))
        def monoid(kids: Seq[Expression],
                   rebuild: Seq[Expression] => Expression,
                   kind: String): Boolean = {
          val (refKids, rest) = kids.partition {
            case a: Attribute => a.exprId == refAttr.exprId
            case _ => false
          }
          val ok = refKids.size == 1 && rest.nonEmpty &&
            rest.forall(_.references.subsetOf(staticOut))
          if (ok) deltas +=
            ((i, if (rest.size == 1) rest.head else rebuild(rest), kind))
          ok
        }
        e match {
          // pass-through (e.g. carrying the root id): constant along
          // the path, so it resolves to the anchor row's value
          case a: Attribute if a.exprId == refAttr.exprId =>
            carries += i
          case Add(a: Attribute, d, _)
              if a.exprId == refAttr.exprId &&
                d.references.subsetOf(staticOut) =>
            deltas += ((i, d, "add"))
          case Add(d, a: Attribute, _)
              if a.exprId == refAttr.exprId &&
                d.references.subsetOf(staticOut) =>
            deltas += ((i, d, "add"))
          case g: Greatest if monoid(g.children, Greatest(_), "greatest") =>
          case l: Least if monoid(l.children, Least(_), "least") =>
          case _ => return None
        }
      }
    }
    if (childKey == null || !childKey.deterministic ||
      !parentKey.deterministic) return None
    Some(HierarchyDoublingPlan(
      loop.output, loop.anchor, static, keyPos, childKey, parentKey,
      deltas.result(), carries.result()))
  }
}

/** The rewritten linear recursion: a leaf capturing the anchor and
  * static subplans (they are executed as sub-queries by the exec, not
  * planned as children — the iterative doubling needs per-round
  * materialization no static DAG can express).
  */
case class HierarchyDoublingPlan(
    loopOutput: Seq[Attribute],
    anchor: LogicalPlan,
    static: LogicalPlan,
    keyPos: Int,
    childKey: Expression,
    parentKey: Expression,
    deltas: Seq[(Int, Expression, String)], // (position, per-hop expr, add|greatest|least)
    carries: Seq[Int]) extends LeafNode {
  override def output: Seq[Attribute] = loopOutput
  override def innerChildren: Seq[LogicalPlan] = Seq(anchor, static)
}

object HierarchyDoublingStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: HierarchyDoublingPlan =>
      HierarchyDoublingExec(p.loopOutput, p) :: Nil
    case _ => Nil
  }
}

/** Executes the doubling: per-round localCheckpoint materialization
  * (exactly the Graph.rootsAndDepth discipline), early exit when no
  * pointer advanced, and the runtime soundness checks + level/row limit
  * enforcement documented on [[RecursionDoubling]].
  */
/** `plan` is @transient: the physical tree serializes into task
  * closures, and the captured LOGICAL subplans (constraint caches etc.)
  * are not serializable — nor needed off the driver: doExecute drives
  * everything driver-side and hands parents an already-materialized
  * lineage.
  */
case class HierarchyDoublingExec(loopOutput: Seq[Attribute],
    @transient plan: HierarchyDoublingPlan) extends LeafExecNode {

  override def output: Seq[Attribute] = loopOutput

  /** Segment composition / anchor fold for one accumulator column —
    * the per-kind monoid op (sums add, path-max/min select).
    */
  private def comb(kind: String)(a: Column, b: Column): Column = kind match {
    case "add"      => a + b
    case "greatest" => greatest(a, b)
    case "least"    => least(a, b)
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val spark = session
    val sconf = spark.sessionState.conf
    val levelLimit = sconf
      .getConfString("spark.sql.cteRecursionLevelLimit", "100").toInt
    val rowLimit = sconf
      .getConfString("spark.sql.cteRecursionRowLimit", "1000000").toLong
    val idx = plan.loopOutput.indices
    val keyPos = plan.keyPos

    val anchorDf = Shims.ofRows(spark, plan.anchor)
      .toDF(idx.map(i => s"_gr_a$i"): _*).localCheckpoint()
    val staticDf = Shims.ofRows(spark, plan.static)
    // parents relation: (child node, parent pointer, per-hop deltas)
    val p = staticDf.select(
        Shims.column(plan.childKey).as("_gr_node") +:
        Shims.column(plan.parentKey).as("_gr_anc") +:
        plan.deltas.map { case (i, e, _) => Shims.column(e).as(s"_gr_d$i") }: _*)
      .localCheckpoint()

    val hasDupChild = !p.groupBy("_gr_node").agg(count(lit(1)).as("_gr_c"))
      .filter(col("_gr_c") > 1).isEmpty
    val anchorAsChild = !p.join(
      anchorDf.select(col(s"_gr_a$keyPos").as("_gr_node")),
      Seq("_gr_node"), "left_semi").isEmpty

    val result: DataFrame =
      if (hasDupChild || anchorAsChild) levelIterate(
        anchorDf, staticDf, levelLimit, rowLimit)
      else doubling(anchorDf, p, levelLimit, rowLimit)
    result.queryExecution.toRdd
  }

  /** ceil(log2)-round pointer doubling over the (unique-child, pure-root
    * -anchor) forest. Roots freeze naturally: a pointer at a node absent
    * from the parents relation finds no match and stops advancing.
    */
  private def doubling(anchorDf: DataFrame, p: DataFrame,
                       levelLimit: Int, rowLimit: Long): DataFrame = {
    val idx = plan.loopOutput.indices
    val keyPos = plan.keyPos
    var f = p.withColumn("_gr_hop", lit(1L)).localCheckpoint()
    val total = f.count()
    val maxRounds =
      64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, total))
    var moved = 1L
    var round = 0
    while (moved > 0 && round < maxRounds) {
      val b = f.select(
        col("_gr_node").as("_gr_bn") +: col("_gr_anc").as("_gr_ba") +:
        col("_gr_hop").as("_gr_bh") +:
        plan.deltas.map { case (i, _, _) =>
          col(s"_gr_d$i").as(s"_gr_bd$i") }: _*)
      val adv = col("_gr_bn").isNotNull
      val f2 = f.join(b, col("_gr_anc") === col("_gr_bn"), "left")
        .select(
          col("_gr_node") +:
          when(adv, col("_gr_ba")).otherwise(col("_gr_anc")).as("_gr_anc") +:
          when(adv, col("_gr_hop") + col("_gr_bh"))
            .otherwise(col("_gr_hop")).as("_gr_hop") +:
          adv.cast("long").as("_gr_moved") +:
          plan.deltas.map { case (i, _, k) =>
            when(adv, comb(k)(col(s"_gr_d$i"), col(s"_gr_bd$i")))
              .otherwise(col(s"_gr_d$i")).as(s"_gr_d$i") }: _*)
        .localCheckpoint()
      moved = Option(f2.agg(sum("_gr_moved")).head().get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
      f = f2.drop("_gr_moved")
      round += 1
    }
    // descendants = nodes whose frozen pointer landed on an anchor key
    val joined = f.join(
      anchorDf, col("_gr_anc") === col(s"_gr_a$keyPos")).localCheckpoint()
    val stats = joined
      .agg(count(lit(1)), coalesce(max(col("_gr_hop")), lit(0L))).head()
    val derivedRows = stats.getLong(0)
    if (stats.getLong(1) > levelLimit)
      throw new SparkException("graft recursion doubling: hierarchy depth " +
        s"${stats.getLong(1)} exceeds spark.sql.cteRecursionLevelLimit=" +
        s"$levelLimit (the UnionLoop form would have failed here too)")
    val anchorRows = anchorDf.count()
    if (anchorRows + derivedRows > rowLimit)
      throw new SparkException("graft recursion doubling: " +
        s"${anchorRows + derivedRows} result rows exceed " +
        s"spark.sql.cteRecursionRowLimit=$rowLimit")
    val carrySet = plan.carries.toSet
    val kindOf = plan.deltas.map { case (i, _, k) => i -> k }.toMap
    val outCols = idx.map { i =>
      if (i == keyPos) col("_gr_node")
      else if (carrySet(i)) col(s"_gr_a$i") // constant along the path
      else comb(kindOf(i))(col(s"_gr_a$i"), col(s"_gr_d$i")).as(s"_gr_o$i")
    }
    anchorDf.select(idx.map(i => col(s"_gr_a$i")): _*)
      .unionAll(joined.select(outCols: _*))
  }

  /** Faithful level-at-a-time evaluation (what UnionLoop does) for the
    * inputs doubling cannot soundly cover: duplicate child keys (DAG
    * multiplicity) or anchors reachable as descendants (double rows).
    */
  private def levelIterate(anchorDf: DataFrame, staticDf: DataFrame,
                           levelLimit: Int, rowLimit: Long): DataFrame = {
    val idx = plan.loopOutput.indices
    val keyPos = plan.keyPos
    val deltaOf = plan.deltas.map { case (i, e, k) => i -> ((e, k)) }.toMap
    var frontier = anchorDf
      .toDF(idx.map(i => s"_gr_c$i"): _*).localCheckpoint()
    var total = frontier.count()
    val acc = scala.collection.mutable.ArrayBuffer[DataFrame](frontier)
    var level = 0
    var cont = !frontier.isEmpty
    while (cont) {
      level += 1
      if (level > levelLimit)
        throw new SparkException("graft recursion fallback: exceeded " +
          s"spark.sql.cteRecursionLevelLimit=$levelLimit")
      val next = staticDf
        .join(frontier,
          Shims.column(plan.parentKey) === col(s"_gr_c$keyPos"))
        .select(idx.map { i =>
          if (i == keyPos) Shims.column(plan.childKey).as(s"_gr_c$i")
          else deltaOf.get(i) match {
            case Some((d, k)) =>
              comb(k)(col(s"_gr_c$i"), Shims.column(d)).as(s"_gr_c$i")
            case None => col(s"_gr_c$i") // carry-through
          }
        }: _*)
        .localCheckpoint()
      val n = next.count()
      total += n
      if (total > rowLimit)
        throw new SparkException("graft recursion fallback: exceeded " +
          s"spark.sql.cteRecursionRowLimit=$rowLimit")
      if (n == 0) cont = false
      else { acc += next; frontier = next }
    }
    acc.reduce(_ unionAll _)
  }
}
