package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the 100 TB companion to the engine's
  * shuffles (SURVEY.md §7.4: the reference's xor-fold hash has ≤256 distinct
  * values, so hot partitions are guaranteed at scale; and real-world join
  * keys are Zipfian).
  *
  * Three tiers, in preference order:
  *   1. AQE (`spark.sql.adaptive.skewJoin.enabled`, on by default here) —
  *      splits oversized shuffle partitions at runtime; zero code. Handles
  *      sort-merge-join skew transparently.
  *   2. `broadcast(dim)` — no shuffle of the big side at all; first choice
  *      whenever the dim fits in memory.
  *   3. Explicit salting (this file) — for the cases AQE can't fix:
  *      a shuffled join where ONE fact key exceeds a single executor
  *      (AQE can split the fact side but the matching dim rows of a single
  *      key still land in every split — that is exactly what replication
  *      does, deterministically), or a `collect_list`-style aggregation
  *      whose partial aggregation doesn't reduce (every value survives, so
  *      the hot group's payload overwhelms one task).
  */
object Skew {

  /** Equi-join `facts ⋈ dims` on `key`, salted `factor` ways: facts get a
    * positional per-row salt, dims are replicated once per salt value.
    * The JOIN RESULT is identical for ANY salt assignment (every salt
    * value finds its dim replica), so the salt needs no cross-retry
    * determinism — positional salting is what spreads byte-identical hot
    * rows (a content hash would send every identical row to one sub-key).
    *
    * Cost: dims shuffle volume × factor — use AFTER broadcast is ruled out
    * (dim too big to broadcast, but replication factor × dim still ≪ fact).
    */
  /** The salt expression — positional, so byte-identical rows spread. The
    * single source of truth for both operators (and their specs). */
  private[graft] def saltCol(factor: Int): Column =
    pmod(monotonically_increasing_id(), lit(factor)).cast("int")

  def saltedJoin(facts: DataFrame, dims: DataFrame, key: String,
                 factor: Int = 8): DataFrame = {
    require(factor > 0)
    val saltedFacts = facts.withColumn("_salt", saltCol(factor))
    val saltedDims = dims.withColumn("_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    saltedFacts.join(saltedDims,
        saltedFacts(key) === saltedDims(key) &&
          saltedFacts("_salt") === saltedDims("_salt"))
      .drop(saltedDims(key)).drop("_salt")
  }

  /** Two-phase aggregation for payload-carrying aggs (collect_list/set,
    * percentile buffers) where map-side partial aggregation cannot shrink
    * the hot group: phase 1 aggregates (keys, salt) sub-groups, phase 2
    * merges the `factor` partials per key. Counts/sums don't need this —
    * Spark's partial aggregation already reduces them.
    *
    * `partial` builds the sub-group aggregate, `merge` combines partials;
    * e.g. collect_list → partial collect_list, merge flatten(collect_list).
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], factor: Int,
                partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    require(factor > 0)
    // positional salt: spreads identical rows; merge combines all partials
    // regardless of which sub-group a row landed in
    val salted = df.withColumn("_salt", saltCol(factor))
    salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }
}
