package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph scoring over an edge list — the link-analysis family
  * (PageRank-style centrality) real corpus-curation pipelines run to score
  * web documents by graph importance before sampling (cf. Common Crawl
  * harmonic-centrality ranking used by CCNet-descendant pipelines).
  *
  * Engine-exactness discipline: ranks are kept in integer "units"
  * (`scale` units = total rank mass 1.0) and every per-iteration step is
  * integer arithmetic — contribution = `rank div out_degree`, damping =
  * `(dampingPct * sum) div 100` — so distributed summation order cannot
  * drift the result and the DuckDB oracle matches bit-for-bit. The
  * truncation error per node per iteration is < out_degree units
  * (≤ 1e-9 of total mass at the default scale), a deterministic bias both
  * engines share, not a correctness hazard.
  *
  * 100 TB shape: one `(edges ⋈ ranks)` shuffle on the src key plus one
  * aggregation on the dst key per iteration; `localCheckpoint` caps the
  * lineage per round (same discipline as Dedup.clusters). The edge list
  * with degrees is checkpointed ONCE and reused by every iteration, so
  * the per-round cost is two exchanges over rank-sized rows, never a
  * rebuild of the graph. Degrees and node ids stay distributed; the only
  * driver-side scalar is the node COUNT (the teleport constant).
  */
object Graph {

  /** Damped PageRank over a directed edge list `(src: long, dst: long)`.
    * Nodes with no out-edges contribute no mass (the standard
    * dangling-node simplification — callers wanting mass conservation
    * should bidirect their edges, as the x47 gate query does).
    */
  def pagerank(
      edges: DataFrame,
      iters: Int,
      scale: Long = 1000000000000L,
      dampingPct: Int = 85): DataFrame = {
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count() // bounded driver scalar: ONE long
    require(n > 0, "pagerank: empty graph")
    val unit = scale / n
    val teleport = ((100L - dampingPct) * unit) / 100L
    val deg = e.groupBy("src").agg(count(lit(1)).as("d"))
    // graph-with-degrees materialized once; every iteration re-reads it
    val g = e.join(deg, "src").localCheckpoint()
    var rank = nodes.withColumn("r", lit(unit))
    for (_ <- 1 to iters) {
      val in = g.join(rank, g("src") === rank("node"))
        .select(col("dst"), expr("r div d").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("s"))
      rank = nodes.join(in, nodes("node") === in("dst"), "left")
        .select(col("node"),
          (lit(teleport) +
            expr(s"($dampingPct * coalesce(s, 0L)) div 100")).as("r"))
        .localCheckpoint()
    }
    rank
  }
}
