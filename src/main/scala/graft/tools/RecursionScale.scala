package graft.tools

import graft.operators.Graph
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement behind SCALE.md's recursion-guidance row: the SAME deep
  * hierarchy resolved two ways —
  *
  *   cte:      Spark's own WITH RECURSIVE (UnionLoop, the q73 surface):
  *             ONE sequential join per LEVEL, so wall time scales with
  *             hierarchy depth regardless of row volume per level.
  *   doubling: Graph.rootsAndDepth pointer doubling (the x54 shape):
  *             one join per 2^k HOP — ceil(log2 depth) rounds total.
  *
  * Fixture: `width` parallel chains of `depth` nodes (node i's parent
  * is i−1 within its chain; level-0 nodes are roots), so every level
  * carries `width` rows and both arms resolve the identical forest.
  * Per-arm times print as each arm completes (the cte arm can run for
  * half an hour — progress beats batching); the arms are then checked
  * to agree on (row count, max depth) before the RATIO line, so a
  * disagreement aborts before the comparison is stated.
  *
  * Usage: RecursionScale [depth] [width] (default 5000 200)
  */
object RecursionScale {
  def main(args: Array[String]): Unit = {
    val depth = args.headOption.map(_.toInt).getOrElse(5000)
    val width = args.drop(1).headOption.map(_.toInt).getOrElse(200)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // default cteRecursionLevelLimit is 100 — raise it to the fixture
      // depth (the limit exists to catch runaway recursion, which a
      // known-depth hierarchy is not). The CUMULATIVE row limit
      // (cteRecursionRowLimit, default 1 M) trips too: the first 5000x200
      // run died with RECURSION_ROW_LIMIT_EXCEEDED at exactly its 1 M-row
      // result AFTER 33 min of sequential execution — a deep hierarchy
      // needs BOTH limits sized up front
      .config("spark.sql.cteRecursionLevelLimit", depth + 10)
      .config("spark.sql.cteRecursionRowLimit", depth.toLong * width * 2)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val n = depth.toLong * width
    spark.range(n).select(
        col("id").as("node"),
        when(col("id") % depth === 0, lit(null))
          .otherwise(col("id") - 1).as("parent"))
      .createOrReplaceTempView("parents")
    val parents = spark.table("parents")

    def timed(f: => (Long, Long)): (Double, Long, Long) = {
      System.gc()
      val t0 = System.nanoTime()
      val (rows, maxDepth) = f
      ((System.nanoTime() - t0) / 1e9, rows, maxDepth)
    }

    // warm both paths small so classloading/codegen stay out of the clock
    Graph.rootsAndDepth(parents.limit(1000)).agg(count(lit(1))).head()
    spark.sql("""WITH RECURSIVE w AS (
                |  SELECT CAST(0 AS BIGINT) AS i
                |  UNION ALL SELECT i + 1 FROM w WHERE i < 3)
                |SELECT count(*) FROM w""".stripMargin).head()

    val (tDbl, rowsDbl, maxDbl) = timed {
      val r = Graph.rootsAndDepth(parents)
        .agg(count(lit(1)), max(col("depth"))).head()
      (r.getLong(0), r.getLong(1))
    }
    println(f"doubling $depth%6d x $width%4d  ${tDbl}%8.1f s  " +
      f"rows=$rowsDbl maxDepth=$maxDbl")

    val (tCte, rowsCte, maxCte) = timed {
      val r = spark.sql(
        """WITH RECURSIVE r AS (
          |  SELECT node, node AS root, CAST(0 AS BIGINT) AS depth
          |  FROM parents WHERE parent IS NULL
          |  UNION ALL
          |  SELECT p.node, r.root, r.depth + 1
          |  FROM parents p JOIN r ON p.parent = r.node)
          |SELECT count(*), max(depth) FROM r""".stripMargin).head()
      (r.getLong(0), r.getLong(1))
    }
    println(f"cte      $depth%6d x $width%4d  ${tCte}%8.1f s  " +
      f"rows=$rowsCte maxDepth=$maxCte")

    require(rowsDbl == rowsCte && maxDbl == maxCte,
      s"arms disagree: doubling ($rowsDbl, $maxDbl) vs cte ($rowsCte, $maxCte)")
    println(f"ratio cte/doubling: ${tCte / tDbl}%.1f x")
    spark.stop()
  }
}
