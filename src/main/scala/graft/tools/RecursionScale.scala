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
  * half an hour — progress beats batching); after the selected arms
  * finish, a final `require` aborts with a non-zero exit if any two
  * disagree on (row count, max depth).
  *
  * A third arm `rewrite` runs the IDENTICAL `WITH RECURSIVE` SQL with
  * graft's RecursionDoubling optimizer rule registered: the planner
  * detects the linear-recursion shape and swaps UnionLoop for the
  * pointer-doubling exec, so the SQL text gets the log-rounds path for
  * free. Its (rows, maxDepth) is checked against the doubling arm.
  *
  * Usage: RecursionScale [depth] [width] [arm...] (default 5000 200,
  * all arms; naming arms — doubling / cte / rewrite — reruns a subset
  * without repaying the others; the cte arm at default size is ~28 min)
  */
object RecursionScale {
  def main(args: Array[String]): Unit = {
    val depth = args.headOption.map(_.toInt).getOrElse(5000)
    val width = args.drop(1).headOption.map(_.toInt).getOrElse(200)
    val arms = args.drop(2).toSet
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

    val cteSql =
      """WITH RECURSIVE r AS (
        |  SELECT node, node AS root, CAST(0 AS BIGINT) AS depth
        |  FROM parents WHERE parent IS NULL
        |  UNION ALL
        |  SELECT p.node, r.root, r.depth + 1
        |  FROM parents p JOIN r ON p.parent = r.node)
        |SELECT count(*), max(depth) FROM r""".stripMargin
    def arm(name: String): Boolean = arms.isEmpty || arms(name)
    val results = scala.collection.mutable.LinkedHashMap[String, (Long, Long)]()

    if (arm("doubling")) {
      val (t, rows, maxD) = timed {
        val r = Graph.rootsAndDepth(parents)
          .agg(count(lit(1)), max(col("depth"))).head()
        (r.getLong(0), r.getLong(1))
      }
      println(f"doubling $depth%6d x $width%4d  ${t}%8.1f s  " +
        f"rows=$rows maxDepth=$maxD")
      results += "doubling" -> ((rows, maxD))
    }

    if (arm("cte")) {
      // rule OFF: this arm measures Spark's own UnionLoop
      spark.conf.set("spark.graft.recursionDoubling.enabled", "false")
      val (t, rows, maxD) = timed {
        val r = spark.sql(cteSql).head()
        (r.getLong(0), r.getLong(1))
      }
      println(f"cte      $depth%6d x $width%4d  ${t}%8.1f s  " +
        f"rows=$rows maxDepth=$maxD")
      results += "cte" -> ((rows, maxD))
    }

    if (arm("rewrite")) {
      // the SAME SQL with the RecursionDoubling rule registered: the
      // planner swaps UnionLoop for the pointer-doubling exec, so the
      // unmodified query text gets the log-rounds path
      graft.plans.AsofJoin.register(spark)
      spark.conf.set("spark.graft.recursionDoubling.enabled", "true")
      val (t, rows, maxD) = timed {
        val r = spark.sql(cteSql).head()
        (r.getLong(0), r.getLong(1))
      }
      println(f"rewrite  $depth%6d x $width%4d  ${t}%8.1f s  " +
        f"rows=$rows maxDepth=$maxD")
      results += "rewrite" -> ((rows, maxD))
    }

    require(results.values.toSet.size <= 1,
      s"arms disagree on (rows, maxDepth): $results")
    spark.stop()
  }
}
