package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off: time the x47/x51 gate bodies at both checkpoint intervals
  * on a given SF dir (the gate fixtures grew 10x between sf0.01 tuning
  * and the sf0.1 bench — re-measure where the unroll/materialize
  * crossover actually sits). Usage: X47Probe [sfDir]
  */
object X47Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    def timed(f: => Any): Double = {
      System.gc()
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // the gate entries as shipped (interval set inside); compare by
    // swapping the interval through a system property the queries
    // cannot see — so instead re-time the SHIPPED queries and variants
    // built here from the same fixture
    import org.apache.spark.sql.functions._
    def fixtureEdges = {
      val orders = spark.read.parquet(s"$dir/orders.parquet")
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val cp = orders.select(col("o_orderkey"), col("o_custkey"))
        .filter(col("o_custkey") % 10 === 0)
        .join(li.select(col("l_orderkey"), col("l_partkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("c"),
          (col("l_partkey") * 2 + 1).as("p"))
        .distinct()
      cp.select(col("c").as("src"), col("p").as("dst"))
        .unionAll(cp.select(col("p").as("src"), col("c").as("dst")))
    }
    val nEdges = fixtureEdges.count()
    println(s"x47 fixture edges at $dir: $nEdges")
    for (interval <- Seq(1, 2, 5); rep <- 1 to 2) {
      val t = timed {
        graft.operators.Graph.pagerank(fixtureEdges, iters = 3,
          checkpointInterval = interval)
          .orderBy(desc("r"), col("node")).limit(20).collect()
      }
      println(f"pagerank interval=$interval rep=$rep: $t%.2f s")
    }

    // x51's shape: labels referenced TWICE per round (neighbor join +
    // keep-label join) — the unrolled plan doubles per iteration, unlike
    // pagerank's linear chain
    def copurchaseEdges = {
      val op = broadcast(spark.read.parquet(s"$dir/orders.parquet")
          .select(col("o_orderkey")))
        .join(spark.read.parquet(s"$dir/lineitem.parquet")
            .select(col("l_orderkey"), col("l_partkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val pc = op.groupBy("ok")
        .agg(sort_array(collect_set(col("pk"))).as("items"))
        .select(explode(expr(
          "flatten(transform(items, (x, i) -> " +
            "transform(slice(items, i + 2, size(items)), " +
            "y -> struct(x AS pa, y AS pb))))")).as("pr"))
        .groupBy(col("pr.pa").as("pa"), col("pr.pb").as("pb"))
        .agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 2)
      pc.select(col("pa").as("src"), col("pb").as("dst"))
        .unionAll(pc.select(col("pb").as("src"), col("pa").as("dst")))
    }
    val seeds = spark.read.parquet(s"$dir/part.parquet")
      .filter(col("p_partkey") % 7 === 0)
      .select(col("p_partkey").as("node"), col("p_brand").as("label"))
    for (interval <- Seq(1, 5); rep <- 1 to 2) {
      val t = timed {
        graft.operators.Graph.labelPropagate(copurchaseEdges, seeds,
          iters = 2, checkpointInterval = interval)
          .filter(col("label").isNotNull).orderBy("node").collect()
      }
      println(f"labelprop interval=$interval rep=$rep: $t%.2f s")
    }
    spark.stop()
  }
}
