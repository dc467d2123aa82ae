package graft

import graft.operators.Graph
import graft.queries.{RelationalQueries, TextQueries}
import org.apache.spark.sql.functions._

/** Round-11 operators: connected components, weighted shortest paths,
  * duplicate-span removal, and the decorrelated LATERAL plan shape.
  */
class Round11GraphSpec extends GraftSparkSpec {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) =
    pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")

  test("connectedComponents labels each component with its min node id") {
    // two components: a 4-node PATH (forces >1 propagation round: the min
    // label must walk the diameter) and a triangle, plus a self-contained
    // 2-clique
    val e = edges((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (12L, 10L), (20L, 21L))
    val got = Graph.connectedComponents(e)
      .orderBy("node").as[(Long, Long)].collect()
    assert(got.toSeq === Seq(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents converges past maxRounds-insensitive fixpoint") {
    // a 9-node path: diameter 8, so labels need 8 rounds; the early-exit
    // loop must keep going until the fixpoint, not stop at some smaller
    // default
    val e = edges((1L to 8L).map(i => (i, i + 1)): _*)
    val got = Graph.connectedComponents(e).agg(
      countDistinct(col("comp")), min(col("comp"))).as[(Long, Long)].head()
    assert(got === ((1L, 1L)))
  }

  test("shortestPaths prefers a cheap long path over an expensive hop") {
    // 1 -> 2 direct costs 10; 1 -> 3 -> 4 -> 2 costs 3: the delta
    // iteration must keep improving node 2 after its first discovery
    val e = Seq((1L, 2L, 10L), (1L, 3L, 1L), (3L, 4L, 1L), (4L, 2L, 1L))
      .toDF("src", "dst", "w")
    val src = Seq(1L).toDF("source")
    val got = Graph.shortestPaths(e, src, maxRounds = 8)
      .orderBy("node").as[(Long, Long)].collect()
    assert(got.toSeq === Seq(1L -> 0L, 2L -> 3L, 3L -> 1L, 4L -> 2L))
  }

  test("shortestPaths takes the min over multiple sources") {
    val e = Seq((1L, 5L, 4L), (2L, 5L, 1L)).toDF("src", "dst", "w")
    val src = Seq(1L, 2L).toDF("source")
    val got = Graph.shortestPaths(e, src, maxRounds = 4)
      .filter(col("node") === 5L).as[(Long, Long)].head()
    assert(got === ((5L, 1L)))
  }

  test("shortestPaths rejects negative weights") {
    val e = Seq((1L, 2L, -1L)).toDF("src", "dst", "w")
    val src = Seq(1L).toDF("source")
    intercept[IllegalArgumentException] {
      Graph.shortestPaths(e, src, maxRounds = 2)
    }
  }

  test("d45 strips repeated spans keep-first and rebuilds the text") {
    // doc 0 and doc 1 share their first 8-word span; doc 0 wins (smaller
    // doc_id). doc 2 is 7 words: zero spans, empty rebuild.
    val dup = (1 to 8).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (0L, dup + " " + (9 to 16).map(i => s"a$i").mkString(" ")),
      (1L, dup + " " + (9 to 16).map(i => s"b$i").mkString(" ")),
      (2L, (1 to 7).map(i => s"c$i").mkString(" "))
    ).toDF("doc_id", "text")
    docs.createOrReplaceTempView("r11_docs")
    // run the d45 pipeline shape directly on the toy frame
    import org.apache.spark.sql.expressions.Window
    val sh = docs.select(col("doc_id"), split(col("text"), " ").as("words"))
      .select(col("doc_id"), posexplode(expr(
        "CASE WHEN size(words) >= 8 THEN " +
          "transform(sequence(0, CAST(size(words) / 8 AS INT) - 1), " +
          "i -> array_join(slice(words, i * 8 + 1, 8), ' ')) " +
          "ELSE array() END")))
      .withColumnRenamed("col", "span")
    val rk = sh.withColumn("rn", row_number().over(
      Window.partitionBy("span").orderBy("doc_id", "pos")))
    val kept = rk.filter(col("rn") === 1)
      .groupBy("doc_id").agg(collect_list(col("span")).as("spans"))
      .orderBy("doc_id").as[(Long, Seq[String])].collect().toMap
    assert(kept(0L).size === 2)             // both of doc 0's spans survive
    assert(kept(1L).size === 1)             // doc 1 loses the shared span
    assert(!kept(1L).contains(dup))
    assert(!kept.contains(2L))              // no spans at all
  }

  test("d45 gate query matches schema and covers every document") {
    val out = TextQueries.all("d45_span_dedup").fn(spark, sfDir)
    assert(out.columns.toSeq ===
      Seq("doc_id", "n_spans", "kept_spans", "text_hash"))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(out.count() === docs)
    // kept <= total everywhere, and something was actually deduped OR the
    // corpus is entirely unique — assert the invariant, not the fixture
    assert(out.filter(col("kept_spans") > col("n_spans")).isEmpty)
  }

  test("q72 LATERAL decorrelates into one shuffle, not a nested loop") {
    val df = RelationalQueries.all("q72_lateral").fn(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"lateral fell back to a cartesian product:\n$plan")
    assert(!plan.contains("BroadcastNestedLoop"),
      s"lateral fell back to a nested loop join:\n$plan")
    // the correlated LIMIT should lower to a rank-style filter (window or
    // group-limit) over the correlation key
    assert(plan.contains("Window") || plan.contains("GroupLimit"),
      s"expected a windowed rank plan for the correlated LIMIT:\n$plan")
  }

  test("bfsPerSource min over sources equals merged bfs distance") {
    // two overlapping source expansions on a graph with a branch: the
    // merged single-frontier BFS must be the pointwise min of the
    // per-source distances
    val e = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (2L, 6L),
      (6L, 7L), (7L, 4L))
    val sources = Seq(1L, 5L).toDF("source")
    val merged = Graph.bfs(e, sources, maxDepth = 6)
      .orderBy("node").as[(Long, Int)].collect().toMap
    val perSrc = Graph.bfsPerSource(e, sources, maxDepth = 6)
      .groupBy("node").agg(min(col("d")).as("d"))
      .orderBy("node").as[(Long, Int)].collect().toMap
    assert(perSrc === merged)
    // and each source's own expansion is independent: node 4 is 3 hops
    // from source 1 (1-2-3-4 or 1-2-6-7-4 is 4) but 1 hop from source 5
    val d4 = Graph.bfsPerSource(e, sources, maxDepth = 6)
      .filter(col("node") === 4L)
      .select("source", "d").as[(Long, Int)].collect().toMap
    assert(d4 === Map(1L -> 3, 5L -> 1))
  }

  test("betweennessTruncated matches hand-computed Brandes on a chain") {
    // chain 1-2-3-4, panel {1, 4}, depth 3: from s=1, δ(2)=2e6 (paths to
    // 3 and 4 flow through), δ(3)=1e6; s=4 mirrors → bc(2)=bc(3)=3e6.
    // Endpoints only ever appear at the truncation depth → excluded.
    val e = edges((1L, 2L), (2L, 3L), (3L, 4L))
    val got = Graph.betweennessTruncated(e, Seq(1L, 4L).toDF("source"), 3)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(got === Seq(2L -> 3000000L, 3L -> 3000000L))
  }

  test("betweennessTruncated splits dependency across equal-count paths") {
    // diamond 1-{2,3}-4: σ(4)=2, so each middle node carries HALF the
    // (1,4) dependency — the σ_u/σ_w division, floor'd to micro-units
    val e = edges((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
    val got = Graph.betweennessTruncated(e, Seq(1L).toDF("source"), 3)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(got === Seq(2L -> 500000L, 3L -> 500000L, 4L -> 0L))
  }

  test("ktruss peels bridges and weak triangles, keeps the K4") {
    // K4 on 1-4 (every edge closes 2 triangles) + pendant (4,5) + an
    // isolated triangle 10-12 (support 1 each): 4-truss = exactly the K4
    val canon = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (10L, 11L), (10L, 12L), (11L, 12L))
      .toDF("u", "v")
    val got = Graph.ktruss(canon, k = 4, rounds = 4)
      .orderBy("u", "v").as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L, 2L), (1L, 3L, 2L), (1L, 4L, 2L),
      (2L, 3L, 2L), (2L, 4L, 2L), (3L, 4L, 2L)))
  }

  test("ktruss k=2 keeps triangle-free edges with support 0") {
    // threshold k-2 = 0: every edge survives, including the pendant and
    // the bare bridge that close no triangle — the zero-support rows the
    // wedge join alone would drop (r11 advice fix)
    val canon = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (8L, 9L))
      .toDF("u", "v")
    val got = Graph.ktruss(canon, k = 2, rounds = 2)
      .orderBy("u", "v").as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L),
      (3L, 4L, 0L), (8L, 9L, 0L)))
  }

  test("harmonicCentrality integer units on a hand-checked chain") {
    // chain 1-2-3-4, source 1, depth 3: d = {2:1, 3:2, 4:3} →
    // harmonic = 1000000 + 500000 + 333333, closeness = 3·1e6 div 6
    val e = edges((1L, 2L), (2L, 3L), (3L, 4L))
    val got = Graph.harmonicCentrality(e, Seq(1L).toDF("source"), 3)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(got === ((1L, 3L, 6L, 1833333L, 500000L)))
    // an isolated source reaches nothing and emits no row (no 0/0)
    assert(Graph.harmonicCentrality(e, Seq(99L).toDF("source"), 3).isEmpty)
  }
}
