package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Similarity.ivfRangeSearch: radius semantics, the probe-pruning
  * approximation boundary, and the no-shuffle plan shape.
  */
class RangeSearchSpec extends GraftSparkSpec {
  import spark.implicits._

  // 4 unit-ish vectors: a & b near-identical, c orthogonal-ish, d equal
  // to the query. list assignment is forced via a synthetic list_id.
  private def corpus = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f), 0, 1L),
    (2L, Array(0.9f, 0.1f, 0.0f), 0, 1L),
    (3L, Array(0.0f, 1.0f, 0.0f), 0, 2L),
    (4L, Array(0.7f, 0.7f, 0.0f), 0, 2L)
  ).toDF("vec_id", "embedding", "label", "list_id")

  private def query = Seq(Tuple1(Array(1.0f, 0.0f, 0.0f)))
    .toDF("q_embedding")

  test("returns every vector over the threshold in probed lists") {
    val got = Similarity.ivfRangeSearch(corpus, query, 0.5, Seq(1L, 2L))
      .orderBy("vec_id").select("vec_id").as[Long].collect()
    assert(got.toSeq === Seq(1L, 2L, 4L)) // 3 is orthogonal (sim 0)
  }

  test("an in-radius vector in an unprobed list is missed (by design)") {
    val got = Similarity.ivfRangeSearch(corpus, query, 0.5, Seq(1L))
      .orderBy("vec_id").select("vec_id").as[Long].collect()
    assert(got.toSeq === Seq(1L, 2L)) // 4 is in radius but list 2 unprobed
  }

  test("zero-norm vectors rank below any threshold (NaN guard)") {
    val z = Seq((9L, Array(0.0f, 0.0f, 0.0f), 0, 1L))
      .toDF("vec_id", "embedding", "label", "list_id")
    assert(Similarity.ivfRangeSearch(z, query, -0.9, Seq(1L)).isEmpty)
  }

  test("range search plans as a narrow filter — no exchange") {
    val df = Similarity.ivfRangeSearch(corpus, query, 0.5, Seq(1L))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"radius scan should not shuffle:\n$plan")
  }

  test("MMR trades relevance for diversity on a redundant pool") {
    // a (rel .99) and b (rel .98) are near-identical; c (rel .60) is
    // orthogonal to both. Pure relevance ranks a,b,c; MMR must demote
    // the redundant b below the diverse c at pick 2.
    val cands = Seq(
      (1L, 0.99, Array(1.0f, 0.0f, 0.0f)),
      (2L, 0.98, Array(0.999f, 0.045f, 0.0f)),
      (3L, 0.60, Array(0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "rel", "embedding")
    val got = Similarity.mmrRerank(cands, 3)
      .orderBy("rk").as[(Int, Long, Double)].collect()
    assert(got.map(_._2).toSeq === Seq(1L, 3L, 2L))
    // pick 1 is pure relevance, untouched by the lambda mix
    assert(got.head._3 === 0.99)
  }

  test("MMR stops when the pool is exhausted") {
    val cands = Seq((1L, 0.9, Array(1.0f, 0.0f)), (2L, 0.5, Array(0.0f, 1.0f)))
      .toDF("vec_id", "rel", "embedding")
    assert(Similarity.mmrRerank(cands, 5).count() === 2)
  }
}
