package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-space operations over the `embeddings` table (vec_id,
  * embedding: array<float>, label) — norms and brute-force cosine top-k ANN.
  *
  * Precision discipline for oracle parity: every product is computed as
  * double-of-float × double-of-float (exact) and summed left-to-right in
  * list order in BOTH engines, so the float pipelines are bit-identical;
  * results are rounded before ordering/output.
  *
  * Scale notes: brute-force top-k is a broadcast of ONE query vector and a
  * single narrow pass + TakeOrdered — linear scan, no shuffle; this is the
  * correct baseline at any scale. The sub-linear path is the LSH variant in
  * graft.operators.Similarity (bucketed candidate join; no SQL oracle).
  */
object VectorQueries {
  import QueryDef.t

  /** sum_i a[i]*b[i], computed in double, left-to-right — the codegen'd
    * VecDot kernel (graft.functions.VectorUtil), bit-identical fold order
    * to the oracle's list_reduce.
    */
  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vecDot(a, b)

  val all: Map[String, QueryDef] = Map(

    // ---- L2 norms per label class.
    "e1_embed_norm" -> QueryDef(
      (s, dir) => t(s, dir, "embeddings")
        .withColumn("norm", sqrt(dot(col("embedding"), col("embedding"))))
        .groupBy("label")
        .agg(round(avg("norm"), 4).as("avg_norm"),
          round(min("norm"), 4).as("min_norm"),
          round(max("norm"), 4).as("max_norm"),
          count(lit(1)).as("n"))
        .orderBy("label"),
      Some("""SELECT label,
             |  round(avg(norm), 4) AS avg_norm,
             |  round(min(norm), 4) AS min_norm,
             |  round(max(norm), 4) AS max_norm,
             |  count(*) AS n
             |FROM (SELECT label, sqrt(list_reduce(
             |    list_prepend(0.0, list_transform(embedding,
             |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
             |    (a, b) -> a + b)) AS norm
             |  FROM embeddings)
             |GROUP BY label ORDER BY label""".stripMargin)),

    // ---- brute-force cosine top-k against the vec_id=0 query vector.
    // Rounded similarity is the primary sort key so near-tie ordering is
    // identical across engines; vec_id breaks exact ties.
    "e2_ann_topk" -> QueryDef(
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val q = e.filter(col("vec_id") === 0)
          .select(col("embedding").as("q_embedding"))
        e.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .withColumn("sim", round(
            dot(col("embedding"), col("q_embedding")) /
              (sqrt(dot(col("embedding"), col("embedding"))) *
                sqrt(dot(col("q_embedding"), col("q_embedding")))), 6))
          .select(col("vec_id"), col("label"), col("sim"))
          .orderBy(col("sim").desc, col("vec_id"))
          .limit(10)
      },
      Some("""WITH dd AS (
             |  SELECT vec_id, label,
             |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
             |  FROM embeddings),
             |q AS (SELECT e AS qe FROM dd WHERE vec_id = 0)
             |SELECT vec_id, label,
             |  round(list_reduce(list_prepend(0.0, list_transform(range(1, len(e) + 1),
             |      i -> e[i] * qe[i])), (a, b) -> a + b)
             |    / (sqrt(list_reduce(list_prepend(0.0, list_transform(e, x -> x * x)),
             |        (a, b) -> a + b))
             |      * sqrt(list_reduce(list_prepend(0.0, list_transform(qe, x -> x * x)),
             |        (a, b) -> a + b))), 6) AS sim
             |FROM dd, q WHERE vec_id <> 0
             |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin))
  )
}
