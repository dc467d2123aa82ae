package graft.queries

import graft.operators.{Dedup, Multimodal, Similarity}
import org.apache.spark.sql.functions._

/** Extension operators beyond the reference's surface (SURVEY.md §7.3 M6):
  * the LLM-training-data pipeline family.
  *
  * Oracle coverage: the deterministic text-dedup outputs (x1, x3, x10,
  * x11) carry brute-force DuckDB oracles — all-pairs shingle Jaccard
  * (quadratic, fine at the sf0.01 gate scale) and a recursive-CTE
  * transitive closure for components. x1/x10/x11 additionally assert the
  * MinHash-LSH candidate stage has FULL recall on this corpus (planted
  * near-dups are high-Jaccard; verified empirically, and any future
  * recall loss should fail the gate loudly rather than pass silently).
  * The rest (custom sketch values, sin-based hyperplane signatures whose
  * float/double rounding differs from SQL, binary plumbing) stay
  * rows-only; graft's own specs assert their semantics (planted near-dups
  * recovered, LSH recall vs brute force, etc.).
  */
object ExtensionQueries {
  import QueryDef.t

  // Shared oracle-SQL prelude: per-doc DISTINCT 3-word shingle sets over
  // whitespace-tokenized text — the exact mirror of Dedup.shingles.
  private val shinglesCte =
    """toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
      |),
      |idx AS (
      |  SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
      |  FROM toks WHERE len(t) >= 3
      |),
      |sh AS (
      |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle FROM idx
      |)""".stripMargin

  // All-pairs exact Jaccard >= `thr` over the full shingle sets.
  private def bruteJaccardPairs(thr: Double): String =
    s"""$shinglesCte,
       |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |p0 AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |),
       |pairs AS (
       |  SELECT id_a, id_b,
       |    round(inter::DOUBLE / (na.n + nb.n - inter), 4) AS jaccard
       |  FROM p0
       |  JOIN n na ON na.doc_id = id_a JOIN n nb ON nb.doc_id = id_b
       |  WHERE round(inter::DOUBLE / (na.n + nb.n - inter), 4) >= $thr
       |)""".stripMargin

  // Transitive closure over `pairs` + min-label per node (the component id).
  private val componentsCte =
    """edges AS (SELECT id_a AS a, id_b AS b FROM pairs
      |          UNION SELECT id_b, id_a FROM pairs),
      |reach AS (
      |  SELECT a AS node, a AS r FROM edges
      |  UNION
      |  SELECT reach.node, edges.b FROM reach JOIN edges ON reach.r = edges.a
      |),
      |labels AS (SELECT node, min(r) AS label FROM reach GROUP BY node)""".stripMargin

  val all: Map[String, QueryDef] = Map(

    // MinHash+LSH near-dup pairs with verified Jaccard.
    "x1_minhash_lsh" -> QueryDef(
      (s, dir) => Dedup.minHashLsh(
        t(s, dir, "documents"), "doc_id", "text", threshold = 0.2),
      Some(s"WITH ${bruteJaccardPairs(0.2)}\n" +
        "SELECT id_a, id_b, jaccard FROM pairs ORDER BY id_a, id_b")),

    // SimHash Hamming-band near-dup candidates.
    "x2_simhash" -> QueryDef(
      (s, dir) => Dedup.simHashPairs(
        t(s, dir, "documents"), "doc_id", "text", maxHamming = 4),
      None),

    // Exact n-gram Jaccard via inverted index on rare shingles.
    // Oracle mirrors the df<=maxDf(64) boilerplate exclusion: union counts
    // over each doc's df<=64 shingles, intersection over shared (df>=2) ones.
    "x3_ngram_jaccard" -> QueryDef(
      (s, dir) => Dedup.ngramJaccard(
        t(s, dir, "documents"), "doc_id", "text", threshold = 0.2),
      Some(s"""WITH $shinglesCte,
              |dfc AS (SELECT shingle, count(*) AS c FROM sh GROUP BY shingle),
              |kept AS (SELECT doc_id, sh.shingle, c FROM sh JOIN dfc USING (shingle) WHERE c <= 64),
              |n AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
              |p0 AS (
              |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
              |  FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              |  WHERE a.c >= 2
              |  GROUP BY 1, 2
              |)
              |SELECT id_a, id_b,
              |  round(inter::DOUBLE / (na.n + nb.n - inter), 4) AS jaccard
              |FROM p0 JOIN n na ON na.doc_id = id_a JOIN n nb ON nb.doc_id = id_b
              |WHERE round(inter::DOUBLE / (na.n + nb.n - inter), 4) >= 0.2
              |ORDER BY id_a, id_b""".stripMargin)),

    // Embedding-cosine near-dup pairs (hyperplane-LSH buckets).
    "x4_embed_neardup" -> QueryDef(
      (s, dir) => Similarity.cosineNearDupPairs(
        t(s, dir, "embeddings"), threshold = 0.4),
      None),

    // LSH approximate top-k vs the same query vector as e2_ann_topk.
    "x5_ann_lsh" -> QueryDef(
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val q = e.filter(col("vec_id") === 0)
          .select(col("embedding").as("q_embedding"))
        Similarity.lshTopK(e.filter(col("vec_id") =!= 0), q, 10)
      },
      None),

    // Multimodal: synthesize binary corpus -> typed mapPartitions feature
    // extraction (decode STUBBED, plumbing real).
    "x6_multimodal_features" -> QueryDef(
      (s, dir) => Multimodal.extractFeatures(
        s, Multimodal.synthesize(t(s, dir, "documents"))),
      None),

    // Multimodal frame sampling (1 row -> k frames explode).
    "x7_frame_sample" -> QueryDef(
      (s, dir) => Multimodal.sampleFrames(
        Multimodal.synthesize(t(s, dir, "documents"))),
      None),

    // Near-dup clusters: connected components over the MinHash+LSH pairs
    // (pair list -> transitive clusters -> per-cluster size).
    "x10_dedup_clusters" -> QueryDef(
      (s, dir) => Dedup.clusters(
          Dedup.minHashLsh(t(s, dir, "documents"), "doc_id", "text", threshold = 0.2))
        .groupBy(col("label").as("cluster_id"))
        .agg(count(lit(1)).as("n_members"))
        .orderBy("cluster_id"),
      Some(s"""WITH RECURSIVE ${bruteJaccardPairs(0.2)},
              |$componentsCte
              |SELECT label AS cluster_id, count(*) AS n_members
              |FROM labels GROUP BY label ORDER BY cluster_id""".stripMargin)),

    // End-to-end corpus dedup: MinHash+LSH pairs -> connected components
    // -> keep one survivor per cluster -> surviving doc counts per lang.
    "x11_dedup_corpus" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        Dedup.dedupSurvivors(docs, "doc_id",
            Dedup.minHashLsh(docs, "doc_id", "text", threshold = 0.5))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_survivors"))
          .orderBy("lang")
      },
      Some(s"""WITH RECURSIVE ${bruteJaccardPairs(0.5)},
              |$componentsCte
              |SELECT lang, count(*) AS n_survivors FROM documents
              |WHERE doc_id NOT IN (SELECT node FROM labels WHERE label <> node)
              |GROUP BY lang ORDER BY lang""".stripMargin)),

    // IVF approximate top-k: centroid-pruned scan (same query vector as
    // e2_ann_topk; centroids = deterministic id-ordered sample).
    "x9_ann_ivf" -> QueryDef(
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val q = e.filter(col("vec_id") === 0)
          .select(col("embedding").as("q_embedding"))
        Similarity.ivfTopK(e.filter(col("vec_id") =!= 0), q, 10)
      },
      None),

    // Approximate sketches (HLL distinct + quantile) — values are
    // engine-specific, so rows-only.
    "x8_approx" -> QueryDef(
      (s, dir) => t(s, dir, "events")
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id")).as("approx_users"),
          percentile_approx(col("value"), lit(0.5), lit(1000)).as("p50_value"),
          count(lit(1)).as("n"))
        .orderBy("event_type"),
      None)
  )
}
