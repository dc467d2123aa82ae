package graft.queries

import graft.operators.{Dedup, Multimodal, Similarity}
import org.apache.spark.sql.functions._

/** Extension operators beyond the reference's surface (SURVEY.md §7.3 M6):
  * the LLM-training-data pipeline family. These are NOT DuckDB-expressible
  * (custom sketches / LSH / binary plumbing) → no oracle entry; the driver
  * records a rows-only check, and graft's own specs assert semantics
  * (planted near-dups recovered, LSH recall vs brute force, etc.).
  */
object ExtensionQueries {
  import QueryDef.t

  val all: Map[String, QueryDef] = Map(

    // MinHash+LSH near-dup pairs with verified Jaccard.
    "x1_minhash_lsh" -> QueryDef(
      (s, dir) => Dedup.minHashLsh(
        t(s, dir, "documents"), "doc_id", "text", threshold = 0.2),
      None),

    // SimHash Hamming-band near-dup candidates.
    "x2_simhash" -> QueryDef(
      (s, dir) => Dedup.simHashPairs(
        t(s, dir, "documents"), "doc_id", "text", maxHamming = 4),
      None),

    // Exact n-gram Jaccard via inverted index on rare shingles.
    "x3_ngram_jaccard" -> QueryDef(
      (s, dir) => Dedup.ngramJaccard(
        t(s, dir, "documents"), "doc_id", "text", threshold = 0.2),
      None),

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
      None),

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
      None),

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
