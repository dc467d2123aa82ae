package graft.tools

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: measures the recall of the approximate paths (hyperplane-LSH
  * near-dup, LSH/IVF top-k, simhash near-dup) against brute force at the
  * correctness-gate scale (sf0.01), to pick gate parameters with FULL
  * empirical recall — the precondition for giving those queries brute-force
  * DuckDB oracles (the x1 tripwire pattern).
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def pairsSet(df: DataFrame): Set[(Long, Long)] =
      df.select(col("id_a").cast("long"), col("id_b").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // ---- x4: cosine near-dup pairs >= 0.4
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("e_a"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("e_b"))
    val brute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("sim", round(nanvl(
        graft.functions.VectorFunctions.vecCosine(col("e_a"), col("e_b")), lit(-1.0)), 6))
      .filter(col("sim") >= 0.4)
    val bruteSet = pairsSet(brute)
    println(s"x4 brute pairs >=0.4: ${bruteSet.size}")
    for ((planes, bands, maxB) <- Seq((16, 8, 256), (16, 8, 100000), (16, 16, 100000))) {
      val got = pairsSet(Similarity.cosineNearDupPairs(e, 0.4, planes, bands, maxB))
      val miss = bruteSet -- got
      println(s"x4 lsh planes=$planes bands=$bands maxBucket=$maxB: ${got.size} pairs, missing=${miss.size} ${miss.take(5)}")
    }

    // ---- x5: lsh top-10 vs brute force
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q_embedding"))
    val rest = e.filter(col("vec_id") =!= 0)
    val bfTop = Similarity.bruteForceTopK(rest, q, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    println(s"x5 brute top10: $bfTop")
    for (probes <- Seq(4, 6, 8, 10, 16)) {
      val got = Similarity.lshTopK(rest, q, 10, 16, probes)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
      println(s"x5 lsh probes=$probes: match=${got == bfTop} $got")
    }

    // ---- x9: ivf top-10 vs brute force
    for (nprobe <- Seq(4, 6, 8, 12, 16)) {
      val got = Similarity.ivfTopK(rest, q, 10, 16, nprobe)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
      println(s"x9 ivf nprobe=$nprobe: match=${got == bfTop} $got")
    }

    // ---- x2: simhash candidates vs brute jaccard >= 0.5
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val sa = sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val sb = sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    val bruteJ = sa.crossJoin(sb).filter(col("id_a") < col("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")), 4))
      .filter(col("jaccard") >= 0.5)
    val bruteJSet = pairsSet(bruteJ)
    println(s"x2 brute jaccard pairs >=0.5: ${bruteJSet.size}")
    for ((maxH, maxB, bands) <- Seq((16, 100000, 32), (24, 100000, 32), (32, 100000, 32))) {
      val cand = pairsSet(Dedup.simHashPairs(docs, "doc_id", "text", maxH, maxB, bands))
      val miss = bruteJSet -- cand
      println(s"x2 simhash maxHamming=$maxH maxBucket=$maxB bands=$bands: cands=${cand.size}, missing=${miss.size} ${miss.take(5)}")
    }
    val x2got = pairsSet(Dedup.simHashNearDup(docs, "doc_id", "text",
      threshold = 0.5, maxHamming = 32, maxBucket = 100000, bands = 32))
    println(s"x2 simHashNearDup gate params: ${x2got.size} pairs, " +
      s"missing=${(bruteJSet -- x2got).size}, extra=${(x2got -- bruteJSet).size}")

    spark.stop()
  }
}
