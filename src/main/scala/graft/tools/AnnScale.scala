package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: the ANN family an order of magnitude past the gate fixture
  * (500 vectors) — N deterministic clustered vectors (default 1 M × 64
  * dims), measuring what a capacity plan needs:
  *   - brute-force top-10: the exact baseline's per-query scan cost;
  *   - IVF build (one argmax assignment pass) + pruned per-query scan at
  *     nprobe ∈ {4, 8} of nlist=64, with recall vs brute on the panel;
  *   - binary (sign-bit) build (one pack pass) + Hamming-prefilter query
  *     at prefilter ∈ {200, 1000}, with recall vs brute.
  * Vectors are hash-generated around 32 planted cluster centers so
  * "nearest" is structured, not uniform noise (uniform noise makes every
  * ANN method look uselessly bad and hides the pruning economics).
  * Results feed SCALE.md §"ANN at 1 M vectors".
  */
object AnnScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      // NOTE: spark.driver.memory is a no-op for an in-process builder
      // (heap is fixed at JVM launch) — the probe runs on the sbt JVM's
      // heap; size it via SBT_OPTS/-Xmx if the corpus is scaled up
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 32 clusters; dim j of vector i = center(i%32, j) + noise(i, j),
    // both hash-derived in [-1, 1], noise scaled to 0.35 so clusters are
    // separable but overlapping
    val dim = 64
    val vecs = spark.range(n)
      .select(col("id").as("vec_id"),
        expr(s"""transform(sequence(0, ${dim - 1}), j -> CAST(
          (pmod(hash(pmod(id, 32), j), 1000) / 500.0 - 1.0) +
          0.35 * (pmod(hash(id, j), 1000) / 500.0 - 1.0) AS FLOAT))""")
          .as("embedding"),
        pmod(col("id"), lit(32)).cast("int").as("label"))
      .persist()
    println(s"[ann-scale] corpus: ${vecs.count()} vectors x $dim dims")

    val qids = Seq(11L, 333L, 55555L, 777777L).filter(_ < n)
    def qvOf(qid: Long): DataFrame =
      vecs.filter(col("vec_id") === qid)
        .select(col("embedding").as("q_embedding"))

    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ann-scale] $what: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // ---- brute force baseline (also the recall referee)
    val bruteSets: Map[Long, Set[Long]] = qids.map { qid =>
      qid -> timed(s"brute top-10 qid=$qid") {
        Similarity.bruteForceTopK(vecs.filter(col("vec_id") =!= qid),
            qvOf(qid), 10)
          .select("vec_id").collect().map(_.getLong(0)).toSet
      }
    }.toMap

    // ---- IVF: one build pass (seed centroids, argmax assignment), then
    // pruned scans; recall vs brute per nprobe
    val cents = timed("ivf centroid seed collect") {
      Similarity.seedCentroids(vecs, 64)
    }
    val assigned = timed("ivf build (assignment pass)") {
      val a = Similarity.assignLists(vecs, cents).persist()
      a.count(); a
    }
    for (np <- Seq(4, 8)) {
      val recalls = qids.map { qid =>
        val q = vecs.filter(col("vec_id") === qid)
          .select(col("embedding")).collect()(0).getSeq[Float](0).toArray
        val probes = Similarity.probeRanking(cents, q).take(np)
        val got = timed(s"ivf query qid=$qid nprobe=$np/64") {
          Similarity.ivfTopKPreAssigned(
              assigned.filter(col("vec_id") =!= qid), qvOf(qid), 10,
              probes.toIndexedSeq)
            .select("vec_id").collect().map(_.getLong(0)).toSet
        }
        (got & bruteSets(qid)).size
      }
      println(s"[ann-scale] ivf nprobe=$np recall@10 per query: " +
        s"${recalls.map(_ / 10.0).mkString(", ")}")
    }

    // ---- binary quantization: one pack pass (8 bytes/vector), then
    // Hamming-prefilter queries
    val packed = timed("binary build (sign-pack pass)") {
      val p = vecs.withColumn("bits", Similarity.signBits("embedding"))
        .persist()
      p.count(); p
    }
    for (pf <- Seq(200, 1000, 10000)) {
      val recalls = qids.map { qid =>
        val got = timed(s"binary query qid=$qid prefilter=$pf") {
          Similarity.binaryTopK(
              packed.filter(col("vec_id") =!= qid),
              qvOf(qid), 10, prefilter = pf)
            .select("vec_id").collect().map(_.getLong(0)).toSet
        }
        (got & bruteSets(qid)).size
      }
      println(s"[ann-scale] binary prefilter=$pf recall@10 per query: " +
        s"${recalls.map(_ / 10.0).mkString(", ")}")
    }

    spark.stop()
  }
}
