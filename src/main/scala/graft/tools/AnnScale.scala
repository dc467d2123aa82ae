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

  private def session(): SparkSession = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      // NOTE: spark.driver.memory is a no-op for an in-process builder
      // (heap is fixed at JVM launch) — the probe runs on the sbt JVM's
      // heap; size it via SBT_OPTS/-Xmx if the corpus is scaled up
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }

  // 32 planted clusters; dim j of vector i = center(i%32, j) +
  // noise(i, j), both hash-derived in [-1, 1], noise scaled to 0.35 so
  // clusters are separable but overlapping
  private def fixture(spark: SparkSession, n: Long): org.apache.spark.sql.DataFrame = {
    val dim = 64
    spark.range(n)
      .select(col("id").as("vec_id"),
        expr(s"""transform(sequence(0, ${dim - 1}), j -> CAST(
          (pmod(hash(pmod(id, 32), j), 1000) / 500.0 - 1.0) +
          0.35 * (pmod(hash(id, j), 1000) / 500.0 - 1.0) AS FLOAT))""")
          .as("embedding"),
        pmod(col("id"), lit(32)).cast("int").as("label"))
  }

  /** x87 semantic dedup at probe scale: runs the CAPPED pipeline
    * (scaled k = ceil(n/targetSize), repCap window) end-to-end and
    * reports measured wall time + pair volumes, with two analytic
    * counterfactuals per the x77 method: the r13-shipped shape (k fixed
    * at 8, no window cap) and the worst-case all-one-cluster skew bound.
    */
  private def semDedupProbe(spark: SparkSession, n: Long,
                            targetSize: Int): Unit = {
    import graft.operators.Similarity
    val repCap = 256
    val vecs = fixture(spark, n).persist()
    println(s"[ann-scale] semdedup corpus: ${vecs.count()} vectors, " +
      s"targetSize=$targetSize repCap=$repCap")

    def pairVolumes(sizes: Array[Long]): (BigInt, BigInt) = {
      def c2(m: BigInt): BigInt = m * (m - 1) / 2
      val uncapped = sizes.map(s => c2(BigInt(s))).sum
      val capped = sizes.map { s =>
        c2(BigInt(math.min(s, repCap.toLong))) +
          BigInt(math.max(0L, s - repCap)) * repCap
      }.sum
      (uncapped, capped)
    }

    // the capped pipeline, measured end-to-end (kmeans train included)
    val t0 = System.nanoTime()
    val (cents, removal, _) = Similarity.semanticDedupState(
      vecs, targetSize = targetSize, repCap = repCap, tau = 0.3)
    val removed = removal.count()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"[ann-scale] semdedup capped pipeline: k=${cents.length} " +
      f"removed=$removed wall=$wall%.1f s")

    // actual cluster-size histogram -> capped vs uncapped pair volume
    val sizes = Similarity.assignClusters(vecs, cents)
      .groupBy("cluster").agg(count(lit(1)).as("n"))
      .select("n").collect().map(_.getLong(0))
    val (uncapped, capped) = pairVolumes(sizes)
    println(s"[ann-scale] semdedup scaled-k pair volume: " +
      s"capped=$capped uncapped=$uncapped " +
      s"(maxCluster=${sizes.max}, ${sizes.length} clusters)")

    // r13-shipped counterfactual: k fixed at 8, NO window cap
    val cents8 = Similarity.kmeansCentroids(vecs, 8, iters = 1)
    val sizes8 = Similarity.assignClusters(vecs, cents8)
      .groupBy("cluster").agg(count(lit(1)).as("n"))
      .select("n").collect().map(_.getLong(0))
    val (uncapped8, capped8) = pairVolumes(sizes8)
    println(s"[ann-scale] semdedup k=8 counterfactual: uncapped=$uncapped8 " +
      s"(capped-at-k8 would be $capped8; maxCluster=${sizes8.max})")
    // worst-case skew bound: everything in ONE cluster
    val (worstU, worstC) = pairVolumes(Array(n))
    println(s"[ann-scale] semdedup all-one-cluster bound: " +
      s"capped<=$worstC vs uncapped $worstU")
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("semdedup")) {
      val n = args.drop(1).headOption.map(_.toLong).getOrElse(1000000L)
      val ts = args.drop(2).headOption.map(_.toInt).getOrElse(512)
      semDedupProbe(session(), n, ts)
      return
    }
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val spark = session()
    val vecs = fixture(spark, n).persist()
    println(s"[ann-scale] corpus: ${vecs.count()} vectors x 64 dims")

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
