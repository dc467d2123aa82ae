package graft

import graft.operators.{Contamination, Dedup, Layout}
import org.apache.spark.sql.functions._

/** Semantic checks for the round-6 additions: Z-order layout keys,
  * sorted-neighborhood dedup, and bloom-prefiltered decontamination.
  */
class Round6OpsSpec extends GraftSparkSpec {
  import spark.implicits._

  // independent reference interleave: bit i of a -> bit 2i, bit i of b -> 2i+1
  private def refZ(a: Long, b: Long): Long = {
    var z = 0L
    for (i <- 0 until 16) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zkey2 equals the bit-by-bit Morton interleave on edge + random values") {
    val cases = Seq((0L, 0L), (0xFFFFL, 0L), (0L, 0xFFFFL), (0xFFFFL, 0xFFFFL),
      (1L, 2L), (23L, 1023L), (0x1234L, 0xABCDL), (65535L, 32768L))
    val got = cases.toDF("a", "b")
      .select(Layout.zkey2(col("a"), col("b"))).as[Long].collect()
    assert(got.toSeq == cases.map { case (a, b) => refZ(a, b) })
  }

  test("zkey2 is monotone in each dimension holding the other fixed") {
    // along one dimension the even (resp. odd) interleaved bits preserve
    // order — the property that makes range pruning on zkey work
    val axis = (0L until 64L)
    assert(axis.map(refZ(_, 7L)) == axis.map(refZ(_, 7L)).sorted)
    assert(axis.map(refZ(9L, _)) == axis.map(refZ(9L, _)).sorted)
  }

  test("zorderBy clusters both dimensions: per-partition zkey ranges are disjoint") {
    val df = (0 until 1024).map(i => (i.toLong, (i % 24).toLong, (i % 32).toLong))
      .toDF("id", "h", "ub")
    val z = Layout.zorderBy(df, col("h"), col("ub"), partitions = 8)
    val ranges = z.select(col("zkey"))
      .mapPartitions(it => {
        val v = it.map(_.getLong(0)).toSeq
        if (v.isEmpty) Iterator.empty
        else Iterator.single((v.min, v.max, v == v.sorted))
      }).collect()
    assert(ranges.forall(_._3), "zkey must be sorted within partitions")
    val sorted = ranges.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array((_, max1, _), (min2, _, _)) => assert(max1 <= min2)
      case _ =>
    }
  }

  test("sortedNeighborhood finds planted adjacent near-dups, exact jaccard") {
    // two near-identical docs (same length, same prefix) + unrelated noise:
    // the (ntok, pfx) sort makes them neighbors, verify confirms them
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "en"),
      (2L, "alpha beta gamma delta epsilon eta", "en"),
      (3L, "one two three four five six", "en"),
      (4L, "completely different words entirely here now", "de")
    ).toDF("doc_id", "text", "lang")
    val pairs = Dedup.sortedNeighborhood(docs, "doc_id", "text",
      blockCol = "lang", window = 3, threshold = 0.2).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    // jaccard of the planted pair: shingles of 6 tokens = 4 each, 3 shared
    // -> 3 / (4 + 4 - 3) = 0.6
    assert(pairs.head.getAs[Double]("jaccard") == 0.6)
  }

  test("clusters: driver union-find path equals the distributed loop and the star variant") {
    // random-ish deterministic graph: chains, a clique, singleton pairs
    val pairs = (
      (1L to 40L).sliding(2).map(s => (s(0), s(1))).toSeq ++ // 40-node chain
        Seq((100L, 101L), (101L, 102L), (100L, 102L)) ++     // clique
        Seq((200L, 300L))
      ).toDF("id_a", "id_b")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = asMap(Dedup.clusters(pairs)) // under the small-graph guard
    val dist = asMap(Dedup.clusters(pairs, smallGraphEdges = 0L))
    val stars = asMap(Dedup.clustersAlternating(pairs))
    assert(local == dist)
    assert(local == stars)
    assert(local(40L) == 1L && local(102L) == 100L && local(300L) == 200L)
  }

  test("nearDupIngest flags stream docs against the standing corpus per batch") {
    implicit val sc = spark.sqlContext
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight")
    ).toDF("doc_id", "text")
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val tmp = java.nio.file.Files.createTempDirectory("graft-ndi").toString
    val q = graft.streaming.StreamingAnalytics.nearDupIngest(
      in.toDF().toDF("doc_id", "text"), corpus, "doc_id", "text",
      s"$tmp/out", s"$tmp/ckpt", threshold = 0.5)
    try {
      // batch 0: one near-dup of corpus doc 1, one unrelated doc
      in.addData((10L, "alpha beta gamma delta epsilon zeta eta iota"),
        (11L, "totally unrelated words appear here instead now right"))
      q.processAllAvailable()
      // batch 1: a near-dup of corpus doc 2
      in.addData((12L, "one two three four five six seven nine"))
      q.processAllAvailable()
      val out = spark.read.parquet(s"$tmp/out")
        .select("wave", "batch_id", "corpus_id")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      assert(out == Set((0, 10L, 1L), (1, 12L, 2L)))
    } finally q.stop()
  }

  test("persisted dedup index equals fresh sketching for incremental dedup") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val corpus = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
    val tmp = java.nio.file.Files.createTempDirectory("graft-idx").toString
    Dedup.writeIndex(corpus, "doc_id", "text", s"$tmp/idx")
    val fresh = Dedup.incrementalNearDup(corpus, batch,
      "doc_id", "text", threshold = 0.2).collect().toSeq
    val loaded = Dedup.incrementalNearDupIndexed(
      Dedup.loadIndex(spark, s"$tmp/idx"), batch,
      "doc_id", "text", threshold = 0.2).collect().toSeq
    assert(loaded == fresh)
    assert(fresh.nonEmpty)
  }

  test("persisted IVF index: pruned query equals in-memory IVF; exhaustive equals brute force") {
    import graft.operators.Similarity
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val query = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_embedding"))
    val rest = e.filter(col("vec_id") =!= 0)
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    Similarity.writeIvfIndex(rest, s"$tmp/ivf", nlist = 8)
    // partition pruning: the probed scan must read fewer list dirs
    val pruned = Similarity.ivfIndexTopK(spark, s"$tmp/ivf", query, 10,
      nprobe = 2)
    val mem = Similarity.ivfTopK(rest, query, 10, nlist = 8, nprobe = 2)
    assert(pruned.collect().toSeq == mem.collect().toSeq)
    // exhaustive probes == brute force (recall contract)
    val all = Similarity.ivfIndexTopK(spark, s"$tmp/ivf", query, 10,
      nprobe = 8)
    val brute = Similarity.bruteForceTopK(rest, query, 10)
    assert(all.collect().toSeq == brute.collect().toSeq)
  }

  test("containment finds a planted excerpt that Jaccard misses") {
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val excerpt = (1 to 8).map(i => s"w$i").mkString(" ") // prefix of `long`
    val docs = Seq(
      (1L, long), (2L, excerpt),
      (3L, "completely different words entirely here now today")
    ).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, "doc_id", "text", threshold = 0.8)
      .collect()
    // excerpt shingles: 6 of 6 inside doc 1 -> cont_b = 1.0; cont_a small
    assert(cont.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    assert(cont.head.getAs[Double]("cont_b") == 1.0)
    assert(cont.head.getAs[Double]("cont_a") < 0.2)
    // the symmetric metric misses it at the same bar: union is large
    val jac = Dedup.ngramJaccard(docs, "doc_id", "text", threshold = 0.8)
    assert(jac.collect().isEmpty)
  }

  test("decontaminateBloom equals exact decontaminate on the gate fixture") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val train = docs.filter(pmod(col("doc_id"), lit(20)) =!= 0)
    val bench = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
    val exact = Contamination.decontaminate(train, bench, "doc_id", "text", n = 8)
      .select("doc_id").as[Long].collect().sorted
    val bloom = Contamination.decontaminateBloom(train, bench, "doc_id", "text", n = 8)
      .select("doc_id").as[Long].collect().sorted
    assert(bloom.toSeq == exact.toSeq)
    assert(exact.nonEmpty && exact.length < train.count())
  }

  test("compact merges a many-file dir to the byte-sized count, content intact") {
    val base = s"/tmp/graft-compact-${System.nanoTime()}"
    // 64 tiny files
    spark.range(0, 20000).selectExpr("id", "id % 7 AS k")
      .repartition(64).write.parquet(s"$base/in")
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val inFiles = fs.listStatus(new org.apache.hadoop.fs.Path(s"$base/in"))
      .count(_.getPath.getName.endsWith(".parquet"))
    assert(inFiles == 64)
    val total = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(s"$base/in")).getLength
    // target a quarter of the input -> expect ceil(total/target) = 4 files
    val n = Layout.compact(spark, s"$base/in", s"$base/out", total / 4 + 1)
    assert(n >= 3 && n <= 5, s"got $n output files")
    val a = spark.read.parquet(s"$base/in").as[(Long, Long)].collect().sorted
    val b = spark.read.parquet(s"$base/out").as[(Long, Long)].collect().sorted
    assert(a.toSeq == b.toSeq)
    // sorted variant keeps per-file id ranges disjoint (footer pruning)
    Layout.compact(spark, s"$base/in", s"$base/sorted", total / 4 + 1,
      sortCols = Seq("id"))
    val ranges = spark.read.parquet(s"$base/sorted")
      .select(input_file_name().as("f"), col("id"))
      .groupBy("f").agg(min("id").as("lo"), max("id").as("hi"))
      .as[(String, Long, Long)].collect().sortBy(_._2)
    ranges.sliding(2).foreach {
      case Array(x, y) => assert(x._3 < y._2, s"overlap: $x vs $y")
      case _ =>
    }
  }
}
