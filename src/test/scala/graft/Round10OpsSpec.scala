package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Round-10 additions: HITS hub/authority scoring and multi-source BFS
  * hop expansion — semantic invariants on hand-analyzable graphs beyond
  * the unrolled-oracle gate entries (x58, x59).
  */
class Round10OpsSpec extends GraftSparkSpec {
  import spark.implicits._

  test("hits on a bipartite star: center authority dominates, hubs symmetric") {
    // 3 hubs all point at authority 10; one hub also points at 11.
    // 10 must out-rank 11; hubs 1 and 2 (identical out-sets) tie.
    val e = Seq((1L, 10L), (2L, 10L), (3L, 10L), (3L, 11L))
      .toDF("src", "dst")
    val r = Graph.hits(e, iters = 2).as[(Long, Long, Long)]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r(10L)._1 > r(11L)._1)          // endorsed by 3 hubs vs 1
    assert(r(1L)._1 == 0L && r(1L)._2 > 0) // pure hub: no authority
    assert(r(10L)._2 == 0L)                // pure authority: no hub score
    assert(r(1L) == r(2L))                 // identical out-sets tie
    assert(r(3L)._2 > r(1L)._2)            // 3 endorses more mass
  }

  test("hits renormalization bounds each half-score sum by scale") {
    val e = Seq((1L, 10L), (2L, 10L), (2L, 11L), (11L, 1L))
      .toDF("src", "dst")
    val rows = Graph.hits(e, iters = 3, scale = 1000000L)
      .as[(Long, Long, Long)].collect()
    // integer truncation only loses mass, never creates it
    assert(rows.map(_._2).sum <= 1000000L)
    assert(rows.map(_._3).sum <= 1000000L)
    assert(rows.map(_._2).sum > 900000L) // ...and loses only dust
  }

  test("bfs labels hops minimally and stops at maxDepth") {
    // path 1 -> 2 -> 3 -> 4 -> 5 plus shortcut 1 -> 3
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 3L))
      .toDF("src", "dst")
    val d = Graph.bfs(e, Seq(1L).toDF("source"), maxDepth = 2)
      .as[(Long, Int)].collect().toMap
    assert(d == Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2)) // 5 beyond depth
  }

  test("bfs multi-source takes the nearest seed; isolated seeds stay at 0") {
    val e = Seq((1L, 2L), (2L, 3L), (9L, 3L)).toDF("src", "dst")
    val d = Graph.bfs(e, Seq(1L, 9L, 42L).toDF("source"), maxDepth = 3)
      .as[(Long, Int)].collect().toMap
    assert(d(3L) == 1)   // via seed 9, not 2 hops via seed 1
    assert(d(42L) == 0)  // seed absent from the graph is still level 0
    assert(!d.contains(4L))
  }

  test("video decoder seam: a custom decoder drives the frame operators") {
    import graft.operators.Multimodal
    // 2×1 solid frames derived from the payload length — a stand-in for a
    // JavaCV/ffmpeg-backed impl, exercising exactly the seam contract
    // (packed bottom-up 24-bit BGR rows, 4-byte padded: 2 px -> 8 bytes)
    object FakeDecoder extends Multimodal.VideoDecoder {
      def decode(c: Array[Byte]): (Int, Int, Int, Array[Array[Byte]]) = {
        val v = (c.length % 256).toByte
        (2, 1, 2, Array.fill(2)(Array[Byte](v, v, v, v, v, v, 0, 0)))
      }
    }
    val media = Seq((1L, Array[Byte](9, 9, 9)), (2L, Array[Byte](1)))
      .toDF("doc_id", "content")
    val out = Multimodal.decodeVideo(spark, media, FakeDecoder)
      .as[(Long, Int, Int, Int, Int, Double, Double, Double)].collect()
    assert(out.length == 4) // 2 docs × 2 frames
    val r = out.find(t => t._1 == 1L && t._2 == 0).get
    assert(r._4 == 2 && r._5 == 1)            // w=2, h=1
    assert(r._6 == 3.0 && r._7 == 3.0 && r._8 == 3.0) // len-3 payload
    // default-decoder path unchanged: the x39 gate still parses real AVIs
    val avi = Multimodal.synthesizeVideo(spark,
      Seq(5L).toDF("doc_id"))
    assert(Multimodal.decodeVideo(spark, avi).count() == 5 % 6 + 2)
  }

  test("asof nearest picks the closer side, ties backward, tolerance filters") {
    import graft.plans.AsofJoin
    val l = Seq((1L, 10L, "c1"), (1L, 11L, "c2"), (1L, 20L, "c3"),
        (2L, 5L, "c4"))
      .toDF("key", "at", "tag")
    val r = Seq((1L, 8L, "a"), (1L, 14L, "b"), (1L, 29L, "c"))
      .toDF("key", "at", "v")
    def run(tol: Long) = AsofJoin
      .joinAsof(l, r, "key", "at", Seq("v"), direction = "nearest",
        tolerance = tol)
      .select("tag", "v").as[(String, Option[String])].collect().toMap
    val m = run(-1L)
    assert(m("c1").contains("a")) // dist 2 back vs 4 fwd
    assert(m("c2").contains("a")) // dist 3 == 3: tie -> backward
    assert(m("c3").contains("b")) // dist 6 back vs 9 fwd
    assert(m("c4").isEmpty)       // key 2: no right rows at all
    val t5 = run(5L)
    assert(t5("c1").contains("a"))
    assert(t5("c3").isEmpty)      // both sides beyond tolerance 5
    val t8 = run(8L)
    assert(t8("c3").contains("b")) // backward (6) inside, forward (9) out
  }

  test("quality router splits pass/quarantine idempotently per batch") {
    import graft.streaming.StreamingAnalytics
    val tmp = java.nio.file.Files.createTempDirectory("graft-r10-route")
      .toString
    val docs = Seq(
      (1L, "one two three four five six seven"),       // pass
      (2L, "short"),                                   // fail: words
      (3L, "antidisestablishmentarianism " * 6)        // fail: word length
    ).toDF("doc_id", "text")
    val (p1, f1) = StreamingAnalytics.routeBatch(docs, 7L,
      s"$tmp/pass", s"$tmp/quar", minWords = 5, maxMeanWordLen = 12.0)
    assert((p1, f1) == (1L, 2L))
    val passed = spark.read.parquet(s"$tmp/pass/batch=7")
      .select("doc_id").as[Long].collect().toSet
    assert(passed == Set(1L))
    val quar = spark.read.parquet(s"$tmp/quar/batch=7")
    assert(quar.columns.contains("n_words")) // signals kept for review
    assert(quar.select("doc_id").as[Long].collect().toSet == Set(2L, 3L))
    // replay of the same batch id rewrites the same rows, no duplication
    val (p2, f2) = StreamingAnalytics.routeBatch(docs, 7L,
      s"$tmp/pass", s"$tmp/quar", minWords = 5, maxMeanWordLen = 12.0)
    assert((p2, f2) == (1L, 2L))
    assert(spark.read.parquet(s"$tmp/pass/batch=7").count() == 1)
    assert(spark.read.parquet(s"$tmp/quar/batch=7").count() == 2)
  }

  test("quality router end-to-end over a MemoryStream") {
    import graft.streaming.StreamingAnalytics
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-r10-routes")
      .toString
    val in = MemoryStream[(Long, String)]
    val q = StreamingAnalytics.qualityRoute(
      in.toDF().toDF("doc_id", "text"),
      s"$tmp/pass", s"$tmp/quar", s"$tmp/ckpt")
    in.addData((10L, "a b c d e f g"), (11L, "x"))
    q.processAllAvailable()
    in.addData((12L, "h i j k l m n o p"))
    q.processAllAvailable()
    q.stop()
    val pass = spark.read.parquet(s"$tmp/pass/batch=*")
      .select("doc_id").as[Long].collect().toSet
    val quar = spark.read.parquet(s"$tmp/quar/batch=*")
      .select("doc_id").as[Long].collect().toSet
    assert(pass == Set(10L, 12L) && quar == Set(11L))
  }

  test("topk_struct equals the window form across partition merges") {
    import graft.functions.AggFunctions
    // 1000 rows over 7 groups, shuffled across 8 partitions: partial
    // heaps MUST merge (and serde) to agree with the window form
    val df = spark.range(1000).selectExpr("id % 7 AS g",
        "CAST((id * 37) % 211 AS BIGINT) AS v", "id")
      .repartition(8)
    val viaAgg = df.groupBy("g")
      .agg(AggFunctions.topKStruct(
        struct((-col("v")).as("nv"), col("id")), 5).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).as("rk"),
        col("col.id").as("id"), (-col("col.nv")).as("v"))
    import org.apache.spark.sql.expressions.Window
    val viaWindow = df.withColumn("rk", row_number().over(
        Window.partitionBy("g").orderBy(desc("v"), col("id"))))
      .filter(col("rk") <= 5)
      .select(col("g"), col("rk").cast("long").as("rk"), col("id"), col("v"))
    assert(viaAgg.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaAgg).isEmpty)
    // k larger than a group: returns the whole group, still sorted
    val small = Seq((1L, 5L, 1L), (1L, 9L, 2L)).toDF("g", "v", "id")
      .groupBy("g")
      .agg(AggFunctions.topKStruct(
        struct((-col("v")).as("nv"), col("id")), 10).as("top"))
      .select(size(col("top")).as("n")).as[Int].head()
    assert(small == 2)
  }

  test("appendIvfIndex: incremental build equals the one-shot index") {
    import graft.operators.Similarity
    val tmp = java.nio.file.Files.createTempDirectory("graft-r10-ivf")
      .toString
    val all = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val head = all.filter(col("vec_id") < 300)
    val tail = all.filter(col("vec_id") >= 300)
    // one-shot index over everything
    Similarity.writeIvfIndex(all, s"$tmp/full", nlist = 8)
    // incremental: build on the head (same seed centroids — first nlist
    // by vec_id), append the tail under the frozen quantizer
    Similarity.writeIvfIndex(head, s"$tmp/inc", nlist = 8)
    Similarity.appendIvfIndex(tail, s"$tmp/inc")
    val q = all.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_embedding"))
    val a = Similarity.ivfIndexTopK(spark, s"$tmp/full", q, k = 10, nprobe = 4)
      .collect().map(_.toSeq).toSeq
    val b = Similarity.ivfIndexTopK(spark, s"$tmp/inc", q, k = 10, nprobe = 4)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
    // both indexes hold every vector
    assert(spark.read.parquet(s"$tmp/inc/lists").count() == all.count())
  }

  test("appendUnique drops corpus and in-batch duplicates; replay is a no-op") {
    import graft.streaming.StreamingAnalytics
    val tmp = java.nio.file.Files.createTempDirectory("graft-r10-uniq")
      .toString
    val b1 = Seq((1L, "alpha text"), (2L, "beta text"), (3L, "alpha text"))
      .toDF("doc_id", "text")
    // in-batch dup (3 repeats 1's text): only the lowest id survives
    assert(StreamingAnalytics.appendUniqueBatch(b1, "text", "doc_id",
      s"$tmp/corpus", nBuckets = 8) == 2)
    val b2 = Seq((4L, "beta text"), (5L, "gamma text"))
      .toDF("doc_id", "text")
    // cross-batch dup (4 repeats 2's text): only the novel row appends
    assert(StreamingAnalytics.appendUniqueBatch(b2, "text", "doc_id",
      s"$tmp/corpus", nBuckets = 8) == 1)
    // replay of batch 2: everything already present -> nothing appended
    assert(StreamingAnalytics.appendUniqueBatch(b2, "text", "doc_id",
      s"$tmp/corpus", nBuckets = 8) == 0)
    val corpus = spark.read.parquet(s"$tmp/corpus")
    assert(corpus.count() == 3)
    assert(corpus.select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 5L))
    // one row per distinct content hash
    assert(corpus.select("content_hash").distinct().count() == 3)
  }

  test("bfs agrees with a sequential BFS model on random graphs") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      val edges = Seq.fill(80)(
        (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong)).distinct
      val seeds = Seq(0L, 13L)
      // sequential model: classic queue BFS over the adjacency map
      val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
      val dist = scala.collection.mutable.Map(seeds.map(_ -> 0): _*)
      var frontier = seeds
      var d = 0
      while (frontier.nonEmpty && d < 6) {
        d += 1
        frontier = frontier.flatMap(n => adj.getOrElse(n, Nil))
          .distinct.filterNot(dist.contains)
        frontier.foreach(n => dist(n) = d)
      }
      val got = Graph.bfs(edges.toDF("src", "dst"),
          seeds.toDF("source"), maxDepth = 6)
        .as[(Long, Int)].collect().toMap
      assert(got == dist.toMap)
    }
  }

  test("bfs early-stops when the frontier drains before maxDepth") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val d = Graph.bfs(e, Seq(1L).toDF("source"), maxDepth = 50)
      .as[(Long, Int)].collect().toMap
    assert(d == Map(1L -> 0, 2L -> 1))
  }
}
