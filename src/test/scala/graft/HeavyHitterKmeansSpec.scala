package graft

import scala.util.Random

import graft.functions.AggFunctions
import org.apache.spark.sql.functions._

/** Semantic checks for the sketch-then-recount heavy hitters, segment-strip
  * dedup, k-means assignment, int8-quantized ANN, and RAG chunking.
  */
class HeavyHitterKmeansSpec extends GraftSparkSpec {
  import spark.implicits._

  test("misra_gries candidates cover every item above N/(k+1) across merged partitions") {
    // Zipf-ish stream: token i appears ~ N/i times — guarantees a handful
    // of true heavy hitters and a long tail the sketch must survive.
    val rnd = new Random(42)
    val stream = (1 to 60).flatMap(i => Seq.fill(3000 / i)(s"tok$i")) ++
      (0 until 4000).map(_ => s"tail${rnd.nextInt(2000)}")
    val df = stream.toDF("token").repartition(8) // force the merge path
    val k = 30
    val Array(row) = df
      .agg(count(lit(1)).as("n"), AggFunctions.misraGries(col("token"), k).as("c"))
      .collect()
    val n = row.getLong(0)
    val cands = row.getSeq[String](1).toSet
    assert(cands.size <= k, s"MG(k=$k) buffer leaked to ${cands.size}")
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong)
    val mustHave = exact.filter { case (_, c) => c * (k + 1) > n }.keys.toSeq
    assert(mustHave.nonEmpty, "fixture produced no heavy hitter")
    val missed = mustHave.filterNot(cands)
    assert(missed.isEmpty, s"MG guarantee violated: missed $missed")
  }

  test("misra_gries bound holds LIVE at sf0.1's real vocabulary " +
      "(r19 verdict item 8 — the d40-style calibration twin)") {
    // the d26 gate proves sketch==exact at the oracle SF; this arm
    // proves the MG guarantee at a 10x-larger REAL vocabulary (Zipfian
    // token distribution, ~100k+ distinct tokens): every token whose
    // exact count clears N/(k+1) must be in the candidate set, and the
    // recount-then-filter pipeline must equal the full-vocabulary
    // groupBy it replaces.
    val dir = new java.io.File("/root/testdata/sf0.1/documents.parquet")
    assume(dir.exists(), "sf0.1 testdata not present on this box")
    import spark.implicits._
    val k = 256
    val toks = spark.read.parquet(dir.getAbsolutePath)
      .select(explode(split(trim(col("text")), "\\s+")).as("token"))
    val Array(row) = toks
      .agg(count(lit(1)).as("n"),
        AggFunctions.misraGries(col("token"), k).as("c"))
      .collect()
    val n = row.getLong(0)
    val cands = row.getSeq[String](1).toSet
    assert(cands.size <= k)
    // exact ground truth over the full vocabulary. MEASURED FACT: the
    // synthetic sf0.1 documents table has a ~31-token vocabulary —
    // SMALLER than the sketch — so on the real table the bound is
    // trivially exhaustive (every token is a candidate); assert that
    // exhaustiveness, then prove the bound where it is NOT trivial.
    val exact = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
    val vocab = exact.count()
    info(s"sf0.1: N=$n tokens, vocabulary=$vocab, candidates=${cands.size}")
    def checkBound(tk: org.apache.spark.sql.DataFrame,
                   label: String): Unit = {
      val Array(r0) = tk
        .agg(count(lit(1)).as("n"),
          AggFunctions.misraGries(col("token"), k).as("c"))
        .collect()
      val nn = r0.getLong(0)
      val cs = r0.getSeq[String](1).toSet
      val ex = tk.groupBy("token").agg(count(lit(1)).as("cnt"))
      val heavy = ex.filter(col("cnt") * (k + 1) > nn)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(heavy.nonEmpty, s"$label: no heavy tokens above N/257")
      val missed = heavy.keySet.diff(cs)
      assert(missed.isEmpty,
        s"MG bound violated ($label): heavy tokens missing from the " +
          s"candidate set: $missed")
      // the d26 pipeline (recount candidates, threshold) equals the
      // full-vocabulary groupBy it replaces, live at this scale
      val viaSketch = tk.filter(col("token").isin(cs.toSeq: _*))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * (k + 1) > nn)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(viaSketch === heavy, s"$label: sketch-then-recount drifted")
    }
    checkBound(toks, s"sf0.1 real table (vocab $vocab)")
    if (vocab <= k)
      info("sf0.1 vocabulary fits the sketch — bound trivially " +
        "exhaustive; the Zipf twin below is the live proof")
    // Zipf twin at the SAME token count scale but a 100k+ vocabulary:
    // rank = floor(exp(U * ln(Rmax))) over U = xxhash64-uniform gives
    // P(rank) ~ 1/rank (Zipf s=1) — hot head, long tail, deterministic
    // across runs. This is where MG actually discards: ~3M tokens,
    // ~100k distinct, 256 counters.
    val zipf = spark.range(0L, 3000000L, 1L, 32)
      .select(concat(lit("z"),
        floor(exp(((abs(xxhash64(col("id"))) % 1000000L) / 1000000.0)
          * math.log(100000.0))).cast("long")).as("token"))
    val zVocab = zipf.distinct().count()
    info(s"zipf twin: vocabulary=$zVocab")
    assert(zVocab > 10 * k,
      "the twin must exercise a vocabulary far larger than the sketch")
    checkBound(zipf, s"zipf twin (vocab $zVocab)")
  }

  test("misra_gries single-partition sequential pass honors the same bound") {
    val stream = Seq.fill(500)("hot") ++ (0 until 700).map(i => s"cold$i")
    val df = stream.toDF("token").coalesce(1)
    val Array(row) =
      df.agg(AggFunctions.misraGries(col("token"), 10).as("c")).collect()
    assert(row.getSeq[String](0).contains("hot"))
  }

  test("segment strip removes exactly the cross-doc duplicated segments") {
    val block = (1 to 8).map(i => s"dup$i").mkString(" ") // one shared segment
    val docs = Seq(
      (0L, block + " " + (1 to 8).map(i => s"a$i").mkString(" ")),
      (1L, block + " " + (1 to 8).map(i => s"b$i").mkString(" ")),
      (2L, (1 to 8).map(i => s"c$i").mkString(" "))).toDF("doc_id", "text")
    // inline mirror of d25's kernel at segment size 8
    val seg = 8
    val t = split(trim(col("text")), "\\s+")
    val segs = docs.withColumn("t", t)
      .withColumn("n_segs", ceil(size(col("t")) / lit(seg.toDouble)).cast("int"))
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), col("n_segs") - 1),
          i => array_join(slice(col("t"), i * seg + 1, lit(seg)), " "))))
    val kept = segs
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("col")))
      .filter(col("df") === 1)
      .groupBy("doc_id").agg(collect_set(col("col")).as("kept"))
      .as[(Long, Seq[String])].collect().toMap
    assert(!kept(0L).exists(_.startsWith("dup")), "shared segment survived in doc 0")
    assert(!kept(1L).exists(_.startsWith("dup")), "shared segment survived in doc 1")
    assert(kept(0L).exists(_.startsWith("a1")) && kept(2L).nonEmpty)
  }

  test("kmeans assignment: every vector lands on its max-cosine centroid") {
    val e = QueryDefTestAccess.t(spark, sfDir, "embeddings")
    val cents = graft.operators.Similarity.kmeansCentroids(e, k = 4, iters = 1)
    val sims = array(cents.map(c =>
      graft.functions.VectorFunctions.vecCosine(col("embedding"),
        array(c.map(lit(_)).toSeq: _*))).toSeq: _*)
    val rows = e.withColumn("sims", sims)
      .withColumn("cluster", array_position(col("sims"), array_max(col("sims"))) - 1)
      .select(col("cluster"), col("sims")).collect()
    rows.foreach { r =>
      val sims = r.getSeq[Double](1)
      assert(sims(r.getLong(0).toInt) == sims.max)
    }
    // k-means must actually move the seeds: refined centroids differ
    val seeds = e.orderBy("vec_id").limit(4).select("embedding")
      .collect().map(_.getSeq[Float](0).toArray)
    assert(cents.zip(seeds).exists { case (a, b) => !a.sameElements(b) })
  }

  test("int8 quantization: per-component error bound and sign preservation") {
    val vecs = Seq((0L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (1L, Array(1e-8f, 2e-8f, -1e-8f, 3e-8f))).toDF("vec_id", "embedding")
    def dbl(c: org.apache.spark.sql.Column) = transform(c, x => x.cast("double"))
    val v = dbl(col("embedding"))
    val maxabs = greatest(array_max(transform(v, x => abs(x))), lit(1e-30))
    val q = vecs.select(col("vec_id"),
        transform(v, x => floor(x * lit(127.0) / maxabs + lit(0.5))).as("q"),
        maxabs.as("m"))
      .as[(Long, Seq[Long], Double)].collect()
      .map { case (k, qv, m) => k -> ((qv, m)) }.toMap
    val (q0, m0) = q(0L)
    assert(q0 == Seq(64L, -127L, 32L, 0L)) // exact expected levels
    // dequantized value within half a step of the original
    Seq(0.5, -1.0, 0.25, 0.0).zip(q0).foreach { case (x, qi) =>
      assert(math.abs(qi * m0 / 127.0 - x) <= m0 / 127.0 / 2 + 1e-12)
    }
    val (q1, _) = q(1L) // tiny vectors still quantize without overflow/NaN
    assert(q1.max <= 127L && q1.min >= -127L)
  }

  test("tfidf cosine: identical docs score 1.0, disjoint docs never pair") {
    val a = (1 to 12).map(i => s"x$i").mkString(" ")
    val b = (1 to 12).map(i => s"y$i").mkString(" ")
    val docs = Seq((0L, a), (1L, a), (2L, b)).toDF("doc_id", "text")
    val got = graft.operators.Dedup
      .tfidfCosinePairs(docs, "doc_id", "text", threshold = 0.1)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((0L, 1L, 1.0))) // the clone pair only, at exactly 1
  }

  test("tfidf cosine weights rare overlap above common overlap") {
    // base vocabulary shared by many docs (high df -> low idf); one rare
    // 3-gram shared by exactly two docs (df=2 -> high idf). The rare-pair
    // sim must exceed every common-overlap pair sim.
    val common = (1 to 10).map(i => s"c$i").mkString(" ")
    val docs = (0L to 5L).map { i =>
      val tail = if (i <= 1) "rare one two" else s"only$i alpha$i beta$i"
      (i, s"$common $tail")
    }.toDF("doc_id", "text")
    val got = graft.operators.Dedup
      .tfidfCosinePairs(docs, "doc_id", "text", threshold = 0.0001, maxDf = 64)
      .as[(Long, Long, Double)].collect()
    val rarePair = got.find(p => p._1 == 0L && p._2 == 1L).get._3
    val others = got.filterNot(p => p._1 == 0L && p._2 == 1L).map(_._3)
    assert(others.forall(_ < rarePair), s"rare=$rarePair others=${others.toSeq}")
  }

  test("centroid outliers: flagged sims are below every unflagged sim") {
    val e = QueryDefTestAccess.t(spark, sfDir, "embeddings")
    val cents = graft.operators.Similarity.kmeansCentroids(e, k = 4, iters = 1)
    val sims = array(cents.map(c =>
      graft.functions.VectorFunctions.vecCosine(col("embedding"),
        array(c.map(lit(_)).toSeq: _*))).toSeq: _*)
    val best = e.withColumn("sim", array_max(sims)).select("vec_id", "sim")
      .as[(Long, Double)].collect()
    val tau = 0.15
    val (out, in) = best.partition(_._2 < tau)
    assert(out.nonEmpty || best.forall(_._2 >= tau))
    if (out.nonEmpty && in.nonEmpty)
      assert(out.map(_._2).max < in.map(_._2).min)
  }

  test("pq encode/adc: codebook members are fixed points; adc is exact on them") {
    import graft.functions.VectorFunctions.{pqAdcDot, pqEncode, vecDot}
    val (nSub, nCodes, d) = (4, 4, 2) // dim 8
    val rnd = new Random(7)
    val cbRows = Array.fill(nCodes)(Array.fill(nSub * d)(rnd.nextFloat() * 2 - 1))
    val cbFlat: Seq[Float] = for {
      s <- 0 until nSub; c <- 0 until nCodes; i <- 0 until d
    } yield cbRows(c)(s * d + i)
    val others = Array.fill(6)(Array.fill(nSub * d)(rnd.nextFloat() * 2 - 1))
    val df = (cbRows ++ others).zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }.toSeq.toDF("id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .withColumn("codes", pqEncode(col("embedding"), typedlit(cbFlat), nSub))
      .withColumn("adc", pqAdcDot(col("embedding"), col("codes"),
        typedlit(cbFlat), nSub))
      .withColumn("selfdot", vecDot(col("embedding"), col("embedding")))
    val rows = df.select("id", "codes", "adc", "selfdot")
      .as[(Long, Seq[Int], Double, Double)].collect().sortBy(_._1)
    // a vector that IS codebook entry c encodes to (c,c,c,c) — each of its
    // subvectors is L2-distance 0 from entry c — and its ADC self-dot is
    // exactly its true self-dot
    rows.take(nCodes).zipWithIndex.foreach { case ((_, codes, adc, sd), c) =>
      assert(codes == Seq.fill(nSub)(c), s"entry $c encoded to $codes")
      assert(math.abs(adc - sd) < 1e-12)
    }
    // every code is in range, every vector got one code per subspace
    rows.foreach { case (_, codes, _, _) =>
      assert(codes.length == nSub && codes.forall(c => c >= 0 && c < nCodes))
    }
  }

  test("pq kernels evaluate through SQL registration") {
    val r = spark.sql(
      """SELECT pq_encode(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |    array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT),
        |          CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT)), 1) AS codes
        |""".stripMargin).head()
    // codebook has two 2-dim entries for the single subspace; the vector
    // equals entry 0
    assert(r.getSeq[Int](0) == Seq(0))
  }

  test("globalNtile matches built-in ntile row-for-row on adversarial sizes") {
    import org.apache.spark.sql.expressions.Window
    for (n <- Seq(1, 3, 7, 8)) {
      // 1003 rows: not divisible by any bucket count — the remainder
      // spread (first N%n buckets take one extra) must match exactly
      val df = (0 until 1003).map(i => (i.toLong, (i * 37 % 211).toLong))
        .toDF("id", "key")
      val expected = df.withColumn("b",
          ntile(n).over(Window.orderBy(col("key"), col("id"))).cast("long"))
        .select("id", "b").as[(Long, Long)].collect().toMap
      val got = graft.operators.Ranking
        .globalNtile(df, Seq(col("key"), col("id")), n, "b")
        .select("id", "b").as[(Long, Long)].collect().toMap
      assert(got == expected, s"ntile($n) diverged")
    }
  }

  test("fim split reassembles to the original document") {
    val doc = (1 to 17).map(i => s"w$i").mkString(" ")
    val r = Seq((0L, doc)).toDF("doc_id", "text")
      .withColumn("t", split(trim(col("text")), "\\s+"))
      .withColumn("n", size(col("t")))
      .withColumn("c1", (col("n") / 3).cast("int"))
      .withColumn("c2", (col("n") * 2 / 3).cast("int"))
      .select(
        array_join(slice(col("t"), lit(1), col("c1")), " ").as("p"),
        array_join(slice(col("t"), col("c1") + 1, col("c2") - col("c1")), " ").as("m"),
        array_join(slice(col("t"), col("c2") + 1, col("n") - col("c2")), " ").as("s"))
      .as[(String, String, String)].head()
    assert(Seq(r._1, r._2, r._3).filter(_.nonEmpty).mkString(" ") == doc)
    // 17 tokens -> cuts at 5 and 11: |prefix|=5 |middle|=6 |suffix|=6
    assert(r._1.split(" ").length == 5 && r._2.split(" ").length == 6)
  }

  test("chunking covers every token exactly twice at stride = size/2 (interior)") {
    val n = 200
    val doc = Seq((0L, (1 to n).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val (sz, stride) = (64, 32)
    val t = split(trim(col("text")), "\\s+")
    val chunks = doc.withColumn("t", t)
      .withColumn("n_chunks", ceil(size(col("t")) / lit(stride.toDouble)).cast("int"))
      .select(posexplode(transform(sequence(lit(0), col("n_chunks") - 1),
        c => slice(col("t"), c * stride + 1, lit(sz)))))
      .filter(size(col("col")) > 0)
      .select(col("pos"), col("col")).as[(Int, Seq[String])].collect()
    // coverage: every token is in >= 1 chunk; interior tokens in exactly 2
    val cover = chunks.flatMap(_._2).groupBy(identity).view.mapValues(_.size)
    (1 to n).foreach(i => assert(cover(s"w$i") >= 1))
    (sz + 1 to n - sz).foreach(i => assert(cover(s"w$i") == 2, s"w$i"))
    // order within chunks reconstructs the doc from even-numbered chunks
    val evens = chunks.filter(_._1 % 2 == 0).sortBy(_._1).flatMap(_._2)
    assert(evens.toSeq == (1 to n).map(i => s"w$i"))
  }
}

/** Test-side access to QueryDef.t (package-private style helper). */
object QueryDefTestAccess {
  def t(s: org.apache.spark.sql.SparkSession, dir: String, name: String) =
    graft.queries.QueryDef.t(s, dir, name)
}
