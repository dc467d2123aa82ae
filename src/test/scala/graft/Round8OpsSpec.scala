package graft

import graft.operators.Multimodal
import graft.queries.{ExtensionQueries, TextQueries, VectorQueries}
import org.apache.spark.sql.functions._

/** Semantic checks for the round-8 additions beyond the oracle gate:
  * audio framing arithmetic, repeated-n-gram threshold semantics, DSIR
  * score consistency, and kNN-graph edge invariants.
  */
class Round8OpsSpec extends GraftSparkSpec {
  import spark.implicits._

  test("frameAudio energies match a hand-computed fixture") {
    // doc 0 synthesizes n = 20 samples s[j] = (j*17) % 2001 - 1000;
    // frames of 8 with hop 4 -> 4 frames, energies computed by hand here
    val docs = Seq(0L).toDF("doc_id")
    val got = Multimodal.frameAudio(spark,
        Multimodal.synthesizeAudio(spark, docs))
      .as[(Long, Int, Long, Long, Int)].collect().head
    def s(j: Int): Long = (j * 17) % 2001 - 1000
    val energies = (0 until 4).map(f =>
      (0 until 8).map(j => s(f * 4 + j) * s(f * 4 + j)).sum)
    assert(got == ((0L, 4, energies.sum, energies.max,
      energies.indexOf(energies.max))))
  }

  test("frameAudio emits zero frames for sub-frame-length audio") {
    // a doc with fewer samples than one frame must yield n_frames = 0,
    // not a partial frame (framing contract: only FULL windows count)
    val docs = Seq(0L).toDF("doc_id")
    val media = Multimodal.synthesizeAudio(spark, docs)
    val got = Multimodal.frameAudio(spark, media, frameLen = 64, hop = 4)
      .select("n_frames").as[Int].collect().head
    assert(got == 0)
  }

  test("x44 repeated-ngram threshold equals the brute-force 5% df cut") {
    val dir = sfDir
    val got = ExtensionQueries.all("x44_repeated_ngrams")
      .fn(spark, dir).select("gram", "ndocs").as[(String, Long)]
      .collect().toMap
    // brute force: explode bigrams by hand, count distinct docs
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = docs.count()
    val brute = docs
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(tk) - 2), " +
          "i -> concat(tk[i], ' ', tk[i + 1]))")).as("gram"))
      .groupBy("gram").agg(countDistinct("doc_id").as("ndocs"))
      .filter(col("ndocs") >= n * 0.05)
      .as[(String, Long)].collect().toMap
    assert(got == brute)
  }

  test("d33 DSIR micro-sums are consistent: doc total equals bucket total") {
    // sum over docs of logw_micro must equal sum over buckets of
    // raw_count * lrm — the integer-exact bookkeeping the quantization
    // buys (any row lost in the score join breaks this identity)
    val dir = sfDir
    val scores = TextQueries.all("d33_dsir_weights").fn(spark, dir)
    val docTotal = scores.agg(sum("logw_micro")).as[Long].collect().head
    val tok = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .withColumn("b", (length(col("w")) * 37
        + ascii(substring(col("w"), 1, 1)) * 31
        + ascii(substring(col("w"), -1, 1))) % 64)
    val nt = tok.filter(col("lang") === "en").count().toDouble
    val nr = tok.count().toDouble
    val bucketTotal = tok.groupBy("b").count()
      .join(tok.filter(col("lang") === "en").groupBy("b")
        .agg(count(lit(1)).as("ct")), Seq("b"), "left")
      .select(sum(col("count") *
        round((log((coalesce(col("ct"), lit(0.0)) + lit(1)) / (nt + 64))
          - log((col("count").cast("double") + lit(1)) / (nr + 64)))
          * 1e6).cast("long")))
      .as[Long].collect().head
    assert(docTotal == bucketTotal)
  }

  test("x46 kNN graph: 3 ranked edges per src, mutual flags are symmetric-consistent") {
    val dir = sfDir
    val edges = VectorQueries.all("x46_knn_graph").fn(spark, dir)
      .as[(Long, Long, Int, Double, Int)].collect()
    val bySrc = edges.groupBy(_._1)
    assert(bySrc.values.forall(_.map(_._3).sorted.sameElements(Seq(1, 2, 3))))
    val edgeSet = edges.map(e => (e._1, e._2)).toSet
    edges.foreach { case (src, dst, _, _, mutual) =>
      assert((mutual == 1) == edgeSet.contains((dst, src)),
        s"mutual flag wrong for $src->$dst")
    }
    // sims are within [-1, 1] and non-increasing with rank
    bySrc.values.foreach { es =>
      val sorted = es.sortBy(_._3).map(_._4)
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
      assert(es.forall(e => e._4 >= -1.0 && e._4 <= 1.0))
    }
  }
}
