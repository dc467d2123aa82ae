package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: recall@k of the PQ/ADC ranking (x31) and the int8-quantized
  * ranking (x28) against exact brute-force cosine top-k, over every vector
  * as the query (not just the gate's vec_id=0) — the measurement behind
  * SCALE.md's compression-vs-recall claims.
  */
object PqRecall {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val k = if (args.length > 1) args(1).toInt else 10
    val nQueries = if (args.length > 2) args(2).toInt else 50
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val (nSub, nCodes) = (8, 16)
    val cbRows = e.orderBy("vec_id").limit(nCodes)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    val d = cbRows.head.length / nSub
    val cbFlat: Seq[Float] = for {
      s <- 0 until nSub; c <- 0 until nCodes; i <- 0 until d
    } yield cbRows(c)(s * d + i)
    val cb = typedlit(cbFlat)

    // trained codebook: per-subspace Lloyd's (driver-side here — probe
    // scale; production trains each subspace with the distributed x27
    // machinery over subvector slices)
    val allVecs = e.select("embedding").collect().map(_.getSeq[Float](0).toArray)
    val trained: Array[Array[Array[Double]]] = Array.tabulate(nSub) { s =>
      val sub = allVecs.map(v => v.slice(s * d, s * d + d).map(_.toDouble))
      var cents = cbRows.take(nCodes).map(_.slice(s * d, s * d + d).map(_.toDouble))
      for (_ <- 1 to 8) {
        val assign = sub.map { v =>
          (0 until nCodes).minBy(c => v.zip(cents(c))
            .map { case (a, b) => (a - b) * (a - b) }.sum)
        }
        cents = Array.tabulate(nCodes) { c =>
          val members = sub.indices.filter(assign(_) == c)
          if (members.isEmpty) cents(c)
          else {
            val m = new Array[Double](d)
            members.foreach(i => (0 until d).foreach(j => m(j) += sub(i)(j)))
            m.map(_ / members.size)
          }
        }
      }
      cents
    }
    val cbTrainedFlat: Seq[Float] = for {
      s <- 0 until nSub; c <- 0 until nCodes; i <- 0 until d
    } yield trained(s)(c)(i).toFloat
    val cbT = typedlit(cbTrainedFlat)

    // precompute codes + int8 once (what a production index stores)
    def dbl(c: org.apache.spark.sql.Column) = transform(c, x => x.cast("double"))
    def quant(c: org.apache.spark.sql.Column) = {
      val v = dbl(c)
      val maxabs = greatest(array_max(transform(v, x => abs(x))), lit(1e-30))
      transform(v, x => floor(x * lit(127.0) / maxabs + lit(0.5)))
    }
    val coded = e
      .withColumn("codes",
        graft.functions.VectorFunctions.pqEncode(col("embedding"), cb, nSub))
      .withColumn("codes_t",
        graft.functions.VectorFunctions.pqEncode(col("embedding"), cbT, nSub))
      .withColumn("q8", quant(col("embedding")))
      .localCheckpoint()

    def idot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

    val queries = coded.orderBy("vec_id").limit(nQueries)
      .select("vec_id", "embedding", "q8").collect()
    val shortlist = k * 10 // candidate pool re-ranked with exact cosine
    var pqHits = 0L; var pqTHits = 0L; var rrHits = 0L
    var i8Hits = 0L; var total = 0L
    queries.foreach { qr =>
      val qid = qr.getLong(0)
      val qEmb = array(qr.getSeq[Float](1).map(lit(_)): _*)
      val qQ8 = array(qr.getSeq[Long](2).map(lit(_)): _*)
      val rest = coded.filter(col("vec_id") =!= qid)
      def topIds(ranked: org.apache.spark.sql.DataFrame): Set[Long] =
        ranked.limit(k).select("vec_id").collect().map(_.getLong(0)).toSet
      val exact = topIds(rest.withColumn("s",
          graft.functions.VectorFunctions.vecCosine(col("embedding"), qEmb))
        .orderBy(col("s").desc, col("vec_id")))
      val pq = topIds(rest.withColumn("s", graft.functions.VectorFunctions
          .pqAdcDot(qEmb, col("codes"), cb, nSub))
        .orderBy(col("s").desc, col("vec_id")))
      val pqT = topIds(rest.withColumn("s", graft.functions.VectorFunctions
          .pqAdcDot(qEmb, col("codes_t"), cbT, nSub))
        .orderBy(col("s").desc, col("vec_id")))
      // production shape: PQ shortlist (10k of a billion), exact re-rank
      val rerank = topIds(rest
        .withColumn("a", graft.functions.VectorFunctions
          .pqAdcDot(qEmb, col("codes_t"), cbT, nSub))
        .orderBy(col("a").desc, col("vec_id")).limit(shortlist)
        .withColumn("s",
          graft.functions.VectorFunctions.vecCosine(col("embedding"), qEmb))
        .orderBy(col("s").desc, col("vec_id")))
      val i8 = topIds(rest.withColumn("s",
          idot(col("q8"), qQ8).cast("double") /
            (sqrt(idot(col("q8"), col("q8"))) * sqrt(idot(qQ8, qQ8))))
        .orderBy(col("s").desc, col("vec_id")))
      pqHits += (exact & pq).size; pqTHits += (exact & pqT).size
      rrHits += (exact & rerank).size; i8Hits += (exact & i8).size
      total += k
    }
    println(f"queries=$nQueries k=$k shortlist=$shortlist  " +
      f"pq_seed_recall=${pqHits.toDouble / total}%.3f  " +
      f"pq_trained_recall=${pqTHits.toDouble / total}%.3f  " +
      f"pq_rerank_recall=${rrHits.toDouble / total}%.3f (32x compression)  " +
      f"int8_recall=${i8Hits.toDouble / total}%.3f (4x compression)")
    spark.stop()
  }
}
