package graft

import graft.operators.{Contamination, Pack}
import org.apache.spark.sql.functions._

/** Semantics of the sequence-packing and contamination operators. */
class PackContaminationSpec extends GraftSparkSpec {
  import spark.implicits._

  test("packedSpans: concatenate-and-split window math, straddling docs") {
    // capacity 10; stream A docs: 4, 8, 10, 3 tokens
    //   doc 1: toks [0,4)   -> window 0..0, offset 0
    //   doc 2: toks [4,12)  -> window 0..1, offset 4  (straddles)
    //   doc 3: toks [12,22) -> window 1..2, offset 2
    //   doc 4: toks [22,25) -> window 2..2, offset 2
    val docs = Seq(
      ("A", 1L, "t t t t"),
      ("A", 2L, "t t t t t t t t"),
      ("A", 3L, "t t t t t t t t t t"),
      ("A", 4L, "t t t"),
      ("B", 9L, "t t t t t t t t t t t")  // 11 toks -> windows 0..1
    ).toDF("lang", "doc_id", "text")
    val spans = Pack.packedSpans(docs, "doc_id", "text", "lang", capacity = 10)
      .orderBy("lang", "doc_id")
      .select("lang", "doc_id", "n_tokens", "start_window", "end_window", "start_offset")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(spans.toSeq == Seq(
      ("A", 1L, 4, 0L, 0L, 0L),
      ("A", 2L, 8, 0L, 1L, 4L),
      ("A", 3L, 10, 1L, 2L, 2L),
      ("A", 4L, 3, 2L, 2L, 2L),
      ("B", 9L, 11, 0L, 1L, 0L)))
  }

  test("packingStats: windows consumed and fill ratio per stream") {
    val docs = Seq(
      ("A", 1L, "t t t t"),           // A: 25 tokens over 3 windows of 10
      ("A", 2L, "t t t t t t t t"),
      ("A", 3L, "t t t t t t t t t t"),
      ("A", 4L, "t t t")
    ).toDF("lang", "doc_id", "text")
    val stats = Pack.packingStats(
      Pack.packedSpans(docs, "doc_id", "text", "lang", 10), "lang", 10)
      .collect()(0)
    assert(stats.getAs[Long]("n_docs") == 4)
    assert(stats.getAs[Long]("total_tokens") == 25)
    assert(stats.getAs[Long]("n_windows") == 3)
    assert(stats.getAs[Double]("fill_ratio") == 0.8333) // round(25/30, 4)
  }

  test("packedSpansGlobal: two-phase prefix sum equals the window cumsum") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("one_stream", lit("g"))
    val viaWindow = Pack.packedSpans(docs, "doc_id", "text", "one_stream", 512)
      .select("doc_id", "n_tokens", "start_window", "end_window", "start_offset")
      .collect().map(_.toSeq).toSet
    val viaPhases = Pack.packedSpansGlobal(docs, "doc_id", "text", 512,
        partitions = 7) // deliberately uneven vs the 4 shuffle partitions
      .collect().map(_.toSeq).toSet
    assert(viaPhases == viaWindow)
    assert(viaPhases.nonEmpty)
  }

  test("contamination: shared 8-gram detected, disjoint docs clean") {
    val phrase = (1 to 8).map(i => s"p$i").mkString(" ")
    val train = Seq(
      (1L, s"lead in text $phrase trailing words here"), // contaminated
      (2L, (1 to 20).map(i => s"c$i").mkString(" "))     // clean
    ).toDF("doc_id", "text")
    val bench = Seq((100L, s"prefix $phrase suffix words")).toDF("doc_id", "text")
    val got = Contamination.report(train, bench, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 1L))) // exactly one shared 8-shingle
  }
}
