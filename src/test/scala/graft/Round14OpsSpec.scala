package graft

import org.apache.spark.sql.functions._

/** Round-14 hardening: compactIndex's crash window (the already-compact
  * move must never be able to gut the live lists table), the ISO-BMFF
  * absent-stss sync rule, and the fragmented-mp4 surface.
  */
class Round14OpsSpec extends GraftSparkSpec {

  test("compactIndex: crash inside the swap window is fully recovered") {
    import graft.operators.Similarity
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-ann-crash").toString
    Similarity.writeIvfIndex(e.filter(col("vec_id") % 4 === 0), s"$tmp/ivf", 8)
    (1 to 3).foreach { w =>
      Similarity.appendIvfIndex(e.filter(col("vec_id") % 4 === w), s"$tmp/ivf")
    }
    def q() = Similarity.ivfIndexTopK(spark, s"$tmp/ivf",
      e.filter(col("vec_id") === 7)
        .select(col("embedding").as("q_embedding")), 5, nprobe = 4)
      .collect().map(_.toSeq).toSeq
    val before = q()

    // reproduce the exact mid-swap crash state: live staged to .old,
    // one list dir already moved into .compacting, commit rename never
    // happened (the state the r13 protocol turned into permanent loss)
    val lists = new java.io.File(s"$tmp/ivf/lists")
    val old = new java.io.File(s"$tmp/ivf/lists.old")
    val staging = new java.io.File(s"$tmp/ivf/lists.compacting")
    assert(lists.renameTo(old))
    staging.mkdirs()
    val someDir = old.listFiles().filter(_.isDirectory)
      .filter(_.getName.startsWith("list_id=")).minBy(_.getName)
    assert(someDir.renameTo(new java.io.File(staging, someDir.getName)))

    // next maintenance run must restore the FULL original (merge the
    // moved dir back) and then compact normally
    val report = Similarity.compactIndex(spark, s"$tmp/ivf")
    assert(report("lists")._2 <= report("lists")._1)
    assert(q() == before, "crash recovery lost index rows")

    // phase-1 crash (orphaned .compacting with a REWRITTEN copy of a
    // still-live dir) must be discarded, not merged — no duplicates
    val liveDir = new java.io.File(s"$tmp/ivf/lists").listFiles()
      .filter(_.isDirectory).minBy(_.getName)
    val st2 = new java.io.File(s"$tmp/ivf/lists.compacting")
    st2.mkdirs()
    val copyDst = new java.io.File(st2, liveDir.getName)
    org.apache.hadoop.fs.FileUtil.copy(
      org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(liveDir.toString),
      org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(copyDst.toString),
      false, spark.sparkContext.hadoopConfiguration)
    Similarity.compactIndex(spark, s"$tmp/ivf")
    assert(q() == before, "orphaned rewrite copy was wrongly merged")
    assert(!st2.exists())
  }

  test("mp4: absent stss means EVERY sample is sync (ISO 14496-12 §8.6.2)") {
    import graft.operators.Multimodal
    import spark.implicits._
    // all-intra fixture: the writer omits the stss box when syncs is
    // empty — exactly the file shape intra-only encoders produce
    val noStss = Multimodal.mp4Bytes(32, 48, Array(20, 21, 22),
      Array((3, 3000)), syncs = Array.empty, seed = 5L)
    val withStss = Multimodal.mp4Bytes(32, 48, Array(20, 21, 22),
      Array((3, 3000)), syncs = Array(1, 3), seed = 5L)
    val media = Seq((1L, noStss), (2L, withStss)).toDF("doc_id", "content")
    val rows = Multimodal.mp4SampleTable(spark, media)
      .select("doc_id", "sample_idx", "is_sync")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
      .toSet
    assert(rows == Set((1L, 0, true), (1L, 1, true), (1L, 2, true),
      (2L, 0, true), (2L, 1, false), (2L, 2, true)))
  }
}
