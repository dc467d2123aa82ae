package graft

import org.apache.spark.sql.functions._

/** Round-14 second block: the zstd codec arm (file path + frame
  * concatenation) and the temporal-gate semantics pins (q78/q79 are
  * oracle-checked, but an oracle can't catch BOTH engines encoding the
  * same wrong semantics — these fixtures pin intent).
  */
class Round14bOpsSpec extends GraftSparkSpec {
  import graft.sources.Readers

  test("zstd: file round trip through Readers.zstdLines with attribution") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zstd").toString
    Readers.writeZstdBlob(s"$dir/a.txt.zst", Seq("a1,x", "a2,y"))
    Readers.writeZstdBlob(s"$dir/b.txt.zst", Seq("b1,z"))
    val rows = Readers.zstdLines(spark, s"$dir/*.zst")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(rows.map(_._2).toSeq === Seq("a1,x", "a2,y", "b1,z"))
    assert(rows.count(_._1.endsWith("a.txt.zst")) === 2)
    assert(rows.count(_._1.endsWith("b.txt.zst")) === 1)
  }

  test("zstd: concatenated frames in one blob all surface (gzip-member analogue)") {
    // `zstd file1; zstd file2; cat *.zst > all.zst` is valid zstd — the
    // decoder must continue into the next frame, exactly like multi-member
    // gzip. ZstdInputStream does; this pins that the reader arm keeps it.
    val dir = java.nio.file.Files.createTempDirectory("graft-zstd2").toString
    val bos = new java.io.ByteArrayOutputStream()
    Seq(Seq("f1-l1", "f1-l2"), Seq("f2-l1")).foreach { lines =>
      val b = new java.io.ByteArrayOutputStream()
      val z = new com.github.luben.zstd.ZstdOutputStream(b, 3)
      z.write(lines.mkString("", "\n", "\n").getBytes("UTF-8")); z.close()
      bos.write(b.toByteArray)
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/cat2.zst"), bos.toByteArray)
    val vals = Readers.zstdLines(spark, s"$dir/cat2.zst")
      .select("value").collect().map(_.getString(0)).sorted.toSeq
    assert(vals === Seq("f1-l1", "f1-l2", "f2-l1"))
  }

  test("q79 semantics: touching intervals are NOT concurrent; containment is") {
    import spark.implicits._
    // [0,10) [10,20) touch -> max 1; [0,10) [2,5) nest -> max 2
    val iv = Seq(("touch", 0L, 10L), ("touch", 10L, 20L),
      ("nest", 0L, 10L), ("nest", 2L, 5L)).toDF("event_type", "t0", "t1")
    val deltas = iv.select(col("event_type"), col("t0").as("t"), lit(1).as("d"))
      .unionAll(iv.select(col("event_type"), col("t1").as("t"), lit(-1).as("d")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy(col("t"), col("d"))
    val got = deltas.withColumn("cur", sum("d").over(w))
      .groupBy("event_type").agg(max("cur").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("touch" -> 1L, "nest" -> 2L))
  }

  test("q78 semantics: A->A collapses, A->B->A makes three versions") {
    import spark.implicits._
    val e = Seq((1L, 1L, 100L, "A"), (1L, 2L, 200L, "A"),
      (1L, 3L, 300L, "B"), (1L, 4L, 400L, "A"))
      .toDF("user_id", "event_id", "us", "event_type")
      .withColumn("ts", timestamp_micros(col("us")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val versioned = e
      .withColumn("prev", lag("event_type", 1).over(w))
      .withColumn("chg",
        when(col("prev").isNull || col("prev") =!= col("event_type"), 1)
          .otherwise(0))
      .withColumn("version", sum("chg").over(w))
    val wv = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("version")
    val out = versioned.groupBy("user_id", "version")
      .agg(min("event_type").as("event_type"),
        unix_micros(min("ts")).as("valid_from_us"))
      .withColumn("valid_to_us", lead("valid_from_us", 1).over(wv))
      .orderBy("version")
      .collect().map(r => (r.getLong(1), r.getString(2),
        r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long])))
    assert(out.toSeq === Seq(
      (1L, "A", 100L, Some(300L)),   // the A,A run collapsed
      (2L, "B", 300L, Some(400L)),
      (3L, "A", 400L, None)))        // reopened A is a NEW version
  }
}
