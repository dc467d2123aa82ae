package graft

import graft.sources.ParquetFooter

import scala.jdk.CollectionConverters._

/** Physical-fact pinning for the thrift-compact footer parser: every
  * field the x96 gate does NOT cover (offsets, sizes, codec ids, schema
  * walk, created_by) compared against parquet-mr's own footer decoder on
  * the pyarrow-written testdata — two more independent implementations
  * beyond the gate's DuckDB check.
  */
class ParquetFooterSpec extends GraftSparkSpec {

  private val files = ParquetFooter.tables.map { case (t, _) =>
    t -> s"$sfDir/$t.parquet"
  }

  private def mrFooter(p: String) = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(p), conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getFooter finally r.close()
  }

  test("footer fields match parquet-mr chunk-for-chunk on all testdata files") {
    files.foreach { case (t, p) =>
      val ours = ParquetFooter.readFooter(p)
      val mr = mrFooter(p)
      assert(ours.numRows === mr.getBlocks.asScala.map(_.getRowCount).sum,
        s"$t numRows")
      assert(ours.createdBy === mr.getFileMetaData.getCreatedBy, s"$t createdBy")
      assert(ours.rowGroups.size === mr.getBlocks.size(), s"$t rowGroups")
      ours.rowGroups.zip(mr.getBlocks.asScala).foreach { case (rg, blk) =>
        assert(rg.numRows === blk.getRowCount)
        val mrCols = blk.getColumns.asScala
        assert(rg.columns.size === mrCols.size, s"$t chunk count")
        rg.columns.zip(mrCols).foreach { case (c, m) =>
          val label = s"$t/${c.pathInSchema.mkString(".")}"
          assert(c.pathInSchema.mkString(".") === m.getPath.toDotString, label)
          assert(ParquetFooter.codecName(c.codec) === m.getCodec.name(), label)
          assert(c.numValues === m.getValueCount, label)
          assert(c.totalCompressed === m.getTotalSize, label)
          assert(c.totalUncompressed === m.getTotalUncompressedSize, label)
          assert(c.dataPageOffset === m.getFirstDataPageOffset, label)
        }
      }
    }
  }

  test("statistics min/max match parquet-mr for integer columns") {
    var checked = 0
    files.foreach { case (t, p) =>
      val ours = ParquetFooter.readFooter(p)
      val mr = mrFooter(p)
      ours.rowGroups.zip(mr.getBlocks.asScala).foreach { case (rg, blk) =>
        rg.columns.zip(blk.getColumns.asScala).foreach { case (c, m) =>
          (c.minI64, c.maxI64) match {
            case (Some(mn), Some(mx)) =>
              val st = m.getStatistics
              assert(mn === st.genericGetMin.asInstanceOf[Number].longValue,
                s"$t/${c.pathInSchema.mkString(".")} min")
              assert(mx === st.genericGetMax.asInstanceOf[Number].longValue,
                s"$t/${c.pathInSchema.mkString(".")} max")
              checked += 1
            case _ => ()
          }
        }
      }
    }
    // int32 + int64 columns across ten tables: this must not be vacuous
    assert(checked >= 10, s"only $checked integer stat columns checked")
  }

  test("schema walk sees every leaf parquet-mr sees") {
    files.foreach { case (t, p) =>
      val ours = ParquetFooter.readFooter(p)
      val mrLeaves = mrFooter(p).getFileMetaData.getSchema.getPaths.asScala
        .map(_.mkString("."))
      val ourChunkPaths = ours.rowGroups.head.columns
        .map(_.pathInSchema.mkString("."))
      assert(ourChunkPaths.toSet === mrLeaves.toSet, s"$t leaves")
    }
  }

  test("footer-only read touches tail bytes, not the data") {
    // documents.parquet holds text bodies; its footer is a tiny fraction
    val p = s"$sfDir/documents.parquet"
    val fileLen = new java.io.File(p).length()
    val raf = new java.io.RandomAccessFile(p, "r")
    val tail = new Array[Byte](8)
    try { raf.seek(fileLen - 8); raf.readFully(tail) } finally raf.close()
    val footerLen = (tail(0) & 0xffL) | ((tail(1) & 0xffL) << 8) |
      ((tail(2) & 0xffL) << 16) | ((tail(3) & 0xffL) << 24)
    assert(footerLen + 12 < fileLen / 10,
      s"footer $footerLen of $fileLen should be <10% — the planner read")
    assert(ParquetFooter.readFooter(p).numRows > 0)
  }

  test("row-group pruning is sound and effective on a sorted multi-group file") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-prune").toString
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity")
      .orderBy("l_orderkey").coalesce(1)
      .write.option("parquet.block.size", "16384")
      .option("parquet.page.size", "8192")
      .mode("overwrite").parquet(dir)
    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.toString
    val maxKey = spark.read.parquet(file)
      .agg(max("l_orderkey")).head().getLong(0)
    val (lo, hi) = (maxKey / 3, maxKey / 2)
    val plan = graft.sources.ParquetFooter.pruneRowGroups(
      file, "l_orderkey", lo, hi)
    assert(plan.size > 3, s"need multiple row groups, got ${plan.size}")
    assert(plan.exists(!_.keep) && plan.exists(_.keep),
      "mid-range predicate on a sorted file must prune some groups")
    // byte ranges must be disjoint and ordered (a scheduler's split list)
    val kept = plan.filter(_.keep)
    assert(plan.map(_.startOffset) === plan.map(_.startOffset).sorted)
    // soundness: every matching row's key lies inside a KEPT group's
    // stats range — no match can live in a pruned group
    val matching = spark.read.parquet(file)
      .filter(col("l_orderkey").between(lo, hi))
    val cnt = matching.count()
    val keptPred = kept.flatMap(p => for { a <- p.mn; b <- p.mx }
        yield col("l_orderkey").between(a, b))
      .reduce(_ || _)
    assert(cnt > 0 && matching.filter(keptPred).count() === cnt)
    info(s"${plan.size} row groups, ${plan.count(!_.keep)} pruned, " +
      s"${kept.map(_.totalCompressed).sum} of " +
      s"${plan.map(_.totalCompressed).sum} bytes scanned")
  }

  test("corrupt magic and absurd footer length reject loudly") {
    val src = java.nio.file.Paths.get(s"$sfDir/region.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-pqf")
    val bad1 = dir.resolve("badmagic.parquet")
    val bytes = java.nio.file.Files.readAllBytes(src)
    val b1 = bytes.clone(); b1(b1.length - 1) = 'X'.toByte
    java.nio.file.Files.write(bad1, b1)
    val e1 = intercept[IllegalArgumentException] {
      ParquetFooter.readFooter(bad1.toString)
    }
    assert(e1.getMessage.contains("PAR1"))
    val b2 = bytes.clone()
    // footer length field = file length (overruns the file)
    val fl = b2.length
    b2(b2.length - 8) = (fl & 0xff).toByte
    b2(b2.length - 7) = ((fl >> 8) & 0xff).toByte
    b2(b2.length - 6) = ((fl >> 16) & 0xff).toByte
    b2(b2.length - 5) = ((fl >> 24) & 0xff).toByte
    val bad2 = dir.resolve("badlen.parquet")
    java.nio.file.Files.write(bad2, b2)
    val e2 = intercept[IllegalArgumentException] {
      ParquetFooter.readFooter(bad2.toString)
    }
    assert(e2.getMessage.contains("footer length"))
  }
}
