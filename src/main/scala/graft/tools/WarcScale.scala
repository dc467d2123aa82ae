package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe behind the WARC ingestion path (x100/x101): throughput of
  *   records  WarcSource.warcTable      (gzip member walk + record grammar)
  *   text     WarcSource.warcTextTable  (+ HTTP sub-parse + HTML extraction)
  * over a realistically-sized corpus: n archives of ~r records each, page
  * bodies padded to ~bodyKB of token-shaped filler so the gzip ratio and
  * per-record cost sit in the web-crawl band (Common Crawl averages
  * ~1 MB/page uncompressed, ~15 pages/member-group). Archives are written
  * once to parquet; each path is timed on the identical input with a noop
  * write. Run OUTSIDE sbt (no build lock):
  *   java -cp "target/scala-2.13/classes:<spark jars>"
  *     <add-opens flags> graft.tools.WarcScale 20000 12 24
  */
object WarcScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000L)
    val recs = args.drop(1).headOption.map(_.toInt).getOrElse(12)
    val bodyKB = args.drop(2).headOption.map(_.toInt).getOrElse(24)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val words = Array("the", "fast", "key", "order", "sort", "table",
      "scan", "merge", "part", "window", "small", "hash", "join", "batch",
      "stream", "spark", "value", "agg", "row", "filter")
    def page(id: Long, j: Int): String = {
      val sb = new StringBuilder
      var w = 0
      val target = bodyKB * 1024
      while (sb.length < target) {
        sb.append(words(((id * 31 + j * 7 + w) % words.length).toInt)).append(' ')
        w += 1
      }
      sb.toString
    }

    val corpus = s"/tmp/graft-warcscale-$n-$recs-$bodyKB"
    if (!new java.io.File(corpus).exists()) {
      val t0 = System.nanoTime()
      spark.range(n).select(col("id").as("doc_id")).as[Long]
        .repartition(64)
        .map { id =>
          // one multi-response archive per row: reuse the fixture writer
          // record shape but at probe size (recs responses, ~bodyKB each)
          val out = new java.io.ByteArrayOutputStream()
          (0 until recs).foreach { j =>
            // keep the sub-id parity equal to the archive's: a file must
            // be all-gzip-members or all-plain, never a mix
            out.write(graft.sources.WarcSource.warcOf(
              (id * recs + j) * 2 + id % 2, page(id, j)))
          }
          graft.operators.Multimodal.ImageRow(id, out.toByteArray)
        }
        .toDF().write.mode("overwrite").parquet(corpus)
      println(f"synthesize: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val media = spark.read.parquet(corpus)
    val bytes = media.agg(sum(length(col("content")))).as[Long].first()
    println(f"corpus: $n archives, ${bytes / 1e9}%.2f GB encoded (compressed+plain mix)")

    def time(label: String)(df: => DataFrame): Double = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label%-8s ${s}%8.1f s  ${n / s}%9.0f arch/s  ${bytes / s / 1e6}%7.1f MB/s")
      s
    }
    val tr = time("records")(graft.sources.WarcSource.warcTable(spark, media))
    // text path extracts EVERY response (warcFiles semantics), not just
    // the gate's first-response-per-archive
    val allText = media.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bs) =>
        graft.sources.WarcSource.parseWarc(bs).records.iterator
          .filter(_.warcType == "response")
          .map(r => (id, r.targetUri, graft.sources.WarcSource.htmlText(r.body)))
      }
      .toDF("doc_id", "uri", "text")
    val tt = time("text")(allText)
    println(f"html extraction costs ${tt / tr}%.2fx the container walk")
    spark.stop()
  }
}
