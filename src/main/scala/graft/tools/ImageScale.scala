package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe behind the x93 metadata-sweep claim: throughput of the
  * three image paths over a realistically-sized corpus —
  *   meta    ImageCodecs.pngMetaTable   (chunk walk + CRC, no inflate)
  *   decode  ImageCodecs.pngPixelTable  (own inflate + unfilter)
  *   imageio Multimodal.decodeImages    (JDK ImageIO full decode)
  * Corpus: n dim x dim RGB PNGs (the linear pixel formulas deflate ~4.5x
  * under the scanline filters — the real-photo band) written once to
  * parquet; each path is then timed on the identical input with a noop
  * write. Run OUTSIDE sbt (no build lock):
  *   java -cp "target/scala-2.13/classes:<spark jars>"
  *     <add-opens flags> graft.tools.ImageScale 200000
  */
object ImageScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val dim = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val corpus = s"/tmp/graft-imagescale-$n-$dim"
    if (!new java.io.File(corpus).exists()) {
      val t0 = System.nanoTime()
      spark.range(n).select(col("id").as("doc_id")).as[Long]
        .repartition(64)
        .map(id => graft.operators.Multimodal.ImageRow(id,
          graft.operators.ImageCodecs.pngBytesFor(id, dim, dim, ct = 2, bd = 8)))
        .toDF().write.mode("overwrite").parquet(corpus)
      println(f"synthesize: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val media = spark.read.parquet(corpus)
    val bytes = media.agg(sum(length(col("content")))).as[Long].first()
    println(f"corpus: $n images, ${bytes / 1e9}%.2f GB encoded")

    def time(label: String, total: Long = bytes)(df: => DataFrame): Double = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label%-12s ${s}%8.1f s  ${n / s}%9.0f img/s  ${total / s / 1e6}%7.1f MB/s")
      s
    }
    val tm = time("meta")(graft.operators.ImageCodecs.pngMetaTable(spark, media))
    val td = time("decode")(graft.operators.ImageCodecs.pngPixelTable(spark, media))
    val ti = time("imageio")(graft.operators.Multimodal.decodeImages(spark, media))
    println(f"meta is ${td / tm}%.1fx cheaper than own decode, ${ti / tm}%.1fx than ImageIO")

    // --- gif/tiff decode kernels (x114/x116): same corpus SIZE, the
    // fixtures' own writers (real LZW/PackBits), full pixel decode
    Seq("gif", "tiff").foreach { fmt =>
      val dir = s"/tmp/graft-imagescale-$fmt-$n"
      if (!new java.io.File(dir).exists()) {
        spark.range(n).select(col("id").as("doc_id")).as[Long]
          .repartition(64)
          .map { id =>
            val bytes = if (fmt == "gif") graft.sources.GifSource.gifOf(id)
              else graft.sources.TiffSource.tiffOf(id)
            graft.operators.Multimodal.ImageRow(id, bytes)
          }
          .toDF().write.mode("overwrite").parquet(dir)
      }
      val m = spark.read.parquet(dir)
      val b = m.agg(sum(length(col("content")))).as[Long].first()
      if (fmt == "gif")
        time("gif-decode", b)(graft.sources.GifSource.gifPixelTable(spark, m))
      else
        time("tiff-decode", b)(graft.sources.TiffSource.tiffPixelTable(spark, m))
    }
    spark.stop()
  }
}
