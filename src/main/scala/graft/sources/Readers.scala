package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Input readers beyond Spark's codec-aware text source.
  *
  * Plain text and .gz are native (`spark.read.text` infers the codec per
  * file; gz = one task per file, same constraint as the reference's
  * whole-blob streaming). Zip needs explicit handling: the reference reads
  * ONLY the first entry of a zip archive (Text/TextSource.cs:88-103) — we
  * reproduce exactly that.
  */
object Readers {

  /** A1 ListBlobSource parity: lines under a prefix, filtered by name
    * suffix (reference: BlobSources/ListBlobSource.cs:33-43 filters the
    * listing by `EndsWith(suffix)`). `pathGlobFilter` prunes at FILE
    * LISTING time — filtered files are never opened, the exact analogue of
    * filtering the blob listing.
    */
  def textLines(spark: SparkSession, pathOrGlob: String,
                suffix: Option[String] = None): DataFrame = {
    val reader = spark.read
    suffix.fold(reader)(sfx => reader.option("pathGlobFilter", s"*$sfx"))
      .text(pathOrGlob)
  }

  /** Lines of the FIRST zip entry of each archive matched by the glob. */
  def zipFirstEntryLines(spark: SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(glob)
      .flatMap { case (path, pds) =>
        val zin = new java.util.zip.ZipInputStream(pds.open())
        try {
          var entry = zin.getNextEntry
          // skip directory entries; take the first real one
          while (entry != null && entry.isDirectory) entry = zin.getNextEntry
          if (entry == null) Iterator.empty
          else {
            val reader = new java.io.BufferedReader(
              new java.io.InputStreamReader(zin, "UTF-8"))
            Iterator.continually(reader.readLine()).takeWhile(_ != null)
              .map(line => (path, line)).toVector.iterator
          }
        } finally zin.close()
      }
      .toDF("file", "value")
  }
}
