package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured counterfactual for the r19 `resolveRevisits` fix
  * (`sources/CdxSource.scala`): the r18 plan joined the FULL index on
  * bare `digest` and then cut the fan-out back with a per-(revisit_uri,
  * digest) window — on a HOT digest (one boilerplate/soft-404 body
  * shared by U revisit URIs and C captures, exactly the key Common
  * Crawl skews hardest) that join materializes U × C rows before the
  * window sees them. The r19 plan pre-aggregates the index to ONE
  * earliest-capture row per digest, making the join 1:1.
  *
  * This probe builds that hot shape synthetically (U = 5,000 revisit
  * URIs × C = 20,000 co-digest captures on one digest → the old form's
  * exchange carries 100,000,000 rows for that single key, the new
  * form's carries 5,000) plus a unique-digest filler population, runs
  * both PICK plans to a count (the fetch stage is identical in both
  * and needs real files, so the pick — where the fan-out lives — is
  * what's timed), and prints wall times. Run OUTSIDE sbt with the
  * usual add-opens flags and the spark-jars classpath:
  * `java -Xmx8g ... graft.tools.RevisitScale [U] [C] [filler]`.
  */
object RevisitScale {

  /** `--write` arm (r19 verdict item 5): the dedup WRITE path under a
    * Zipfian hot digest. `writeWarc(dedupDigests = true)` sends full
    * bodies across the digest exchange and the plan comment claims AQE
    * skew-split absorbs a boilerplate mega-digest — this measures it:
    * `pages` pages of which `hotPct`% share ONE body (the 30%-hot
    * shape), the rest unique, real SHA-1 digests, real gzip members,
    * real first-wins shard commit to a temp dir. Prints wall time +
    * true peak heap; completing without a task OOM at the hot shape IS
    * the claim. `java -Xmx8g ... graft.tools.RevisitScale --write
    * [pages] [hotPct]`.
    */
  private def runWrite(rest: Array[String]): Unit = {
    val pages = rest.headOption.map(_.toInt).getOrElse(10000000)
    val hotPct = rest.drop(1).headOption.map(_.toInt).getOrElse(30)
    require(pages >= 100 && hotPct >= 1 && hotPct <= 100,
      "revisit-scale --write: pages >= 100 and hotPct in 1..100")
    val peak = new java.util.concurrent.atomic.AtomicLong(0L)
    val sampler = new Thread(() => {
      while (true) {
        val rt = Runtime.getRuntime
        val used = rt.totalMemory() - rt.freeMemory()
        var p = peak.get()
        while (used > p && !peak.compareAndSet(p, used)) p = peak.get()
        Thread.sleep(50)
      }
    })
    sampler.setDaemon(true); sampler.start()
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = java.nio.file.Files.createTempDirectory("revwrite").toFile
    println(s"[revisit-scale] write arm: $pages pages, $hotPct% on one " +
      s"digest -> ${out.getAbsolutePath}; " +
      f"-Xmx=${Runtime.getRuntime.maxMemory() / 1e9}%.2f GB")
    try {
      val df = spark.range(pages.toLong, 0L, -1L, 64).selectExpr(
        "concat('http://h', id % 97, '.example/p/', id) AS uri",
        "200 AS status",
        "'text/html; charset=utf-8' AS content_type",
        // hotPct% of pages carry the SAME boilerplate body (one digest
        // owning nearly a third of the exchange's rows AND bytes)
        s"""encode(CASE WHEN id % 100 < $hotPct
           |  THEN '<html><body>cookie consent boilerplate page body padding padding padding</body></html>'
           |  ELSE concat('<html><body>unique body ', id,
           |    ' padding padding padding padding</body></html>')
           |END, 'UTF-8') AS body""".stripMargin)
      val t0 = System.nanoTime()
      val n = graft.sources.WarcSource.writeWarc(
        df, out.getAbsolutePath, nShards = 64, gzip = true,
        dedupDigests = true)
      val secs = (System.nanoTime() - t0) / 1e9
      val bytes = out.listFiles().map(_.length()).sum
      println(f"[revisit-scale] write  $n%9d pages in $secs%8.2f s " +
        f"(${n / secs}%.0f pages/s), ${bytes / 1e9}%.2f GB of archives, " +
        f"peak heap ${peak.get() / 1e9}%.2f GB")
      // honesty check: the hot digest produced exactly one full
      // response; everything else on it is a revisit
      val revisits = graft.sources.WarcSource.warcRevisits(spark,
        out.getAbsolutePath + "/*.warc.gz").count()
      // exact hot-page count over ids 1..pages (a pages*hotPct/100
      // shortcut is only right when pages is a multiple of 100):
      // residue r occurs pages/100 times, plus once more when
      // 1 <= r <= pages%100
      val hot = (0 until hotPct).map(r =>
        pages.toLong / 100 +
          (if (r >= 1 && r <= pages % 100) 1L else 0L)).sum
      val expect = math.max(0L, hot - 1L)
      println(s"[revisit-scale] revisits $revisits (expected ~$expect)")
      require(revisits == expect,
        s"revisit count $revisits != expected $expect")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(out)
      spark.stop()
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.contains("--write")) {
      runWrite(args.filterNot(_ == "--write"))
      return
    }
    val u = args.lift(0).map(_.toInt).getOrElse(5000)
    val c = args.lift(1).map(_.toInt).getOrElse(20000)
    val filler = args.lift(2).map(_.toInt).getOrElse(1000000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // index: C captures of the hot digest + `filler` unique digests
    val hotIdx = spark.range(c.toLong).select(
      lit("sha1:HOT").as("digest"),
      format_string("2026%010d", col("id")).as("timestamp"),
      format_string("a%d.warc.gz", pmod(col("id"), lit(100))).as("filename"),
      (col("id") * 100).as("offset"), lit(50L).as("length"))
    val fillIdx = spark.range(filler.toLong).select(
      format_string("sha1:U%d", col("id")).as("digest"),
      lit("20260101000000").as("timestamp"),
      lit("b.warc.gz").as("filename"),
      (col("id") * 100).as("offset"), lit(50L).as("length"))
    val index = hotIdx.unionByName(fillIdx)

    // revisits: U URIs on the hot digest + one per 10 filler digests
    val hotRev = spark.range(u.toLong).select(
      format_string("http://dup%d.example/", col("id")).as("uri"),
      lit("sha1:HOT").as("digest"))
    val fillRev = spark.range(filler.toLong / 10).select(
      format_string("http://f%d.example/", col("id")).as("uri"),
      format_string("sha1:U%d", col("id") * 10).as("digest"))
    val revisits = hotRev.unionByName(fillRev)

    def timed(label: String)(df: => DataFrame): Long = {
      val t0 = System.nanoTime()
      val n = df.count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[revisit-scale] $label%-10s $n%9d picked rows in $s%8.2f s")
      n
    }

    // r19 form: digest pre-agg (map-side combinable) + 1:1 join
    def newPick: DataFrame = {
      val best = index.groupBy("digest")
        .agg(min(struct(col("timestamp"), col("filename"), col("offset"),
          col("length"))).as("cap"))
        .select(col("digest"), col("cap.timestamp").as("timestamp"),
          col("cap.filename").as("filename"),
          col("cap.offset").as("offset"), col("cap.length").as("length"))
      revisits.select(col("uri").as("revisit_uri"), col("digest")).distinct()
        .join(best, Seq("digest"), "left")
    }

    // r18 form: bare-digest join fans out U x C, window cuts it back
    def oldPick: DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("revisit_uri", "digest")
        .orderBy(col("timestamp"), col("filename"), col("offset"))
      revisits.select(col("uri").as("revisit_uri"), col("digest")).distinct()
        .join(index, Seq("digest"), "left")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
    }

    if (args.contains("--explain")) {
      // plan audit: the digest pre-agg must run as a PARTIAL (map-side
      // combined) aggregate before its exchange — grep the formatted
      // plan for the partial_min marker
      newPick.explain("formatted")
      spark.stop()
      return
    }
    println(s"[revisit-scale] hot digest: $u uris x $c captures " +
      s"(old-form fan-out ${u.toLong * c} rows); filler $filler")
    val nNew = timed("r19 pre-agg")(newPick)
    val nOld = timed("r18 window")(oldPick)
    require(nNew == nOld, s"row counts diverge: $nNew vs $nOld")
    spark.stop()
  }
}
