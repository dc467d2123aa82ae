package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Measures the per-trigger source cost that motivates the `graft-notify`
  * source (SCALE.md §1 streaming row): the built-in file source re-LISTS
  * the landing directory every trigger (O(files ever landed)), while the
  * notify source issues ONE `fs.exists` probe when idle.
  *
  * Usage: `runMain graft.tools.NotifyScale [nFiles]` (default 10000).
  * Prints the median per-trigger cost of (a) a landing-dir listing at
  * history size N — what `readStream.text` pays — and (b) the idle notify
  * probe, which is independent of N.
  */
object NotifyScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(10000)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = Files.createTempDirectory("notify-scale").toString
    val landing = s"$root/landing"
    val queue = s"$root/queue"
    new java.io.File(landing).mkdirs()
    new java.io.File(queue).mkdirs()
    (0 until n).foreach { i =>
      Files.write(Paths.get(landing, f"blob-$i%08d.txt"), "x\n".getBytes)
      Files.write(Paths.get(queue, f"n-$i%012d"), "x\n".getBytes)
    }

    val conf = spark.sparkContext.hadoopConfiguration
    val lp = new org.apache.hadoop.fs.Path(landing)
    val fs = lp.getFileSystem(conf)

    def medianMicros(reps: Int)(body: => Unit): Long = {
      val ts = (0 until reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1000
      }.sorted
      ts(ts.length / 2)
    }

    // (a) what the file source pays per trigger: list + getModificationTime
    // over the full history (FileStreamSource.fetchAllFiles shape)
    val listUs = medianMicros(9) {
      val st = fs.listStatus(lp)
      var acc = 0L
      st.foreach(s => acc += s.getModificationTime)
      require(st.length == n)
    }

    // (b) what the notify source pays per idle trigger: one exists probe
    val probePath = new org.apache.hadoop.fs.Path(
      queue, f"n-$n%012d") // next unclaimed seq
    val probeUs = medianMicros(9) { fs.exists(probePath) }

    // (c) what SPOOL claim mode adds per idle trigger: sequencing an
    // EMPTY spool at history size N — one listStatus of the spool dir,
    // O(pending backlog) not O(history) (sequenced entries left the
    // spool; the n-* history never enters the listing)
    val spool = new org.apache.hadoop.fs.Path(s"$queue/spool")
    fs.mkdirs(spool)
    val qp = new org.apache.hadoop.fs.Path(queue)
    val spoolUs = medianMicros(9) {
      graft.streaming.NotifyQueue.sequenceSpool(fs, qp, n - 1L)
    }

    println(f"[notify-scale] history=$n%d files: listing=$listUs%d us/trigger, " +
      f"idle notify probe=$probeUs%d us/trigger (${listUs.toDouble / math.max(probeUs, 1)}%.0fx), " +
      f"idle spool sequencing=$spoolUs%d us/trigger")
    spark.stop()
  }
}
