package graft.tools

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.SparkSession

/** Multi-tenant scheduling probe: run a set of heavyweight queries
  * SERIALLY and then CONCURRENTLY (one submitting thread each, shared
  * SparkSession — the standard multi-session server shape) and compare
  * wall time. Concurrent submission overlaps one query's stage gaps
  * (driver planning, AQE re-planning, localCheckpoint barriers) with
  * another's executor work — the realistic throughput number a shared
  * cluster sees, vs the per-query latency the serial bench reports.
  * Usage: ConcurrencyProbe [sfDir] [nThreads]
  */
object ConcurrencyProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nThreads = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    val names = Seq("x51_label_prop", "x52_triangles", "x55_random_walks",
      "x47_pagerank", "x56_kcore", "d40_minhash_calibration",
      "x26_containment", "x30_tfidf_cosine")
    val qs = graft.SparkEntry.queries
    def runOne(n: String): Unit =
      qs(n)(spark, dir).write.format("noop").mode("overwrite").save()
    def drain(): Unit = spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))

    // warmup (classload/codegen) once
    names.foreach(runOne); drain()

    for (rep <- 1 to 2) {
      val t0 = System.nanoTime()
      names.foreach(runOne)
      val serial = (System.nanoTime() - t0) / 1e9
      drain()
      val pool = Executors.newFixedThreadPool(nThreads)
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutor(pool)
      val t1 = System.nanoTime()
      Await.result(
        Future.sequence(names.map(n => Future(runOne(n)))), Duration.Inf)
      val conc = (System.nanoTime() - t1) / 1e9
      pool.shutdown()
      drain()
      println(f"rep=$rep serial=$serial%.1f s concurrent($nThreads)=$conc%.1f s " +
        f"speedup=${serial / conc}%.2fx")
    }
    spark.stop()
  }
}
