import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timing breakdown of the x15 corpus-prep
  * composition (quality filter -> minhash pairs -> clusters -> survivors
  * -> packing stats) to localize regressions to a stage.
  */
object X15Prof {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftCli.session()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import graft.operators.{Dedup, Pack}

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[x15prof] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (i <- 1 to 2) {
      println(s"--- iteration $i ---")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val q = docs.filter(Pack.tokenCount(col("text")) >= 25)
      val pairs = time("minHashLsh (construct+checkpoint)") {
        Dedup.minHashLsh(q, "doc_id", "text", threshold = 0.5)
      }
      val pairsMat = time("pairs materialize") { pairs.localCheckpoint() }
      val surv = time("clusters+survivors") {
        Dedup.dedupSurvivors(q, "doc_id", pairsMat).localCheckpoint()
      }
      time("pack stats") {
        Pack.packingStats(
          Pack.packedSpans(surv, "doc_id", "text", "lang", capacity = 512),
          "lang", capacity = 512)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
