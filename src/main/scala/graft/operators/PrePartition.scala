package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hash-pre-partitioning settings, mirroring what the reference derives from
  * the Kusto partitioning policy at runtime
  * (reference: code/KustoPreForgeLib/EtlRun.cs:21-24,140-180).
  */
case class PartitionConfig(columnIndex: Int, maxPartitionCount: Int, seed: Int)

/** The PrePartition pipeline — the reference's only active ETL path
  * (reference: code/KustoPreForgeLib/EtlRun.cs:92-138), re-expressed as a
  * declarative Spark plan:
  *
  *   reference chain                          Spark plan
  *   ------------------------------------     ---------------------------------
  *   ListBlobSource (A1)                      spark.read.text(glob) file listing
  *   DownloadBlobTransform (A3)               file-split tasks (maxPartitionBytes)
  *   GunzipContentTransform (A4)              codec-aware text read (.gz native)
  *   CsvParseTransform (A5)                   csv_column_at(value, idx)   [codegen]
  *   PartitioningHelper hash (A6)             xor_fold_hash(col, seed, n) [codegen]
  *   PartitioningTextTransform (A7)           repartition(n, $"pid")  — hash shuffle
  *   PartitionedContentSink (A8)              write.partitionBy("pid").text(out)
  *
  * Records pass through byte-for-byte: we read lines as raw text and never
  * reserialize (the reference copies records verbatim,
  * Transforms/PartitioningTextTransform.cs:60-66). Column extraction for
  * partitioning is an expression over the raw line.
  *
  * Record boundaries are every `\n` — identical to the reference's Split
  * mode (Text/TextLineParsingSink.cs). The reference's PrePartition scanner
  * alone would keep a QUOTED `\n` inside one record
  * (CsvParseTransform.cs:103-109); its own corpus never emits one
  * (templates/script.kql:3-16), and `CsvColumnAt` handles quoted newlines
  * correctly within a record — only the line source differs, documented
  * here per FIXTURES.md §3.
  *
  * Scale notes (100 TB): the only shuffle is the single hash exchange on
  * `pid`, which is exactly the data movement the operation *means*. Filter +
  * projection happen before the exchange; the text scan splits at
  * `spark.sql.files.maxPartitionBytes` so a 1000-executor cluster reads
  * line-aligned splits in parallel (gzip inputs degrade to one task per file,
  * same as the reference's whole-blob download). The xor-fold hash has ≤256
  * distinct values — with maxPartitionCount > 256 or a skewed column the
  * exchange is skewed (reference inherits the same skew, SURVEY.md §7.4); AQE
  * skew-split mitigates on the write side since partitionBy files don't
  * require one-task-per-pid.
  */
object PrePartition {

  /** Annotate raw lines with their partition id. Null pid = the row's
    * extracted field doesn't exist (reference: such records get no partition
    * id and are dropped from partitioned output, CsvParseTransform.cs:103-109).
    */
  def withPartitionId(lines: DataFrame, cfg: PartitionConfig): DataFrame = {
    val field = GraftFunctions.csvColumnAt(col("value"), cfg.columnIndex)
    lines.withColumn("pid",
      when(field.isNotNull,
        GraftFunctions.xorFoldHash(field, cfg.seed, cfg.maxPartitionCount))
        .otherwise(lit(null)))
  }

  /** Full batch pipeline: read text (codec inferred per file) → pid →
    * partitioned write. One shuffle, partition-pruned scan, verbatim bytes.
    */
  def run(spark: SparkSession, inputGlob: String, outputDir: String,
          cfg: PartitionConfig, outputCompression: Option[String] = None,
          suffix: Option[String] = None): Unit = {
    val lines = graft.sources.Readers.textLines(spark, inputGlob, suffix)
    val partitioned = withPartitionId(lines, cfg)
      .filter(col("pid").isNotNull)
    val writer = partitioned
      // co-locate each pid's records into one task's output before the write
      .repartition(cfg.maxPartitionCount, col("pid"))
      .write.mode("overwrite").partitionBy("pid")
    outputCompression.fold(writer)(c => writer.option("compression", c))
      .text(outputDir)
  }

  /** Multi-container output spread (reference: PartitionedContentSink
    * round-robins each flush-window×partition blob across the Kusto
    * staging containers, Transforms/PartitionedContentSink.cs:54-66, and
    * Text/TextKustoSink.cs:28-30): partition `pid` writes under
    * `basePaths(pid % N)/pid=<pid>/`. Users with per-account throttling
    * spread ingest load this way.
    *
    * Spark's DataFrameWriter targets ONE root, so this is a one-pass
    * mapPartitions writer (the Split shard-writer pattern): sort the
    * shuffled partition by pid, switch output files on pid change,
    * temp-file + rename commit within each root. Single scan, single
    * shuffle — identical data movement to the single-root path.
    */
  def runSpread(spark: SparkSession, inputGlob: String,
                basePaths: Seq[String], cfg: PartitionConfig,
                gzipOutput: Boolean = false,
                suffix: Option[String] = None): Unit = {
    require(basePaths.nonEmpty, "need at least one base path")
    import spark.implicits._
    val nPaths = basePaths.length
    val paths = basePaths.toIndexedSeq
    // overwrite semantics: clear prior pid dirs under every root
    val hconf = spark.sparkContext.hadoopConfiguration
    paths.foreach { base =>
      val p = new org.apache.hadoop.fs.Path(base)
      val fs = p.getFileSystem(hconf)
      if (fs.exists(p))
        fs.listStatus(p).filter(_.getPath.getName.startsWith("pid="))
          .foreach(st => fs.delete(st.getPath, true))
    }
    val lines = graft.sources.Readers.textLines(spark, inputGlob, suffix)
    writeSpread(withPartitionId(lines, cfg), paths, cfg.maxPartitionCount,
      gzipOutput)
  }

  /** The spread writer: rows annotated with `pid` land under
    * `roots(pid % N)/pid=<pid>/part-*`. One shuffle on pid, per-root
    * temp+rename commit, verbatim bytes. Returns records written.
    *
    * Exactly-once on retry: the DESTINATION name is deterministic
    * (`part-<sparkPartitionId>`), only the tmp name is attempt-unique, and
    * commit is a bare rename — FIRST attempt to rename wins (HDFS-contract
    * rename fails when dest exists); a losing concurrent/speculative
    * attempt deletes its own tmp and moves on. Attempts over the same
    * shuffled partition produce identical bytes (deterministic sort), so
    * first-wins IS exactly-once. No attempt ever deletes a committed
    * file — a delete(dest)-then-rename discipline would let a zombie
    * attempt delete another attempt's committed output and die before
    * restoring it. Job-level OVERWRITE is the caller's dir-clear
    * (runSpread / processBatchSpread), not this writer's concern.
    */
  private[graft] def writeSpread(withPid: DataFrame, roots: IndexedSeq[String],
                                 nPartitions: Int, gzipOutput: Boolean): Long = {
    val spark = withPid.sparkSession
    import spark.implicits._
    val nPaths = roots.length
    // carry the session's spark.hadoop.* settings to the executors —
    // the roots may be remote blob containers needing credentials/fs impls
    val confB = spark.sparkContext.broadcast(
      new org.apache.spark.sql.graft.Shims.SerializableHadoopConf(
        spark.sparkContext.hadoopConfiguration))
    val written = withPid
      .filter(col("pid").isNotNull)
      .select(col("pid").cast("int").as("pid"), col("value"))
      .repartition(nPartitions, col("pid"))
      .sortWithinPartitions("pid")
      .mapPartitions { iter =>
        val conf = confB.value.value
        var n = 0L
        var cur = Int.MinValue
        var writer: java.io.Writer = null
        var tmp: org.apache.hadoop.fs.Path = null
        var dest: org.apache.hadoop.fs.Path = null
        val ctx = Option(org.apache.spark.TaskContext.get())
        val partId = ctx.map(_.partitionId().toString).getOrElse("0")
        val attempt = ctx.map(t => s"$partId-${t.taskAttemptId()}").getOrElse("0")
        def close(): Unit = if (writer != null) {
          writer.close()
          val fs = dest.getFileSystem(conf)
          if (!fs.rename(tmp, dest)) {
            // lost the commit race (dest exists): drop our tmp; any other
            // failure is a real error — surface it
            if (fs.exists(dest)) fs.delete(tmp, false)
            else throw new java.io.IOException(s"commit failed: $tmp -> $dest")
          }
          writer = null
        }
        iter.foreach { row =>
          val pid = row.getInt(0)
          if (pid != cur) {
            close()
            cur = pid
            val base = roots(pid % nPaths) // the round-robin spread
            val ext = if (gzipOutput) ".txt.gz" else ".txt"
            dest = new org.apache.hadoop.fs.Path(s"$base/pid=$pid/part-$partId$ext")
            tmp = new org.apache.hadoop.fs.Path(s"$base/pid=$pid/_tmp-$attempt$ext")
            val fs = dest.getFileSystem(conf)
            val raw: java.io.OutputStream = fs.create(tmp, true)
            val stream =
              if (gzipOutput) new java.util.zip.GZIPOutputStream(raw) else raw
            writer = new java.io.OutputStreamWriter(stream, "UTF-8")
          }
          writer.write(row.getString(1)); writer.write("\n")
          n += 1
        }
        close()
        Iterator.single(n)
      }
    // one action materializes the writes; sum is the records written
    written.agg(sum("value")).collect()(0).getLong(0)
  }

  /** A5's PartitionValueSamples: one witness value of the extracted column
    * per partition id (deterministic: min). The reference computes a
    * first-seen sample per pid and carries it to the sink, where it sits
    * unused (PartitionedContentSink.cs:20,59 — stored, never read); we
    * expose it as a queryable frame instead of dead plumbing.
    */
  def partitionSamples(lines: DataFrame, cfg: PartitionConfig): DataFrame = {
    val field = GraftFunctions.csvColumnAt(col("value"), cfg.columnIndex)
    withPartitionId(lines, cfg)
      .filter(col("pid").isNotNull)
      .withColumn("field", field)
      .groupBy("pid")
      .agg(min(col("field")).as("partition_value_sample"),
        count(lit(1)).as("n_records"))
      .orderBy("pid")
  }

  /** The B7-style validation frame over pipeline output: parse the verbatim
    * CSV lines back to typed columns (reference validation:
    * code/IntegrationTests/Text/NoHeaderNoCompressionTest.cs:20-38).
    */
  def validationFrame(spark: SparkSession, stagingDir: String): DataFrame = {
    val lines = spark.read.text(stagingDir)
    lines.select(
      GraftFunctions.csvColumnAt(col("value"), 0).cast("long").as("Id"),
      GraftFunctions.csvColumnAt(col("value"), 1).cast("timestamp").as("Timestamp"),
      GraftFunctions.csvColumnAt(col("value"), 2).as("Level"))
  }

  /** Cardinality-conservation invariants (RowCount == distinct Id ==
    * distinct Timestamp; 3 levels) as a single-row frame — the reference's
    * correctness contract (NoHeaderNoCompressionTest.cs:46-50).
    */
  def invariants(validation: DataFrame): DataFrame =
    validation.agg(
      count(lit(1)).as("RowCount"),
      countDistinct(col("Id")).as("IdCardinality"),
      countDistinct(col("Timestamp")).as("TimestampCardinality"),
      countDistinct(col("Level")).as("LevelCardinality"))
}
