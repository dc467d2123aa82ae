package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming analytics over the `events` shape — the streaming
  * surface beyond the reference's processing-time flush (SURVEY.md §2C
  * "Streaming" row lists watermarks/event-time windows/session state as
  * absent in the reference; a Spark rebuild gets them from Structured
  * Streaming and a 100 TB pipeline needs them).
  *
  * Scale notes: both operators shuffle once on the grouping key per
  * micro-batch; state is per-key and bounded — windows age out at the
  * watermark, sessions are removed on event-time timeout. No unbounded
  * state, no driver-side loops.
  */
object StreamingAnalytics {

  /** Watermarked tumbling-window counts in APPEND mode: a window row is
    * emitted exactly once, when the watermark passes its end — the
    * streaming analogue of q20_time_window.
    */
  def windowedCounts(events: DataFrame, windowLength: String = "1 minute",
                     watermarkDelay: String = "10 seconds"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))

  /** Per-window heavy-hitter CANDIDATES in UPDATE mode: the Misra–Gries
    * aggregate runs inside a watermarked tumbling-window groupBy, so each
    * (window) key keeps at most k counters of sketch state regardless of
    * vocabulary size — the streaming form of d26's candidate pass (the
    * exact-recount half runs as a batch query over the window's stored
    * data when a window closes). At 100 TB/day the alternative —
    * streaming count per (window, token) — keeps state per DISTINCT
    * TOKEN; this keeps k per window.
    * Input needs (ts, text); emits (ws, candidates).
    */
  def windowedHeavyHitters(docs: DataFrame, k: Int = 64,
                           windowLength: String = "1 minute",
                           watermarkDelay: String = "10 seconds"): DataFrame =
    docs
      .withWatermark("ts", watermarkDelay)
      .select(col("ts"), explode(split(trim(col("text")), "\\s+")).as("token"))
      .groupBy(window(col("ts"), windowLength))
      .agg(graft.functions.AggFunctions.misraGries(col("token"), k)
        .as("candidates"))
      .select(col("window.start").as("ws"), col("candidates"))

  /** Streaming exact dedup: first occurrence of each content hash wins;
    * `dropDuplicatesWithinWatermark` evicts a hash's state once the
    * watermark passes its event time + delay, so state is bounded AND new
    * rows are never dropped for lateness — a duplicate arriving more than
    * `watermarkDelay` after its original may pass (the standard
    * state-size/completeness trade; at 100 TB/day unbounded dedup state is
    * not an option). Input needs (ts, text) columns.
    */
  def dedupStream(docs: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    docs
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")

  /** EXACT-dedup corpus append — the exactly-once "add to the training
    * corpus" sink: each micro-batch drops rows whose content hash already
    * exists in the persisted corpus table (and in-batch duplicates, first
    * id wins), then appends only the novel rows into a hash-bucketed
    * layout. The existence probe reads ONLY the buckets the batch
    * touches (the upsertLatest pruning discipline) — per-batch cost is
    * O(batch + touched buckets), never O(corpus). Replay-idempotent by
    * construction: a re-run batch finds its own rows already present and
    * appends nothing (state convergence, not byte-identical files —
    * same contract as the reference's ingest-if-not-exists tags).
    */
  def appendUnique(docs: DataFrame, textCol: String, idCol: String,
                   tableDir: String, checkpointDir: String,
                   nBuckets: Int = 64)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        appendUniqueBatch(batch, textCol, idCol, tableDir, nBuckets)
        ()
      }
      .start()

  /** One exact-dedup append step (the `foreachBatch` body, callable
    * directly for batch backfills). Returns the number of novel rows
    * appended.
    */
  def appendUniqueBatch(batch: DataFrame, textCol: String, idCol: String,
                        tableDir: String, nBuckets: Int = 64): Long = {
    import org.apache.spark.sql.expressions.Window
    val spark = batch.sparkSession
    // coalesce: a NULL text must still get a non-null hash key, else the
    // left_anti probe never matches it and replays re-append the row
    // forever (breaking the replay-idempotency contract)
    val hashed = batch
      .withColumn("content_hash", md5(coalesce(col(textCol), lit(""))))
      .withColumn("bucket", pmod(hash(col("content_hash")), lit(nBuckets)))
      // in-batch exact dedup, deterministic winner (lowest id)
      .withColumn("rn", row_number().over(
        Window.partitionBy("content_hash").orderBy(col(idCol))))
      .filter(col("rn") === 1).drop("rn")
      .localCheckpoint() // read for probe + append; bounded batch-sized
    val fs = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasData = fs.exists(new org.apache.hadoop.fs.Path(tableDir)) &&
      fs.listStatus(new org.apache.hadoop.fs.Path(tableDir))
        .exists(_.getPath.getName.startsWith("bucket="))
    val novel =
      if (!hasData) hashed
      else {
        val touched = hashed.select("bucket").distinct()
          .collect().map(_.getInt(0)) // bounded: <= nBuckets ints
        val existing = spark.read.parquet(tableDir)
          .filter(col("bucket").isin(touched.map(Integer.valueOf): _*))
          .select("content_hash")
        hashed.join(existing, Seq("content_hash"), "left_anti")
          .localCheckpoint() // materialize BEFORE appending below
      }
    val n = novel.count()
    if (n > 0)
      novel.write.mode("append").partitionBy("bucket").parquet(tableDir)
    n
  }

  /** Near-dup flagging AT INGEST: every micro-batch of landing documents
    * is checked against the standing corpus via the banded MinHash index
    * (built ONCE here, reused per batch — the wave-work is
    * O(batch + touched buckets), the corpus is never re-sketched).
    * `foreachBatch` runs the proven batch operator per wave; each batch's
    * verified cross pairs land in their own `batch_id=` partition dir in
    * overwrite mode, so a replayed micro-batch rewrites the identical
    * bytes instead of duplicating them (the same idempotent-replay
    * discipline as the streaming pre-partition sink).
    *
    * @param docs streaming frame with (idCol, textCol)
    * @return started query; stop() it or await termination
    */
  def nearDupIngest(docs: DataFrame, corpus: DataFrame, idCol: String,
                    textCol: String, outDir: String, checkpointDir: String,
                    threshold: Double = 0.5)
      : org.apache.spark.sql.streaming.StreamingQuery =
    nearDupIngestIndexed(docs,
      graft.operators.Dedup.sketchIndex(corpus, idCol, textCol),
      idCol, textCol, outDir, checkpointDir, threshold)

  /** `nearDupIngest` against a PERSISTED corpus index (`Dedup.writeIndex`
    * parquet, loaded with `Dedup.loadIndex`) — server startup reads the
    * index instead of re-sketching the corpus.
    */
  def nearDupIngestIndexed(docs: DataFrame, corpusIdx: DataFrame,
                           idCol: String, textCol: String, outDir: String,
                           checkpointDir: String, threshold: Double = 0.5)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.operators.Dedup
          .incrementalNearDupIndexed(corpusIdx, batch, idCol, textCol,
            threshold = threshold)
          // `wave=`, not `batch_id=`: the result already carries a
          // batch_id data column; a same-named partition dir would
          // collide at read time
          .write.mode("overwrite").parquet(s"$outDir/wave=$batchId")
        ()
      }
      .start()
  }

  /** STREAMING WET EXPORT — the archive-producing end of a continuous
    * pipeline: each micro-batch of landing documents (doc_id, source,
    * text) exports as its own wave of WET shards under
    * `outDir/wave=<batchId>/` through the batch [[graft.sources.
    * WarcSource.writeWet]]. Exactly-once without a transaction log:
    * record bytes are a deterministic function of the rows (fixed
    * export date, pmod shard assignment, doc_id sort), and the writer
    * commits each shard via tmp + FIRST-WINS rename — so a replayed
    * micro-batch recomputes byte-identical archives and loses every
    * rename race to the originals, never duplicating or tearing a
    * shard (the streaming pre-partition sink's idempotent-replay
    * discipline, applied to archive files).
    */
  def wetExportIngest(docs: DataFrame, outDir: String,
                      checkpointDir: String, nShards: Int = 4,
                      gzip: Boolean = true)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.sources.WarcSource.writeWet(
          batch.toDF(), s"$outDir/wave=$batchId", nShards, gzip)
        ()
      }
      .start()

  /** [[wetExportIngest]]'s response-record sibling: micro-batches of
    * page rows (uri, status, content_type, body) export as waves of
    * `.warc.gz` archives through the batch [[graft.sources.WarcSource.
    * writeWarc]] — same determinism argument, same first-wins commit,
    * real payload digests per record.
    */
  def warcExportIngest(pages: DataFrame, outDir: String,
                       checkpointDir: String, nShards: Int = 4,
                       gzip: Boolean = true)
      : org.apache.spark.sql.streaming.StreamingQuery =
    pages.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.sources.WarcSource.writeWarc(
          batch.toDF(), s"$outDir/wave=$batchId", nShards, gzip)
        ()
      }
      .start()

  /** CC-shaped CONTINUOUS export — [[warcExportIngest]] with digest
    * dedup carried ACROSS micro-batches through a persisted index
    * (`<outDir>/digest-index/wave=<id>` parquet of digest → original
    * uri): a batch's never-seen digests pick a batch-local winner (min
    * uri, the writeWarc rule) that writes the full response and joins
    * the index; digests known from EARLIER waves write `revisit`
    * records pointing at the original wave's URI — so the whole
    * multi-wave output is one CC-shaped archive set that `warc-index`
    * + `resolveRevisits` reconstitute.
    *
    * Replay safety (the waves discipline, extended to state): the
    * index read EXCLUDES waves at/after the current batch id — a
    * replayed batch must not see its own possibly-crash-partial wave,
    * or its winners would flip to revisits and the recompute would
    * stop being byte-identical. Same prior state + same batch ⇒ same
    * winners ⇒ same bytes; archive shards commit first-wins, the index
    * wave rewrites in overwrite mode. Per-batch cost: one digest agg +
    * two 1:1-per-digest joins (pointer-sized state side), never a
    * fan-out.
    */
  def warcExportDedupIngest(pages: DataFrame, outDir: String,
                            checkpointDir: String, nShards: Int = 4,
                            gzip: Boolean = true,
                            date: String = "2026-01-01T00:00:00Z")
      : org.apache.spark.sql.streaming.StreamingQuery =
    pages.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val idxDir = s"$outDir/digest-index"
        val prior =
          try spark.read.option("basePath", idxDir).parquet(idxDir)
            .filter(col("wave") < batchId)
            .select(col("digest"), col("orig").as("prior_orig"))
          catch {
            // first batch: no index yet (the listing error surfaces as
            // either, depending on the path layer)
            case _: org.apache.spark.sql.AnalysisException |
                 _: java.io.FileNotFoundException =>
              Seq.empty[(String, String)].toDF("digest", "prior_orig")
          }
        val withDigest = batch.toDF()
          .select(col("uri").cast("string"), col("status").cast("int"),
            col("content_type").cast("string"), col("body"))
          .as[(String, Int, String, Array[Byte])]
          .map { case (uri, status, ct, body) =>
            (uri, status, ct, body,
              graft.sources.WarcSource.payloadDigestOf(
                if (body == null) Array.emptyByteArray else body))
          }
          .toDF("uri", "status", "content_type", "body", "digest")
          .persist()
        val newWinners = withDigest
          .join(prior, Seq("digest"), "left_anti")
          .groupBy("digest").agg(min(col("uri")).as("orig"))
          .persist()
        try {
          val decided = withDigest
            .join(prior, Seq("digest"), "left")
            .join(newWinners, Seq("digest"), "left")
            .withColumn("orig", coalesce(col("prior_orig"), col("orig")))
          graft.sources.WarcSource.writeWarcDecided(
            decided.select("uri", "status", "content_type", "body", "orig",
              "digest"),
            s"$outDir/wave=$batchId", nShards, gzip, date)
          // the index append happens AFTER the archives land: a crash
          // between the two replays with the same prior state either way
          newWinners.write.mode("overwrite")
            .parquet(s"$idxDir/wave=$batchId")
        } finally {
          // both caches release on failure too — a restarted stream on
          // the same session must not accumulate pinned blocks per
          // failed attempt (r19 review)
          newWinners.unpersist()
          withDigest.unpersist()
        }
        ()
      }
      .start()

  /** SEMANTIC (embedding) dedup at ingest against a committed corpus's
    * persisted clustering state (PrepareRun's `semantic_centroids` +
    * `semantic_reps`): each micro-batch of (idCol, embedding) rows runs
    * `Similarity.semanticDedupWave` — assign to the SAME committed
    * centroids, flag when an earlier-committed representative (or an
    * earlier same-batch vector inside the union window) exceeds `tau`.
    * Committed docs always win; per-batch cost is O(batch · repCap)
    * pairs (both generators are window-bounded).
    *
    * FLAGS only — it never appends representatives: rep appends are the
    * transactional `runWave` marker protocol's job, and a foreachBatch
    * writer has no stage marker to make that crash-safe. The streaming
    * server is the tripwire ("this feed is semantically redundant");
    * the ingest that actually extends the corpus runs `runWave`.
    * Removal rows land per `wave=<batchId>` dir in overwrite mode —
    * the idempotent-replay discipline.
    *
    * @param docs streaming frame with (idCol, "embedding") columns
    */
  def semanticDedupIngest(docs: DataFrame, cents: Array[Array[Float]],
                          reps: DataFrame, idCol: String, outDir: String,
                          checkpointDir: String, repCap: Int = 256,
                          tau: Double = 0.4)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // data-level prep carried across batches (the asofEnrich/
    // nearDupIngestIndexed discipline): the reps side is cached once
    val prepped = reps
      .select("cluster", "rep_rank", "vec_id", "embedding").persist()
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.operators.Similarity.semanticDedupWave(
            batch.select(col(idCol).as("vec_id"), col("embedding")),
            cents, prepped, repCap = repCap, tau = tau)._1
          .write.mode("overwrite").parquet(s"$outDir/wave=$batchId")
        ()
      }
      .start()
  }

  /** Streaming AS-OF enrichment: each micro-batch of events is joined —
    * through the NATIVE as-of operator (plans.AsofJoin) — against a
    * static, pre-deduped reference table (e.g. latest order state per
    * customer at event time). The reference is hash-partitioned on the
    * key, sorted by (key, time), and CACHED once up front — the cached
    * relation advertises its partitioning and ordering, so every batch
    * plan satisfies the operator's right-side requirements without a new
    * exchange or sort (foreachBatch replans per batch; data-level
    * preparation, not plan-level reuse, is what actually carries over —
    * same principle as nearDupIngestIndexed's prebuilt index). Per-batch
    * cost is then the batch-sized left exchange + the merge. Output
    * lands per-wave in overwrite mode — idempotent replay.
    *
    * @param events streaming frame with (key, at, ...) columns
    * @param reference static frame with (key, at, valueCols...) —
    *        pre-dedupe per (key, at) for a deterministic match
    */
  def asofEnrich(events: DataFrame, reference: DataFrame,
                 key: String, time: String, valueCols: Seq[String],
                 outDir: String, checkpointDir: String,
                 direction: String = "backward", tolerance: Long = -1L)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val prepped = reference
      .repartition(col(key))
      .sortWithinPartitions(col(key), col(time))
      .persist()
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.plans.AsofJoin
          .joinAsof(batch, prepped, key, time, valueCols, direction, tolerance)
          .write.mode("overwrite").parquet(s"$outDir/wave=$batchId")
        ()
      }
      .start()
  }

  /** Stream-stream join with a time-range condition — view→click
    * attribution: a click joins the view it followed within
    * `joinWindowSeconds` on the same user. BOTH sides are watermarked and
    * the range condition is part of the join predicate, which is what
    * bounds each side's buffered state: a view can be evicted once the
    * click-side watermark passes `v_ts + joinWindow`, a click once the
    * view-side watermark passes its `c_ts` — without the range bound the
    * state is unbounded and Spark rejects outer modes outright. One
    * exchange per side on user_id per micro-batch; state scales with the
    * in-window row count, never stream history.
    *
    * `joinType = "leftOuter"` additionally emits unattributed views
    * (null click columns) — exactly once, when the watermark proves no
    * matching click can still arrive.
    */
  def attributedClicks(views: DataFrame, clicks: DataFrame,
                       joinWindowSeconds: Long = 60,
                       watermarkDelay: String = "10 seconds",
                       joinType: String = "inner"): DataFrame = {
    val v = views.select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .withWatermark("v_ts", watermarkDelay)
    val c = clicks.select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", watermarkDelay)
    v.join(c,
      col("v_user") === col("c_user") &&
        col("c_ts") >= col("v_ts") &&
        col("c_ts") <= col("v_ts") +
          expr(s"INTERVAL $joinWindowSeconds SECONDS"),
      joinType)
  }

  case class Evt(user_id: Long, ts: Timestamp)
  case class SessionAcc(start: Long, end: Long, n: Long)
  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long)

  /** Stateful sessionization (streaming analogue of q27_sessionize): a
    * session closes when no event arrives within `gapSeconds` of its last
    * event, tracked with per-key GroupState + event-time timeout. Sessions
    * are emitted when a later event opens a new session OR when the
    * watermark passes last_event + gap (timeout) — so quiet keys still
    * close. Exactly-once via checkpointed state.
    */
  def sessionize(events: Dataset[Evt], gapSeconds: Long,
                 watermarkDelay: String = "10 seconds"): Dataset[Session] = {
    val gapMs = gapSeconds * 1000L
    import events.sparkSession.implicits._

    def update(userId: Long, batch: Iterator[Evt],
               state: GroupState[SessionAcc]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n))
      } else {
        val sorted = batch.toSeq.sortBy(_.ts.getTime)
        var closed = List.empty[Session]
        var cur = state.getOption
        for (e <- sorted) {
          val t = e.ts.getTime
          cur = cur match {
            case Some(c) if t - c.end <= gapMs =>
              Some(SessionAcc(c.start, math.max(c.end, t), c.n + 1))
            case Some(c) =>
              closed ::= Session(userId, new Timestamp(c.start), new Timestamp(c.end), c.n)
              Some(SessionAcc(t, t, 1))
            case None => Some(SessionAcc(t, t, 1))
          }
        }
        cur.foreach { c =>
          state.update(c)
          // a timeout at-or-before the current watermark throws and kills
          // the query (possible when watermarkDelay > gap and the batch's
          // rows are late-but-in-watermark) — clamp to watermark + 1 so
          // the session closes on the next trigger instead
          state.setTimeoutTimestamp(
            math.max(c.end + gapMs, state.getCurrentWatermarkMs() + 1))
        }
        closed.reverseIterator
      }
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Replay-safe streaming upsert: continuously materialize the LATEST
    * row per key into a bucket-partitioned parquet table (the CDC
    * "materialized view" pattern). Per micro-batch, `foreachBatch`:
    *   1. reduces the batch to its latest row per key,
    *   2. reads ONLY the table buckets those keys hash into (partition
    *      pruning on the bucket column — the batch's touched-bucket set,
    *      not the table, bounds the read),
    *   3. merges by (tsCol, then key) argmax,
    *   4. rewrites just those buckets via DYNAMIC partition overwrite.
    *
    * Crash/replay safety without a transaction log: the merge is
    * IDEMPOTENT (re-applying rows that already won changes nothing), and
    * a partially-overwritten bucket set simply re-merges on the replayed
    * batch — the argmax re-derives the same winners whether or not the
    * previous attempt's writes landed. At 100 TB the per-batch cost is
    * O(touched buckets), not O(table) — the same reason the dedup index
    * and IVF lists partition their standing state.
    *
    * Contract: (keyCol, tsCol) pairs are unique per key version (the
    * CDC shape); two different rows carrying the SAME key and ts race
    * arbitrarily, as in any last-writer-wins store.
    */
  def upsertLatest(stream: DataFrame, keyCol: String, tsCol: String,
                   tableDir: String, checkpointDir: String,
                   nBuckets: Int = 64)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsertBatch(batch, keyCol, tsCol, tableDir, nBuckets)
      }
      .start()

  /** One upsert merge step (the `foreachBatch` body, callable directly
    * for batch backfills and tested in isolation).
    */
  def upsertBatch(batch: DataFrame, keyCol: String, tsCol: String,
                  tableDir: String, nBuckets: Int): Unit = {
    import org.apache.spark.sql.expressions.Window
    val spark = batch.sparkSession
    // The table's layout is keyed by pmod(hash(key), nBuckets): merging
    // with a DIFFERENT nBuckets than the one the table was built with
    // would leave stale versions of a key stranded in its old bucket —
    // duplicates the argmax merge never sees. Record the bucket count in
    // a marker file on first write and fail fast on mismatch.
    val fsM = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // capture BEFORE creating the marker (which materializes tableDir)
    val tableHasData = fsM.exists(new org.apache.hadoop.fs.Path(tableDir)) &&
      fsM.listStatus(new org.apache.hadoop.fs.Path(tableDir))
        .exists(_.getPath.getName.startsWith("bucket="))
    val marker = new org.apache.hadoop.fs.Path(tableDir, "_bucket_count")
    if (fsM.exists(marker)) {
      val in = fsM.open(marker)
      val recorded = try scala.io.Source.fromInputStream(in, "UTF-8")
        .mkString.trim.toInt finally in.close()
      require(recorded == nBuckets,
        s"upsert table $tableDir was built with nBuckets=$recorded; " +
          s"refusing to merge with nBuckets=$nBuckets (keys would be " +
          "looked up in the wrong bucket, leaving stale duplicates)")
    } else {
      val out = fsM.create(marker, true)
      try out.write(nBuckets.toString.getBytes("UTF-8")) finally out.close()
    }
    val bucketed = batch.withColumn("bucket",
      pmod(hash(col(keyCol)), lit(nBuckets)))
    val latestInBatch = bucketed.withColumn("rn",
        row_number().over(Window.partitionBy(keyCol)
          .orderBy(desc(tsCol), col(keyCol))))
      .filter(col("rn") === 1).drop("rn")
      .localCheckpoint() // bounded: batch-sized; read before any overwrite
    val touched = latestInBatch.select("bucket").distinct()
      .collect().map(_.getInt(0)) // bounded driver list: <= nBuckets ints
    val merged =
      if (tableHasData) {
        val existing = spark.read.parquet(tableDir)
          .filter(col("bucket").isin(touched.map(Integer.valueOf): _*))
        // read fully before the overwrite below replaces these files
        existing.unionByName(latestInBatch).withColumn("rn",
            row_number().over(Window.partitionBy(keyCol)
              .orderBy(desc(tsCol), col(keyCol))))
          .filter(col("rn") === 1).drop("rn")
          .localCheckpoint()
      } else latestInBatch
    // scope the dynamic-overwrite mode to THIS write (a session-wide
    // flip would silently change other writers' overwrite semantics)
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(tableDir)
  }

  /** Streaming quality gate with a QUARANTINE side-channel — the
    * filter-and-route stage every ingestion pipeline runs before data
    * reaches the training corpus: passing docs land under
    * `passDir/batch=<id>`, failing docs under `quarantineDir/batch=<id>`
    * with their failure signals attached (quarantine is reviewable, not
    * discarded — the operational difference between a filter and a gate).
    * The decision rule is deterministic (word count + mean word length,
    * the d4/d23 signal family), so a REPLAYED batch rewrites exactly the
    * same rows into the same per-batch directories in overwrite mode —
    * idempotent without markers (the StreamingPrePartition discipline).
    * One narrow pass per batch; the scored frame materializes once
    * (node... batch-sized) because both routes consume it.
    */
  def qualityRoute(docs: DataFrame, passDir: String, quarantineDir: String,
                   checkpointDir: String, minWords: Int = 5,
                   maxMeanWordLen: Double = 12.0)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        routeBatch(batch, batchId, passDir, quarantineDir,
          minWords, maxMeanWordLen)
        ()
      }
      .start()

  /** One routing step (the `foreachBatch` body, callable directly for
    * batch backfills). Returns (nPassed, nQuarantined).
    */
  def routeBatch(batch: DataFrame, batchId: Long,
                 passDir: String, quarantineDir: String,
                 minWords: Int, maxMeanWordLen: Double): (Long, Long) = {
    val scored = batch
      .withColumn("n_words", size(split(trim(col("text")), "\\s+")))
      .withColumn("mean_wl",
        (length(translate(trim(col("text")), " ", "")).cast("double") /
          greatest(col("n_words"), lit(1))))
      .withColumn("q_pass",
        col("n_words") >= minWords && col("mean_wl") <= maxMeanWordLen)
      .localCheckpoint() // consumed by both routes below
    val pass = scored.filter(col("q_pass"))
      .drop("n_words", "mean_wl", "q_pass")
    val fail = scored.filter(!col("q_pass")).drop("q_pass")
    pass.write.mode("overwrite").parquet(s"$passDir/batch=$batchId")
    fail.write.mode("overwrite").parquet(s"$quarantineDir/batch=$batchId")
    (pass.count(), fail.count())
  }

  /** Declarative sessionization via the built-in `session_window`
    * (gap-merged event-time windows) — the no-custom-state alternative to
    * `sessionize`: Spark's session-window state store handles merge and
    * eviction, APPEND mode emits each closed session exactly once when
    * the watermark passes its end. Prefer this form when per-session
    * output is (start, end, agg) — the engine's native session operator
    * merges windows inside the state store with no user code on the hot
    * path; drop to `flatMapGroupsWithState` only for session logic the
    * aggregate language can't express (e.g. mid-session emission).
    * One shuffle on (user_id) per micro-batch; state per OPEN session.
    */
  def sessionWindowStats(events: DataFrame, gapSeconds: Long,
                         watermarkDelay: String = "10 seconds"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), s"$gapSeconds seconds"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  case class SrcTok(source: String, token: String)
  case class HllState(regs: Seq[Int], n_seen: Long)
  case class HllEst(source: String, n_seen: Long, hll_est: Long)

  /** Streaming distinct-count per source: a 64-register HyperLogLog in
    * per-key GroupState (256 bytes per source, FOREVER — vs the
    * unbounded token set exact streaming distinct would hoard). Emits
    * the updated estimate per key per micro-batch (Append mode). The
    * register semantics are graft.functions.Hll — the SAME arithmetic
    * the d48/d49 batch gates pin against DuckDB, so a streaming
    * estimate and a batch recompute of the same data agree EXACTLY
    * (spec-pinned), and replay is idempotent by construction: registers
    * are a max, duplicates and re-deliveries are absorbed. Emits one
    * row per (source, micro-batch) — an append-mode estimate time
    * series any sink can take (parquet included).
    */
  def streamingDistinct(toks: Dataset[SrcTok]): Dataset[HllEst] = {
    import toks.sparkSession.implicits._
    toks.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, batch: Iterator[SrcTok], state: GroupState[HllState]) =>
          val regs = state.getOption
            .map(_.regs.toArray).getOrElse(new Array[Int](graft.functions.Hll.m))
          var n = state.getOption.map(_.n_seen).getOrElse(0L)
          batch.foreach { st =>
            graft.functions.Hll.update(regs, st.token)
            n += 1
          }
          state.update(HllState(regs.toSeq, n))
          Iterator(HllEst(src, n, graft.functions.Hll.estimate(regs)))
      }
  }

  // binaryFile's schema is fixed by the format, but streaming file
  // sources require it stated explicitly — shared by the three ingest
  // servers (warc/tar/zip)
  private val binaryFileSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("path",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("modificationTime",
      org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("length",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("content",
      org.apache.spark.sql.types.BinaryType)))

  /** Continuous crawl ingestion: a landing directory of `.warc`/`.warc.gz`
    * archives streams through the WARC walk + HTML extraction
    * (sources/WarcSource) into an append-only parquet table of extracted
    * pages. The `binaryFile` source gives exactly-once file-granular
    * progress through the checkpoint; each micro-batch is the narrow
    * map-only plan the batch arm (`warcFiles`) runs, so backpressure is
    * just `maxFilesPerTrigger`. Output: (file, uri, status, text).
    */
  def warcIngest(spark: org.apache.spark.sql.SparkSession,
                 landingDir: String, outDir: String,
                 checkpointDir: String, maxFilesPerTrigger: Int = 32,
                 lenient: Boolean = true)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import spark.implicits._
    // binaryFile's schema is fixed by the format, but streaming file
    // sources require it stated explicitly
    val stream = spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", "*.warc*")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(landingDir)
    // lenient by default: a crawl server must outlive malformed pages
    // (null text, row kept) AND poison archives (container damage yields
    // ONE uri-NULL/status -1 row for the file instead of a micro-batch
    // that refails on every retry, wedging the stream). ONE extraction
    // policy, shared with the batch arm (responseRows).
    // Only `path` is selected, so column pruning keeps binaryFile from
    // materializing file bytes in the row; each task re-opens its file
    // and streams it record-at-a-time — O(largest record), same as batch.
    val conf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    stream.select(col("path")).as[String]
      .flatMap { path =>
        // open at FIRST USE (deferred): a file deleted between listing
        // and task must poison under lenient, not fail the micro-batch
        val base = graft.sources.StreamUtil.deferred {
          val p = new org.apache.hadoop.fs.Path(path)
          val in = p.getFileSystem(conf.value).open(p)
          graft.sources.WarcSource.responseRows(path, in, lenient,
            mainContent = false)
        }
        if (!lenient) base
        else graft.sources.StreamUtil.poisonOnError(base,
          (path, null, -1, null, "damage:container")) // open failures;
          // parse errors poison inside
      }
      .toDF("file", "uri", "status", "text", "degraded")
      .writeStream
      .format("parquet")
      .option("checkpointLocation", checkpointDir)
      .option("path", outDir)
      .start()
  }

  /** Continuous WebDataset-shard ingestion — the tar sibling of
    * [[warcIngest]]: a landing directory of `.tar`/`.tar.gz` shards
    * streams through the entry walk (sources/TarSource) into an
    * append-only parquet member manifest, exactly-once per file through
    * the checkpoint. Same memory discipline as batch: only `path` is
    * selected (binaryFile never ships content in a Row) and each task
    * streams its shard entry-at-a-time — O(largest entry).
    * Output: (shard, name, sample_key, bytes).
    */
  def tarIngest(spark: org.apache.spark.sql.SparkSession,
                landingDir: String, outDir: String,
                checkpointDir: String, maxFilesPerTrigger: Int = 32,
                lenient: Boolean = true)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import spark.implicits._
    val conf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", "*.tar*")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(landingDir)
      .select(col("path")).as[String]
      .flatMap { path =>
        // open deferred to first use — see warcIngest's listing-race note
        val base = graft.sources.StreamUtil.deferred {
          val p = new org.apache.hadoop.fs.Path(path)
          val in = p.getFileSystem(conf.value).open(p)
          graft.sources.StreamUtil.closeOnExhaust(in,
            graft.sources.TarSource.shardEntryIter(in)
              .filter(_.typeflag == '0')
              .map(e => (path, e.name, e.name.takeWhile(_ != '.'), e.size)))
        }
        // lenient (default): a damaged shard yields its entries up to
        // the damage, then ONE poison row (null name, bytes -1) — never
        // a micro-batch that refails on every retry
        if (!lenient) base
        else graft.sources.StreamUtil.poisonOnError(base,
          (path, null, null, -1L))
      }
      .toDF("shard", "name", "sample_key", "bytes")
      .writeStream
      .format("parquet")
      .option("checkpointLocation", checkpointDir)
      .option("path", outDir)
      .start()
  }

  /** Continuous ZIP-shard ingestion — completes the streaming trio
    * (WARC [[warcIngest]], tar [[tarIngest]]): landing `.zip` archives
    * stream into an append-only entry manifest, exactly-once per file.
    * The directory read needs SEEKS, so the task opens (and stats) the
    * path itself at first use — only `path` is ever selected from the
    * binaryFile source. Decode + CRC verification per entry, O(largest
    * entry) memory; under `lenient` a damaged archive degrades to one
    * poison row (null name, usize -1) instead of wedging the stream.
    * Output: (file, name, method, usize, crc_ok).
    */
  def zipIngest(spark: org.apache.spark.sql.SparkSession,
                landingDir: String, outDir: String,
                checkpointDir: String, maxFilesPerTrigger: Int = 32,
                lenient: Boolean = true)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import spark.implicits._
    val conf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", "*.zip")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(landingDir)
      .select(col("path")).as[String]
      .flatMap { path =>
        // open AND stat at first use, inside the guard: a file deleted
        // after listing poisons instead of wedging the stream, and the
        // length is the task-time one, not the (possibly stale)
        // listing-time value of a still-growing copy-in
        val base = graft.sources.StreamUtil.deferred {
          val p = new org.apache.hadoop.fs.Path(path)
          val fs = p.getFileSystem(conf.value)
          val len = fs.getFileStatus(p).getLen
          val fsIn = fs.open(p)
          graft.sources.StreamUtil.closeOnExhaust(fsIn, {
            val in = new graft.sources.ZipSource.StreamSeekable(fsIn, len)
            graft.sources.ZipSource.readDirectory(in).entries.iterator.map { e =>
              val n = graft.sources.ZipSource.entryBytes(in, e).length.toLong
              (path, e.name, e.method, e.usize, n == e.usize)
            }
          })
        }
        if (!lenient) base
        else graft.sources.StreamUtil.poisonOnError(base,
          (path, null, -1, -1L, false))
      }
      .toDF("file", "name", "method", "usize", "crc_ok")
      .writeStream
      .format("parquet")
      .option("checkpointLocation", checkpointDir)
      .option("path", outDir)
      .start()
  }

  /** Continuous INDEX-DRIVEN fetch — the CDX sibling of [[warcIngest]]:
    * `.cdx(.gz)` shards land, each line's (filename, offset, length)
    * pointer fetches ONE gzip member out of `warcDir`, and the decoded
    * rows append exactly-once through the checkpoint. This is the
    * streaming shape of selective refetch: work is proportional to
    * index lines landed, never to archive bytes. Per-task archive
    * handles live in a small bounded cache (cdx shards are SURT-sorted,
    * so pointers interleave across archives — unlike the batch arm's
    * filename sort); under `lenient` a malformed line or failed fetch
    * degrades to one countable poison row (uri NULL, status -1), a
    * malformed page to a NULL text with its uri kept, and shard-level
    * damage (gzip CRC on the index itself) to one poison row for the
    * file — the micro-batch never wedges on retry. Output:
    * (file, uri, status, text) where `file` is the fetched ARCHIVE for
    * decoded rows (the fetchByIndex shape — per-archive accounting)
    * and the index shard path for poison rows (a bad line's only
    * provenance).
    */
  /** Continuous WAT-metadata ingestion — the streaming arm of
    * `watFiles` (same envelope walk, same lenient contract): landing
    * `.wat(.gz)` archives stream into an append-only table of
    * per-capture envelope facts, exactly-once per file through the
    * binaryFile checkpoint. Bad envelopes degrade per record (uri
    * kept, facts -1), container damage poisons the rest of the FILE as
    * one uri-NULL row — the warcIngest discipline.
    */
  def watIngest(spark: org.apache.spark.sql.SparkSession,
                landingDir: String, outDir: String,
                checkpointDir: String, maxFilesPerTrigger: Int = 32,
                lenient: Boolean = true)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import spark.implicits._
    val conf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", "*.wat*")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(landingDir)
      .select(col("path")).as[String]
      .flatMap { path =>
        // open deferred to first use — see warcIngest's listing-race note
        val base = graft.sources.StreamUtil.deferred {
          val p = new org.apache.hadoop.fs.Path(path)
          // watRowsIter wraps the stream in its own closeOnExhaust
          graft.sources.WatSource.watRowsIter(path,
            p.getFileSystem(conf.value).open(p), lenient)
        }
        if (!lenient) base
        else graft.sources.StreamUtil.poisonOnError(base,
          (path, null, null, -1, -1))
      }
      .toDF("file", "uri", "title", "n_links", "status")
      .writeStream
      .format("parquet")
      .option("checkpointLocation", checkpointDir)
      .option("path", outDir)
      .start()
  }

  def cdxFetchIngest(spark: org.apache.spark.sql.SparkSession,
                     cdxLandingDir: String, warcDir: String,
                     outDir: String, checkpointDir: String,
                     maxFilesPerTrigger: Int = 32,
                     lenient: Boolean = true)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import spark.implicits._
    val conf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val dir = warcDir
    spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", "*.cdx*")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(cdxLandingDir)
      .select(col("path")).as[String]
      .flatMap { path =>
        val base = graft.sources.StreamUtil.deferred {
          val p = new org.apache.hadoop.fs.Path(path)
          val in = p.getFileSystem(conf.value).open(p)
          val stream: java.io.InputStream =
            if (path.endsWith(".gz"))
              new graft.sources.Gzip.GunzipStream(new graft.sources.ByteFeed(in))
            else in
          val reader = new java.io.BufferedReader(
            new java.io.InputStreamReader(stream, "UTF-8"))
          // bounded archive-handle cache, oldest-evicted: SURT order
          // interleaves archives, but neighboring lines still cluster
          val handles = scala.collection.mutable.LinkedHashMap[String,
            (org.apache.hadoop.fs.FSDataInputStream, Long)]()
          def closeQuietly(h: org.apache.hadoop.fs.FSDataInputStream): Unit =
            try h.close() catch { case _: java.io.IOException => () }
          def archive(fname: String)
              : (org.apache.hadoop.fs.FSDataInputStream, Long) =
            handles.getOrElseUpdate(fname, {
              if (handles.size >= 8) {
                val (k, (h, _)) = handles.head
                closeQuietly(h); handles.remove(k)
              }
              val ap = new org.apache.hadoop.fs.Path(dir, fname)
              val afs = ap.getFileSystem(conf.value)
              (afs.open(ap), afs.getFileStatus(ap).getLen)
            })
          val rows = Iterator.continually(reader.readLine())
            .takeWhile(_ != null)
            .filter(_.nonEmpty)
            .map { ln =>
              try {
                val e = graft.sources.CdxSource.parseCdxLine(ln)
                val (h, size) = archive(e.filename)
                val r = graft.sources.CdxSource.fetchRecord(
                  new graft.sources.ZipSource.StreamSeekable(h, size),
                  e.offset, e.length, lenientHttp = lenient)
                // fetched rows carry the ARCHIVE filename (the
                // fetchByIndex shape — per-archive accounting needs
                // it); poison rows carry the index shard path, the
                // only provenance a bad line has
                graft.sources.WarcSource.extractRow(e.filename, r, lenient)
              } catch {
                // NonFatal, not just RuntimeException: a missing or
                // unreadable ARCHIVE surfaces as IOException from
                // fs.open/readFully, and it must poison THIS line —
                // letting it escape to the file-level guard would
                // silently drop every remaining line of the shard
                // while the checkpoint marks it done (r17 review)
                case scala.util.control.NonFatal(_) if lenient =>
                  // bad line / bad pointer / bad archive
                  (path, null, -1, null, "damage:index")
              }
            }
          graft.sources.StreamUtil.closeOnExhaust(in,
            graft.sources.StreamUtil.closeOnExhaust(
              () => handles.valuesIterator.foreach(v => closeQuietly(v._1)),
              rows))
        }
        if (!lenient) base
        else graft.sources.StreamUtil.poisonOnError(base,
          (path, null, -1, null, "damage:container"))
      }
      .toDF("file", "uri", "status", "text", "degraded")
      .writeStream
      .format("parquet")
      .option("checkpointLocation", checkpointDir)
      .option("path", outDir)
      .start()
  }
}

/** Hadoop `Configuration` is `Writable`, not `Serializable`; executors
  * opening files by path (the streaming WARC arm) need the driver's conf
  * shipped in the closure — this is the standard write()/readFields()
  * Java-serialization bridge.
  */
private[graft] final class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}
