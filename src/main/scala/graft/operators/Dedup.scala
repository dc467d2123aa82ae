package graft.operators

import graft.functions.SketchFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection over a (id, text) corpus — the training-data
  * dedup family: MinHash+LSH, SimHash, and inverted-index exact n-gram
  * Jaccard. Exact (md5) dedup lives in TextQueries (oracle-backed).
  *
  * Scale design (100 TB):
  *   - Everything is per-row narrow maps + ONE shuffle on a bucket key
  *     (band hash / simhash band / rare shingle) + a bucket-local
  *     pair-join. No all-pairs product ever materializes.
  *   - Degenerate buckets (boilerplate shingles shared by millions of docs)
  *     are the skew killer: `maxBucket` drops buckets above a size cap —
  *     the standard guard; dropped buckets are boilerplate, not near-dups.
  *   - Candidate pairs are verified with the real Jaccard before reporting,
  *     so LSH recall/precision tuning never changes correctness of output,
  *     only completeness.
  */
object Dedup {

  /** Distinct word-shingles of size `n` from a whitespace-tokenized text
    * column. Codegen'd single-pass kernel (WordShingles); the equivalent
    * `transform(sequence(...), i -> concat_ws(slice(split(...))))` shape
    * re-runs the regex split per shingle position (no CSE inside lambda
    * bodies) — ~100x slower on real documents.
    */
  def shingles(text: Column, n: Int): Column =
    SketchFunctions.wordShingles(text, n)

  /** MinHash+LSH candidate pairs with verified Jaccard.
    *
    * @param df        (idCol, textCol)
    * @param k         signature length
    * @param bands     LSH bands (k % bands == 0); rows/band = k/bands
    * @param threshold report pairs with exact shingle-Jaccard >= threshold
    * @param maxBucket skew guard: drop LSH buckets larger than this
    * @return (id_a, id_b, jaccard) with id_a < id_b, deterministic
    */
  def minHashLsh(df: DataFrame, idCol: String, textCol: String,
                 k: Int = 32, bands: Int = 8, shingleSize: Int = 3,
                 threshold: Double = 0.5, maxBucket: Int = 64): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    val rowsPerBand = k / bands
    val docs = df.select(
      col(idCol).as("id"),
      shingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", SketchFunctions.minHash(col("sh"), k))
      // materialize once for the two plan branches below; localCheckpoint
      // (not cache) so the blocks are released when this frame is GC'd —
      // an unscoped cache() survives the call and leaks storage across
      // repeated library invocations
      .localCheckpoint()

    // band key: xxhash64 of the band's signature slice. Only (id, band,
    // bucket) flows from here — the shingle arrays stay OUT of the pair
    // machinery and are joined back for verification only.
    val banded = docs.select(col("id"), posexplode(
      transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",",
          slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")

    // ONE shuffle on the bucket key: the window count is the skew cap (no
    // bucket-counts groupBy + semi-join round trip), the cap filter runs
    // BEFORE collect_list (no boilerplate mega-bucket is ever collected),
    // and the groupBy reuses the window's partitioning. Pairs leave each
    // bucket as (a, b) structs via the codegen'd pair_encode kernel (full
    // 64-bit id range); the distinct dedups across bands on a 16-byte key.
    import org.apache.spark.sql.expressions.Window
    val pairs = banded
      .withColumn("bsize", count(lit(1))
        .over(Window.partitionBy("band", "bucket")))
      .filter(col("bsize").between(2, maxBucket))
      .groupBy("band", "bucket")
      .agg(collect_list(col("id")).as("ids"))
      .select(explode(SketchFunctions.pairEncode(col("ids"))).as("pk"))
      .distinct()
      .select(col("pk.a").as("id_a"), col("pk.b").as("id_b"))

    // exact Jaccard verification: shingle sets join back per side (the
    // candidate side is small — AQE broadcasts it; at cluster scale these
    // degrade gracefully to shuffle joins on the id)
    verifyPairs(
      pairs
        .join(docs.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
        .join(docs.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b")),
      threshold)
  }

  /** The shared verify stage of every candidate→verify path: exact
    * shingle-set Jaccard over candidate pairs carrying `sh_a`/`sh_b`,
    * thresholded and rounded to 4dp (the oracle-parity discipline).
    */
  private def verifyPairs(pairs: DataFrame, threshold: Double): DataFrame =
    pairs
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(col("sh_a")) + size(col("sh_b")) - col("inter"))
      .withColumn("jaccard", round(col("inter").cast("double") / col("uni"), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
      .orderBy("id_a", "id_b")

  /** Incremental near-dup detection: newly-landed `batch` docs against the
    * standing `corpus` — the delta-dedup a production pipeline runs per
    * ingest wave instead of re-deduping the whole corpus. Work per wave is
    * O(batch + touched buckets), never O(corpus²): the corpus's banded
    * MinHash signatures are the standing index (in production written once
    * and reused per wave), the batch side is sketched fresh, and the
    * bucket join touches only corpus buckets the batch actually hits.
    * `maxBucket` caps degenerate corpus buckets (boilerplate), as
    * everywhere in this family. Within-batch pairs are `minHashLsh`'s job;
    * this reports only cross (batch, corpus) pairs.
    *
    * @return (batch_id, corpus_id, jaccard) with exact verified Jaccard
    *         >= threshold, deterministic order
    */
  def incrementalNearDup(corpus: DataFrame, batch: DataFrame,
                         idCol: String, textCol: String,
                         k: Int = 32, bands: Int = 8, shingleSize: Int = 3,
                         threshold: Double = 0.5,
                         maxBucket: Int = 64): DataFrame =
    incrementalNearDupIndexed(
      sketchIndex(corpus, idCol, textCol, k, shingleSize),
      batch, idCol, textCol, k, bands, shingleSize, threshold, maxBucket)

  /** The standing dedup index over a corpus: (id, shingle set, MinHash
    * signature), materialized once. Build it once and hand it to
    * `incrementalNearDupIndexed` for every ingest wave — in production
    * this frame is written to storage and reused across waves, not
    * re-sketched per batch.
    */
  def sketchIndex(df: DataFrame, idCol: String, textCol: String,
                  k: Int = 32, shingleSize: Int = 3): DataFrame = df.select(
      col(idCol).as("id"),
      shingles(col(textCol), shingleSize).as("sh"))
    .filter(size(col("sh")) > 0)
    .withColumn("sig", SketchFunctions.minHash(col("sh"), k))
    .localCheckpoint()

  /** Persist a `sketchIndex` as parquet — the write-once corpus index an
    * ingest pipeline builds offline and every delta-dedup server loads at
    * startup (re-sketching 100 TB per server start is the anti-pattern
    * this removes). The layout is the index frame itself:
    * (id, sh: array<string>, sig: array<long>).
    */
  def writeIndex(df: DataFrame, idCol: String, textCol: String, path: String,
                 k: Int = 32, shingleSize: Int = 3): Unit =
    sketchIndex(df, idCol, textCol, k, shingleSize)
      .write.mode("overwrite").parquet(path)

  /** Load a persisted `writeIndex` parquet for `incrementalNearDupIndexed`.
    * No checkpoint needed — the parquet IS the materialization; per-wave
    * consumers scan it with column pruning (the bucket join reads only
    * (id, sig); shingles load only for the verify join).
    */
  def loadIndex(spark: org.apache.spark.sql.SparkSession,
                path: String): DataFrame = spark.read.parquet(path)

  /** `incrementalNearDup` against a prebuilt `sketchIndex` — the per-wave
    * work is O(batch + touched buckets) with ZERO corpus re-sketching.
    */
  def incrementalNearDupIndexed(corpusIdx: DataFrame, batch: DataFrame,
                                idCol: String, textCol: String,
                                k: Int = 32, bands: Int = 8,
                                shingleSize: Int = 3,
                                threshold: Double = 0.5,
                                maxBucket: Int = 64): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    val rowsPerBand = k / bands
    def bandify(docs: DataFrame): DataFrame = docs.select(col("id"), posexplode(
      transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",",
          slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")

    val corpusDocs = corpusIdx
    val batchDocs = sketchIndex(batch, idCol, textCol, k, shingleSize)
    // cap ONLY the corpus side: a boilerplate bucket with a million corpus
    // members would fan every batch hit into a million candidates
    import org.apache.spark.sql.expressions.Window
    val corpusBands = bandify(corpusDocs)
      .withColumn("bsize", count(lit(1))
        .over(Window.partitionBy("band", "bucket")))
      .filter(col("bsize") <= maxBucket)
      .select(col("id").as("corpus_id"), col("band"), col("bucket"))
    val cands = bandify(batchDocs)
      .select(col("id").as("batch_id"), col("band"), col("bucket"))
      .join(corpusBands, Seq("band", "bucket"))
      .select("batch_id", "corpus_id").distinct()

    cands
      .join(batchDocs.select(col("id").as("batch_id"), col("sh").as("sh_a")),
        Seq("batch_id"))
      .join(corpusDocs.select(col("id").as("corpus_id"), col("sh").as("sh_b")),
        Seq("corpus_id"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select("batch_id", "corpus_id", "jaccard")
      .orderBy("batch_id", "corpus_id")
  }

  /** SimHash near-dup candidates: 64-bit fingerprints bucketed by
    * `bands` equal bit-slices (Hamming-LSH); pairs within `maxHamming`
    * reported. Pigeonhole guarantee: any pair with Hamming distance <
    * `bands` shares at least one band, so recall is total for
    * maxHamming <= bands - 1; beyond that it is probabilistic.
    */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, maxBucket: Int = 64,
                   bands: Int = 4): DataFrame = {
    require(64 % bands == 0, "bands must divide 64")
    val bits = 64 / bands
    val mask = if (bits == 64) -1L else (1L << bits) - 1
    // (id, fp) is tiny; checkpointed because three consumers read it (the
    // band explode + the two verify sides below)
    val docs = df.select(col(idCol).as("id"),
      SketchFunctions.simHash(split(trim(col(textCol)), "\\s+")).as("fp"))
      .localCheckpoint()

    val banded = docs.select(col("id"), posexplode(
      array((0 until bands).map(b =>
        shiftrightunsigned(col("fp"), b * bits).bitwiseAND(lit(mask))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")

    // same single-shuffle pair machinery as minHashLsh: window count as
    // the skew cap, capped buckets collected, pair_encode (a, b) pair structs,
    // distinct across bands on the 8-byte key
    import org.apache.spark.sql.expressions.Window
    banded
      .withColumn("bsize", count(lit(1))
        .over(Window.partitionBy("band", "bucket")))
      .filter(col("bsize").between(2, maxBucket))
      .groupBy("band", "bucket")
      .agg(collect_list(col("id")).as("ids"))
      .select(explode(SketchFunctions.pairEncode(col("ids"))).as("pk"))
      .distinct()
      .select(col("pk.a").as("id_a"), col("pk.b").as("id_b"))
      .join(docs.select(col("id").as("id_a"), col("fp").as("fp_a")), Seq("id_a"))
      .join(docs.select(col("id").as("id_b"), col("fp").as("fp_b")), Seq("id_b"))
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
      .orderBy("id_a", "id_b")
  }

  /** SimHash candidate generation + exact shingle-Jaccard verification —
    * the candidate→verify discipline (same contract as minHashLsh, different
    * candidate generator): precision of the output is EXACT regardless of
    * sketch tuning; bands/maxHamming tune only completeness.
    *
    * Parameter coupling to watch: recall is GUARANTEED only for pairs
    * within Hamming bands-1 (pigeonhole), but more bands means FEWER bits
    * per band (64/bands) and so 2^(64/bands) bucket values — past
    * bands=8 the bucket space collapses (bands=32 → 4 values/band) and
    * every bucket blows through `maxBucket` on corpora beyond a few
    * hundred docs, silently zeroing recall. Defaults follow the classic
    * simhash setup (4 bands × 16 bits = 65k buckets/band, maxHamming 3 —
    * the web-scale shape); small/gate corpora can afford bands=8,
    * maxHamming=7 (see the x2 gate entry).
    *
    * @return (id_a, id_b, jaccard) with id_a < id_b, deterministic
    */
  def simHashNearDup(df: DataFrame, idCol: String, textCol: String,
                     shingleSize: Int = 3, threshold: Double = 0.5,
                     maxHamming: Int = 3, maxBucket: Int = 64,
                     bands: Int = 4): DataFrame = {
    val cands = simHashPairs(df, idCol, textCol, maxHamming, maxBucket, bands)
    // materialize the shingle sets once — both verify joins read this frame
    // (localCheckpoint, not cache: blocks release with the frame, see
    // minHashLsh)
    val sh = df.select(col(idCol).as("id"),
      shingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
      .localCheckpoint()
    verifyPairs(
      cands.select("id_a", "id_b")
        .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
        .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b")),
      threshold)
  }

  /** Connected components over a near-dup pair list (the step a training
    * pipeline runs AFTER pair detection: near-dup PAIRS chain into CLUSTERS,
    * and one survivor is kept per cluster). Min-label propagation to a
    * fixpoint: each node adopts the smallest label among itself and its
    * neighbors; converges in graph-diameter iterations — near-dup graphs
    * are shallow (dup clusters are cliques or short chains), so typically
    * 2–4. Each iteration is one join + one agg shuffle; localCheckpoint
    * cuts the growing lineage. If the diameter exceeds `maxIter` (deep
    * chain graphs), the call falls back automatically to the log-round
    * alternating large-star/small-star variant; the contract is unchanged.
    *
    * @return (node, label) — label = min doc id of the node's component
    */
  def clusters(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
               maxIter: Int = 20,
               smallGraphEdges: Long = 2000000L): DataFrame = {
    // symmetrize with ONE evaluation of `pairs` (explode both directions
    // per row) — the union-of-two-selects shape re-executes the whole
    // upstream pair pipeline per branch when the caller hands us an
    // unmaterialized candidate->verify DAG (x15 paid the pair machinery
    // twice; measured 2x at sf0.1)
    val edges = pairs.select(explode(array(
        struct(col(idA).as("a"), col(idB).as("b")),
        struct(col(idB).as("a"), col(idA).as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .distinct().localCheckpoint()
    // small-graph fast path: near-dup PAIR lists are corpus-fraction-sized
    // (each pair already survived LSH + exact verify), so even a 100 TB
    // corpus typically yields an edge list in the millions — a BOUNDED
    // driver structure (like the IVF centroids and prefix-sum offsets, a
    // size-guarded collect, never data-scale). Union-find on the driver
    // replaces 2 jobs/iteration of the propagation loop; above the guard
    // the distributed loop below takes over unchanged.
    val nEdges = edges.count()
    if (nEdges <= smallGraphEdges) return clustersLocal(edges)
    var labels = edges.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val nbrMin = edges.join(labels, edges("b") === labels("node"))
        .select(edges("a").as("node"), col("label"))
        .groupBy("node").agg(min("label").as("nbr"))
      val step = labels.withColumnRenamed("label", "old")
        .join(nbrMin, Seq("node"), "left")
        .select(col("node"), col("old"),
          least(col("old"), coalesce(col("nbr"), col("old"))).as("label"))
        .localCheckpoint()
      converged = step.filter(col("label") =!= col("old")).isEmpty
      labels = step.select("node", "label")
      iter += 1
    }
    // silent non-convergence would split components and leak duplicates
    // into "survivors". Diameter > maxIter (an adversarially deep chain
    // graph) hands off to the log-round alternating large-star/small-star
    // variant, which converges on ANY shape — same (node, label) contract,
    // so the composition removes the operational failure mode instead of
    // throwing.
    if (!converged) clustersAlternating(pairs, idA, idB)
    else labels
  }

  /** Driver union-find over a materialized symmetric edge list — the
    * small-graph arm of `clusters`. Union attaches the numerically larger
    * root under the smaller, so every root IS the min id of its component
    * (the family's label contract) and the final find pass reads labels
    * directly.
    */
  private def clustersLocal(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val es = edges.select(col("a").cast("long"), col("b").cast("long"))
      .as[(Long, Long)].collect()
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x0: Long): Long = {
      var x = x0
      parent.getOrElseUpdate(x, x)
      while (parent(x) != x) {
        parent(x) = parent(parent(x)) // path halving
        x = parent(x)
      }
      x
    }
    es.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra < rb) parent(rb) = ra
      else if (rb < ra) parent(ra) = rb
    }
    val labels = parent.keys.toSeq.map(n => (n, find(n)))
    spark.createDataset(labels).toDF("node", "label")
  }

  /** Connected components via alternating large-star/small-star (Kiveris
    * et al., "Connected Components in MapReduce and Beyond") — the
    * deep-graph alternative to `clusters`: converges in O(log n) rounds on
    * ANY graph shape, where min-label propagation needs graph-diameter
    * rounds (a 10k-node chain would need 10k joins). Same contract as
    * `clusters`: (node, label) with label = min id of the component.
    *
    * Per round, two star operations, each ONE groupBy-min + ONE join:
    *   large-star: every neighbor v > u re-points to m(u) = min(Γ(u)∪{u})
    *   small-star: every neighbor v <= u (larger-end-directed edges)
    *               re-points to m(u)
    * Fixpoint = the edge set stabilizes into (root, member) stars.
    */
  def clustersAlternating(pairs: DataFrame, idA: String = "id_a",
                          idB: String = "id_b", maxIter: Int = 25): DataFrame = {
    def canon(e: DataFrame): DataFrame = e
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()

    var edges = canon(pairs.select(col(idA).as("a"), col(idB).as("b")))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // large-star over the symmetrized edges
      val sym = edges.union(edges.select(col("b").as("a"), col("a").as("b")))
      val mL = sym.groupBy("a").agg(least(min(col("b")), col("a")).as("m"))
      val afterLarge = canon(
        sym.join(mL, "a").filter(col("b") > col("a"))
          .select(col("b").as("a"), col("m").as("b")))
      // small-star over larger-end-directed edges (u > v)
      val dir = afterLarge.select(col("b").as("u"), col("a").as("v")) // b > a
      val mS = dir.groupBy("u").agg(least(min(col("v")), col("u")).as("m"))
      val joined = dir.join(mS, "u")
      val afterSmall = canon(
        joined.select(col("v").as("a"), col("m").as("b"))
          .union(joined.select(col("u").as("a"), col("m").as("b"))))
        .localCheckpoint()
      converged = afterSmall.count() == edges.count() &&
        afterSmall.except(edges).isEmpty
      edges = afterSmall
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"clustersAlternating() did not converge in $maxIter rounds")
    // stars: every member points at its root; roots label themselves
    val sym = edges.union(edges.select(col("b").as("a"), col("a").as("b")))
    sym.groupBy(col("a").as("node"))
      .agg(least(min(col("b")), col("node")).as("label"))
  }

  /** Keep one representative per near-dup cluster: drop every row whose id
    * is a non-minimal member of a component (rows in no pair survive).
    */
  def dedupSurvivors(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val dupes = clusters(pairs)
      .filter(col("label") =!= col("node")).select(col("node"))
    df.join(dupes, df(idCol) === dupes("node"), "left_anti")
  }

  /** Sorted-neighborhood near-dup detection: sort each block by a cheap
    * similarity-correlated key (token count, then text prefix) and compare
    * every doc only with its next `window` neighbors in that order — the
    * classic SNM blocking strategy, and the one dedup-family member with
    * NO shingle explode in the candidate stage at all. Candidates carry
    * only ids through the window (never shingle arrays); exact
    * shingle-Jaccard verification joins the sets back, so precision is
    * exact and the (block, key, window) choice tunes only completeness.
    *
    * Scale shape: one window shuffle on the block key + the shared verify
    * joins. Blocks bound the sort (no global single-partition window);
    * production pipelines run multiple passes with different keys
    * (length, prefix, reversed prefix) to recover cross-block recall.
    *
    * @param blockCol partition key for the neighborhood sort (e.g. lang)
    * @param window   neighbors ahead to compare against
    * @return (id_a, id_b, jaccard) with id_a < id_b, deterministic
    */
  def sortedNeighborhood(df: DataFrame, idCol: String, textCol: String,
                         blockCol: String, window: Int = 3,
                         shingleSize: Int = 3,
                         threshold: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("blk").orderBy("ntok", "pfx", "id")
    // window exprs must be top-level projections (not inside a generator):
    // lead the ids out first, explode the neighbor array in a second select
    val led = df.select(col(idCol).as("id"), col(blockCol).as("blk"),
        graft.functions.SketchFunctions.tokenCount(col(textCol)).as("ntok"),
        substring(col(textCol), 1, 32).as("pfx"))
      .select(col("id") +:
        (1 to window).map(i => lead(col("id"), i).over(w).as(s"nb$i")): _*)
    val cands = led
      .select(col("id"), explode(
        array((1 to window).map(i => col(s"nb$i")): _*)).as("nb"))
      .filter(col("nb").isNotNull)
      .select(least(col("id"), col("nb")).as("id_a"),
        greatest(col("id"), col("nb")).as("id_b"))
      .distinct()
    // shared verify stage: shingle sets materialized once for both sides
    val sh = df.select(col(idCol).as("id"),
        shingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
      .localCheckpoint()
    verifyPairs(
      cands
        .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
        .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b")),
      threshold)
  }

  /** Containment pairs (|A∩B| / |A| per direction): the asymmetric
    * companion to `ngramJaccard` for EXCERPT/SUBSET detection — a short
    * doc quoted inside a long one has low Jaccard (the union is large)
    * but containment ≈ 1 on the short side, which is exactly the case
    * length-normalized dedup misses. Same PPJoin posting machinery (df
    * window as boilerplate cap, struct-pair counting, sizes joined after
    * the pair shuffle); reports pairs where EITHER direction reaches
    * `threshold`.
    *
    * @return (id_a, id_b, cont_a, cont_b) with id_a < id_b — cont_a =
    *         share of a's shingles inside b, cont_b the reverse
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       shingleSize: Int = 3, threshold: Double = 0.8,
                       maxDf: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withDf = df.select(col(idCol).as("id"),
        shingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("id"), explode(col("sh")).as("shingle"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("shingle")))
      .localCheckpoint()
    val nKept = withDf.filter(col("df") <= maxDf)
      .groupBy("id").agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val pairs = withDf.filter(col("df").between(2, maxDf))
      .groupBy("shingle").agg(collect_list(col("id")).as("ids"))
      .select(explode(
        graft.functions.SketchFunctions.pairEncode(col("ids"))).as("pk"))
      .groupBy("pk").agg(count(lit(1)).as("inter"))
      .select(col("pk.a").as("id_a"), col("pk.b").as("id_b"), col("inter"))
    pairs
      .join(nKept.select(col("id").as("id_a"), col("n").as("n_a")), Seq("id_a"))
      .join(nKept.select(col("id").as("id_b"), col("n").as("n_b")), Seq("id_b"))
      .withColumn("cont_a",
        round(col("inter").cast("double") / col("n_a"), 4))
      .withColumn("cont_b",
        round(col("inter").cast("double") / col("n_b"), 4))
      .filter(col("cont_a") >= threshold || col("cont_b") >= threshold)
      .select("id_a", "id_b", "cont_a", "cont_b")
      .orderBy("id_a", "id_b")
  }

  /** Exact n-gram Jaccard via inverted index: explode shingles, keep those
    * appearing in <= `maxDf` docs, self-join on the shareable (df >= 2)
    * ones, and compute the intersection by COUNTING shared postings per
    * pair (map-side-combinable group-by — no array payloads ever cross the
    * shuffle, the set-similarity-join shape from the PPJoin family).
    * Semantics: EXACT Jaccard over each doc's df<=maxDf shingle set —
    * numerator and denominator consistently exclude only boilerplate
    * (df>maxDf) shingles, so with no boilerplate present this IS true
    * Jaccard. df=1 shingles can't be shared but DO count in the union
    * (they're real content); the pair join only runs over df in [2,maxDf].
    */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
                   shingleSize: Int = 3, threshold: Double = 0.5,
                   maxDf: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // `count over (partition by shingle)` annotates every posting with its
    // df in place — no df-counts groupBy and no semi-joins back onto the
    // posting list (the old shape's two extra exchanges). Materialized once
    // (localCheckpoint, GC-scoped) for its two consumers (per-doc sizes,
    // pair stage); the checkpoint surfaces as UnknownPartitioning, so the
    // pair groupBy below re-shuffles — the price of computing the window
    // once instead of once per consumer (kernel + window are the bigger
    // cost; measured 0.7 s vs 2×0.7 s at sf0.1).
    val withDf = df.select(col(idCol).as("id"),
        shingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("id"), explode(col("sh")).as("shingle"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("shingle")))
      .localCheckpoint()
    // union side: every non-boilerplate shingle (df <= maxDf, incl. df=1).
    // Checkpointed: it feeds TWO joins below (id_a and id_b sides), which
    // would otherwise each re-scan the posting checkpoint and re-run this
    // aggregation (no exchange reuse across differently-built joins).
    // One narrow row per doc — tiny relative to the posting list.
    val nKept = withDf.filter(col("df") <= maxDf)
      .groupBy("id").agg(count(lit(1)).as("n"))
      .localCheckpoint()
    // pair side: shareable shingles (df in [2, maxDf]) — bucket the <=maxDf
    // posting ids per shingle and emit each unordered pair as ONE (a, b)
    // struct via the codegen'd pair_encode kernel, instead of a shingle
    // self-join (which sorts/shuffles the posting list twice and generates
    // the d^2 cross product before the id_a < id_b filter). The df filter
    // runs BEFORE collect_list, so no boilerplate mega-bucket is ever
    // collected into an array (that's also why df comes from a window
    // count, which is sort-based and spillable, not from collecting).
    val pairs = withDf.filter(col("df").between(2, maxDf))
      .groupBy("shingle").agg(collect_list(col("id")).as("ids"))
      .select(explode(
        graft.functions.SketchFunctions.pairEncode(col("ids"))).as("pk"))
      .groupBy("pk").agg(count(lit(1)).as("inter"))
      .select(col("pk.a").as("id_a"), col("pk.b").as("id_b"), col("inter"))
    // n_a/n_b joined AFTER pair counting so the pair shuffle carries only
    // (id_a, id_b): nKept is one row per doc — AQE broadcasts it at bench
    // scale; at cluster scale these are plain shuffle joins on the id
    pairs
      .join(nKept.select(col("id").as("id_a"), col("n").as("n_a")), Seq("id_a"))
      .join(nKept.select(col("id").as("id_b"), col("n").as("n_b")), Seq("id_b"))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("n_a") + col("n_b") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
      .orderBy("id_a", "id_b")
  }

  /** TF-IDF-weighted cosine pairs over the shingle vocabulary — the
    * weighted companion to `ngramJaccard`: a shared RARE shingle counts
    * for more than a shared common one (idf = ln(N/df)), so topical
    * near-dups separate from coincidental overlap better than with set
    * Jaccard. Same single-pass posting machinery: because shingle sets
    * are DISTINCT per doc, both endpoints of a shared posting carry the
    * SAME weight idf(shingle), so each pair contribution is idf² and the
    * pair stage is one weighted sum over (a, b) pair-struct keys — the pair
    * shuffle never carries vectors, only (pair_struct, partial_dot).
    * Norms are over the df<=maxDf vocabulary (boilerplate shingles are
    * excluded from the geometry, same contract as ngramJaccard).
    */
  def tfidfCosinePairs(df: DataFrame, idCol: String, textCol: String,
                       shingleSize: Int = 3, threshold: Double = 0.2,
                       maxDf: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // corpus size for idf — one scalar, the same bounded-driver-value
    // pattern as the IVF centroid fetch
    val nDocs = df.count().toDouble
    val withDf = df.select(col(idCol).as("id"),
        shingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("id"), explode(col("sh")).as("shingle"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("shingle")))
      .withColumn("w", log(lit(nDocs) / col("df")))
      .localCheckpoint()
    val nrm = withDf.filter(col("df") <= maxDf)
      .groupBy("id").agg(sqrt(sum(col("w") * col("w"))).as("nm"))
      .localCheckpoint()
    val pairs = withDf.filter(col("df").between(2, maxDf))
      .groupBy("shingle", "w").agg(collect_list(col("id")).as("ids"))
      .select(col("w"), explode(
        graft.functions.SketchFunctions.pairEncode(col("ids"))).as("pk"))
      .groupBy("pk").agg(sum(col("w") * col("w")).as("dp"))
      .select(col("pk.a").as("id_a"), col("pk.b").as("id_b"), col("dp"))
    pairs
      .join(nrm.select(col("id").as("id_a"), col("nm").as("n_a")), Seq("id_a"))
      .join(nrm.select(col("id").as("id_b"), col("nm").as("n_b")), Seq("id_b"))
      .withColumn("sim", round(col("dp") / (col("n_a") * col("n_b")), 4))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
      .orderBy("id_a", "id_b")
  }
}
