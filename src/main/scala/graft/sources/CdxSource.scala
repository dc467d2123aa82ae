package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CDX(J) crawl-index handling — the THIRD Common Crawl artifact next
  * to WARC (x100) and WET (x117): each crawl ships `cdx-*.gz` shards
  * whose lines are `SURT timestamp JSON` and whose (filename, offset,
  * length) triple points at ONE gzip member inside a `.warc.gz` — the
  * index that turns a 100 TB archive set into a random-access store.
  * Two pieces implemented:
  *
  *  - SURT canonicalization ([[surt]]): scheme dropped, host lowercased
  *    and comma-reversed, default ports dropped, `)/` separator, path
  *    kept verbatim — the sort key that groups one site's captures
  *    together (and the canonical key URL-dedup families join on).
  *  - CDXJ line grammar ([[parseCdxLine]]): space-separated SURT +
  *    14-digit timestamp + a flat JSON object (own minimal flat
  *    string-map reader — quoted keys/values, backslash escapes; CDX
  *    JSON blobs are machine-written flat maps, so nesting rejects
  *    loudly by name).
  *
  * [[fetchRecord]] is the payoff: seek `offset`, read `length` bytes,
  * inflate the single gzip member (CRC32 + ISIZE verified like every
  * other member this repo touches), parse the one WARC record — the
  * whole archive is never read. The x119 gate proves the pointer
  * arithmetic end to end: every fixture CDX entry is fetched by
  * offset/length from the real archive bytes and the extracted text
  * must equal what the full x101 walk would have produced; a one-byte
  * offset slip lands inside a different member and fails the hash.
  *
  * 100 TB shape: CDX shards are a few GB per crawl — one task per
  * shard, narrow line parse; fetches are one seek + one member read
  * each (O(record) memory), so selective refetch (recrawl candidates,
  * revisit resolution, per-URL audits) costs proportional to the rows
  * FETCHED, not the archives scanned.
  */
object CdxSource {

  private[graft] case class CdxEntry(surtKey: String, timestamp: String,
      url: String, mime: String, status: Int, digest: String,
      length: Long, offset: Long, filename: String)

  /** SURT (Sort-friendly URI Reordering Transform) of an http(s) URL:
    * `http://www.Example.org:80/A/b?q=1` → `org,example,www)/A/b?q=1`.
    * Scheme, userinfo, and the SCHEME'S default port drop (http:80 /
    * https:443 only — :443 on plain http is a different service and
    * must NOT collide); host lowercases and label-reverses; the
    * path/query stay verbatim after normalizing the empty path to `/`
    * — including before a query, so `host?q` and `host/?q` land one
    * key (case maps to different resources on most servers — only the
    * AUTHORITY is case-insensitive per RFC 3986). Non-http(s) schemes
    * reject by name.
    */
  private[graft] def surt(url: String): String = {
    val m = "(?i)^(https?)://([^/?#]+)([^#]*)".r
    // fragments never reach the server — strip before matching (a full-
    // string regex would otherwise fail on '#' and mislabel a perfectly
    // good https URL as "non-http(s)", ADVICE r17)
    val noFrag = url.indexOf('#') match {
      case -1 => url
      case h => url.substring(0, h)
    }
    noFrag match {
      case m(scheme, auth0, rest) =>
        // userinfo carries no identity for dedup keys and would
        // otherwise reverse as part of the host
        val auth = auth0.substring(auth0.indexOf('@') + 1)
        val hostPort = auth.toLowerCase(java.util.Locale.ROOT)
        val (host, port) = hostPort.lastIndexOf(':') match {
          case -1 => (hostPort, "")
          case i if hostPort.substring(i + 1).forall(_.isDigit) =>
            (hostPort.substring(0, i), hostPort.substring(i + 1))
          case _ => (hostPort, "")
        }
        val defaultPort =
          if (scheme.toLowerCase == "http") "80" else "443"
        val keepPort = port.nonEmpty && port != defaultPort
        val rev = host.split('.').reverse.mkString(",")
        val path =
          if (rest.isEmpty) "/"
          else if (rest.startsWith("?")) "/" + rest
          else rest
        rev + (if (keepPort) ":" + port else "") + ")" + path
      case _ => sys.error(s"cdx: non-http(s) url '$url'")
    }
  }

  /** Minimal flat JSON string-map reader for CDX blobs: `{"k": "v",
    * ...}`, values all strings (CDX writes numbers as strings),
    * backslash escapes for `\" \\ \/ \n \t \r`. Anything nested or
    * non-string rejects by name — CDX JSON is machine-written and
    * flat; guessing at arbitrary JSON here would hide damage.
    */
  private[graft] def parseFlatJson(s: String): Map[String, String] = {
    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    var i = 0
    val n = s.length
    def ws(): Unit = { while (i < n && s.charAt(i).isWhitespace) i += 1 }
    def expect(c: Char): Unit = {
      ws()
      require(i < n && s.charAt(i) == c, s"cdx: expected '$c' at $i in json")
      i += 1
    }
    def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (i < n && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          require(i + 1 < n, "cdx: truncated escape in json")
          i += 1
          sb.append(s.charAt(i) match {
            case '"' => '"'
            case '\\' => '\\'
            case '/' => '/'
            case 'n' => '\n'
            case 't' => '\t'
            case 'r' => '\r'
            case 'b' => '\b'
            case 'f' => '\f'
            case 'u' =>
              // real CDXJ routinely escapes non-ASCII url bytes
              require(i + 4 < n, "cdx: truncated \\u escape in json")
              val hex = s.substring(i + 1, i + 5)
              // explicit ASCII hex — Character.digit also accepts
              // Unicode digit chars (the WatSource.Jsons strictness)
              require(hex.forall(ch => (ch >= '0' && ch <= '9') ||
                (ch >= 'a' && ch <= 'f') || (ch >= 'A' && ch <= 'F')),
                s"cdx: bad \\u escape '$hex'")
              i += 4
              Integer.parseInt(hex, 16).toChar
            case other => sys.error(s"cdx: unsupported escape '\\$other'")
          })
        } else sb.append(c)
        i += 1
      }
      require(i < n, "cdx: unterminated json string")
      i += 1
      sb.toString
    }
    expect('{')
    ws()
    if (i < n && s.charAt(i) == '}') { i += 1; return out.toMap }
    var more = true
    while (more) {
      val k = str()
      expect(':')
      ws()
      require(i < n && s.charAt(i) == '"',
        s"cdx: non-string value for '$k' (flat string maps only)")
      out(k) = str()
      ws()
      if (i < n && s.charAt(i) == ',') { i += 1; more = true }
      else { expect('}'); more = false }
    }
    require({ ws(); i == n }, "cdx: bytes after json object")
    out.toMap
  }

  /** 14-digit CDX timestamp from a WARC-Date (ISO 8601, optional
    * fractional seconds truncated): `2026-01-05T00:00:00Z` →
    * `20260105000000`. Anything else rejects by name — WARC-Date is
    * mandatory and machine-written, a missing/odd one is damage.
    */
  private[graft] def cdxTimestamp(warcDate: String): String = {
    val m = ("(\\d{4})-(\\d{2})-(\\d{2})T" +
      "(\\d{2}):(\\d{2}):(\\d{2})(?:\\.\\d+)?Z").r
    warcDate match {
      case m(y, mo, d, h, mi, s) => y + mo + d + h + mi + s
      case _ => sys.error(s"cdx: bad WARC-Date '$warcDate'")
    }
  }

  private def jsonEsc(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < 0x20 =>
        sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** The CDX entry of one response record at its measured archive
    * boundary — ONE derivation shared by the production generator
    * ([[generateCdx]]) and the fixture writer ([[cdxOf]]), so the two
    * cannot drift in format. Timestamp derives from the record's
    * WARC-Date, the way real indexers write it.
    */
  private[graft] def entryOf(r: WarcSource.WarcRecord, off: Long, len: Long,
                             fname: String): CdxEntry =
    CdxEntry(surt(r.targetUri), cdxTimestamp(r.warcDate), r.targetUri,
      r.httpContentType.takeWhile(_ != ';'), r.httpStatus,
      r.payloadDigest, len, off, fname)

  private[graft] def renderLine(e: CdxEntry): String =
    e.surtKey + " " + e.timestamp + " " +
      "{\"url\": \"" + jsonEsc(e.url) + "\", " +
      "\"mime\": \"" + jsonEsc(e.mime) + "\", " +
      "\"status\": \"" + e.status + "\", " +
      "\"digest\": \"" + jsonEsc(e.digest) + "\", " +
      "\"length\": \"" + e.length + "\", " +
      "\"offset\": \"" + e.offset + "\", " +
      "\"filename\": \"" + jsonEsc(e.filename) + "\"}"

  /** INDEX GENERATION (x122) — the producing side of [[fetchRecord]]:
    * walk a `.warc(.gz)` stream record-at-a-time on [[WarcSource.
    * WarcIterator]]'s measured boundaries and emit one [[CdxEntry]] per
    * response record, pointer = the record's whole gzip member (plain:
    * the record slice). A response SHARING its member rejects by name —
    * an offset inside a shared member is unfetchable member-at-a-time,
    * and real crawl writers (wget, Common Crawl) are record-per-member.
    * O(record) memory: the iterator never buffers the archive.
    */
  private[graft] def generateCdx(in: java.io.InputStream, filename: String,
                                 lenientHttp: Boolean = true)
      : Iterator[CdxEntry] = {
    val it = new WarcSource.WarcIterator(in, lenientHttp)
    it.flatMap { r =>
      if (r.warcType != "response") None
      else {
        require(it.lastSoloMember,
          s"cdx-gen: response record shares a gzip member in '$filename'" +
            " (record-per-member required for indexing)")
        Some(entryOf(r, it.lastOffset, it.lastLength, filename))
      }
    }
  }

  /** One CDXJ line: `SURT 14-digit-timestamp {json}`. */
  private[graft] def parseCdxLine(line: String): CdxEntry = {
    val sp1 = line.indexOf(' ')
    require(sp1 > 0, s"cdx: malformed line '$line'")
    val sp2 = line.indexOf(' ', sp1 + 1)
    require(sp2 > sp1, s"cdx: malformed line '$line'")
    val ts = line.substring(sp1 + 1, sp2)
    require(ts.length == 14 && ts.forall(_.isDigit),
      s"cdx: bad timestamp '$ts'")
    val j = parseFlatJson(line.substring(sp2 + 1))
    def need(k: String): String =
      j.getOrElse(k, sys.error(s"cdx: missing '$k' in '$line'"))
    CdxEntry(line.substring(0, sp1), ts, need("url"),
      j.getOrElse("mime", ""), need("status").toInt,
      j.getOrElse("digest", ""), need("length").toLong,
      need("offset").toLong, need("filename"))
  }

  /** Fetch ONE record by its CDX pointer: seek `offset`, read exactly
    * `length` bytes, inflate the single gzip member (CRC32 + ISIZE
    * verified), parse the one WARC record. For an UNCOMPRESSED archive
    * (plain `.warc` — the fixture's odd-id arm) the slice IS the
    * record. EXACT consumption is enforced both ways: a pointer whose
    * length spans past its member/record is index damage and fails by
    * name instead of silently succeeding on the prefix (r17 review).
    * O(record) memory; the archive is never walked.
    */
  private[graft] def fetchRecord(archive: ZipSource.Seekable,
                                 offset: Long, length: Long,
                                 lenientHttp: Boolean = false)
      : WarcSource.WarcRecord = {
    require(offset >= 0 && length > 0 && offset <= archive.size &&
      length <= archive.size - offset, "cdx: pointer out of bounds")
    require(length <= Int.MaxValue - 16, "cdx: record exceeds 2 GiB")
    val raw = archive.readAt(offset, length.toInt)
    val isGzip = raw.length >= 2 && (raw(0) & 0xff) == 0x1f &&
      (raw(1) & 0xff) == 0x8b
    val msg = "cdx: pointer does not cover one record"
    if (isGzip) {
      val outer = ByteFeed.wrap(raw)
      val member = Gzip.memberBytes(outer)
      require(outer.atEof, "cdx: pointer spans past its gzip member")
      val feed = ByteFeed.wrap(member)
      val r = WarcSource.readRecord(feed, msg, lenientHttp)
      require(feed.atEof, "cdx: member holds more than one record")
      r
    } else {
      val feed = ByteFeed.wrap(raw)
      val r = WarcSource.readRecord(feed, msg, lenientHttp)
      require(feed.atEof, "cdx: pointer spans past its record")
      r
    }
  }

  // ------------------------------------------------------------- fixture

  /** Build the REAL CDX index of one fixture archive by walking its
    * bytes member-by-member (offsets/lengths are measured, not
    * arithmetic — that is the point: the gate then FETCHES through
    * them). Response records only, like Common Crawl's indexes.
    */
  // The cdxOf sibling of WarcSource's warcOf memo (r18 judge item 4):
  // the measured-boundary index walk of one fixture archive is shared
  // by x119/x122/x124/x125 — derive it once per (id, text) per JVM.
  private val cdxOfMemo =
    new java.util.concurrent.ConcurrentHashMap[(Long, String), String]()
  private val cdxOfMemoBytes = new java.util.concurrent.atomic.AtomicLong(0)
  private val CdxOfMemoBudget = 64L << 20

  private[graft] def cdxOf(id: Long, text: String): String = {
    val k = (id, text)
    val cached = cdxOfMemo.get(k)
    if (cached != null) return cached
    val out = computeCdxOf(id, text)
    val cost = 2L * (out.length + text.length) + 64
    if (cdxOfMemoBytes.addAndGet(cost) > CdxOfMemoBudget) {
      // locked flush, same reasoning as WarcSource.warcOf (r19 advice):
      // concurrent crossers with the lock-free clear()+set(cost) could
      // leave entries uncounted and drift past the O(budget) invariant
      cdxOfMemo.synchronized {
        if (cdxOfMemoBytes.get() > CdxOfMemoBudget) {
          cdxOfMemo.clear()
          cdxOfMemoBytes.set(0L)
        }
      }
      cdxOfMemoBytes.addAndGet(cost)
    }
    cdxOfMemo.putIfAbsent(k, out)
    out
  }

  private def computeCdxOf(id: Long, text: String): String = {
    val bytes = WarcSource.warcOf(id, text)
    val fname = s"d$id.warc" + (if (id % 2 == 0) ".gz" else "")
    val entries = scala.collection.mutable.ArrayBuffer[String]()
    def line(r: WarcSource.WarcRecord, off: Long, len: Long): Unit =
      if (r.warcType == "response")
        entries += renderLine(entryOf(r, off, len, fname))
    if (id % 2 == 0) { // gzip: member per record, measured boundaries
      val feed = new ByteFeed(new java.io.ByteArrayInputStream(bytes))
      var off = 0L
      while (!feed.atEof) {
        val member = Gzip.memberBytes(feed)
        val end = feed.consumedBytes
        line(WarcSource.parseRecords(member).head, off, end - off)
        off = end
      }
    } else { // plain: record boundaries via a counting walk
      val feed = ByteFeed.wrap(bytes)
      var off = 0L
      while (!feed.atEof) {
        val r = WarcSource.readRecord(feed, "cdx: truncated fixture",
          lenientHttp = false)
        val end = feed.consumedBytes
        line(r, off, end - off)
        off = end
      }
    }
    entries.mkString("\n") + "\n"
  }

  /** x119 gate: parse each doc's CDX index, fetch EVERY entry from the
    * archive bytes by offset/length, and emit what the fetch decoded —
    * surt/status re-derived by DuckDB from doc_id arithmetic, extracted
    * text equal to the x101 derivation. The offsets themselves never
    * appear in the output; they are proven by WHAT the fetch lands on.
    */
  def cdxTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      // fan the per-row archive kernel across every core (r21): the
      // documents scan packs into ~4 splits, which serialized these
      // CPU-heavy walks on 4 of 32 cores (measured on x122: 4 tasks,
      // wall 2.3 s for 2.1 s of task time). Same scale-adaptive
      // round-robin the synthesize* fixture sources apply.
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val archive = new ZipSource.BytesSeekable(WarcSource.warcOf(id, text))
        cdxOf(id, text).split("\n").filter(_.nonEmpty).zipWithIndex
          .map { case (ln, j) =>
            val e = parseCdxLine(ln)
            val r = fetchRecord(archive, e.offset, e.length)
            require(r.targetUri == e.url,
              s"cdx: pointer landed on '${r.targetUri}', index says '${e.url}'")
            require(r.payloadDigest == e.digest,
              s"cdx: digest mismatch at '${e.url}'")
            (id, j, e.surtKey, e.mime, e.status, e.digest,
              WarcSource.htmlText(r.body))
          }
      }
      .toDF("doc_id", "j", "surt", "mime", "status", "digest",
        "fetched_text")
  }

  /** x122 gate: GENERATE the index of each doc's archive on the
    * streaming production path ([[generateCdx]]), require it line-for-
    * line equal to the fixture index (two INDEPENDENT measured walks:
    * the iterator's boundary tracking vs [[cdxOf]]'s member/record
    * counting — a drift in either fails here), then FETCH every
    * generated pointer back out of the archive bytes and emit the
    * entry facts. DuckDB re-derives surt/ts/url/status/digest from
    * doc_id arithmetic; the measured offsets are proven by what the
    * fetch lands on (url + digest requires), never printed.
    */
  def cdxGenTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      // fan the per-row archive kernel across every core (r21): the
      // documents scan packs into ~4 splits, which serialized these
      // CPU-heavy walks on 4 of 32 cores (measured on x122: 4 tasks,
      // wall 2.3 s for 2.1 s of task time). Same scale-adaptive
      // round-robin the synthesize* fixture sources apply.
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val bytes = WarcSource.warcOf(id, text)
        val fname = s"d$id.warc" + (if (id % 2 == 0) ".gz" else "")
        val gen = generateCdx(new java.io.ByteArrayInputStream(bytes),
          fname, lenientHttp = false).toSeq
        val fixture = cdxOf(id, text).split("\n").filter(_.nonEmpty).toSeq
        require(gen.map(renderLine) == fixture,
          s"cdx-gen: generated index of doc $id diverges from the fixture walk")
        val archive = new ZipSource.BytesSeekable(bytes)
        gen.zipWithIndex.map { case (e, j) =>
          val r = fetchRecord(archive, e.offset, e.length)
          require(r.targetUri == e.url && r.payloadDigest == e.digest,
            s"cdx-gen: pointer $j of doc $id landed on '${r.targetUri}'")
          (id, j, e.surtKey, e.timestamp, e.url, e.mime, e.status, e.digest)
        }
      }
      .toDF("doc_id", "j", "surt", "ts", "url", "mime", "status", "digest")
  }

  /** File-path arm of index GENERATION: one task per `.warc(.gz)`
    * under a glob, streaming record-at-a-time ([[generateCdx]] on the
    * iterator — O(record) memory), one row per response record. Sort
    * by (surt, timestamp) before writing shards to get the globally-
    * SURT-ordered form real CDX consumers binary-search — that sort is
    * the single exchange of pointer-sized rows; archive bytes never
    * shuffle. Damage handling mirrors the other container arms:
    * lenient poisons the rest of the FILE as one countable row.
    */
  def warcIndexFiles(spark: SparkSession, glob: String,
                     lenient: Boolean = true,
                     relativeTo: String = null): DataFrame = {
    import spark.implicits._
    // `relativeTo`: keep the archive path RELATIVE to this base
    // instead of the bare basename — wave-nested layouts (the
    // streaming export's `wave=<id>/part-*.warc.gz`) repeat basenames
    // across waves, and an index of bare names could neither
    // distinguish them nor drive fetchByIndex against the base dir
    val baseUri =
      if (relativeTo == null) null
      else {
        // qualify through the FileSystem first: a RELATIVE base (the
        // common CLI habit) would otherwise never prefix-match the
        // absolute URIs binaryFiles resolves, erroring every file as
        // "outside base" (r19 review)
        val p0 = new org.apache.hadoop.fs.Path(relativeTo)
        val fs = p0.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // normalize dot segments too — a "../x" base must still
        // prefix-match the fully resolved file URIs
        val p = java.nio.file.Paths.get(
          fs.makeQualified(p0).toUri.getPath).normalize().toString
        if (p.endsWith("/")) p else p + "/"
      }
    spark.sparkContext.binaryFiles(glob)
      .flatMap { case (path, pds) =>
        val fname =
          if (baseUri == null) path.substring(path.lastIndexOf('/') + 1)
          else {
            val p = new org.apache.hadoop.fs.Path(path).toUri.getPath
            require(p.startsWith(baseUri),
              s"warc-index: '$p' is outside base '$baseUri'")
            p.substring(baseUri.length)
          }
        val base = StreamUtil.deferred {
          val in = pds.open()
          StreamUtil.closeOnExhaust(in,
            generateCdx(in, fname, lenientHttp = lenient).map { e =>
              (e.surtKey, e.timestamp, e.url, e.mime, e.status, e.digest,
                e.length, e.offset, e.filename)
            })
        }
        if (!lenient) base
        else StreamUtil.poisonOnError(base,
          (null, null, null, null, -1, null, -1L, -1L, fname))
      }
      .toDF("surt", "timestamp", "url", "mime", "status", "digest",
        "length", "offset", "filename")
  }

  // ------------------------------------------------------------- zipnum

  /** ZIPNUM CLUSTER (x124) — the SECONDARY index layer real CDX
    * deployments ship (Common Crawl's `cluster.idx`): the sorted CDX
    * lines pack into gzip members of `blockSize` lines each, and a
    * small plain-text cluster index records one line per block —
    * `firstKey \t offset \t length` — so a point lookup is a binary
    * search of the (memory-resident, thousands-of-lines) cluster index
    * plus ONE member inflate, never a scan of the multi-GB shard.
    * Returns (packed block bytes, cluster-index lines).
    */
  /** One packed zipnum block: (gzip member bytes, cluster key) — the
    * SINGLE framing implementation behind both the in-memory build
    * ([[zipnumOf]]) and the file arm ([[writeZipnumFiles]]), so the
    * gate and the production files cannot drift (r18 review). The
    * cluster key is the block's first (surt, timestamp) pair — the
    * sort key, never the json tail.
    */
  private def packBlock(block: Seq[String]): (Array[Byte], String) = {
    val data = (block.mkString("\n") + "\n").getBytes("UTF-8")
    (WarcSource.gzipOne(data), sortKeyOf(block.head))
  }

  /** The (surt, timestamp) sort-key prefix of one CDX line. */
  private def sortKeyOf(line: String): String = {
    val sp2 = line.indexOf(' ', line.indexOf(' ') + 1)
    require(sp2 > 0, s"zipnum: malformed cdx line '$line'")
    line.substring(0, sp2)
  }

  private[graft] def zipnumOf(sorted: Seq[String], blockSize: Int)
      : (Array[Byte], Seq[String]) = {
    require(blockSize > 0, "zipnum: block size must be positive")
    val out = new java.io.ByteArrayOutputStream()
    val idx = scala.collection.mutable.ArrayBuffer[String]()
    sorted.grouped(blockSize).foreach { block =>
      val off = out.size().toLong
      val (member, key) = packBlock(block)
      out.write(member)
      idx += key + "\t" + off + "\t" + member.length
    }
    (out.toByteArray, idx.toSeq)
  }

  /** Point lookup by SURT key: binary-search the cluster index for the
    * last block whose first key is <= the probe (keys equal at a block
    * boundary can spill into later blocks, so the scan continues while
    * the NEXT block's first key still matches), inflate just those
    * members, and return the matching entries. O(log blocks) index
    * probes + O(1) member inflates; the shard bytes are never walked.
    */
  private[graft] def zipnumLookup(blocks: ZipSource.Seekable,
                                  clusterIdx: IndexedSeq[String],
                                  surtKey: String): Seq[CdxEntry] = {
    if (clusterIdx.isEmpty) return Seq.empty
    // lookups match on the SURT field alone (the key's first token)
    def keyOf(line: String): String = {
      val sp = line.indexOf(' ')
      require(sp > 0, s"zipnum: malformed cluster line '$line'")
      line.substring(0, sp)
    }
    // binary search: last block whose first key is STRICTLY below the
    // probe — a run of equal keys can spill across block boundaries, so
    // starting at the last <=-block would skip the run's head when a
    // later block opens with the probe key itself
    var lo = 0
    var hi = clusterIdx.size - 1
    var at = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (keyOf(clusterIdx(mid)) < surtKey) { at = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    if (at < 0) at = 0 // probe at/below the first block's key
    val found = scala.collection.mutable.ArrayBuffer[CdxEntry]()
    var b = at
    var continue = true
    while (continue && b < clusterIdx.size) {
      val parts = clusterIdx(b).split("\t")
      require(parts.length == 3, s"zipnum: malformed cluster line")
      val member = blocks.readAt(parts(1).toLong, parts(2).toInt)
      val feed = ByteFeed.wrap(member)
      val data = Gzip.memberBytes(feed)
      require(feed.atEof, "zipnum: pointer spans past its member")
      new String(data, "UTF-8").split("\n").filter(_.nonEmpty).foreach { ln =>
        val e = parseCdxLine(ln)
        if (e.surtKey == surtKey) found += e
      }
      b += 1
      // only continue when the next block could still hold the key
      continue = b < clusterIdx.size && keyOf(clusterIdx(b)) <= surtKey
    }
    found.toSeq
  }

  /** Index → corpus bridge: the selective sibling of `crawlDocs` —
    * admit rows from the INDEX (status 200, text/html) and fetch only
    * those, landing them in the documents-table shape via the same
    * shared derivation (doc_id = URI hash, trigram lang, host source).
    * At the 100 TB shape this is how a corpus refresh actually runs:
    * the index decides, the archives are touched one member per
    * admitted row, and unselected records cost nothing.
    */
  def corpusFromCdx(spark: SparkSession, warcDir: String,
                    index: DataFrame): DataFrame =
    WarcSource.docsShape(spark,
      fetchByIndex(spark, warcDir,
        index.filter(col("status") === 200 &&
          col("mime").startsWith("text/html")))
        .filter(col("status") === 200 && col("text").isNotNull &&
          length(col("text")) > 0)
        .select(col("uri"), col("text")))

  /** x124 gate: zipnum point lookups over group-level clusters. Docs
    * group by `doc_id div 64`; each group packs its members' measured
    * CDX lines (sorted — the shard invariant) into gzip blocks of 4
    * lines plus a cluster index, then every doc LOOKS UP its own j=0
    * capture by SURT through the binary search + single-member inflate
    * path. DuckDB re-derives the found entry's facts from doc_id
    * arithmetic; a block-framing or search slip either misses the key
    * (row count) or lands on a wrong entry (hash).
    *
    * 100 TB shape: the cluster index is ~1/4000th of the shard and
    * memory-resident per task; a lookup costs O(log blocks) string
    * compares + ONE member inflate. The gate's grouped form mirrors the
    * deployment unit (one cluster per shard), not a global structure.
    */
  def zipnumTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      // NO fan-out repartition here (r22, ADVICE): unlike the flatMap
      // siblings (cdxTable/cdxGenTable/revisitTable), the CPU kernel
      // below runs in flatMapGroups AFTER the groupByKey shuffle, which
      // already spreads the ~(nDocs/64) groups over the session's
      // shuffle parallelism — a round-robin exchange before it just
      // re-shuffles the corpus text once more for zero parallelism gain
      // (r21 added one; plan-verified dead, removed).
      .as[(Long, String)]
      .groupByKey { case (id, _) => id / 64 }
      .flatMapGroups { (_, rows) =>
        val members = rows.toSeq
        val lines = members.flatMap { case (id, text) =>
          cdxOf(id, text).split("\n").filter(_.nonEmpty)
        }.sorted
        val (blocks, cluster) = zipnumOf(lines, blockSize = 4)
        val seek = new ZipSource.BytesSeekable(blocks)
        val idx = cluster.toIndexedSeq
        members.map { case (id, _) =>
          val key = s"example,site${id % 7})/$id/0"
          val hits = zipnumLookup(seek, idx, key)
          require(hits.nonEmpty, s"zipnum: lookup missed doc $id")
          val e = hits.minBy(_.timestamp)
          (id, lines.size, idx.size, e.surtKey, e.url, e.status, e.digest)
        }
      }
      .toDF("doc_id", "n_lines", "n_blocks", "surt", "url", "status",
        "digest")
      .orderBy("doc_id")
  }

  /** File arm of the zipnum build: each SORTED `.cdx` shard under the
    * glob packs into `<name>.zn` (concatenated gzip blocks) +
    * `<name>.idx` (the cluster index) in `outDir` — one task per shard,
    * O(block) memory (lines stream through; only the current block and
    * the growing-but-tiny index are held). Returns the shard count.
    * Shard-level routing at lookup time comes from the idx files'
    * first/last keys; the shards' global sort order (warc-index's
    * output invariant) makes that routing exact.
    */
  def writeZipnumFiles(spark: SparkSession, glob: String, outDir: String,
                       blockSize: Int = 3000): Long = {
    val conf = new graft.streaming.SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    val out = outDir
    spark.sparkContext.binaryFiles(glob)
      .map { case (path, pds) =>
        val name = path.substring(path.lastIndexOf('/') + 1)
          .stripSuffix(".cdx")
        val fs = new org.apache.hadoop.fs.Path(out)
          .getFileSystem(conf.value)
        fs.mkdirs(new org.apache.hadoop.fs.Path(out))
        val zn = fs.create(
          new org.apache.hadoop.fs.Path(out, name + ".zn"), true)
        val idx = new StringBuilder
        try {
          val reader = new java.io.BufferedReader(
            new java.io.InputStreamReader(pds.open(), "UTF-8"))
          try {
            var off = 0L
            val block = new scala.collection.mutable.ArrayBuffer[String]()
            var prevKey: String = null
            def flush(): Unit = if (block.nonEmpty) {
              val (member, key) = packBlock(block.toSeq)
              zn.write(member)
              idx.append(key).append('\t').append(off)
                .append('\t').append(member.length).append('\n')
              off += member.length
              block.clear()
            }
            var ln = reader.readLine()
            while (ln != null) {
              if (ln.nonEmpty) {
                // the cluster binary search REQUIRES sorted input — an
                // unsorted shard must fail the build, not the lookups
                val key = sortKeyOf(ln)
                require(prevKey == null || prevKey <= key,
                  s"zipnum: shard '$name' is not sorted at '$key'")
                prevKey = key
                block += ln
                if (block.size >= blockSize) flush()
              }
              ln = reader.readLine()
            }
            flush()
            // trailing SENTINEL (offset -1, length 0): the shard's LAST
            // sort key, so lookup routing can skip above-range shards
            // exactly instead of inflating their final block to find out
            if (prevKey != null)
              idx.append(prevKey).append("\t-1\t0\n")
          } finally reader.close()
        } finally zn.close()
        val ip = fs.create(
          new org.apache.hadoop.fs.Path(out, name + ".idx"), true)
        try ip.write(idx.toString.getBytes("UTF-8")) finally ip.close()
        1L
      }
      .sum().toLong
  }

  /** Point lookup across a zipnum directory ([[writeZipnumFiles]]
    * output): load every shard's cluster index (tiny), SKIP shards the
    * probe cannot be in (globally-sorted shards: a probe below a
    * shard's first key is absent from that shard — so at most the one
    * shard covering the key's range, plus its successors when the key
    * equals their first key, pay a member inflate; a probe above a
    * shard's last block's first key still costs that one inflate, the
    * honest residue of not recording last keys), and run the
    * binary-search + single-member lookup on the survivors.
    * Driver-callable — the per-URL audit path; bulk refetch goes
    * through [[fetchByIndex]] instead.
    */
  def zipnumLookupDir(spark: SparkSession, dir: String, url: String)
      : Seq[CdxEntry] = {
    val key = surt(url)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.getPath.getName.endsWith(".idx"))
      .toSeq.flatMap { st =>
        val in = fs.open(st.getPath)
        val cluster =
          try new String(in.readAllBytes(), "UTF-8")
            .split("\n").filter(_.nonEmpty).toIndexedSeq
          finally in.close()
        // shard routing: the first cluster key is the shard's minimum
        // (a strictly-smaller probe cannot be inside) and the trailing
        // sentinel (offset -1) carries its MAXIMUM, so both range ends
        // skip exactly — without the sentinel an above-range probe paid
        // one final-block inflate per shard just to find nothing
        def surtOf(line: String): String = {
          val sp = line.indexOf(' ')
          require(sp > 0, s"zipnum: malformed cluster line '$line'")
          line.substring(0, sp)
        }
        val hasSentinel = cluster.nonEmpty &&
          cluster.last.endsWith("\t-1\t0")
        val blocks0 = if (hasSentinel) cluster.dropRight(1) else cluster
        val aboveMax = hasSentinel && key > surtOf(cluster.last)
        if (blocks0.isEmpty || aboveMax || key < surtOf(blocks0.head))
          Seq.empty
        else {
          val znPath = new org.apache.hadoop.fs.Path(dir,
            st.getPath.getName.stripSuffix(".idx") + ".zn")
          val zIn = fs.open(znPath)
          try {
            val size = fs.getFileStatus(znPath).getLen
            zipnumLookup(new ZipSource.StreamSeekable(zIn, size),
              blocks0, key)
          } finally zIn.close()
        }
      }
  }

  /** REVISIT RESOLUTION (x125) — Common Crawl's dedup bridge closed end
    * to end: a `revisit` record stores NO body, only linkage (URI,
    * payload digest, refers-to). Resolution joins the revisit's digest
    * against the CDX index — whose entries carry the SAME payload
    * digest — and fetches the ORIGINAL record by its pointer, surfacing
    * its decoded text under the revisit's URI without refetching the
    * live site. The gate runs per archive (the fixture's revisits
    * reference their own archive, like a same-crawl dedup); the
    * cross-archive production form is the same digest-keyed join
    * against the full index followed by [[fetchByIndex]] — pointer-
    * sized rows exchange, archive bytes never move.
    */
  def revisitTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      // fan the per-row archive kernel across every core (r21): the
      // documents scan packs into ~4 splits, which serialized these
      // CPU-heavy walks on 4 of 32 cores (measured on x122: 4 tasks,
      // wall 2.3 s for 2.1 s of task time). Same scale-adaptive
      // round-robin the synthesize* fixture sources apply.
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val bytes = WarcSource.warcOf(id, text)
        val revs = WarcSource.parseWarc(bytes).records
          .filter(_.warcType == "revisit")
        if (revs.isEmpty) Seq.empty
        else {
          val archive = new ZipSource.BytesSeekable(bytes)
          val byDigest = cdxOf(id, text).split("\n").filter(_.nonEmpty)
            .map(parseCdxLine).map(e => e.digest -> e).toMap
          revs.map { r =>
            val e = byDigest.getOrElse(r.payloadDigest,
              sys.error(s"revisit: digest ${r.payloadDigest} not indexed"))
            val orig = fetchRecord(archive, e.offset, e.length)
            require(orig.payloadDigest == r.payloadDigest,
              "revisit: pointer landed on a different digest")
            (id, r.targetUri, r.payloadDigest, orig.targetUri,
              WarcSource.htmlText(orig.body))
          }
        }
      }
      .toDF("doc_id", "uri", "digest", "resolved_from", "text")
      .orderBy("doc_id")
  }

  /** File-path arm: parse `.cdx`(.gz) shards under a glob — one task
    * per shard, line-at-a-time off the (possibly gzipped) stream.
    * Under `lenient` (default — index shards are millions of
    * independent lines and one stray line must not abort the job), a
    * malformed LINE degrades to one countable poison row (null surt,
    * the raw line in `url`) and the walk continues; container damage
    * (gzip CRC) still poisons the rest of the FILE via the stream
    * guard. Strict mode keeps every reject loud.
    */
  def cdxFiles(spark: SparkSession, glob: String,
               lenient: Boolean = true): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(glob)
      .flatMap { case (path, pds) =>
        val base = StreamUtil.deferred {
          val in = pds.open()
          val stream: java.io.InputStream =
            if (path.endsWith(".gz")) new Gzip.GunzipStream(new ByteFeed(in))
            else in
          val reader = new java.io.BufferedReader(
            new java.io.InputStreamReader(stream, "UTF-8"))
          StreamUtil.closeOnExhaust(in,
            Iterator.continually(reader.readLine()).takeWhile(_ != null)
              .filter(_.nonEmpty)
              .map { ln =>
                try {
                  val e = parseCdxLine(ln)
                  (path, e.surtKey, e.timestamp, e.url, e.mime, e.status,
                    e.digest, e.length, e.offset, e.filename)
                } catch {
                  case e: RuntimeException if lenient =>
                    (path, null, null, ln, null, -1, null, -1L, -1L, null)
                }
              })
        }
        if (!lenient) base
        else StreamUtil.poisonOnError(base,
          (path, null, null, null, null, -1, null, -1L, -1L, null))
      }
      .toDF("file", "surt", "timestamp", "url", "mime", "status",
        "digest", "length", "offset", "filename")
  }

  /** Random-access fetch arm: for each (filename, offset, length) row
    * of a parsed index, open the archive and decode just that record —
    * the selective-refetch primitive (recrawl candidates, revisit
    * resolution, per-URL audits). Rows are REPARTITIONED by archive and
    * sorted by offset within partitions, so each archive's handle opens
    * exactly once per job and its seeks are monotone (object stores
    * reward forward-only positioned reads; a random-order fetch over
    * 1000 archives would churn a handle per row). One exchange of
    * pointer-sized rows buys it — the fetched bytes never shuffle.
    */
  def fetchByIndex(spark: SparkSession, warcDir: String,
                   index: DataFrame): DataFrame =
    fetchTagged(spark, warcDir,
      index.select(col("filename"), col("offset"), col("length"),
        lit("").as("tag")))
      .drop("tag")

  /** The fetch loop with a caller PASSTHROUGH column — `fetchByIndex`
    * with tag="" and dropped, [[resolveRevisits]] with the revisit URI
    * (without the tag the output only knows the FETCHED record's URI,
    * which is precisely not the revisit's). Same handle/seek shape.
    * Takes a DataFrame (filename, offset, length, tag): the pointer
    * filter runs as a null-safe Column expression BEFORE the typed
    * decode — a typed lambda filter would crash on SQL-NULL pointers
    * from an external index instead of skipping them (r18 review).
    */
  private[graft] def fetchTagged(spark: SparkSession, warcDir: String,
                                 rows0: DataFrame): DataFrame = {
    import spark.implicits._
    val conf = new graft.streaming.SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    val dir = warcDir
    rows0.toDF("fname", "off", "len", "tag")
      .filter(col("fname").isNotNull && col("off") >= 0 && col("len") > 0)
      .repartition(col("fname"))
      .sortWithinPartitions(col("fname"), col("off"))
      .as[(String, Long, Long, String)]
      .mapPartitions { rows =>
        // single-slot handle: rows arrive sorted by filename, so the
        // previous archive is finished the moment the name changes —
        // close it then, keeping open FDs at one per task instead of
        // one per archive-in-partition (r17 review)
        var curName: String = null
        var curIn: org.apache.hadoop.fs.FSDataInputStream = null
        var curSize = 0L
        def closeCur(): Unit = if (curIn != null) {
          try curIn.close() catch { case _: java.io.IOException => () }
          curIn = null; curName = null
        }
        val out = rows.map { case (fname, off, len, tag) =>
          if (fname != curName) {
            closeCur()
            val p = new org.apache.hadoop.fs.Path(dir, fname)
            val fs = p.getFileSystem(conf.value)
            curIn = fs.open(p)
            curSize = fs.getFileStatus(p).getLen
            curName = fname
          }
          val r = fetchRecord(new ZipSource.StreamSeekable(curIn, curSize),
            off, len, lenientHttp = true)
          (fname, r.targetUri, r.httpStatus,
            if (r.body == null) null else WarcSource.htmlText(r.body), tag)
        }
        StreamUtil.closeOnExhaust(() => closeCur(), out)
      }
      .toDF("filename", "uri", "status", "text", "tag")
  }

  /** Cross-archive revisit resolution — the production form of x125:
    * join revisit linkage (uri, digest) against a parsed/generated
    * index on payload digest, resolve each to ONE canonical original
    * (earliest capture — identical-payload-digest means any co-digest
    * capture carries the content), fetch the originals by pointer, and
    * emit rows under the REVISIT's URI. A LEFT join: a revisit whose
    * original lives outside the index surfaces as an `unresolved` row
    * (null text, status -1) to COUNT, never a silent drop (the degrade
    * discipline). No broadcast hint: at crawl scale BOTH sides can be
    * huge (CC revisits are ~half of all captures), so the digest join
    * shuffles pointer-sized rows and AQE picks the strategy.
    */
  def resolveRevisits(spark: SparkSession, warcDir: String,
                      revisits: DataFrame, index: DataFrame): DataFrame = {
    import spark.implicits._
    // The winning capture per digest does not depend on the revisit's
    // URI (earliest by timestamp/filename/offset) — so pick it by
    // pre-aggregating the index to ONE row per digest BEFORE the join
    // (struct-min = the same lexicographic (timestamp, filename,
    // offset) order the old per-(uri,digest) window used; `length`
    // trails as a deterministic tiebreak where the window was
    // tie-arbitrary). The r18 form joined the FULL index on bare
    // digest first, fanning out |uris sharing d| × |captures with d|
    // rows per digest — and on real crawl data `digest` is exactly the
    // skewed key (boilerplate/soft-404 bodies share one digest across
    // millions of captures AND revisit URIs). After the pre-agg the
    // join is 1:1 per digest and the window is gone: map-side-combined
    // agg + pointer-sized exchange, no skewed fan-out.
    val best = index
      .select(col("digest"), col("timestamp"), col("filename"),
        col("offset"), col("length"))
      .groupBy("digest")
      .agg(min(struct(col("timestamp"), col("filename"),
        col("offset"), col("length"))).as("cap"))
      .select(col("digest"), col("cap.timestamp").as("timestamp"),
        col("cap.filename").as("filename"),
        col("cap.offset").as("offset"), col("cap.length").as("length"))
    val picked = revisits
      .select(col("uri").as("revisit_uri"), col("digest")).distinct()
      .join(best, Seq("digest"), "left")
      // pointer VALIDITY decides the branch — an index-missing digest
      // AND an index row with a garbage/NULL pointer both land in
      // `unresolved`: routing only on filename would let fetchTagged's
      // pointer filter silently swallow the latter (r18 review)
      .withColumn("ok", col("filename").isNotNull &&
        coalesce(col("offset") >= 0 && col("length") > 0, lit(false)))
    val resolved = fetchTagged(spark, warcDir,
      picked.filter(col("ok"))
        .select(col("filename"), col("offset"), col("length"),
          col("revisit_uri")))
      .select(col("tag").as("revisit_uri"), col("uri").as("resolved_from"),
        col("status"), col("text"))
    val unresolved = picked.filter(!col("ok"))
      .select(col("revisit_uri"), lit(null).cast("string").as("resolved_from"),
        lit(-1).as("status"), lit(null).cast("string").as("text"))
    resolved.unionByName(unresolved)
  }
}
