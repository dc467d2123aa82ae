package graft.queries

import graft.functions.GraftFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data text operations over the `documents` table (doc_id, text,
  * lang, source, n_chars) — dedup, token counting, quality scoring,
  * language-ID heuristic, fingerprinting. Each oracle computes the identical
  * deterministic formula in DuckDB.
  *
  * Scale notes: all of these are scan → narrow map → single hash-agg
  * shuffle; no joins, no skew-prone keys (md5 spreads uniformly). At 100 TB
  * the md5-groupBy exact dedup is the canonical first pass; the MinHash/LSH
  * near-dup path (graft.operators.Dedup, no SQL oracle) takes over where
  * exactness isn't required.
  */
object TextQueries {
  import QueryDef.t

  // whitespace tokenizer shared by several queries (Spark side)
  private def tokens(c: org.apache.spark.sql.Column) = split(trim(c), "\\s+")

  // md5 of the empty string — the rebuilt-text hash for a doc whose every
  // segment was stripped (mirrors the oracle's coalesce(..., md5(''))).
  // Declared BEFORE `all`: d45's oracle string interpolates it eagerly at
  // map construction, so a bottom-of-file declaration would still be null.
  private val md5Empty = "d41d8cd98f00b204e9800998ecf8427e"

  /** round(ln(64/V)·1e6) for V = 1..64 — d48's linear-counting table,
    * shared VERBATIM by the Spark expression and the DuckDB oracle so
    * the small-range estimate is integer-identical in both engines
    * (neither evaluates a float log at runtime).
    */
  private val hllLnTable: Seq[Long] =
    (1 to 64).map(v => Math.round(Math.log(64.0 / v) * 1e6))

  /** d5's DuckDB side, GENERATED from the same source constants the
    * engine scores with (LangId.seeds / LangId.lnMicro), so the two
    * model definitions cannot drift: the oracle re-derives trigram
    * counts from the seed VALUES and joins the literal micro-nat table
    * — identical integers, no runtime ln. Declared before `all` (the
    * md5Empty eager-interpolation rule).
    */
  private val langIdOracleSql: String = {
    val seedVals = graft.functions.LangId.seeds
      .map { case (l, s) => s"('$l', '$s')" }.mkString(",\n      ")
    val lnVals = graft.functions.LangId.lnMicro.toSeq.sortBy(_._1)
      .map { case (k, v) => s"($k, $v)" }.mkString(", ")
    val margin = graft.functions.LangId.undMarginMicro
    s"""WITH seed(lang, sentence) AS (VALUES
       |      $seedVals),
       |lnt(k, v) AS (VALUES $lnVals),
       |sp AS (SELECT lang,
       |         ' ' || trim(regexp_replace(lower(sentence), '[^a-z]+', ' ', 'g'))
       |           || ' ' AS p FROM seed),
       |si AS (SELECT lang, p, unnest(range(1, length(p) - 1)) AS i FROM sp),
       |stri AS (SELECT lang, substr(p, CAST(i AS INT), 3) AS tri FROM si),
       |cnt AS (SELECT lang, tri, count(*) AS c FROM stri GROUP BY 1, 2),
       |tot AS (SELECT lang, count(*) AS t FROM stri GROUP BY 1),
       |voc AS (SELECT count(DISTINCT tri) AS v FROM stri),
       |dp AS (SELECT doc_id, lang AS true_lang,
       |         ' ' || trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g'))
       |           || ' ' AS p FROM documents),
       |di AS (SELECT doc_id, true_lang, p, unnest(range(1, length(p) - 1)) AS i
       |       FROM dp WHERE length(p) >= 3),
       |dtri AS (SELECT doc_id, true_lang, substr(p, CAST(i AS INT), 3) AS tri
       |         FROM di),
       |ntr AS (SELECT doc_id, count(*) AS n FROM dtri GROUP BY 1),
       |sc AS (SELECT dt.doc_id, dt.true_lang, lg.lang,
       |         sum(lc.v) - count(*) * any_value(lt.v) AS score
       |       FROM dtri dt
       |       CROSS JOIN (SELECT DISTINCT lang FROM seed) lg
       |       LEFT JOIN cnt ON cnt.lang = lg.lang AND cnt.tri = dt.tri
       |       JOIN tot ON tot.lang = lg.lang
       |       CROSS JOIN voc
       |       JOIN lnt lc ON lc.k = coalesce(cnt.c, 0) + 1
       |       JOIN lnt lt ON lt.k = tot.t + voc.v
       |       GROUP BY 1, 2, 3),
       |pr AS (SELECT doc_id, lang, score,
       |         row_number() OVER (PARTITION BY doc_id
       |                            ORDER BY score DESC, lang) AS rn
       |       FROM sc),
       |win AS (SELECT p1.doc_id,
       |          CASE WHEN p1.score - p2.score >= $margin * ntr.n
       |            THEN p1.lang ELSE 'und' END AS pred
       |        FROM (SELECT * FROM pr WHERE rn = 1) p1
       |        JOIN (SELECT * FROM pr WHERE rn = 2) p2 USING (doc_id)
       |        JOIN ntr USING (doc_id))
       |SELECT d.lang, coalesce(p.pred, 'und') AS pred, count(*) AS n
       |FROM documents d
       |LEFT JOIN win p USING (doc_id)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** The d58 probe pool: held-out Cyrillic sentences (NEVER seed
    * sentences — the gate must exercise generalization, not recall),
    * indexed by doc_id % 9 in both engines. All lowercase and 100%
    * inside the model alphabet, so the engine-side coverage rule and
    * lowercasing are identities here (both spec-pinned separately in
    * LangIdSpec) and the oracle needs neither.
    */
  private[graft] val cyrPool: Seq[(String, String)] = Seq(
    ("ru", "мы читаем книги каждый вечер после работы"),
    ("ru", "сегодня хорошая погода и мы идем гулять в парк"),
    ("ru", "он не знал что сказать и просто молчал"),
    ("uk", "ми читаємо книжки щовечора після роботи"),
    ("uk", "сьогодні гарна погода і ми йдемо гуляти в парк"),
    ("uk", "він не знав що сказати і просто мовчав"),
    ("bg", "къде е най близката спирка на автобуса и кога идва той"),
    ("bg", "времето днес е много хубаво и ще отидем на разходка"),
    ("bg", "той не знаеше какво да каже и просто мълчеше"))

  /** The shared held-out-pool NB oracle (d58 Cyrillic, d59 Arabic):
    * re-derive every trigram count from the family's seed VALUES, join
    * the family's literal ln table, score each pool sentence, apply the
    * margin + alphabetical tie — then join docs by doc_id % pool-size.
    * One builder, so a family cannot drift from the SQL that checks it.
    */
  private def trigramPoolOracleSql(
      seeds: Seq[(String, String)], lnMicro: Map[Int, Long],
      margin: Long, strip: String,
      pool: Seq[(String, String)]): String = {
    val poolVals = pool.zipWithIndex
      .map { case ((l, s), i) => s"($i, '$l', '$s')" }.mkString(",\n      ")
    val seedVals = seeds
      .map { case (l, s) => s"('$l', '$s')" }.mkString(",\n      ")
    val lnVals = lnMicro.toSeq.sortBy(_._1)
      .map { case (k, v) => s"($k, $v)" }.mkString(", ")
    s"""WITH pool(idx, true_lang, sentence) AS (VALUES
       |      $poolVals),
       |seed(lang, sentence) AS (VALUES
       |      $seedVals),
       |lnt(k, v) AS (VALUES $lnVals),
       |sp AS (SELECT lang,
       |         ' ' || trim(regexp_replace(sentence, '$strip+', ' ', 'g'))
       |           || ' ' AS p FROM seed),
       |si AS (SELECT lang, p, unnest(range(1, length(p) - 1)) AS i FROM sp),
       |stri AS (SELECT lang, substr(p, CAST(i AS INT), 3) AS tri FROM si),
       |cnt AS (SELECT lang, tri, count(*) AS c FROM stri GROUP BY 1, 2),
       |tot AS (SELECT lang, count(*) AS t FROM stri GROUP BY 1),
       |voc AS (SELECT count(DISTINCT tri) AS v FROM stri),
       |pp AS (SELECT idx, true_lang,
       |         ' ' || trim(regexp_replace(sentence, '$strip+', ' ', 'g'))
       |           || ' ' AS p FROM pool),
       |pi AS (SELECT idx, true_lang, p, unnest(range(1, length(p) - 1)) AS i
       |       FROM pp),
       |ptri AS (SELECT idx, true_lang, substr(p, CAST(i AS INT), 3) AS tri
       |         FROM pi),
       |ntr AS (SELECT idx, count(*) AS n FROM ptri GROUP BY 1),
       |sc AS (SELECT pt.idx, lg.lang,
       |         sum(lc.v) - count(*) * any_value(lt.v) AS score
       |       FROM ptri pt
       |       CROSS JOIN (SELECT DISTINCT lang FROM seed) lg
       |       LEFT JOIN cnt ON cnt.lang = lg.lang AND cnt.tri = pt.tri
       |       JOIN tot ON tot.lang = lg.lang
       |       CROSS JOIN voc
       |       JOIN lnt lc ON lc.k = coalesce(cnt.c, 0) + 1
       |       JOIN lnt lt ON lt.k = tot.t + voc.v
       |       GROUP BY 1, 2),
       |pr AS (SELECT idx, lang, score,
       |         row_number() OVER (PARTITION BY idx
       |                            ORDER BY score DESC, lang) AS rn
       |       FROM sc),
       |win AS (SELECT p1.idx,
       |          CASE WHEN p1.score - p2.score >= $margin * ntr.n
       |            THEN p1.lang ELSE 'und' END AS pred
       |        FROM (SELECT * FROM pr WHERE rn = 1) p1
       |        JOIN (SELECT * FROM pr WHERE rn = 2) p2 USING (idx)
       |        JOIN ntr USING (idx)),
       |docs AS (SELECT doc_id, CAST(doc_id % ${pool.size} AS INT) AS idx
       |         FROM documents)
       |SELECT p.true_lang, w.pred, count(*) AS n
       |FROM docs d
       |JOIN pool p ON p.idx = d.idx
       |JOIN win w ON w.idx = d.idx
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  private val cyrLangIdOracleSql: String = trigramPoolOracleSql(
    graft.functions.CyrLangId.seeds, graft.functions.CyrLangId.lnMicro,
    graft.functions.CyrLangId.undMarginMicro,
    graft.functions.CyrLangId.stripRe, cyrPool)

  /** The d63 probe pool: held-out Latin-script sentences, two per
    * modeled language — the d58 discipline applied back to the Latin
    * family after the r20 breadth extension (pl/tr/vi/id/ro/cs join
    * de/en/es/fr/it/nl/pt/sv). Never seed sentences; all lowercase
    * ASCII (the seeds' own folding convention), so normalization is an
    * identity here and the shared pool oracle needs no lower().
    */
  private[graft] val latinPool: Seq[(String, String)] = Seq(
    ("en", "the government said that it would not change the law"),
    ("en", "we are going to the market this morning with the children"),
    ("de", "die regierung sagte dass sie das gesetz nicht aendern wuerde"),
    ("de", "wir gehen heute morgen mit den kindern auf den markt"),
    ("fr", "le gouvernement a dit qu il ne changerait pas la loi"),
    ("fr", "nous allons au marche ce matin avec les enfants"),
    ("es", "el gobierno dijo que no cambiaria la ley"),
    ("es", "vamos al mercado esta manana con los ninos"),
    ("it", "il governo ha detto che non cambiera la legge"),
    ("it", "andiamo al mercato questa mattina con i bambini"),
    ("nl", "we gaan morgenochtend met de kinderen naar de markt"),
    ("nl", "de regering zei dat ze de wet niet zou veranderen"),
    ("pt", "vamos ao mercado amanha de manha com as criancas"),
    ("pt", "o governo disse que nao mudaria a lei"),
    ("sv", "vi gar till marknaden i morgon bitti med barnen"),
    ("sv", "regeringen sade att den inte skulle andra lagen"),
    ("pl", "rzad powiedzial ze nie zmieni prawa"),
    ("pl", "idziemy dzis rano na targ z dziecmi"),
    ("tr", "hukumet yasayi degistirmeyecegini soyledi"),
    ("tr", "bu sabah cocuklarla pazara gidiyoruz"),
    ("vi", "chinh phu noi rang ho se khong thay doi luat"),
    ("vi", "sang nay chung ta di cho voi cac con"),
    ("id", "pemerintah mengatakan bahwa mereka tidak akan mengubah undang undang"),
    ("id", "pagi ini kami pergi ke pasar bersama anak anak"),
    ("ro", "guvernul a spus ca nu va schimba legea"),
    ("ro", "mergem la piata in aceasta dimineata cu copiii"),
    ("cs", "vlada rekla ze zakon nezmeni"),
    ("cs", "dnes rano jdeme s detmi na trh"))

  private lazy val latinLangIdOracleSql: String = trigramPoolOracleSql(
    graft.functions.LangId.seeds, graft.functions.LangId.lnMicro,
    graft.functions.LangId.undMarginMicro, "[^a-z]", latinPool)

  /** The d59 probe pool — held-out Arabic-script sentences, the d58
    * discipline on a third writing system (all in-alphabet, so the
    * coverage rule is an identity here; LangIdSpec pins it on real
    * Kurdish/Pashto text).
    */
  private[graft] val arabPool: Seq[(String, String)] = Seq(
    ("ar", "نذهب الى السوق كل صباح مع الاطفال"),
    ("ar", "قال الرجل انه لن يغير القانون"),
    ("ar", "لم يعرف ماذا يقول فبقي صامتا"),
    ("fa", "ما هر روز صبح با بچه ها به بازار می رویم"),
    ("fa", "ان مرد گفت که قانون را تغییر نخواهد داد"),
    ("fa", "او نمی دانست چه بگوید و ساکت ماند"),
    ("ur", "ہم ہر صبح بچوں کے ساتھ بازار جاتے ہیں"),
    ("ur", "اس ادمی نے کہا کہ وہ قانون نہیں بدلے گا"),
    ("ur", "وہ نہیں جانتا تھا کہ کیا کہے اس لیے خاموش رہا"))

  private val arabLangIdOracleSql: String = trigramPoolOracleSql(
    graft.functions.ArabLangId.seeds, graft.functions.ArabLangId.lnMicro,
    graft.functions.ArabLangId.undMarginMicro,
    graft.functions.ArabLangId.stripRe, arabPool)

  /** The d60 probe pool — held-out Hebrew-script sentences (he/yi),
    * the d58 discipline on a fourth writing system. All in-alphabet
    * (the family has no coverage rule — every Hebrew-script language
    * shares the letters).
    */
  private[graft] val hebPool: Seq[(String, String)] = Seq(
    ("he", "אנחנו קוראים ספרים כל ערב אחרי העבודה"),
    ("he", "מזג האוויר היום טוב ואנחנו הולכים לטייל בפארק"),
    ("he", "הוא לא ידע מה להגיד ופשוט שתק"),
    ("yi", "מיר לייענען ביכער יעדן אוונט נאך דער ארבעט"),
    ("yi", "דער וועטער איז היינט גוט און מיר גייען שפאצירן אין פארק"),
    ("yi", "ער האט נישט געוווסט וואס צו זאגן און האט פשוט געשוויגן"))

  private val hebLangIdOracleSql: String = trigramPoolOracleSql(
    graft.functions.HebLangId.seeds, graft.functions.HebLangId.lnMicro,
    graft.functions.HebLangId.undMarginMicro,
    graft.functions.HebLangId.stripRe, hebPool)

  /** The d61 probe pool — held-out Devanagari sentences (hi/mr/ne),
    * nukta-free like the seeds.
    */
  private[graft] val devaPool: Seq[(String, String)] = Seq(
    ("hi", "हम हर शाम काम के बाद किताबें पढते हैं"),
    ("hi", "आज मौसम अच्छा है और हम पार्क में घूमने जा रहे हैं"),
    ("hi", "उसे समझ नहीं आया कि क्या कहे और वह चुप रहा"),
    ("mr", "आम्ही रोज संध्याकाळी कामानंतर पुस्तके वाचतो"),
    ("mr", "आज हवामान छान आहे आणि आम्ही बागेत फिरायला जात आहोत"),
    ("mr", "त्याला काय बोलावे ते समजले नाही आणि तो गप्प राहिला"),
    ("ne", "हामी हरेक साँझ काम पछि किताबहरू पढ्छौं"),
    ("ne", "आज मौसम राम्रो छ र हामी बगैंचामा घुम्न जाँदैछौं"),
    ("ne", "उसलाई के भन्ने थाहा भएन र ऊ चुप लाग्यो"))

  private val devaLangIdOracleSql: String = trigramPoolOracleSql(
    graft.functions.DevaLangId.seeds, graft.functions.DevaLangId.lnMicro,
    graft.functions.DevaLangId.undMarginMicro,
    graft.functions.DevaLangId.stripRe, devaPool)

  /** The d62 probe pool — held-out Han sentences (zh-hans/zh-hant),
    * each pair a character-wise variant like the seeds. Held-out gap
    * measured in tools/langid/calc_han.py: ≥ ~123k micro-nats/char.
    */
  private[graft] val hanPool: Seq[(String, String)] = Seq(
    ("zh-hans", "我们每天晚上下班后都在家里读书"),
    ("zh-hans", "今天天气很好我们去公园散步"),
    ("zh-hans", "他不知道该说什么只好保持沉默"),
    ("zh-hant", "我們每天晚上下班後都在家裡讀書"),
    ("zh-hant", "今天天氣很好我們去公園散步"),
    ("zh-hant", "他不知道該說什麼只好保持沉默"))

  /** The UNIGRAM sibling of [[trigramPoolOracleSql]] for the Han
    * family (d62): counts are per CHARACTER of the Han-stripped text
    * (no padding, no spaces — order-free), the margin unit is
    * micro-nats per character, and the strip class is the shared
    * `[^\x{4e00}-\x{9fff}]` literal RE2/Java both accept. Same seed
    * VALUES + literal ln table + alphabetical tie as every family.
    */
  private def unigramPoolOracleSql(
      seeds: Seq[(String, String)], lnMicro: Map[Int, Long],
      margin: Long, strip: String,
      pool: Seq[(String, String)]): String = {
    val poolVals = pool.zipWithIndex
      .map { case ((l, s), i) => s"($i, '$l', '$s')" }.mkString(",\n      ")
    val seedVals = seeds
      .map { case (l, s) => s"('$l', '$s')" }.mkString(",\n      ")
    val lnVals = lnMicro.toSeq.sortBy(_._1)
      .map { case (k, v) => s"($k, $v)" }.mkString(", ")
    s"""WITH pool(idx, true_lang, sentence) AS (VALUES
       |      $poolVals),
       |seed(lang, sentence) AS (VALUES
       |      $seedVals),
       |lnt(k, v) AS (VALUES $lnVals),
       |sp AS (SELECT lang,
       |         regexp_replace(sentence, '$strip+', '', 'g') AS p
       |       FROM seed),
       |si AS (SELECT lang, p, unnest(range(1, length(p) + 1)) AS i FROM sp),
       |sch AS (SELECT lang, substr(p, CAST(i AS INT), 1) AS ch FROM si),
       |cnt AS (SELECT lang, ch, count(*) AS c FROM sch GROUP BY 1, 2),
       |tot AS (SELECT lang, count(*) AS t FROM sch GROUP BY 1),
       |voc AS (SELECT count(DISTINCT ch) AS v FROM sch),
       |pp AS (SELECT idx, true_lang,
       |         regexp_replace(sentence, '$strip+', '', 'g') AS p
       |       FROM pool),
       |pi AS (SELECT idx, true_lang, p, unnest(range(1, length(p) + 1)) AS i
       |       FROM pp),
       |pch AS (SELECT idx, true_lang, substr(p, CAST(i AS INT), 1) AS ch
       |        FROM pi),
       |ntr AS (SELECT idx, count(*) AS n FROM pch GROUP BY 1),
       |sc AS (SELECT pc.idx, lg.lang,
       |         sum(lc.v) - count(*) * any_value(lt.v) AS score
       |       FROM pch pc
       |       CROSS JOIN (SELECT DISTINCT lang FROM seed) lg
       |       LEFT JOIN cnt ON cnt.lang = lg.lang AND cnt.ch = pc.ch
       |       JOIN tot ON tot.lang = lg.lang
       |       CROSS JOIN voc
       |       JOIN lnt lc ON lc.k = coalesce(cnt.c, 0) + 1
       |       JOIN lnt lt ON lt.k = tot.t + voc.v
       |       GROUP BY 1, 2),
       |pr AS (SELECT idx, lang, score,
       |         row_number() OVER (PARTITION BY idx
       |                            ORDER BY score DESC, lang) AS rn
       |       FROM sc),
       |win AS (SELECT p1.idx,
       |          CASE WHEN p1.score - p2.score >= $margin * ntr.n
       |            THEN p1.lang ELSE 'und' END AS pred
       |        FROM (SELECT * FROM pr WHERE rn = 1) p1
       |        JOIN (SELECT * FROM pr WHERE rn = 2) p2 USING (idx)
       |        JOIN ntr USING (idx)),
       |docs AS (SELECT doc_id, CAST(doc_id % ${pool.size} AS INT) AS idx
       |         FROM documents)
       |SELECT p.true_lang, w.pred, count(*) AS n
       |FROM docs d
       |JOIN pool p ON p.idx = d.idx
       |JOIN win w ON w.idx = d.idx
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  private val hanLangIdOracleSql: String = unigramPoolOracleSql(
    graft.functions.HanLangId.seeds, graft.functions.HanLangId.lnMicro,
    graft.functions.HanLangId.undMarginMicro,
    graft.functions.HanLangId.stripRe, hanPool)

  val all: Map[String, QueryDef] = Map(

    // ---- exact dedup: md5-groupBy, keep the smallest doc_id per content
    // hash. On 100 TB: one shuffle on a uniform 128-bit key — no skew.
    "d1_dedup_exact" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("keep_id"),
      Some("""SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_copies
             |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin)),

    // ---- dedup cardinality summary (total vs unique).
    "d2_dedup_count" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .agg(count(lit(1)).as("total_docs"),
          countDistinct(md5(col("text"))).as("unique_docs")),
      Some("""SELECT count(*) AS total_docs,
             |  count(DISTINCT md5(text)) AS unique_docs FROM documents""".stripMargin)),

    // ---- token counting (whitespace tokenizer) per language.
    "d3_tokens" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .withColumn("n_tokens", graft.functions.SketchFunctions.tokenCount(col("text")))
        .groupBy("lang")
        .agg(sum(col("n_tokens")).cast("long").as("total_tokens"),
          round(avg(col("n_tokens")), 4).as("avg_tokens"),
          count(lit(1)).as("n_docs"))
        .orderBy("lang"),
      Some("""SELECT lang,
             |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             |  round(avg(n_tokens), 4) AS avg_tokens,
             |  count(*) AS n_docs
             |FROM (SELECT lang,
             |        len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
             |      FROM documents)
             |GROUP BY lang ORDER BY lang""".stripMargin)),

    // ---- quality scoring: length, avg word length, space ratio — the
    // ratio features a filtering pipeline thresholds on.
    "d4_quality" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .withColumn("n_tokens", graft.functions.SketchFunctions.tokenCount(col("text")))
        .withColumn("len_nospace", length(regexp_replace(col("text"), " ", "")))
        .withColumn("avg_word_len",
          round(col("len_nospace").cast("double") / col("n_tokens"), 4))
        .withColumn("space_ratio",
          round((length(col("text")) - col("len_nospace")).cast("double") /
            length(col("text")), 4))
        .groupBy("source")
        .agg(round(avg("avg_word_len"), 4).as("avg_avg_word_len"),
          round(avg("space_ratio"), 4).as("avg_space_ratio"),
          count(lit(1)).as("n_docs"))
        .orderBy("source"),
      Some("""SELECT source,
             |  round(avg(round(CAST(len_nospace AS DOUBLE) / n_tokens, 4)), 4)
             |    AS avg_avg_word_len,
             |  round(avg(round(CAST(length(text) - len_nospace AS DOUBLE)
             |    / length(text), 4)), 4) AS avg_space_ratio,
             |  count(*) AS n_docs
             |FROM (SELECT source, text,
             |        len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
             |        length(replace(text, ' ', '')) AS len_nospace
             |      FROM documents)
             |GROUP BY source ORDER BY source""".stripMargin)),

    // ---- language ID: char-trigram naive Bayes (functions/LangId) over
    // SEEDED per-language profile corpora — the real langid stage of a
    // crawl pipeline (replaced the r15 5-marker argmax). Both engines
    // build the SAME model: the oracle re-derives trigram counts from
    // the same literal seed sentences and joins the same literal
    // micro-nat ln table (no runtime ln — the d33/d54 integer
    // discipline), so smoothing, scoring, and the alphabetical tie rule
    // are all hash-checked — including the und margin rule (argmax
    // must beat the runner-up by undMarginMicro per trigram, else the
    // text is declared out-of-set; keyword-soup synthetic docs
    // legitimately land und). LangIdSpec checks accuracy on held-out
    // real sentences across all eight languages and pins Finnish/
    // Turkish to und.
    "d5_langid" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents").select(col("lang"), col("text"))
          .as[(String, String)]
          .map { case (lang, text) =>
            (lang, graft.functions.LangId.predict(text)) }
          .toDF("lang", "pred")
          .groupBy("lang", "pred").agg(count(lit(1)).as("n"))
          .orderBy("lang", "pred")
      },
      Some(langIdOracleSql)),

    // ---- BPE-ish pre-tokenization: letter runs | single digits | single
    // punctuation (the GPT-2 pre-tokenizer shape, portable regex subset).
    "d7_bpe_tokens" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .withColumn("n_pieces", size(regexp_extract_all(col("text"),
          lit("[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 ]"), lit(0))))
        .groupBy("source")
        .agg(sum(col("n_pieces")).cast("long").as("total_pieces"),
          round(avg(col("n_pieces")), 4).as("avg_pieces"),
          count(lit(1)).as("n_docs"))
        .orderBy("source"),
      Some("""SELECT source,
             |  CAST(sum(n_pieces) AS BIGINT) AS total_pieces,
             |  round(avg(n_pieces), 4) AS avg_pieces,
             |  count(*) AS n_docs
             |FROM (SELECT source,
             |    len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 ]'))
             |      AS n_pieces FROM documents)
             |GROUP BY source ORDER BY source""".stripMargin)),

    // ---- Karp–Rabin rolling-hash fingerprint (custom codegen'd
    // expression, graft.functions.RollingHash): content-identity dedup on a
    // 1e9+7 polynomial hash. ASCII corpus → byte fold == codepoint fold,
    // which is what the oracle computes.
    "d8_rolling_fingerprint" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .withColumn("fp", GraftFunctions.rollingHash(col("text")))
        .groupBy("fp")
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("keep_id"),
      Some("""SELECT list_reduce(list_prepend(CAST(0 AS BIGINT),
             |    list_transform(range(1, length(text) + 1),
             |      i -> CAST(ord(text[i]) AS BIGINT))),
             |    (h, c) -> (h * 31 + c) % 1000000007) AS fp,
             |  min(doc_id) AS keep_id, count(*) AS n_copies
             |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin)),

    // ---- deterministic hash sampling: ~10% of docs by md5 prefix — the
    // reproducible subset selection a training pipeline uses (no rand()).
    "d9_sample" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .filter(substring(md5(col("text")), 1, 2) < "1a")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"))
        .orderBy("lang"),
      Some("""SELECT lang, count(*) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS total_chars
             |FROM documents WHERE substr(md5(text), 1, 2) < '1a'
             |GROUP BY lang ORDER BY lang""".stripMargin)),

    // ---- TF-IDF profile of the whole corpus vocabulary: df, total tf,
    // and the global tf-idf mass per term. N/df division and the ln are
    // computed in double in both engines; rounding collapses ulp noise.
    "d10_tfidf" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
        val n = docs.agg(count(lit(1)).as("n_docs"))
        toks.groupBy("term")
          .agg(countDistinct("doc_id").as("df"), count(lit(1)).as("total_tf"))
          .crossJoin(broadcast(n))
          .withColumn("tfidf", round(col("total_tf") *
            log(col("n_docs").cast("double") / col("df")), 4))
          .select("term", "df", "total_tf", "tfidf")
          .orderBy("term")
      },
      Some("""SELECT term,
             |  CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
             |  CAST(count(*) AS BIGINT) AS total_tf,
             |  round(count(*) * ln(CAST((SELECT count(*) FROM documents) AS DOUBLE)
             |    / count(DISTINCT doc_id)), 4) AS tfidf
             |FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
             |      FROM documents)
             |GROUP BY term ORDER BY term""".stripMargin)),

    // ---- log-template mining: redact digit runs, group identical
    // templates (the structure-extraction pass of a log/training pipeline;
    // doubles as the PII-scrub shape — swap the pattern for emails/ids).
    "d11_templates" -> QueryDef(
      (s, dir) => t(s, dir, "events")
        .withColumn("template", regexp_replace(col("props"), "[0-9]+", "#"))
        .groupBy("event_type", "template")
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type", "template"),
      Some("""SELECT event_type,
             |  regexp_replace(props, '[0-9]+', '#', 'g') AS template,
             |  count(*) AS n
             |FROM events GROUP BY 1, 2 ORDER BY event_type, template""".stripMargin)),

    // ---- stratified sampling: exactly 20 docs per language, chosen by
    // md5 rank — deterministic, engine-independent quota sampling (the
    // per-class balancing step of a training-mix pipeline). One window
    // shuffle on the stratum key.
    "d12_stratified" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("lang").orderBy(md5(col("text")), col("doc_id"))
        t(s, dir, "documents")
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 20)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_sampled"),
            sum(col("n_chars")).cast("long").as("sampled_chars"),
            min(col("doc_id")).as("min_doc_id"))
          .orderBy("lang")
      },
      Some("""SELECT lang, count(*) AS n_sampled,
             |  CAST(sum(n_chars) AS BIGINT) AS sampled_chars,
             |  min(doc_id) AS min_doc_id
             |FROM (SELECT lang, n_chars, doc_id,
             |    row_number() OVER (PARTITION BY lang
             |      ORDER BY md5(text), doc_id) AS rk
             |  FROM documents)
             |WHERE rk <= 20
             |GROUP BY lang ORDER BY lang""".stripMargin)),

    // ---- document fingerprint: md5 over the sorted distinct token set
    // (order-invariant content signature; bag-of-words identity).
    "d6_fingerprint" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .withColumn("fp",
          md5(array_join(array_sort(array_distinct(tokens(col("text")))), " ")))
        .groupBy("fp")
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_same_bag"))
        .orderBy("keep_id"),
      Some("""SELECT md5(array_to_string(list_sort(list_distinct(
             |    regexp_split_to_array(trim(text), '\s+'))), ' ')) AS fp,
             |  min(doc_id) AS keep_id, count(*) AS n_same_bag
             |FROM documents
             |GROUP BY 1 ORDER BY keep_id""".stripMargin)),

    // ---- vocabulary construction: top-100 tokens by corpus frequency
    // (tf) with document frequency (df) — the tokenizer-training prep
    // stage. One explode + one agg shuffle; top-k is TakeOrdered, never a
    // global sort of the vocabulary.
    "d13_vocab" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("tf"),
          countDistinct(col("doc_id")).as("df"))
        .orderBy(col("tf").desc, col("token"))
        .limit(100),
      Some("""SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
             |FROM (SELECT doc_id,
             |    unnest(regexp_split_to_array(trim(text), '\s+')) AS token
             |  FROM documents)
             |GROUP BY token ORDER BY tf DESC, token LIMIT 100""".stripMargin)),

    // ---- PII redaction: email-pattern scrub with redaction accounting.
    // PII is planted deterministically (the corpus has none), the scrub
    // itself is the real operator: one narrow regexp pass, no shuffle
    // before the ordered dump. Pattern kept to the Java-regex /\ RE2
    // common subset so both engines agree byte-for-byte.
    "d14_pii" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .withColumn("txt", concat(col("text"),
          when(pmod(col("doc_id"), lit(7)) === 0,
            concat(lit(" contact user"), col("doc_id"),
              lit("@example.com now"))).otherwise(lit(""))))
        .select(col("doc_id"),
          regexp_replace(col("txt"),
            "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
            "<EMAIL>").as("redacted"))
        .withColumn("was_redacted", col("redacted").contains("<EMAIL>"))
        .select("doc_id", "was_redacted", "redacted")
        .orderBy("doc_id"),
      Some("""SELECT doc_id, contains(redacted, '<EMAIL>') AS was_redacted,
             |  redacted
             |FROM (SELECT doc_id, regexp_replace(
             |    text || CASE WHEN doc_id % 7 = 0
             |      THEN ' contact user' || doc_id || '@example.com now'
             |      ELSE '' END,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
             |    '<EMAIL>', 'g') AS redacted
             |  FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // ---- intra-document repetition signals (Gopher/RefinedWeb-style
    // quality rules): per doc, the fraction of duplicated word-2-grams and
    // the share of the single most frequent 2-gram. Explode → count per
    // (doc, gram) → per-doc stats: two map-side-combinable agg shuffles on
    // (doc_id, gram) then doc_id — no joins, uniform keys.
    "d15_repetition" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("tk"))
        .filter(size(col("tk")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(tk) - 2), i -> concat(tk[i], ' ', tk[i+1]))"))
          .as("gram"))
        .groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum("c").cast("long").as("n_2grams"),
          round(lit(1.0) - count(lit(1)).cast("double") / sum("c"), 4)
            .as("dup_frac"),
          round(max("c").cast("double") / sum("c"), 4).as("top_frac"))
        .orderBy("doc_id"),
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
             |  FROM documents),
             |idx AS (
             |  SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
             |  FROM toks WHERE len(t) >= 2),
             |g AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS gram FROM idx),
             |cnt AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2)
             |SELECT doc_id,
             |  CAST(sum(c) AS BIGINT) AS n_2grams,
             |  round(1.0 - count(*)::DOUBLE / sum(c), 4) AS dup_frac,
             |  round(max(c)::DOUBLE / sum(c), 4) AS top_frac
             |FROM cnt GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- language mixture weights: temperature-based sampling
    // proportions over per-language token mass (w_l = sqrt(tokens_l) /
    // Σ sqrt — α = 0.5 upsampling of low-resource streams, the standard
    // multilingual mixing rule). sqrt, not pow(x, α): IEEE sqrt is
    // correctly rounded in both engines, an arbitrary-α pow is not. The
    // global window runs over the post-agg frame (one row per language —
    // bounded by language count, never data).
    "d16_mixture" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy(lit(1))
        t(s, dir, "documents")
          .withColumn("n_tokens",
            graft.functions.SketchFunctions.tokenCount(col("text")))
          .groupBy("lang")
          .agg(sum(col("n_tokens")).cast("long").as("lang_tokens"))
          .withColumn("weight", round(
            sqrt(col("lang_tokens").cast("double")) /
              sum(sqrt(col("lang_tokens").cast("double"))).over(w), 6))
          .select("lang", "lang_tokens", "weight")
          .orderBy("lang")
      },
      Some("""WITH c AS (
             |  SELECT lang,
             |    CAST(sum(len(regexp_split_to_array(trim(text), '\s+')))
             |      AS BIGINT) AS lang_tokens
             |  FROM documents GROUP BY lang)
             |SELECT lang, lang_tokens,
             |  round(sqrt(lang_tokens::DOUBLE) /
             |    sum(sqrt(lang_tokens::DOUBLE)) OVER (), 6) AS weight
             |FROM c ORDER BY lang""".stripMargin)),

    // ---- BPE tokenizer TRAINING, the distributed core: one merge round
    // counts adjacent symbol pairs over the word-frequency table (initial
    // alphabet = characters), weighted by word freq — the argmax pair is
    // the round's merge (d7 applies a tokenizer; this BUILDS one). Scale
    // shape: the word-freq agg collapses 100 TB of text to vocab size
    // BEFORE the pair explode, so the expensive fan-out runs over the
    // (bounded) vocabulary, not the corpus; top-k is TakeOrdered.
    "d17_bpe_merges" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .select(explode(tokens(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("freq"))
        .select(col("freq"), expr(
          "transform(sequence(1, length(word) - 1), " +
            "i -> concat(substring(word, i, 1), ' ', substring(word, i + 1, 1)))")
          .as("ps"))
        .filter(size(col("ps")) > 0)
        .select(col("freq"), explode(col("ps")).as("pair"))
        .groupBy("pair").agg(sum("freq").cast("long").as("n"))
        .orderBy(col("n").desc, col("pair")).limit(20),
      Some("""WITH w AS (
             |  SELECT word, count(*) AS freq FROM (
             |    SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
             |    FROM documents)
             |  GROUP BY word),
             |p AS (
             |  SELECT freq,
             |    substr(word, i, 1) || ' ' || substr(word, i + 1, 1) AS pair
             |  FROM (SELECT word, freq,
             |          unnest(generate_series(1, length(word) - 1)) AS i
             |        FROM w WHERE length(word) >= 2))
             |SELECT pair, CAST(sum(freq) AS BIGINT) AS n
             |FROM p GROUP BY pair ORDER BY n DESC, pair LIMIT 20""".stripMargin)),

    // ---- deterministic corpus shuffle: reproducible training order via a
    // seeded md5 key (epoch = seed -> a fresh permutation per epoch, no
    // rand()). The orderBy is Spark's range-partitioned total sort —
    // sample-based boundaries + per-partition sort, no single-partition
    // bottleneck at 100 TB.
    "d18_shuffle" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          md5(concat(col("doc_id").cast("string"), lit(":42")))
            .as("shuffle_key"))
        .orderBy("shuffle_key", "doc_id"),
      Some("""SELECT doc_id, md5(doc_id::VARCHAR || ':42') AS shuffle_key
             |FROM documents ORDER BY shuffle_key, doc_id""".stripMargin)),

    // ---- corpus-trained quality classifier: per-token class rates
    // (source 'src0' = reference class vs the rest), a token is
    // "good-dominant" when its good rate exceeds its bad rate — compared
    // by integer cross-multiplication, so training AND scoring are exact
    // integer arithmetic until the single final division (no float-sum
    // ordering hazards). Score = fraction of a doc's token occurrences
    // that are good-dominant. Scale shape: one groupBy(token) shuffle to
    // train, one join on token + one per-doc agg to score — all
    // map-side combinable.
    "d19_quality_classifier" -> QueryDef(
      (s, dir) => {
        val tok = t(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            explode(tokens(col("text"))).as("token"))
        val cls = tok.groupBy("token").agg(
          sum(when(col("source") === "src0", 1L).otherwise(0L)).as("n_good"),
          sum(when(col("source") =!= "src0", 1L).otherwise(0L)).as("n_bad"))
        val tot = cls.agg(sum("n_good").as("tg"), sum("n_bad").as("tb"))
        val dom = cls.crossJoin(broadcast(tot))
          .filter(col("n_good") * col("tb") > col("n_bad") * col("tg"))
          .select("token")
        tok.join(dom.withColumn("is_dom", lit(1L)), Seq("token"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            sum(coalesce(col("is_dom"), lit(0L))).as("n_good_dominant"))
          .withColumn("good_ratio",
            round(col("n_good_dominant").cast("double") / col("n_tokens"), 4))
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, source,
             |    unnest(string_split_regex(trim(text), '\s+')) AS token
             |  FROM documents),
             |cls AS (
             |  SELECT token,
             |    sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS n_good,
             |    sum(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END) AS n_bad
             |  FROM tok GROUP BY token),
             |tot AS (SELECT sum(n_good) AS tg, sum(n_bad) AS tb FROM cls),
             |dom AS (SELECT token FROM cls, tot WHERE n_good * tb > n_bad * tg)
             |SELECT t.doc_id, count(*) AS n_tokens,
             |  CAST(sum(CASE WHEN d.token IS NOT NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_good_dominant,
             |  round(sum(CASE WHEN d.token IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
             |    / count(*), 4) AS good_ratio
             |FROM tok t LEFT JOIN dom d ON d.token = t.token
             |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin)),

    // ---- cross-document boilerplate signal: per doc, the fraction of its
    // DISTINCT 3-grams that also appear in at least one other document —
    // the corpus-level companion to d15's intra-doc repetition (headers,
    // footers, licence blocks score high). One explode + one window count
    // on the shingle key (sort-based, spillable — boilerplate shingles
    // with huge df never collect into an array) + one per-doc agg.
    "d20_boilerplate" -> QueryDef(
      (s, dir) => {
        val sh = t(s, dir, "documents")
          .select(col("doc_id"), explode(
            graft.functions.SketchFunctions.wordShingles(col("text"), 3))
            .as("shingle"))
        sh.withColumn("df", count(lit(1)).over(Window.partitionBy("shingle")))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_shingles"),
            sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_shared"),
            round(sum(when(col("df") >= 2, 1L).otherwise(0L)).cast("double") /
              count(lit(1)), 4).as("shared_frac"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
             |  FROM documents),
             |idx AS (
             |  SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
             |  FROM toks WHERE len(t) >= 3),
             |sh AS (
             |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2]
             |    AS shingle FROM idx),
             |d AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle)
             |SELECT doc_id, count(*) AS n_shingles,
             |  CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_shared,
             |  round(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END)::DOUBLE
             |    / count(*), 4) AS shared_frac
             |FROM sh JOIN d USING (shingle)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- unigram-LM scoring: train token probabilities on the corpus
    // itself (one vocab agg), score each doc by its average negative log
    // likelihood — the perplexity-style quality signal (KenLM stand-in;
    // surprising/garbled docs score high, boilerplate scores low). Scale
    // shape: the vocab agg collapses the corpus to vocabulary size, the
    // score join is narrow on the token key (AQE broadcasts the
    // vocab-sized side), one per-doc agg — all map-side combinable.
    "d21_lm_score" -> QueryDef(
      (s, dir) => {
        val tok = t(s, dir, "documents")
          .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
        val freq = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
        val total = freq.agg(sum("cnt").as("n_total"))
        tok.join(freq, "token")
          .crossJoin(broadcast(total))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            round(avg(log(col("n_total").cast("double") / col("cnt"))), 4)
              .as("avg_nll"))
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    unnest(regexp_split_to_array(trim(text), '\s+')) AS token
             |  FROM documents),
             |f AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
             |tot AS (SELECT sum(cnt) AS n_total FROM f)
             |SELECT doc_id, count(*) AS n_tokens,
             |  round(avg(ln(n_total::DOUBLE / cnt)), 4) AS avg_nll
             |FROM tok JOIN f USING (token), tot
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- HELD-OUT bigram LM scoring — the KenLM/CCNet quality-filter
    // shape d21's unigram model cannot provide: unigram NLL is
    // permutation-INVARIANT (scrambled text scores identically to
    // fluent text), while a bigram model penalizes improbable token
    // TRANSITIONS. Train on the doc_id%2=0 half (held-out honesty —
    // scoring a doc with a model that memorized it flatters
    // duplicates), add-one smoothing over the train vocabulary, score
    // EVERY doc by its mean bigram NLL. Float discipline (the d33/d46
    // idiom): each term is ln of a ratio of EXACT integer counts in one
    // fixed expression shape, rounded to integer micro-nats per term,
    // then integer sum / integer count — no float ever crosses an
    // aggregation boundary, so engines agree bit-for-bit.
    //
    // 100 TB: two train-side count aggs (bigram- and prefix-keyed, both
    // map-side combinable, outputs vocabulary-sized); the score path
    // shuffles once per join key with AQE broadcasting the
    // vocab-bounded sides and skew-splitting stopword-bigram fan-in;
    // one per-doc agg. Scan-bound like every quality gate.
    "d54_bigram_lm" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        def bigrams(d: org.apache.spark.sql.DataFrame) = d
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .select(col("doc_id"), explode(expr(
            """CASE WHEN size(toks) >= 2 THEN
              |  transform(sequence(0, size(toks) - 2),
              |    i -> struct(toks[i] AS w1, toks[i + 1] AS w2))
              |ELSE array() END""".stripMargin)).as("bg"))
          .select(col("doc_id"), col("bg.w1").as("w1"),
            col("bg.w2").as("w2"))
        val train = docs.filter(col("doc_id") % 2 === 0)
        // tb feeds both count aggs — materialize once (x61 discipline)
        val tb = bigrams(train).localCheckpoint()
        val c2 = tb.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
        val c1 = tb.groupBy("w1").agg(count(lit(1)).as("c1"))
        val v = train
          .select(explode(tokens(col("text"))).as("token"))
          .agg(countDistinct("token").as("v"))
        val scored = bigrams(docs)
          .join(c2, Seq("w1", "w2"), "left")
          .join(c1, Seq("w1"), "left")
          .crossJoin(broadcast(v))
          .select(col("doc_id"),
            round(log((coalesce(col("c1"), lit(0L)) + col("v"))
                .cast("double") /
              (coalesce(col("c2"), lit(0L)) + lit(1)).cast("double"))
              * 1e6).cast("long").as("nll_micro"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"),
            // integer `div`, matching DuckDB's `//` exactly — not
            // double division + cast, which only coincides while terms
            // stay nonnegative and sums stay under 2^53
            expr("sum(nll_micro) div count(1)").as("avg_nll_micro"))
        docs.select("doc_id").join(scored, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
            coalesce(col("avg_nll_micro"), lit(0L)).as("avg_nll_micro"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    regexp_split_to_array(trim(text), '\s+') AS tk
             |  FROM documents),
             |bg AS (
             |  SELECT doc_id, tk[i + 1] AS w1, tk[i + 2] AS w2
             |  FROM toks, unnest(range(len(tk) - 1)) AS g(i)
             |  WHERE len(tk) >= 2),
             |tb AS (SELECT * FROM bg WHERE doc_id % 2 = 0),
             |c2 AS (SELECT w1, w2, count(*) AS c2 FROM tb GROUP BY 1, 2),
             |c1 AS (SELECT w1, count(*) AS c1 FROM tb GROUP BY 1),
             |v AS (
             |  SELECT count(DISTINCT tok) AS v FROM (
             |    SELECT unnest(tk) AS tok FROM toks WHERE doc_id % 2 = 0)),
             |terms AS (
             |  SELECT bg.doc_id,
             |    CAST(round(ln(
             |      CAST(coalesce(c1.c1, 0) + v.v AS DOUBLE)
             |      / CAST(coalesce(c2.c2, 0) + 1 AS DOUBLE)) * 1e6)
             |      AS BIGINT) AS nll_micro
             |  FROM bg
             |  LEFT JOIN c2 ON bg.w1 = c2.w1 AND bg.w2 = c2.w2
             |  LEFT JOIN c1 ON bg.w1 = c1.w1
             |  CROSS JOIN v),
             |agg AS (
             |  SELECT doc_id, count(*) AS n_bigrams,
             |    CAST(sum(nll_micro) // count(*) AS BIGINT)
             |      AS avg_nll_micro
             |  FROM terms GROUP BY doc_id)
             |SELECT d.doc_id,
             |  CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
             |  CAST(coalesce(avg_nll_micro, 0) AS BIGINT)
             |    AS avg_nll_micro
             |FROM documents d LEFT JOIN agg USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin)),

    // ---- WITHIN-doc repetition (Gopher §A1.2 / RefinedWeb
    // dup_ngram_frac): the fraction of a document's tokens covered by
    // 3-grams that repeat INSIDE the same document — the "model output
    // loop" / template-spam signal that neither the cross-doc span
    // dedup (d39/d45) nor the per-doc length rules (d23) can see.
    // Coverage is the UNION of the repeated windows' token positions
    // (overlapping repeats must not double-count), reported in exact
    // ppm via integer floor division. All grouping is doc-keyed — at
    // 100 TB this is a narrow scan + per-doc hash aggs with
    // document-bounded state, no corpus-sized key ever shuffles.
    "d55_repetition" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val base = docs
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .select(col("doc_id"), size(col("toks")).as("n_tokens"),
            col("toks"))
        val grams = base
          .select(col("doc_id"), col("n_tokens"), explode(expr(
            """CASE WHEN size(toks) >= 3 THEN
              |  transform(sequence(0, size(toks) - 3),
              |    i -> struct(i AS i,
              |      concat_ws(' ', slice(toks, i + 1, 3)) AS g))
              |ELSE array() END""".stripMargin)).as("w"))
          .select(col("doc_id"), col("n_tokens"),
            col("w.i").as("i"), col("w.g").as("g"))
        val dup = grams
          .withColumn("cnt", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("doc_id", "g")))
          .filter(col("cnt") >= 2)
        val covered = dup
          .select(col("doc_id"),
            explode(expr("sequence(i, i + 2)")).as("p"))
          .groupBy("doc_id")
          .agg(countDistinct("p").as("covered"))
        base.select("doc_id", "n_tokens")
          .join(covered, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
            coalesce(col("covered"), lit(0L)).as("covered"),
            expr("CAST(coalesce(covered, 0) * 1000000 DIV n_tokens " +
              "AS BIGINT)").as("rep_ppm"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    regexp_split_to_array(trim(text), '\s+') AS tk
             |  FROM documents),
             |base AS (SELECT doc_id, len(tk) AS n_tokens, tk FROM toks),
             |grams AS (
             |  SELECT doc_id, i,
             |    array_to_string(list_slice(tk, i + 1, i + 3), ' ') AS g
             |  FROM base, unnest(range(len(tk) - 2)) AS u(i)
             |  WHERE len(tk) >= 3),
             |dup AS (
             |  SELECT doc_id, i FROM (
             |    SELECT doc_id, i,
             |      count(*) OVER (PARTITION BY doc_id, g) AS cnt
             |    FROM grams) WHERE cnt >= 2),
             |cov AS (
             |  SELECT doc_id, count(DISTINCT p) AS covered FROM (
             |    SELECT doc_id, unnest(range(i, i + 3)) AS p FROM dup)
             |  GROUP BY doc_id)
             |SELECT b.doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
             |  CAST(coalesce(covered, 0) AS BIGINT) AS covered,
             |  CAST(coalesce(covered, 0) * 1000000 // n_tokens AS BIGINT)
             |    AS rep_ppm
             |FROM base b LEFT JOIN cov USING (doc_id)
             |ORDER BY b.doc_id""".stripMargin)),

    // ---- Gopher-style quality rules (Rae et al. 2021 §A1.1 shape): a
    // composite of cheap per-doc rules — token count window, mean word
    // length window, max word length cap, numeric-token ratio cap — with
    // per-rule failure accounting (the tuning view a filtering pipeline
    // monitors) and the pass count. One narrow pass + one global agg; at
    // 100 TB this is scan-bound by design.
    "d23_gopher_rules" -> QueryDef(
      (s, dir) => {
        val m = t(s, dir, "documents")
          .withColumn("toks", tokens(col("text")))
          .withColumn("n_tokens", size(col("toks")))
          .withColumn("mean_wl",
            aggregate(col("toks"), lit(0L), (a, w) => a + length(w))
              .cast("double") / col("n_tokens"))
          .withColumn("max_wl",
            array_max(transform(col("toks"), w => length(w))))
          .withColumn("num_ratio",
            size(filter(col("toks"), w => w.rlike("^[0-9]+$")))
              .cast("double") / col("n_tokens"))
        m.agg(
          count(lit(1)).as("n_docs"),
          sum(when(!col("n_tokens").between(30, 10000), 1L).otherwise(0L))
            .as("fail_tokens"),
          sum(when(!col("mean_wl").between(3.0, 4.5), 1L).otherwise(0L))
            .as("fail_mean_wl"),
          sum(when(col("max_wl") > 7, 1L).otherwise(0L)).as("fail_max_wl"),
          sum(when(col("num_ratio") > 0.2, 1L).otherwise(0L))
            .as("fail_num_ratio"),
          sum(when(col("n_tokens").between(30, 10000) &&
            col("mean_wl").between(3.0, 4.5) &&
            col("max_wl") <= 7 && col("num_ratio") <= 0.2, 1L)
            .otherwise(0L)).as("n_pass"))
      },
      Some("""WITH m AS (
             |  SELECT len(t) AS n_tokens,
             |    list_reduce(list_prepend(CAST(0 AS BIGINT),
             |      list_transform(t, w -> CAST(length(w) AS BIGINT))),
             |      (a, b) -> a + b)::DOUBLE / len(t) AS mean_wl,
             |    list_max(list_transform(t, w -> length(w))) AS max_wl,
             |    len(list_filter(t, w -> regexp_matches(w, '^[0-9]+$')))::DOUBLE
             |      / len(t) AS num_ratio
             |  FROM (SELECT regexp_split_to_array(trim(text), '\s+') AS t
             |        FROM documents))
             |SELECT count(*) AS n_docs,
             |  CAST(sum(CASE WHEN n_tokens NOT BETWEEN 30 AND 10000
             |    THEN 1 ELSE 0 END) AS BIGINT) AS fail_tokens,
             |  CAST(sum(CASE WHEN mean_wl NOT BETWEEN 3.0 AND 4.5
             |    THEN 1 ELSE 0 END) AS BIGINT) AS fail_mean_wl,
             |  CAST(sum(CASE WHEN max_wl > 7 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS fail_max_wl,
             |  CAST(sum(CASE WHEN num_ratio > 0.2 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS fail_num_ratio,
             |  CAST(sum(CASE WHEN n_tokens BETWEEN 30 AND 10000
             |    AND mean_wl BETWEEN 3.0 AND 4.5
             |    AND max_wl <= 7 AND num_ratio <= 0.2
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
             |FROM m""".stripMargin)),

    // ---- normalization-aware exact dedup: lowercase, strip punctuation,
    // collapse whitespace, THEN hash — catches trivially-reformatted
    // copies the raw-md5 pass (d1) misses (case changes, punctuation-only
    // edits, double spaces). Same one-shuffle shape as d1 on the
    // normalized 128-bit key.
    "d24_normalized_dedup" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .withColumn("norm", regexp_replace(regexp_replace(
          lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
        .groupBy(md5(col("norm")).as("h"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("keep_id"),
      Some("""SELECT md5(norm) AS h, min(doc_id) AS keep_id,
             |  count(*) AS n_copies
             |FROM (SELECT doc_id, regexp_replace(regexp_replace(
             |    lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g') AS norm
             |  FROM documents)
             |GROUP BY md5(norm) ORDER BY keep_id""".stripMargin)),

    // ---- per-source representative selection (URL-dedup keep-best
    // policy): one doc per source, keeping the longest (ties to smallest
    // doc_id) — the argmax-per-group pattern a crawl pipeline runs on URL
    // or domain keys. One window shuffle on the group key.
    "d22_keep_best" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("source")
          .orderBy(col("n_chars").desc, col("doc_id"))
        t(s, dir, "documents")
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select("source", "doc_id", "n_chars", "lang")
          .orderBy("source")
      },
      Some("""SELECT source, doc_id, n_chars, lang FROM (
             |  SELECT source, doc_id, n_chars, lang,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY n_chars DESC, doc_id) AS rk
             |  FROM documents)
             |WHERE rk = 1 ORDER BY source""".stripMargin)),

    // ---- segment-level dedup STRIP (CCNet-style paragraph dedup over
    // delimiter-free text): cut each doc into non-overlapping 8-token
    // segments, drop every segment whose exact text occurs in more than
    // one place in the corpus, reassemble the survivors in order. This is
    // the ACTION companion to d20's boilerplate *fraction* — shared
    // headers/footers/licence blocks vanish from the rebuilt text.
    // Scale shape: the explode is per-SEGMENT (8x fewer rows than
    // per-token), the df count is one window on the segment key (uniform
    // 128-bit-ish distribution — no skew), the rebuild is one per-doc
    // agg; md5 of the rebuilt text keeps the gate row narrow.
    "d25_segment_strip" -> QueryDef(
      (s, dir) => {
        val seg = 8
        val docs = t(s, dir, "documents")
          .withColumn("t", tokens(col("text")))
          .withColumn("n_segs",
            ceil(size(col("t")) / lit(seg.toDouble)).cast("long"))
        val segs = docs
          .select(col("doc_id"), col("n_segs"), posexplode(
            transform(sequence(lit(0), col("n_segs").cast("int") - 1),
              i => array_join(
                slice(col("t"), i * seg + 1, lit(seg)), " "))))
          .withColumnRenamed("pos", "s")
          .withColumnRenamed("col", "seg_text")
        val kept = segs
          .withColumn("df",
            count(lit(1)).over(Window.partitionBy("seg_text")))
          .filter(col("df") === 1)
        val rebuilt = kept.groupBy("doc_id")
          .agg(count(lit(1)).as("n_kept"),
            md5(array_join(transform(
              array_sort(collect_list(struct(col("s"), col("seg_text")))),
              x => x.getField("seg_text")), " ")).as("new_md5"))
        docs.select("doc_id", "n_segs")
          .join(rebuilt, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_segs"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"),
            coalesce(col("new_md5"), lit(md5Empty)).as("new_md5"))
          .orderBy("doc_id")
      },
      Some(s"""WITH toks AS (
              |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
              |  FROM documents),
              |segs AS (
              |  SELECT doc_id, s,
              |    array_to_string(list_slice(t, s * 8 + 1, s * 8 + 8), ' ')
              |      AS seg_text
              |  FROM toks, unnest(generate_series(0,
              |    CAST(ceil(len(t) / 8.0) AS INT) - 1)) AS g(s)),
              |d AS (SELECT seg_text, count(*) AS df FROM segs
              |      GROUP BY seg_text),
              |kept AS (
              |  SELECT doc_id, s, seg_text FROM segs JOIN d USING (seg_text)
              |  WHERE df = 1),
              |rebuilt AS (
              |  SELECT doc_id, count(*) AS n_kept,
              |    md5(string_agg(seg_text, ' ' ORDER BY s)) AS new_md5
              |  FROM kept GROUP BY doc_id)
              |SELECT t.doc_id, CAST(ceil(len(t.t) / 8.0) AS BIGINT) AS n_segs,
              |  CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
              |  coalesce(r.new_md5, md5('')) AS new_md5
              |FROM toks t LEFT JOIN rebuilt r USING (doc_id)
              |ORDER BY doc_id""".stripMargin)),

    // ---- heavy hitters, sketch-then-recount: a Misra–Gries(k=256)
    // candidate pass (custom TypedImperativeAggregate — the shuffle moves
    // at most k counters per map partition, never the token stream), then
    // an exact recount of the candidate set, then the threshold filter
    // count*257 > N. By the MG guarantee every token above N/257 IS a
    // candidate, so the output equals the full groupBy the oracle runs —
    // sketch equivalence proven at the gate, not assumed.
    // On 100 TB: the full-vocabulary groupBy shuffles billions of distinct
    // keys; this shape shuffles 256 counters per partition + the recount
    // of ~dozens of hot tokens (map-side filtered before the shuffle).
    "d26_heavy_hitters" -> QueryDef(
      (s, dir) => {
        val k = 256
        val toks = t(s, dir, "documents")
          .select(explode(tokens(col("text"))).as("token"))
        val Array(row) = toks
          .agg(count(lit(1)).as("n"),
            graft.functions.AggFunctions.misraGries(col("token"), k)
              .as("cands"))
          .collect()
        val n = row.getLong(0)
        val cands = row.getSeq[String](1)
        toks.filter(col("token").isin(cands: _*))
          .groupBy("token").agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") * (k + 1) > n)
          .orderBy(col("cnt").desc, col("token"))
      },
      Some("""WITH toks AS (
             |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
             |  FROM documents),
             |n AS (SELECT count(*) AS n FROM toks)
             |SELECT token, count(*) AS cnt
             |FROM toks GROUP BY token
             |HAVING count(*) * 257 > (SELECT n FROM n)
             |ORDER BY cnt DESC, token""".stripMargin)),

    // ---- RAG chunking: overlapping token windows (size 64, stride 32)
    // per document — the retrieval-index preparation step. Pure integer
    // window math: chunk c covers tokens [c*32+1, c*32+64]; the last
    // chunk starts before n_tokens. One narrow per-chunk explode, no
    // shuffle at all until the gate's ORDER BY — at scale this writes
    // straight to the chunk store partitioned by doc hash.
    "d27_chunks" -> QueryDef(
      (s, dir) => {
        val (size_, stride) = (64, 32)
        t(s, dir, "documents")
          .withColumn("t", tokens(col("text")))
          .withColumn("n_chunks",
            ceil(size(col("t")) / lit(stride.toDouble)).cast("int"))
          .select(col("doc_id"), posexplode(
            transform(sequence(lit(0), col("n_chunks") - 1),
              c => slice(col("t"), c * stride + 1, lit(size_)))))
          .withColumnRenamed("pos", "chunk_id")
          .filter(size(col("col")) > 0)
          .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
            size(col("col")).cast("long").as("n_tokens"),
            md5(array_join(col("col"), " ")).as("chunk_md5"))
          .orderBy("doc_id", "chunk_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
             |  FROM documents),
             |ch AS (
             |  SELECT doc_id, c AS chunk_id,
             |    list_slice(t, c * 32 + 1, c * 32 + 64) AS w
             |  FROM toks, unnest(generate_series(0,
             |    CAST(ceil(len(t) / 32.0) AS INT) - 1)) AS g(c))
             |SELECT doc_id, chunk_id, CAST(len(w) AS BIGINT) AS n_tokens,
             |  md5(array_to_string(w, ' ')) AS chunk_md5
             |FROM ch WHERE len(w) > 0
             |ORDER BY doc_id, chunk_id""".stripMargin)),

    // ---- fill-in-middle transformation (Bavarian et al. 2022): split
    // each doc at the 1/3 and 2/3 token marks and re-emit in PSM order
    // (prefix, suffix, middle) with sentinel tokens — the document-level
    // rewrite an infilling-capable code/text model trains on. Pure
    // integer slice math + string assembly: a narrow map, no shuffle
    // (the gate's ORDER BY aside); at 100 TB this pipelines straight
    // into the pack stage.
    "d28_fim" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .withColumn("t", tokens(col("text")))
        .withColumn("n", size(col("t")))
        .withColumn("c1", (col("n") / 3).cast("int"))
        .withColumn("c2", (col("n") * 2 / 3).cast("int"))
        .select(col("doc_id"),
          col("c1").cast("long").as("n_prefix"),
          (col("c2") - col("c1")).cast("long").as("n_middle"),
          (col("n") - col("c2")).cast("long").as("n_suffix"),
          md5(concat_ws(" ",
            array_join(slice(col("t"), lit(1), col("c1")), " "),
            lit("<FIM_SUF>"),
            array_join(slice(col("t"), col("c2") + 1, col("n") - col("c2")), " "),
            lit("<FIM_MID>"),
            array_join(slice(col("t"), col("c1") + 1, col("c2") - col("c1")), " ")))
            .as("fim_md5"))
        .orderBy("doc_id"),
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t,
             |    len(string_split_regex(trim(text), '\s+')) AS n
             |  FROM documents),
             |cuts AS (
             |  SELECT doc_id, t, n, n // 3 AS c1, (n * 2) // 3 AS c2
             |  FROM toks)
             |SELECT doc_id,
             |  CAST(c1 AS BIGINT) AS n_prefix,
             |  CAST(c2 - c1 AS BIGINT) AS n_middle,
             |  CAST(n - c2 AS BIGINT) AS n_suffix,
             |  md5(concat_ws(' ',
             |    array_to_string(list_slice(t, 1, c1), ' '),
             |    '<FIM_SUF>',
             |    array_to_string(list_slice(t, c2 + 1, n), ' '),
             |    '<FIM_MID>',
             |    array_to_string(list_slice(t, c1 + 1, c2), ' '))) AS fim_md5
             |FROM cuts ORDER BY doc_id""".stripMargin)),

    // ---- temperature-balanced language mixture (the XLM-R/mT5 α-scaled
    // sampling rule): raw language shares p_i are flattened to
    // q_i ∝ p_i^α (α = 0.3) — low-resource languages are upsampled,
    // high-resource downsampled; expected per-lang draws under a 100k
    // budget fall out. One tiny agg (languages, not docs); the pow/ln
    // parity follows the d10/d21 discipline (both engines correctly-
    // rounded IEEE, outputs rounded to 4).
    "d29_temperature_mix" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val byLang = docs.groupBy("lang").agg(count(lit(1)).as("n"))
        val withP = byLang
          .crossJoin(broadcast(docs.agg(count(lit(1)).as("total"))))
          .withColumn("p", col("n").cast("double") / col("total"))
          .withColumn("q_raw", pow(col("p"), lit(0.3)))
        withP
          .crossJoin(broadcast(
            withP.agg(sum(col("q_raw")).as("z"))))
          .select(col("lang"), col("n"),
            round(col("p"), 4).as("p"),
            round(col("q_raw") / col("z"), 4).as("q"),
            round(col("q_raw") / col("z") * 100000).cast("long")
              .as("expected_draws"))
          .orderBy("lang")
      },
      Some("""WITH b AS (SELECT lang, count(*) AS n FROM documents
             |           GROUP BY lang),
             |t AS (SELECT count(*) AS total FROM documents),
             |w AS (SELECT lang, n, n::DOUBLE / total AS p,
             |        pow(n::DOUBLE / total, 0.3) AS q_raw
             |      FROM b, t),
             |z AS (SELECT sum(q_raw) AS z FROM w)
             |SELECT lang, n, round(p, 4) AS p,
             |  round(q_raw / z, 4) AS q,
             |  CAST(round(q_raw / z * 100000) AS BIGINT) AS expected_draws
             |FROM w, z ORDER BY lang""".stripMargin)),

    // ---- multi-phrase scan (policy/PII/keyword audit): per-phrase
    // document hits and total occurrence counts in ONE corpus pass —
    // occurrences via the length-difference identity, so both engines
    // count with exact integer math. The phrase list is a literal
    // (broadcast-sized); at 100 TB this is a single scan with K
    // contains() predicates fused into the same codegen stage.
    "d30_phrase_scan" -> QueryDef(
      (s, dir) => {
        // phrases are plain words — no regex metacharacters to escape
        val phrases = Seq("hash join", "merge sort", "window agg")
        t(s, dir, "documents")
          .select(col("text"), explode(typedLit(phrases)).as("phrase"))
          .select(col("phrase"),
            when(col("text").contains(col("phrase")), 1L).otherwise(0L)
              .as("hit"),
            ((length(col("text")) -
              length(regexp_replace(col("text"), col("phrase"), lit("")))) /
              length(col("phrase"))).cast("long").as("occ"))
          .groupBy("phrase")
          .agg(sum(col("hit")).as("n_docs"), sum(col("occ")).as("total_hits"))
          .orderBy("phrase")
      },
      Some("""WITH p AS (SELECT unnest(['hash join', 'merge sort',
             |    'window agg']) AS phrase)
             |SELECT phrase,
             |  CAST(sum(CASE WHEN contains(text, phrase) THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_docs,
             |  CAST(sum((len(text) - len(replace(text, phrase, '')))
             |    // len(phrase)) AS BIGINT) AS total_hits
             |FROM documents, p GROUP BY phrase ORDER BY phrase""".stripMargin)),

    // ---- column profiler (the ingest-validation step): per-column row/
    // null/distinct counts and min/max, computed in ONE pass by
    // unpivoting the columns into (col_name, value) rows — the profile
    // of a 1000-column table is still one scan + one agg keyed on
    // col_name (wide per-column agg chains hit codegen limits instead).
    // String min/max compare bytewise identically in both engines.
    "d31_profile" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .select(expr(
          "stack(3, 'lang', lang, 'source', source, 'text', text) " +
            "AS (col_name, value)"))
        .groupBy("col_name")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null"),
          countDistinct(col("value")).as("n_distinct"),
          min(col("value")).as("min_val"),
          max(col("value")).as("max_val"))
        .orderBy("col_name"),
      Some("""WITH u AS (
             |  SELECT 'lang' AS col_name, lang AS value FROM documents
             |  UNION ALL SELECT 'source', source FROM documents
             |  UNION ALL SELECT 'text', text FROM documents)
             |SELECT col_name, count(*) AS n_rows,
             |  CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_null,
             |  CAST(count(DISTINCT value) AS BIGINT) AS n_distinct,
             |  min(value) AS min_val, max(value) AS max_val
             |FROM u GROUP BY col_name ORDER BY col_name""".stripMargin)),

    // ---- CCNet-style LM-score tertiles (Wenzek et al. 2020): rank every
    // doc by its unigram-LM score (d21's signal) and cut the corpus into
    // head/middle/tail thirds — the quality-tier assignment CCNet uses to
    // keep head+middle and drop tail. Bucketing runs on the ROUNDED score
    // (cross-engine tie discipline) through Ranking.globalNtile — the
    // two-phase global ntile, never a single-partition sort.
    "d32_lm_tertiles" -> QueryDef(
      (s, dir) => {
        val tok = t(s, dir, "documents")
          .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
        val freq = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
        val total = freq.agg(sum("cnt").as("n_total"))
        val scored = tok.join(freq, "token")
          .crossJoin(broadcast(total))
          .groupBy("doc_id")
          .agg(round(avg(log(col("n_total").cast("double") / col("cnt"))), 4)
            .as("avg_nll"))
        graft.operators.Ranking
          .globalNtile(scored, Seq(col("avg_nll"), col("doc_id")), 3, "tier")
          .groupBy("tier")
          .agg(count(lit(1)).as("n_docs"),
            round(avg("avg_nll"), 4).as("mean_nll"),
            round(min("avg_nll"), 4).as("min_nll"),
            round(max("avg_nll"), 4).as("max_nll"))
          .orderBy("tier")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    unnest(regexp_split_to_array(trim(text), '\s+')) AS token
             |  FROM documents),
             |f AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
             |tot AS (SELECT sum(cnt) AS n_total FROM f),
             |scored AS (
             |  SELECT doc_id, round(avg(ln(n_total::DOUBLE / cnt)), 4)
             |    AS avg_nll
             |  FROM tok JOIN f USING (token), tot GROUP BY doc_id),
             |tiers AS (
             |  SELECT avg_nll, CAST(ntile(3) OVER (ORDER BY avg_nll, doc_id)
             |    AS BIGINT) AS tier
             |  FROM scored)
             |SELECT tier, count(*) AS n_docs,
             |  round(avg(avg_nll), 4) AS mean_nll,
             |  round(min(avg_nll), 4) AS min_nll,
             |  round(max(avg_nll), 4) AS max_nll
             |FROM tiers GROUP BY tier ORDER BY tier""".stripMargin)),

    // ---- DSIR importance weights (Xie et al. 2023, "Data Selection via
    // Importance Resampling"): score every raw doc by how target-like its
    // hashed-n-gram distribution is. Features are words hashed into 64
    // buckets (arithmetic char hash, identical in both engines); the
    // importance weight of a doc is sum over tokens of
    // log p_target(bucket) - log p_raw(bucket), Laplace-smoothed.
    // Per-token log-ratios are quantized to integer MICROS before the
    // per-doc sum, so the result is exact-integer and immune to addition
    // order — the float-parity discipline from SCALE.md. At 100 TB: the
    // bucket table is 64 rows (broadcast); scoring is one scan + one
    // hash-agg on doc_id; the two distribution passes are map-side
    // partial counts into 64 cells.
    "d33_dsir_weights" -> QueryDef(
      (s, dir) => {
        val nBuckets = 64
        val tok2 = t(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            explode(split(col("text"), " ")).as("w"))
          .filter(col("w") =!= "")
          .withColumn("b", (length(col("w")) * 37
            + ascii(substring(col("w"), 1, 1)) * 31
            + ascii(substring(col("w"), -1, 1))) % nBuckets)
        val tgt = tok2.filter(col("lang") === "en")
          .groupBy("b").agg(count(lit(1)).cast("double").as("ct"))
        val raw = tok2.groupBy("b")
          .agg(count(lit(1)).cast("double").as("cr"))
        val tot = raw.agg(sum("cr").as("nr"))
          .crossJoin(tgt.agg(sum("ct").as("nt")))
        val lr = raw.join(tgt, Seq("b"), "left")
          .crossJoin(broadcast(tot))
          .select(col("b"),
            round((log((coalesce(col("ct"), lit(0.0)) + lit(1))
              / (col("nt") + lit(nBuckets)))
              - log((col("cr") + lit(1)) / (col("nr") + lit(nBuckets))))
              * 1e6).cast("long").as("lrm"))
        tok2.join(broadcast(lr), Seq("b"))
          .groupBy("doc_id")
          .agg(sum("lrm").as("logw_micro"))
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
             |  FROM documents),
             |tok2 AS (
             |  SELECT doc_id, lang,
             |    (length(w) * 37 + ascii(substr(w, 1, 1)) * 31
             |      + ascii(substr(w, -1, 1))) % 64 AS b
             |  FROM tok WHERE w <> ''),
             |tgt AS (SELECT b, count(*)::DOUBLE AS c FROM tok2
             |  WHERE lang = 'en' GROUP BY b),
             |rawc AS (SELECT b, count(*)::DOUBLE AS c FROM tok2 GROUP BY b),
             |tot AS (SELECT (SELECT sum(c) FROM tgt) AS nt,
             |  (SELECT sum(c) FROM rawc) AS nr),
             |lr AS (
             |  SELECT rawc.b,
             |    CAST(round((ln((coalesce(tgt.c, 0) + 1) / (tot.nt + 64))
             |      - ln((rawc.c + 1) / (tot.nr + 64))) * 1e6) AS BIGINT)
             |      AS lrm
             |  FROM rawc LEFT JOIN tgt ON rawc.b = tgt.b CROSS JOIN tot)
             |SELECT doc_id, CAST(sum(lrm) AS BIGINT) AS logw_micro
             |FROM tok2 JOIN lr ON tok2.b = lr.b
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // URL canonicalization dedup — the first dedup pass every web-corpus
    // pipeline runs (CCNet/RefinedWeb dedupe by canonical URL before any
    // content hashing): lowercase, strip query string + fragment, strip
    // a trailing slash, then group. URLs are synthesized
    // deterministically from (source, doc_id) — mixed case hosts, utm
    // tracking params on every 3rd doc, fragments on every 5th — so the
    // canonicalizer provably collapses real variation (500 raw URLs →
    // fewer canonical groups). Narrow per-row regex kernel + ONE
    // group-by on the canonical key; at 100 TB this is the cheapest
    // dedup stage and runs first for exactly that reason.
    "d34_url_dedup" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          concat(lit("https://"), upper(col("source")),
            lit(".Example.com/docs/"), (col("doc_id") % 40).cast("string"),
            when(col("doc_id") % 2 === 0, lit("/")).otherwise(lit("")),
            when(col("doc_id") % 3 === 0, lit("?utm_source=feed&ref=rss"))
              .otherwise(lit("")),
            when(col("doc_id") % 5 === 0, lit("#section-2"))
              .otherwise(lit(""))).as("url"))
        .withColumn("canonical",
          regexp_replace(regexp_replace(lower(col("url")),
            "[?#].*$", ""), "/$", ""))
        .groupBy("canonical")
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))
        .orderBy("canonical"),
      Some("""WITH urls AS (
             |  SELECT doc_id,
             |    'https://' || upper(source) || '.Example.com/docs/' ||
             |    CAST(doc_id % 40 AS VARCHAR) ||
             |    CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END ||
             |    CASE WHEN doc_id % 3 = 0
             |      THEN '?utm_source=feed&ref=rss' ELSE '' END ||
             |    CASE WHEN doc_id % 5 = 0 THEN '#section-2' ELSE '' END
             |      AS url
             |  FROM documents),
             |canon AS (
             |  SELECT doc_id,
             |    regexp_replace(regexp_replace(lower(url),
             |      '[?#].*$', ''), '/$', '') AS canonical
             |  FROM urls)
             |SELECT canonical, count(*) AS n_docs, min(doc_id) AS keeper
             |FROM canon GROUP BY canonical ORDER BY canonical""".stripMargin)),

    // Token Shannon entropy per document — the information-density
    // quality signal (low entropy = repetitive/template text; the
    // complement of d15's repeated-line ratio and one of the classic
    // Gopher-family filters). Shape: one (doc, term) count agg + one
    // per-doc sum — both map-side combinable; per-doc term counts are
    // vocabulary-bounded. Floats: entropy terms are (c/n)·ln(c/n) over
    // exact integer c and n, summed per doc (≤ distinct-token terms) and
    // rounded to 4 — the d10 ln discipline.
    "d35_entropy" -> QueryDef(
      (s, dir) => {
        val tc = t(s, dir, "documents")
          .select(col("doc_id"),
            explode(split(trim(col("text")), "\\s+")).as("term"))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
        tc.groupBy("doc_id").agg(
          sum(col("c")).as("n_tokens"),
          round(-sum(col("c") * log(col("c").cast("double"))) /
              sum(col("c")) +
              log(sum(col("c")).cast("double")), 4)
            .as("entropy"))
          .orderBy("doc_id")
      },
      Some("""WITH tc AS (
             |  SELECT doc_id, term, count(*) AS c
             |  FROM (SELECT doc_id,
             |          unnest(string_split_regex(trim(text), '\s+')) AS term
             |        FROM documents)
             |  GROUP BY doc_id, term)
             |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
             |  round(-sum(c * ln(CAST(c AS DOUBLE))) / sum(c)
             |    + ln(CAST(sum(c) AS DOUBLE)), 4) AS entropy
             |FROM tc GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Bigram PMI collocations (count >= 5, top 30) — the lexical
    // association statistic behind phrase mining / tokenizer-merge
    // candidates (complements x44's df-threshold repeated n-grams with a
    // strength ranking). Shape: bigrams build IN-ROW (x44's transform
    // pattern — no posexplode self-join), unigram + bigram count aggs
    // are map-side combinable with vocab/vocab²-bounded keyspaces, and
    // the unigram table joins back as a vocab-sized broadcast. Floats:
    // numerator/denominator each multiply out as doubles in one fixed
    // order from exact integer counts, ONE division, one ln, round 4 —
    // both engines see identical doubles.
    "d36_pmi" -> QueryDef(
      (s, dir) => {
        val tk = t(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("tk"))
        val uni = tk.select(explode(col("tk")).as("w"))
          .groupBy("w").agg(count(lit(1)).as("c"))
        val ntok = uni.agg(sum(col("c")).as("n_tok"))
        val bg = tk.filter(size(col("tk")) >= 2)
          .select(explode(expr(
            "transform(sequence(0, size(tk) - 2), " +
              "i -> struct(tk[i] AS w1, tk[i + 1] AS w2))")).as("b"))
          .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
        val nbig = bg.agg(count(lit(1)).as("n_big"))
        bg.groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
          .filter(col("c_ab") >= 5)
          .join(broadcast(uni.select(col("w").as("w1"), col("c").as("c1"))),
            "w1")
          .join(broadcast(uni.select(col("w").as("w2"), col("c").as("c2"))),
            "w2")
          .crossJoin(broadcast(ntok))
          .crossJoin(broadcast(nbig))
          .select(col("w1"), col("w2"), col("c_ab"),
            round(expr("ln((CAST(c_ab AS DOUBLE) * n_tok * n_tok) / " +
              "(CAST(n_big AS DOUBLE) * c1 * c2))"), 4).as("pmi"))
          .orderBy(desc("pmi"), col("w1"), col("w2"))
          .limit(30)
      },
      Some("""WITH tk AS (
             |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |uni AS (
             |  SELECT unnest(t) AS w FROM tk),
             |uc AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
             |ntok AS (SELECT sum(c) AS n_tok FROM uc),
             |bg AS (
             |  SELECT t[i] AS w1, t[i+1] AS w2
             |  FROM tk, LATERAL
             |    (SELECT unnest(generate_series(1, len(t) - 1)) AS i)),
             |nbig AS (SELECT count(*) AS n_big FROM bg),
             |cab AS (
             |  SELECT w1, w2, count(*) AS c_ab FROM bg GROUP BY w1, w2
             |  HAVING count(*) >= 5)
             |SELECT w1, w2, c_ab,
             |  round(ln((CAST(c_ab AS DOUBLE) * n_tok * n_tok) /
             |    (CAST(n_big AS DOUBLE) * u1.c * u2.c)), 4) AS pmi
             |FROM cab JOIN uc u1 ON u1.w = cab.w1
             |JOIN uc u2 ON u2.w = cab.w2
             |CROSS JOIN ntok CROSS JOIN nbig
             |ORDER BY pmi DESC, w1, w2 LIMIT 30""".stripMargin)),

    // Per-source quota cap (keep the 10 "best" docs per source, best =
    // longest then smallest id — deterministic) — the domain-cap
    // curation step every crawl pipeline runs so one giant domain can't
    // dominate the training mix. Shape: ONE shuffle on the source key;
    // the rank<=k filter triggers Spark's WindowGroupLimit pushdown
    // (3.5+), which partial-limits to k rows per group MAP-SIDE before
    // the exchange — the skew mitigation (one hot domain) is built into
    // the operator, no salting needed for top-k semantics.
    "d37_source_cap" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("source")
          .orderBy(desc("n_chars"), col("doc_id"))
        t(s, dir, "documents")
          .select(col("source"), col("doc_id"), col("n_chars"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 10)
          .orderBy("source", "rk")
      },
      Some("""SELECT source, doc_id, n_chars, rk FROM (
             |  SELECT source, doc_id, n_chars,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY n_chars DESC, doc_id) AS rk
             |  FROM documents)
             |WHERE rk <= 10 ORDER BY source, rk""".stripMargin)),

    // Deterministic train/val/test assignment by content-stable hash —
    // the split step every training pipeline runs, made REPRODUCIBLE
    // (re-runs, late-arriving shards, and different engines all agree)
    // by deriving the split from md5(doc_id) instead of an RNG. The
    // 90/5/5 boundaries are hex-string prefixes (0.9*65536 = 0xE666,
    // 0.95*65536 = 0xF333) compared LEXICOGRAPHICALLY — hex digits sort
    // correctly as strings, so no hex-to-int conversion is needed and
    // the same compare runs in any engine. Narrow map + one tiny agg;
    // at 100 TB the assignment is a zero-shuffle projection.
    "d38_hash_split" -> QueryDef(
      (s, dir) => {
        val h = substring(md5(col("doc_id").cast("string")
          .cast("binary")), 1, 4)
        t(s, dir, "documents")
          .select(col("doc_id"), col("n_chars"),
            when(h < "e666", "train").when(h < "f333", "val")
              .otherwise("test").as("split"))
          .groupBy("split")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).cast("long").as("sum_chars"))
          .orderBy("split")
      },
      Some("""SELECT split, count(*) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |FROM (
             |  SELECT n_chars,
             |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
             |           < 'e666' THEN 'train'
             |         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
             |           < 'f333' THEN 'val'
             |         ELSE 'test' END AS split
             |  FROM documents)
             |GROUP BY split ORDER BY split""".stripMargin)),

    // Cross-corpus duplicate-shingle fraction — the CCNet/Gopher-style
    // "how much of this document exists elsewhere" signal (d15 measures
    // repetition WITHIN a doc; this measures sharing ACROSS the corpus).
    // Docs are cut into non-overlapping 8-word shingles (full blocks
    // only; <8-word docs contribute nothing, matching the oracle's
    // empty range()); a shingle seen >=2 times corpus-wide marks its
    // occurrences duplicated. 100 TB shape: one shuffle on the shingle
    // key for the global count (map-side combined), and the postings
    // join back rides the SAME key so the exchange is reused; per-doc
    // re-agg is doc-keyed. Fraction rounds at 6 dp (the established
    // cross-engine float discipline).
    "d39_dup_shingles" -> QueryDef(
      (s, dir) => {
        val sh = t(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("words"))
          .select(col("doc_id"), explode(expr(
            "CASE WHEN size(words) >= 8 THEN " +
              "transform(sequence(0, CAST(size(words) / 8 AS INT) - 1), " +
              "i -> array_join(slice(words, i * 8 + 1, 8), ' ')) " +
              "ELSE array() END")).as("shingle"))
        val gc = sh.groupBy("shingle").agg(count(lit(1)).as("n"))
        sh.join(gc, "shingle")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_shingles"),
            sum(when(col("n") >= 2, 1).otherwise(0)).as("n_dup"))
          .select(col("doc_id"), col("n_shingles"), col("n_dup"),
            round(col("n_dup").cast("double") / col("n_shingles"), 6)
              .as("dup_frac"))
          .orderBy("doc_id")
      },
      Some("""WITH w AS (
             |  SELECT doc_id, string_split(text, ' ') AS words
             |  FROM documents),
             |sh AS (
             |  SELECT doc_id,
             |    array_to_string(list_slice(words, i*8+1, i*8+8), ' ')
             |      AS shingle
             |  FROM (SELECT doc_id, words,
             |          unnest(range(CAST(floor(len(words)/8) AS BIGINT)))
             |            AS i
             |        FROM w)),
             |gc AS (SELECT shingle, count(*) AS n FROM sh GROUP BY shingle)
             |SELECT sh.doc_id,
             |  CAST(count(*) AS BIGINT) AS n_shingles,
             |  CAST(sum(CASE WHEN gc.n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_dup,
             |  round(CAST(sum(CASE WHEN gc.n >= 2 THEN 1 ELSE 0 END)
             |      AS DOUBLE) / count(*), 6) AS dup_frac
             |FROM sh JOIN gc ON gc.shingle = sh.shingle
             |GROUP BY sh.doc_id ORDER BY sh.doc_id""".stripMargin)),

    // Vocabulary growth curve (Heaps' law) over ingestion order — how
    // fast does the corpus stop teaching new words? Docs bucket by
    // doc_id/50; the curve is cumulative distinct words and cumulative
    // tokens per bucket. Computed in the SCALABLE form: each word maps
    // to the bucket where it FIRST appears (one token-key agg), new-word
    // counts aggregate per bucket, and the cumulative sums run over the
    // BUCKET-sized frame (bounded — never a corpus-sized window). The
    // naive form — re-counting distinct words per prefix — rescans the
    // corpus once per bucket; the oracle can afford it, a 100 TB corpus
    // cannot. Type-token ratio rounds at 6 dp.
    "d41_vocab_growth" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val tok = t(s, dir, "documents")
          .select((col("doc_id") / 50).cast("long").as("bucket"),
            explode(split(trim(col("text")), "\\s+")).as("token"))
        val first = tok.groupBy("token")
          .agg(min(col("bucket")).as("fb"))
          .groupBy(col("fb").as("bucket"))
          .agg(count(lit(1)).as("new_words"))
        val counts = tok.groupBy("bucket")
          .agg(count(lit(1)).as("n_tokens"))
        val w = Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        counts.join(first, Seq("bucket"), "left")
          .select(col("bucket"), col("n_tokens"),
            coalesce(col("new_words"), lit(0L)).as("new_words"))
          .withColumn("tokens_cum", sum("n_tokens").over(w))
          .withColumn("vocab_cum", sum("new_words").over(w))
          .select(col("bucket"), col("tokens_cum"), col("vocab_cum"),
            round(col("vocab_cum").cast("double") / col("tokens_cum"), 6)
              .as("ttr"))
          .orderBy("bucket")
      },
      Some("""WITH tok AS (
             |  SELECT CAST(doc_id // 50 AS BIGINT) AS bucket,
             |    unnest(string_split_regex(trim(text), '\s+')) AS token
             |  FROM documents),
             |first AS (
             |  SELECT fb AS bucket, count(*) AS new_words FROM (
             |    SELECT token, min(bucket) AS fb FROM tok GROUP BY token)
             |  GROUP BY fb),
             |counts AS (
             |  SELECT bucket, count(*) AS n_tokens FROM tok GROUP BY bucket),
             |cum AS (
             |  SELECT counts.bucket,
             |    sum(counts.n_tokens) OVER (ORDER BY counts.bucket
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS tokens_cum,
             |    sum(coalesce(first.new_words, 0)) OVER (
             |      ORDER BY counts.bucket
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS vocab_cum
             |  FROM counts LEFT JOIN first ON first.bucket = counts.bucket)
             |SELECT bucket, CAST(tokens_cum AS BIGINT) AS tokens_cum,
             |  CAST(vocab_cum AS BIGINT) AS vocab_cum,
             |  round(CAST(vocab_cum AS DOUBLE) / tokens_cum, 6) AS ttr
             |FROM cum ORDER BY bucket""".stripMargin)),

    // Duplication rate BY SOURCE — d39's cross-corpus signal rolled up
    // to the operational question "which feed is redundant": per source,
    // doc count, mean duplicated-shingle fraction (6 dp), and how many
    // docs are FULLY duplicated elsewhere (dup_frac = 1). Same two
    // shingle-key exchanges as d39 plus one source-keyed rollup; the
    // per-doc fractions are exact integer ratios so the mean is the only
    // float (rounded, q64 discipline).
    "d42_dup_by_source" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val sh = docs
          .select(col("doc_id"), split(col("text"), " ").as("words"))
          .select(col("doc_id"), explode(expr(
            "CASE WHEN size(words) >= 8 THEN " +
              "transform(sequence(0, CAST(size(words) / 8 AS INT) - 1), " +
              "i -> array_join(slice(words, i * 8 + 1, 8), ' ')) " +
              "ELSE array() END")).as("shingle"))
        val gc = sh.groupBy("shingle").agg(count(lit(1)).as("n"))
        val perDoc = sh.join(gc, "shingle")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_sh"),
            sum(when(col("n") >= 2, 1).otherwise(0)).as("n_dup"))
        docs.select(col("doc_id"), col("source"))
          .join(perDoc, Seq("doc_id"), "left")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            round(avg(coalesce(col("n_dup"), lit(0L)).cast("double") /
              greatest(coalesce(col("n_sh"), lit(0L)), lit(1L))), 6)
              .as("mean_dup_frac"),
            sum(when(col("n_dup") === col("n_sh"), 1).otherwise(0))
              .as("n_full_dup"))
          .orderBy("source")
      },
      Some("""WITH w AS (
             |  SELECT doc_id, string_split(text, ' ') AS words
             |  FROM documents),
             |sh AS (
             |  SELECT doc_id,
             |    array_to_string(list_slice(words, i*8+1, i*8+8), ' ')
             |      AS shingle
             |  FROM (SELECT doc_id, words,
             |          unnest(range(CAST(floor(len(words)/8) AS BIGINT)))
             |            AS i
             |        FROM w)),
             |gc AS (SELECT shingle, count(*) AS n FROM sh GROUP BY shingle),
             |pd AS (
             |  SELECT sh.doc_id, count(*) AS n_sh,
             |    sum(CASE WHEN gc.n >= 2 THEN 1 ELSE 0 END) AS n_dup
             |  FROM sh JOIN gc ON gc.shingle = sh.shingle
             |  GROUP BY sh.doc_id)
             |SELECT source, count(*) AS n_docs,
             |  round(avg(CAST(coalesce(pd.n_dup, 0) AS DOUBLE) /
             |    greatest(coalesce(pd.n_sh, 0), 1)), 6) AS mean_dup_frac,
             |  CAST(sum(CASE WHEN pd.n_dup = pd.n_sh THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_full_dup
             |FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id
             |GROUP BY source ORDER BY source""".stripMargin)),

    // Deterministic fractional upsampling — materializing a
    // source-weighted epoch (the DoReMi/data-mixing step where a 2.5×
    // source repeats each doc 2 or 3 times): n_copies = floor(mult) +
    // one extra copy iff the doc's seeded md5 uniform < frac(mult), so
    // the REALIZED multiplier converges to the target without an RNG —
    // replays and both engines materialize the identical epoch. The
    // copy explode is in-row (sequence 1..n_copies); the report is one
    // source-keyed agg. Multipliers here are a literal policy table
    // (src0-lineage 2500000µ, src1 1000000µ, rest 500000µ).
    "d43_upsample" -> QueryDef(
      (s, dir) => {
        val multMicro = when(col("source") === "src0", lit(2500000L))
          .when(col("source") === "src1", lit(1000000L))
          .otherwise(lit(500000L))
        val docs = t(s, dir, "documents")
          .withColumn("mult_micro", multMicro)
          .withColumn("u_micro",
            conv(substring(md5(concat(col("doc_id").cast("string"),
              lit(":up"))), 1, 12), 16, 10).cast("long") % 1000000L)
          .withColumn("n_copies",
            expr("mult_micro div 1000000") +
              when(col("u_micro") < col("mult_micro") % 1000000L, 1L)
                .otherwise(0L))
        docs.select(col("source"), col("doc_id"),
            explode(when(col("n_copies") > 0,
              sequence(lit(1L), col("n_copies")))
              .otherwise(expr("CAST(array() AS ARRAY<BIGINT>)")))
              .as("copy_idx"))
          .groupBy("source")
          .agg(countDistinct(col("doc_id")).as("n_docs"),
            count(lit(1)).as("n_rows_out"))
          .join(docs.groupBy("source")
            .agg(count(lit(1)).as("n_docs_in")), Seq("source"), "right")
          .select(col("source"), col("n_docs_in"),
            coalesce(col("n_docs"), lit(0L)).as("n_docs_kept"),
            coalesce(col("n_rows_out"), lit(0L)).as("n_rows_out"),
            round(coalesce(col("n_rows_out"), lit(0L)).cast("double") /
              col("n_docs_in"), 6).as("realized_mult"))
          .orderBy("source")
      },
      Some("""WITH d AS (
             |  SELECT source, doc_id,
             |    CASE WHEN source = 'src0' THEN 2500000
             |         WHEN source = 'src1' THEN 1000000
             |         ELSE 500000 END AS mult_micro,
             |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':up'),
             |      1, 12))::BIGINT % 1000000 AS u_micro
             |  FROM documents),
             |c AS (
             |  SELECT source, doc_id,
             |    mult_micro // 1000000 +
             |      CASE WHEN u_micro < mult_micro % 1000000 THEN 1
             |           ELSE 0 END AS n_copies
             |  FROM d),
             |outr AS (
             |  SELECT source, doc_id FROM c,
             |    unnest(range(CAST(c.n_copies AS BIGINT))) AS t(i)),
             |agg AS (
             |  SELECT source, count(DISTINCT doc_id) AS n_docs_kept,
             |    count(*) AS n_rows_out
             |  FROM outr GROUP BY source),
             |base AS (SELECT source, count(*) AS n_docs_in
             |         FROM documents GROUP BY source)
             |SELECT base.source, base.n_docs_in,
             |  coalesce(agg.n_docs_kept, 0) AS n_docs_kept,
             |  CAST(coalesce(agg.n_rows_out, 0) AS BIGINT) AS n_rows_out,
             |  round(CAST(coalesce(agg.n_rows_out, 0) AS DOUBLE)
             |    / base.n_docs_in, 6) AS realized_mult
             |FROM base LEFT JOIN agg ON agg.source = base.source
             |ORDER BY base.source""".stripMargin)),

    // Contamination-safe split assignment — the composition every eval
    // pipeline must get right: d38's deterministic md5 split, but any
    // candidate doc sharing an 8-word shingle with the held-out
    // benchmark subset (doc_id % 20 = 0, x13's fixture) is forced into
    // 'quarantine' instead of train/val/test — benchmark leakage into
    // ANY split is a measurement bug, not just into train. Benchmark
    // shingles are eval-set-sized → the contamination probe is a
    // broadcast semi-join before the one split-keyed report agg.
    "d44_decontaminated_split" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val cand = docs.filter(col("doc_id") % 20 =!= 0)
        val benchShingles = docs.filter(col("doc_id") % 20 === 0)
          .select(explode(graft.operators.Dedup.shingles(col("text"), 8)).as("shingle"))
          .distinct()
        val dirty = cand
          .select(col("doc_id"),
            explode(graft.operators.Dedup.shingles(col("text"), 8)).as("shingle"))
          .join(broadcast(benchShingles), Seq("shingle"), "left_semi")
          .select("doc_id").distinct()
        val h = substring(md5(col("doc_id").cast("string")), 1, 4)
        cand.join(dirty.withColumn("is_dirty", lit(1)), Seq("doc_id"), "left")
          .withColumn("split",
            when(col("is_dirty") === 1, "quarantine")
              .when(h < "e666", "train")
              .when(h < "f333", "val")
              .otherwise("test"))
          .groupBy("split")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).cast("long").as("sum_chars"))
          .orderBy("split")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
             |  FROM documents),
             |idx AS (
             |  SELECT doc_id, t,
             |    unnest(generate_series(1, len(t) - 7)) AS i
             |  FROM toks WHERE len(t) >= 8),
             |sh AS (
             |  SELECT DISTINCT doc_id,
             |    t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
             |      || ' ' || t[i+4] || ' ' || t[i+5] || ' ' || t[i+6]
             |      || ' ' || t[i+7] AS shingle
             |  FROM idx),
             |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 20 = 0),
             |dirty AS (
             |  SELECT DISTINCT s.doc_id FROM sh s JOIN bench USING (shingle)
             |  WHERE s.doc_id % 20 <> 0)
             |SELECT CASE
             |    WHEN dirty.doc_id IS NOT NULL THEN 'quarantine'
             |    WHEN substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < 'e666'
             |      THEN 'train'
             |    WHEN substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < 'f333'
             |      THEN 'val'
             |    ELSE 'test' END AS split,
             |  count(*) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |FROM documents d LEFT JOIN dirty ON dirty.doc_id = d.doc_id
             |WHERE d.doc_id % 20 <> 0
             |GROUP BY split ORDER BY split""".stripMargin)),

    // Exact duplicate-span REMOVAL with text reconstruction — the
    // dedup step Lee et al.'s "Deduplicating Training Data Makes
    // Language Models Better" applies at span granularity: d39 only
    // MEASURES cross-corpus duplicate shingles; this strips every
    // repeated occurrence (keep-first by corpus order (doc_id, pos))
    // and rebuilds each document from its surviving spans, returning
    // per-doc span counts plus the md5 of the rebuilt text (proof the
    // reassembly actually ran, not just the bookkeeping). Spans are
    // d39's non-overlapping 8-word blocks; docs under 8 words have no
    // spans and rebuild to the empty string.
    //
    // 100 TB shape: first-occurrence ranking is ONE shuffle on the span
    // key (the same key d39's global count rides) with tiny per-span
    // groups (the duplication count); the rebuild is a doc-keyed agg
    // whose collect_list is bounded by document length — never a
    // corpus-sized window. At petabyte scale the span key would carry
    // a 64-bit hash instead of the span text (same plan, narrower
    // exchange); the gate keeps the text so the oracle is literal.
    "d45_span_dedup" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = t(s, dir, "documents")
        val sh = docs
          .select(col("doc_id"), split(col("text"), " ").as("words"))
          .select(col("doc_id"), posexplode(expr(
            "CASE WHEN size(words) >= 8 THEN " +
              "transform(sequence(0, CAST(size(words) / 8 AS INT) - 1), " +
              "i -> array_join(slice(words, i * 8 + 1, 8), ' ')) " +
              "ELSE array() END")))
          .withColumnRenamed("col", "span")
        val rk = sh.withColumn("rn", row_number().over(
          Window.partitionBy("span").orderBy("doc_id", "pos")))
        val agg = rk.groupBy("doc_id")
          .agg(count(lit(1)).as("n_spans"),
            sum(when(col("rn") === 1, 1L).otherwise(0L)).as("kept_spans"),
            md5(array_join(expr(
              "transform(array_sort(collect_list(" +
                "CASE WHEN rn = 1 THEN struct(pos, span) END)), " +
                "s -> s.span)"), " ")).as("text_hash"))
        docs.select("doc_id").join(agg, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_spans"), lit(0L)).as("n_spans"),
            coalesce(col("kept_spans"), lit(0L)).as("kept_spans"),
            coalesce(col("text_hash"), lit(md5Empty)).as("text_hash"))
          .orderBy("doc_id")
      },
      Some(s"""WITH w AS (
             |  SELECT doc_id, string_split(text, ' ') AS words
             |  FROM documents),
             |sh AS (
             |  SELECT doc_id, i,
             |    array_to_string(list_slice(words, i*8+1, i*8+8), ' ')
             |      AS span
             |  FROM (SELECT doc_id, words,
             |          unnest(range(CAST(floor(len(words)/8) AS BIGINT)))
             |            AS i
             |        FROM w)),
             |rk AS (
             |  SELECT doc_id, i, span,
             |    row_number() OVER (PARTITION BY span
             |      ORDER BY doc_id, i) AS rn
             |  FROM sh),
             |agg AS (
             |  SELECT doc_id,
             |    CAST(count(*) AS BIGINT) AS n_spans,
             |    CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS kept_spans,
             |    md5(string_agg(CASE WHEN rn = 1 THEN span END, ' '
             |      ORDER BY i)) AS th
             |  FROM rk GROUP BY doc_id)
             |SELECT d.doc_id,
             |  coalesce(n_spans, 0) AS n_spans,
             |  coalesce(kept_spans, 0) AS kept_spans,
             |  coalesce(th, '$md5Empty') AS text_hash
             |FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
             |ORDER BY d.doc_id""".stripMargin)),

    // Per-source distribution drift: KL(P_source || P_corpus) over the
    // unigram distributions — the one-number "how far does this source
    // sit from the mixture" diagnostic that decides reweighting/refresh
    // (the corpus-level companion of d33's per-document DSIR weights).
    // Restricted to tokens the source contains (c > 0 ⇒ corpus count
    // > 0), so no smoothing is needed and the sum is the exact KL over
    // the source's support. Float discipline (the d33 idiom): every
    // per-term contribution is computed from EXACT integer counts in one
    // fixed expression shape, quantized to integer micros, and only
    // integers aggregate — summation order cannot drift the result.
    //
    // 100 TB shape: one (source, token) agg (map-side combinable), a
    // token-keyed join against the vocab-sized corpus table, the total
    // as a 1-row broadcast cross (q23 idiom), and a sources-sized final
    // agg. Nothing scales with documents except the first token agg.
    "d46_kl_drift" -> QueryDef(
      (s, dir) => {
        val tok = t(s, dir, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("token"))
          .filter(col("token") =!= "")
        // materialized once (x61/x62 discipline): sc is vocab×sources-
        // sized and has FOUR consumers (ns, cc, n, and the term join) —
        // unmaterialized, each would re-scan the corpus token agg
        val sc = tok.groupBy("source", "token")
          .agg(count(lit(1)).as("c"))
          .localCheckpoint()
        val ns = sc.groupBy("source").agg(sum(col("c")).as("ns"))
        val cc = sc.groupBy("token").agg(sum(col("c")).as("cc"))
        val n = sc.agg(sum(col("c")).as("n"))
        sc.join(broadcast(ns), "source")
          .join(cc, "token")
          .crossJoin(broadcast(n))
          .withColumn("term_micro",
            round((col("c").cast("double") / col("ns").cast("double")) *
              log((col("c").cast("double") * col("n").cast("double")) /
                (col("ns").cast("double") * col("cc").cast("double")))
              * 1e6).cast("long"))
          .groupBy("source")
          .agg(max(col("ns")).as("n_tokens"),
            sum(col("term_micro")).as("kl_micro"))
          .orderBy("source")
      },
      Some("""WITH tok AS (
             |  SELECT source, unnest(string_split(text, ' ')) AS token
             |  FROM documents),
             |sc AS (
             |  SELECT source, token, count(*) AS c FROM tok
             |  WHERE token <> '' GROUP BY source, token),
             |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns
             |       FROM sc GROUP BY source),
             |cc AS (SELECT token, CAST(sum(c) AS BIGINT) AS cc
             |       FROM sc GROUP BY token),
             |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM sc),
             |terms AS (
             |  SELECT sc.source,
             |    CAST(round((CAST(c AS DOUBLE) / CAST(ns AS DOUBLE)) *
             |      ln((CAST(c AS DOUBLE) * CAST(n.n AS DOUBLE)) /
             |        (CAST(ns AS DOUBLE) * CAST(cc AS DOUBLE)))
             |      * 1e6) AS BIGINT) AS term_micro,
             |    ns
             |  FROM sc JOIN ns USING (source) JOIN cc USING (token), n)
             |SELECT source, max(ns) AS n_tokens,
             |  CAST(sum(term_micro) AS BIGINT) AS kl_micro
             |FROM terms GROUP BY source ORDER BY source""".stripMargin)),

    // Cross-source shingle-overlap matrix — "which ingestion sources
    // duplicate each other", the question that decides dedup ORDER and
    // source pruning before any doc-level pass is paid for. Set-level
    // Jaccard over the d39 8-word shingles: one (source, shingle)
    // distinct agg, a shingle-keyed self-join for pair intersections
    // (output bounded by sources², with #sources in the dozens at any
    // scale), integer-ppm Jaccard. Zero-overlap pairs drop out in both
    // engines (inner join). The distinct frame is checkpointed once for
    // its two consumers (per-source sizes + the self-join).
    "d47_source_overlap" -> QueryDef(
      (s, dir) => {
        val sh = t(s, dir, "documents")
          .select(col("source"), split(col("text"), " ").as("words"))
          .select(col("source"), explode(expr(
            "CASE WHEN size(words) >= 8 THEN " +
              "transform(sequence(0, CAST(size(words) / 8 AS INT) - 1), " +
              "i -> array_join(slice(words, i * 8 + 1, 8), ' ')) " +
              "ELSE array() END")).as("shingle"))
          .distinct()
          .localCheckpoint()
        val sz = sh.groupBy("source").agg(count(lit(1)).as("n_sh"))
        sh.as("a").join(sh.as("b"), "shingle")
          .filter(col("a.source") < col("b.source"))
          .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
          .agg(count(lit(1)).as("n_common"))
          .join(sz.select(col("source").as("src_a"),
            col("n_sh").as("n_a")), "src_a")
          .join(sz.select(col("source").as("src_b"),
            col("n_sh").as("n_b")), "src_b")
          .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
            col("n_common"),
            expr("CAST(n_common * 1000000 AS BIGINT) div " +
              "(n_a + n_b - n_common)").as("jaccard_ppm"))
          .orderBy("src_a", "src_b")
      },
      Some("""WITH w AS (
             |  SELECT source, string_split(text, ' ') AS words
             |  FROM documents),
             |sh0 AS (
             |  SELECT source,
             |    array_to_string(list_slice(words, i*8+1, i*8+8), ' ')
             |      AS shingle
             |  FROM (SELECT source, words,
             |          unnest(range(CAST(floor(len(words)/8) AS BIGINT)))
             |            AS i
             |        FROM w)),
             |sh AS (SELECT DISTINCT source, shingle FROM sh0),
             |sz AS (SELECT source, count(*) AS n_sh FROM sh
             |       GROUP BY source),
             |pairs AS (
             |  SELECT a.source AS src_a, b.source AS src_b,
             |    count(*) AS n_common
             |  FROM sh a JOIN sh b
             |    ON a.shingle = b.shingle AND a.source < b.source
             |  GROUP BY 1, 2)
             |SELECT src_a, src_b,
             |  CAST(sa.n_sh AS BIGINT) AS n_a,
             |  CAST(sb.n_sh AS BIGINT) AS n_b,
             |  CAST(n_common AS BIGINT) AS n_common,
             |  CAST(n_common * 1000000 // (sa.n_sh + sb.n_sh - n_common)
             |    AS BIGINT) AS jaccard_ppm
             |FROM pairs
             |JOIN sz sa ON sa.source = src_a
             |JOIN sz sb ON sb.source = src_b
             |ORDER BY src_a, src_b""".stripMargin)),

    // Deterministic HyperLogLog (m=64 registers) per source, gated
    // AGAINST the exact distinct count it estimates — the sketch that
    // replaces a billion-key distinct shuffle with 64 integers per
    // source at 100 TB. Spark's own approx_count_distinct can't be
    // oracle-gated (HLL++ internals differ per engine), so the registers
    // here are built from portable primitives: bucket = first md5 byte
    // mod 64, rho = leading-zero count of the next 48 bits + 1 (computed
    // on the hex string — no float log anywhere), register sum in
    // integer units 2^(20−r) (capped at r=20; a 1-in-2^20 truncation),
    // estimate = α·m²·2^20 div S with α_ppm = 709357 — every step
    // integer-exact in both engines, so the gate hashes the ESTIMATE
    // itself plus its error vs exact. Shape: one (source, bucket) max
    // agg with map-side partials (duplicates die in the partials — rho
    // is a max), a 64-row-per-source frame after.
    "d48_hll_distinct" -> QueryDef(
      (s, dir) => {
        val tok = t(s, dir, "documents")
          .select(col("source"),
            explode(split(trim(col("text")), "\\s+")).as("token"))
        val reg = tok
          .withColumn("h", md5(col("token")))
          .withColumn("bucket", expr(
            "CAST(conv(substring(h, 1, 2), 16, 10) AS BIGINT) % 64"))
          .withColumn("tz", expr(
            "regexp_replace(substring(h, 3, 12), '^0+', '')"))
          .withColumn("rho", expr(
            """CASE WHEN tz = '' THEN 49
              |ELSE (12 - length(tz)) * 4 +
              |  CASE WHEN substring(tz, 1, 1) = '1' THEN 3
              |       WHEN substring(tz, 1, 1) IN ('2', '3') THEN 2
              |       WHEN substring(tz, 1, 1) IN ('4', '5', '6', '7')
              |         THEN 1
              |       ELSE 0 END + 1 END""".stripMargin))
          .groupBy("source", "bucket").agg(max(col("rho")).as("r"))
        val allB = tok.select("source").distinct()
          .select(col("source"),
            explode(sequence(lit(0L), lit(63L))).as("bucket"))
        val hll = allB.join(reg, Seq("source", "bucket"), "left")
          .withColumn("unit", expr(
            "shiftleft(CAST(1 AS BIGINT), " +
              "greatest(20 - coalesce(r, 0), 0))"))
          .groupBy("source").agg(sum(col("unit")).as("hll_sum"),
            sum(when(col("r").isNull, 1L).otherwise(0L)).as("v_empty"))
        val exact = tok.groupBy("source")
          .agg(countDistinct(col("token")).as("n_exact"))
        // small-range branch (raw < 2.5m with empty buckets): linear
        // counting m·ln(m/V) via the SHARED literal table — hllLnTable
        // feeds both this expr and the SQL string, so parity is by
        // construction, with no runtime float log in either engine
        val lnArr = hllLnTable.mkString("array(", ", ", ")")
        exact.join(hll, "source")
          .withColumn("raw_est", expr(
            "CAST(709357 AS BIGINT) * 4096 * 1048576 " +
              "div hll_sum div 1000000"))
          .withColumn("hll_est", expr(
            "CASE WHEN raw_est < 160 AND v_empty > 0 THEN " +
              s"64 * element_at($lnArr, CAST(v_empty AS INT)) " +
              "div 1000000 ELSE raw_est END"))
          .drop("raw_est")
          .withColumn("err_ppm", expr(
            "abs(hll_est - n_exact) * 1000000 div n_exact"))
          .orderBy("source")
      },
      Some("""WITH tok AS (
             |  SELECT source,
             |    unnest(regexp_split_to_array(trim(text), '\s+')) AS token
             |  FROM documents),
             |reg AS (
             |  SELECT source, bucket, max(rho) AS r FROM (
             |    SELECT source,
             |      (16 * (strpos('0123456789abcdef', substr(h, 1, 1)) - 1)
             |       + strpos('0123456789abcdef', substr(h, 2, 1)) - 1)
             |        % 64 AS bucket,
             |      CASE WHEN tz = '' THEN 49
             |      ELSE (12 - len(tz)) * 4 +
             |        CASE WHEN substr(tz, 1, 1) = '1' THEN 3
             |             WHEN substr(tz, 1, 1) IN ('2', '3') THEN 2
             |             WHEN substr(tz, 1, 1) IN ('4', '5', '6', '7')
             |               THEN 1
             |             ELSE 0 END + 1 END AS rho
             |    FROM (SELECT source, h,
             |            regexp_replace(substr(h, 3, 12), '^0+', '') AS tz
             |          FROM (SELECT source, md5(token) AS h FROM tok)))
             |  GROUP BY source, bucket),
             |allb AS (
             |  SELECT DISTINCT source, b.bucket
             |  FROM tok, (SELECT unnest(range(64)) AS bucket) b),
             |hll AS (
             |  SELECT allb.source,
             |    CAST(sum(1::BIGINT <<
             |      greatest(20 - coalesce(r, 0), 0)) AS BIGINT) AS hll_sum,
             |    CAST(sum(CASE WHEN r IS NULL THEN 1 ELSE 0 END)
             |      AS BIGINT) AS v_empty
             |  FROM allb LEFT JOIN reg
             |    ON reg.source = allb.source AND reg.bucket = allb.bucket
             |  GROUP BY allb.source),
             |exact AS (
             |  SELECT source, count(DISTINCT token) AS n_exact FROM tok
             |  GROUP BY source),
             |raw AS (
             |  SELECT exact.source, n_exact, hll_sum, v_empty,
             |    709357::BIGINT * 4096 * 1048576
             |      // hll_sum // 1000000 AS raw_est
             |  FROM exact JOIN hll ON hll.source = exact.source),
             |est AS (
             |  SELECT source, n_exact, hll_sum, v_empty,
             |    CASE WHEN raw_est < 160 AND v_empty > 0 THEN
             |      64 * ([__LNT__])[CAST(v_empty AS INT)] // 1000000
             |    ELSE raw_est END AS hll_est
             |  FROM raw)
             |SELECT source, CAST(n_exact AS BIGINT) AS n_exact,
             |  hll_sum, v_empty, CAST(hll_est AS BIGINT) AS hll_est,
             |  CAST(abs(hll_est - n_exact) * 1000000 // n_exact
             |    AS BIGINT) AS err_ppm
             |FROM est ORDER BY source""".stripMargin
        .replace("__LNT__", hllLnTable.mkString(", ")))),

    // HLL MERGE — the property that makes the d48 sketch matter at
    // 100 TB: per-source registers union by bucket-wise max (64 ints per
    // source travel, never token streams), and the merged estimate is
    // gated against the exact corpus-wide distinct. Also emits the sum
    // of per-source exact counts: sum >> union is the cross-source
    // duplication signal d47 details pairwise. Same integer discipline
    // and shared ln-table as d48.
    "d49_hll_union" -> QueryDef(
      (s, dir) => {
        val tok = t(s, dir, "documents")
          .select(col("source"),
            explode(split(trim(col("text")), "\\s+")).as("token"))
        val reg = tok
          .withColumn("h", md5(col("token")))
          .withColumn("bucket", expr(
            "CAST(conv(substring(h, 1, 2), 16, 10) AS BIGINT) % 64"))
          .withColumn("tz", expr(
            "regexp_replace(substring(h, 3, 12), '^0+', '')"))
          .withColumn("rho", expr(
            """CASE WHEN tz = '' THEN 49
              |ELSE (12 - length(tz)) * 4 +
              |  CASE WHEN substring(tz, 1, 1) = '1' THEN 3
              |       WHEN substring(tz, 1, 1) IN ('2', '3') THEN 2
              |       WHEN substring(tz, 1, 1) IN ('4', '5', '6', '7')
              |         THEN 1
              |       ELSE 0 END + 1 END""".stripMargin))
          .groupBy("source", "bucket").agg(max(col("rho")).as("r"))
        // the merge: bucket-wise max across sources — 64 rows total
        val merged = reg.groupBy("bucket").agg(max(col("r")).as("r"))
        val allB = bucketFrame64(s)
        val hll = allB.join(merged, Seq("bucket"), "left")
          .agg(sum(expr(
            "shiftleft(CAST(1 AS BIGINT), " +
              "greatest(20 - coalesce(r, 0), 0))")).as("hll_sum"),
            sum(when(col("r").isNull, 1L).otherwise(0L)).as("v_empty"))
        val exact = tok.agg(
          countDistinct(col("token")).as("n_exact_union"),
          countDistinct(col("source"), col("token")).as("sum_per_source"))
        val lnArr = hllLnTable.mkString("array(", ", ", ")")
        exact.crossJoin(hll)
          .withColumn("raw_est", expr(
            "CAST(709357 AS BIGINT) * 4096 * 1048576 " +
              "div hll_sum div 1000000"))
          .withColumn("hll_est_union", expr(
            "CASE WHEN raw_est < 160 AND v_empty > 0 THEN " +
              s"64 * element_at($lnArr, CAST(v_empty AS INT)) " +
              "div 1000000 ELSE raw_est END"))
          .drop("raw_est")
          .withColumn("err_ppm", expr(
            "abs(hll_est_union - n_exact_union) * 1000000 " +
              "div n_exact_union"))
      },
      Some("""WITH tok AS (
             |  SELECT source,
             |    unnest(regexp_split_to_array(trim(text), '\s+')) AS token
             |  FROM documents),
             |reg AS (
             |  SELECT source, bucket, max(rho) AS r FROM (
             |    SELECT source,
             |      (16 * (strpos('0123456789abcdef', substr(h, 1, 1)) - 1)
             |       + strpos('0123456789abcdef', substr(h, 2, 1)) - 1)
             |        % 64 AS bucket,
             |      CASE WHEN tz = '' THEN 49
             |      ELSE (12 - len(tz)) * 4 +
             |        CASE WHEN substr(tz, 1, 1) = '1' THEN 3
             |             WHEN substr(tz, 1, 1) IN ('2', '3') THEN 2
             |             WHEN substr(tz, 1, 1) IN ('4', '5', '6', '7')
             |               THEN 1
             |             ELSE 0 END + 1 END AS rho
             |    FROM (SELECT source, h,
             |            regexp_replace(substr(h, 3, 12), '^0+', '') AS tz
             |          FROM (SELECT source, md5(token) AS h FROM tok)))
             |  GROUP BY source, bucket),
             |merged AS (SELECT bucket, max(r) AS r FROM reg
             |           GROUP BY bucket),
             |allb AS (SELECT unnest(range(64)) AS bucket),
             |hll AS (
             |  SELECT
             |    CAST(sum(1::BIGINT <<
             |      greatest(20 - coalesce(r, 0), 0)) AS BIGINT) AS hll_sum,
             |    CAST(sum(CASE WHEN r IS NULL THEN 1 ELSE 0 END)
             |      AS BIGINT) AS v_empty
             |  FROM allb LEFT JOIN merged USING (bucket)),
             |exact AS (
             |  SELECT count(DISTINCT token) AS n_exact_union,
             |    count(DISTINCT (source, token)) AS sum_per_source
             |  FROM tok),
             |raw AS (
             |  SELECT n_exact_union, sum_per_source, hll_sum, v_empty,
             |    709357::BIGINT * 4096 * 1048576
             |      // hll_sum // 1000000 AS raw_est
             |  FROM exact, hll),
             |est AS (
             |  SELECT n_exact_union, sum_per_source, hll_sum, v_empty,
             |    CASE WHEN raw_est < 160 AND v_empty > 0 THEN
             |      64 * ([__LNT__])[CAST(v_empty AS INT)] // 1000000
             |    ELSE raw_est END AS hll_est_union
             |  FROM raw)
             |SELECT CAST(n_exact_union AS BIGINT) AS n_exact_union,
             |  CAST(sum_per_source AS BIGINT) AS sum_per_source,
             |  hll_sum, v_empty,
             |  CAST(hll_est_union AS BIGINT) AS hll_est_union,
             |  CAST(abs(hll_est_union - n_exact_union) * 1000000
             |    // n_exact_union AS BIGINT) AS err_ppm
             |FROM est""".stripMargin
        .replace("__LNT__", hllLnTable.mkString(", ")))),

    // HLL INTERSECTION by inclusion-exclusion — the sketch algebra that
    // answers "how much vocabulary do two sources share?" (the d47
    // overlap signal) from three register sets instead of a cross-source
    // distinct join: |A∩B| ≈ est(A) + est(B) − est(A∪B), where the union
    // registers are the d49 bucket-wise max. Same integer register
    // discipline and shared ln-table as d48/d49, so both engines compute
    // the identical estimate; the exact intersection is computed
    // alongside and the estimate is gated with its error. The
    // differencing amplifies relative error (the known cost of
    // sketch-side intersections — fine for the routing decisions it
    // feeds, measured here honestly as err_ppm).
    // ---- Unicode-script detection (functions/ScriptId) — the routing
    // stage BEFORE langid in a real crawl mix: d5's trigram model is
    // Latin-script (non-Latin text honestly lands `und`), so a pipeline
    // first routes by script. Classification is the JVM's exact
    // Character.UnicodeScript over letter codepoints; the fixture
    // synthesizes per-doc mixed-script strings with CONSTRUCTED counts
    // (id-derived prefix lengths of literal Latin/Cyrillic/Han/Arabic
    // alphabets + digits/punct that must be ignored), so DuckDB
    // re-derives every ppm and the alphabetical-tie dominant purely
    // arithmetically — a classification slip on any codepoint moves a
    // count and fails the hash.
    "d57_script" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val la = (id % 5 + 1).toInt
            val cy = (id % 3 + 1).toInt
            val ha = (id % 4).toInt
            val ar = (id % 2).toInt
            val th = (id % 6).toInt
            val ta = ((id % 7) % 3).toInt
            val text = "abcde".take(la) + " 123 " + "абвгд".take(cy) +
              "! " + "漢字文書".take(ha) + " " + "كتاب".take(ar) +
              " " + "กขคงจฉ".take(th) + " " + "கஙச".take(ta)
            val h = graft.functions.ScriptId.histogram(text)
            val tot = h.values.sum
            def ppm(k: String): Long = h.getOrElse(k, 0L) * 1000000L / tot
            (id, tot, ppm("latin"), ppm("cyrillic"), ppm("han"),
              ppm("arabic"), ppm("thai"), ppm("tamil"),
              graft.functions.ScriptId.dominant(text))
          }
          .toDF("doc_id", "n_letters", "latin_ppm", "cyrillic_ppm",
            "han_ppm", "arabic_ppm", "thai_ppm", "tamil_ppm", "dominant")
          .orderBy("doc_id")
      },
      Some(
        """WITH d AS (SELECT doc_id,
          |    doc_id % 5 + 1 AS la, doc_id % 3 + 1 AS cy,
          |    doc_id % 4 AS ha, doc_id % 2 AS ar,
          |    doc_id % 6 AS th, (doc_id % 7) % 3 AS ta FROM documents),
          |t AS (SELECT doc_id, la, cy, ha, ar, th, ta,
          |        la + cy + ha + ar + th + ta AS tot FROM d)
          |SELECT doc_id,
          |  CAST(tot AS BIGINT) AS n_letters,
          |  CAST(la * 1000000 // tot AS BIGINT) AS latin_ppm,
          |  CAST(cy * 1000000 // tot AS BIGINT) AS cyrillic_ppm,
          |  CAST(ha * 1000000 // tot AS BIGINT) AS han_ppm,
          |  CAST(ar * 1000000 // tot AS BIGINT) AS arabic_ppm,
          |  CAST(th * 1000000 // tot AS BIGINT) AS thai_ppm,
          |  CAST(ta * 1000000 // tot AS BIGINT) AS tamil_ppm,
          |  CASE WHEN ar >= cy AND ar >= ha AND ar >= la AND ar >= ta
          |         AND ar >= th THEN 'arabic'
          |       WHEN cy >= ha AND cy >= la AND cy >= ta AND cy >= th
          |         THEN 'cyrillic'
          |       WHEN ha >= la AND ha >= ta AND ha >= th THEN 'han'
          |       WHEN la >= ta AND la >= th THEN 'latin'
          |       WHEN ta >= th THEN 'tamil'
          |       ELSE 'thai' END AS dominant
          |FROM t ORDER BY doc_id""".stripMargin)),

    // ---- Cyrillic langid family (functions/CyrLangId) behind d57's
    // script routing — per-script models, not one stretched model:
    // LangId.route dispatches the dominant script to its family (latin
    // → d5's 8-language model, cyrillic → bg/ru/uk, unmodeled scripts
    // honestly und). The gate predicts over HELD-OUT Cyrillic sentences
    // chosen by doc_id % 9 (never seed sentences — generalization, not
    // recall), and the oracle re-derives every score: same seed VALUES,
    // same literal micro-nat ln table, same margin and alphabetical tie
    // — the d5 discipline on a second writing system. The engine-side
    // alphabet-coverage refusal (Serbian/Kazakh letters outside the
    // bg/ru/uk alphabet → und) is an identity on this pure-in-alphabet
    // pool; LangIdSpec pins it on real Serbian/Kazakh text.
    "d58_cyr_langid" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val (lang, text) = cyrPool((id % 9).toInt)
            (lang, graft.functions.LangId.route(text))
          }
          .toDF("true_lang", "pred")
          .groupBy("true_lang", "pred").agg(count(lit(1)).as("n"))
          .orderBy("true_lang", "pred")
      },
      Some(cyrLangIdOracleSql)),

    // ---- Arabic-script langid family (functions/ArabLangId) — the
    // third trigram family behind the script router (d5 Latin, d58
    // Cyrillic): ar/fa/ur, whose DISTINCTIVE letters (Farsi ک/ی vs
    // Arabic ك/ي, Urdu's ٹ ڈ ڑ ہ ے) are themselves trigram signal.
    // Same shared oracle builder: seed VALUES + literal ln table +
    // margin + tie, held-out pool by doc_id % 9. Kurdish/Pashto (out
    // of set, letters outside the modeled alphabet) are refused by the
    // coverage rule, spec-pinned.
    "d59_arab_langid" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val (lang, text) = arabPool((id % 9).toInt)
            (lang, graft.functions.LangId.route(text))
          }
          .toDF("true_lang", "pred")
          .groupBy("true_lang", "pred").agg(count(lit(1)).as("n"))
          .orderBy("true_lang", "pred")
      },
      Some(arabLangIdOracleSql)),

    // ---- Hebrew-script langid family (functions/HebLangId) — he/yi
    // behind the script router. Yiddish function words (דער וואס נישט
    // געוו-) are trigram-distinct from Hebrew everywhere; same shared
    // oracle builder, held-out pool by doc_id % 6. No coverage rule
    // (Hebrew-script languages share the letters) — the Aramaic
    // boundary is pinned as a documented limitation in LangIdSpec.
    "d60_heb_langid" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val (lang, text) = hebPool((id % 6).toInt)
            (lang, graft.functions.LangId.route(text))
          }
          .toDF("true_lang", "pred")
          .groupBy("true_lang", "pred").agg(count(lit(1)).as("n"))
          .orderBy("true_lang", "pred")
      },
      Some(hebLangIdOracleSql)),

    // ---- Devanagari langid family (functions/DevaLangId) — hi/mr/ne
    // behind the script router. The alphabet class includes matras/
    // virama/anusvara (mandatory orthography, unlike Arabic harakat);
    // nukta forms excluded (mixed NFC/NFD encodings in real crawls
    // would split the engines). Held-out pool by doc_id % 9; the
    // Sanskrit tatsama boundary is pinned in LangIdSpec.
    "d61_deva_langid" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val (lang, text) = devaPool((id % 9).toInt)
            (lang, graft.functions.LangId.route(text))
          }
          .toDF("true_lang", "pred")
          .groupBy("true_lang", "pred").agg(count(lit(1)).as("n"))
          .orderBy("true_lang", "pred")
      },
      Some(devaLangIdOracleSql)),

    // ---- Han langid family (functions/HanLangId) — zh-hans/zh-hant
    // behind the script router, closing the largest named refusal in
    // the route table. UNIGRAM NB, not trigram (the URO's 20k+
    // codepoints cannot ride the literal-seed trigram discipline;
    // single hanzi carry the script-variant signal), margin unit
    // micro-nats per CHARACTER. Seeds are pairwise character-variant
    // sentence pairs, so totals are equal, base terms cancel, and
    // only variant characters score. Kana-bearing Han text routes to
    // `ja` BEFORE this model; kanji-only ja / variant-free zh land
    // `und` (pinned with the 将来性 short-compound boundary in
    // LangIdSpec). Held-out pool by doc_id % 6.
    "d62_han_langid" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val (lang, text) = hanPool((id % 6).toInt)
            (lang, graft.functions.LangId.route(text))
          }
          .toDF("true_lang", "pred")
          .groupBy("true_lang", "pred").agg(count(lit(1)).as("n"))
          .orderBy("true_lang", "pred")
      },
      Some(hanLangIdOracleSql)),

    // ---- Latin langid breadth (r19 verdict item 2): the d58-style
    // held-out-pool gate for the widened 14-language Latin family —
    // pl/tr/vi/id/ro/cs were full named refusals before r20, in the
    // script where refusal costs the most corpus. Pool by doc_id % 28,
    // oracle re-derives every trigram count from the same seed VALUES
    // and joins the same literal ln table; margin re-placed at 50k
    // (the 14-language neighborhood lifts out-of-set runner-up gaps —
    // LangIdSpec pins both populations).
    "d63_latin_langid" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val (lang, text) = latinPool((id % 28).toInt)
            (lang, graft.functions.LangId.route(text))
          }
          .toDF("true_lang", "pred")
          .groupBy("true_lang", "pred").agg(count(lit(1)).as("n"))
          .orderBy("true_lang", "pred")
      },
      Some(latinLangIdOracleSql)),

    "d56_hll_intersect" -> QueryDef(
      (s, dir) => {
        val tok = t(s, dir, "documents")
          .filter(col("source").isin("src0", "src1"))
          .select(col("source"),
            explode(split(trim(col("text")), "\\s+")).as("token"))
        val reg = tok
          .withColumn("h", md5(col("token")))
          .withColumn("bucket", expr(
            "CAST(conv(substring(h, 1, 2), 16, 10) AS BIGINT) % 64"))
          .withColumn("tz", expr(
            "regexp_replace(substring(h, 3, 12), '^0+', '')"))
          .withColumn("rho", expr(
            """CASE WHEN tz = '' THEN 49
              |ELSE (12 - length(tz)) * 4 +
              |  CASE WHEN substring(tz, 1, 1) = '1' THEN 3
              |       WHEN substring(tz, 1, 1) IN ('2', '3') THEN 2
              |       WHEN substring(tz, 1, 1) IN ('4', '5', '6', '7')
              |         THEN 1
              |       ELSE 0 END + 1 END""".stripMargin))
          .groupBy("source", "bucket").agg(max(col("rho")).as("r"))
        // the union sketch IS a bucket-wise max merge of the two
        val uni = reg.groupBy("bucket").agg(max(col("r")).as("r"))
          .withColumn("source", lit("both"))
        val allReg = reg.unionByName(uni.select("source", "bucket", "r"))
        import s.implicits._
        val allB = Seq("src0", "src1", "both").toDF("source")
          .select(col("source"),
            explode(sequence(lit(0L), lit(63L))).as("bucket"))
        val lnArr = hllLnTable.mkString("array(", ", ", ")")
        val est = allB.join(allReg, Seq("source", "bucket"), "left")
          .groupBy("source")
          .agg(sum(expr(
            "shiftleft(CAST(1 AS BIGINT), " +
              "greatest(20 - coalesce(r, 0), 0))")).as("hll_sum"),
            sum(when(col("r").isNull, 1L).otherwise(0L)).as("v_empty"))
          .withColumn("raw_est", expr(
            "CAST(709357 AS BIGINT) * 4096 * 1048576 " +
              "div hll_sum div 1000000"))
          .withColumn("est", expr(
            "CASE WHEN raw_est < 160 AND v_empty > 0 THEN " +
              s"64 * element_at($lnArr, CAST(v_empty AS INT)) " +
              "div 1000000 ELSE raw_est END"))
        val pivoted = est.agg(
          max(when(col("source") === "src0", col("est"))).as("est_a"),
          max(when(col("source") === "src1", col("est"))).as("est_b"),
          max(when(col("source") === "both", col("est"))).as("est_union"))
        val exact = tok.select("source", "token").distinct()
          .groupBy("token")
          .agg(countDistinct(col("source")).as("ns"))
          .filter(col("ns") === 2)
          .agg(count(lit(1)).as("n_exact_common"))
        pivoted.crossJoin(exact)
          .withColumn("hll_est_common", expr(
            "greatest(est_a + est_b - est_union, CAST(0 AS BIGINT))"))
          .withColumn("err_ppm", expr(
            "abs(hll_est_common - n_exact_common) * 1000000 " +
              "div n_exact_common"))
      },
      Some("""WITH tok AS (
             |  SELECT source,
             |    unnest(regexp_split_to_array(trim(text), '\s+')) AS token
             |  FROM documents WHERE source IN ('src0', 'src1')),
             |reg AS (
             |  SELECT source, bucket, max(rho) AS r FROM (
             |    SELECT source,
             |      (16 * (strpos('0123456789abcdef', substr(h, 1, 1)) - 1)
             |       + strpos('0123456789abcdef', substr(h, 2, 1)) - 1)
             |        % 64 AS bucket,
             |      CASE WHEN tz = '' THEN 49
             |      ELSE (12 - len(tz)) * 4 +
             |        CASE WHEN substr(tz, 1, 1) = '1' THEN 3
             |             WHEN substr(tz, 1, 1) IN ('2', '3') THEN 2
             |             WHEN substr(tz, 1, 1) IN ('4', '5', '6', '7')
             |               THEN 1
             |             ELSE 0 END + 1 END AS rho
             |    FROM (SELECT source, h,
             |            regexp_replace(substr(h, 3, 12), '^0+', '') AS tz
             |          FROM (SELECT source, md5(token) AS h FROM tok)))
             |  GROUP BY source, bucket),
             |uni AS (SELECT 'both' AS source, bucket, max(r) AS r
             |        FROM reg GROUP BY bucket),
             |allreg AS (SELECT * FROM reg UNION ALL SELECT * FROM uni),
             |allb AS (
             |  SELECT s.source, b.bucket
             |  FROM (VALUES ('src0'), ('src1'), ('both')) s(source),
             |       (SELECT unnest(range(64)) AS bucket) b),
             |hll AS (
             |  SELECT allb.source,
             |    CAST(sum(1::BIGINT <<
             |      greatest(20 - coalesce(r, 0), 0)) AS BIGINT) AS hll_sum,
             |    CAST(sum(CASE WHEN r IS NULL THEN 1 ELSE 0 END)
             |      AS BIGINT) AS v_empty
             |  FROM allb LEFT JOIN allreg
             |    ON allreg.source = allb.source
             |   AND allreg.bucket = allb.bucket
             |  GROUP BY allb.source),
             |est AS (
             |  SELECT source,
             |    CASE WHEN raw_est < 160 AND v_empty > 0 THEN
             |      64 * ([__LNT__])[CAST(v_empty AS INT)] // 1000000
             |    ELSE raw_est END AS est
             |  FROM (SELECT source, v_empty,
             |          709357::BIGINT * 4096 * 1048576
             |            // hll_sum // 1000000 AS raw_est
             |        FROM hll)),
             |piv AS (
             |  SELECT
             |    max(CASE WHEN source = 'src0' THEN est END) AS est_a,
             |    max(CASE WHEN source = 'src1' THEN est END) AS est_b,
             |    max(CASE WHEN source = 'both' THEN est END) AS est_union
             |  FROM est),
             |exact AS (
             |  SELECT count(*) AS n_exact_common FROM (
             |    SELECT token FROM (SELECT DISTINCT source, token FROM tok)
             |    GROUP BY token HAVING count(*) = 2))
             |SELECT CAST(est_a AS BIGINT) AS est_a,
             |  CAST(est_b AS BIGINT) AS est_b,
             |  CAST(est_union AS BIGINT) AS est_union,
             |  CAST(greatest(est_a + est_b - est_union, 0) AS BIGINT)
             |    AS hll_est_common,
             |  CAST(n_exact_common AS BIGINT) AS n_exact_common,
             |  CAST(abs(greatest(est_a + est_b - est_union, 0)
             |    - n_exact_common) * 1000000 // n_exact_common AS BIGINT)
             |    AS err_ppm
             |FROM piv, exact""".stripMargin
        .replace("__LNT__", hllLnTable.mkString(", ")))),

    // Source-balanced epoch interleaving — the training-order pass that
    // prevents long single-source runs (a shuffled epoch that still
    // respects mixture weights starts from exactly this round-robin):
    // rank within source by doc_id, then order by (rank, source) so
    // consecutive rows rotate through every source before any source
    // repeats. Both steps are one shuffle each (source-keyed window,
    // range-partitioned global sort) — no global row_number, no driver
    // collect. Gated on the first 200 positions.
    "d50_interleave" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("source").orderBy("doc_id")
        t(s, dir, "documents")
          .select(col("source"), col("doc_id"))
          .withColumn("rn", row_number().over(w))
          .orderBy("rn", "source")
          .limit(200)
      },
      Some("""SELECT source, doc_id,
             |  CAST(row_number() OVER (PARTITION BY source
             |    ORDER BY doc_id) AS INT) AS rn
             |FROM documents
             |ORDER BY rn, source LIMIT 200""".stripMargin)),

    // k-anonymity audit over the events table — the data-governance
    // question asked before any release: "how many rows sit in
    // quasi-identifier groups smaller than k?" QI = (coarse user bucket,
    // event type); one group-size agg, then each k threshold is an
    // arithmetic rollup of the SAME size frame (no per-k rescan — the
    // 100 TB shape). Integer ppm share per the engine-exactness
    // discipline.
    "d51_k_anonymity" -> QueryDef(
      (s, dir) => {
        val sizes = t(s, dir, "events")
          .groupBy((col("user_id") % 100).as("user_bucket"),
            col("event_type"))
          .agg(count(lit(1)).as("n"))
          .localCheckpoint() // three k-thresholds read it
        val total = sizes.agg(sum(col("n")).as("total"))
        val per = Seq(2, 5, 10).map { k =>
          sizes.filter(col("n") < k)
            .agg(coalesce(count(lit(1)), lit(0L)).as("n_groups_below"),
              coalesce(sum(col("n")), lit(0L)).as("n_rows_below"))
            .select(lit(k).as("k"), col("n_groups_below"),
              col("n_rows_below"))
        }
        per.reduce(_.unionAll(_))
          .crossJoin(total)
          .select(col("k"), col("n_groups_below"), col("n_rows_below"),
            expr("CAST(n_rows_below * 1000000 AS BIGINT) div total")
              .as("share_ppm"))
          .orderBy("k")
      },
      Some("""WITH sizes AS (
             |  SELECT user_id % 100 AS user_bucket, event_type,
             |    count(*) AS n
             |  FROM events GROUP BY 1, 2),
             |total AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM sizes),
             |ks AS (SELECT unnest([2, 5, 10]) AS k)
             |SELECT k,
             |  CAST(coalesce(count(sizes.n), 0) AS BIGINT)
             |    AS n_groups_below,
             |  CAST(coalesce(sum(sizes.n), 0) AS BIGINT) AS n_rows_below,
             |  CAST(coalesce(sum(sizes.n), 0) * 1000000 // max(total.total)
             |    AS BIGINT) AS share_ppm
             |FROM ks
             |LEFT JOIN sizes ON sizes.n < ks.k, total
             |GROUP BY k ORDER BY k""".stripMargin)),

    // Corpus version diff — the dataset-versioning primitive (what
    // changed between corpus v1 and v2): v2 is derived deterministically
    // (every 11th doc deleted, every 7th doc's text amended, every 13th
    // doc re-added under a shifted id), the diff classifies by doc_id
    // full-outer join + content-hash compare. One join on the id key,
    // hash compare pushed into the join output — at 100 TB this is the
    // manifest-diff shape, never a text diff.
    "d52_corpus_diff" -> QueryDef(
      (s, dir) => {
        val v1 = t(s, dir, "documents")
          .select(col("doc_id"), md5(col("text")).as("h1"))
        val docs = t(s, dir, "documents")
        val v2 = docs.filter(col("doc_id") % 11 =!= 0)
          .select(col("doc_id"),
            md5(when(col("doc_id") % 7 === 0,
              concat(col("text"), lit(" v2")))
              .otherwise(col("text"))).as("h2"))
          .unionAll(docs.filter(col("doc_id") % 13 === 0)
            .select((col("doc_id") + 100000).as("doc_id"),
              md5(col("text")).as("h2")))
        v1.join(v2, Seq("doc_id"), "full_outer")
          .agg(
            sum(when(col("h1").isNull, 1L).otherwise(0L)).as("n_added"),
            sum(when(col("h2").isNull, 1L).otherwise(0L)).as("n_removed"),
            sum(when(col("h1").isNotNull && col("h2").isNotNull &&
              col("h1") =!= col("h2"), 1L).otherwise(0L)).as("n_changed"),
            sum(when(col("h1") === col("h2"), 1L).otherwise(0L))
              .as("n_unchanged"))
      },
      Some("""WITH v1 AS (
             |  SELECT doc_id, md5(text) AS h1 FROM documents),
             |v2 AS (
             |  SELECT doc_id,
             |    md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2'
             |        ELSE text END) AS h2
             |  FROM documents WHERE doc_id % 11 <> 0
             |  UNION ALL
             |  SELECT doc_id + 100000 AS doc_id, md5(text) AS h2
             |  FROM documents WHERE doc_id % 13 = 0)
             |SELECT
             |  CAST(sum(CASE WHEN h1 IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_added,
             |  CAST(sum(CASE WHEN h2 IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_removed,
             |  CAST(sum(CASE WHEN h1 IS NOT NULL AND h2 IS NOT NULL
             |    AND h1 <> h2 THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
             |  CAST(sum(CASE WHEN h1 = h2 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_unchanged
             |FROM v1 FULL OUTER JOIN v2 USING (doc_id)""".stripMargin)),

    // Zipf rank-frequency profile in power-of-two buckets — the "is this
    // natural text or generated spam" corpus diagnostic (natural corpora
    // put geometrically fewer TYPES in each doubling of frequency;
    // machine-generated floods break the slope). Bucket = floor(log2 f)
    // computed INTEGER-exactly as len(bin(f))−1 in both engines — no
    // float log at any frequency, so no boundary flips at exact powers
    // of two. One token-count agg + one bucket rollup.
    "d53_zipf_buckets" -> QueryDef(
      (s, dir) => {
        t(s, dir, "documents")
          .select(explode(split(trim(col("text")), "\\s+")).as("token"))
          .groupBy("token").agg(count(lit(1)).as("f"))
          .withColumn("bucket", expr("length(bin(f)) - 1"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_types"), sum(col("f")).as("n_tokens"))
          .select(col("bucket").cast("long").as("bucket"),
            col("n_types"), col("n_tokens"),
            expr("CAST(n_tokens * 1000000 AS BIGINT) div n_types")
              .as("mean_freq_micro"))
          .orderBy("bucket")
      },
      Some("""WITH tf AS (
             |  SELECT token, count(*) AS f FROM (
             |    SELECT unnest(regexp_split_to_array(trim(text), '\s+'))
             |      AS token
             |    FROM documents)
             |  GROUP BY token)
             |SELECT CAST(length(bin(f)) - 1 AS BIGINT) AS bucket,
             |  CAST(count(*) AS BIGINT) AS n_types,
             |  CAST(sum(f) AS BIGINT) AS n_tokens,
             |  CAST(sum(f) * 1000000 // count(*) AS BIGINT)
             |    AS mean_freq_micro
             |FROM tf GROUP BY 1 ORDER BY 1""".stripMargin))
  )

  /** One 64-row bucket frame (0..63) for the HLL union merge. */
  private def bucketFrame64(s: org.apache.spark.sql.SparkSession) = {
    s.range(1)
      .select(explode(sequence(lit(0L), lit(63L))).as("bucket"))
  }
}
