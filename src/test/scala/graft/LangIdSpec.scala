package graft

import graft.functions.LangId

/** Char-trigram naive-Bayes language id: literal ln-table integrity
  * (every entry re-derived from Math.log), model-constant coverage
  * (every key either engine looks up exists), held-out accuracy, and
  * the deterministic tie rule.
  */
class LangIdSpec extends GraftSparkSpec {

  test("langid: every lnMicro literal equals round(ln(k) * 1e6)") {
    LangId.lnMicro.foreach { case (k, v) =>
      assert(v === Math.round(Math.log(k.toDouble) * 1e6),
        s"lnMicro($k) drifted from Math.log")
    }
  }

  test("langid: the table covers every key either engine can look up") {
    // smoothed counts: 1 .. maxSeedCount+1
    (1 to LangId.maxSeedCount + 1).foreach(k =>
      assert(LangId.lnMicro.contains(k), s"missing smoothed-count key $k"))
    // per-language denominators total+V
    LangId.langs.foreach { l =>
      val k = LangId.totals(l) + LangId.vocabSize
      assert(LangId.lnMicro.contains(k), s"missing denominator key $k for $l")
    }
    // the generated oracle VALUES must stay quote-safe
    LangId.seeds.foreach { case (_, s) =>
      assert(!s.contains("'"), "seed sentences must not contain quotes")
    }
  }

  test("langid: held-out sentences classify for all fourteen languages; normalization strips non-letters") {
    // the shared pool doubles as the d63 gate's probe set — two
    // held-out sentences per modeled language, including the six r20
    // breadth languages (pl/tr/vi/id/ro/cs)
    val held = graft.queries.TextQueries.latinPool
    assert(held.map(_._1).distinct.sorted === LangId.langs)
    held.foreach { case (lang, s) =>
      assert(LangId.predict(s) === lang, s"misclassified: $s")
    }
    // none of the held-out sentences appear in the seeds
    val seedSet = LangId.seeds.map(_._2).toSet
    assert(held.forall(h => !seedSet(h._2)))
    // punctuation/digits/case wash out through normalization
    assert(LangId.predict("The GOVERNMENT, said: 42 times!!") ===
      LangId.predict("the government said times"))
  }

  test("langid: out-of-set languages and letterless text map to 'und'") {
    // no seed profile — the per-trigram margin (undMarginMicro) must
    // refuse to name these rather than guess a Latin-script neighbor.
    // (Turkish, the old probe here, is IN set since r20.) Documented
    // limitation, not pinned: languages that ride one in-set profile
    // hard — Slovak/Croatian→cs, Tagalog→id, Catalan→es — exceed any
    // feasible margin; an 8-sentence trigram NB cannot separate
    // same-family pairs it has never seen.
    Seq(
      "hyvaa paivaa me menemme torille huomenna aamulla",    // Finnish
      "hallitus sanoi ettei se muuta lakia",                 // Finnish
      "jo reggelt holnap reggel a piacra megyunk",           // Hungarian
      "god morgen vi tager pa markedet i morgen tidlig",     // Danish
      "god morgen vi drar til markedet i morgen tidlig",     // Norwegian
      "serikali ilisema kwamba haitabadilisha sheria"        // Swahili
    ).foreach { s =>
      assert(LangId.predict(s) === "und", s"named out-of-set text: $s")
    }
    // ...while the old Turkish probe is now named, not refused
    assert(LangId.predict("gunaydin yarin sabah pazara gidiyoruz") === "tr")
    // zero trigrams: nothing to score
    assert(LangId.predict("12345 !!! ...") === "und")
    assert(LangId.predict("") === "und")
    // the margin is the decision: in-set text clears it with headroom
    val enScores = LangId.scores(
      "the government said that it would not change the law")
    val ordered = LangId.langs.sortBy(l => (-enScores(l), l))
    val nTris = LangId.trigrams(
      "the government said that it would not change the law").size
    assert(enScores(ordered.head) - enScores(ordered(1)) >=
      2 * LangId.undMarginMicro * nTris, "in-set margin headroom eroded")
  }

  test("cyrillic: table literals, held-out accuracy, out-of-set und, script routing") {
    import graft.functions.{CyrLangId, ScriptId}
    CyrLangId.lnMicro.foreach { case (k, v) =>
      assert(v === Math.round(Math.log(k.toDouble) * 1e6),
        s"cyr lnMicro($k) drifted from Math.log")
    }
    (1 to CyrLangId.maxSeedCount + 1).foreach(k =>
      assert(CyrLangId.lnMicro.contains(k), s"missing smoothed-count key $k"))
    CyrLangId.langs.foreach { l =>
      val k = CyrLangId.totals(l) + CyrLangId.vocabSize
      assert(CyrLangId.lnMicro.contains(k), s"missing denominator key $k")
    }
    CyrLangId.seeds.foreach { case (_, s) =>
      assert(!s.contains("'"), "seed sentences must not contain quotes")
      assert(CyrLangId.normalize(s) === s, "seed not normalize-clean")
    }
    // held-out sentences (none in the seeds) classify per language
    val held = Seq(
      ("ru", "мы читаем книги каждый вечер после работы"),
      ("ru", "сегодня хорошая погода и мы идем гулять в парк"),
      ("ru", "он не знал что сказать и просто молчал"),
      ("uk", "ми читаємо книжки щовечора після роботи"),
      ("uk", "сьогодні гарна погода і ми йдемо гуляти в парк"),
      ("uk", "він не знав що сказати і просто мовчав"),
      ("bg", "къде е най близката спирка на автобуса и кога идва той"),
      ("bg", "времето днес е много хубаво и ще отидем на разходка"),
      ("bg", "той не знаеше какво да каже и просто мълчеше"))
    val seedSet = CyrLangId.seeds.map(_._2).toSet
    assert(held.forall(h => !seedSet(h._2)))
    held.foreach { case (lang, s) =>
      val sc = CyrLangId.scores(s)
      val ord = CyrLangId.langs.sortBy(x => (-sc(x), x))
      val gap = (sc(ord.head) - sc(ord(1))) / CyrLangId.trigrams(s).size
      info(s"$lang gap/tri = $gap -> ${CyrLangId.predict(s)}")
      assert(CyrLangId.predict(s) === lang, s"misclassified: $s")
    }
    // out-of-set Cyrillic (Serbian, Kazakh) lands und — refused by the
    // ALPHABET COVERAGE rule: their distinctive letters (ј ћ ђ / қ ң ү)
    // sit outside the bg/ru/uk alphabet, and a normalize that silently
    // deleted them would leave Serbian residue full of bare ' е ' (the
    // Bulgarian copula!) that scores as a confident false bg
    val outOfSet = Seq(
      "деца се играју у дворишту сваког јутра пре школе",
      "он је рекао да ће доћи са нама у град",
      "жылдам қоңыр түлкі жалқау иттің үстінен секіреді")
    outOfSet.foreach { s =>
      val cov = CyrLangId.alphabetCoveragePpm(s)
      info(s"out-of-set coverage = $cov ppm")
      assert(cov < CyrLangId.alphabetCoverageMinPpm)
      assert(CyrLangId.predict(s) === "und", s"named out-of-set text: $s")
    }
    // in-set text is ~100% in-alphabet — the rule never touches it
    held.foreach { case (_, s) =>
      assert(CyrLangId.alphabetCoveragePpm(s) === 1000000L)
    }
    // routing: the script picks the model; unmodeled scripts are und
    assert(LangId.route("the government said that it would not change " +
      "the law") === "en")
    assert(LangId.route("мы читаем книги каждый вечер после работы")
      === "ru")
    assert(LangId.route("ми читаємо книжки щовечора після роботи") === "uk")
    assert(LangId.route("времето днес е много хубаво и ще отидем на разходка") === "bg")
    assert(ScriptId.dominant("今日は良い天気です") !== "latin")
    assert(LangId.route("12345 !!!") === "und")
    // script-implied languages: hangul writes only Korean, kana only
    // Japanese — and real Japanese keeps its kana particles even under
    // a kanji majority, so the 5% kana rule names it without a model
    assert(LangId.route("오늘은 날씨가 좋아서 공원에 갑니다") === "ko")
    assert(LangId.route("σήμερα ο καιρός είναι καλός και πάμε βόλτα") === "el")
    assert(LangId.route("今日は良い天気ですから公園へ行きます") === "ja")
    // kanji-only ja: the Han unigram margin refuses it (one stray
    // seed character is below the per-char margin on a run this long)
    assert(LangId.route("東京特許許可局長官許可証文書審査結果") === "und")
    // kana-free Simplified text now reaches the d62 family and names
    // itself (was a named refusal through r18)
    assert(LangId.route("我们今天去公园散步因为天气很好") === "zh-hans")
  }

  test("arabic: table literals, held-out accuracy, out-of-alphabet und, routing") {
    import graft.functions.ArabLangId
    ArabLangId.lnMicro.foreach { case (k, v) =>
      assert(v === Math.round(Math.log(k.toDouble) * 1e6),
        s"arab lnMicro($k) drifted from Math.log")
    }
    (1 to ArabLangId.maxSeedCount + 1).foreach(k =>
      assert(ArabLangId.lnMicro.contains(k), s"missing smoothed-count key $k"))
    ArabLangId.langs.foreach { l =>
      val k = ArabLangId.totals(l) + ArabLangId.vocabSize
      assert(ArabLangId.lnMicro.contains(k), s"missing denominator key $k")
    }
    ArabLangId.seeds.foreach { case (_, s) =>
      assert(!s.contains("'"), "seed sentences must not contain quotes")
      assert(ArabLangId.normalize(s) === s, "seed not normalize-clean")
    }
    // held-out sentences (none in the seeds) classify per language —
    // the three languages' distinctive codepoints (Farsi ک/ی vs Arabic
    // ك/ي, Urdu's retroflex letters) make the gaps wide (>=178k/tri)
    val held = Seq(
      ("ar", "نذهب الى السوق كل صباح مع الاطفال"),
      ("ar", "قال الرجل انه لن يغير القانون"),
      ("fa", "ما هر روز صبح با بچه ها به بازار می رویم"),
      ("fa", "ان مرد گفت که قانون را تغییر نخواهد داد"),
      ("ur", "ہم ہر صبح بچوں کے ساتھ بازار جاتے ہیں"),
      ("ur", "اس ادمی نے کہا کہ وہ قانون نہیں بدلے گا"))
    val seedSet = ArabLangId.seeds.map(_._2).toSet
    assert(held.forall(h => !seedSet(h._2)))
    held.foreach { case (lang, s) =>
      val sc = ArabLangId.scores(s)
      val ord = ArabLangId.langs.sortBy(x => (-sc(x), x))
      val gap = (sc(ord.head) - sc(ord(1))) / ArabLangId.trigrams(s).size
      info(s"$lang gap/tri = $gap -> ${ArabLangId.predict(s)}")
      assert(ArabLangId.predict(s) === lang, s"misclassified: $s")
      assert(LangId.route(s) === lang) // arabic-dominant routes here
    }
    // out-of-set Arabic script: Kurdish Sorani (ە ڕ ۆ ێ) and Pashto
    // (ټ ډ ړ ښ ځ) carry letters the ar/fa/ur alphabet lacks — the
    // coverage rule refuses them before any scoring
    val outOfSet = Seq(
      "ئەمڕۆ کەش و هەوا خۆشە و دەچینە پارک",
      "نن هوا ښه ده او موږ پارک ته ځو")
    outOfSet.foreach { s =>
      val cov = ArabLangId.alphabetCoveragePpm(s)
      info(s"out-of-set coverage = $cov ppm")
      assert(cov < ArabLangId.alphabetCoverageMinPpm)
      assert(ArabLangId.predict(s) === "und", s"named out-of-set text: $s")
    }
    held.foreach { case (_, s) =>
      assert(ArabLangId.alphabetCoveragePpm(s) === 1000000L)
    }
  }

  test("hebrew: table literals, held-out accuracy, the Aramaic boundary, routing") {
    import graft.functions.HebLangId
    HebLangId.lnMicro.foreach { case (k, v) =>
      assert(v === Math.round(Math.log(k.toDouble) * 1e6),
        s"heb lnMicro($k) drifted from Math.log")
    }
    (1 to HebLangId.maxSeedCount + 1).foreach(k =>
      assert(HebLangId.lnMicro.contains(k), s"missing smoothed-count key $k"))
    HebLangId.langs.foreach { l =>
      val k = HebLangId.totals(l) + HebLangId.vocabSize
      assert(HebLangId.lnMicro.contains(k), s"missing denominator key $k")
    }
    HebLangId.seeds.foreach { case (_, s) =>
      assert(!s.contains("'"), "seed sentences must not contain quotes")
      assert(HebLangId.normalize(s) === s, "seed not normalize-clean")
    }
    // held-out sentences (the d60 pool) classify per language
    val held = graft.queries.TextQueries.hebPool
    val seedSet = HebLangId.seeds.map(_._2).toSet
    assert(held.forall(h => !seedSet(h._2)))
    held.foreach { case (lang, s) =>
      val sc = HebLangId.scores(s)
      val ord = HebLangId.langs.sortBy(x => (-sc(x), x))
      val gap = (sc(ord.head) - sc(ord(1))) / HebLangId.trigrams(s).size
      info(s"$lang gap/tri = $gap -> ${HebLangId.predict(s)}")
      assert(gap >= HebLangId.undMarginMicro * 3,
        s"margin headroom collapsed for: $s")
      assert(HebLangId.predict(s) === lang, s"misclassified: $s")
    }
    // DOCUMENTED LIMITATION, pinned so a silent behavior change shows:
    // Talmudic Aramaic writes in Hebrew's letters with Hebrew-like
    // trigram mass — no alphabet-coverage signal exists (unlike
    // Serbian-vs-Cyrillic) and the margin does not refuse it, so
    // Aramaic quotes land `he`. Every production langid shares this
    // miss; the honest fix would be an arc model, not a wider margin.
    assert(HebLangId.predict("מאן דיהיב חיי יהיב מזוני") === "he")
    // routing: hebrew script reaches the family
    assert(LangId.route("אנחנו קוראים ספרים כל ערב אחרי העבודה") === "he")
    assert(LangId.route("מיר לייענען ביכער יעדן אוונט נאך דער ארבעט")
      === "yi")
  }

  test("devanagari: table literals, held-out accuracy, the Sanskrit boundary, routing") {
    import graft.functions.DevaLangId
    DevaLangId.lnMicro.foreach { case (k, v) =>
      assert(v === Math.round(Math.log(k.toDouble) * 1e6),
        s"deva lnMicro($k) drifted from Math.log")
    }
    (1 to DevaLangId.maxSeedCount + 1).foreach(k =>
      assert(DevaLangId.lnMicro.contains(k), s"missing smoothed-count key $k"))
    DevaLangId.langs.foreach { l =>
      val k = DevaLangId.totals(l) + DevaLangId.vocabSize
      assert(DevaLangId.lnMicro.contains(k), s"missing denominator key $k")
    }
    DevaLangId.seeds.foreach { case (_, s) =>
      assert(!s.contains("'"), "seed sentences must not contain quotes")
      assert(DevaLangId.normalize(s) === s, "seed not normalize-clean")
    }
    val held = graft.queries.TextQueries.devaPool
    val seedSet = DevaLangId.seeds.map(_._2).toSet
    assert(held.forall(h => !seedSet(h._2)))
    held.foreach { case (lang, s) =>
      val sc = DevaLangId.scores(s)
      val ord = DevaLangId.langs.sortBy(x => (-sc(x), x))
      val gap = (sc(ord.head) - sc(ord(1))) / DevaLangId.trigrams(s).size
      info(s"$lang gap/tri = $gap -> ${DevaLangId.predict(s)}")
      assert(gap >= DevaLangId.undMarginMicro * 3,
        s"margin headroom collapsed for: $s")
      assert(DevaLangId.predict(s) === lang, s"misclassified: $s")
    }
    // DOCUMENTED LIMITATION, pinned: Sanskrit shares the signs AND the
    // tatsama lexicon of hi/mr/ne. One maxim stays under the margin
    // (und — the desired refusal), the other clears it as mr — short
    // formal Sanskrit is genuinely inside the mr/hi trigram space.
    assert(DevaLangId.predict("धर्मो रक्षति रक्षितः सत्यमेव जयते नानृतम")
      === "und")
    assert(DevaLangId.predict("विद्या ददाति विनयं विनयाद्याति पात्रताम")
      === "mr")
    // routing: devanagari script reaches the family
    assert(LangId.route("हम हर शाम काम के बाद किताबें पढते हैं") === "hi")
    assert(LangId.route("आम्ही रोज संध्याकाळी कामानंतर पुस्तके वाचतो")
      === "mr")
    assert(LangId.route("हामी हरेक साँझ काम पछि किताबहरू पढ्छौं") === "ne")
  }

  test("han: table literals, held-out accuracy, kanji/variant-free und, routing") {
    import graft.functions.HanLangId
    HanLangId.lnMicro.foreach { case (k, v) =>
      assert(v === Math.round(Math.log(k.toDouble) * 1e6),
        s"han lnMicro($k) drifted from Math.log")
    }
    (1 to HanLangId.maxSeedCount + 1).foreach(k =>
      assert(HanLangId.lnMicro.contains(k), s"missing smoothed-count key $k"))
    HanLangId.langs.foreach { l =>
      val k = HanLangId.totals(l) + HanLangId.vocabSize
      assert(HanLangId.lnMicro.contains(k), s"missing denominator key $k")
    }
    // the pairwise-variant seed discipline: equal totals make the NB
    // base terms cancel, so ONLY script-variant characters score
    assert(HanLangId.totals.values.toSet.size === 1,
      "hans/hant seed totals must be equal (pairwise character variants)")
    HanLangId.seeds.foreach { case (_, s) =>
      assert(!s.contains("'"), "seed sentences must not contain quotes")
      assert(HanLangId.normalize(s) === s, "seed not normalize-clean")
    }
    // held-out pool (the d62 pool) classifies per variant with ≥1.5×
    // margin headroom (measured min 123k/char vs the 80k margin —
    // tools/langid/calc_han.py)
    val held = graft.queries.TextQueries.hanPool
    val seedSet = HanLangId.seeds.map(_._2).toSet
    assert(held.forall(h => !seedSet(h._2)))
    held.foreach { case (lang, s) =>
      val sc = HanLangId.scores(s)
      val ord = HanLangId.langs.sortBy(x => (-sc(x), x))
      val gap = (sc(ord.head) - sc(ord(1))) / HanLangId.unigrams(s).size
      info(s"$lang gap/char = $gap -> ${HanLangId.predict(s)}")
      assert(gap * 2 >= HanLangId.undMarginMicro * 3,
        s"margin headroom collapsed for: $s")
      assert(HanLangId.predict(s) === lang, s"misclassified: $s")
    }
    // out-of-set Han text refuses: kanji-only Japanese (with and
    // without a stray seed character) and hanja — the populations the
    // margin must NOT hand to zh
    assert(HanLangId.predict("新幹線特急券自由席") === "und")
    assert(HanLangId.predict("東日本大震災復興支援金") === "und")
    assert(HanLangId.predict("大韓民國憲法前文") === "und")
    // variant-free text (shared characters only) carries no script
    // signal — honest und
    assert(HanLangId.predict("天地人山水雨") === "und")
    // DOCUMENTED LIMITATION, pinned: a very SHORT kanji compound
    // carrying a seed character (来) crosses the per-char margin and
    // lands zh-hans — the Aramaic→he analogue; short fragments are
    // low-evidence by construction and only reach this model when Han
    // dominates the whole text's letters
    assert(HanLangId.predict("将来性") === "zh-hans")
    // routing: kana-free Han reaches the family; kana still wins first
    assert(LangId.route("我們每天晚上下班後都在家裡讀書") === "zh-hant")
    assert(LangId.route("我们每天晚上下班后都在家里读书") === "zh-hans")
    assert(LangId.route("彼は東京大学の学生ですが今は大阪に住んでいます") === "ja")
  }

  test("script-implied languages: single-language scripts name their language, shared scripts refuse") {
    // each of these scripts writes exactly one living language — the
    // hangul->ko discipline, pinned with real text per script
    val implied = Seq(
      ("th", "\u0e27\u0e31\u0e19\u0e19\u0e35\u0e49\u0e2d\u0e32\u0e01\u0e32\u0e28\u0e14\u0e35"),
      ("lo", "\u0ea1\u0eb7\u0ec9\u0e99\u0eb5\u0ec9\u0ead\u0eb2\u0e81\u0eb2\u0e94\u0e94\u0eb5"),
      ("ka", "\u10d3\u10e6\u10d4\u10e1 \u10d9\u10d0\u10e0\u10d2\u10d8 \u10d0\u10db\u10d8\u10dc\u10d3\u10d8\u10d0"),
      ("hy", "\u0561\u0575\u057d\u0585\u0580 \u056c\u0561\u057e \u0565\u0572\u0561\u0576\u0561\u056f \u0567"),
      ("km", "\u1790\u17d2\u1784\u17c3\u1793\u17c1\u17c7\u17a2\u17b6\u1780\u17b6\u179f\u1792\u17b6\u178f\u17bb\u179b\u17d2\u17a2"),
      ("si", "\u0d85\u0daf \u0d9a\u0dcf\u0dbd\u0d9c\u0dd4\u0dab\u0dba \u0dc4\u0ddc\u0db3\u0dba\u0dd2"),
      ("ta", "\u0b87\u0ba9\u0bcd\u0bb1\u0bc1 \u0bb5\u0bbe\u0ba9\u0bbf\u0bb2\u0bc8 \u0ba8\u0ba9\u0bcd\u0bb1\u0bbe\u0b95 \u0b89\u0bb3\u0bcd\u0bb3\u0ba4\u0bc1"),
      ("te", "\u0c08 \u0c30\u0c4b\u0c1c\u0c41 \u0c35\u0c3e\u0c24\u0c3e\u0c35\u0c30\u0c23\u0c02 \u0c2c\u0c3e\u0c17\u0c41\u0c02\u0c26\u0c3f"),
      ("kn", "\u0c87\u0c82\u0ca6\u0cc1 \u0cb9\u0cb5\u0cbe\u0cae\u0cbe\u0ca8 \u0c9a\u0cc6\u0ca8\u0ccd\u0ca8\u0cbe\u0c97\u0cbf\u0ca6\u0cc6"),
      ("ml", "\u0d07\u0d28\u0d4d\u0d28\u0d4d \u0d15\u0d3e\u0d32\u0d3e\u0d35\u0d38\u0d4d\u0d25 \u0d28\u0d32\u0d4d\u0d32\u0d24\u0d3e\u0d23\u0d4d"),
      ("gu", "\u0a86\u0a9c\u0ac7 \u0ab9\u0ab5\u0abe\u0aae\u0abe\u0aa8 \u0ab8\u0abe\u0ab0\u0ac1\u0a82 \u0a9b\u0ac7"),
      ("pa", "\u0a05\u0a71\u0a1c \u0a2e\u0a4c\u0a38\u0a2e \u0a35\u0a27\u0a40\u0a06 \u0a39\u0a48"),
      ("or", "\u0b06\u0b1c\u0b3f \u0b2a\u0b3e\u0b17 \u0b2d\u0b32 \u0b05\u0b1b\u0b3f"),
      ("dv", "\u0789\u07a8\u0787\u07a6\u078b\u07aa \u0789\u07ab\u0790\u07aa\u0782\u07b0 \u0783\u07a6\u0782\u078e\u07a6\u0785\u07aa"))
    implied.foreach { case (lang, text) =>
      assert(LangId.route(text) === lang, s"script of '$lang' text")
    }
    // shared-script populations refuse without a model: bengali script
    // writes Bengali AND Assamese, myanmar writes my/shn/mnw, ethiopic
    // writes am/ti — naming one would mislabel the others
    val refused = Seq(
      "\u0986\u099c \u0986\u09ac\u09b9\u09be\u0993\u09af\u09bc\u09be \u09ad\u09be\u09b2\u09cb",
      "\u101a\u1014\u1031\u1037 \u101b\u102c\u101e\u102e\u1025\u1010\u102f \u1000\u1031\u102c\u1004\u103a\u1038\u101e\u100a\u103a",
      "\u12db\u122c \u12a0\u12e8\u1229 \u1325\u1229 \u1290\u12cd")
    refused.foreach { t =>
      assert(LangId.route(t) === "und", s"shared-script text must refuse: $t")
    }
  }
}
