package graft.functions

/** Character-trigram naive-Bayes language identification — the real
  * langid stage of a crawl pipeline (replacing r15's 5-marker argmax;
  * reference seam: the reference has no text analysis at all, this is
  * extension surface). Language models are PER-SCRIPT (the d57/x-route
  * discipline: one trigram model cannot span writing systems honestly):
  * [[LangId]] is the Latin family
  * (cs/de/en/es/fr/id/it/nl/pl/pt/ro/sv/tr/vi),
  * [[CyrLangId]] the Cyrillic family (bg/ru/uk), both instances of the
  * same [[TrigramNb]] core, and [[LangId.route]] dispatches on
  * [[ScriptId.dominant]] — Latin text to the Latin model, Cyrillic to
  * the Cyrillic model, unmodeled scripts honestly to `und`.
  *
  * Profiles are built from SEEDED literal corpora at class load, so the
  * model is a deterministic function of source code, plus an `und`
  * (undetermined) decision: the argmax must beat the runner-up by
  * `undMarginMicro` micro-nats PER TRIGRAM (a per-trigram margin is
  * length-invariant) or the text is declared out-of-set — a real crawl
  * mix carries hundreds of languages the seed set cannot name, and a
  * confident wrong label is worse for a training mix than an honest
  * `und`.
  *
  * Cross-engine discipline (the d33/d54 pattern): every score is an
  * exact integer. Trigram counts are integers; add-one-smoothed log
  * probabilities come from `lnMicro`, a LITERAL micro-nat table both
  * engines share (the DuckDB oracle re-builds the same counts from the
  * same seed sentences and joins the same table — no runtime `ln`
  * anywhere, so a 1-ulp libm difference cannot flip an argmax). Score:
  *   score(L) = Σ_t lnMicro(count(L,t)+1) − nTris · lnMicro(total(L)+V)
  * which is Σ ln((c+1)/(total+V)) in micro-nats — multinomial NB with
  * add-one smoothing over the joint seed vocabulary V. Ties break to
  * the alphabetically first language; the margin rule then decides
  * between that argmax and `und`.
  *
  * 100 TB shape: each model is a few-KB closure constant; prediction is
  * a narrow per-row map (no exchange, no broadcast join needed).
  */
private[graft] final class TrigramNb(
    val langs: Seq[String], // alphabetical = the tie order
    val seeds: Seq[(String, String)],
    /** normalize class: everything OUTSIDE it collapses to spaces —
      * `[^a-z]` for Latin, the explicit Cyrillic letter class for
      * Cyrillic; the oracle runs the same regex in DuckDB. */
    stripRe: String,
    val lnMicro: Map[Int, Long],
    val undMarginMicro: Long) {

  def normalize(text: String): String =
    text.toLowerCase(java.util.Locale.ROOT)
      .replaceAll(stripRe + "+", " ").trim

  /** Character trigrams of the space-padded normalized text. */
  def trigrams(text: String): Seq[String] = {
    val p = " " + normalize(text) + " "
    if (p.length < 3) Seq.empty
    else (0 to p.length - 3).map(i => p.substring(i, i + 3))
  }

  private val counts: Map[String, Map[String, Int]] =
    seeds.groupBy(_._1).map { case (l, ss) =>
      l -> ss.flatMap(s => trigrams(s._2))
        .groupBy(identity).map { case (t, xs) => t -> xs.size }
    }
  val vocabSize: Int =
    counts.valuesIterator.flatMap(_.keysIterator).toSet.size
  val totals: Map[String, Int] =
    counts.map { case (l, c) => l -> c.values.sum }
  val maxSeedCount: Int =
    counts.valuesIterator.flatMap(_.valuesIterator).max

  /** Per-language micro-nat NB scores for a pre-computed trigram list
    * (the per-row hot path computes trigrams ONCE and reuses them for
    * scoring and the margin divisor).
    */
  private def scoresOf(ts: Seq[String]): Map[String, Long] =
    langs.map { l =>
      val c = counts(l)
      val base = lnMicro(totals(l) + vocabSize)
      l -> ts.foldLeft(0L)((acc, t) => acc + lnMicro(c.getOrElse(t, 0) + 1))
        .-(ts.size.toLong * base)
    }.toMap

  /** Per-language micro-nat NB scores for a text. */
  def scores(text: String): Map[String, Long] = scoresOf(trigrams(text))

  /** Argmax language when it clears the per-trigram margin over the
    * runner-up, else `und` — which also covers letterless/empty text
    * (zero trigrams, all scores tie at 0). In-set ties below the
    * margin are indistinguishable from out-of-set text by this model,
    * so they are `und` too.
    */
  def predict(text: String): String = {
    val ts = trigrams(text)
    if (ts.isEmpty) return "und"
    val sc = scoresOf(ts)
    val ordered = langs.sortBy(l => (-sc(l), l))
    if (sc(ordered.head) - sc(ordered(1)) >= undMarginMicro * ts.size)
      ordered.head
    else "und"
  }
}

object LangId {

  /** Tie order = alphabetical. r20 widens the family from 8 to 14 —
    * pl, tr, vi, id, ro, cs were top-20 web languages the router
    * previously refused by name, and Latin is the script where a
    * refusal costs the most corpus (r19 verdict item 2).
    */
  val langs: Seq[String] = Seq("cs", "de", "en", "es", "fr", "id", "it",
    "nl", "pl", "pt", "ro", "sv", "tr", "vi")

  /** Decision margin, micro-nats per trigram: the best language must
    * beat the runner-up by this much per trigram, else `und`. Re-placed
    * for the 14-language family (LangIdSpec pins both sides): in-set
    * held-out sentences score ≥ ~63k/trigram over the runner-up, while
    * the pinned out-of-set probes (Finnish, Hungarian, Danish,
    * Norwegian, Swahili) land ≤ ~45k — more neighbors means out-of-set
    * text partially rides SOME profile, so the 8-language margin of
    * 25k no longer splits the populations. Documented limitation
    * (LangIdSpec): languages that ride one in-set profile hard —
    * Slovak→cs, Croatian→cs, Tagalog→id, Catalan→es — exceed any
    * feasible margin and are named by their nearest modeled neighbor;
    * an 8-sentence trigram NB cannot separate same-family pairs it has
    * never seen.
    */
  val undMarginMicro: Long = 50000L

  // Seed corpora: 8 short ASCII-normalized sentences per language,
  // function-word heavy (articles, pronouns, auxiliaries carry the
  // trigram signal). MUST stay byte-identical to the d5 oracle's VALUES.
  private[graft] val seeds: Seq[(String, String)] = Seq(
    ("en", "the quick brown fox jumps over the lazy dog"),
    ("en", "this is the house that jack built"),
    ("en", "what time is it and where are we going"),
    ("en", "she said that they would come with us"),
    ("en", "of all the things we have seen this was the best"),
    ("en", "people who live in glass houses should not throw stones"),
    ("en", "there is nothing either good or bad but thinking makes it so"),
    ("en", "to be or not to be that is the question"),
    ("de", "der schnelle braune fuchs springt ueber den faulen hund"),
    ("de", "dies ist das haus das jack gebaut hat"),
    ("de", "wie spaet ist es und wohin gehen wir"),
    ("de", "sie sagte dass sie mit uns kommen wuerden"),
    ("de", "von allen dingen die wir gesehen haben war dies das beste"),
    ("de", "wer im glashaus sitzt sollte nicht mit steinen werfen"),
    ("de", "es gibt nichts gutes ausser man tut es"),
    ("de", "sein oder nicht sein das ist hier die frage"),
    ("fr", "le rapide renard brun saute par dessus le chien paresseux"),
    ("fr", "c est la maison que jacques a construite"),
    ("fr", "quelle heure est il et ou allons nous"),
    ("fr", "elle a dit qu ils viendraient avec nous"),
    ("fr", "de toutes les choses que nous avons vues c etait la meilleure"),
    ("fr", "les gens qui vivent dans des maisons de verre ne devraient pas jeter de pierres"),
    ("fr", "il n y a rien de bon ou de mauvais mais la pensee le rend ainsi"),
    ("fr", "etre ou ne pas etre telle est la question"),
    ("es", "el rapido zorro marron salta sobre el perro perezoso"),
    ("es", "esta es la casa que construyo jack"),
    ("es", "que hora es y adonde vamos"),
    ("es", "ella dijo que vendrian con nosotros"),
    ("es", "de todas las cosas que hemos visto esta fue la mejor"),
    ("es", "quien vive en casa de cristal no deberia tirar piedras"),
    ("es", "no hay nada bueno ni malo pero el pensamiento lo hace asi"),
    ("es", "ser o no ser esa es la cuestion"),
    ("it", "la rapida volpe marrone salta sopra il cane pigro"),
    ("it", "questa e la casa che jack ha costruito"),
    ("it", "che ora e e dove stiamo andando"),
    ("it", "lei ha detto che sarebbero venuti con noi"),
    ("it", "di tutte le cose che abbiamo visto questa era la migliore"),
    ("it", "chi vive in case di vetro non dovrebbe lanciare pietre"),
    ("it", "non c e niente di buono o cattivo ma il pensiero lo rende tale"),
    ("it", "essere o non essere questa e la domanda"),
    ("nl", "de snelle bruine vos springt over de luie hond"),
    ("nl", "dit is het huis dat jack heeft gebouwd"),
    ("nl", "hoe laat is het en waar gaan we heen"),
    ("nl", "zij zei dat ze met ons mee zouden komen"),
    ("nl", "van alle dingen die we hebben gezien was dit het beste"),
    ("nl", "wie in een glazen huis woont moet niet met stenen gooien"),
    ("nl", "er is niets goed of slecht maar het denken maakt het zo"),
    ("nl", "zijn of niet zijn dat is de vraag"),
    ("pt", "a rapida raposa marrom salta sobre o cao preguicoso"),
    ("pt", "esta e a casa que jack construiu"),
    ("pt", "que horas sao e para onde vamos"),
    ("pt", "ela disse que eles viriam conosco"),
    ("pt", "de todas as coisas que vimos esta foi a melhor"),
    ("pt", "quem mora em casa de vidro nao deveria atirar pedras"),
    ("pt", "nao ha nada de bom ou mau mas o pensamento o torna assim"),
    ("pt", "ser ou nao ser eis a questao"),
    ("sv", "den snabba bruna raven hoppar over den lata hunden"),
    ("sv", "detta ar huset som jack byggde"),
    ("sv", "vad ar klockan och vart ska vi ga"),
    ("sv", "hon sa att de skulle komma med oss"),
    ("sv", "av allt vi har sett var detta det basta"),
    ("sv", "den som sitter i glashus ska inte kasta sten"),
    ("sv", "det finns inget gott eller ont men tanken gor det sa"),
    ("sv", "att vara eller inte vara det ar fragan"),
    // r20 breadth languages — same 8 source sentences, ASCII-folded
    // the way the established seeds are (ueber-style: diacritics
    // dropped to their base letter, since normalize strips to [a-z])
    ("pl", "szybki brazowy lis skacze nad leniwym psem"),
    ("pl", "to jest dom ktory zbudowal jack"),
    ("pl", "ktora jest godzina i dokad idziemy"),
    ("pl", "powiedziala ze przyjda z nami"),
    ("pl", "ze wszystkich rzeczy ktore widzielismy ta byla najlepsza"),
    ("pl", "kto mieszka w szklanym domu nie powinien rzucac kamieniami"),
    ("pl", "nie ma nic dobrego ani zlego ale myslenie czyni to takim"),
    ("pl", "byc albo nie byc oto jest pytanie"),
    ("tr", "hizli kahverengi tilki tembel kopegin ustunden atlar"),
    ("tr", "bu jack in yaptigi evdir"),
    ("tr", "saat kac ve nereye gidiyoruz"),
    ("tr", "bizimle geleceklerini soyledi"),
    ("tr", "gordugumuz her seyin icinde en iyisi buydu"),
    ("tr", "cam evde oturan tas atmamali"),
    ("tr", "iyi ya da kotu bir sey yoktur dusunce onu oyle yapar"),
    ("tr", "olmak ya da olmamak iste butun mesele bu"),
    ("vi", "con cao nau nhanh nhen nhay qua con cho luoi bieng"),
    ("vi", "day la ngoi nha ma jack da xay"),
    ("vi", "bay gio la may gio va chung ta dang di dau"),
    ("vi", "co ay noi rang ho se den cung chung ta"),
    ("vi", "trong tat ca nhung gi chung ta da thay cai nay la tot nhat"),
    ("vi", "nguoi song trong nha kinh khong nen nem da"),
    ("vi", "khong co gi tot hay xau nhung suy nghi lam cho no nhu vay"),
    ("vi", "ton tai hay khong ton tai do la van de"),
    ("id", "rubah coklat yang cepat melompati anjing yang malas"),
    ("id", "ini adalah rumah yang dibangun oleh jack"),
    ("id", "jam berapa sekarang dan kita mau pergi ke mana"),
    ("id", "dia berkata bahwa mereka akan datang bersama kami"),
    ("id", "dari semua yang telah kami lihat ini yang terbaik"),
    ("id", "orang yang tinggal di rumah kaca tidak boleh melempar batu"),
    ("id", "tidak ada yang baik atau buruk tetapi pikiran membuatnya begitu"),
    ("id", "menjadi atau tidak menjadi itulah pertanyaannya"),
    ("ro", "vulpea maro rapida sare peste cainele lenes"),
    ("ro", "aceasta este casa pe care a construit o jack"),
    ("ro", "cat este ceasul si unde mergem"),
    ("ro", "ea a spus ca vor veni cu noi"),
    ("ro", "dintre toate lucrurile pe care le am vazut aceasta a fost cea mai buna"),
    ("ro", "cine locuieste intr o casa de sticla nu ar trebui sa arunce cu pietre"),
    ("ro", "nu exista nimic bun sau rau dar gandirea il face asa"),
    ("ro", "a fi sau a nu fi aceasta este intrebarea"),
    ("cs", "rychla hneda liska skace pres lineho psa"),
    ("cs", "to je dum ktery postavil jack"),
    ("cs", "kolik je hodin a kam jdeme"),
    ("cs", "rekla ze prijdou s nami"),
    ("cs", "ze vseho co jsme videli bylo tohle nejlepsi"),
    ("cs", "kdo zije ve sklenenem dome nemel by hazet kameny"),
    ("cs", "neni nic dobreho ani spatneho ale mysleni to tak cini"),
    ("cs", "byt ci nebyt toto je otazka"))

  /** round(ln(k)·1e6) for every k either engine looks up: smoothed
    * counts 1..17 (max seed trigram count is 16) and the fourteen
    * total+vocab denominators (V = 1716 over the widened seed set).
    * Literal so the oracle joins the SAME integers (LangIdSpec pins
    * each entry against Math.log).
    */
  private[graft] val lnMicro: Map[Int, Long] = Map(
    1 -> 0L, 2 -> 693147L, 3 -> 1098612L, 4 -> 1386294L, 5 -> 1609438L,
    6 -> 1791759L, 7 -> 1945910L, 8 -> 2079442L, 9 -> 2197225L,
    10 -> 2302585L, 11 -> 2397895L, 12 -> 2484907L, 13 -> 2564949L,
    14 -> 2639057L, 15 -> 2708050L, 16 -> 2772589L, 17 -> 2833213L,
    2005 -> 7603399L, 2011 -> 7606387L, 2036 -> 7618742L,
    2045 -> 7623153L, 2055 -> 7628031L, 2057 -> 7629004L,
    2069 -> 7634821L, 2071 -> 7635787L, 2073 -> 7636752L,
    2076 -> 7638198L, 2087 -> 7643483L, 2092 -> 7645876L,
    2119 -> 7658700L, 2133 -> 7665285L)

  private[graft] val model =
    new TrigramNb(langs, seeds, "[^a-z]", lnMicro, undMarginMicro)

  /** Lowercase, strip to [a-z] runs, collapse to single spaces, trim —
    * the exact expression the oracle runs
    * (`trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g'))`).
    */
  private[graft] def normalize(text: String): String = model.normalize(text)
  private[graft] def trigrams(text: String): Seq[String] = model.trigrams(text)
  private[graft] def vocabSize: Int = model.vocabSize
  private[graft] def totals: Map[String, Int] = model.totals
  private[graft] def maxSeedCount: Int = model.maxSeedCount
  private[graft] def scores(text: String): Map[String, Long] =
    model.scores(text)

  def predict(text: String): String = model.predict(text)

  /** Script-routed prediction — the full crawl-mix entry point: the
    * letter-script histogram picks the handler. Latin, Cyrillic,
    * Arabic, Hebrew, and Devanagari go to their trigram families; two
    * scripts IMPLY their language outright — hangul writes Korean and
    * nothing else, kana writes Japanese and nothing else (running
    * Japanese always carries kana particles/okurigana even when kanji
    * dominate the letter count, so a 5% kana share names `ja` without
    * needing kanji to lose the majority). Han ALONE stays `und`:
    * kanji-only fragments are Chinese OR Japanese and guessing zh
    * would mislabel the ja minority — the d5 refusal discipline.
    * Letterless text is `und`.
    */
  def route(text: String): String = {
    val h = ScriptId.histogram(text)
    if (h.isEmpty) return "und"
    val total = h.values.sum
    val kana = h.getOrElse("hiragana", 0L) + h.getOrElse("katakana", 0L)
    ScriptId.dominantOf(h) match {
      case "latin" => predict(text)
      case "cyrillic" => CyrLangId.predict(text)
      case "arabic" => ArabLangId.predict(text)
      case "hebrew" => HebLangId.predict(text)
      case "devanagari" => DevaLangId.predict(text)
      case "hangul" => "ko"
      case "hiragana" | "katakana" => "ja"
      case "greek" => "el" // Greek script writes Greek, nothing else
      // the kana rule only arbitrates HAN dominance (zh vs kanji-heavy
      // ja) — applied over latin/cyrillic-dominant text it would label
      // an English page with one short Japanese quote `ja` (r18 review).
      // Kana-free Han text goes to the hanzi-unigram family (d62):
      // zh-hans/zh-hant when the script-variant signal clears the
      // margin, honest `und` on variant-free or kanji-only fragments.
      case "han" => if (kana * 20L >= total) "ja" else HanLangId.predict(text)
      // scripts that write exactly ONE living language imply it the way
      // hangul implies Korean — no model needed, and refusing them
      // would discard the script's entire (unambiguous) population
      case "armenian" => "hy"
      case "georgian" => "ka"
      case "gujarati" => "gu"
      case "gurmukhi" => "pa"
      case "kannada" => "kn"
      case "khmer" => "km"
      case "lao" => "lo"
      case "malayalam" => "ml"
      case "oriya" => "or"
      case "sinhala" => "si"
      case "tamil" => "ta"
      case "telugu" => "te"
      case "thaana" => "dv"
      case "thai" => "th"
      // multi-language scripts with no model stay honest refusals:
      // bengali (bn/as), myanmar (my/shn/mnw), ethiopic (am/ti)
      case _ => "und"
    }
  }
}

/** The Cyrillic trigram family (bg/ru/uk) behind [[LangId.route]]'s
  * script dispatch — same NB core, Cyrillic seed corpora, normalize
  * class `[а-яёіїєґ]` (the basic range plus yo and the Ukrainian
  * letters — Bulgarian needs nothing beyond а-я).
  */
object CyrLangId {

  /** Tie order = alphabetical. */
  val langs: Seq[String] = Seq("bg", "ru", "uk")

  /** Per-trigram margin, same decision rule and value as the Latin
    * family (in-set held-out clears ≥ ~34.8k micro-nats/trigram). The
    * margin alone cannot refuse Serbian: stripping its distinctive
    * letters (ј ћ ђ џ љ њ) leaves residue full of bare ` е ` — the
    * BULGARIAN copula — which scores confidently bg. That population is
    * refused by [[alphabetCoverageMinPpm]] instead: letters OUTSIDE the
    * model's alphabet are themselves the out-of-set evidence.
    */
  val undMarginMicro: Long = 25000L

  /** Minimum share (ppm) of the text's CYRILLIC letters that must fall
    * inside the model alphabet, else `und` before any scoring: Serbian
    * (ј ћ ђ џ љ њ), Macedonian (ј ѓ ќ ѕ џ), Belarusian (ў), Kazakh
    * (қ ң ү ұ һ ә ө і-Kazakh) all carry letters bg/ru/uk never use, and
    * a model whose normalize silently DELETES them would otherwise
    * score the remainder as a false neighbor. 98%: real bg/ru/uk text
    * is ~100% in-alphabet; the Serbian probes measure 89–95%.
    */
  val alphabetCoverageMinPpm: Long = 980000L

  // Seed corpora: the same 8 function-word-heavy sentences as the Latin
  // family, in each language's own words. MUST stay byte-identical to
  // the d58 oracle's VALUES.
  private[graft] val seeds: Seq[(String, String)] = Seq(
    ("ru", "быстрая коричневая лиса прыгает через ленивую собаку"),
    ("ru", "это дом который построил джек"),
    ("ru", "который час и куда мы идем"),
    ("ru", "она сказала что они придут с нами"),
    ("ru", "из всего что мы видели это было лучшее"),
    ("ru", "кто живет в стеклянном доме не должен бросать камни"),
    ("ru", "нет ничего хорошего или плохого но мышление делает это таким"),
    ("ru", "быть или не быть вот в чем вопрос"),
    ("uk", "швидка коричнева лисиця стрибає через ледачого пса"),
    ("uk", "це будинок який збудував джек"),
    ("uk", "котра година і куди ми йдемо"),
    ("uk", "вона сказала що вони прийдуть з нами"),
    ("uk", "з усього що ми бачили це було найкраще"),
    ("uk", "хто живе в скляному будинку не повинен кидати каміння"),
    ("uk", "немає нічого доброго чи поганого але думка робить це таким"),
    ("uk", "бути чи не бути ось у чому питання"),
    ("bg", "бързата кафява лисица скача над мързеливото куче"),
    ("bg", "това е къщата която джак построи"),
    ("bg", "колко е часът и къде отиваме"),
    ("bg", "тя каза че те ще дойдат с нас"),
    ("bg", "от всичко което видяхме това беше най доброто"),
    ("bg", "който живее в стъклена къща не бива да хвърля камъни"),
    ("bg", "няма нищо добро или лошо но мисленето го прави такова"),
    ("bg", "да бъдеш или да не бъдеш това е въпросът"))

  /** round(ln(k)·1e6): smoothed counts 1..7 (max seed trigram count is
    * 6) and the three total+vocab denominators (V = 594, totals
    * ru 322 / uk 326 / bg 327). Literal — the d58 oracle joins the
    * same integers; LangIdSpec pins each entry against Math.log.
    */
  private[graft] val lnMicro: Map[Int, Long] = Map(
    1 -> 0L, 2 -> 693147L, 3 -> 1098612L, 4 -> 1386294L, 5 -> 1609438L,
    6 -> 1791759L, 7 -> 1945910L,
    916 -> 6820016L, 920 -> 6824374L, 921 -> 6825460L)

  /** The oracle-side normalize class (kept here so engine and oracle
    * cannot drift): everything outside these letters becomes a space.
    */
  private[graft] val stripRe: String = "[^а-яёіїєґ]"

  private[graft] val model =
    new TrigramNb(langs, seeds, stripRe, lnMicro, undMarginMicro)

  private[graft] def normalize(text: String): String = model.normalize(text)
  private[graft] def trigrams(text: String): Seq[String] = model.trigrams(text)
  private[graft] def vocabSize: Int = model.vocabSize
  private[graft] def totals: Map[String, Int] = model.totals
  private[graft] def maxSeedCount: Int = model.maxSeedCount
  private[graft] def scores(text: String): Map[String, Long] =
    model.scores(text)

  /** In-alphabet share of the text's Cyrillic letters, ppm (1e6 when
    * the text has no Cyrillic letters at all — coverage is then not
    * evidence either way; the trigram emptiness rule handles it).
    */
  private[graft] def alphabetCoveragePpm(text: String): Long = {
    var cyr = 0L
    var kept = 0L
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (Character.isLetter(cp) &&
        Character.UnicodeScript.of(cp) ==
          java.lang.Character.UnicodeScript.CYRILLIC) {
        cyr += 1
        val lc = Character.toLowerCase(cp)
        if ((lc >= 'а' && lc <= 'я') || lc == 'ё' || lc == 'і' ||
          lc == 'ї' || lc == 'є' || lc == 'ґ') kept += 1
      }
      i += Character.charCount(cp)
    }
    if (cyr == 0) 1000000L else (kept * 1000000L) / cyr
  }

  def predict(text: String): String =
    if (alphabetCoveragePpm(text) < alphabetCoverageMinPpm) "und"
    else model.predict(text)
}

/** The Arabic-script trigram family (ar/fa/ur) behind [[LangId.route]]'s
  * script dispatch — same NB core. The alphabet class is the full
  * standard set: core Arabic with hamza forms, the Farsi additions
  * (پ چ ژ گ ک ی), and the Urdu additions (ٹ ڈ ڑ ں ھ ہ ۂ ے ۓ); the
  * per-language DISTINCTIVE letters are themselves trigram signal
  * (Farsi text is full of ک/ی where Arabic writes ك/ي — different
  * codepoints). Arabic-script text whose letters fall outside this
  * class (Kurdish Sorani's ە ڕ ۆ ێ, Pashto's ټ ډ ړ ښ — measured
  * 68–86% coverage on real sentences) is refused by the same
  * alphabet-coverage rule as the Cyrillic family.
  */
object ArabLangId {

  /** Tie order = alphabetical. */
  val langs: Seq[String] = Seq("ar", "fa", "ur")

  /** Per-trigram margin, same rule as the other families — in-set
    * held-out Arabic-script sentences clear ≥ ~178k micro-nats/trigram
    * over the runner-up (the three languages' distinctive letters make
    * the gap wide).
    */
  val undMarginMicro: Long = 25000L

  /** Minimum in-alphabet share of the text's ARABIC-script letters,
    * ppm — the [[CyrLangId.alphabetCoverageMinPpm]] discipline.
    */
  val alphabetCoverageMinPpm: Long = 980000L

  /** The full modeled alphabet (membership set for the coverage rule
    * and the normalize class — one literal, both derive from it).
    */
  private[graft] val alphabet: String =
    "ءآأؤإئابةتثجحخدذرزسشصضطظعغفقكلمنهويى" + "پچژگکی" + "ٹڈڑںھہۂےۓ"

  // Seed corpora: the same 8 function-word-heavy sentences as the other
  // families, in each language's own words (no diacritics — bare
  // letters are what crawled text overwhelmingly carries). MUST stay
  // byte-identical to the d59 oracle's VALUES.
  private[graft] val seeds: Seq[(String, String)] = Seq(
    ("ar", "الثعلب البني السريع يقفز فوق الكلب الكسول"),
    ("ar", "هذا هو البيت الذي بناه جاك"),
    ("ar", "كم الساعة والى اين نحن ذاهبون"),
    ("ar", "قالت انهم سوف ياتون معنا"),
    ("ar", "من كل ما رايناه كان هذا هو الافضل"),
    ("ar", "من يعيش في بيت من زجاج لا يرمي الناس بالحجارة"),
    ("ar", "لا يوجد شيء جيد او سيء لكن التفكير يجعله كذلك"),
    ("ar", "ان تكون او لا تكون تلك هي المسالة"),
    ("fa", "روباه قهوه ای سریع از روی سگ تنبل می پرد"),
    ("fa", "این خانه ای است که جک ساخت"),
    ("fa", "ساعت چند است و ما کجا می رویم"),
    ("fa", "او گفت که انها با ما خواهند امد"),
    ("fa", "از همه چیزهایی که دیدیم این بهترین بود"),
    ("fa", "کسی که در خانه شیشه ای زندگی می کند نباید سنگ بیندازد"),
    ("fa", "هیچ چیز خوب یا بد نیست اما اندیشه ان را چنین می سازد"),
    ("fa", "بودن یا نبودن مساله این است"),
    ("ur", "تیز بھوری لومڑی سست کتے کے اوپر سے چھلانگ لگاتی ہے"),
    ("ur", "یہ وہ گھر ہے جو جیک نے بنایا"),
    ("ur", "کیا وقت ہوا ہے اور ہم کہاں جا رہے ہیں"),
    ("ur", "اس نے کہا کہ وہ ہمارے ساتھ ائیں گے"),
    ("ur", "جو کچھ ہم نے دیکھا اس میں یہ سب سے اچھا تھا"),
    ("ur", "جو شیشے کے گھر میں رہتا ہے وہ پتھر نہیں پھینکتا"),
    ("ur", "کوئی چیز اچھی یا بری نہیں لیکن سوچ اسے ایسا بناتی ہے"),
    ("ur", "ہونا یا نہ ہونا سوال یہ ہے"))

  /** round(ln(k)·1e6): smoothed counts 1..13 (max seed trigram count
    * 12) and the three total+vocab denominators (V = 602, totals
    * ar 276 / fa 296 / ur 317). Literal — the d59 oracle joins the
    * same integers; LangIdSpec pins each entry against Math.log.
    */
  private[graft] val lnMicro: Map[Int, Long] = Map(
    1 -> 0L, 2 -> 693147L, 3 -> 1098612L, 4 -> 1386294L, 5 -> 1609438L,
    6 -> 1791759L, 7 -> 1945910L, 8 -> 2079442L, 9 -> 2197225L,
    10 -> 2302585L, 11 -> 2397895L, 12 -> 2484907L, 13 -> 2564949L,
    878 -> 6777647L, 898 -> 6800170L, 919 -> 6823286L)

  /** The oracle-side normalize class, derived from [[alphabet]]. No
    * lowercasing: Arabic script has no case.
    */
  private[graft] val stripRe: String = "[^" + alphabet + "]"

  private[graft] val model =
    new TrigramNb(langs, seeds, stripRe, lnMicro, undMarginMicro)

  private[graft] def normalize(text: String): String = model.normalize(text)
  private[graft] def trigrams(text: String): Seq[String] = model.trigrams(text)
  private[graft] def vocabSize: Int = model.vocabSize
  private[graft] def totals: Map[String, Int] = model.totals
  private[graft] def maxSeedCount: Int = model.maxSeedCount
  private[graft] def scores(text: String): Map[String, Long] =
    model.scores(text)

  private val alphaSet: Set[Char] = alphabet.toSet

  /** In-alphabet share of the text's ARABIC-script letters, ppm. */
  private[graft] def alphabetCoveragePpm(text: String): Long = {
    var arab = 0L
    var kept = 0L
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (Character.isLetter(cp) &&
        Character.UnicodeScript.of(cp) ==
          java.lang.Character.UnicodeScript.ARABIC) {
        arab += 1
        if (cp <= Char.MaxValue && alphaSet(cp.toChar)) kept += 1
      }
      i += Character.charCount(cp)
    }
    if (arab == 0) 1000000L else (kept * 1000000L) / arab
  }

  def predict(text: String): String =
    if (alphabetCoveragePpm(text) < alphabetCoverageMinPpm) "und"
    else model.predict(text)
}

/** The Hebrew-script trigram family (he/yi) behind [[LangId.route]]'s
  * script dispatch — same NB core. Yiddish in Hebrew letters is
  * trigram-distinct from Hebrew at every turn (דער/וואס/נישט function
  * words, געוו verb prefixes, double-vav/double-yod digraphs), so the
  * two separate cleanly. The alphabet is the full Hebrew block
  * (27 letters incl. finals) plus the Yiddish ligature letters
  * (װ ױ ײ, U+05F0–05F2) so ligature-typed Yiddish is not torn apart by
  * the strip — ligature forms score as unseen trigrams rather than
  * word-splitting spaces.
  *
  * NO alphabet-coverage rule: every Hebrew-script language writes in
  * the same 27 letters, so coverage carries no out-of-set signal (the
  * Cyrillic/Arabic families refuse Serbian/Kurdish on letters the
  * model alphabet LACKS — there is no such letter here). Refusal rides
  * the margin alone, and the margin honestly cannot refuse Talmudic
  * Aramaic: it shares Hebrew's letters AND its trigram mass, so
  * Aramaic quotes land `he` (pinned as a documented limitation in
  * LangIdSpec — the same miss every production langid makes).
  */
object HebLangId {

  /** Tie order = alphabetical. */
  val langs: Seq[String] = Seq("he", "yi")

  /** Per-trigram margin, same decision rule and value as the other
    * families — in-set held-out sentences clear ≥ ~222k
    * micro-nats/trigram over the runner-up (measured in
    * tools/langid/calc_heb_deva.py, pinned in LangIdSpec).
    */
  val undMarginMicro: Long = 25000L

  /** Full Hebrew block (finals included) + Yiddish ligature letters. */
  private[graft] val alphabet: String =
    "אבגדהוזחטיכךלמםנןסעפףצץקרשת" + "װױײ"

  // Seed corpora: the same 8 function-word-heavy sentences as the
  // other families, in each language's own words (Yiddish in YIVO-ish
  // unpointed spelling with doubled letters, the form crawled text
  // overwhelmingly carries). MUST stay byte-identical to the d60
  // oracle's VALUES.
  private[graft] val seeds: Seq[(String, String)] = Seq(
    ("he", "השועל החום המהיר קופץ מעל הכלב העצלן"),
    ("he", "זה הבית אשר בנה גק"),
    ("he", "מה השעה ולאן אנחנו הולכים"),
    ("he", "היא אמרה שהם יבואו איתנו"),
    ("he", "מכל הדברים שראינו זה היה הטוב ביותר"),
    ("he", "מי שגר בבית זכוכית לא צריך לזרוק אבנים"),
    ("he", "אין דבר טוב או רע אלא המחשבה עושה אותו כך"),
    ("he", "להיות או לא להיות זו השאלה"),
    ("yi", "דער גיכער ברוינער פוקס שפרינגט איבער דעם פוילן הונט"),
    ("yi", "דאס איז דאס הויז וואס יאנקל האט געבויט"),
    ("yi", "וויפל איז דער זייגער און וווהין גייען מיר"),
    ("yi", "זי האט געזאגט אז זיי וועלן קומען מיט אונדז"),
    ("yi", "פון אלע זאכן וואס מיר האבן געזען איז דאס געווען דאס בעסטע"),
    ("yi", "ווער עס וווינט אין א גלעזערן הויז זאל נישט ווארפן שטיינער"),
    ("yi", "עס איז נישטא קיין גוטס אדער שלעכטס נאר דער געדאנק מאכט עס אזוי"),
    ("yi", "זיין אדער נישט זיין דאס איז די פראגע"))

  /** round(ln(k)·1e6): smoothed counts 1..12 (max seed trigram count
    * 11) and the two total+vocab denominators (V = 425, totals
    * he 243 / yi 384). Literal — the d60 oracle joins the same
    * integers; LangIdSpec pins each entry against Math.log.
    */
  private[graft] val lnMicro: Map[Int, Long] = Map(
    1 -> 0L, 2 -> 693147L, 3 -> 1098612L, 4 -> 1386294L, 5 -> 1609438L,
    6 -> 1791759L, 7 -> 1945910L, 8 -> 2079442L, 9 -> 2197225L,
    10 -> 2302585L, 11 -> 2397895L, 12 -> 2484907L,
    668 -> 6504288L, 809 -> 6695799L)

  /** The oracle-side normalize class, derived from [[alphabet]]. No
    * lowercasing: Hebrew script has no case.
    */
  private[graft] val stripRe: String = "[^" + alphabet + "]"

  private[graft] val model =
    new TrigramNb(langs, seeds, stripRe, lnMicro, undMarginMicro)

  private[graft] def normalize(text: String): String = model.normalize(text)
  private[graft] def trigrams(text: String): Seq[String] = model.trigrams(text)
  private[graft] def vocabSize: Int = model.vocabSize
  private[graft] def totals: Map[String, Int] = model.totals
  private[graft] def maxSeedCount: Int = model.maxSeedCount
  private[graft] def scores(text: String): Map[String, Long] =
    model.scores(text)

  def predict(text: String): String = model.predict(text)
}

/** The Devanagari trigram family (hi/mr/ne) behind [[LangId.route]]'s
  * script dispatch — same NB core. Unlike the Arabic/Cyrillic
  * families, the alphabet class must include the DEPENDENT VOWEL SIGNS
  * (matras), virama, anusvara, candrabindu, and visarga: Devanagari
  * orthography carries half its signal in them (Hindi के/है vs Marathi
  * आहे/ण vs Nepali छ/ँदै endings), and they are mandatory marks, not
  * optional diacritics like Arabic harakat. Nukta forms (ड़ ज़ फ़) are
  * excluded — crawled text mixes precomposed and decomposed encodings
  * of them, and a normalization-sensitive alphabet would make the two
  * engines disagree; the bare-consonant residue still scores.
  *
  * NO alphabet-coverage rule (the Hebrew-family reasoning): hi/mr/ne
  * plus Sanskrit all write in the same signs. Sanskrit is the honest
  * margin boundary — tatsama vocabulary IS the shared formal lexicon
  * of these languages, so short Sanskrit maxims sometimes clear the
  * margin as mr/hi (pinned as a documented limitation in LangIdSpec).
  */
object DevaLangId {

  /** Tie order = alphabetical. */
  val langs: Seq[String] = Seq("hi", "mr", "ne")

  /** Per-trigram margin, same rule and value as the other families —
    * in-set held-out sentences clear ≥ ~79k micro-nats/trigram
    * (measured in tools/langid/calc_heb_deva.py, pinned in LangIdSpec).
    */
  val undMarginMicro: Long = 25000L

  /** Independent vowels + consonants (incl. Marathi ळ) + avagraha +
    * matras + virama + anusvara/candrabindu/visarga.
    */
  private[graft] val alphabet: String =
    "अआइईउऊऋएऐओऔकखगघङचछजझञटठडढणतथदधनपफबभमयरलवशषसहळऽ" +
      "ािीुूृेैोौ्ंँः"

  // Seed corpora: the same 8 sentences per language, nukta-free. MUST
  // stay byte-identical to the d61 oracle's VALUES.
  private[graft] val seeds: Seq[(String, String)] = Seq(
    ("hi", "तेज भूरी लोमडी आलसी कुत्ते के ऊपर से कूदती है"),
    ("hi", "यह वह घर है जो जैक ने बनाया"),
    ("hi", "क्या समय हुआ है और हम कहाँ जा रहे हैं"),
    ("hi", "उसने कहा कि वे हमारे साथ आएँगे"),
    ("hi", "जो कुछ हमने देखा उनमें यह सबसे अच्छा था"),
    ("hi", "जो शीशे के घर में रहता है उसे पत्थर नहीं फेंकना चाहिए"),
    ("hi", "कोई चीज अच्छी या बुरी नहीं होती सोच उसे वैसा बनाती है"),
    ("hi", "होना या न होना यही प्रश्न है"),
    ("mr", "वेगवान तपकिरी कोल्हा आळशी कुत्र्यावरून उडी मारतो"),
    ("mr", "हे ते घर आहे जे जेकने बांधले"),
    ("mr", "किती वाजले आहेत आणि आपण कुठे जात आहोत"),
    ("mr", "ती म्हणाली की ते आमच्याबरोबर येतील"),
    ("mr", "आम्ही पाहिलेल्या सर्व गोष्टींपैकी हे सर्वात चांगले होते"),
    ("mr", "जो काचेच्या घरात राहतो त्याने दगड फेकू नयेत"),
    ("mr", "कोणतीही गोष्ट चांगली किंवा वाईट नसते विचार तिला तशी बनवतो"),
    ("mr", "असणे किंवा नसणे हाच प्रश्न आहे"),
    ("ne", "छिटो खैरो फ्याउरो अल्छी कुकुर माथि उफ्रन्छ"),
    ("ne", "यो त्यो घर हो जुन ज्याकले बनायो"),
    ("ne", "कति बज्यो र हामी कहाँ जाँदैछौं"),
    ("ne", "उनले भनिन कि उनीहरू हामीसँग आउनेछन्"),
    ("ne", "हामीले देखेका सबै कुराहरूमध्ये यो सबैभन्दा राम्रो थियो"),
    ("ne", "जो सिसाको घरमा बस्छ उसले ढुङ्गा हान्नु हुँदैन"),
    ("ne", "कुनै कुरा राम्रो वा नराम्रो हुँदैन सोचले त्यसलाई त्यस्तो बनाउँछ"),
    ("ne", "हुनु वा नहुनु यही प्रश्न हो"))

  /** round(ln(k)·1e6): smoothed counts 1..8 (max seed trigram count 7)
    * and the three total+vocab denominators (V = 645, totals hi 312 /
    * mr 332 / ne 327). Literal — the d61 oracle joins the same
    * integers; LangIdSpec pins each entry against Math.log.
    */
  private[graft] val lnMicro: Map[Int, Long] = Map(
    1 -> 0L, 2 -> 693147L, 3 -> 1098612L, 4 -> 1386294L, 5 -> 1609438L,
    6 -> 1791759L, 7 -> 1945910L, 8 -> 2079442L,
    957 -> 6863803L, 972 -> 6879356L, 977 -> 6884487L)

  /** The oracle-side normalize class, derived from [[alphabet]]. */
  private[graft] val stripRe: String = "[^" + alphabet + "]"

  private[graft] val model =
    new TrigramNb(langs, seeds, stripRe, lnMicro, undMarginMicro)

  private[graft] def normalize(text: String): String = model.normalize(text)
  private[graft] def trigrams(text: String): Seq[String] = model.trigrams(text)
  private[graft] def vocabSize: Int = model.vocabSize
  private[graft] def totals: Map[String, Int] = model.totals
  private[graft] def maxSeedCount: Int = model.maxSeedCount
  private[graft] def scores(text: String): Map[String, Long] =
    model.scores(text)

  def predict(text: String): String = model.predict(text)
}

/** Hanzi-UNIGRAM naive Bayes — the core behind [[HanLangId]]. The Han
  * script cannot ride [[TrigramNb]]: the URO alone holds 20k+
  * codepoints, so a trigram table would explode past the literal-seed
  * discipline, while single hanzi already carry the script-variant
  * signal (simplified-only vs traditional-only characters are among
  * the most frequent in running text — 这/這, 们/們, 说/說). The
  * decision unit ADAPTS accordingly: micro-nats PER CHARACTER (the
  * per-trigram margin, re-based; documented in the d62 oracle).
  * Normalize strips to the URO (U+4E00–9FFF) with NO spaces and no
  * padding — unigram counts are order-free. Ext-A+ ideographs are
  * stripped like nukta forms in the Devanagari family (rare, and BMP
  * restriction keeps Java char and DuckDB codepoint indexing aligned).
  * Same cross-engine discipline as TrigramNb: integer scores, literal
  * ln table, alphabetical tie, margin else `und`.
  */
private[graft] final class UnigramNb(
    val langs: Seq[String],
    val seeds: Seq[(String, String)],
    stripRe: String,
    val lnMicro: Map[Int, Long],
    val undMarginMicro: Long) {

  def normalize(text: String): String =
    text.replaceAll(stripRe + "+", "")

  def unigrams(text: String): Seq[String] =
    normalize(text).map(_.toString)

  private val counts: Map[String, Map[String, Int]] =
    seeds.groupBy(_._1).map { case (l, ss) =>
      l -> ss.flatMap(s => unigrams(s._2))
        .groupBy(identity).map { case (c, xs) => c -> xs.size }
    }
  val vocabSize: Int =
    counts.valuesIterator.flatMap(_.keysIterator).toSet.size
  val totals: Map[String, Int] =
    counts.map { case (l, c) => l -> c.values.sum }
  val maxSeedCount: Int =
    counts.valuesIterator.flatMap(_.valuesIterator).max

  private def scoresOf(us: Seq[String]): Map[String, Long] =
    langs.map { l =>
      val c = counts(l)
      val base = lnMicro(totals(l) + vocabSize)
      l -> us.foldLeft(0L)((acc, u) => acc + lnMicro(c.getOrElse(u, 0) + 1))
        .-(us.size.toLong * base)
    }.toMap

  def scores(text: String): Map[String, Long] = scoresOf(unigrams(text))

  def predict(text: String): String = {
    val us = unigrams(text)
    if (us.isEmpty) return "und"
    val sc = scoresOf(us)
    val ordered = langs.sortBy(l => (-sc(l), l))
    if (sc(ordered.head) - sc(ordered(1)) >= undMarginMicro * us.size)
      ordered.head
    else "und"
  }
}

/** The Han family (zh-hans/zh-hant) behind [[LangId.route]]'s script
  * dispatch — the single largest non-Latin slice of any web crawl,
  * previously a named refusal. Kana presence still implies `ja` FIRST
  * (route order), so this model only ever sees kana-free Han text.
  *
  * Seeds are the same 8 sentences as every other family, written in
  * Simplified and Traditional Chinese — each pair is a CHARACTER-WISE
  * variant (equal length), so the two models' totals are identical,
  * the NB base terms cancel, and the score gap is carried purely by
  * script-variant characters (过/過, 这/這, 们/們, 说/說 …); shared
  * characters contribute exactly zero. Margin measured in
  * tools/langid/calc_han.py: held-out in-set pool clears ≥ ~123k
  * micro-nats/char, kanji-only Japanese with a stray seed character
  * measures ≤ ~63k, seed-char-free kanji/hanja text measures 0 —
  * 80000 splits the populations. Honest boundaries (pinned in
  * LangIdSpec): variant-free text (shared-char-only zh, most
  * kanji-only ja) lands `und`; a very SHORT kanji compound carrying a
  * seed character (将来性) can cross the per-char margin — the
  * Aramaic→he analogue of this family.
  */
object HanLangId {

  /** Tie order = alphabetical. */
  val langs: Seq[String] = Seq("zh-hans", "zh-hant")

  /** Micro-nats per CHARACTER (the adapted per-trigram unit). */
  val undMarginMicro: Long = 80000L

  // Seed corpora: pairwise character-variant sentences. MUST stay
  // byte-identical to the d62 oracle's VALUES.
  private[graft] val seeds: Seq[(String, String)] = Seq(
    ("zh-hans", "敏捷的棕色狐狸跳过懒惰的狗"),
    ("zh-hans", "这是杰克建造的房子"),
    ("zh-hans", "现在几点了我们要去哪里"),
    ("zh-hans", "她说他们会和我们一起来"),
    ("zh-hans", "在我们看到的所有东西中这是最好的"),
    ("zh-hans", "住在玻璃房子里的人不应该扔石头"),
    ("zh-hans", "没有什么好坏之分只是想法使然"),
    ("zh-hans", "生存还是毁灭这是一个问题"),
    ("zh-hant", "敏捷的棕色狐狸跳過懶惰的狗"),
    ("zh-hant", "這是傑克建造的房子"),
    ("zh-hant", "現在幾點了我們要去哪裡"),
    ("zh-hant", "她說他們會和我們一起來"),
    ("zh-hant", "在我們看到的所有東西中這是最好的"),
    ("zh-hant", "住在玻璃房子裡的人不應該扔石頭"),
    ("zh-hant", "沒有什麼好壞之分只是想法使然"),
    ("zh-hant", "生存還是毀滅這是一個問題"))

  /** round(ln(k)·1e6): smoothed counts 1..7 (max seed unigram count 6)
    * and the ONE total+vocab denominator (V = 102, totals 101 both —
    * the pairwise-variant seeds guarantee equality). Literal — the d62
    * oracle joins the same integers; LangIdSpec pins each entry
    * against Math.log.
    */
  private[graft] val lnMicro: Map[Int, Long] = Map(
    1 -> 0L, 2 -> 693147L, 3 -> 1098612L, 4 -> 1386294L, 5 -> 1609438L,
    6 -> 1791759L, 7 -> 1945910L,
    203 -> 5313206L)

  /** URO-only strip class — one literal valid in BOTH Java regex and
    * DuckDB's RE2 (`\x{...}` range inside a class), so engine and
    * oracle share it verbatim. No case, no spaces.
    */
  private[graft] val stripRe: String = "[^\\x{4e00}-\\x{9fff}]"

  private[graft] val model =
    new UnigramNb(langs, seeds, stripRe, lnMicro, undMarginMicro)

  private[graft] def normalize(text: String): String = model.normalize(text)
  private[graft] def unigrams(text: String): Seq[String] =
    model.unigrams(text)
  private[graft] def vocabSize: Int = model.vocabSize
  private[graft] def totals: Map[String, Int] = model.totals
  private[graft] def maxSeedCount: Int = model.maxSeedCount
  private[graft] def scores(text: String): Map[String, Long] =
    model.scores(text)

  def predict(text: String): String = model.predict(text)
}
