package graft.functions

/** Unicode-script detection — the routing stage BEFORE language id in
  * a real crawl mix: [[LangId]] is a Latin-script model (its normalize
  * strips to [a-z], so Cyrillic/CJK/Arabic text honestly lands `und`),
  * and the fix is not to widen one trigram model to every writing
  * system but to ROUTE by script first — Latin text to the trigram
  * model, other scripts to their own handlers (or to per-script corpus
  * buckets). Classification uses `Character.UnicodeScript` (the JVM's
  * Unicode script property — exact, no heuristics) over LETTER
  * codepoints only; digits, punctuation, and whitespace carry no
  * script signal. Counts are integers and shares are ppm (integer
  * div), the cross-engine discipline.
  *
  * 100 TB shape: a narrow per-row map, no exchange — the same shape as
  * [[LangId.predict]].
  */
object ScriptId {

  /** Alphabetical — the tie order, like [[LangId.langs]]. */
  val scripts: Seq[String] = Seq("arabic", "armenian", "bengali",
    "cyrillic", "devanagari", "ethiopic", "georgian", "greek", "gujarati",
    "gurmukhi", "han", "hangul", "hebrew", "hiragana", "kannada",
    "katakana", "khmer", "lao", "latin", "malayalam", "myanmar", "oriya",
    "sinhala", "tamil", "telugu", "thaana", "thai", "other")

  import java.lang.Character.UnicodeScript
  private val named: Map[UnicodeScript, String] = Map(
    UnicodeScript.ARABIC -> "arabic",
    UnicodeScript.ARMENIAN -> "armenian",
    UnicodeScript.BENGALI -> "bengali",
    UnicodeScript.CYRILLIC -> "cyrillic",
    UnicodeScript.DEVANAGARI -> "devanagari",
    UnicodeScript.ETHIOPIC -> "ethiopic",
    UnicodeScript.GEORGIAN -> "georgian",
    UnicodeScript.GREEK -> "greek",
    UnicodeScript.GUJARATI -> "gujarati",
    UnicodeScript.GURMUKHI -> "gurmukhi",
    UnicodeScript.HAN -> "han",
    UnicodeScript.HANGUL -> "hangul",
    UnicodeScript.HEBREW -> "hebrew",
    UnicodeScript.HIRAGANA -> "hiragana",
    UnicodeScript.KANNADA -> "kannada",
    UnicodeScript.KATAKANA -> "katakana",
    UnicodeScript.KHMER -> "khmer",
    UnicodeScript.LAO -> "lao",
    UnicodeScript.LATIN -> "latin",
    UnicodeScript.MALAYALAM -> "malayalam",
    UnicodeScript.MYANMAR -> "myanmar",
    UnicodeScript.ORIYA -> "oriya",
    UnicodeScript.SINHALA -> "sinhala",
    UnicodeScript.TAMIL -> "tamil",
    UnicodeScript.TELUGU -> "telugu",
    UnicodeScript.THAANA -> "thaana",
    UnicodeScript.THAI -> "thai")

  /** Letter-codepoint counts per script class (named classes above;
    * any other script's letters count as "other"; non-letters are
    * ignored). Codepoint-aware: supplementary-plane letters (e.g. rare
    * Han) classify correctly instead of as surrogate halves.
    */
  def histogram(text: String): Map[String, Long] = {
    val counts = scala.collection.mutable.Map[String, Long]()
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (Character.isLetter(cp)) {
        val k = named.getOrElse(UnicodeScript.of(cp), "other")
        counts(k) = counts.getOrElse(k, 0L) + 1L
      }
      i += Character.charCount(cp)
    }
    counts.toMap
  }

  /** Dominant script of the text's letters — ties break alphabetically,
    * no letters at all → "none" (the d5 `und` discipline: refuse,
    * don't guess).
    */
  def dominant(text: String): String = dominantOf(histogram(text))

  /** Dominant script of a pre-computed histogram (callers that also
    * need the counts — [[LangId.route]] — classify in ONE pass).
    */
  def dominantOf(h: Map[String, Long]): String =
    if (h.isEmpty) "none"
    else scripts.filter(h.contains).minBy(s => (-h(s), s))
}
