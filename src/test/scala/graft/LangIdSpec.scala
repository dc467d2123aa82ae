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

  test("langid: held-out sentences classify for all eight languages; normalization strips non-letters") {
    val held = Seq(
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
      ("sv", "regeringen sade att den inte skulle andra lagen"))
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
    // Finnish and Turkish: no seed profile — the per-trigram margin
    // (undMarginMicro) must refuse to name them rather than guess a
    // Latin-script neighbor
    assert(LangId.predict(
      "hyvaa paivaa me menemme torille huomenna aamulla") === "und")
    assert(LangId.predict(
      "gunaydin yarin sabah pazara gidiyoruz") === "und")
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
}
