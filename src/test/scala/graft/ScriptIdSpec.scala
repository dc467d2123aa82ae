package graft

import graft.functions.ScriptId

/** Unicode-script routing: exact JVM script classification over letter
  * codepoints, supplementary-plane awareness, and the refuse-don't-
  * guess empty case.
  */
class ScriptIdSpec extends GraftSparkSpec {

  test("script: real mixed sentences classify and route") {
    assert(ScriptId.dominant("the quick brown fox") === "latin")
    assert(ScriptId.dominant("Быстрая коричневая лиса") === "cyrillic")
    assert(ScriptId.dominant("素早い茶色のキツネ") === "hiragana" ||
      ScriptId.dominant("素早い茶色のキツネ") === "han") // mixed ja text
    assert(ScriptId.dominant("빠른 갈색 여우") === "hangul")
    assert(ScriptId.dominant("الثعلب البني السريع") === "arabic")
    assert(ScriptId.dominant("γρήγορη καφέ αλεπού") === "greek")
    // latin-labeled page with a couple of loanwords stays latin
    val h = ScriptId.histogram("naïve café test текст")
    assert(h("latin") === 13L && h("cyrillic") === 5L)
    assert(ScriptId.dominant("naïve café test текст") === "latin")
  }

  test("script: digits/punct carry no signal; empty refuses; supplementary Han counts") {
    assert(ScriptId.histogram("123 !!! ...") === Map.empty[String, Long])
    assert(ScriptId.dominant("123 !!! ...") === "none")
    assert(ScriptId.dominant("") === "none")
    // U+20000 (supplementary-plane Han): codepoint-aware walk, not
    // surrogate halves
    val supp = new String(Character.toChars(0x20000)) * 3 + " ab"
    val h = ScriptId.histogram(supp)
    assert(h("han") === 3L && h("latin") === 2L)
    assert(ScriptId.dominant(supp) === "han")
    // alphabetical tie rule
    assert(ScriptId.dominant("ab ав") === "cyrillic") // 2 vs 2 letters
  }
}
