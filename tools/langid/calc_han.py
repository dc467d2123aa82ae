#!/usr/bin/env python3
"""Derive the literal constants (vocab size, totals, max count, ln table
keys) and measure decision margins for the Han unigram family
(zh-hans/zh-hant), replicating UnigramNb's arithmetic exactly.

The Han family is UNIGRAM, not trigram: the URO alone holds 20k+
codepoints, so a trigram table would explode past the literal-seed
discipline while single hanzi already carry the script-variant signal
(simplified-only vs traditional-only characters). The decision unit is
micro-nats PER CHARACTER (the per-trigram margin, adapted).
"""
import math

# CJK Unified Ideographs (URO) only — Ext A+ are stripped like nukta
# forms in the Devanagari family (rare, and mixed encodings would split
# the engines).
HAN_LO, HAN_HI = 0x4E00, 0x9FFF

SEEDS = [
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
    ("zh-hant", "生存還是毀滅這是一個問題"),
]

POOL = [
    ("zh-hans", "我们每天晚上下班后都在家里读书"),
    ("zh-hans", "今天天气很好我们去公园散步"),
    ("zh-hans", "他不知道该说什么只好保持沉默"),
    ("zh-hant", "我們每天晚上下班後都在家裡讀書"),
    ("zh-hant", "今天天氣很好我們去公園散步"),
    ("zh-hant", "他不知道該說什麼只好保持沉默"),
]

# out-of-set Han-script probes: kanji-only Japanese and hanja phrases.
# Kana-free ja kanji runs written in shinjitai/kyujitai are genuinely
# ambiguous with zh; the ones below carry no seed characters, so the
# margin refuses them — a seed-char-bearing kyujitai run CAN land
# zh-hant (documented limitation, the Aramaic->he analogue).
OUT = [
    ("ja-kanji", "東日本大震災復興支援金"),
    ("ja-kanji", "新幹線特急券自由席"),
    ("hanja", "大韓民國憲法前文"),
]


def unigrams(text):
    return [c for c in text if HAN_LO <= ord(c) <= HAN_HI]


def main():
    counts = {}
    totals = {}
    for lang, s in SEEDS:
        for c in unigrams(s):
            counts.setdefault(lang, {})
            counts[lang][c] = counts[lang].get(c, 0) + 1
            totals[lang] = totals.get(lang, 0) + 1
    vocab = set()
    for m in counts.values():
        vocab.update(m.keys())
    V = len(vocab)
    maxc = max(max(m.values()) for m in counts.values())
    print(f"V = {V}")
    print(f"totals = {totals}")
    print(f"maxSeedCount = {maxc}")
    # seed pairs are char-wise variants, so totals must be equal — the
    # base terms then cancel and only variant characters carry signal
    assert len(set(totals.values())) == 1, "totals must match"

    ks = sorted(set(range(1, maxc + 2)) |
                {t + V for t in totals.values()})
    ln = {k: round(math.log(k) * 1e6) for k in ks}
    print("lnMicro entries:")
    print(", ".join(f"{k} -> {v}L" for k, v in ln.items()))

    langs = sorted(counts.keys())

    def scores(text):
        us = unigrams(text)
        out = {}
        for l in langs:
            base = ln[totals[l] + V]
            out[l] = sum(ln[counts[l].get(c, 0) + 1] for c in us) \
                - len(us) * base
        return out, len(us)

    print("\npool margins (micro-nats/char):")
    for true, s in POOL:
        sc, n = scores(s)
        o = sorted(langs, key=lambda l: (-sc[l], l))
        gap = (sc[o[0]] - sc[o[1]]) // n
        print(f"  {true:8s} -> {o[0]:8s} gap/char={gap}")
    print("out-of-set margins:")
    for true, s in OUT:
        sc, n = scores(s)
        o = sorted(langs, key=lambda l: (-sc[l], l))
        gap = (sc[o[0]] - sc[o[1]]) // n
        print(f"  {true:8s} -> {o[0]:8s} gap/char={gap}")
    print("seed self-margins (sanity):")
    for true, s in SEEDS[:2] + SEEDS[8:10]:
        sc, n = scores(s)
        o = sorted(langs, key=lambda l: (-sc[l], l))
        gap = (sc[o[0]] - sc[o[1]]) // n
        print(f"  {true:8s} -> {o[0]:8s} gap/char={gap}")


if __name__ == "__main__":
    main()
