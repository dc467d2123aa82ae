#!/usr/bin/env python3
"""Derive the literal constants (vocab size, totals, max count, ln table
keys) and measure decision margins for the Hebrew (he/yi) and Devanagari
(hi/mr/ne) trigram families, replicating TrigramNb's arithmetic exactly.
"""
import math
import re

HEB_ALPHA = "אבגדהוזחטיכךלמםנןסעפףצץקרשתװױײ"
DEVA_ALPHA = ("अआइईउऊऋएऐओऔकखगघङचछजझञटठडढणतथदधनपफबभमयरलवशषसहळऽ"
              "ािीुूृेैोौ्ंँः")

HEB_SEEDS = [
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
    ("yi", "זיין אדער נישט זיין דאס איז די פראגע"),
]
HEB_POOL = [
    ("he", "אנחנו קוראים ספרים כל ערב אחרי העבודה"),
    ("he", "מזג האוויר היום טוב ואנחנו הולכים לטייל בפארק"),
    ("he", "הוא לא ידע מה להגיד ופשוט שתק"),
    ("yi", "מיר לייענען ביכער יעדן אוונט נאך דער ארבעט"),
    ("yi", "דער וועטער איז היינט גוט און מיר גייען שפאצירן אין פארק"),
    ("yi", "ער האט נישט געוווסט וואס צו זאגן און האט פשוט געשוויגן"),
]
# out-of-set Hebrew-script probes: Aramaic (Talmudic) — shares the
# alphabet, so only the margin can refuse it
HEB_OOS = [
    ("arc", "מאן דיהיב חיי יהיב מזוני"),
    ("arc", "כל מילתא דעבידא לאגלויי לא משקרי בה אינשי"),
]

DEVA_SEEDS = [
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
    ("ne", "हुनु वा नहुनु यही प्रश्न हो"),
]
DEVA_POOL = [
    ("hi", "हम हर शाम काम के बाद किताबें पढते हैं"),
    ("hi", "आज मौसम अच्छा है और हम पार्क में घूमने जा रहे हैं"),
    ("hi", "उसे समझ नहीं आया कि क्या कहे और वह चुप रहा"),
    ("mr", "आम्ही रोज संध्याकाळी कामानंतर पुस्तके वाचतो"),
    ("mr", "आज हवामान छान आहे आणि आम्ही बागेत फिरायला जात आहोत"),
    ("mr", "त्याला काय बोलावे ते समजले नाही आणि तो गप्प राहिला"),
    ("ne", "हामी हरेक साँझ काम पछि किताबहरू पढ्छौं"),
    ("ne", "आज मौसम राम्रो छ र हामी बगैंचामा घुम्न जाँदैछौं"),
    ("ne", "उसलाई के भन्ने थाहा भएन र ऊ चुप लाग्यो"),
]
# out-of-set Devanagari probes: Sanskrit — same alphabet, margin only
DEVA_OOS = [
    ("sa", "धर्मो रक्षति रक्षितः सत्यमेव जयते नानृतम"),
    ("sa", "विद्या ददाति विनयं विनयाद्याति पात्रताम"),
]


def lnmicro(k):
    return round(math.log(k) * 1e6)


def family(name, alpha, seeds, pool, oos):
    strip = re.compile('[^' + alpha + ']+')

    def trigrams(s):
        p = ' ' + strip.sub(' ', s).strip() + ' '
        return [p[i:i+3] for i in range(len(p) - 2)] if len(p) >= 3 else []

    langs = sorted({l for l, _ in seeds})
    counts = {}
    for l, s in seeds:
        for t in trigrams(s):
            counts.setdefault(l, {})
            counts[l][t] = counts[l].get(t, 0) + 1
    vocab = len({t for c in counts.values() for t in c})
    totals = {l: sum(c.values()) for l, c in counts.items()}
    maxc = max(v for c in counts.values() for v in c.values())
    print(f'== {name}: langs={langs} V={vocab} totals={totals} maxcount={maxc}')
    ks = sorted(set(range(1, maxc + 2)) | {totals[l] + vocab for l in langs})
    print('  lnMicro entries:')
    line = ', '.join(f'{k} -> {lnmicro(k)}L' for k in ks)
    print('   ', line)

    def scores(ts):
        out = {}
        for l in langs:
            base = lnmicro(totals[l] + vocab)
            out[l] = sum(lnmicro(counts[l].get(t, 0) + 1) for t in ts) \
                - len(ts) * base
        return out

    def margin(s):
        ts = trigrams(s)
        sc = scores(ts)
        o = sorted(langs, key=lambda l: (-sc[l], l))
        return o[0], (sc[o[0]] - sc[o[1]]) / len(ts)

    print('  in-set pool margins (want WELL above the chosen margin):')
    worst = 1e18
    for l, s in pool:
        pred, m = margin(s)
        tag = 'OK ' if pred == l else 'MISPRED'
        worst = min(worst, m)
        print(f'    {tag} {l}: pred={pred} margin/tri={m:9.0f}')
    print(f'    worst in-set margin: {worst:9.0f}')
    print('  out-of-set margins (want BELOW the chosen margin):')
    best = -1e18
    for l, s in oos:
        pred, m = margin(s)
        best = max(best, m)
        print(f'    {l}: pred={pred} margin/tri={m:9.0f}')
    print(f'    best out-of-set margin: {best:9.0f}')
    # seed sanity: every seed predicts its own language
    for l, s in seeds:
        pred, m = margin(s)
        assert pred == l, (name, l, s, pred)
    # alphabet sanity: every seed/pool char is whitespace or in-alphabet
    for _, s in seeds + pool:
        for ch in s:
            assert ch == ' ' or ch in alpha, (name, repr(ch), s)
    print()


family('hebrew', HEB_ALPHA, HEB_SEEDS, HEB_POOL, HEB_OOS)
family('devanagari', DEVA_ALPHA, DEVA_SEEDS, DEVA_POOL, DEVA_OOS)
