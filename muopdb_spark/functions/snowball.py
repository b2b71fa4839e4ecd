"""Snowball stemmers, pure Python — the full reference language set.

The reference stems 19 languages via the rust-stemmers Snowball port
(rs/index/src/tokenizer/stemming_tokenizer.rs:22-44, language map).
This environment has no stemmer package, so every language is
implemented here directly from the PUBLISHED Snowball algorithm
descriptions (snowballstem.org — M.F. Porter's public-domain
specifications and the contributed algorithms for ru/tr/ro/hu/fi/el/
ar/ta; Greek/Arabic/Tamil are documented reduced renditions — see
their docstrings). Vietnamese routes to the English stemmer, as in the
reference. Deterministic, dependency-free, and Arrow-batch friendly
(plain str -> str functions).

Conformance: pinned by pytest vectors (tests/test_snowball.py) covering
the algorithms' published examples and inflection-family collapses; not
certified against the full official sample vocabularies (unavailable
offline) — any residual deviation is deterministic and shared by index
and query sides, so Contains semantics stay consistent.
"""

from __future__ import annotations

# --------------------------------------------------------------- helpers


def _standard_r1_r2(word: str, vowels: str) -> tuple[int, int]:
    """R1: region after the first non-vowel following a vowel; R2: the
    same, computed inside R1. Returned as start offsets (len(word) when
    the region is empty)."""

    def after_first_nonvowel_after_vowel(start: int) -> int:
        i = start
        n = len(word)
        while i < n and word[i] not in vowels:
            i += 1
        while i < n and word[i] in vowels:
            i += 1
        return min(i + 1, n) if i < n else n

    r1 = after_first_nonvowel_after_vowel(0)
    r2 = after_first_nonvowel_after_vowel(r1)
    return r1, r2


# ---------------------------------------------------------------- German

_DE_VOWELS = "aeiouyäöü"
_DE_S_END = set("bdfghklmnrt")
_DE_ST_END = set("bdfghklmnt")


def german_stem(word: str) -> str:
    w = word.lower().replace("ß", "ss")
    # protect u/y between vowels (treated as consonants)
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if chars[i] in "uy" and chars[i - 1] in _DE_VOWELS and chars[i + 1] in _DE_VOWELS:
            chars[i] = chars[i].upper()
    w = "".join(chars)
    vowels = _DE_VOWELS

    r1, r2 = _standard_r1_r2(w, vowels)
    r1 = max(r1, min(3, len(w)))  # R1 starts no earlier than position 3

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    # step 1
    for suf in ("ern", "em", "er"):
        if w.endswith(suf) and in_r1(len(w) - len(suf)):
            w = w[: -len(suf)]
            break
    else:
        for suf in ("en", "es", "e"):
            if w.endswith(suf) and in_r1(len(w) - len(suf)):
                w = w[: -len(suf)]
                if w.endswith("niss"):
                    w = w[:-1]
                break
        else:
            if (
                w.endswith("s")
                and in_r1(len(w) - 1)
                and len(w) >= 2
                and w[-2] in _DE_S_END
            ):
                w = w[:-1]

    # step 2
    for suf in ("est", "en", "er"):
        if w.endswith(suf) and in_r1(len(w) - len(suf)):
            w = w[: -len(suf)]
            break
    else:
        if (
            w.endswith("st")
            and in_r1(len(w) - 2)
            and len(w) >= 6
            and w[-3] in _DE_ST_END
        ):
            w = w[:-2]

    # step 3 (d-suffixes)
    if w.endswith(("end", "ung")):
        if in_r2(len(w) - 3):
            w = w[:-3]
            if w.endswith("ig") and in_r2(len(w) - 2) and not w.endswith("eig"):
                w = w[:-2]
    elif w.endswith(("isch",)):
        if in_r2(len(w) - 4) and not w.endswith("eisch"):
            w = w[:-4]
    elif w.endswith(("ig", "ik")):
        if in_r2(len(w) - 2) and not (w.endswith("eig") or w.endswith("eik")):
            w = w[:-2]
    elif w.endswith(("lich", "heit")):
        if in_r2(len(w) - 4):
            w = w[:-4]
            for pre in ("er", "en"):
                if w.endswith(pre) and in_r1(len(w) - 2):
                    w = w[:-2]
                    break
    elif w.endswith("keit"):
        if in_r2(len(w) - 4):
            w = w[:-4]
            if w.endswith("lich") and in_r2(len(w) - 4):
                w = w[:-4]
            elif w.endswith("ig") and in_r2(len(w) - 2):
                w = w[:-2]

    w = w.lower()
    return w.translate(str.maketrans("äöü", "aou"))


# --------------------------------------------------------------- Spanish

_ES_VOWELS = "aeiouáéíóúü"


def _es_rv(w: str) -> int:
    n = len(w)
    if n < 3:
        return n
    if w[1] not in _ES_VOWELS:
        i = 2
        while i < n and w[i] not in _ES_VOWELS:
            i += 1
        return min(i + 1, n)
    if w[0] in _ES_VOWELS and w[1] in _ES_VOWELS:
        i = 2
        while i < n and w[i] in _ES_VOWELS:
            i += 1
        return min(i + 1, n)
    return 3


_ES_PRON = (
    "selas", "selos", "sela", "selo", "las", "les", "los", "nos",
    "me", "se", "la", "le", "lo",
)
_ES_STEP1 = [
    # (suffixes, action, region): action: "del" | replacement string
    (("amientos", "imientos", "amiento", "imiento", "anzas", "ables",
      "ibles", "istas", "anza", "icos", "icas", "ismo", "able", "ible",
      "ista", "osos", "osas", "ico", "ica", "oso", "osa", "ismos"), "del"),
    (("adoras", "adores", "aciones", "adora", "ación", "antes",
      "ancias", "ador", "ante", "ancia"), "del_ic"),
    (("logías", "logía"), "log"),
    (("uciones", "ución"), "u"),
    (("encias", "encia"), "ente"),
]
_ES_VERB_2B_GU = ("emos", "éis", "en", "es")
_ES_VERB_2B = (
    "aríamos", "eríamos", "iríamos", "iéramos", "iésemos", "aríais",
    "aseis", "eríais", "iríais", "ierais", "ieseis", "asteis", "isteis",
    "ábamos", "áramos", "ásemos", "arían", "arías", "aréis", "erían",
    "erías", "eréis", "irían", "irías", "iréis", "ieran", "iesen",
    "ieron", "iendo", "ieras", "ieses", "abais", "arais", "íamos",
    "emos", "arán", "arás", "aría", "erán", "erás", "ería", "irán",
    "irás", "iría", "iera", "iese", "aste", "iste", "aban", "aran",
    "asen", "aron", "ando", "abas", "adas", "idas", "aras", "ases",
    "íais", "ados", "idos", "amos", "imos", "ará", "aré", "erá", "eré",
    "irá", "iré", "aba", "ada", "ida", "ara", "ase", "ían", "ado",
    "ido", "ías", "áis", "ía", "ad", "ed", "id", "an", "ió", "ar",
    "er", "ir", "as", "ís",
)
_ES_ACCENT = str.maketrans("áéíóúü", "aeiouu")


def spanish_stem(word: str) -> str:
    w = word.lower()
    rv = _es_rv(w)
    r1, r2 = _standard_r1_r2(w, _ES_VOWELS)

    def in_rv(pos: int) -> bool:
        return pos >= rv

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    # step 0: attached pronouns
    for p in _ES_PRON:
        if not w.endswith(p):
            continue
        base = w[: -len(p)]
        for g, repl in (
            ("iéndo", "iendo"), ("ándo", "ando"), ("ár", "ar"),
            ("ér", "er"), ("ír", "ir"),
            ("iendo", None), ("ando", None), ("ar", None), ("er", None),
            ("ir", None),
        ):
            if base.endswith(g) and in_rv(len(base) - len(g)):
                w = base[: -len(g)] + (repl if repl is not None else g)
                break
        else:
            if base.endswith("yendo") and len(base) >= 6 and base[-6] == "u":
                w = base
            continue
        break
    rv = _es_rv(w)
    r1, r2 = _standard_r1_r2(w, _ES_VOWELS)

    # step 1
    changed = False
    done = False
    for sufs, action in _ES_STEP1:
        for suf in sufs:
            if w.endswith(suf):
                pos = len(w) - len(suf)
                if action == "del" and in_r2(pos):
                    w, changed = w[:pos], True
                elif action == "del_ic" and in_r2(pos):
                    w, changed = w[:pos], True
                    if w.endswith("ic") and in_r2(len(w) - 2):
                        w = w[:-2]
                elif action in ("log", "u", "ente") and in_r2(pos):
                    w, changed = w[:pos] + action, True
                done = True
                break
        if done:
            break
    if not done:
        if w.endswith("amente"):
            pos = len(w) - 6
            if in_r1(pos):
                w, changed = w[:pos], True
                if w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                else:
                    for pre in ("os", "ic", "ad"):
                        if w.endswith(pre) and in_r2(len(w) - 2):
                            w = w[:-2]
                            break
            done = True
        elif w.endswith("mente"):
            pos = len(w) - 5
            if in_r2(pos):
                w, changed = w[:pos], True
                for pre in ("ante", "able", "ible"):
                    if w.endswith(pre) and in_r2(len(w) - 4):
                        w = w[:-4]
                        break
            done = True
        elif w.endswith(("idades", "idad")):
            suf = "idades" if w.endswith("idades") else "idad"
            pos = len(w) - len(suf)
            if in_r2(pos):
                w, changed = w[:pos], True
                for pre in ("abil", "ic", "iv"):
                    if w.endswith(pre) and in_r2(len(w) - len(pre)):
                        w = w[: -len(pre)]
                        break
            done = True
        elif w.endswith(("ivas", "ivos", "iva", "ivo")):
            suf = next(s for s in ("ivas", "ivos", "iva", "ivo") if w.endswith(s))
            pos = len(w) - len(suf)
            if in_r2(pos):
                w, changed = w[:pos], True
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
            done = True

    # step 2a (only if step 1 removed nothing)
    if not changed:
        rv = _es_rv(w)
        for suf in ("yeron", "yendo", "yamos", "yais", "yan", "yen",
                    "yas", "yes", "ya", "ye", "yo", "yó"):
            if w.endswith(suf) and in_rv(len(w) - len(suf)):
                if len(w) > len(suf) and w[-len(suf) - 1] == "u":
                    w, changed = w[: -len(suf)], True
                break
    # step 2b (if still nothing removed)
    if not changed:
        rv = _es_rv(w)
        hit = False
        for suf in _ES_VERB_2B_GU:
            if w.endswith(suf) and in_rv(len(w) - len(suf)):
                w, changed, hit = w[: -len(suf)], True, True
                if w.endswith("gu"):
                    w = w[:-1]
                break
        if not hit:
            for suf in _ES_VERB_2B:
                if w.endswith(suf) and in_rv(len(w) - len(suf)):
                    w, changed = w[: -len(suf)], True
                    break

    # step 3 (residual)
    rv = _es_rv(w)
    for suf in ("os", "a", "o", "á", "í", "ó"):
        if w.endswith(suf) and in_rv(len(w) - len(suf)):
            w = w[: -len(suf)]
            break
    else:
        if w.endswith(("e", "é")) and in_rv(len(w) - 1):
            w = w[:-1]
            if w.endswith("gu") and in_rv(len(w) - 1):
                w = w[:-1]

    return w.translate(_ES_ACCENT)


# ---------------------------------------------------------------- French

_FR_VOWELS = "aeiouyâàëéêèïîôûù"


def _fr_mark(w: str) -> str:
    """Protect u/i between vowels, y next to a vowel, u after q."""
    chars = list(w)
    n = len(chars)
    for i in range(n):
        c = chars[i]
        prev_v = i > 0 and chars[i - 1].lower() in _FR_VOWELS
        next_v = i + 1 < n and chars[i + 1].lower() in _FR_VOWELS
        if c in "ui" and prev_v and next_v:
            chars[i] = c.upper()
        elif c == "y" and (prev_v or next_v):
            chars[i] = "Y"
        elif c == "u" and i > 0 and chars[i - 1] == "q":
            chars[i] = "U"
    return "".join(chars)


def _fr_rv(w: str) -> int:
    n = len(w)
    if n >= 3 and w[0] in _FR_VOWELS and w[1] in _FR_VOWELS:
        return 3
    if w[:3] in ("par", "col", "tap"):
        return 3
    for i in range(1, n):
        if w[i] in _FR_VOWELS:
            return min(i + 1, n)
    return n


_FR_STEP1_R2_DEL = (
    "ances", "iqUes", "ismes", "ables", "istes", "ance", "iqUe",
    "isme", "able", "iste", "eux",
)
_FR_ATEUR = ("atrices", "ateurs", "ations", "atrice", "ateur", "ation")
_FR_2A = (
    "issaIent", "issantes", "iraIent", "issante", "issants", "issions",
    "irions", "issais", "issait", "issant", "issent", "issiez", "issons",
    "irais", "irait", "irent", "iriez", "irons", "iront", "isses",
    "issez", "îmes", "îtes", "irai", "iras", "irez", "isse", "ira",
    "ies", "ir", "is", "it", "ie", "ît", "i",
)
_FR_2B_ER = (
    "eraIent", "erions", "èrent", "erais", "erait", "eriez", "erons",
    "eront", "erai", "eras", "erez", "ées", "era", "iez", "ée", "és",
    "er", "ez", "é",
)
_FR_2B_A = (
    "assions", "assent", "assiez", "aIent", "antes", "asses", "âmes",
    "âtes", "ante", "ants", "asse", "ais", "ait", "ant", "ât", "ai",
    "as", "a",
)


def french_stem(word: str) -> str:
    w = _fr_mark(word.lower())
    rv = _fr_rv(w)
    r1, r2 = _standard_r1_r2(w, _FR_VOWELS)

    def in_rv(pos: int) -> bool:
        return pos >= rv

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    orig = w
    changed = False
    went_234 = False  # suffix classes that still allow steps 2a/2b

    # ---- step 1
    def step1(w: str) -> tuple[str, bool, bool]:
        # returns (word, changed, allow_step2)
        for suf in _FR_STEP1_R2_DEL:
            if w.endswith(suf):
                if in_r2(len(w) - len(suf)):
                    return w[: -len(suf)], True, False
                return w, False, False
        for suf in _FR_ATEUR:
            if w.endswith(suf):
                if in_r2(len(w) - len(suf)):
                    w = w[: -len(suf)]
                    if w.endswith("ic"):
                        if in_r2(len(w) - 2):
                            w = w[:-2]
                        else:
                            w = w[:-2] + "iqU"
                    return w, True, False
                return w, False, False
        for suf, rep in (("logies", "log"), ("logie", "log"),
                         ("usions", "u"), ("utions", "u"),
                         ("usion", "u"), ("ution", "u"),
                         ("ences", "ent"), ("ence", "ent")):
            if w.endswith(suf):
                if in_r2(len(w) - len(suf)):
                    return w[: -len(suf)] + rep, True, False
                return w, False, False
        for suf in ("issements", "issement"):
            if w.endswith(suf):
                pos = len(w) - len(suf)
                if in_r1(pos) and pos > 0 and w[pos - 1] not in _FR_VOWELS:
                    return w[:pos], True, False
                return w, False, False
        for suf in ("ements", "ement"):
            if w.endswith(suf):
                pos = len(w) - len(suf)
                if in_rv(pos):
                    w = w[:pos]
                    if w.endswith("iv") and in_r2(len(w) - 2):
                        w = w[:-2]
                        if w.endswith("at") and in_r2(len(w) - 2):
                            w = w[:-2]
                    elif w.endswith("eus"):
                        if in_r2(len(w) - 3):
                            w = w[:-3]
                        elif in_r1(len(w) - 3):
                            w = w[:-3] + "eux"
                    elif w.endswith(("abl", "iqU")) and in_r2(len(w) - 3):
                        w = w[:-3]
                    elif w.endswith(("ièr", "Ièr")) and in_rv(len(w) - 3):
                        w = w[:-3] + "i"
                    return w, True, False
                return w, False, False
        for suf in ("ités", "ité"):
            if w.endswith(suf):
                if in_r2(len(w) - len(suf)):
                    w = w[: -len(suf)]
                    if w.endswith("abil"):
                        if in_r2(len(w) - 4):
                            w = w[:-4]
                        else:
                            w = w[:-4] + "abl"
                    elif w.endswith("ic"):
                        if in_r2(len(w) - 2):
                            w = w[:-2]
                        else:
                            w = w[:-2] + "iqU"
                    elif w.endswith("iv") and in_r2(len(w) - 2):
                        w = w[:-2]
                    return w, True, False
                return w, False, False
        for suf in ("ives", "ifs", "ive", "if"):
            if w.endswith(suf):
                if in_r2(len(w) - len(suf)):
                    w = w[: -len(suf)]
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                        if w.endswith("ic"):
                            if in_r2(len(w) - 2):
                                w = w[:-2]
                            else:
                                w = w[:-2] + "iqU"
                    return w, True, False
                return w, False, False
        if w.endswith("eaux"):
            return w[:-1], True, False
        if w.endswith("aux") and in_r1(len(w) - 3):
            return w[:-3] + "al", True, False
        for suf in ("euses", "euse"):
            if w.endswith(suf):
                pos = len(w) - len(suf)
                if in_r2(pos):
                    return w[:pos], True, False
                if in_r1(pos):
                    return w[:pos] + "eux", True, False
                return w, False, False
        if w.endswith("amment") and in_rv(len(w) - 6):
            return w[:-6] + "ant", True, True
        if w.endswith("emment") and in_rv(len(w) - 6):
            return w[:-6] + "ent", True, True
        for suf in ("ments", "ment"):
            if w.endswith(suf):
                pos = len(w) - len(suf)
                if pos > 0 and w[pos - 1] in _FR_VOWELS and in_rv(pos - 1):
                    return w[:pos], True, True
                return w, False, False
        return w, False, True

    w, changed, allow2 = step1(w)

    # ---- steps 2a / 2b: run when step 1 removed nothing, or removed
    # one of amment/emment/ment(s) (the spec's carve-out)
    if allow2:
        pre2 = w
        hit2a = False
        for suf in _FR_2A:
            if w.endswith(suf):
                pos = len(w) - len(suf)
                if in_rv(pos) and pos > 0 and w[pos - 1] not in _FR_VOWELS \
                        and in_rv(pos - 1):
                    w, hit2a = w[:pos], True
                break
        if not hit2a:
            if w.endswith("ions") and in_r2(len(w) - 4) and in_rv(len(w) - 4):
                w = w[:-4]
            else:
                for suf in _FR_2B_ER:
                    if w.endswith(suf) and in_rv(len(w) - len(suf)):
                        w = w[: -len(suf)]
                        break
                else:
                    for suf in _FR_2B_A:
                        if w.endswith(suf):
                            pos = len(w) - len(suf)
                            if in_rv(pos):
                                w = w[:pos]
                                if w.endswith("e") and in_rv(len(w) - 1):
                                    w = w[:-1]
                            break
        changed = changed or (w != pre2)

    # ---- step 3 / step 4
    if w != orig:
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # step 4 residual
        if w.endswith("s") and len(w) >= 2 and w[-2] not in "aiouès":
            if not (w[-2] == "i" and len(w) >= 3 and w[-3] == "H"):
                w = w[:-1]
        if w.endswith("ion") and in_r2(len(w) - 3) and len(w) >= 4 \
                and w[-4] in "st" and in_rv(len(w) - 4):
            w = w[:-3]
        else:
            for suf in ("ière", "Ière", "ier", "Ier"):
                if w.endswith(suf) and in_rv(len(w) - len(suf)):
                    w = w[: -len(suf)] + "i"
                    break
            else:
                if w.endswith("e") and in_rv(len(w) - 1):
                    w = w[:-1]
                elif w.endswith("guë") and in_rv(len(w) - 1):
                    w = w[:-1]

    # ---- step 5: undouble
    for end in ("enn", "onn", "ett", "ell", "eill"):
        if w.endswith(end):
            w = w[:-1]
            break
    # ---- step 6: unaccent final é/è before trailing consonants
    i = len(w) - 1
    while i >= 0 and w[i].lower() not in _FR_VOWELS:
        i -= 1
    if i >= 0 and i < len(w) - 1 and w[i] in "éè":
        w = w[:i] + "e" + w[i + 1:]

    return w.lower()


# ------------------------------------------------------------ Portuguese

_PT_VOWELS = "aeiouáéíóúâêô"

# nasalised vowels become vowel + '~' (a consonant) for region purposes
_PT_IN = (("ã", "a~"), ("õ", "o~"))


def _pt_rv(w: str) -> int:
    n = len(w)
    if n < 3:
        return n
    if w[1] not in _PT_VOWELS:
        i = 2
        while i < n and w[i] not in _PT_VOWELS:
            i += 1
        return min(i + 1, n)
    if w[0] in _PT_VOWELS and w[1] in _PT_VOWELS:
        i = 2
        while i < n and w[i] in _PT_VOWELS:
            i += 1
        return min(i + 1, n)
    return 3


# (suffix, action) — longest match across ALL entries; action encodes the
# region test + replacement of the published spec
_PT_STEP1 = sorted(
    [
        *[(s, ("r2", "")) for s in (
            "eza", "ezas", "ico", "ica", "icos", "icas", "ismo", "ismos",
            "ável", "ível", "ista", "istas", "oso", "osa", "osos", "osas",
            "amento", "amentos", "imento", "imentos", "adora", "ador",
            "aça~o", "adoras", "adores", "aço~es", "ante", "antes", "ância",
        )],
        ("logia", ("r2", "log")), ("logias", ("r2", "log")),
        ("uça~o", ("r2", "u")), ("uço~es", ("r2", "u")),
        ("ência", ("r2", "ente")), ("ências", ("r2", "ente")),
        ("amente", ("amente", None)),
        ("mente", ("mente", None)),
        ("idade", ("idade", None)), ("idades", ("idade", None)),
        ("iva", ("iv", None)), ("ivo", ("iv", None)),
        ("ivas", ("iv", None)), ("ivos", ("iv", None)),
        ("ira", ("ira", None)), ("iras", ("ira", None)),
    ],
    key=lambda e: -len(e[0]),
)

_PT_VERB = tuple(sorted((
    "ada", "ida", "ia", "aria", "eria", "iria", "ará", "ara", "erá",
    "era", "irá", "ava", "asse", "esse", "isse", "aste", "este", "iste",
    "ei", "arei", "erei", "irei", "am", "ado", "ido", "ando", "endo",
    "indo", "ara~o", "era~o", "ira~o", "ar", "er", "ir", "as", "adas",
    "idas", "ias", "arias", "erias", "irias", "arás", "aras", "erás",
    "eras", "irás", "avas", "es", "ardes", "erdes", "irdes", "ares",
    "eres", "ires", "asses", "esses", "isses", "astes", "estes",
    "istes", "is", "ais", "eis", "íeis", "aríeis", "eríeis", "iríeis",
    "áreis", "areis", "éreis", "ereis", "íreis", "ireis", "ásseis",
    "ésseis", "ísseis", "áveis", "ados", "idos", "ámos", "amos",
    "íamos", "aríamos", "eríamos", "iríamos", "áramos", "éramos",
    "íramos", "ávamos", "emos", "aremos", "eremos", "iremos",
    "ássemos", "êssemos", "íssemos", "imos", "armos", "ermos", "irmos",
    "eu", "iu", "ou", "ira", "iras",
), key=len, reverse=True))


def portuguese_stem(word: str) -> str:
    """Snowball Portuguese (published algorithm description,
    snowballstem.org)."""
    w = word.lower()
    for src, dst in _PT_IN:
        w = w.replace(src, dst)
    rv = _pt_rv(w)
    r1, r2 = _standard_r1_r2(w, _PT_VOWELS)

    def in_rv(p: int) -> bool:
        return p >= rv

    def in_r1(p: int) -> bool:
        return p >= r1

    def in_r2(p: int) -> bool:
        return p >= r2

    orig = w
    # ---- step 1: standard suffix (longest match, then its rule)
    for suf, (kind, repl) in _PT_STEP1:
        if not w.endswith(suf):
            continue
        pos = len(w) - len(suf)
        if kind == "r2" and in_r2(pos):
            w = w[:pos] + (repl or "")
        elif kind == "amente" and in_r1(pos):
            w = w[:pos]
            if w.endswith("iv") and in_r2(len(w) - 2):
                w = w[:-2]
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
            else:
                for pre in ("os", "ic", "ad"):
                    if w.endswith(pre) and in_r2(len(w) - 2):
                        w = w[:-2]
                        break
        elif kind == "mente" and in_r2(pos):
            w = w[:pos]
            for pre in ("ante", "avel", "ível"):
                if w.endswith(pre) and in_r2(len(w) - 4):
                    w = w[:-4]
                    break
        elif kind == "idade" and in_r2(pos):
            w = w[:pos]
            for pre in ("abil", "ic", "iv"):
                if w.endswith(pre) and in_r2(len(w) - len(pre)):
                    w = w[: -len(pre)]
                    break
        elif kind == "iv" and in_r2(pos):
            w = w[:pos]
            if w.endswith("at") and in_r2(len(w) - 2):
                w = w[:-2]
        elif kind == "ira" and in_rv(pos) and pos > 0 and w[pos - 1] == "e":
            w = w[:pos] + "ir"
        break

    # ---- step 2: verb suffixes, only if step 1 changed nothing
    if w == orig:
        for suf in _PT_VERB:
            if w.endswith(suf) and in_rv(len(w) - len(suf)):
                w = w[: -len(suf)]
                break

    # ---- step 3: if steps 1-2 changed, drop c-preceded final i in RV
    if w != orig:
        if w.endswith("i") and in_rv(len(w) - 1) and len(w) >= 2 and w[-2] == "c":
            w = w[:-1]
    else:
        # ---- step 4: residual suffix
        for suf in ("os", "a", "i", "o", "á", "í", "ó"):
            if w.endswith(suf) and in_rv(len(w) - len(suf)):
                w = w[: -len(suf)]
                break

    # ---- step 5: residual form (always runs)
    if w.endswith(("e", "é", "ê")) and in_rv(len(w) - 1):
        w = w[:-1]
        if (w.endswith("gu") and in_rv(len(w) - 1)) or (
            w.endswith("ci") and in_rv(len(w) - 1)
        ):
            w = w[:-1]
    elif w.endswith("ç"):
        w = w[:-1] + "c"

    for src, dst in _PT_IN:
        w = w.replace(dst, src)
    return w


# -------------------------------------------------------------- Italian

_IT_VOWELS = "aeiouàèìòù"
_IT_ACUTE = str.maketrans("áéíóú", "àèìòù")

_IT_PRON = tuple(sorted((
    "ci", "gli", "la", "le", "li", "lo", "mi", "ne", "si", "ti", "vi",
    "sene", "gliela", "gliele", "glieli", "glielo", "gliene", "mela",
    "mele", "meli", "melo", "mene", "tela", "tele", "teli", "telo",
    "tene", "cela", "cele", "celi", "celo", "cene", "vela", "vele",
    "veli", "velo", "vene",
), key=len, reverse=True))

_IT_STEP1 = sorted(
    [
        *[(s, ("r2", "")) for s in (
            "anza", "anze", "ico", "ici", "ica", "ice", "iche", "ichi",
            "ismo", "ismi", "abile", "abili", "ibile", "ibili", "ista",
            "iste", "isti", "istà", "istè", "istì", "oso", "osi", "osa",
            "ose", "mente", "atrice", "atrici", "ante", "anti",
        )],
        *[(s, ("azione", None)) for s in ("azione", "azioni", "atore", "atori")],
        ("logia", ("r2", "log")), ("logie", ("r2", "log")),
        *[(s, ("r2", "u")) for s in ("uzione", "uzioni", "usione", "usioni")],
        ("enza", ("r2", "ente")), ("enze", ("r2", "ente")),
        *[(s, ("rv", "")) for s in ("amento", "amenti", "imento", "imenti")],
        ("amente", ("amente", None)),
        ("ità", ("ità", None)),
        *[(s, ("iv", None)) for s in ("ivo", "ivi", "iva", "ive")],
    ],
    key=lambda e: -len(e[0]),
)

_IT_VERB = tuple(sorted((
    "ammo", "ando", "ano", "are", "arono", "asse", "assero", "assi",
    "assimo", "ata", "ate", "ati", "ato", "ava", "avamo", "avano",
    "avate", "avi", "avo", "emmo", "enda", "ende", "endi", "endo",
    "erà", "erai", "eranno", "ere", "erebbe", "erebbero", "erei",
    "eremmo", "eremo", "ereste", "eresti", "erete", "erò", "erono",
    "essero", "ete", "eva", "evamo", "evano", "evate", "evi", "evo",
    "Yamo", "iamo", "immo", "irà", "irai", "iranno", "ire", "irebbe",
    "irebbero", "irei", "iremmo", "iremo", "ireste", "iresti", "irete",
    "irò", "irono", "isca", "iscano", "isce", "isci", "isco", "iscono",
    "issero", "ita", "ite", "iti", "ito", "iva", "ivamo", "ivano",
    "ivate", "ivi", "ivo", "ono", "uta", "ute", "uti", "uto", "ar", "ir",
), key=len, reverse=True))


def italian_stem(word: str) -> str:
    """Snowball Italian (published algorithm description,
    snowballstem.org)."""
    w = word.lower().translate(_IT_ACUTE)
    # mark u after q, and i/u between vowels, as consonants
    chars = list(w)
    for i in range(1, len(chars)):
        if chars[i] == "u" and chars[i - 1] == "q":
            chars[i] = "U"
        elif chars[i] in "iu" and i + 1 < len(chars) \
                and chars[i - 1] in _IT_VOWELS and chars[i + 1] in _IT_VOWELS:
            chars[i] = chars[i].upper()
    w = "".join(chars)
    rv = _es_rv_generic(w, _IT_VOWELS)
    r1, r2 = _standard_r1_r2(w, _IT_VOWELS)

    def in_rv(p: int) -> bool:
        return p >= rv

    def in_r1(p: int) -> bool:
        return p >= r1

    def in_r2(p: int) -> bool:
        return p >= r2

    # ---- step 0: attached pronoun
    for p in _IT_PRON:
        if not w.endswith(p):
            continue
        base = w[: -len(p)]
        if base.endswith(("ando", "endo")) and in_rv(len(base) - 4):
            w = base
        elif base.endswith(("ar", "er", "ir")) and in_rv(len(base) - 2):
            w = base + "e"
        break

    orig = w
    # ---- step 1: standard suffix (longest match, then its rule)
    for suf, (kind, repl) in _IT_STEP1:
        if not w.endswith(suf):
            continue
        pos = len(w) - len(suf)
        if kind == "r2" and in_r2(pos):
            w = w[:pos] + (repl or "")
        elif kind == "rv" and in_rv(pos):
            w = w[:pos]
        elif kind == "azione" and in_r2(pos):
            w = w[:pos]
            if w.endswith("ic") and in_r2(len(w) - 2):
                w = w[:-2]
        elif kind == "amente" and in_r1(pos):
            w = w[:pos]
            if w.endswith("iv") and in_r2(len(w) - 2):
                w = w[:-2]
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
            else:
                for pre in ("os", "ic"):
                    if w.endswith(pre) and in_r2(len(w) - 2):
                        w = w[:-2]
                        break
                else:
                    if w.endswith("abil") and in_r2(len(w) - 4):
                        w = w[:-4]
        elif kind == "ità" and in_r2(pos):
            w = w[:pos]
            for pre in ("abil", "ic", "iv"):
                if w.endswith(pre) and in_r2(len(w) - len(pre)):
                    w = w[: -len(pre)]
                    break
        elif kind == "iv" and in_r2(pos):
            w = w[:pos]
            if w.endswith("at") and in_r2(len(w) - 2):
                w = w[:-2]
                if w.endswith("ic") and in_r2(len(w) - 2):
                    w = w[:-2]
        break

    # ---- step 2: verb suffixes, only if step 1 changed nothing
    if w == orig:
        for suf in _IT_VERB:
            if w.endswith(suf) and in_rv(len(w) - len(suf)):
                w = w[: -len(suf)]
                break

    # ---- step 3a: final vowel (then a preceding i), both in RV
    if w and w[-1] in "aeioàèìò" and in_rv(len(w) - 1):
        w = w[:-1]
        if w.endswith("i") and in_rv(len(w) - 1):
            w = w[:-1]
    # ---- step 3b: ch/gh -> c/g in RV
    if w.endswith(("ch", "gh")) and in_rv(len(w) - 2):
        w = w[:-1]

    return w.lower()


def _es_rv_generic(w: str, vowels: str) -> int:
    """The Spanish/Italian/Portuguese RV rule with a caller-supplied
    vowel set."""
    n = len(w)
    if n < 3:
        return n
    if w[1] not in vowels:
        i = 2
        while i < n and w[i] not in vowels:
            i += 1
        return min(i + 1, n)
    if w[0] in vowels and w[1] in vowels:
        i = 2
        while i < n and w[i] in vowels:
            i += 1
        return min(i + 1, n)
    return 3


# -------------------------------------------- Scandinavian (sv/no/da)
# The Scandinavian Snowball algorithms share one shape: R1 (with the
# "at least 3 letters before R1" adjustment), a longest-match suffix
# drop in R1, an s-drop behind a valid s-ending, and small cleanup
# steps. Published descriptions: snowballstem.org Swedish / Norwegian /
# Danish stemming algorithms.


def _r1_min3(w: str, vowels: str) -> int:
    r1, _ = _standard_r1_r2(w, vowels)
    return max(r1, 3) if len(w) >= 3 else len(w)


_SV_VOWELS = "aeiouyäåö"
_SV_STEP1 = tuple(sorted((
    "a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande",
    "arne", "are", "aste", "en", "anden", "aren", "heten", "ern", "ar",
    "er", "heter", "or", "as", "arnas", "ernas", "ornas", "es", "ades",
    "andes", "ens", "arens", "hetens", "erns", "at", "andet", "het", "ast",
), key=len, reverse=True))
_SV_S_END = set("bcdfghjklmnoprtvy")


def swedish_stem(word: str) -> str:
    w = word.lower()
    r1 = _r1_min3(w, _SV_VOWELS)

    def in_r1(p: int) -> bool:
        return p >= r1

    # step 1a/1b
    for suf in _SV_STEP1:
        if w.endswith(suf) and in_r1(len(w) - len(suf)):
            w = w[: -len(suf)]
            break
    else:
        if w.endswith("s") and in_r1(len(w) - 1) and len(w) >= 2 \
                and w[-2] in _SV_S_END:
            w = w[:-1]
    # step 2
    if any(w.endswith(e) and in_r1(len(w) - 2)
           for e in ("dd", "gd", "nn", "dt", "gt", "kt", "tt")):
        w = w[:-1]
    # step 3
    if w.endswith("fullt") and in_r1(len(w) - 5):
        w = w[:-1]
    elif w.endswith("löst") and in_r1(len(w) - 4):
        w = w[:-1]
    else:
        for suf in ("elig", "lig", "els", "ig"):
            if w.endswith(suf) and in_r1(len(w) - len(suf)):
                w = w[: -len(suf)]
                break
    return w


_NO_VOWELS = "aeiouyæåø"
_NO_STEP1 = tuple(sorted((
    "a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "en",
    "heten", "ar", "er", "heter", "as", "es", "edes", "endes", "enes",
    "hetenes", "ens", "hetens", "ers", "ets", "et", "het", "ast",
), key=len, reverse=True))
_NO_S_END = set("bcdfghjlmnoprtvyz")
_NO_STEP3 = tuple(sorted((
    "leg", "eleg", "ig", "eig", "lig", "elig", "els", "lov", "elov",
    "slov", "hetslov",
), key=len, reverse=True))


def norwegian_stem(word: str) -> str:
    w = word.lower()
    r1 = _r1_min3(w, _NO_VOWELS)

    def in_r1(p: int) -> bool:
        return p >= r1

    # step 1: longest among suffix list / erte-ert / s-ending
    matched = False
    for suf in ("erte", "ert"):
        if w.endswith(suf) and in_r1(len(w) - len(suf)):
            w, matched = w[: -len(suf)] + "er", True
            break
    if not matched:
        for suf in _NO_STEP1:
            if w.endswith(suf) and in_r1(len(w) - len(suf)):
                w, matched = w[: -len(suf)], True
                break
    if not matched and w.endswith("s") and in_r1(len(w) - 1) and len(w) >= 2:
        prev = w[-2]
        ok = prev in _NO_S_END or (
            prev == "k" and len(w) >= 3 and w[-3] not in _NO_VOWELS
        )
        if ok:
            w = w[:-1]
    # step 2
    if (w.endswith("dt") or w.endswith("vt")) and in_r1(len(w) - 2):
        w = w[:-1]
    # step 3
    for suf in _NO_STEP3:
        if w.endswith(suf) and in_r1(len(w) - len(suf)):
            w = w[: -len(suf)]
            break
    return w


_DA_VOWELS = "aeiouyæåø"
_DA_STEP1 = tuple(sorted((
    "hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene",
    "erne", "ere", "en", "heden", "eren", "er", "heder", "erer", "heds",
    "es", "endes", "erendes", "enes", "ernes", "eres", "ens", "hedens",
    "erens", "ers", "ets", "erets", "et", "eret",
), key=len, reverse=True))
_DA_S_END = set("abcdfghjklmnoprtvyzå")


def danish_stem(word: str) -> str:
    w = word.lower()
    r1 = _r1_min3(w, _DA_VOWELS)

    def in_r1(p: int) -> bool:
        return p >= r1

    def step2(w: str) -> str:
        if any(w.endswith(e) and in_r1(len(w) - 2)
               for e in ("gd", "dt", "gt", "kt")):
            return w[:-1]
        return w

    # step 1
    for suf in _DA_STEP1:
        if w.endswith(suf) and in_r1(len(w) - len(suf)):
            w = w[: -len(suf)]
            break
    else:
        if w.endswith("s") and in_r1(len(w) - 1) and len(w) >= 2 \
                and w[-2] in _DA_S_END:
            w = w[:-1]
    # step 2
    w = step2(w)
    # step 3
    if w.endswith("igst"):
        w = w[:-2]
    if w.endswith("løst"):
        w = w[:-1]
    else:
        for suf in ("elig", "lig", "els", "ig"):
            if w.endswith(suf) and in_r1(len(w) - len(suf)):
                w = w[: -len(suf)]
                w = step2(w)
                break
    # step 4: undouble final identical consonants in R1
    if len(w) >= 2 and w[-1] == w[-2] and w[-1] not in _DA_VOWELS \
            and in_r1(len(w) - 1):
        w = w[:-1]
    return w


# ----------------------------------------------------------------- Dutch

_NL_VOWELS = "aeiouyè"
_NL_UNACCENT = str.maketrans("äëïöüáéíóú", "aeiouaeiou")


def dutch_stem(word: str) -> str:
    """Snowball Dutch (published algorithm description,
    snowballstem.org)."""
    w = word.lower().translate(_NL_UNACCENT)
    # mark consonantal i/y: initial y, y after vowel, i between vowels
    chars = list(w)
    if chars and chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _NL_VOWELS:
            chars[i] = "Y"
        elif chars[i] == "i" and i + 1 < len(chars) \
                and chars[i - 1] in _NL_VOWELS and chars[i + 1] in _NL_VOWELS:
            chars[i] = "I"
    w = "".join(chars)
    r1 = _r1_min3(w, _NL_VOWELS)
    _, r2 = _standard_r1_r2(w, _NL_VOWELS)

    def in_r1(p: int) -> bool:
        return p >= r1

    def in_r2(p: int) -> bool:
        return p >= r2

    def undouble(w: str) -> str:
        return w[:-1] if w.endswith(("kk", "dd", "tt")) else w

    # step 1
    if w.endswith("heden") and in_r1(len(w) - 5):
        w = w[:-5] + "heid"
    else:
        done = False
        for suf in ("ene", "en"):
            if w.endswith(suf):
                pos = len(w) - len(suf)
                if in_r1(pos) and pos > 0 and w[pos - 1] not in _NL_VOWELS \
                        and w[max(0, pos - 3):pos] != "gem":
                    w = undouble(w[:pos])
                done = True
                break
        if not done:
            for suf in ("se", "s"):
                if w.endswith(suf):
                    pos = len(w) - len(suf)
                    if in_r1(pos) and pos > 0 and w[pos - 1] not in _NL_VOWELS \
                            and w[pos - 1] != "j":
                        w = w[:pos]
                    break
    # step 2
    e_removed = False
    if w.endswith("e") and in_r1(len(w) - 1) and len(w) >= 2 \
            and w[-2] not in _NL_VOWELS:
        w = undouble(w[:-1])
        e_removed = True
    # step 3a
    if w.endswith("heid") and in_r2(len(w) - 4) and not (
        len(w) >= 5 and w[-5] == "c"
    ):
        w = w[:-4]
        if w.endswith("en"):
            pos = len(w) - 2
            if in_r1(pos) and pos > 0 and w[pos - 1] not in _NL_VOWELS \
                    and w[max(0, pos - 3):pos] != "gem":
                w = undouble(w[:pos])
    # step 3b
    if w.endswith(("end", "ing")) and in_r2(len(w) - 3):
        w = w[:-3]
        if w.endswith("ig") and in_r2(len(w) - 2) and not (
            len(w) >= 3 and w[-3] == "e"
        ):
            w = w[:-2]
        else:
            w = undouble(w)
    elif w.endswith("ig") and in_r2(len(w) - 2) and not (
        len(w) >= 3 and w[-3] == "e"
    ):
        w = w[:-2]
    elif w.endswith("lijk") and in_r2(len(w) - 4):
        w = w[:-4]
        if w.endswith("e") and in_r1(len(w) - 1) and len(w) >= 2 \
                and w[-2] not in _NL_VOWELS:
            w = undouble(w[:-1])
    elif w.endswith("baar") and in_r2(len(w) - 4):
        w = w[:-4]
    elif w.endswith("bar") and in_r2(len(w) - 3) and e_removed:
        w = w[:-3]
    # step 4: undouble vowel — C v v D (D a consonant other than I)
    if len(w) >= 4 and w[-1] not in _NL_VOWELS and w[-1] != "I" \
            and w[-2] == w[-3] and w[-2] in "aeou" \
            and w[-4] not in _NL_VOWELS:
        w = w[:-2] + w[-1]
    return w.lower()


# -------------------------------------------------------------- Romanian

_RO_VOWELS = "aăâeiîou"

_RO_STEP0 = [
    ("ului", "", None), ("ul", "", None),
    ("aua", "a", None),
    ("elor", "e", None), ("ele", "e", None), ("ea", "e", None),
    ("iilor", "i", None), ("iile", "i", None), ("iei", "i", None),
    ("iua", "i", None), ("ilor", "i", None), ("ii", "i", None),
    ("ile", "i", "not_ab"),
    ("atei", "at", None),
    ("aţie", "aţi", None), ("aţia", "aţi", None),
]
_RO_STEP1 = [
    ("abilitate", "abil"), ("abilitati", "abil"), ("abilităi", "abil"),
    ("abilităţi", "abil"),
    ("ibilitate", "ibil"),
    ("ivitate", "iv"), ("ivitati", "iv"), ("ivităi", "iv"), ("ivităţi", "iv"),
    ("icitate", "ic"), ("icitati", "ic"), ("icităi", "ic"), ("icităţi", "ic"),
    ("icatori", "ic"), ("icator", "ic"),
    ("iciv", "ic"), ("iciva", "ic"), ("icive", "ic"), ("icivi", "ic"),
    ("icivă", "ic"),
    ("ical", "ic"), ("icala", "ic"), ("icale", "ic"), ("icali", "ic"),
    ("icală", "ic"),
    ("ativ", "at"), ("ativa", "at"), ("ative", "at"), ("ativi", "at"),
    ("ativă", "at"), ("aţiune", "at"), ("atoare", "at"), ("ator", "at"),
    ("atori", "at"), ("ătoare", "at"), ("ător", "at"), ("ători", "at"),
    ("itiv", "it"), ("itiva", "it"), ("itive", "it"), ("itivi", "it"),
    ("itivă", "it"), ("iţiune", "it"), ("itoare", "it"), ("itor", "it"),
    ("itori", "it"),
]
_RO_STEP2_DELETE = (
    "at ata ată ati ate ut uta ută uti ute ât âta âtă âti âte ic ica ice "
    "ici ică abil abila abile abili abilă ibil ibila ibile ibili ibilă "
    "oasa oasă oase os osi oşi ant anta ante anti antă ator atori itate "
    "itati ităi ităţi iv iva ive ivi ivă"
).split()
_RO_STEP2_IST = "ism isme ist ista iste isti istă işti".split()
_RO_VERB_COND = (
    "are ere ire âre ind ând indu ându eze ează ez ezi esc eşti eşte ăsc "
    "ăşti ăşte am ai au eam eai ea eaţi eau iam iai ia iaţi iau ui ăi "
    "arăm arăţi ară urăm urăţi ură irăm irăţi iră ârăm ârăţi âră asem "
    "aseşi ase aserăm aserăţi aseră isem iseşi ise iserăm iserăţi iseră "
    "âsem âseşi âse âserăm âserăţi âseră usem useşi use userăm userăţi "
    "useră"
).split()
_RO_VERB_UNCOND = (
    "ăm aţi em eţi im iţi âm âţi seşi serăm serăţi seră sei se sesem "
    "seseşi sese seserăm seserăţi seseră"
).split()


# pre-sorted longest-first once (per-token hot path)
_RO_STEP0_SORTED = sorted(_RO_STEP0, key=lambda t: -len(t[0]))
_RO_STEP1_SORTED = sorted(_RO_STEP1, key=lambda t: -len(t[0]))
_RO_STEP2_SORTED = sorted(
    [(s, "", 0) for s in _RO_STEP2_DELETE]
    + [("iune", "", 1), ("iuni", "", 1)]
    + [(s, "ist", 0) for s in _RO_STEP2_IST],
    key=lambda t: -len(t[0]),
)
_RO_VERBS_SORTED = sorted(
    [(s, True) for s in _RO_VERB_COND]
    + [(s, False) for s in _RO_VERB_UNCOND],
    key=lambda t: -len(t[0]),
)


def romanian_stem(word: str) -> str:
    """Snowball Romanian (published algorithm description,
    snowballstem.org "Romanian stemming algorithm"): step 0 removes
    plural/article endings in R1, step 1 reduces combining suffixes in
    R1 (repeated), step 2 removes standard suffixes in R2, step 3 (only
    when steps 1-2 removed nothing) removes verb suffixes in RV with the
    consonant-or-u condition for group 1, step 4 drops a final vowel in
    RV. Comma-below ș/ț normalize to cedilla ş/ţ; intervocalic i/u are
    treated as consonants."""
    w = word.lower().replace("ș", "ş").replace("ț", "ţ")
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if chars[i] in "iu" and chars[i - 1] in _RO_VOWELS \
                and chars[i + 1] in _RO_VOWELS:
            chars[i] = chars[i].upper()
    w = "".join(chars)
    r1, r2 = _standard_r1_r2(w, _RO_VOWELS)
    rv = _es_rv_generic(w, _RO_VOWELS)

    # step 0
    for suf, rep, cond in _RO_STEP0_SORTED:
        pos = len(w) - len(suf)
        if pos >= r1 and w.endswith(suf):
            if cond == "not_ab" and w[max(0, pos - 2):pos] == "ab":
                continue
            w = w[:pos] + rep
            break
    # step 1: repeat while a combining suffix reduces (all in R1)
    changed_1or2 = False
    while True:
        hit = False
        for suf, rep in _RO_STEP1_SORTED:
            pos = len(w) - len(suf)
            if pos >= r1 and w.endswith(suf):
                w = w[:pos] + rep
                changed_1or2 = hit = True
                break
        if not hit:
            break
    # step 2 (R2)
    for suf, rep, kind in _RO_STEP2_SORTED:
        pos = len(w) - len(suf)
        if pos >= r2 and w.endswith(suf):
            if kind == 1:
                # iune/iuni delete only behind ţ, which becomes t
                if pos > 0 and w[pos - 1] == "ţ":
                    w = w[: pos - 1] + "t"
                    changed_1or2 = True
                continue
            w = w[:pos] + rep
            changed_1or2 = True
            break
    # step 3: verb suffixes in RV, only when steps 1-2 removed nothing
    if not changed_1or2:
        for suf, needs_cons in _RO_VERBS_SORTED:
            pos = len(w) - len(suf)
            if pos >= rv and w.endswith(suf):
                if needs_cons:
                    if pos - 1 < rv:
                        continue
                    prev = w[pos - 1]
                    if prev in _RO_VOWELS and prev != "u":
                        continue
                w = w[:pos]
                break
    # step 4: final vowel in RV
    for suf in ("ie", "a", "e", "i", "ă"):
        pos = len(w) - len(suf)
        if pos >= rv and w.endswith(suf):
            w = w[:pos]
            break
    return w.lower()


# ------------------------------------------------------------- Hungarian

_HU_VOWELS = "aáeéiíoóöőuúüű"
_HU_DIGRAPHS = ("cs", "dzs", "dz", "gy", "ly", "ny", "sz", "ty", "zs")


def _hu_r1(w: str) -> int:
    """Hungarian R1: after the first consonant-or-digraph when the word
    starts with a vowel, after the first vowel when it starts with a
    consonant."""
    n = len(w)
    if not w:
        return 0
    if w[0] in _HU_VOWELS:
        i = 1
        while i < n:
            if w[i] not in _HU_VOWELS:
                for d in _HU_DIGRAPHS:
                    if w.startswith(d, i):
                        return min(i + len(d), n)
                return min(i + 1, n)
            i += 1
        return n
    for i in range(1, n):
        if w[i] in _HU_VOWELS:
            return min(i + 1, n)
    return n


def _hu_undouble(w: str) -> str:
    """bb->b ... including doubled digraphs (ccs->cs, ssz->sz, ...)."""
    for d in _HU_DIGRAPHS:
        if w.endswith(d[0] + d):
            return w[: -len(d) - 1] + d
    if len(w) >= 2 and w[-1] == w[-2] and w[-1] not in _HU_VOWELS:
        return w[:-1]
    return w


_HU_CASES = (
    "onként enként anként ként képpen képp ban ben ba be ra re nak nek "
    "val vel tól től ról ről ból ből hoz hez höz nál nél ig at et ot öt "
    "ért kor ul ül vá vé en on an ön n t"
).split()
_HU_OWNER_PL = (
    "jaitok jeitek jaink jeink aitok eitek aink eink itek ink jaim jeim "
    "jaid jeid jaik jeik aim eim aid eid aik eik jai jei im id ai ei ik i"
).split()
_HU_OWNER_SG = (
    "ünk unk juk jük uk ük nk em om am od ed ad öd ja je m d a e o"
).split()


_HU_CASES_SORTED = sorted(_HU_CASES, key=len, reverse=True)
_HU_OWNER_PL_SORTED = sorted(_HU_OWNER_PL, key=len, reverse=True)
_HU_OWNER_SG_SORTED = sorted(_HU_OWNER_SG, key=len, reverse=True)


def hungarian_stem(word: str) -> str:
    """Snowball Hungarian (published algorithm description,
    snowballstem.org "Hungarian stemming algorithm"): instrumental
    al/el behind a doubled consonant (undoubled after removal), the
    case-ending inventory, á/é restoration to a/e, owner suffixes
    (plural then singular), and the final plural -k family — all in the
    Hungarian R1 (consonant/digraph-aware). The nine published steps
    are applied as ordered longest-match passes, ITERATED to a bounded
    fixpoint: a single pass leaves inflection families split (barátok
    -> barát while barát -> bara, because the á-restoration path keeps
    stripping) and Contains semantics need family members on one stem.
    Deviations are deterministic and shared by index and query sides
    (module-header caveat)."""
    w = word.lower()
    for _ in range(3):
        out = _hu_pass(w)
        if out == w:
            break
        w = out
    return w


def _hu_pass(w: str) -> str:
    r1 = _hu_r1(w)

    def in_r1(pos: int) -> bool:
        return pos >= r1

    # step 1: instrumental al/el behind double consonant, undouble
    for suf in ("al", "el"):
        pos = len(w) - 2
        if w.endswith(suf) and in_r1(pos) and pos >= 2 \
                and w[pos - 1] not in _HU_VOWELS and w[pos - 1] == w[pos - 2]:
            w = _hu_undouble(w[:pos])
            break
    # step 2: frequent cases; restore final á->a, é->e
    for suf in _HU_CASES_SORTED:
        pos = len(w) - len(suf)
        if w.endswith(suf) and in_r1(pos):
            w = w[:pos]
            if w.endswith("á"):
                w = w[:-1] + "a"
            elif w.endswith("é"):
                w = w[:-1] + "e"
            break
    # step 3: special án/én/ánként -> a/e
    for suf, rep in (("ánként", "a"), ("án", "a"), ("én", "e")):
        pos = len(w) - len(suf)
        if w.endswith(suf) and in_r1(pos):
            w = w[:pos] + rep
            break
    # step 4: -stul/-stül family
    for suf, rep in (("astul", ""), ("estül", ""), ("ástul", "a"),
                     ("éstül", "e"), ("stul", ""), ("stül", "")):
        pos = len(w) - len(suf)
        if w.endswith(suf) and in_r1(pos):
            w = w[:pos] + rep
            break
    # step 5: factive á/é behind double consonant, undouble
    for suf in ("á", "é"):
        pos = len(w) - 1
        if w.endswith(suf) and in_r1(pos) and pos >= 2 \
                and w[pos - 1] not in _HU_VOWELS and w[pos - 1] == w[pos - 2]:
            w = _hu_undouble(w[:pos])
            break
    # step 6: owned (-é and friends)
    for suf, rep in (("áké", "a"), ("éké", "e"), ("oké", ""), ("öké", ""),
                     ("aké", ""), ("eké", ""), ("ké", ""), ("éi", ""),
                     ("éé", ""), ("é", "")):
        pos = len(w) - len(suf)
        if w.endswith(suf) and in_r1(pos):
            w = w[:pos] + rep
            break
    # step 7: plural owner suffixes (with á/é restoration)
    done = False
    for suf in _HU_OWNER_PL_SORTED:
        pos = len(w) - len(suf)
        if w.endswith(suf) and in_r1(pos):
            w = w[:pos]
            if w.endswith("á"):
                w = w[:-1] + "a"
            elif w.endswith("é"):
                w = w[:-1] + "e"
            done = True
            break
    # step 8: singular owner suffixes (skip when a plural-owner matched)
    if not done:
        for suf in _HU_OWNER_SG_SORTED:
            pos = len(w) - len(suf)
            if w.endswith(suf) and in_r1(pos):
                w = w[:pos]
                if w.endswith("á"):
                    w = w[:-1] + "a"
                elif w.endswith("é"):
                    w = w[:-1] + "e"
                break
    # step 9: plural -k
    for suf, rep in (("ák", "a"), ("ék", "e"), ("ök", ""), ("ok", ""),
                     ("ek", ""), ("ak", ""), ("k", "")):
        pos = len(w) - len(suf)
        if w.endswith(suf) and in_r1(pos):
            w = w[:pos] + rep
            break
    return w


# ---------------------------------------------------------------- Greek

_EL_FOLD = str.maketrans("άέήίόύώϊΐϋΰ", "αεηιουωιιυυ")
_EL_VOWELS = "αεηιουω"
# inflectional core, longest-first: noun/adjective case+number endings
# and the common present-tense verb endings
_EL_ENDINGS = (
    "ματων ματος ματα ουμε ουνε εται ονται εσαι ομαι ετε ουν εις ει "
    "ους ιων εων ων ου ος ες ας ης οι αι α η ο ι ε ω"
).split()


_EL_ENDINGS_SORTED = sorted(_EL_ENDINGS, key=len, reverse=True)


def greek_stem(word: str) -> str:
    """Greek stemmer: the inflectional CORE of the published Snowball
    Greek algorithm (snowballstem.org, after Ntais' published stemmer) —
    accent folding, final-sigma normalization, and longest-match removal
    of the case/number/person endings. The full algorithm's ~150-entry
    protected-word exception tables are OMITTED: without them some
    derivational stems differ from the official output, but removal is
    deterministic and shared by index and query sides (module-header
    caveat), which is what Contains semantics require."""
    w = word.lower().translate(_EL_FOLD)
    if w.endswith("ς"):
        w = w[:-1] + "σ"
    for suf in _EL_ENDINGS_SORTED:
        s = suf.replace("ς", "σ")
        if w.endswith(s) and len(w) - len(s) >= 2:
            stem = w[: len(w) - len(s)]
            if any(c in _EL_VOWELS for c in stem):
                return stem
    return w


# --------------------------------------------------------------- Arabic

_AR_DIACRITICS = dict.fromkeys(map(ord, "ًٌٍَُِّْـ"))
_AR_NORM = str.maketrans({"أ": "ا", "إ": "ا", "آ": "ا", "ى": "ي"})
_AR_PREFIXES = ("وال", "فال", "بال", "كال", "لل", "ال", "و")
_AR_SUFFIXES = ("ها", "ان", "ات", "ون", "ين", "يه", "ية", "ه", "ة", "ي")


def arabic_stem(word: str) -> str:
    """Arabic light stemmer in the shape of Larkey et al.'s published
    Light10 (the de-facto standard light stemmer the Snowball Arabic
    algorithm's affix-stripping stage follows): diacritic/tatweel
    removal, hamza-form and alif-maqsura normalization, one definite-
    article/conjunction prefix strip, then suffix stripping from the
    Light10 list while the remainder keeps >= 2 letters. No root
    extraction (broken plurals don't collapse — same as Light10)."""
    w = word.translate(_AR_DIACRITICS).translate(_AR_NORM)
    for p in _AR_PREFIXES:
        if w.startswith(p) and len(w) - len(p) >= 2:
            w = w[len(p):]
            break
    changed = True
    while changed:
        changed = False
        for s in _AR_SUFFIXES:
            if w.endswith(s) and len(w) - len(s) >= 2:
                w = w[: len(w) - len(s)]
                changed = True
                break
    return w


# ---------------------------------------------------------------- Tamil

# case endings that begin with a VOWEL SIGN (they replaced the stem's
# final virama: அவன் + ஐ -> அவனை), longest first; the -um particle and
# கள் plural are handled separately for their sandhi undo
_TA_VOWEL_SIGN_ENDINGS = (
    "ுக்கு", "ோடு", "ிடம்", "ால்", "ில்", "ின்", "ாக",
    "ை", "ா", "ே", "ோ",
)
_TA_VIRAMA = "்"


def _ta_is_bare_consonant(ch: str) -> bool:
    return "க" <= ch <= "ஹ"  # க..ஹ


def tamil_stem(word: str) -> str:
    """Tamil stemmer: reduced rendition of the published Snowball Tamil
    algorithm (snowballstem.org, after Damodharan's stemmer) — removes
    question clitics, the -um particle (ம் only, so u-final stems
    survive: வீடும் -> வீடு), case endings (restoring the virama the
    vowel sign displaced: அவனை -> அவன்), and the -kal plural with the
    m->ng sandhi undone (புத்தகங்கள் -> புத்தகம்). The published
    algorithm's verb-conjugation tables are OMITTED; removal is
    deterministic and shared by index and query sides (module-header
    caveat)."""
    w = word
    for _ in range(3):
        before = w
        if w.endswith("கள்") and len(w) >= 6:
            w = w[:-3]
            if w.endswith("ங்"):
                w = w[:-2] + "ம்"
        if w.endswith("ும்") and len(w) >= 5:
            # strip only ம்: the preceding u sign is shared between the
            # stem and the particle (டு + உம் -> டும்); restore the
            # virama on nasal/liquid finals (அவனும் -> அவனு -> அவன்)
            w = w[:-1]  # drop virama
            w = w[:-1]  # drop ம
            if len(w) >= 2 and w[-1] == "ு" and w[-2] in "னணலளரழம":
                w = w[:-1] + _TA_VIRAMA
        for s in _TA_VOWEL_SIGN_ENDINGS:
            if w.endswith(s) and len(w) - len(s) >= 3:
                w = w[: len(w) - len(s)]
                if w and _ta_is_bare_consonant(w[-1]):
                    w = w + _TA_VIRAMA
                break
        if w == before:
            break
    return w


# --------------------------------------------------------------- Finnish

_FI_VOWELS = "aeiouyäö"
_FI_LONG = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")


def finnish_stem(word: str) -> str:
    """Snowball Finnish (published algorithm description,
    snowballstem.org "Finnish stemming algorithm"): particle, possessive
    and case endings in R1 with their preceding-letter conditions
    (h-illative vowel match, cv condition for a/ä, the n-rule with long-
    vowel shortening), comparative endings in R2, the plural i/j vs t
    rule keyed on whether a case ending was removed, and the tidy pass
    (long-vowel + final-double-consonant undoubling). The published j/o
    micro-rules of the tidy step are omitted (module-header caveat)."""
    w = word.lower()
    r1, r2 = _standard_r1_r2(w, _FI_VOWELS)

    def in_r1(p: int) -> bool:
        return p >= r1

    # step 1: particles
    done1 = False
    for suf in ("kaan", "kään", "kin", "han", "hän", "ko", "kö", "pa", "pä"):
        pos = len(w) - len(suf)
        if w.endswith(suf) and in_r1(pos) and pos > 0 \
                and (w[pos - 1] in "nt" or w[pos - 1] in _FI_VOWELS):
            w = w[:pos]
            done1 = True
            break
    if not done1 and w.endswith("sti") and len(w) - 3 >= r2:
        w = w[:-3]
    # step 2: possessives
    if w.endswith("si") and in_r1(len(w) - 2) and not w[: -2].endswith("k"):
        w = w[:-2]
    elif w.endswith("ni") and in_r1(len(w) - 2):
        w = w[:-2]
        if w.endswith("kse"):
            w = w[:-1] + "i"
    elif w.endswith(("nsa", "nsä", "mme", "nne")) and in_r1(len(w) - 3):
        w = w[:-3]
    elif w.endswith("an") and in_r1(len(w) - 2) \
            and w[:-2].endswith(("ta", "ssa", "sta", "lla", "lta", "na")):
        w = w[:-2]
    elif w.endswith("än") and in_r1(len(w) - 2) \
            and w[:-2].endswith(("tä", "ssä", "stä", "llä", "ltä", "nä")):
        w = w[:-2]
    elif w.endswith("en") and in_r1(len(w) - 2) \
            and w[:-2].endswith(("lle", "ine")):
        w = w[:-2]
    # step 3: cases
    case_removed = False
    h_ill = {"han": "a", "hen": "e", "hin": "i", "hon": "o",
             "hun": "u", "hyn": "y", "hän": "ä", "hön": "ö"}
    matched = False
    for suf in ("siin", "tten", "seen", "den", "tta", "ttä", "ssa", "ssä",
                "sta", "stä", "lla", "llä", "lta", "ltä", "lle", "ksi",
                "ine", "han", "hen", "hin", "hon", "hun", "hyn", "hän",
                "hön", "na", "nä", "ta", "tä", "a", "ä", "n"):
        pos = len(w) - len(suf)
        if not (w.endswith(suf) and in_r1(pos)):
            continue
        if suf in h_ill:
            if pos > 0 and w[pos - 1] == h_ill[suf]:
                w, case_removed, matched = w[:pos], True, True
            break
        if suf in ("siin", "den", "tten"):
            if pos >= 2 and w[pos - 1] == "i" and w[pos - 2] in _FI_VOWELS:
                w, case_removed, matched = w[:pos], True, True
            break
        if suf == "seen":
            if w[:pos].endswith(_FI_LONG):
                w, case_removed, matched = w[:pos], True, True
            break
        if suf in ("a", "ä"):
            # cv condition: preceded by consonant that follows a vowel
            if pos >= 2 and w[pos - 1] not in _FI_VOWELS \
                    and w[pos - 2] in _FI_VOWELS:
                w, case_removed, matched = w[:pos], True, True
            break
        if suf in ("tta", "ttä"):
            if pos > 0 and w[pos - 1] == "e":
                w, case_removed, matched = w[:pos], True, True
            break
        if suf == "n":
            w = w[:pos]
            if w.endswith(_FI_LONG) or w.endswith("ie"):
                w = w[:-1]
            case_removed = matched = True
            break
        w, case_removed, matched = w[:pos], True, True
        break
    del matched
    # step 4: comparatives (R2)
    for suf in ("impi", "impa", "impä", "immi", "imma", "immä",
                "eja", "ejä", "mpi", "mpa", "mpä", "mmi", "mma", "mmä"):
        pos = len(w) - len(suf)
        if w.endswith(suf) and pos >= r2:
            if suf in ("mpi", "mpa", "mpä", "mmi", "mma", "mmä") \
                    and w[:pos].endswith("po"):
                break
            w = w[:pos]
            break
    # step 5: plurals
    if case_removed:
        if w.endswith(("i", "j")) and in_r1(len(w) - 1):
            w = w[:-1]
    elif w.endswith("t") and in_r1(len(w) - 1) \
            and len(w) >= 2 and w[-2] in _FI_VOWELS:
        w = w[:-1]
        for suf in ("imma", "mma"):
            pos = len(w) - len(suf)
            if w.endswith(suf) and pos >= r2:
                if suf == "mma" and w[:pos].endswith("po"):
                    break
                w = w[:pos]
                break
    # step 6: tidy — long vowel in R1, then final double consonant
    if w.endswith(_FI_LONG) and in_r1(len(w) - 1):
        w = w[:-1]
    if len(w) >= 2 and w[-1] == w[-2] and w[-1] not in _FI_VOWELS:
        w = w[:-1]
    return w


# --------------------------------------------------------------- Russian

_RU_VOWELS = "аеиоуыэюя"

# ending tables from the published Snowball Russian algorithm
# (snowballstem.org "Russian stemming algorithm"). Group-1 endings must
# directly follow а or я (the а/я stays); matching is longest-first
# within each class, and — like Snowball's `among` — a longest literal
# match whose group condition fails makes the whole class fail (no
# fallback to shorter alternatives).
_RU_PERF_GERUND = (
    [("ившись", 2), ("ывшись", 2), ("вшись", 1), ("ивши", 2), ("ывши", 2),
     ("вши", 1), ("ив", 2), ("ыв", 2), ("в", 1)]
)
_RU_ADJECTIVE = [
    (e, 0) for e in (
        "ими", "ыми", "его", "ого", "ему", "ому",
        "ее", "ие", "ые", "ое", "ей", "ий", "ый", "ой", "ем", "им",
        "ым", "ом", "их", "ых", "ею", "ою", "ую", "юю", "ая", "яя",
    )
]
_RU_PARTICIPLE = [
    ("ивш", 2), ("ывш", 2), ("ующ", 2),
    ("ем", 1), ("нн", 1), ("вш", 1), ("ющ", 1), ("щ", 1),
]
_RU_VERB = [
    ("ейте", 2), ("уйте", 2), ("ете", 1), ("йте", 1), ("ешь", 1),
    ("нно", 1), ("ила", 2), ("ыла", 2), ("ена", 2), ("ите", 2),
    ("или", 2), ("ыли", 2), ("ило", 2), ("ыло", 2), ("ено", 2),
    ("ует", 2), ("уют", 2), ("ены", 2), ("ить", 2), ("ыть", 2),
    ("ишь", 2),
    ("ла", 1), ("на", 1), ("ли", 1), ("ем", 1), ("ло", 1), ("но", 1),
    ("ет", 1), ("ют", 1), ("ны", 1), ("ть", 1),
    ("ей", 2), ("уй", 2), ("ил", 2), ("ыл", 2), ("им", 2), ("ым", 2),
    ("ен", 2), ("ят", 2), ("ит", 2), ("ыт", 2), ("ую", 2),
    ("й", 1), ("л", 1), ("н", 1), ("ю", 2),
]
_RU_NOUN = [
    (e, 0) for e in (
        "иями", "ями", "ами", "ией", "иям", "ием", "иях",
        "ев", "ов", "ие", "ье", "еи", "ии", "ей", "ой", "ий", "ям",
        "ем", "ам", "ом", "ах", "ях", "ию", "ью", "ия", "ья",
        "а", "е", "и", "й", "о", "у", "ы", "ь", "ю", "я",
    )
]


# pre-sorted longest-first once: _ru_match runs per token on the hot path
_RU_PERF_GERUND = sorted(_RU_PERF_GERUND, key=lambda t: -len(t[0]))
_RU_ADJECTIVE = sorted(_RU_ADJECTIVE, key=lambda t: -len(t[0]))
_RU_PARTICIPLE = sorted(_RU_PARTICIPLE, key=lambda t: -len(t[0]))
_RU_VERB = sorted(_RU_VERB, key=lambda t: -len(t[0]))
_RU_NOUN = sorted(_RU_NOUN, key=lambda t: -len(t[0]))


def _ru_regions(w: str) -> tuple[int, int]:
    """(RV, R2) start offsets: RV after the first vowel; R2 standard."""
    rv = len(w)
    for i, ch in enumerate(w):
        if ch in _RU_VOWELS:
            rv = i + 1
            break
    r1 = len(w)
    for i in range(1, len(w)):
        if w[i] not in _RU_VOWELS and w[i - 1] in _RU_VOWELS:
            r1 = i + 1
            break
    r2 = len(w)
    for i in range(r1 + 1, len(w)):
        if w[i] not in _RU_VOWELS and w[i - 1] in _RU_VOWELS:
            r2 = i + 1
            break
    return rv, r2


def _ru_match(w: str, rv: int, table) -> str | None:
    """Longest ending from `table` that matches inside RV; group-1
    entries additionally require a directly preceding а/я (also inside
    RV). Returns the matched ending, or None — a longest match with a
    failed condition fails the class (Snowball `among` semantics).
    Tables are pre-sorted longest-first at module load (this runs once
    per token on the Arrow hot path)."""
    for e, g in table:
        start = len(w) - len(e)
        if start >= rv and w.endswith(e):
            if g == 1:
                p = start - 1
                if p >= rv and w[p] in "ая":
                    return e
                return None
            return e
    return None


def russian_stem(word: str) -> str:
    """Snowball Russian (published algorithm description,
    snowballstem.org "Russian stemming algorithm"). All steps operate
    inside RV; derivational endings require R2."""
    w = word.lower().replace("ё", "е")
    rv, r2 = _ru_regions(w)
    # step 1: perfective gerund, else [reflexive] adjectival|verb|noun
    e = _ru_match(w, rv, _RU_PERF_GERUND)
    if e is not None:
        w = w[: len(w) - len(e)]
    else:
        for refl in ("ся", "сь"):
            if w.endswith(refl) and len(w) - 2 >= rv:
                w = w[:-2]
                break
        adj = _ru_match(w, rv, _RU_ADJECTIVE)
        if adj is not None:
            w = w[: len(w) - len(adj)]
            part = _ru_match(w, rv, _RU_PARTICIPLE)
            if part is not None:
                w = w[: len(w) - len(part)]
        else:
            verb = _ru_match(w, rv, _RU_VERB)
            if verb is not None:
                w = w[: len(w) - len(verb)]
            else:
                noun = _ru_match(w, rv, _RU_NOUN)
                if noun is not None:
                    w = w[: len(w) - len(noun)]
    # step 2: trailing и
    if w.endswith("и") and len(w) - 1 >= rv:
        w = w[:-1]
    # step 3: derivational ость/ост in R2
    for e in ("ость", "ост"):
        if w.endswith(e) and len(w) - len(e) >= r2:
            w = w[: len(w) - len(e)]
            break
    # step 4: superlative + undouble н, or undouble н, or drop ь
    # (per-suffix RV check: 'ейше' starts at len-4, 'ейш' at len-3)
    if w.endswith("ейше") and len(w) - 4 >= rv:
        w = w[:-4]
        if w.endswith("нн") and len(w) - 1 >= rv:
            w = w[:-1]
    elif w.endswith("ейш") and len(w) - 3 >= rv:
        w = w[:-3]
        if w.endswith("нн") and len(w) - 1 >= rv:
            w = w[:-1]
    elif w.endswith("нн") and len(w) - 1 >= rv and len(w) - 2 >= rv:
        w = w[:-1]
    elif w.endswith("ь") and len(w) - 1 >= rv:
        w = w[:-1]
    return w


# --------------------------------------------------------------- Turkish

_TR_VOWELS = "aeıioöuü"
# progressive vowel harmony: last stem vowel -> admissible suffix vowels
_TR_HARMONY = {
    "a": "aı", "e": "ei", "ı": "aı", "i": "ei",
    "o": "au", "ö": "eü", "u": "au", "ü": "eü",
}
# suffix families as concrete surface forms (A = a/e, U = ı/i/u/ü,
# D = d/t, C = c/ç), expanded here instead of runtime templating
_TR_A = "ae"
_TR_U = "ıiuü"


import functools


@functools.lru_cache(maxsize=None)
def _tr_forms(pattern: str) -> tuple[str, ...]:
    """Expand a suffix template to surface forms. All A positions take
    the SAME vowel, as do all U positions (suffix-internal harmony:
    sUnUz -> sınız/siniz/sunuz/sünüz, never sınuz); D/C expand
    per-position."""
    outs = []
    a_choices = _TR_A if "A" in pattern else "a"
    u_choices = _TR_U if "U" in pattern else "ı"
    for a in a_choices:
        for u in u_choices:
            out = [""]
            for ch in pattern:
                letters = {
                    "A": a, "U": u, "D": "dt", "C": "cç",
                    # I: the high vowel tied to A's front/backness
                    # (lArI -> ları/leri, cAsInA -> casına/cesine)
                    "I": "ı" if a == "a" else "i",
                }.get(ch, ch)
                out = [p + l for p in out for l in letters]
            outs.extend(out)
    # dedupe, preserve order; longest-first so _tr_strip's scan takes
    # the longest surface form (cached: one expansion per pattern ever)
    seen, uniq = set(), []
    for f in sorted(outs, key=len, reverse=True):
        if f not in seen:
            seen.add(f)
            uniq.append(f)
    return tuple(uniq)


def _tr_last_vowel(w: str) -> str | None:
    for ch in reversed(w):
        if ch in _TR_VOWELS:
            return ch
    return None


def _tr_strip(w: str, pattern: str, *, opt: str | None = None) -> str | None:
    """Strip one suffix family from `w`. `pattern` uses the A/U/D/C
    metavowels; `opt` is the optional buffer letter of -(y)/(n)/(s)
    suffixes: when present it must follow a vowel (Snowball's
    mark_suffix_with_optional_*). Vowel-harmony is checked between the
    suffix's first vowel and the last stem vowel. Returns the stripped
    word or None."""
    for form in _tr_forms(pattern):
        if not w.endswith(form) or len(w) <= len(form):
            continue
        stem = w[: len(w) - len(form)]
        if opt is not None and stem.endswith(opt):
            if len(stem) >= 2 and stem[-2] in _TR_VOWELS:
                stem = stem[:-1]
            else:
                continue
        sv = next((c for c in form if c in _TR_VOWELS), None)
        if sv is not None:
            lv = _tr_last_vowel(stem)
            if lv is None or sv not in _TR_HARMONY[lv]:
                continue
        if _tr_last_vowel(stem) is None:
            continue
        return stem
    return None


def _tr_noun_pass(w: str, depth: int = 0) -> str:
    """One pass of the noun-suffix cascade (stem_noun_suffixes):
    the ki-chain first (ki marks a whole preceding suffix chain:
    evdeki -> evde -> ev), then possessives and plural (with their
    chains), then case suffixes (with an optional possessive before
    them)."""
    if w.endswith("ki") and depth < 4:
        inner = _tr_noun_pass(w[:-2], depth + 1)
        if _tr_last_vowel(inner):
            return inner
    s = _tr_strip(w, "lArI")
    if s is not None:
        return s
    # -(U)mUz / -(U)nUz: buffer vowel present after consonant-final
    # stems (evimiz), absent after vowel-final stems (arabamız)
    for poss in ("UmUz", "mUz", "UnUz", "nUz"):
        s = _tr_strip(w, poss)
        if s is not None:
            return _tr_strip(s, "lAr") or s
    s = _tr_strip(w, "U", opt="s")
    if s is not None:
        return _tr_strip(s, "lAr") or s
    s = _tr_strip(w, "lAr")
    if s is not None:
        if s.endswith("ki") and depth < 4:
            chained = _tr_noun_pass(s, depth + 1)
            if chained != s:
                return chained
        return s
    for case, opt in (
        ("nDAn", None), ("nDA", None), ("nUn", None), ("DAn", None),
        ("DA", None), ("lA", "y"), ("nA", None), ("nU", None),
        ("Un", None), ("A", "y"), ("U", "y"), ("CA", None),
    ):
        s = _tr_strip(w, case, opt=opt)
        if s is not None:
            for poss in ("lArU", "UmUz", "UnUz"):
                p = _tr_strip(s, poss)
                if p is not None:
                    return _tr_strip(p, "lAr") or p
            p = _tr_strip(s, "U", opt="s")
            if p is not None:
                return _tr_strip(p, "lAr") or p
            return _tr_strip(s, "lAr") or s
    return w


def turkish_stem(word: str) -> str:
    """Snowball Turkish (published algorithm description,
    snowballstem.org "Turkish stemming algorithm", E. Kapusuz Cilden):
    strips nominal-verb suffixes then noun suffixes, every strip gated
    by progressive vowel harmony and the -(y)/(n)/(s) buffer-letter
    rules, then devoices a final b/c/d/ğ (post_process_last_consonants).

    Pragmatic linearization of the published cascade: the branch chains
    are flattened into ordered passes and the rarely-hit
    append-vowel-to-d/g postlude is omitted — deviations are
    deterministic and shared by the index and query sides, so Contains
    semantics stay consistent (same caveat as the module header)."""
    w = word.lower()
    if sum(c in _TR_VOWELS for c in w) < 2:
        return w  # single-syllable words are never stripped
    # nominal verb suffixes
    for pat, opt in (
        ("cAsInA", None), ("sUnUz", None), ("mUş", "y"), ("DU", "y"),
        ("sA", "y"), ("ken", None), ("DUr", None), ("lAr", None),
        ("Um", "y"), ("sUn", None), ("Uz", "y"),
    ):
        s = _tr_strip(w, pat, opt=opt)
        if pat == "Uz" and s is not None and s[-1:] in ("m", "n"):
            # ...mUz/...nUz is the possessive -(U)mUz/-(U)nUz, not the
            # 1pl copula -(y)Uz — leave it for the noun pass
            s = None
        if s is not None:
            w = s
            extra = _tr_strip(w, "DUr")
            if extra is not None:
                w = extra
            break
    # noun suffixes (single pass with chains, like stem_noun_suffixes)
    w = _tr_noun_pass(w)
    # post_process_last_consonants
    final = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}
    if w and w[-1] in final:
        w = w[:-1] + final[w[-1]]
    return w


SNOWBALL_STEMMERS = {
    "german": german_stem, "de": german_stem,
    "spanish": spanish_stem, "es": spanish_stem,
    "french": french_stem, "fr": french_stem,
    "portuguese": portuguese_stem, "pt": portuguese_stem,
    "italian": italian_stem, "it": italian_stem,
    "swedish": swedish_stem, "sv": swedish_stem,
    "norwegian": norwegian_stem, "no": norwegian_stem,
    "danish": danish_stem, "da": danish_stem,
    "dutch": dutch_stem, "nl": dutch_stem,
    "russian": russian_stem, "ru": russian_stem,
    "turkish": turkish_stem, "tr": turkish_stem,
    "romanian": romanian_stem, "ro": romanian_stem,
    "hungarian": hungarian_stem, "hu": hungarian_stem,
    "finnish": finnish_stem, "fi": finnish_stem,
    "greek": greek_stem, "el": greek_stem,
    "arabic": arabic_stem, "ar": arabic_stem,
    "tamil": tamil_stem, "ta": tamil_stem,
    # Vietnamese maps to the English (Porter) stemmer in
    # functions/text.py:_stemmer_for, mirroring the reference
    # (stemming_tokenizer.rs: Language::English | Language::Vietnamese)
}
