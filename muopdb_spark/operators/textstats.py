"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All pure Column expressions (JVM-side, whole-stage codegen) — no Python
in the hot path, no shuffle except where aggregation is the point.
Every operator is deterministic so a DuckDB oracle can replicate it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from muopdb_spark.functions.text import simple_tokens

# Small public stopword lists (top function words per language) —
# the Latin-script languages of the Snowball stemmer set (r14: widened
# from en/de/fr/es to all 14; non-Latin scripts are out of reach of
# simple_tokens' [a-z0-9] alphabet, and diacritic-bearing forms are
# excluded for the same reason, so each list is ASCII function words
# only — a disclosed reduction, not full fastText coverage).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "zu", "den", "ein"),
    "fr": ("le", "la", "les", "et", "de", "un", "une", "est", "du", "des"),
    "es": ("el", "la", "los", "las", "y", "de", "un", "una", "es", "en"),
    "pt": ("o", "os", "as", "um", "uma", "em", "para", "com", "por", "mais"),
    "it": ("il", "di", "che", "per", "con", "del", "si", "sono", "anche", "ma"),
    "nl": ("het", "een", "van", "dat", "op", "te", "niet", "zijn", "voor", "met"),
    "sv": ("och", "att", "som", "det", "har", "av", "om", "till", "den", "inte"),
    "no": ("og", "som", "til", "av", "ikke", "det", "han", "den", "med", "var"),
    "da": ("og", "af", "til", "det", "som", "han", "den", "med", "var", "ikke"),
    "tr": ("ve", "bir", "bu", "ne", "gibi", "daha", "sonra", "kadar", "ama", "icin"),
    "ro": ("si", "sa", "nu", "este", "care", "pe", "cu", "mai", "dar", "dupa"),
    "hu": ("az", "hogy", "nem", "is", "egy", "van", "meg", "ez", "mar", "csak"),
    "fi": ("ja", "on", "ei", "se", "oli", "mutta", "niin", "kun", "myos", "jos"),
}

# BPE-ish pre-tokenizer: alnum runs OR single non-alnum-non-space chars.
_BPE_RE = r"[a-z0-9]+|[^a-z0-9\s]"


def ws_token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != ""))


def bpe_token_count(col: Column | str) -> Column:
    """Count of BPE-ish pre-tokens (alnum runs + isolated punctuation) —
    a cheap proxy for subword token count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(_BPE_RE), 0))


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    toks = simple_tokens(col)
    stops = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    return F.when(F.size(toks) > 0, n_stop / F.size(toks)).otherwise(F.lit(0.0))


def quality_features(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document quality features + composite score in [0, 1]:

      len_score  = min(1, n_tokens / 50)          (too-short penalty)
      alpha_frac = alnum+space chars / chars       (boilerplate penalty)
      stop_hit   = min(1, 5 * stopword_ratio)      (natural-language-ness)
      quality    = len_score * alpha_frac * (0.5 + 0.5 * stop_hit)

    ``carry``: names of ``df`` columns passed through to the output
    verbatim — lets a caller that also needs non-quality per-doc
    columns (e.g. a differently-tokenized token count) get them from
    this same single scan instead of joining two corpus projections
    back on ``id_col``.
    """
    # stage the token array once per row — the expressions below
    # reference it many times and only attribute refs are re-eval-free
    staged = df.select(
        id_col,
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        simple_tokens(text_col).alias("_toks"),
        F.length(F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]", ""))
        .cast("long").alias("_alnum_ws"),
        *carry,
    )
    toks = F.col("_toks")
    n_chars = F.col("n_chars")
    n_tokens = F.size(toks)
    alpha_frac = F.when(n_chars > 0, F.col("_alnum_ws") / n_chars).otherwise(F.lit(0.0))
    avg_tok = F.when(
        n_tokens > 0,
        F.aggregate(toks, F.lit(0), lambda s, t: s + F.length(t)) / n_tokens,
    ).otherwise(F.lit(0.0))
    stops = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    stop = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    len_score = F.least(F.lit(1.0), n_tokens / F.lit(50.0))
    stop_hit = F.least(F.lit(1.0), stop * 5.0)
    quality = len_score * alpha_frac * (F.lit(0.5) + F.lit(0.5) * stop_hit)
    return staged.select(
        id_col,
        "n_chars",
        n_tokens.cast("long").alias("n_tokens"),
        F.round(avg_tok, 6).alias("avg_token_len"),
        F.round(alpha_frac, 6).alias("alpha_frac"),
        F.round(stop, 6).alias("stopword_ratio"),
        F.round(quality, 6).alias("quality"),
        *carry,
    )


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit ratio (the n-gram-free lang-ID heuristic)."""
    toks = simple_tokens(col)

    def in_stops(stops):
        # closure factory — a default-arg lambda would be introspected
        # as the 2-arg (element, index) filter variant
        return lambda t: F.array_contains(stops, t)

    out = {}
    for lang, words in STOPWORDS.items():
        stops = F.array(*[F.lit(w) for w in words])
        n = F.size(F.filter(toks, in_stops(stops)))
        out[lang] = F.when(F.size(toks) > 0, n / F.size(toks)).otherwise(F.lit(0.0))
    return out


def _in_stops(stops):
    # closure factory — a default-arg lambda would be introspected
    # as the 2-arg (element, index) filter variant
    return lambda t: F.array_contains(stops, t)


def _stopword_score_cols(toks: Column, stopmap: dict, prefix: str) -> list:
    """One aliased stopword-hit-ratio column per language over a
    STAGED token-array column — the shared builder behind lang_id,
    lang_id_multiscript, and lang_id_routed (r15 dedup: the same
    expression used to be hand-built in each)."""
    cols = []
    for lang in sorted(stopmap):
        stops = F.array(*[F.lit(w) for w in stopmap[lang]])
        n = F.size(F.filter(toks, _in_stops(stops)))
        cols.append(
            F.when(F.size(toks) > 0, n / F.size(toks))
            .otherwise(F.lit(0.0)).alias(f"{prefix}{lang}")
        )
    return cols


def _argmax_pred(scores: dict) -> Column:
    """Argmax over {lang: score Column}: alphabetical tie-break,
    'und' when every score is 0."""
    langs = sorted(scores)
    best = F.greatest(*[scores[l] for l in langs]) if len(langs) > 1 \
        else scores[langs[0]]
    pred = F.lit("und")
    for lang in reversed(langs):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    return F.when(best > 0, pred).otherwise(F.lit("und"))


def _script_pred(counts: dict) -> Column:
    """Dominant-script name over {script: char-count Column}:
    alphabetical tie-break, 'und' when no scripted char occurs."""
    names = sorted(counts)
    best = F.greatest(*[counts[n] for n in names])
    pred = F.when(best == 0, F.lit("und"))
    for n in names:
        pred = pred.when(counts[n] == best, F.lit(n))
    return pred.otherwise(F.lit("und"))


def lang_id(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Heuristic language ID: argmax stopword-hit ratio, alphabetical
    tie-break, 'und' (undetermined) when no stopword hits at all."""
    langs = sorted(STOPWORDS)
    # two-stage select: tokenize once, then score once per language over
    # the staged columns (attribute refs are re-eval-free)
    staged = df.select(id_col, simple_tokens(text_col).alias("_toks"))
    scored = staged.select(
        id_col, *_stopword_score_cols(F.col("_toks"), STOPWORDS, "_s_")
    )
    scores = {l: F.col(f"_s_{l}") for l in langs}
    pred = _argmax_pred(scores)
    return scored.select(
        id_col,
        pred.alias("pred_lang"),
        *[F.round(scores[l], 6).alias(f"score_{l}") for l in langs],
    )


def modp_fingerprints(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    hex_prefix: str = "0",
) -> DataFrame:
    """Mod-p sampled shingle fingerprints (winnowing-style document
    sketch): md5 of every n-gram shingle, keep those whose first hex
    digit matches — a deterministic ~1/16 sample usable for fast
    containment/overlap estimation. Output exploded (doc_id, fp)."""
    from muopdb_spark.operators.dedup import shingle_df

    sh = shingle_df(df, text_col=text_col, id_col=id_col, n=n).withColumnRenamed("id", id_col)
    fps = F.array_distinct(
        F.filter(
            F.transform(F.col("sh"), lambda s: F.md5(s)),
            lambda h: F.substring(h, 1, 1) == hex_prefix,
        )
    )
    return sh.select(id_col, F.explode(fps).alias("fp"))


# Unicode scripts the crawl router distinguishes (r14): Java regex
# script classes on the Spark side; the oracle side never needs the
# regex because constructed fixtures make the expected script a CASE
# literal. 'latin' hands off to lang_id's stopword argmax; the others
# name the pipeline (stemmer, tokenizer, fonts) a doc should route to.
SCRIPTS: dict[str, str] = {
    "latin": r"\p{IsLatin}",
    "cyrillic": r"\p{IsCyrillic}",
    "greek": r"\p{IsGreek}",
    "arabic": r"\p{IsArabic}",
    "hebrew": r"\p{IsHebrew}",
    "han": r"\p{IsHan}",
    "hiragana": r"\p{IsHiragana}",
    "katakana": r"\p{IsKatakana}",
    "hangul": r"\p{IsHangul}",
    "devanagari": r"\p{IsDevanagari}",
    "thai": r"\p{IsThai}",
    "tamil": r"\p{IsTamil}",
}


def script_id(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """(id, script, script_chars, n_chars): dominant Unicode script by
    per-script character count (Java regex script classes — pure JVM
    regexp_count, one scan, no Python), alphabetical tie-break, 'und'
    when no scripted character occurs. The routing complement of
    lang_id: stopword lang-ID only speaks [a-z], so a multilingual
    crawl first splits by script (cyrillic/greek/arabic/cjk/... each
    have their own tokenizer + stemmer story) and runs the stopword
    argmax on the latin bucket only."""
    c = F.col(text_col)
    counts = {
        name: F.regexp_count(c, F.lit(pat)) for name, pat in SCRIPTS.items()
    }
    best = F.greatest(*[counts[n] for n in sorted(SCRIPTS)])
    return df.select(
        F.col(id_col),
        _script_pred(counts).alias("script"),
        best.cast("long").alias("script_chars"),
        F.length(c).cast("long").alias("n_chars"),
    )


# r15 (t22): language-ID beyond the Latin bucket. The 14-list stopword
# argmax above only speaks [a-z]; script_id routes non-Latin docs to a
# script, but ru (whose stemmer exists), el, and ar deserve LANGUAGE
# granularity, and the han/kana/hangul scripts distinguish ja/ko/zh by
# character-class ratios, not stopwords. Native-script function-word
# lists (top-frequency words — standard public stopword sets) +
# unicode-letter tokenization; all pure Column HOFs like lang_id.
NONLATIN_STOPWORDS: dict[str, tuple[str, ...]] = {
    "ru": ("и", "в", "не", "на", "я", "что", "он", "с", "как", "это"),
    "el": ("και", "να", "το", "η", "ο", "της", "που", "με", "για", "τα"),
    "ar": ("في", "من", "على", "أن", "إلى", "عن", "هذا", "مع", "كان", "لا"),
}


def unicode_tokens(col: Column | str) -> Column:
    """Unicode word tokens: maximal letter/digit runs of ANY script,
    lowercased — the tokenizer the non-Latin stopword lists need
    (simple_tokens' [a-z0-9] alphabet deletes their alphabets)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.lower(c), r"[^\p{L}\p{N}]+"), lambda t: t != ""
    )


def lang_id_multiscript(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """(id, pred_lang, score_ru/el/ar, kana_chars, hangul_chars,
    han_chars): the non-Latin complement of lang_id. Decision ladder
    (CJK character evidence first — those languages have no spaces for
    stopwords to live between — but only when CJK is the DOMINANT
    letter mass: a stray han/hangul char in a Russian or English page
    must not override everything else, r15 review fix):

      [gate: kana+hangul+han > 0 AND >= cyrillic+greek+arabic+latin]
      ko  if hangul_chars >= kana_chars
      ja  elif kana_chars > 0        (hiragana/katakana only ja uses)
      zh  else                       (han with no kana reads Chinese;
                                      ja text virtually always carries
                                      kana, so bare han routes zh)
      else argmax native-script stopword ratio over ru/el/ar
           (alphabetical tie-break), 'und' when every score is 0

    Latin-script docs score 0 on every list and come out 'und' —
    route them through lang_id; this operator is the other half of
    the script_id dispatch. Pure JVM expressions: regexp_count for
    the script classes, split+filter HOFs for the stopword ratios."""
    c = F.col(text_col)
    hira = F.regexp_count(c, F.lit(SCRIPTS["hiragana"]))
    kata = F.regexp_count(c, F.lit(SCRIPTS["katakana"]))
    hangul = F.regexp_count(c, F.lit(SCRIPTS["hangul"]))
    han = F.regexp_count(c, F.lit(SCRIPTS["han"]))

    noncjk = (
        F.regexp_count(c, F.lit(SCRIPTS["cyrillic"]))
        + F.regexp_count(c, F.lit(SCRIPTS["greek"]))
        + F.regexp_count(c, F.lit(SCRIPTS["arabic"]))
        + F.regexp_count(c, F.lit(SCRIPTS["latin"]))
    )
    staged = df.select(
        id_col,
        unicode_tokens(text_col).alias("_toks"),
        (hira + kata).cast("long").alias("kana_chars"),
        hangul.cast("long").alias("hangul_chars"),
        han.cast("long").alias("han_chars"),
        noncjk.cast("long").alias("_noncjk"),
    )
    langs = sorted(NONLATIN_STOPWORDS)
    scored = staged.select(
        id_col, "kana_chars", "hangul_chars", "han_chars", "_noncjk",
        *_stopword_score_cols(F.col("_toks"), NONLATIN_STOPWORDS, "_s_"),
    )
    scores = {l: F.col(f"_s_{l}") for l in langs}
    stop_pred = _argmax_pred(scores)

    kana = F.col("kana_chars")
    hg = F.col("hangul_chars")
    hn = F.col("han_chars")
    cjk = kana + hg + hn
    pred = F.when(
        (cjk > 0) & (cjk >= F.col("_noncjk")),
        F.when((hg > 0) & (hg >= kana), F.lit("ko"))
        .when(kana > 0, F.lit("ja"))
        .otherwise(F.lit("zh")),
    ).otherwise(stop_pred)
    return scored.select(
        id_col,
        pred.alias("pred_lang"),
        *[F.round(scores[l], 6).alias(f"score_{l}") for l in langs],
        "kana_chars", "hangul_chars", "han_chars",
    )


def lang_id_routed(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """(id, script, pred_lang): the full language-ID dispatch in ONE
    scan — the composition t21/t3/t22 exist for. Route by dominant
    Unicode script (script_id), then:

      latin      -> the 14-list Latin stopword argmax (lang_id);
                    'und' when no stopword hits
      und        -> 'und' (no scripted characters at all)
      han/kana/
      hangul     -> the CJK ladder (hangul>=kana -> ko, kana -> ja,
                    else zh) — gated on the DOMINANT script so a
                    stray CJK char in another script's page cannot
                    hijack the prediction (r15 review fix)
      other
      scripts    -> native-script stopword argmax over ru/el/ar,
                    'und' otherwise

    Single two-stage select, no joins: both token arrays are staged
    once, every score is a column over them — the whole dispatch is
    one map pass of pure JVM expressions (plan-pinned Python-free)."""
    c = F.col(text_col)
    counts = {
        name: F.regexp_count(c, F.lit(pat)) for name, pat in SCRIPTS.items()
    }
    staged = df.select(
        id_col,
        _script_pred(counts).alias("script"),
        simple_tokens(text_col).alias("_lt"),
        unicode_tokens(text_col).alias("_ut"),
        (counts["hiragana"] + counts["katakana"]).alias("_kana"),
        counts["hangul"].alias("_hangul"),
        counts["han"].alias("_han"),
    )

    lat_langs = sorted(STOPWORDS)
    nl_langs = sorted(NONLATIN_STOPWORDS)
    scored = staged.select(
        id_col, "script", "_kana", "_hangul", "_han",
        *_stopword_score_cols(F.col("_lt"), STOPWORDS, "_l_"),
        *_stopword_score_cols(F.col("_ut"), NONLATIN_STOPWORDS, "_n_"),
    )
    latin_pred = _argmax_pred({l: F.col(f"_l_{l}") for l in lat_langs})
    nl_stop_pred = _argmax_pred({l: F.col(f"_n_{l}") for l in nl_langs})

    kana, hg, hn = F.col("_kana"), F.col("_hangul"), F.col("_han")
    cjk_ladder = (
        F.when((hg > 0) & (hg >= kana), F.lit("ko"))
        .when(kana > 0, F.lit("ja"))
        .otherwise(F.lit("zh"))
    )
    pred = (
        F.when(F.col("script") == "latin", latin_pred)
        .when(F.col("script") == "und", F.lit("und"))
        # the CJK ladder applies only when a CJK script is DOMINANT —
        # a stray han char in a cyrillic page must not outrank seven
        # Russian stopwords (r15 review fix); routing by the script
        # column keeps the two decisions consistent by construction
        .when(
            F.col("script").isin("han", "hiragana", "katakana", "hangul"),
            cjk_ladder,
        )
        .otherwise(nl_stop_pred)
    )
    return scored.select(id_col, "script", pred.alias("pred_lang"))
