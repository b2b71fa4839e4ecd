"""Unigram-LM tokenizer — Kudo 2018 (arXiv:1804.10959), the
SentencePiece unigram model: the OTHER subword family production LLM
tokenizers use (vocab.py covers BPE, Sennrich 2016). Training fits a
unigram language model over candidate pieces with EM and iteratively
prunes the vocabulary; encoding is the Viterbi-best segmentation under
the fitted piece log-probabilities.

Spark shape — the same train-at-flush contract as BPE/k-means/PQ:
training never touches the corpus token stream. One map-side-combined
aggregate collapses the corpus to a word-frequency table (<=
``max_words`` rows, Zipf-truncated like every production trainer),
that table is collected bounded to the driver, and EM + pruning run as
pure Python over word LATTICES (forward-backward per distinct word —
O(len * max_piece_len) per word per round). Application is the
distributed half: an Arrow pandas_udf with the piece table in the
closure and a per-batch word cache, so Viterbi runs roughly once per
DISTINCT word per batch. No shuffle anywhere in apply.

Implemented per the paper: seed vocabulary = all corpus characters +
the most frequent substrings; full (soft) EM via forward-backward
expected counts, NOT hard/Viterbi EM; pruning drops the pieces with
the smallest expected count each round (the common likelihood-loss
approximation — SentencePiece's exact loss ranking differs only in
tie regions) while single characters are never pruned, so every
trained-on word stays segmentable. Characters unseen at training
time encode as themselves (the UNK-less byte-fallback analog),
disclosed rather than erroring mid-corpus.

Determinism: seed ranking, EM arithmetic and prune order all
tie-break lexicographically, so identical inputs give identical
vocabularies on any partitioning.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from muopdb_spark.functions.text import simple_tokens

__all__ = [
    "unigram_train_on_words",
    "unigram_encode_word",
    "unigram_train",
    "unigram_apply",
]

_NEG_INF = float("-inf")


def _log_add(a: float, b: float) -> float:
    if a == _NEG_INF:
        return b
    if b == _NEG_INF:
        return a
    m = a if a > b else b
    return m + math.log1p(math.exp(-abs(a - b)))


def _forward_backward(
    word: str, logp: dict[str, float], max_len: int
) -> tuple[float, list[tuple[str, float]]]:
    """(logZ, [(piece, posterior)]) for one word under the current
    model: forward/backward over the segmentation lattice; posterior
    is the probability the piece occurs at its position in a random
    segmentation. Unreachable words return (-inf, [])."""
    n = len(word)
    alpha = [_NEG_INF] * (n + 1)
    alpha[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            if alpha[j] == _NEG_INF:
                continue
            lp = logp.get(word[j:i])
            if lp is None:
                continue
            alpha[i] = _log_add(alpha[i], alpha[j] + lp)
    if alpha[n] == _NEG_INF:
        return _NEG_INF, []
    beta = [_NEG_INF] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        for k in range(i + 1, min(n, i + max_len) + 1):
            if beta[k] == _NEG_INF:
                continue
            lp = logp.get(word[i:k])
            if lp is None:
                continue
            beta[i] = _log_add(beta[i], lp + beta[k])
    out: list[tuple[str, float]] = []
    for j in range(n):
        if alpha[j] == _NEG_INF:
            continue
        for k in range(j + 1, min(n, j + max_len) + 1):
            piece = word[j:k]
            lp = logp.get(piece)
            if lp is None or beta[k] == _NEG_INF:
                continue
            post = math.exp(alpha[j] + lp + beta[k] - alpha[n])
            if post > 0.0:
                out.append((piece, post))
    return alpha[n], out


def unigram_train_on_words(
    word_freq: dict[str, int],
    vocab_size: int,
    *,
    max_piece_len: int = 8,
    seed_factor: int = 4,
    shrink: float = 0.75,
    em_iters: int = 2,
) -> dict[str, float]:
    """Fit a unigram piece vocabulary of (at most) ``vocab_size``
    pieces over a word-frequency dict. Pure Python — the driver-side
    half of unigram_train. Returns {piece: normalized logp}."""
    if vocab_size < 1:
        raise ValueError(
            f"unigram_train_on_words: vocab_size must be >= 1,"
            f" got {vocab_size}"
        )
    if not (0.0 < shrink < 1.0):
        raise ValueError(
            f"unigram_train_on_words: shrink must be in (0, 1),"
            f" got {shrink}"
        )
    words = {w: int(f) for w, f in word_freq.items() if w and f > 0}
    if not words:
        raise ValueError("unigram_train_on_words: empty word table")

    # --- seed: every character + frequent substrings, ranked by
    # occurrence-mass * length (longer pieces save more splits)
    chars: set[str] = set()
    sub_mass: dict[str, int] = {}
    for w, f in words.items():
        chars.update(w)
        n = len(w)
        for j in range(n):
            for k in range(j + 2, min(n, j + max_piece_len) + 1):
                s = w[j:k]
                sub_mass[s] = sub_mass.get(s, 0) + f
    seed_size = max(int(vocab_size) * int(seed_factor), len(chars) + 1)
    ranked = sorted(
        sub_mass.items(), key=lambda kv: (-kv[1] * len(kv[0]), kv[0])
    )
    vocab: dict[str, float] = {}
    for s, m in ranked[: max(0, seed_size - len(chars))]:
        vocab[s] = float(m * len(s))
    for c in chars:
        # characters get their true occurrence mass and are never
        # pruned — segmentability guarantee
        vocab[c] = float(sum(f * w.count(c) for w, f in words.items()))

    def _normalize(counts: dict[str, float]) -> dict[str, float]:
        total = sum(counts.values())
        return {
            p: math.log(c / total) if c > 0 else _NEG_INF
            for p, c in counts.items()
        }

    logp = _normalize(vocab)

    while True:
        # --- EM over the word lattices
        for _ in range(max(1, int(em_iters))):
            expected: dict[str, float] = dict.fromkeys(logp, 0.0)
            for w, f in sorted(words.items()):
                _z, posts = _forward_backward(w, logp, max_piece_len)
                for piece, post in posts:
                    expected[piece] += post * f
            # single-character floor (r16): never-pruned is not enough —
            # EM itself can STARVE a character (a word goes unreachable
            # once some needed piece hit -inf in an earlier round, its
            # mass vanishes, and the spiral ends with every piece at
            # -inf and an unencodable vocabulary, found by the
            # reconstruction fuzz). A tiny floor keeps every character
            # reachable so the next round's lattices can redistribute
            # mass — SentencePiece likewise always retains required
            # characters with nonzero probability.
            for p in expected:
                if len(p) == 1 and expected[p] <= 0.0:
                    expected[p] = 1e-9
            logp = _normalize(expected)
            vocab = expected
        if len(logp) <= vocab_size:
            break
        # --- prune: drop the lowest-expected-count multi-char pieces
        keep_n = max(int(vocab_size), int(len(logp) * shrink))
        multi = sorted(
            ((vocab[p], p) for p in logp if len(p) > 1),
            key=lambda t: (t[0], t[1]),
        )
        n_single = sum(1 for p in logp if len(p) == 1)
        n_drop = min(len(multi), len(logp) - max(keep_n, n_single))
        dropped = {p for _c, p in multi[:n_drop]}
        if not dropped:
            break
        logp = {p: lp for p, lp in logp.items() if p not in dropped}
        total = sum(math.exp(lp) for lp in logp.values() if lp > _NEG_INF)
        logp = {
            p: (lp - math.log(total) if lp > _NEG_INF else _NEG_INF)
            for p, lp in logp.items()
        }
    return logp


def unigram_encode_word(
    word: str, logp: dict[str, float], *, max_piece_len: int = 8
) -> list[str]:
    """Viterbi-best segmentation of one word. Characters absent from
    the vocabulary pass through as single-character pieces (the
    byte-fallback analog, disclosed in the module docstring). Ties
    resolve to the LONGEST piece at each boundary — deterministic."""
    if not word:
        return []
    n = len(word)
    # total even on a degenerate table (r16): every entry at -inf (a
    # pre-floor-fix artifact) made the min() below raise on an empty
    # sequence; treat that table as all-unknown instead
    finite = [lp for lp in logp.values() if lp > _NEG_INF]
    unk = (min(finite) - 10.0) if finite else -100.0
    best = [_NEG_INF] * (n + 1)
    best[0] = 0.0
    back: list[int] = [0] * (n + 1)
    for i in range(1, n + 1):
        # j ascending means the LONGEST candidate piece is evaluated
        # first; strict '>' keeps it on ties
        for j in range(max(0, i - max_piece_len), i):
            if best[j] == _NEG_INF:
                continue
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if len(piece) != 1:
                    continue
                lp = unk
            score = best[j] + lp
            if score > best[i]:
                best[i] = score
                back[i] = j
    out: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    out.reverse()
    return out


def unigram_train(
    df: DataFrame,
    *,
    text_col: str = "text",
    vocab_size: int = 200,
    max_words: int = 100_000,
    max_piece_len: int = 8,
) -> dict[str, float]:
    """Corpus -> unigram piece table: one vocabulary-sized aggregate
    (map-side combine), bounded collect of the top ``max_words`` words
    by mass, then the pure-Python EM/prune loop."""
    rows = (
        df.select(F.explode(simple_tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("count"))
        .orderBy(F.desc("count"), F.asc("token"))
        .limit(int(max_words))
        .collect()
    )
    return unigram_train_on_words(
        {r["token"]: r["count"] for r in rows},
        vocab_size,
        max_piece_len=max_piece_len,
    )


# word -> pieces, per (max_piece_len, vocab) — see unigram_apply.
# r17 (r16 VERDICT #4 + ADVICE): digest-keyed (the raw sorted-vocab
# tuple key was re-hashed by setdefault every Arrow batch) and
# size-capped, same shape and rationale as vocab._BPE_WORD_CACHE.
_UNIGRAM_WORD_CACHE: dict[str, dict[str, list]] = {}
_UNIGRAM_CACHE_MAX_VOCABS = 8
_UNIGRAM_CACHE_MAX_WORDS = 1 << 20


def _unigram_word_encoder(ckey: str, table: dict, mpl: int):
    """Capped module-level word->pieces memo for one vocabulary."""
    cache = _UNIGRAM_WORD_CACHE.get(ckey)
    if cache is None:
        while len(_UNIGRAM_WORD_CACHE) >= _UNIGRAM_CACHE_MAX_VOCABS:
            _UNIGRAM_WORD_CACHE.pop(next(iter(_UNIGRAM_WORD_CACHE)))
        cache = _UNIGRAM_WORD_CACHE[ckey] = {}

    def enc(w: str) -> list[str]:
        got = cache.get(w)
        if got is None:
            if len(cache) >= _UNIGRAM_CACHE_MAX_WORDS:
                cache.clear()
            got = cache[w] = unigram_encode_word(
                w, table, max_piece_len=mpl
            )
        return got

    return enc


def unigram_apply(
    df: DataFrame,
    logp: dict[str, float],
    *,
    text_col: str = "text",
    out_col: str = "unigram_tokens",
    max_piece_len: int = 8,
) -> DataFrame:
    """Append ``out_col`` (array<string>): the Viterbi piece stream of
    ``text_col`` under the fitted vocabulary. Map-side only — Arrow
    pandas_udf, piece table in the closure; the word cache lives at
    module level keyed by the vocabulary itself (r16 — survives
    across Arrow batches and reused workers instead of being rebuilt
    per batch; guide §4.5, same shape as vocab._BPE_WORD_CACHE)."""
    import hashlib

    import pandas as pd

    table = dict(logp)
    mpl = int(max_piece_len)
    # digest computed ONCE here (driver); executors hash a short hex
    # string per batch instead of the full vocab tuple
    ckey = hashlib.md5(
        repr((mpl, sorted(table.items()))).encode()
    ).hexdigest()

    @F.pandas_udf("array<array<string>>")
    def encode(col):
        import re

        enc = _unigram_word_encoder(ckey, table, mpl)

        split = re.compile(r"[^a-z0-9]+")

        def doc(text) -> list[list[str]]:
            toks = [t for t in split.split((text or "").lower()) if t]
            return [enc(t) for t in toks]

        return pd.Series([doc(t) for t in col])

    return df.withColumn(out_col, F.flatten(encode(F.col(text_col))))
