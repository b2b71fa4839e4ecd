"""Unicode/whitespace text normalization — the canonicalization pass a
training-data pipeline runs BEFORE any hashing/dedup/tokenization
(mojibake-adjacent combining sequences, invisible characters, and
whitespace noise otherwise make byte-identical content hash apart:
'cafe\\u0301' vs 'caf\\u00e9' are different md5s but the same text).

Stages (applied in this exact order on both engines — the DuckDB
oracle is a verbatim transcription, nfc_normalize + the same regex
sequence):

  1. NFC normalization (canonical composition).
  2. strip invisibles: ZWSP/ZWNJ/ZWJ/BOM-ZWNBSP/soft-hyphen.
  3. CRLF and stray CR become \\n; strip remaining C0 controls except
     \\n and \\t; \\t becomes a space.
  4. collapse space runs to one space; trim spaces hugging newlines;
     trim the document.

Execution shape: ONE vectorized Arrow pandas_udf doing all stages per
batch — Spark has no built-in NFC, so a Python hop is unavoidable, and
once it exists, folding the regex stages into the same pass beats
NFC-in-Python + a 3x-referenced JVM regexp chain (Catalyst extracts
the UDF into a single ArrowEvalPython node, so every downstream
reference — length, change flag, downstream dedup — is a free
attribute read; the same design call as dedup.shingle_df's tokenizer).
Fully map-side: zero shuffles, zero joins.

Beyond-reference operator (BASELINE.json north star: corpus hygiene);
the reference's ingest path assumes pre-cleaned input
(rs/index_writer/src/input/*.rs reads records verbatim).
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# kept in character-for-character sync with the DuckDB oracle
# (__spark_entry__._clean_text_sql builds the same classes via \x{...})
_RX_INVISIBLE = re.compile("[\u200b\u200c\u200d\ufeff\u00ad]")
_RX_CR = re.compile(r"\r\n|\r")
_RX_CONTROL = re.compile("[\x00-\x08\x0b-\x0c\x0e-\x1f\x7f]")
_RX_SPACES = re.compile(r" {2,}")
_RX_NL_PAD = re.compile(r" *\n *")


def _clean_one(t: str | None) -> str | None:
    if t is None:
        return None
    t = unicodedata.normalize("NFC", t)
    t = _RX_INVISIBLE.sub("", t)
    t = _RX_CR.sub("\n", t)
    t = _RX_CONTROL.sub("", t)
    t = t.replace("\t", " ")
    t = _RX_SPACES.sub(" ", t)
    t = _RX_NL_PAD.sub("\n", t)
    return t.strip(" \n")


@F.pandas_udf(StringType())
def _clean(texts: pd.Series) -> pd.Series:
    return texts.map(_clean_one)


def normalize_text(col: Column | str) -> Column:
    """The full cleanup as one Column expression (one Arrow pass)."""
    return _clean(F.col(col) if isinstance(col, str) else col)


def clean_text(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, text_clean, n_chars_in, n_chars_out, changed) for every
    input row. `changed` marks docs the cleanup actually touched — the
    audit signal for how dirty a source is (FineWeb-style per-source
    hygiene stats roll up from it). Null text stays null
    (changed=false): absence is upstream's problem, not whitespace."""
    raw = F.col(text_col)
    cleaned = normalize_text(raw)
    return df.select(
        F.col(id_col),
        cleaned.alias("text_clean"),
        F.length(raw).cast("long").alias("n_chars_in"),
        F.length(cleaned).cast("long").alias("n_chars_out"),
        F.coalesce(cleaned != raw, F.lit(False)).alias("changed"),
    )
