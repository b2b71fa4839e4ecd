"""128-bit id handling (T4): the reference's ids are u128, carried on
the wire as (high u64, low u64) pairs or UUID strings
(rs/proto/proto/muopdb.proto:72-81; rs/utils/src/mem.rs id_to_u128).

Spark has no unsigned 128-bit type; the engine's convention (SURVEY.md
§7.2 hard parts) is a (hi, lo) LongType pair whose lexicographic order
(hi, lo) matches u128 order for ids in the signed-positive range, plus
hex/UUID string forms for the API edge. All pure Column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def id_to_hex(hi: Column | str, lo: Column | str) -> Column:
    """(hi, lo) -> 32-char lowercase hex."""
    h = F.col(hi) if isinstance(hi, str) else hi
    l = F.col(lo) if isinstance(lo, str) else lo
    return F.lower(
        F.concat(F.lpad(F.hex(h), 16, "0"), F.lpad(F.hex(l), 16, "0"))
    )


def hex_to_uuid(hex32: Column) -> Column:
    """32-char hex -> 8-4-4-4-12 UUID string."""
    return F.concat_ws(
        "-",
        F.substring(hex32, 1, 8),
        F.substring(hex32, 9, 4),
        F.substring(hex32, 13, 4),
        F.substring(hex32, 17, 4),
        F.substring(hex32, 21, 12),
    )


def uuid_to_hex(uuid_str: Column | str) -> Column:
    c = F.col(uuid_str) if isinstance(uuid_str, str) else uuid_str
    return F.lower(F.regexp_replace(c, "-", ""))


def hex_to_hi_lo(hex32: Column) -> tuple[Column, Column]:
    """32-char hex -> (hi, lo) longs. Valid for values within the signed
    64-bit range per half (the fixtures' range; full u64 halves would
    need unsigned reinterpretation)."""
    hi = F.conv(F.substring(hex32, 1, 16), 16, 10).cast("long")
    lo = F.conv(F.substring(hex32, 17, 16), 16, 10).cast("long")
    return hi, lo


def id_pair_order(hi: Column | str, lo: Column | str) -> list[Column]:
    """ORDER BY keys giving u128 ordering for signed-positive halves —
    the tie-break contract of utils.rs:107."""
    h = F.col(hi) if isinstance(hi, str) else hi
    l = F.col(lo) if isinstance(lo, str) else lo
    return [h.asc(), l.asc()]
