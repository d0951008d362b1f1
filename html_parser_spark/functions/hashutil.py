"""The one md5-derived integer hash the whole engine shares.

``md5_mod``'s exact shape — ``pmod(conv(substr(md5(utf8), 1, 15), 16,
10)::bigint, m)`` — is load-bearing: DuckDB replays it bit-for-bit as
``('0x' || substr(md5(x), 1, 15))::BIGINT % m`` (verified), and every
oracle twin of a hash-dependent operator (MinHash shingles, winnowing
position hashes, stratified sampling, shard assignment) depends on all
call sites staying in lockstep. Change it here or nowhere.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["md5_mod"]


def md5_mod(col: Column, m: int) -> Column:
    """60-bit md5 prefix of the utf-8 bytes of ``col``, reduced mod ``m``
    — a deterministic, DuckDB-replayable integer hash (15 hex digits keep
    the conv result inside bigint; pmod keeps it non-negative)."""
    return F.pmod(
        F.conv(F.substring(F.md5(F.encode(col, "utf-8")), 1, 15), 16, 10)
        .cast("bigint"),
        F.lit(int(m)))
