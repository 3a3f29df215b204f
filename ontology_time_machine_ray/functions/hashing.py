"""Deterministic hashing used for dedup keys, partitioning, and salting.

Everything here is stable across processes and Python versions (never the
builtin ``hash``): partition assignment must be reproducible so a resumed
run maps the same row to the same output partition (the engine analog of
the reference's sha256 content-hash change detection,
``download_archivo_urls.py:41-46``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


def stable_hash64_series(values: pd.Series) -> np.ndarray:
    """Vectorized stable uint64 hash of a string/any series.

    ``pandas.util.hash_pandas_object`` with the default fixed key is
    deterministic across processes -- the workhorse for dedup keys,
    ``partition = h % P`` assignment, and salt columns.
    """
    return pd.util.hash_pandas_object(values, index=False).to_numpy()


def stable_hash64(value: str) -> int:
    """Scalar stable 64-bit hash (blake2b-8) for driver-side decisions."""
    return int.from_bytes(
        hashlib.blake2b(value.encode("utf-8"), digest_size=8).digest(), "big"
    )


def md5_hash64_series(values: pd.Series) -> np.ndarray:
    """uint64 from the first 8 md5 bytes (== first 16 hex chars, big-endian).

    Matches DuckDB's ``CAST(concat('0x', substr(md5(x), 1, 16)) AS
    UBIGINT)`` exactly, so any operator keyed on this hash (MinHash
    signatures, SimHash bit votes) is restatable as a full SQL oracle.
    ~2x the cost of ``stable_hash64_series`` -- use only where the SQL
    replay is worth it.
    """
    md5 = hashlib.md5
    return np.fromiter(
        (int.from_bytes(md5(s.encode("utf-8")).digest()[:8], "big") for s in values),
        dtype=np.uint64,
        count=len(values),
    )


def content_md5_series(values: pd.Series) -> pd.Series:
    """Hex md5 per string -- matches DuckDB's ``md5()`` so the document
    fingerprint operator is oracle-checkable in SQL."""
    return values.map(lambda s: hashlib.md5(s.encode("utf-8")).hexdigest())


def triple_key(subj: pd.Series, pred: pd.Series, obj: pd.Series) -> np.ndarray:
    """Stable uint64 key over (subj, pred, obj) for the dedup shuffle."""
    joined = subj.str.cat([pred, obj], sep="\x1f")
    return stable_hash64_series(joined)
