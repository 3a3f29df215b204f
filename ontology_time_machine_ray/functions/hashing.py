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


#: per-process DuckDB connection for vectorized md5.  Each Ray worker is
#: its own process, so a module global is per-worker state (same pattern
#: as an actor-pool ``__init__``); single-threaded so a map_batches task
#: never oversubscribes its 1-CPU slot.
_MD5_CON = None


def _md5_con():
    global _MD5_CON
    if _MD5_CON is None:
        import duckdb

        _MD5_CON = duckdb.connect()
        _MD5_CON.execute("SET threads TO 1")
        _MD5_CON.execute("SET memory_limit = '512MB'")
    return _MD5_CON


def _md5_project(values, expr: str):
    """Run ``SELECT {expr} AS h`` over a string column ``s`` in DuckDB.

    md5 has no vectorized kernel in numpy/pyarrow; per-row ``hashlib``
    was the single hottest loop in the text operators (winnowing /
    dup-ngrams / MinHash).  DuckDB's md5 is C++ and bit-identical to the
    SQL oracles BY CONSTRUCTION (it *is* the oracle engine), ~2.5x the
    throughput of the Python loop at one thread and GIL-free.
    """
    import pyarrow as pa

    tbl = pa.table({"s": pa.array(values, type=pa.string(), from_pandas=True)})
    con = _md5_con()
    con.register("__otm_md5_in", tbl)
    try:
        return con.execute(f"SELECT {expr} AS h FROM __otm_md5_in").fetch_arrow_table()
    finally:
        con.unregister("__otm_md5_in")


def md5_hash64_series(values: pd.Series) -> np.ndarray:
    """uint64 from the first 8 md5 bytes (== first 16 hex chars, big-endian).

    Matches DuckDB's ``CAST(concat('0x', substr(md5(x), 1, 16)) AS
    UBIGINT)`` exactly (it is computed BY duckdb), so any operator keyed
    on this hash (MinHash signatures, SimHash bit votes) is restatable as
    a full SQL oracle.
    """
    out = _md5_project(
        values, "CAST(concat('0x', substr(md5(s), 1, 16)) AS UBIGINT)"
    )
    return out.column("h").to_numpy(zero_copy_only=False).astype(np.uint64)


def md5_prefix_int_series(values: pd.Series, nchars: int) -> np.ndarray:
    """int64 integer value of the first ``nchars`` (<= 15) md5 hex chars.

    One C++ pass replacing the old two-pass
    ``content_md5_series(x).map(lambda h: int(h[:n], 16))`` pattern in
    winnowing, dup-ngrams, stratified sampling and the shuffle index.
    """
    if not 1 <= nchars <= 15:
        raise ValueError("nchars must be in [1, 15] to fit int64")
    out = _md5_project(
        values, f"CAST(concat('0x', substr(md5(s), 1, {nchars})) AS BIGINT)"
    )
    return out.column("h").to_numpy(zero_copy_only=False).astype(np.int64)


def md5_hex_and_prefix(values: pd.Series, nchars: int):
    """(hex md5 Series, int64 prefix array) in ONE md5 pass (DuckDB CSE
    computes the digest once for both projections) -- the shuffle-index
    stage needs the full hex for rank order AND an integer bucket."""
    if not 1 <= nchars <= 15:
        raise ValueError("nchars must be in [1, 15] to fit int64")
    out = _md5_project(
        values,
        f"md5(s) AS hx, CAST(concat('0x', substr(md5(s), 1, {nchars})) AS BIGINT)",
    )
    hexes = pd.Series(
        out.column("hx").to_pandas().to_numpy(),
        index=values.index if isinstance(values, pd.Series) else None,
        dtype="object",
    )
    return hexes, out.column("h").to_numpy(zero_copy_only=False).astype(np.int64)


def content_md5_series(values: pd.Series) -> pd.Series:
    """Hex md5 per string -- matches DuckDB's ``md5()`` so the document
    fingerprint operator is oracle-checkable in SQL."""
    out = _md5_project(values, "md5(s)")
    return pd.Series(
        out.column("h").to_pandas().to_numpy(),
        index=values.index if isinstance(values, pd.Series) else None,
        dtype="object",
    )


def triple_key(subj: pd.Series, pred: pd.Series, obj: pd.Series) -> np.ndarray:
    """Stable uint64 key over (subj, pred, obj) for the dedup shuffle."""
    joined = subj.str.cat([pred, obj], sep="\x1f")
    return stable_hash64_series(joined)
