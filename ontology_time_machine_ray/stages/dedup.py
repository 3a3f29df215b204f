"""Exact triple dedup: the engine's sort/shuffle-based distinct.

The reference has no dedup beyond the index-build set comprehension
(``download_archivo_urls.py:122-126``, O2); the triple store requires a
real one (FIXTURES.md §6: no duplicate ``(subj, pred, obj)`` in output).

Design: batch-local combine first (drop duplicates inside each batch --
cheap, no exchange), THEN one hash-partitioned ``groupby`` on a stable
64-bit key of (subj, pred, obj) with a per-group deterministic winner.
The local combine bounds shuffle volume by the number of DISTINCT triples
per batch, which at 100 TB is the difference between shuffling the corpus
and shuffling the vocabulary.  Provenance tie-break: lexicographically
smallest (doc_id, ontology_version, format) wins, so output is independent
of partitioning and execution order (deterministic under resume).
"""

from __future__ import annotations

import pandas as pd

from ontology_time_machine_ray.functions.hashing import triple_key

_TIE = ["doc_id", "ontology_version", "format"]
_KEY = ["subj", "pred", "obj"]


def _local_dedup(df: pd.DataFrame) -> pd.DataFrame:
    if len(df) == 0:
        if "tkey" not in df.columns:
            df = df.assign(tkey=pd.Series([], dtype="uint64"))
        return df
    df = df.sort_values(_KEY + _TIE, kind="stable").drop_duplicates(_KEY, keep="first")
    return df.assign(tkey=triple_key(df["subj"], df["pred"], df["obj"]))


def _group_first(g: pd.DataFrame) -> pd.DataFrame:
    # a 64-bit hash group can (rarely) hold several distinct triples
    return g.sort_values(_KEY + _TIE, kind="stable").drop_duplicates(_KEY, keep="first")


def dedupe_triples(ds):
    """Dataset[TRIPLES] -> Dataset[TRIPLES + tkey] with unique (s,p,o)."""
    return (
        ds.map_batches(_local_dedup, batch_format="pandas")
        .groupby("tkey")
        .map_groups(_group_first, batch_format="pandas")
    )
