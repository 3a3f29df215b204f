"""Exact triple dedup: the engine's shuffle-based distinct.

The reference has no dedup beyond the index-build set comprehension
(``download_archivo_urls.py:122-126``, O2); the triple store requires a
real one (FIXTURES.md §6: no duplicate ``(subj, pred, obj)`` in output).

Design: batch-local combine first (drop duplicates inside each batch --
cheap, no exchange), THEN one hash-bucketed shuffle with a vectorized
first-row-per-key inside each bucket (``groupagg.grouped_head1`` -- see
that module for why bucketed-vectorized beats per-group accumulation).
The local combine bounds shuffle volume by the number of DISTINCT triples
per batch, which at 100 TB is the difference between shuffling the corpus
and shuffling the vocabulary.  Provenance tie-break: lexicographically
smallest (doc_id, ontology_version, format) wins, so output is independent
of partitioning and execution order (deterministic under resume).
"""

from __future__ import annotations

import pandas as pd

from ontology_time_machine_ray.stages.groupagg import grouped_head1

_TIE = ["doc_id", "ontology_version", "format"]
_KEY = ["subj", "pred", "obj"]


def _local_dedup(df: pd.DataFrame) -> pd.DataFrame:
    if len(df) == 0:
        return df
    return df.sort_values(_KEY + _TIE, kind="stable").drop_duplicates(_KEY, keep="first")


def dedupe_triples(ds, num_buckets: int = 64, bucket_keys=None):
    """Dataset[TRIPLES] -> Dataset[TRIPLES] with unique (s,p,o)."""
    return grouped_head1(
        # batch_size doubles as the fused chain's min bundle size: 65536 gives
        # ~50-200 coarse tasks whose strong combine ratio (fewer duplicate
        # rows into the shuffle) beats finer-grained packing (A/B min-of-3:
        # 11.8s vs 14.9s at 4M docs / 32 cpus)
        ds.map_batches(_local_dedup, batch_format="pandas", batch_size=65536),
        keys=_KEY,
        order_by=_TIE,
        num_buckets=num_buckets,
        bucket_keys=bucket_keys,
    )
