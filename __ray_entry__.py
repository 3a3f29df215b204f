"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# The driver owns this process's Ray session, and importing this module is
# its declared way of entering the engine -- apply the engine's measured
# DataContext tuning here (NOT in the library package __init__, which must
# stay side-effect-free for embedding applications; see context.py).
from ontology_time_machine_ray.context import tune_data_context as _tune

_tune()
del _tune


def entry() -> Any:
    """Flagship pipeline: full KG construction (mention detection ->
    entity linking -> canonicalization -> dedup) over the interleaved
    corpus derived from /root/testdata/sf0.001."""
    from ontology_time_machine_ray.pipelines.kg import KgPipeline

    return KgPipeline.for_sf_dir("/root/testdata/sf0.001").triples_canonical()


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 plus
    the training-data operator family."""
    from ontology_time_machine_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB equivalents for EVERY registry query -- including the
    iterative ones (PageRank in fixed-point, k-means / IVF via unrolled
    Lloyd CTEs) and the md5-replayed sketch/minhash chains.  Calling
    this materializes the fixture parquet the KG statements read."""
    from ontology_time_machine_ray.pipelines.queries import oracle_sql_for

    return oracle_sql_for("/root/testdata/sf0.01")
