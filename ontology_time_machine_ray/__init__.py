"""Ray-Data-native knowledge-graph construction engine.

A from-scratch re-expression of the query/decision semantics of
``dbpedia/ontology-time-machine`` (reference at ``/root/reference``) as a
partition-parallel, streaming Ray Data pipeline:

    documents (interleaved text+media spans, Lance/Parquet)
      -> mention detection   (stateless/actor map_batches, dictionary scan)
      -> entity linking      (actor pool holding pinned versioned-ontology
                              snapshots -- the "time machine")
      -> canonicalization    (distributed union-find over owl:sameAs edges)
      -> sort-based dedup    (hash groupby on (subj, pred, obj))
      -> materialize         (partitioned Parquet/Lance + lineage manifests)

The reference is a single-node HTTP proxy; nothing here is a port.  What is
reproduced is its per-request DECISION LOGIC (Archivo index membership with
path truncation, content negotiation, version-policy routing, failover
cascade) restated as deterministic batch transforms over Arrow batches.
"""

__version__ = "0.1.0"

from ontology_time_machine_ray.context import tune_data_context as _tune

_tune()  # see context.py: measured 1.45-2.7x executor packing win
del _tune
