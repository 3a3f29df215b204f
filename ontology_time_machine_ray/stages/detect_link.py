"""Fused detect+link actor stage.

Mention detection and entity linking are consecutive per-batch transforms
with no exchange between them, so the production pipeline runs them FUSED
in a single actor pool: one pool to spin up instead of two, no idle
reserved CPUs when the stages' loads differ, and the mentions table never
leaves the actor.  The standalone ``MentionDetector`` / ``EntityLinker``
stages remain the unit-testable building blocks (and serve the
``kg_mentions`` query); this class just composes them.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa

from ontology_time_machine_ray.config import PipelineConfig
from ontology_time_machine_ray.stages.detect import MentionDetector
from ontology_time_machine_ray.stages.link import EntityLinker


class DetectLink:
    def __init__(
        self,
        index_path: str,
        origins_path: str,
        content_path: str,
        status_path: str,
        config: Optional[PipelineConfig] = None,
        emit: str = "triples",
    ):
        self.detector = MentionDetector(index_path=index_path)
        self.linker = EntityLinker(origins_path, content_path, status_path, config, emit)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.linker(self.detector(batch))


#: per-worker-process cache: state is built once per worker on first
#: batch, then reused across batches AND executions (warm task workers
#: survive between Dataset executions; fresh actor-pool processes do not).
_STAGE_CACHE: dict[tuple, DetectLink] = {}


def make_detect_link(
    index_path: str,
    origins_path: str,
    content_path: str,
    status_path: str,
    config: Optional[PipelineConfig] = None,
    emit: str = "triples",
):
    """Task-based fused stage with worker-local state.

    The detector/linker state here is SMALL and immutable (an index dict +
    snapshot tables, ~ms to build), so stateless tasks + a per-worker
    cache beat an actor pool: no pool spin-up on the critical path, warm
    workers are reused across executions, and the pool never reserves
    CPUs it is not using.  Use the ``DetectLink`` callable class with
    ``concurrency=N`` instead when the state is heavy enough (models,
    large snapshot shards) that per-worker duplication must be bounded --
    that is what actor pools are for.
    """
    cfg_key = None if config is None else (
        config.onto_format.format.value,
        config.onto_format.precedence.value,
        config.onto_format.patch_accept_upstream,
        config.onto_version.value,
        config.restricted_access,
        config.per_row_policy,
        config.timestamp,
    )
    key = (index_path, origins_path, content_path, status_path, cfg_key, emit)

    def stage(batch: pa.Table) -> pa.Table:
        inst = _STAGE_CACHE.get(key)
        if inst is None:
            inst = DetectLink(index_path, origins_path, content_path, status_path, config, emit)
            # bounded, not single-entry: two fused stages routinely run
            # interleaved on the same warm worker (triples + status
            # streams, or two time-machine coordinates); evicting the
            # other stage's state would rebuild it every alternating
            # batch.  Evict oldest-inserted beyond a small cap instead.
            while len(_STAGE_CACHE) >= 4:
                _STAGE_CACHE.pop(next(iter(_STAGE_CACHE)))
            _STAGE_CACHE[key] = inst
        return inst(batch)

    return stage
