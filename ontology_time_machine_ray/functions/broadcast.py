"""Per-worker-process cache for broadcast objects in task-based stages.

A stateless ``map_batches`` task that needs immutable shared state (an
index, a component mapping, a query matrix) should ``ray.put`` it once on
the driver and fetch it via ``cached_get`` inside the batch function: the
object-store fetch + deserialization then happens once per WORKER PROCESS
rather than once per batch -- the task-based analog of actor ``__init__``
state, without the actor pool's spin-up cost on the critical path.
"""

from __future__ import annotations

import ray

_CACHE: dict[str, object] = {}

#: small bound, not single-entry: Ray reuses worker processes across
#: CONCURRENT map operators, so two broadcast-using stages routinely
#: interleave batches on one worker -- a hold-one cache would re-fetch
#: and re-deserialize each broadcast once per batch instead of once per
#: worker.  Oldest-inserted is evicted beyond the cap.
_CACHE_MAX = 4


def cached_get(ref):
    key = ref.hex()
    if key not in _CACHE:
        while len(_CACHE) >= _CACHE_MAX:
            _CACHE.pop(next(iter(_CACHE)))
        _CACHE[key] = ray.get(ref)
    return _CACHE[key]
