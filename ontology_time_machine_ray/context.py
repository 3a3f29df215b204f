"""Engine-wide Ray Data execution-context tuning.

One measured fact drives this module: Ray Data's per-operator resource
reservation (``op_resource_reservation_enabled``, default on) serializes
multi-operator pipelines when the CPU budget is small.  On the headline
KG build (read -> fused detect+link -> sort dedup -> bucket apply, 8M
docs) the reservation mechanism left the bottleneck operator with a
fraction of the slot budget at every cluster size we measured:

    num_cpus   reservation ON   reservation OFF   speedup
        8          36.98 s          13.56 s         2.7x
       16          14.66 s           8.56 s         1.7x
       32           8.20 s           5.65 s         1.45x

(min-of-3, steady-state, idle host; ratio tuning -- 0.25 instead of the
0.5 default -- changed nothing at 8 cpus, so it is the mechanism's
per-op minimums, not the split, that starves the bottleneck.)  CPU
utilization during the 8-cpu run was ~35% with reservation on and ~87%
with it off.  The engine therefore disables the reservation by default
and relies on the streaming executor's backpressure for memory safety --
the pipelines here are bounded-operator chains (no unbounded fan-in),
all validated under this setting by the test suite, the DuckDB oracle
sweep and the full bench.

Set ``OTM_OP_RESERVATION=1`` to keep Ray's default behavior instead
(e.g. to A/B, or for an embedding application that already tunes its own
DataContext -- in which case import order matters: this module only
writes the field once, at first call, and never overrides a value the
application sets AFTER import).
"""

from __future__ import annotations

import os

_APPLIED = False


def tune_data_context() -> None:
    """Apply the engine's DataContext defaults (idempotent, cheap).

    Called by each entry surface that OWNS the process (driver contract
    ``__ray_entry__``, CLI ``__main__``, ``bench.py``, tools, the test
    fixture) -- deliberately NOT from the package ``__init__``, so merely
    importing the library never changes an embedding application's Ray
    Data executor behavior.  ``DataContext.get_current()`` is
    process-local configuration and may be set before or after
    ``ray.init``; datasets capture it at execution."""
    global _APPLIED
    if _APPLIED:
        return
    _APPLIED = True
    if os.environ.get("OTM_OP_RESERVATION") == "1":
        return
    from ray.data import DataContext

    DataContext.get_current().op_resource_reservation_enabled = False
