"""Named stage registry -- the engine's user-extension surface (SURVEY §2.9).

The reference is ITSELF a plugin: ``custom_proxy.py:48`` subclasses
proxy.py's ``HttpProxyBasePlugin`` (hook API ``before_upstream_connection``
/ ``do_intercept`` / ``handle_client_request`` / ``handle_upstream_chunk``,
registered at ``custom_proxy.py:249``), and its request abstraction is an
ABC (``proxy_wrapper.py:8-62``) so alternative transports plug in without
touching the decision logic.

The engine analog: a pipeline stage is a named callable

    ``(pa.Table, StageCtx) -> pa.Table``

registered here by name.  ``KgPipeline(stages=("detect", "my_filter",
"link"))`` composes the detect->link chain BY NAME, so a custom detector,
linker, or mention transform drops in from config (the CLI's repeatable
``--stage`` flag) without editing the package.  Unregistered names resolve
as ``"module.path:attr"`` imports, so user stages ship in user modules.

Execution model: the composed chain is ONE ``map_batches`` stage (an actor
pool when used from ``KgPipeline``), so inserting a stage never adds an
exchange.  Per-worker state (index dicts, snapshot stores, models) lives
in ``ctx.state`` -- populated lazily on first batch inside each worker,
exactly the once-per-actor pattern the builtin detect/link stages use.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence

import pyarrow as pa

from ontology_time_machine_ray.config import PipelineConfig
from ontology_time_machine_ray.fixtures import FixturePaths


@dataclass
class StageCtx:
    """Everything a stage may need: fixture paths, the run config, which
    stream the chain emits, free-form params, and a per-worker state dict
    (never shipped with the task -- it repopulates lazily per worker)."""

    paths: FixturePaths
    config: PipelineConfig
    emit: str = "triples"
    params: dict = field(default_factory=dict)
    state: dict = field(default_factory=dict)

    def __getstate__(self):
        d = self.__dict__.copy()
        d["state"] = {}  # worker state is rebuilt, never serialized
        return d


StageFn = Callable[[pa.Table, StageCtx], pa.Table]

_STAGES: dict[str, StageFn] = {}


def register_stage(name: str, fn: Optional[StageFn] = None):
    """Register ``fn`` under ``name``; usable as a decorator::

        @register_stage("my_filter")
        def my_filter(batch: pa.Table, ctx: StageCtx) -> pa.Table: ...
    """

    def _put(f: StageFn) -> StageFn:
        if not callable(f):
            raise TypeError(f"stage {name!r} must be callable, got {type(f)}")
        _STAGES[name] = f
        return f

    return _put if fn is None else _put(fn)


def unregister_stage(name: str) -> None:
    _STAGES.pop(name, None)


def list_stages() -> list[str]:
    return sorted(_STAGES)


def get_stage(name: str) -> StageFn:
    """Resolve a stage by registry name, or by ``"module.path:attr"``
    import for stages living in user modules."""
    fn = _STAGES.get(name)
    if fn is not None:
        return fn
    if ":" in name:
        import importlib

        mod_name, attr = name.split(":", 1)
        fn = getattr(importlib.import_module(mod_name), attr)
        if not callable(fn):
            raise TypeError(f"{name!r} resolved to non-callable {type(fn)}")
        return fn
    raise KeyError(
        f"unknown stage {name!r}; registered: {list_stages()} "
        "(or pass 'module.path:attr')"
    )


def resolve_stages(names: Sequence[str]) -> list[StageFn]:
    """Resolve names -> functions ON THE DRIVER, so a stage registered
    only in the driver process ships to workers by value inside the
    actor constructor args (a worker-side resolve would only see the
    builtins its module import registered)."""
    return [get_stage(n) for n in names]


class ComposedStages:
    """``map_batches``-able composition of named stages.

    Used as a callable class with ``concurrency=N`` the composition is
    an actor pool and ``ctx.state`` persists per actor; used as a bare
    function it persists per warm task worker.  Pass ``fns`` (from
    ``resolve_stages``) when constructing remotely -- e.g. via
    ``fn_constructor_kwargs`` -- so driver-registered stages resolve.
    """

    def __init__(
        self,
        names: Sequence[str],
        ctx: StageCtx,
        fns: Optional[Sequence[StageFn]] = None,
    ):
        self.ctx = ctx
        if fns is None:
            fns = resolve_stages(names)
        if len(fns) != len(names):
            raise ValueError(f"{len(names)} names but {len(fns)} fns")
        self.fns: list[tuple[str, StageFn]] = list(zip(names, fns))

    def __call__(self, batch: pa.Table) -> pa.Table:
        for name, fn in self.fns:
            batch = fn(batch, self.ctx)
            if not isinstance(batch, pa.Table):
                raise TypeError(f"stage {name!r} returned {type(batch)}, not pa.Table")
        return batch


# --------------------------------------------------------------------- #
# builtin stages: the default detect->link chain, registry-addressable   #
# --------------------------------------------------------------------- #
@register_stage("detect")
def detect_stage(batch: pa.Table, ctx: StageCtx) -> pa.Table:
    """The stock mention detector (stages/detect.py) as a registry stage."""
    det = ctx.state.get("detector")
    if det is None:
        from ontology_time_machine_ray.stages.detect import MentionDetector

        det = ctx.state["detector"] = MentionDetector(
            index_path=ctx.paths.ontology_index
        )
    return det(batch)


@register_stage("link")
def link_stage(batch: pa.Table, ctx: StageCtx) -> pa.Table:
    """The stock entity linker (stages/link.py) as a registry stage;
    honors ``ctx.emit`` ("triples" | "status")."""
    lk = ctx.state.get("linker")
    if lk is None:
        from ontology_time_machine_ray.stages.link import EntityLinker

        lk = ctx.state["linker"] = EntityLinker(
            ctx.paths.origins,
            ctx.paths.snapshot_content,
            ctx.paths.snapshot_status,
            config=ctx.config,
            emit=ctx.emit,
        )
    return lk(batch)


@register_stage("add_method")
def add_method_stage(batch: pa.Table, ctx: StageCtx) -> pa.Table:
    """Pre-detect stage annotating documents with the deterministic
    GET/HEAD request verb (fixtures.add_method_column)."""
    from ontology_time_machine_ray.fixtures import add_method_column

    return add_method_column(batch)


@register_stage("drop_unmatched")
def drop_unmatched_stage(batch: pa.Table, ctx: StageCtx) -> pa.Table:
    """Post-detect filter keeping only index-matched mentions.  Dropping
    unmatched rows never changes the triples stream (they are never
    served) but thins the status stream to Archivo traffic only."""
    import pyarrow.compute as pc

    return batch.filter(pc.is_valid(batch.column("ontology_id")))
