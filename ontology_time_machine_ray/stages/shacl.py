"""SHACL-lite shape validation over the (subj, pred, obj) store.

Data-quality gate for the constructed KG: declarative shapes select a
set of focus nodes (a class's instances, or the subjects of a property)
and assert per-focus constraints; every violation becomes a row of a
validation report -- errors are DATA, never exceptions, the same
failure-routing discipline the reference applies to fetch errors
(`experiments/download_ontologies.py:28-49` turns exception chains into
log records instead of aborting the run).

Shape spec (plain dicts -- the callable-registry idiom of this repo):

``{"shape": str, "target": TargetSpec, "constraints": [Constraint]}``

* TargetSpec ``("class", C)``       -- focus nodes: subjects typed C
* TargetSpec ``("subjects_of", p)`` -- focus nodes: subjects of any p-edge
* Constraint ``("minCount", p, n)`` -- focus must have >= n p-values
* Constraint ``("maxCount", p, n)`` -- focus must have <= n p-values
* Constraint ``("pattern", p, rx)`` -- every p-value must match rx
                                       (partial match, SHACL sh:pattern)
* Constraint ``("class", p, C)``    -- every p-value must be typed C
                                       (sh:class)

Report schema: ``(focus, shape, constraint, value)`` -- ``value`` is the
offending property value (pattern/class) or the observed cardinality as
a string (min/maxCount), so one report table carries every constraint
kind.

Execution shape (Ray-Data-first, nothing broadcast -- at 10^12 docs a
class's instance set is corpus-scale):

* Target sets and property-value relations are pushdown SCANS off the
  pinned store (vectorized constant filters inside ``map_batches``).
* Cardinality constraints: per-focus counts via ONE bucketed exchange
  (`grouped_aggregate`; the store's (s,p,o) distinctness makes the size
  exact), then a bucketed left/inner join onto the target set -- a
  focus with NO values appears via the left join's null fill, which is
  exactly the minCount=0 violation case.
* Value constraints: the value relation semi-joins the target set
  (membership only, right side never shipped into the output), then
  ``pattern`` is an in-batch vectorized regex and ``class`` one bucketed
  ANTI join against the typed-node scan.
* Each constraint contributes distinct rows (store distinctness +
  per-focus uniqueness of counts) and distinct shapes/constraints never
  collide, so the unioned report needs NO terminal dedup shuffle.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd

from ontology_time_machine_ray.schema import RDF_TYPE
from ontology_time_machine_ray.stages.groupagg import (
    bucketed_join,
    grouped_aggregate,
    grouped_apply,
)

_REPORT_SCHEMA = {"focus": "object", "shape": "object",
                  "constraint": "object", "value": "object"}


def _scan_values(triples, pred: str):
    """(focus, value) pairs of one property -- a pushdown scan."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[df["pred"] == pred]
        return pd.DataFrame({"focus": sub["subj"], "value": sub["obj"]})

    return triples.map_batches(fn, batch_format="pandas")


def _scan_typed(triples, cls: str, col: str):
    """Distinct nodes typed ``cls`` (distinct because the store is)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[(df["pred"] == RDF_TYPE) & (df["obj"] == cls)]
        return pd.DataFrame({col: sub["subj"]})

    return triples.map_batches(fn, batch_format="pandas")


def _targets(triples, spec: Sequence[str]):
    """Distinct focus-node set of one TargetSpec."""
    kind, arg = spec
    if kind == "class":
        return _scan_typed(triples, arg, "focus")
    if kind == "subjects_of":
        subj = _scan_values(triples, arg).map_batches(
            lambda df: df[["focus"]], batch_format="pandas"
        )
        # a subject with several values repeats in the scan: one bucketed
        # distinct makes it a set
        return grouped_apply(subj, ["focus"], lambda g: g.drop_duplicates())
    raise ValueError(f"unknown target spec {spec!r}")


def _report(df: pd.DataFrame, shape: str, constraint: str) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "focus": df["focus"],
            "shape": shape,
            "constraint": constraint,
            "value": df["value"].astype(str),
        }
    )


def validate(triples, shapes: Sequence[dict]):
    """Validate ``shapes`` against the store; returns the Dataset of
    violations ``(focus, shape, constraint, value)`` (empty = conforms,
    SHACL's ``sh:conforms true``)."""
    if not shapes:
        raise ValueError("no shapes given")
    for spec in shapes:
        if not spec.get("constraints"):
            raise ValueError(
                f"shape {spec.get('name', spec)!r} has no 'constraints' -- "
                "every shape needs a non-empty constraints list"
            )
    reports = []
    # per-focus counts are per-PREDICATE relations, independent of shape
    # and of min-vs-max: compute each once and materialize, so a shape
    # asserting both bounds on one predicate pays ONE scan + exchange
    # instead of two (Datasets are lazy -- an unmaterialized relation
    # consumed by two joins would re-execute its upstream per consumer)
    counts_cache: dict[str, object] = {}

    def _counts(pred: str):
        if pred not in counts_cache:
            counts_cache[pred] = grouped_aggregate(
                _scan_values(triples, pred), ["focus"], {"cnt": ("value", "size")}
            ).materialize()
        return counts_cache[pred]

    for spec in shapes:
        shape = spec["shape"]
        targets = _targets(triples, spec["target"])
        if len(spec["constraints"]) > 1:
            # same laziness argument: N constraints would re-derive the
            # focus set N times
            targets = targets.materialize()
        for kind, pred, arg in spec["constraints"]:
            label = f"{kind}({pred},{arg})"
            if kind in ("minCount", "maxCount"):
                counts = _counts(pred)
                joined = bucketed_join(
                    targets,
                    counts,
                    on=["focus"],
                    how="left" if kind == "minCount" else "inner",
                    left_schema={"focus": "object"},
                    right_schema={"focus": "object", "cnt": "int64"},
                )
                n = int(arg)

                def card(df: pd.DataFrame, kind=kind, n=n, shape=shape,
                         label=label) -> pd.DataFrame:
                    cnt = df["cnt"].fillna(0).astype("int64")
                    bad = cnt < n if kind == "minCount" else cnt > n
                    sub = df[bad.to_numpy()]
                    return _report(sub.assign(value=cnt[bad].astype(str)),
                                   shape, label)

                reports.append(joined.map_batches(card, batch_format="pandas"))
                continue
            values = bucketed_join(
                _scan_values(triples, pred),
                targets,
                on=["focus"],
                how="semi",
                left_schema={"focus": "object", "value": "object"},
                right_schema={"focus": "object"},
            )
            if kind == "pattern":
                rx = arg

                def pat(df: pd.DataFrame, rx=rx, shape=shape,
                        label=label) -> pd.DataFrame:
                    bad = ~df["value"].str.contains(rx, regex=True, na=False)
                    return _report(df[bad.to_numpy()], shape, label)

                reports.append(values.map_batches(pat, batch_format="pandas"))
            elif kind == "class":
                untyped = bucketed_join(
                    values,
                    _scan_typed(triples, arg, "value"),
                    on=["value"],
                    how="anti",
                    left_schema={"focus": "object", "value": "object"},
                    right_schema={"value": "object"},
                )
                reports.append(
                    untyped.map_batches(
                        lambda df, shape=shape, label=label: _report(df, shape, label),
                        batch_format="pandas",
                    )
                )
            else:
                raise ValueError(f"unknown constraint kind {kind!r}")
    out = reports[0]
    for r in reports[1:]:
        out = out.union(r)
    return out.map_batches(
        lambda df: df.reindex(columns=list(_REPORT_SCHEMA)), batch_format="pandas"
    )
