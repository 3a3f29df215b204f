"""CLI entry point: run the KG build standalone.

Mirrors the reference's CLI config surface (``config.py:141-337
parse_arguments``, M11): version policy, format + precedence, restricted
access, and the time-machine timestamp -- applied here as the run config
of a batch build instead of proxy flags.

    python -m ontology_time_machine_ray \
        --sf-dir /root/testdata/sf0.001 --out /tmp/otm_store \
        --ontoVersion originalFailoverLiveLatest --ontoFormat turtle \
        --ontoPrecedence default --timestamp 2021-06-01 [--restricted] \
        [--no-per-row-policy] [--repeat N] [--num-cpus N]

Or run any registry operator standalone (the engine-as-a-tool surface)::

    python -m ontology_time_machine_ray query text_stats \
        --sf-dir /root/testdata/sf0.01 [--out /tmp/out.parquet] [--limit N]

Store lifecycle (time travel + retention)::

    python -m ontology_time_machine_ray read --store /tmp/otm_store \
        [--version K] [--out /tmp/out.parquet] [--limit N]
    python -m ontology_time_machine_ray vacuum --store /tmp/otm_store \
        [--keep-versions N]
"""

from __future__ import annotations

import argparse
import json
import sys


def _run_query(argv) -> int:
    ap = argparse.ArgumentParser(prog="ontology_time_machine_ray query")
    ap.add_argument("name", nargs="?", help="registry query name (see --list)")
    ap.add_argument("--list", action="store_true", dest="list_queries")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None, help="write result parquet here instead of printing")
    ap.add_argument("--limit", type=int, default=20, help="rows to print when no --out")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    # listing / name validation never needs (or pays for) a Ray session
    from ontology_time_machine_ray.pipelines.queries import QUERIES

    if args.list_queries or args.name not in QUERIES:
        print(json.dumps({"queries": sorted(QUERIES)}))
        return 0 if args.list_queries else 1

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from ontology_time_machine_ray.context import tune_data_context

    tune_data_context()

    import pandas as pd
    import ray.data as rd

    result = QUERIES[args.name](args.sf_dir)
    if args.out:
        if isinstance(result, rd.Dataset):
            # streaming write: the result never materializes on the driver
            result.write_parquet(args.out)
            n = None
        else:
            pd.DataFrame(result).to_parquet(args.out, index=False)
            n = len(result)
        print(json.dumps({"query": args.name, "out": args.out, "rows": n}))
    else:
        df = result.limit(args.limit).to_pandas() if isinstance(result, rd.Dataset) else (
            pd.DataFrame(result).head(args.limit)
        )
        print(df.to_string(index=False))
    if owns_session:
        ray.shutdown()
    return 0


def _run_read(argv) -> int:
    ap = argparse.ArgumentParser(prog="ontology_time_machine_ray read")
    ap.add_argument("--store", required=True, help="partitioned store directory")
    ap.add_argument("--version", type=int, default=None,
                    help="time-travel to this store version (default: current)")
    ap.add_argument("--out", default=None, help="write result parquet here instead of printing")
    ap.add_argument("--limit", type=int, default=20)
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from ontology_time_machine_ray.context import tune_data_context

    tune_data_context()
    from ontology_time_machine_ray.sources.writers import read_store_asof

    ds = read_store_asof(args.store, version=args.version)
    if args.out:
        ds.write_parquet(args.out)
        print(json.dumps({"store": args.store, "version": args.version, "out": args.out}))
    else:
        print(ds.limit(args.limit).to_pandas().to_string(index=False))
    if owns_session:
        ray.shutdown()
    return 0


def _run_vacuum(argv) -> int:
    ap = argparse.ArgumentParser(prog="ontology_time_machine_ray vacuum")
    ap.add_argument("--store", required=True)
    ap.add_argument("--keep-versions", type=int, default=1)
    args = ap.parse_args(argv)
    from ontology_time_machine_ray.sources.writers import vacuum_store

    removed = vacuum_store(args.store, keep_versions=args.keep_versions)
    print(json.dumps({"store": args.store, "removed": {str(k): v for k, v in removed.items()}}))
    return 0


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] == "query":
        return _run_query(argv[1:])
    if argv and argv[0] == "read":
        return _run_read(argv[1:])
    if argv and argv[0] == "vacuum":
        return _run_vacuum(argv[1:])
    ap = argparse.ArgumentParser(prog="ontology_time_machine_ray")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/otm_store")
    ap.add_argument(
        "--ontoVersion",
        default="originalFailoverLiveLatest",
        choices=["original", "originalFailoverLiveLatest", "latestArchived", "timestampArchived"],
    )
    ap.add_argument(
        "--ontoFormat", default="turtle", choices=["turtle", "ntriples", "rdfxml", "htmldocu"]
    )
    ap.add_argument(
        "--ontoPrecedence", default="default", choices=["default", "enforcedPriority", "always"]
    )
    ap.add_argument("--patchAcceptUpstream", action="store_true")
    ap.add_argument("--restricted", action="store_true")
    ap.add_argument("--timestamp", default="2021-06-01")
    ap.add_argument("--no-per-row-policy", action="store_true")
    ap.add_argument("--no-canonical", action="store_true")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument(
        "--update",
        action="store_true",
        help="incrementally merge this corpus slice into an EXISTING "
        "non-canonical store at --out (continuous ingest; implies "
        "--no-canonical semantics)",
    )
    ap.add_argument(
        "--update-canonical",
        action="store_true",
        help="incrementally merge this corpus slice into an EXISTING "
        "CANONICAL store at --out: repairs the persisted sameAs mapping "
        "with the delta's edges and rewrites moved representatives",
    )
    ap.add_argument(
        "--doc-id-from", default=None,
        help="restrict the corpus to doc_id >= this (delta slice lower bound)",
    )
    ap.add_argument(
        "--doc-id-to", default=None,
        help="restrict the corpus to doc_id < this (delta slice upper bound)",
    )
    ap.add_argument(
        "--stage", action="append", dest="stages", default=None,
        help="compose the documents->triples chain from REGISTRY stage "
        "names instead of the stock fused path (repeatable, in order; "
        "e.g. --stage detect --stage drop_unmatched --stage link, or a "
        "'module.path:attr' user stage -- stages/registry.py)",
    )
    args = ap.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from ontology_time_machine_ray.context import tune_data_context

    tune_data_context()

    from ontology_time_machine_ray.config import (
        HttpsInterception,
        OntoFormat,
        OntoFormatConfig,
        OntoPrecedence,
        OntoVersion,
        PipelineConfig,
    )
    from ontology_time_machine_ray.pipelines.kg import KgPipeline

    config = PipelineConfig(
        onto_format=OntoFormatConfig(
            format=OntoFormat(args.ontoFormat),
            precedence=OntoPrecedence(args.ontoPrecedence),
            patch_accept_upstream=args.patchAcceptUpstream,
        ),
        onto_version=OntoVersion(args.ontoVersion),
        restricted_access=args.restricted,
        https_interception=HttpsInterception.ALL,
        timestamp=args.timestamp,
        per_row_policy=not args.no_per_row_policy,
    )
    pipe = KgPipeline.for_sf_dir(args.sf_dir, repeat=args.repeat)
    doc_range = (
        (args.doc_id_from, args.doc_id_to)
        if (args.doc_id_from is not None or args.doc_id_to is not None)
        else None
    )
    pipe = type(pipe)(
        paths=pipe.paths,
        config=config,
        doc_id_range=doc_range,
        stages=tuple(args.stages) if args.stages else None,
    )

    if args.update_canonical:
        summary = pipe.update_canonical(args.out)
        print(
            json.dumps(
                {
                    "out": args.out,
                    "moved_representatives": summary["moved_representatives"],
                    "partitions": summary.get("updated") or summary.get("partitions"),
                }
            )
        )
    elif args.update:
        summary = pipe.update(args.out)
        print(
            json.dumps(
                {
                    "out": args.out,
                    "updated_partitions": sorted(summary["updated"]),
                    "rows_added": sum(summary["added"].values()),
                    "untouched_partitions": len(summary["untouched"]),
                }
            )
        )
    else:
        summary = pipe.materialize(args.out, canonical=not args.no_canonical)
        report = pipe.report().to_pandas().to_dict(orient="records")
        print(
            json.dumps(
                {
                    "out": args.out,
                    "triples": sum(summary["partitions"].values()),
                    "skipped_partitions": summary["skipped"],
                    "report": report,
                }
            )
        )
    if owns_session:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
