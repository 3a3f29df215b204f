"""Source readers: index build/load, URL lists, TSV conformance corpora.

Restates the reference's source operators on Ray Data:

* S1 -- index build: IRI text file -> parsed (host, path) parquet with a
  sha256 content-hash skip (``download_archivo_urls.py:50-100``: download
  CSV, hash-compare :41-46,65-74, project column 0 -> txt).
* S2 -- index load: text -> ``{(host, path)}`` with exact dedup
  (``download_archivo_urls.py:103-132``, O2).
* S5 -- URL list reader: strip + drop blanks
  (``experiments/download_ontologies.py:20-26``).
* S7 -- TSV conformance corpus reader (``tests/archivo_test_IRIs.tsv``;
  loader ``test_proxy_auth_header_archivo.py:28-31``).
* S8 -- TSV results writer (``aggregate_results.py:154-165``).
"""

from __future__ import annotations

import hashlib
import os
from urllib.parse import urlparse

import pyarrow as pa
import pyarrow.csv as pa_csv
import pyarrow.parquet as pq
import ray.data as rd

from ontology_time_machine_ray.schema import ONTOLOGY_INDEX_SCHEMA


def sized_read_parquet(path: str, columns=None, inflate: int = 6) -> rd.Dataset:
    """Pruned parquet read with a SIZE-derived block count.

    Ray's read heuristic splits by available parallelism, not data size:
    a 2 MB dimension table becomes 64 ~230-row blocks, and every
    downstream exchange pays per-block sort/sample/schedule costs that
    dwarf the data (measured 2.5 s of pure block overhead on a 78k x 3k
    semi join; fixing the read took TPC-H Q3/Q5/Q18 from 12.6/18.1/9.2 s
    to 1.6/2.1/1.9 s at sf0.1).  Blocks here target ~32 MiB in-memory
    (disk bytes x ``inflate``, the 6.4x snappy+string inflation measured
    on the bench corpus -- the kg.py read-sizing rationale): tiny tables
    collapse to ONE block, while anything big enough to parallelize is
    floored at the CPU count so vectorized map stages keep the machine
    busy.  The same formula yields thousands of blocks at 100 TB, so it
    is scale-correct, not a small-data tune.  The 8192 cap bounds READ
    TASKS, not block size: past ~256 GB per read, Ray's dynamic block
    splitting still slices each task's output at the context's
    target_max_block_size, so worker heaps stay bounded.
    """
    import glob as _glob

    import ray

    try:
        if isinstance(path, (list, tuple)):
            files = list(path)
        elif os.path.isfile(path):
            files = [path]
        else:
            files = _glob.glob(os.path.join(path, "*.parquet"))
        disk = sum(os.path.getsize(f) for f in files)
    except OSError:
        disk = 0
    est = (disk * inflate) // (32 << 20)
    if est <= 1:
        nb = 1
    else:
        try:
            cpus = int(ray.cluster_resources().get("CPU", 32))
        except Exception:
            cpus = 32
        nb = int(min(max(est, cpus), 8192))
    return rd.read_parquet(path, columns=columns, override_num_blocks=nb)


def read_iri_lines(path: str) -> rd.Dataset:
    """S5: text file of IRIs -> Dataset[{'text': iri}], blanks dropped."""
    return rd.read_text(path).map_batches(
        lambda df: df[df["text"].str.strip() != ""].assign(text=lambda x: x["text"].str.strip()),
        batch_format="pandas",
    )


def file_sha256(path: str) -> str:
    """O3: content hash = version identity (download_archivo_urls.py:41-46)."""
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def build_index_parquet(iri_txt_path: str, out_parquet: str) -> str:
    """S1+S2: IRI list -> ontology_index parquet, skipped when the input
    hash is unchanged (idempotent refresh; the reference's daily-download
    hash-skip, download_archivo_urls.py:65-74).

    Returns the content hash of the input."""
    digest = file_sha256(iri_txt_path)
    marker = out_parquet + ".sha256"
    if os.path.exists(marker) and os.path.exists(out_parquet):
        if open(marker).read().strip() == digest:
            return digest

    def parse(df):
        df = df[df["text"].str.strip() != ""]
        iris = df["text"].str.strip()
        parsed = [urlparse(i) for i in iris]
        import pandas as pd

        return pd.DataFrame(
            {
                "iri": list(iris),
                "host": [p.netloc for p in parsed],
                "path": [p.path for p in parsed],
            }
        )

    ds = rd.read_text(iri_txt_path).map_batches(parse, batch_format="pandas")
    # exact dedup on (host, path) -- the reference's set comprehension (O2)
    pdf = ds.to_pandas().drop_duplicates(["host", "path"]).reset_index(drop=True)
    # stable ids: position in the sorted order (deterministic)
    pdf = pdf.sort_values("iri").reset_index(drop=True)
    pdf["ontology_id"] = [f"O{i:03d}" for i in range(len(pdf))]
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=ONTOLOGY_INDEX_SCHEMA, preserve_index=False),
        out_parquet,
    )
    with open(marker, "w") as f:
        f.write(digest)
    return digest


def _split_ttl_statements(body: str) -> list[str]:
    """Split a Turtle body into statements at ``.`` terminators.

    A character scan rather than a regex: a ``.`` terminates a statement
    only when it is OUTSIDE an ``<IRI>`` and outside a ``"string"`` and is
    followed by whitespace or end-of-input.  This accepts valid Turtle like
    ``<s> a owl:Class.`` (no space before the dot) that the previous
    ``\\s\\.\\s`` split silently mis-parsed, while never splitting on dots
    inside IRIs (``<http://ex.org/C>``) or literals."""
    stmts: list[str] = []
    buf: list[str] = []
    in_iri = in_str = False
    n = len(body)
    for i, ch in enumerate(body):
        if in_str:
            buf.append(ch)
            if ch == '"' and (i == 0 or body[i - 1] != "\\"):
                in_str = False
            continue
        if in_iri:
            buf.append(ch)
            if ch == ">":
                in_iri = False
            continue
        if ch == "<":
            in_iri = True
            buf.append(ch)
        elif ch == '"':
            in_str = True
            buf.append(ch)
        elif ch == "." and (i + 1 >= n or body[i + 1].isspace()):
            stmts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    tail = "".join(buf).strip()
    if tail:
        stmts.append(tail)
    return stmts


def read_dependency_ttl(ttl_path: str, index_path: str) -> pa.Table:
    """RDF-format ingestion of the dependency manifest (the reference's
    dormant graph is Turtle: ``tests/dependency.ttl``, walked by the
    commented-out resolver at proxy_logic.py:276-307).

    Parses the Turtle subset the manifest uses -- ``@prefix`` headers and
    ``<subj> pred <o1>, <o2> ; pred2 <o3> .`` statements -- keeping
    ``ex-version:dependency`` / ``owl:imports`` edges, then maps the IRIs
    to ontology ids through the index table.  Returns an edge table with
    the same schema as ``dependencies.parquet``."""
    import re

    text = open(ttl_path).read()
    # drop prefix headers; statements end at '.' on a line end
    body = "\n".join(
        ln for ln in text.splitlines() if not ln.strip().startswith("@prefix")
    )
    iri_re = re.compile(r"<([^>]*)>")
    src, dst = [], []
    for stmt in _split_ttl_statements(body):
        stmt = stmt.strip()
        if not stmt:
            continue
        m = iri_re.match(stmt)
        if m is None:
            continue
        subject = m.group(1)
        rest = stmt[m.end():]
        for po in rest.split(";"):
            po = po.strip()
            if po.startswith(("ex-version:dependency", "owl:imports")):
                for obj in iri_re.findall(po):
                    src.append(subject)
                    dst.append(obj)
    idx = pq.read_table(index_path)
    iri_to_id = dict(zip(idx["iri"].to_pylist(), idx["ontology_id"].to_pylist()))
    pairs = [
        (iri_to_id[s], iri_to_id[d])
        for s, d in zip(src, dst)
        if s in iri_to_id and d in iri_to_id
    ]
    return pa.table(
        {
            "ontology_id": [p[0] for p in pairs],
            "depends_on": [p[1] for p in pairs],
        },
        schema=pa.schema([("ontology_id", pa.string()), ("depends_on", pa.string())]),
    )


#: Turtle tokens: an IRI in <>, a prefixed name, or the bare `a` keyword.
_TTL_TOKEN_RE = None  # compiled lazily per process (map_batches workers)
_TTL_PREFIX_RE = None


def _ttl_regexes():
    global _TTL_TOKEN_RE, _TTL_PREFIX_RE
    if _TTL_TOKEN_RE is None:
        import re

        _TTL_TOKEN_RE = re.compile(r"<[^>]*>|[A-Za-z][\w-]*:[^\s,;]+|\ba\b")
        _TTL_PREFIX_RE = re.compile(r"@prefix\s+([A-Za-z][\w-]*)?:\s*<([^>]*)>\s*\.")
    return _TTL_TOKEN_RE, _TTL_PREFIX_RE


def parse_snapshot_ttl(text: str):
    """Parse ONE serialized ontology snapshot (Turtle subset) into its
    content lists ``(classes, properties, same_as_a, same_as_b, equiv_a,
    equiv_b)``.

    Grammar subset (everything the snapshot fixtures and the reference's
    manifests use): ``@prefix`` declarations, ``<IRI>`` terms, prefixed
    names, the ``a`` keyword, ``;`` predicate lists, ``,`` object lists,
    ``.`` statement terminators.  Unknown predicates are skipped (they are
    provenance, not snapshot content).  The engine analog of the
    reference's rapper-based parse stage
    (experiments/parse_ontologies.py:49-76), minus the subprocess."""
    from ontology_time_machine_ray.schema import (
        OWL_CLASS,
        OWL_EQUIVALENT_CLASS,
        OWL_OBJECT_PROPERTY,
        OWL_SAME_AS,
        RDF_TYPE,
    )

    tok_re, prefix_re = _ttl_regexes()
    prefixes = {m.group(1) or "": m.group(2) for m in prefix_re.finditer(text)}

    def expand(tok: str) -> str:
        if tok == "a":
            return RDF_TYPE
        if tok.startswith("<") and tok.endswith(">"):
            return tok[1:-1]
        if ":" in tok:
            p, local = tok.split(":", 1)
            if p in prefixes:
                return prefixes[p] + local
        return tok

    body = "\n".join(
        ln for ln in text.splitlines() if not ln.strip().startswith("@prefix")
    )
    classes: list[str] = []
    props: list[str] = []
    sa: list[str] = []
    sb: list[str] = []
    ea: list[str] = []
    eb: list[str] = []
    for stmt in _split_ttl_statements(body):
        stmt = stmt.strip()
        if not stmt:
            continue
        first = tok_re.search(stmt)
        if first is None:
            continue
        subject = expand(first.group(0))
        for po in stmt[first.end():].split(";"):
            toks = tok_re.findall(po)
            if len(toks) < 2:
                continue
            pred = expand(toks[0])
            objs = [expand(t) for t in toks[1:]]
            if pred == RDF_TYPE:
                for o in objs:
                    if o == OWL_CLASS:
                        classes.append(subject)
                    elif o == OWL_OBJECT_PROPERTY:
                        props.append(subject)
            elif pred == OWL_SAME_AS:
                for o in objs:
                    sa.append(subject)
                    sb.append(o)
            elif pred == OWL_EQUIVALENT_CLASS:
                for o in objs:
                    ea.append(subject)
                    eb.append(o)
    return classes, props, sa, sb, ea, eb


def parse_snapshot_rdf_batch(df) -> "pd.DataFrame":
    """Distributed RDF snapshot ingestion stage: ``map_batches`` over a
    (ontology_id, version, ttl) table of serialized Turtle snapshots,
    emitting the snapshot-content rows the entity linker pins per actor.

    Each row is one ontology snapshot FILE at scale (ontology_id/version
    are the file-address metadata); the stage is embarrassingly parallel
    -- vocabulary-scale input, never corpus-scale -- and the compiled
    grammar regexes are per-process state."""
    import pandas as pd

    parsed = [parse_snapshot_ttl(t or "") for t in df["ttl"]]
    return pd.DataFrame(
        {
            "ontology_id": df["ontology_id"].to_numpy(),
            "version": df["version"].to_numpy(),
            "classes": [p[0] for p in parsed],
            "properties": [p[1] for p in parsed],
            "same_as_a": [p[2] for p in parsed],
            "same_as_b": [p[3] for p in parsed],
            "equiv_a": [p[4] for p in parsed],
            "equiv_b": [p[5] for p in parsed],
        }
    )


def read_conformance_tsv(path: str) -> pa.Table:
    """S7: tab-separated conformance corpus with the reference's columns
    (enable_testcase, iri, error_dimension, expected_error, iri_type,
    comment -- tests/archivo_test_IRIs.tsv:1)."""
    return pa_csv.read_csv(
        path,
        parse_options=pa_csv.ParseOptions(delimiter="\t"),
        convert_options=pa_csv.ConvertOptions(
            column_types={"enable_testcase": pa.int32(), "expected_error": pa.string()}
        ),
    )


def write_report_tsv(df, path: str) -> None:
    """S8: small aggregate -> TSV (aggregate_results.py:154-165)."""
    df.to_csv(path, sep="\t", index=False)


#: compiled N-Triples line grammar, cached per process (each Ray worker
#: compiles it once, the per-actor-state pattern).
_NT_LINE = None


def _nt_pattern():
    global _NT_LINE
    if _NT_LINE is None:
        import re

        # Full N-Triples line grammar: subject is an IRI or blank node,
        # object is an IRI, blank node, or literal (with optional ^^<dt>
        # datatype / @lang tag); whitespace between terms is flexible and
        # a trailing \r (CRLF shards) is tolerated.
        _NT_LINE = re.compile(
            r"^\s*(<[^>]*>|_:\S+)"
            r"\s+<([^>]*)>"
            r'\s+(<[^>]*>|_:\S+|"(?:[^"\\]|\\.)*"(?:\^\^<[^>]*>|@[\w-]+)?)'
            r"\s*\.\s*$"
        )
    return _NT_LINE


def read_ntriples(nt_dir: str):
    """Distributed N-Triples ingestion: one Dataset row per triple from a
    directory of ``.nt`` shards.  Shards parallelize at file grain
    (``read_text`` assigns whole files to read tasks); each batch of
    lines parses with ONE compiled-regex extract -- no Python loop over
    lines.

    Accepts the full N-Triples line grammar (comment lines, blank nodes,
    literal objects with datatype/lang tags, CRLF endings).  IRI terms are
    returned stripped of their angle brackets; blank nodes keep their
    ``_:`` label and literal objects keep their lexical N-Triples form
    (quotes + any ``^^``/``@`` suffix) so no information is lost.
    Genuinely unparseable non-comment lines still raise -- bad shard data
    should fail loudly, not vanish."""
    import pandas as pd
    import ray.data as rd

    def parse(df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"].str.strip()
        content = text[text.astype(bool) & ~text.str.startswith("#")]
        ext = content.str.extract(_nt_pattern())
        ext.columns = ["subj", "pred", "obj"]
        bad = ext["subj"].isna()
        if bad.any():
            raise ValueError(
                f"unparseable N-Triples line: {content[bad].iloc[0]!r}"
            )
        for col in ("subj", "obj"):
            iri = ext[col].str.startswith("<")
            ext.loc[iri, col] = ext.loc[iri, col].str.slice(1, -1)
        return ext.reset_index(drop=True)

    return rd.read_text(nt_dir).map_batches(parse, batch_format="pandas")
