"""Deterministic synthesis of the engine's input corpus.

Per ``BASELINE.json.input_hint`` the pipeline input is a table of
interleaved text + media documents: ``(doc_id: string, spans:
list<struct<kind, text, media_ref, offset>>)``.  The driver's testdata only
ships a flat ``documents.parquet`` (doc_id, text, ...), so this module
derives the interleaved corpus from it DETERMINISTICALLY (stable 64-bit
hashes of the doc id -- no wall clock, no ``random``), together with the
ontology index, live-origin table and versioned snapshot store that play
the roles of, respectively:

* ``archivo_ontologies.txt``  (reference index of 1,816 IRIs,
  download_archivo_urls.py:103-132),
* live origin servers (request_ontology outcomes, proxy_logic.py:147-159),
* the DBpedia Archivo snapshot API (ontology x format x version addressing,
  proxy_logic.py:251,271).

Every generated table is plain Parquet under ``/tmp/otm_fixtures`` so the
DuckDB oracle can read the exact same bytes the Ray pipeline reads.

The generated corpus systematically exercises every decision branch of the
reference: exact / stripped-slash / parent / parent+'/' / grandparent
truncation matches (proxy_logic.py:103-141), fragment IRIs, non-index IRIs
(404 route), every Accept-header negotiation outcome including the
unsupported-format 500 route (utils.py:103-157), all four version policies,
origin failures and mime-mismatch failover (proxy_logic.py:209-238), the
Archivo 500 + https retry (proxy_logic.py:254-260), and hub entities for
skew handling (~5% of docs mention ontology O000).
"""

from __future__ import annotations

import datetime as _dt
import os
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.parquet as pq

from ontology_time_machine_ray.functions.hashing import stable_hash64
from ontology_time_machine_ray.schema import (
    DOCUMENTS_SCHEMA,
    ONTOLOGY_INDEX_SCHEMA,
    ORIGINS_SCHEMA,
    SNAPSHOT_CONTENT_SCHEMA,
    SNAPSHOT_STATUS_SCHEMA,
)

GENERATOR_VERSION = "otm-fixtures-v2"
FIXTURE_ROOT = "/tmp/otm_fixtures"

N_INDEX = 48  # in-index ontologies O000..O047
N_TOTAL = 64  # k >= 48 are "fake" (not in index -> 404 route)
FORMATS = ("ttl", "nt", "owl")

#: Accept-header rotation; index 5 is the absent-header case.  Outcomes
#: under the default config (format=turtle, precedence=default):
#: ttl, owl, nt, ttl(*/* patched), None->500, ttl(patched), None->500, owl.
ACCEPTS: tuple = (
    "text/turtle",
    "application/rdf+xml,text/turtle;q=0.9,*/*;q=0.8",
    "application/n-triples;q=0.9,text/plain;q=0.8",
    "*/*",
    "application/json",
    None,
    "text/html,application/xhtml+xml,application/xml;q=0.9,image/webp,*/*;q=0.8",
    "application/owl+xml,application/n-triples;q=0.5",
)

POLICIES = (
    "original",
    "originalFailoverLiveLatest",
    "latestArchived",
    "timestampArchived",
)


def ont_host(k: int) -> str:
    return f"onto{k % 12}.example.org" if k < N_INDEX else f"nowhere{k}.example.net"


def ont_path(k: int) -> str:
    shape = k % 4
    if shape == 0:
        return f"/ns/v{k}/"  # trailing-slash style
    if shape == 1:
        return f"/ontology{k}"  # bare, used with #fragments
    if shape == 2:
        return f"/def/ont{k}"
    return f"/a/b/ont{k}"


def ont_iri(k: int) -> str:
    return f"http://{ont_host(k)}{ont_path(k)}"


def ont_id(k: int) -> str:
    return f"O{k:03d}"


def term_base(k: int) -> str:
    """Base IRI for class/property terms (#-fragment namespace)."""
    return ont_iri(k).rstrip("/")


def mention_iri(k: int, form: int, j: int, https: bool = False) -> str:
    """A surface IRI for ontology ``k`` exercising truncation form ``form``.

    Forms (cf. truncation_candidates / proxy_logic.py:103-141): 0 exact,
    1 parent (or parent+'/' for slash-style), 2 fragment->exact,
    3 grandparent, 4 stripped-slash (or parent+'/' variant), 5 exact.
    """
    base = ont_iri(k)
    slash_style = base.endswith("/")
    if form == 1:
        iri = base + (f"Class{j}" if slash_style else f"/Term{j}")
    elif form == 2:
        iri = base + f"#Frag{j}"
    elif form == 3:
        iri = base + (f"x/y{j}" if slash_style else f"/x/y{j}")
    elif form == 4:
        iri = (base + f"Class{j}/") if slash_style else (base + "/")
    else:
        iri = base
    if https:
        iri = iri.replace("http://", "https://", 1)
    return iri


def n_versions(k: int) -> int:
    return 2 + (k % 4)


def version_date(k: int, j: int) -> _dt.datetime:
    base = _dt.datetime(2019, 1, 15) + _dt.timedelta(days=(k * 17) % 300)
    if k % 11 == 7:  # all versions after the default time-machine T
        base += _dt.timedelta(days=1200)
    return base + _dt.timedelta(days=173 * j)


def _doc_spans(
    doc_id_str: str, text: str, text_scale: int = 1
) -> tuple[list[dict], str, str]:
    """Deterministic spans + request profile for one document.

    ``text_scale`` multiplies the prose volume per span (bench corpora use
    KB-scale documents so the scan stage is compute-bound like a real
    corpus; correctness corpora keep scale=1)."""
    h = stable_hash64(doc_id_str)
    accept = ACCEPTS[h % 8]
    policy = POLICIES[(h >> 4) % 4]
    n_mentions = 1 + ((h >> 8) % 2)
    hub = (h % 20) == 0  # ~5% of docs mention the hub ontology O000
    if text_scale > 1:
        text = (text + " ") * text_scale
    chunk = 60 * text_scale

    parts: list[tuple[str, str, str]] = []  # (kind, text, media_ref)
    for j in range(n_mentions):
        if j == 0 and hub:
            k, form = 0, 0
        else:
            k = (h >> (16 + 7 * j)) % N_TOTAL
            form = (h >> (40 + 5 * j)) % 6
        https = bool((h >> 60) & 1) and form == 0
        iri = mention_iri(k, form, j, https=https)
        prose = text[j * chunk : j * chunk + chunk]
        parts.append(("text", f"{prose} see {iri} for details.", ""))
    tail = text[n_mentions * chunk : n_mentions * chunk + 80 * text_scale]
    parts.append(("text", f"{tail} end.", ""))
    if (h >> 3) % 5 == 0:  # ~20% of docs carry a media span
        pos = (h >> 9) % (len(parts) + 1)
        parts.insert(pos, ("media", "", f"media://blob/{h % 97}/{doc_id_str}.bin"))

    spans = []
    offset = 0
    for kind, t, ref in parts:
        spans.append({"kind": kind, "text": t, "media_ref": ref, "offset": offset})
        offset += len(t)
    return spans, accept, policy


@dataclass(frozen=True)
class FixturePaths:
    root: str

    @property
    def documents(self) -> str:
        return os.path.join(self.root, "documents_interleaved.parquet")

    @property
    def ontology_index(self) -> str:
        return os.path.join(self.root, "ontology_index.parquet")

    @property
    def origins(self) -> str:
        return os.path.join(self.root, "origins.parquet")

    @property
    def snapshot_content(self) -> str:
        return os.path.join(self.root, "snapshot_content.parquet")

    @property
    def snapshot_status(self) -> str:
        return os.path.join(self.root, "snapshot_status.parquet")

    @property
    def dependencies(self) -> str:
        return os.path.join(self.root, "dependencies.parquet")


def build_ontology_index() -> pa.Table:
    rows = {
        "ontology_id": [ont_id(k) for k in range(N_INDEX)],
        "iri": [ont_iri(k) for k in range(N_INDEX)],
        "host": [ont_host(k) for k in range(N_INDEX)],
        "path": [ont_path(k) for k in range(N_INDEX)],
    }
    return pa.table(rows, schema=ONTOLOGY_INDEX_SCHEMA)


def build_dependencies() -> pa.Table:
    """Ontology dependency edges -- the reference's dormant dependency
    manifest (tests/dependency.ttl; commented-out resolution at
    proxy_logic.py:276-307) realized as a deterministic edge table.
    Chains with shared tails and one 2-cycle (closure must terminate)."""
    src, dst = [], []
    for k in range(N_INDEX):
        if k % 6 < 2:
            src.append(ont_id(k))
            dst.append(ont_id((k * 7 + 3) % N_INDEX))
        if k % 9 == 4:
            src.append(ont_id(k))
            dst.append(ont_id((k + 5) % N_INDEX))
    # explicit 2-cycle
    src += [ont_id(40), ont_id(41)]
    dst += [ont_id(41), ont_id(40)]
    return pa.table(
        {"ontology_id": src, "depends_on": dst},
        schema=pa.schema([("ontology_id", pa.string()), ("depends_on", pa.string())]),
    )


def build_origins() -> pa.Table:
    status_rot = (200, 200, 404, 503, 200, 0)
    rows = {
        "ontology_id": [ont_id(k) for k in range(N_INDEX)],
        "origin_status": [status_rot[k % 6] for k in range(N_INDEX)],
        "origin_content_type": [
            "text/html" if k % 6 == 4 else "text/turtle" for k in range(N_INDEX)
        ],
    }
    return pa.table(rows, schema=ORIGINS_SCHEMA)


def build_snapshots() -> tuple[pa.Table, pa.Table]:
    content = {k: [] for k in ("ontology_id", "version", "version_ts", "classes",
                               "properties", "same_as_a", "same_as_b",
                               "equiv_a", "equiv_b")}
    status = {k: [] for k in ("ontology_id", "version", "format", "status", "status_https")}
    for k in range(N_INDEX):
        cbase = term_base(k)
        for j in range(n_versions(k)):
            ts = version_date(k, j)
            ver = ts.strftime("%Y-%m-%d")
            content["ontology_id"].append(ont_id(k))
            content["version"].append(ver)
            content["version_ts"].append(ts)
            content["classes"].append([f"{cbase}#C{i}" for i in range(2 + j)])
            content["properties"].append([f"{cbase}#p{i}" for i in range(1 + (j + k) % 3)])
            sa, sb = [], []
            ea, eb = [], []
            if j >= 1:  # equivalence edges appear from the second version on
                if k % 3 in (0, 1) and k + 1 < N_INDEX:  # chains of three
                    sa.append(f"{cbase}#C0")
                    sb.append(f"{term_base(k + 1)}#C0")
                if k % 5 == 2:  # hub star on O000#C1
                    sa.append(f"{cbase}#C1")
                    sb.append(f"{term_base(0)}#C1")
            if j >= 2 and k % 4 == 1 and k + 2 < N_INDEX:
                # owl:equivalentClass pairs (distinct node set: C2s)
                ea.append(f"{cbase}#C2")
                eb.append(f"{term_base(k + 2)}#C2")
            content["same_as_a"].append(sa)
            content["same_as_b"].append(sb)
            content["equiv_a"].append(ea)
            content["equiv_b"].append(eb)
            for fmt in FORMATS:
                st = 200
                st_https = 200
                if k % 7 == 3 and fmt == "owl":  # Archivo 500 + https retry
                    st = 500
                    st_https = 200 if k % 2 == 0 else 500
                elif k % 9 == 5 and fmt == "nt":  # format missing
                    st = 404
                    st_https = 404
                status["ontology_id"].append(ont_id(k))
                status["version"].append(ver)
                status["format"].append(fmt)
                status["status"].append(st)
                status["status_https"].append(st_https)
    return (
        pa.table(content, schema=SNAPSHOT_CONTENT_SCHEMA),
        pa.table(status, schema=SNAPSHOT_STATUS_SCHEMA),
    )


def _documents_chunks(sf_dir: str, repeat: int, text_scale: int):
    """Yield Arrow tables of synthesized docs, one chunk per repeat pass
    (bounded memory for multi-million-doc bench corpora)."""
    src = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    doc_ids = src["doc_id"].to_pylist()
    texts = src["text"].to_pylist()
    for r in range(repeat):
        suffix = f"-r{r}" if repeat > 1 else ""
        out_ids, out_spans, out_accept, out_policy = [], [], [], []
        for did, text in zip(doc_ids, texts):
            doc_id_str = f"doc-{did:08d}{suffix}"
            spans, accept, policy = _doc_spans(doc_id_str, text or "", text_scale)
            out_ids.append(doc_id_str)
            out_spans.append(spans)
            out_accept.append(accept)
            out_policy.append(policy)
        yield pa.table(
            {"doc_id": out_ids, "spans": out_spans, "accept": out_accept, "policy": out_policy},
            schema=DOCUMENTS_SCHEMA,
        )


def build_documents(sf_dir: str, repeat: int = 1, text_scale: int = 1) -> pa.Table:
    return pa.concat_tables(_documents_chunks(sf_dir, repeat, text_scale))


def write_documents(path: str, sf_dir: str, repeat: int, text_scale: int) -> None:
    """repeat == 1: a single parquet file (what the SQL oracle reads).
    repeat > 1 (bench corpora): a DIRECTORY of part files, one per repeat
    pass, so `read_parquet` fans out one read task per file -- a
    single-file corpus serializes the scan and caps pipeline scaling."""
    if repeat == 1:
        with pq.ParquetWriter(path, DOCUMENTS_SCHEMA) as writer:
            for chunk in _documents_chunks(sf_dir, repeat, text_scale):
                writer.write_table(chunk)
        return
    os.makedirs(path, exist_ok=True)
    for i, chunk in enumerate(_documents_chunks(sf_dir, repeat, text_scale)):
        pq.write_table(chunk, os.path.join(path, f"part-{i:05d}.parquet"))


def fixture_dir(sf_dir: str, repeat: int = 1, text_scale: int = 1) -> str:
    name = os.path.basename(os.path.normpath(sf_dir))
    if repeat > 1:
        name = f"{name}_x{repeat}"
    if text_scale > 1:
        name = f"{name}_t{text_scale}"
    return os.path.join(FIXTURE_ROOT, name)


def ensure_fixtures(sf_dir: str, repeat: int = 1, text_scale: int = 1) -> FixturePaths:
    """Idempotently materialize the fixture tables for ``sf_dir``.

    Content-addressed skip via a _SUCCESS marker carrying the generator
    version (the reference's sha256 hash-skip idea,
    download_archivo_urls.py:65-74).
    """
    root = fixture_dir(sf_dir, repeat, text_scale)
    marker = os.path.join(root, "_SUCCESS")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == GENERATOR_VERSION:
                paths = FixturePaths(root)
                # backfill tables added after the corpus was generated
                # (documents are untouched, so no version bump / regen)
                if not os.path.exists(paths.dependencies):
                    pq.write_table(build_dependencies(), paths.dependencies)
                return paths
    os.makedirs(root, exist_ok=True)
    paths = FixturePaths(root)
    write_documents(paths.documents, sf_dir, repeat, text_scale)
    pq.write_table(build_dependencies(), paths.dependencies)
    pq.write_table(build_ontology_index(), paths.ontology_index)
    pq.write_table(build_origins(), paths.origins)
    content, status = build_snapshots()
    pq.write_table(content, paths.snapshot_content)
    pq.write_table(status, paths.snapshot_status)
    with open(marker, "w") as f:
        f.write(GENERATOR_VERSION)
    return paths
