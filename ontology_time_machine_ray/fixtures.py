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
#: version of the SMALL derived tables (index/origins/snapshots/deps/
#: embeddings_aug/client_auth).  Bumping this rewrites only those tables
#: (<1 s) and leaves the expensive documents corpus untouched -- bench
#: corpora at x800/x1600 stay valid across small-table semantic changes.
SMALL_TABLES_VERSION = "small-v12"
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

#: salt for the deterministic per-document request verb
METHOD_SALT = ":method"


def add_method_column(batch: pa.Table) -> pa.Table:
    """Append the synthetic per-document request verb: ~1/8 of documents
    issue HEAD, the rest GET (the reference's per-request method,
    ``proxy_wrapper.py:65-151``).  md5-derived so the SQL oracles replay
    the same assignment (``md5_hash64_series`` == DuckDB's UBIGINT cast
    of the first 16 md5 hex chars)."""
    import numpy as np

    from ontology_time_machine_ray.functions.hashing import md5_hash64_series

    ids = batch.column("doc_id").to_pandas()
    h = md5_hash64_series(ids + METHOD_SALT)
    method = np.where(h % 8 == 0, "HEAD", "GET")
    return batch.append_column("method", pa.array(method, type=pa.string()))


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
    def snapshot_rdf(self) -> str:
        return os.path.join(self.root, "snapshot_rdf.parquet")

    @property
    def media_assets(self) -> str:
        return os.path.join(self.root, "media_assets.parquet")

    @property
    def download_log(self) -> str:
        return os.path.join(self.root, "download_log.parquet")

    @property
    def dependencies(self) -> str:
        return os.path.join(self.root, "dependencies.parquet")

    @property
    def dependencies_ttl(self) -> str:
        return os.path.join(self.root, "dependencies.ttl")

    @property
    def embeddings_aug(self) -> str:
        return os.path.join(self.root, "embeddings_aug.parquet")

    @property
    def client_auth(self) -> str:
        return os.path.join(self.root, "client_auth.parquet")

    @property
    def documents_pii(self) -> str:
        return os.path.join(self.root, "documents_pii.parquet")

    @property
    def bpe_vocab(self) -> str:
        return os.path.join(self.root, "bpe_vocab.parquet")

    @property
    def bpe_merges(self) -> str:
        return os.path.join(self.root, "bpe_merges.parquet")

    @property
    def documents_jsonl(self) -> str:
        return os.path.join(self.root, "documents.jsonl")

    @property
    def documents_csv(self) -> str:
        return os.path.join(self.root, "documents.csv")


def build_bpe_vocab(sf_dir: str) -> "tuple[pa.Table, pa.Table]":
    """Scalar-reference BPE lookup: (word, n_tokens, sum_ids) for every
    distinct pretoken of ``sf_dir``'s documents table, computed by a
    fully independent ROW-AT-A-TIME implementation of the same BPE
    contract as ``stages/bpe.py`` (same GPT-2 pretokenizer regex, same
    merge count / word cap / tie-break constants, imported so the two
    sides can never silently diverge on parameters -- but training pair
    counting, merge application and encoding are re-written here as
    plain Python loops).  The DuckDB oracle joins this table; matching
    it certifies the engine's distributed frequency aggregation,
    vectorized trainer and batched rank-order encoder.  Returns the
    (vocab, merges) pair -- the merge table is its own fixture so the
    ``text_bpe_merges`` oracle compares the two TRAINERS rule by rule,
    not just their downstream encodes."""
    import re
    from collections import Counter

    import pandas as pd

    from ontology_time_machine_ray.stages.bpe import (
        BPE_TOKEN_RE,
        MAX_TRAIN_WORDS,
        N_MERGES,
    )

    docs = pd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )
    pat = re.compile(BPE_TOKEN_RE)
    cnt: Counter = Counter()
    for t in docs["text"].fillna(""):
        cnt.update(pat.findall(str(t)))
    wf = dict(
        sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:MAX_TRAIN_WORDS]
    )

    # --- scalar training (Sennrich et al. 2016 alg. 1, literal) ---
    words = {w: list(w) for w in wf if w}
    alphabet: set = set()
    for syms in words.values():
        alphabet.update(syms)
    merges: list = []
    for _ in range(N_MERGES):
        counts: Counter = Counter()
        for w, syms in words.items():
            f = wf[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        maxc = max(counts.values())
        best = min(p for p, c in counts.items() if c == maxc)
        merges.append(best)
        a, b = best
        for w, syms in words.items():
            i, out = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    ids: dict = {}
    for ch in sorted(alphabet):
        ids[ch] = len(ids)
    for a, b in merges:
        ids.setdefault(a + b, len(ids))

    # --- scalar encoding of EVERY distinct corpus pretoken ---
    out_w, out_n, out_s = [], [], []
    for w in sorted(cnt):
        syms = list(w)
        for a, b in merges:
            i, merged = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            syms = merged
        out_w.append(w)
        out_n.append(len(syms))
        out_s.append(sum(ids.get(s, -1) for s in syms))
    vocab = pa.table(
        {
            "word": pa.array(out_w, type=pa.string()),
            "n_tokens": pa.array(out_n, type=pa.int64()),
            "sum_ids": pa.array(out_s, type=pa.int64()),
        }
    )
    merge_tbl = pa.table(
        {
            "rank": pa.array(range(len(merges)), type=pa.int64()),
            "lhs": pa.array([a for a, _ in merges], type=pa.string()),
            "rhs": pa.array([b for _, b in merges], type=pa.string()),
        }
    )
    return vocab, merge_tbl


def write_documents_alt_formats(sf_dir: str, paths: "FixturePaths") -> None:
    """The documents table re-serialized as JSON-Lines and RFC-4180 CSV:
    the alternate SOURCE FORMATS the ``docs_jsonl_stats`` /
    ``docs_csv_stats`` registry queries ingest through
    ``ray.data.read_json`` / ``read_csv``, with DuckDB's
    ``read_json_auto`` / ``read_csv_auto`` as the oracle-side readers --
    the comparison certifies the whole ingest path, not just the
    transform."""
    import pandas as pd

    docs = pd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    docs = docs.assign(text=docs["text"].fillna(""))
    docs.to_json(paths.documents_jsonl, orient="records", lines=True,
                 force_ascii=False)
    docs.to_csv(paths.documents_csv, index=False)


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
    # 301 exercises the failover passthrough branch for non-200 statuses
    # (proxy_logic.py:218-229 returns ANY passthrough-status origin
    # response with a matching mime as-is, not just 200)
    status_rot = (200, 200, 404, 503, 200, 0, 301)
    rows = {
        "ontology_id": [ont_id(k) for k in range(N_INDEX)],
        "origin_status": [status_rot[k % 7] for k in range(N_INDEX)],
        "origin_content_type": [
            "text/html" if k % 7 == 4 else "text/turtle" for k in range(N_INDEX)
        ],
    }
    return pa.table(rows, schema=ORIGINS_SCHEMA)


def build_snapshots() -> tuple[pa.Table, pa.Table]:
    content = {k: [] for k in ("ontology_id", "version", "version_ts", "classes",
                               "properties", "same_as_a", "same_as_b",
                               "equiv_a", "equiv_b", "subclass_a", "subclass_b")}
    status = {k: [] for k in ("ontology_id", "version", "format", "status", "status_https")}
    for k in range(N_INDEX):
        cbase = term_base(k)
        for j in range(n_versions(k)):
            ts = version_date(k, j)
            ver = ts.strftime("%Y-%m-%d")
            content["ontology_id"].append(ont_id(k))
            content["version"].append(ver)
            content["version_ts"].append(ts)
            # NIR-check plant (A4, aggregate_results_NIRcheck.py:133-138):
            # some FIRST versions carry FOREIGN content -- a snapshot that
            # parses fine but does not describe the requested ontology
            # (the misconfigured-origin case the NIR check measures).
            # j == 0 is never served under any default policy (as-of and
            # latest both resolve to later versions), so every other
            # oracle is unaffected.
            tbase = term_base((k + 7) % N_INDEX) if (j == 0 and k % 13 == 9) else cbase
            content["classes"].append([f"{tbase}#C{i}" for i in range(2 + j)])
            content["properties"].append([f"{tbase}#p{i}" for i in range(1 + (j + k) % 3)])
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
            # rdfs:subClassOf edges: a within-version chain C_i -> C_{i-1}
            # over the SAME term base as `classes` (so the NIR foreign-
            # content plant stays self-consistent), plus sparse
            # cross-ontology edges C0(k) -> C1(k+3) that splice chains
            # into multi-ontology hierarchies.  Acyclic by construction
            # (chains point strictly downward in i; cross edges land on a
            # different base's chain interior, never back).
            sca, scb = [], []
            for i in range(1, 2 + j):
                sca.append(f"{tbase}#C{i}")
                scb.append(f"{tbase}#C{i - 1}")
            if j >= 1 and k % 6 == 2 and k + 3 < N_INDEX:
                sca.append(f"{tbase}#C0")
                scb.append(f"{term_base(k + 3)}#C1")
            content["subclass_a"].append(sca)
            content["subclass_b"].append(scb)
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


def build_download_log() -> pa.Table:
    """Nested download-log records in the reference's EXACT JSON shape
    (experiments/download_ontologies.py:53-148: ``{url, downloads: {fmt:
    {status_code, request_duration, content_length, error: {type,
    type_chain, chain_details: [...]}}}}``) -- the input the M16 JSON
    flattener consumes.  One JSON document per ontology; field values are
    deterministic in (k, fmt); failed formats carry a nested error chain
    of varying depth."""
    import json as _json

    rows_url: list[str] = []
    rows_json: list[str] = []
    for k in range(N_INDEX):
        downloads: dict = {}
        for fi, fmt in enumerate(FORMATS):
            status = 200
            if k % 7 == 3 and fmt == "owl":
                status = 500
            elif k % 9 == 5 and fmt == "nt":
                status = 404
            entry: dict = {
                "status_code": status,
                "request_duration_ms": 20 + (k * 13 + fi * 7) % 480,
                "content_length": 0 if status != 200 else 1000 + (k * 37 + fi) % 9000,
                "content_type": "text/turtle" if fmt == "ttl" else (
                    "application/n-triples" if fmt == "nt" else "application/rdf+xml"
                ),
                "error": None,
            }
            if status != 200:
                depth = 1 + (k % 3)
                entry["error"] = {
                    "type": "HTTPError" if status == 500 else "NotFoundError",
                    "type_chain": ["RequestException"] * depth,
                    "chain_details": [
                        {"type": "RequestException", "message": f"hop {d} for {fmt}"}
                        for d in range(depth)
                    ],
                }
            downloads[fmt] = entry
        rows_url.append(ont_iri(k))
        rows_json.append(
            _json.dumps({"url": ont_iri(k), "downloads": downloads}, sort_keys=False)
        )
    return pa.table(
        {"url": rows_url, "log_json": rows_json},
        schema=pa.schema([("url", pa.string()), ("log_json", pa.string())]),
    )


#: media-asset store size (vocabulary-scale object store, NOT corpus-
#: scale: payloads live behind refs at 100 TB, the engine decodes bytes).
N_MEDIA_ASSETS = 512


def build_media_assets() -> pa.Table:
    """REAL binary media payloads -- P6 PPM images and RIFF/PCM WAV audio
    built byte-by-byte from their published file formats (no codec lib
    needed to write OR read them), so ``MediaDecoder(fake=False)`` has a
    genuine decode path in-container.  Every ~17th asset is truncated
    (decode must flag it as unparseable, not crash -- errors are data).

    The metadata is a deterministic function of the asset index embedded
    in the ref, which is what makes the decode ORACLE-checkable: the SQL
    side replays the generator formulas + ``octet_length(payload)``, the
    Ray side derives everything from the BYTES -- two independent
    derivations that must agree."""
    import struct

    refs: list[str] = []
    payloads: list[bytes] = []
    for i in range(N_MEDIA_ASSETS):
        if i % 2 == 0:
            w = 4 + (i % 13)
            h = 3 + ((i * 7) % 11)
            payload = f"P6\n{w} {h}\n255\n".encode() + bytes(
                (i + p) % 256 for p in range(w * h * 3)
            )
            refs.append(f"media://asset/{i:05d}.ppm")
        else:
            channels = 1 + ((i // 2) % 2)
            rate = 8000 * (1 + (i % 3))
            n_frames = 50 + ((i * 11) % 200)
            block_align = channels * 2  # 16-bit PCM
            data = bytes((i * 3 + p) % 256 for p in range(n_frames * block_align))
            payload = (
                b"RIFF"
                + struct.pack("<I", 36 + len(data))
                + b"WAVE"
                + b"fmt "
                + struct.pack(
                    "<IHHIIHH", 16, 1, channels, rate, rate * block_align,
                    block_align, 16,
                )
                + b"data"
                + struct.pack("<I", len(data))
                + data
            )
            refs.append(f"media://asset/{i:05d}.wav")
        if i % 17 == 0:
            payload = payload[:5]  # corrupted asset
        payloads.append(payload)
    return pa.table(
        {"media_ref": refs, "payload": payloads},
        schema=pa.schema([("media_ref", pa.string()), ("payload", pa.binary())]),
    )


def build_snapshot_rdf(content: pa.Table) -> pa.Table:
    """Every snapshot serialized as a REAL Turtle document -- the input a
    user of the reference actually has (serialized ontology files, parsed
    by rapper in experiments/parse_ontologies.py:49-76), addressed by the
    (ontology_id, version) metadata a snapshot file carries externally.

    The serialization deliberately mixes Turtle forms so the distributed
    parser (``sources.readers.parse_snapshot_rdf_batch``) is exercised on
    real grammar, not one fixed line shape: ``a`` vs ``rdf:type``,
    ``;`` predicate lists, ``,`` object groups, plus an
    ``rdfs:isDefinedBy`` statement the parser must SKIP (unknown
    predicates are not snapshot content)."""
    out_id: list[str] = []
    out_ver: list[str] = []
    out_ttl: list[str] = []
    for r in content.to_pylist():
        lines = [
            "@prefix owl: <http://www.w3.org/2002/07/owl#> .",
            "@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .",
            "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .",
            "",
        ]
        sa_by: dict[str, list[str]] = {}
        for a, b in zip(r["same_as_a"], r["same_as_b"]):
            sa_by.setdefault(a, []).append(b)
        eq_by: dict[str, list[str]] = {}
        for a, b in zip(r["equiv_a"], r["equiv_b"]):
            eq_by.setdefault(a, []).append(b)
        for i, c in enumerate(r["classes"]):
            parts = [("a" if i % 2 == 0 else "rdf:type") + " owl:Class"]
            if i == 0:
                parts.append("rdfs:isDefinedBy <https://example.org/provenance>")
            if c in sa_by:
                parts.append(
                    "owl:sameAs " + ", ".join(f"<{o}>" for o in sa_by.pop(c))
                )
            if c in eq_by:
                parts.append(
                    "owl:equivalentClass "
                    + ", ".join(f"<{o}>" for o in eq_by.pop(c))
                )
            lines.append(f"<{c}> " + " ;\n    ".join(parts) + " .")
        for p_iri in r["properties"]:
            lines.append(f"<{p_iri}> a owl:ObjectProperty .")
        # edges whose subject is not a class of this snapshot (defensive;
        # the fixture never produces them, a real ontology could)
        for a, bs in sa_by.items():
            lines.append(
                f"<{a}> owl:sameAs " + ", ".join(f"<{o}>" for o in bs) + " ."
            )
        for a, bs in eq_by.items():
            lines.append(
                f"<{a}> owl:equivalentClass " + ", ".join(f"<{o}>" for o in bs) + " ."
            )
        out_id.append(r["ontology_id"])
        out_ver.append(r["version"])
        out_ttl.append("\n".join(lines) + "\n")
    return pa.table(
        {"ontology_id": out_id, "version": out_ver, "ttl": out_ttl},
        schema=pa.schema(
            [("ontology_id", pa.string()), ("version", pa.string()), ("ttl", pa.string())]
        ),
    )


def build_dependencies_ttl(deps: pa.Table) -> str:
    """The dependency manifest in the reference's Turtle shape
    (tests/dependency.ttl: ``<s> ex-version:dependency <o1>, <o2> .``),
    with canonical ontology IRIs as subjects/objects.  Paired with
    ``sources.readers.read_dependency_ttl`` so RDF-format manifest
    ingestion is exercised, not just the parquet edge table."""
    by_src: dict[str, list[str]] = {}
    for s, d in zip(deps["ontology_id"].to_pylist(), deps["depends_on"].to_pylist()):
        by_src.setdefault(s, []).append(d)
    id_to_iri = {ont_id(k): ont_iri(k) for k in range(N_INDEX)}
    lines = ["@prefix ex-version: <https://example.org/versioning/> .", ""]
    for s in sorted(by_src):
        objs = ", ".join(f"<{id_to_iri[d]}>" for d in by_src[s])
        lines.append(f"<{id_to_iri[s]}> ex-version:dependency {objs} .")
    return "\n".join(lines) + "\n"


#: planted near-duplicate target cosines (all safely off the 0.99
#: threshold boundary); the %7==1 plant at 0.9850 is a negative control.
_DUP_COSINES = (0.9995, 0.9975, 0.9952)


def build_embeddings_aug(sf_dir: str) -> pa.Table:
    """The driver's embeddings table plus deterministic planted
    near-duplicates, so ``dedup_embed`` has a non-trivial exact answer
    (the raw testdata's max off-diagonal cosine is ~0.51).

    Construction: for a unit base vector e and target cosine c, the dup is
    ``c*e + sqrt(1-c^2)*u_perp`` with u_perp a unit vector orthogonal to e
    (exact cosine by construction).  vec_id namespaces: base ids,
    10M+id (first dup), 20M+id (second dup -> planted triple clusters),
    30M+id (sub-threshold negative control at 0.9850).
    """
    import numpy as np

    src = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    ids = np.asarray(src["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.asarray(src["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    norm = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    rng = np.random.RandomState(13)

    def dup_of(i: int, cos: float) -> np.ndarray:
        e = norm[i]
        u = rng.normal(size=e.shape)
        u_perp = u - (u @ e) * e
        u_perp = u_perp / np.linalg.norm(u_perp)
        scale = np.linalg.norm(mat[i])  # keep the source's magnitude
        return (cos * e + np.sqrt(1.0 - cos * cos) * u_perp) * scale

    out_ids = list(ids)
    out_vecs = [mat[i] for i in range(len(ids))]
    for i, vid in enumerate(ids):
        if vid % 5 == 0:
            out_ids.append(10_000_000 + int(vid))
            out_vecs.append(dup_of(i, _DUP_COSINES[int(vid) % 3]))
            if vid % 25 == 0:
                out_ids.append(20_000_000 + int(vid))
                out_vecs.append(dup_of(i, 0.9975))
        elif vid % 7 == 1:
            out_ids.append(30_000_000 + int(vid))
            out_vecs.append(dup_of(i, 0.9850))
    emb_type = pa.list_(pa.float32())
    return pa.table(
        {
            "vec_id": pa.array(out_ids, type=pa.int64()),
            "embedding": pa.array([v.astype("float32") for v in out_vecs], type=emb_type),
        }
    )


def build_client_auth() -> pa.Table:
    """Per-client Proxy-Authorization fixtures for the auth-config parse
    (M10/M11, proxy_logic.py:65-86 + proxy_wrapper.py:134-151).

    The username carries a www-form-encoded CLI string (space as '+' or
    '%20'); rows cover every recognized option, enum case-insensitivity,
    the reference test's quoting (tests/test_proxy_auth_header_archivo.py:
    81-86), and each malformed-input route."""
    import base64

    def basic(creds: str) -> str:
        return "Basic " + base64.b64encode(creds.encode()).decode()

    rows = [
        ("c01", basic("--ontoVersion%20latestArchived:my_password")),
        ("c02", basic("--ontoFormat+turtle+--ontoPrecedence+always:secret")),
        ("c03", basic("--patchAcceptUpstream+--restrictedAccess:x")),
        ("c04", basic("--httpsInterception+block:x")),
        ("c05", basic("--ontoVersion+LATESTARCHIVED:x")),  # case-insensitive enum
        ("c06", basic("--ontoVersion+nonsense:x")),  # invalid enum value
        ("c07", basic("--bogusFlag+x:x")),  # unknown argument
        ("c08", basic("a:b:c")),  # >1 colon: reference split(':') raises
        ("c09", "Bearer xyz"),  # non-basic auth type
        ("c10", "Basic !!!notbase64!!!"),  # undecodable credentials
        ("c11", None),  # no auth header at all
        ("c12", basic("--ontoVersion+timestampArchived:x")),
        (
            "c13",
            basic(
                "--ontoFormat+ntriples+--ontoVersion+originalFailoverLiveLatest"
                "+--httpsInterception+archivo+--disableRemovingRedirects:pw"
            ),
        ),
        ("c14", basic("--ontoFormat%20rdfxml%20--httpsInterception%20none:pw")),
        ("c15", basic("stray --ontoFormat turtle:x")),  # leading positional
        ("c16", basic(":pw")),  # empty username: argparse([""]) errors
    ]
    return pa.table(
        {
            "client_id": pa.array([r[0] for r in rows], type=pa.string()),
            "auth_header": pa.array([r[1] for r in rows], type=pa.string()),
        }
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


def build_documents_pii(sf_dir: str) -> pa.Table:
    """The driver's documents table with deterministic planted PII, so the
    ``pii_scrub`` operator has a non-trivial exact answer (the synthetic
    corpus itself contains no emails/phones/IPs).

    Plants (by doc_id residue; some docs get several kinds):
      %5 == 0  -> an email address
      %7 == 0  -> a +-prefixed international phone number
      %11 == 0 -> a dotted-quad IPv4
    """
    src = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ids = src["doc_id"].to_pylist()
    texts = src["text"].to_pylist()
    out = []
    for i, t in zip(ids, texts):
        t = t or ""
        if i % 5 == 0:
            t += f" Contact alice.smith+{i}@example.org for details."
        if i % 7 == 0:
            t += f" Call +1 415 555 {i % 10000:04d} now."
        if i % 11 == 0:
            t += f" Served from 10.{i % 256}.0.{(i * 7) % 256}."
        out.append(t)
    return pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(out, pa.string())})


def _write_small_tables(paths: FixturePaths, sf_dir: str) -> None:
    deps = build_dependencies()
    pq.write_table(deps, paths.dependencies)
    with open(paths.dependencies_ttl, "w") as f:
        f.write(build_dependencies_ttl(deps))
    pq.write_table(build_ontology_index(), paths.ontology_index)
    pq.write_table(build_origins(), paths.origins)
    content, status = build_snapshots()
    pq.write_table(content, paths.snapshot_content)
    pq.write_table(status, paths.snapshot_status)
    pq.write_table(build_snapshot_rdf(content), paths.snapshot_rdf)
    pq.write_table(build_media_assets(), paths.media_assets)
    pq.write_table(build_download_log(), paths.download_log)
    pq.write_table(build_embeddings_aug(sf_dir), paths.embeddings_aug)
    pq.write_table(build_client_auth(), paths.client_auth)
    pq.write_table(build_documents_pii(sf_dir), paths.documents_pii)
    bpe_vocab, bpe_merges = build_bpe_vocab(sf_dir)
    pq.write_table(bpe_vocab, paths.bpe_vocab)
    pq.write_table(bpe_merges, paths.bpe_merges)
    write_documents_alt_formats(sf_dir, paths)


def _marker_value() -> str:
    return f"{GENERATOR_VERSION}|{SMALL_TABLES_VERSION}"


def ensure_fixtures(sf_dir: str, repeat: int = 1, text_scale: int = 1) -> FixturePaths:
    """Idempotently materialize the fixture tables for ``sf_dir``.

    Content-addressed skip via a _SUCCESS marker carrying the generator
    version (the reference's sha256 hash-skip idea,
    download_archivo_urls.py:65-74).  The marker is two-part
    (``docsver|smallver``): a small-tables version change rewrites only
    the cheap derived tables, keeping multi-million-doc bench corpora.
    """
    root = fixture_dir(sf_dir, repeat, text_scale)
    marker = os.path.join(root, "_SUCCESS")
    paths = FixturePaths(root)
    if os.path.exists(marker):
        with open(marker) as f:
            parts = f.read().strip().split("|")
        if parts[0] == GENERATOR_VERSION:
            if len(parts) > 1 and parts[1] == SMALL_TABLES_VERSION:
                return paths
            _write_small_tables(paths, sf_dir)
            with open(marker, "w") as f:
                f.write(_marker_value())
            return paths
    os.makedirs(root, exist_ok=True)
    write_documents(paths.documents, sf_dir, repeat, text_scale)
    _write_small_tables(paths, sf_dir)
    with open(marker, "w") as f:
        f.write(_marker_value())
    return paths
