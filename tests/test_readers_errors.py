"""Source readers (S1/S2/S5/S7/S8) + error classification (M13/M14)."""

from __future__ import annotations

import os

import pandas as pd

from ontology_time_machine_ray.functions.errors import (
    causal_chain,
    classify_exception,
    classify_status,
    type_chain,
)
from ontology_time_machine_ray.sources.readers import (
    build_index_parquet,
    file_sha256,
    read_iri_lines,
    write_report_tsv,
)


def test_build_index_parquet_hash_skip(ray_session, tmp_path):
    txt = tmp_path / "iris.txt"
    txt.write_text(
        "http://a.example.org/onto/\n"
        "\n"
        "http://b.example.org/ns/v1\n"
        "http://a.example.org/onto/\n"  # duplicate -> O2 dedup
    )
    out = str(tmp_path / "index.parquet")
    d1 = build_index_parquet(str(txt), out)
    import pyarrow.parquet as pq

    t = pq.read_table(out)
    assert t.num_rows == 2
    assert set(t["host"].to_pylist()) == {"a.example.org", "b.example.org"}
    assert t["ontology_id"].to_pylist() == ["O000", "O001"]
    # unchanged input -> skip (mtime of output untouched)
    m1 = os.path.getmtime(out)
    d2 = build_index_parquet(str(txt), out)
    assert d1 == d2 and os.path.getmtime(out) == m1
    # changed input -> rebuild
    txt.write_text("http://c.example.org/x\n")
    d3 = build_index_parquet(str(txt), out)
    assert d3 != d1
    assert pq.read_table(out).num_rows == 1
    assert d3 == file_sha256(str(txt))


def test_read_iri_lines(ray_session, tmp_path):
    txt = tmp_path / "urls.txt"
    txt.write_text("http://x/1\n\n  http://x/2  \n")
    got = read_iri_lines(str(txt)).to_pandas()["text"].tolist()
    assert got == ["http://x/1", "http://x/2"]


def test_write_report_tsv(tmp_path):
    p = str(tmp_path / "report.tsv")
    write_report_tsv(pd.DataFrame({"category": ["a"], "n": [1]}), p)
    assert open(p).read().splitlines() == ["category\tn", "a\t1"]


def test_causal_chain_and_classification():
    try:
        try:
            raise ConnectionRefusedError("no route")
        except ConnectionRefusedError:
            raise RuntimeError("wrapper")
    except RuntimeError as e:
        chain = causal_chain(e)
        assert [c["type"] for c in chain] == ["RuntimeError", "ConnectionRefusedError"]
        assert type_chain(e) == ["RuntimeError", "ConnectionRefusedError"]
        assert classify_exception(e) == "connection-refused"
    assert classify_exception(ValueError("x")) == "transport-error"


def test_classify_status_buckets():
    assert classify_status(0, None, False) == "unreachable"
    assert classify_status(200, "text/turtle", True) == "ok-rdf"
    assert classify_status(200, "text/html", False) == "ok-but-html"
    assert classify_status(200, "application/json", False) == "ok-wrong-mimetype"
    assert classify_status(301, None, False) == "redirect"
    assert classify_status(404, None, False) == "client-error-404"
    assert classify_status(503, None, False) == "server-error-503"


def test_snapshot_rdf_roundtrip():
    """build_snapshot_rdf -> parse_snapshot_rdf_batch reconstructs the
    snapshot-content lists EXACTLY (order included), across every Turtle
    form the serializer mixes in (a/rdf:type, ';' lists, ',' groups,
    skipped rdfs:isDefinedBy statements)."""
    from ontology_time_machine_ray.fixtures import build_snapshot_rdf, build_snapshots
    from ontology_time_machine_ray.sources.readers import parse_snapshot_rdf_batch

    content, _ = build_snapshots()
    rdf = build_snapshot_rdf(content)
    parsed = parse_snapshot_rdf_batch(rdf.to_pandas())
    orig = content.to_pandas()
    assert list(parsed["ontology_id"]) == list(orig["ontology_id"])
    assert list(parsed["version"]) == list(orig["version"])
    for col in ("classes", "properties", "same_as_a", "same_as_b", "equiv_a", "equiv_b"):
        got = [list(x) for x in parsed[col]]
        want = [list(x) for x in orig[col]]
        assert got == want, col


def test_ntriples_roundtrip_and_idempotent_export(ray_session, tmp_path):
    """write_ntriples -> read_ntriples round-trips exactly; re-export of
    the same data creates no new shards (content-addressed names); bad
    lines raise instead of silently dropping."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from ontology_time_machine_ray.sources.readers import read_ntriples
    from ontology_time_machine_ray.sources.writers import write_ntriples

    t = pd.DataFrame(
        {
            "subj": ["http://a/1", "http://a/2"],
            "pred": ["http://p/knows"] * 2,
            "obj": ["http://a/2", "http://a/3"],
        }
    )
    out = str(tmp_path / "nt")
    n = write_ntriples(rd.from_pandas(t), out)
    assert n == 2
    shards = sorted(os.listdir(out))
    got = read_ntriples(out).to_pandas().sort_values("subj").reset_index(drop=True)
    assert got.to_dict("list") == t.to_dict("list")

    # a populated dir refuses a fresh export (different block splits
    # would double the data); resume=True re-runs as a no-op with the
    # same input/split -- identical content-addressed shard set
    with pytest.raises(FileExistsError, match="already holds"):
        write_ntriples(rd.from_pandas(t), out)
    assert write_ntriples(rd.from_pandas(t), out, resume=True) == 2
    assert sorted(os.listdir(out)) == shards

    # malformed line -> loud failure
    with open(os.path.join(out, "part-bad.nt"), "w") as f:
        f.write("this is not a triple\n")
    with pytest.raises(Exception, match="unparseable"):
        read_ntriples(out).materialize()


def test_ttl_statement_split_no_space_before_dot():
    """Valid Turtle terminates statements with '.' NOT preceded by
    whitespace ('obj.'); the splitter must split there while never
    splitting on dots inside IRIs."""
    from ontology_time_machine_ray.sources.readers import parse_snapshot_ttl

    classes, props, sa, sb, ea, eb = parse_snapshot_ttl(
        "@prefix owl: <http://www.w3.org/2002/07/owl#> .\n"
        "<http://a#C0> a owl:Class.\n"
        "<http://ex.org/v1.2/C> a owl:Class.\n"
        "<http://a#C0> owl:sameAs <http://b#C1>.\n"
    )
    assert classes == ["http://a#C0", "http://ex.org/v1.2/C"]
    assert (sa, sb) == (["http://a#C0"], ["http://b#C1"])


def test_dependency_ttl_no_space_before_dot(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ontology_time_machine_ray.sources.readers import read_dependency_ttl

    ttl = tmp_path / "dep.ttl"
    ttl.write_text(
        "@prefix ex-version: <http://ex/v#> .\n"
        "<http://x/a> ex-version:dependency <http://x/b>.\n"
    )
    idx = tmp_path / "index.parquet"
    pq.write_table(
        pa.table({"iri": ["http://x/a", "http://x/b"], "ontology_id": ["a", "b"]}),
        idx,
    )
    edges = read_dependency_ttl(str(ttl), str(idx))
    assert edges.to_pydict() == {"ontology_id": ["a"], "depends_on": ["b"]}


def test_ntriples_full_line_grammar(ray_session, tmp_path):
    """Comments, blank nodes, literal objects (datatype/lang) and CRLF are
    all valid N-Triples and must parse, not raise."""
    from ontology_time_machine_ray.sources.readers import read_ntriples

    d = tmp_path / "nt"
    d.mkdir()
    (d / "a.nt").write_text(
        "# comment header\r\n"
        "<http://s1> <http://p> <http://o1> .\n"
        '<http://s2>   <http://p>  "lit val"^^<http://www.w3.org/2001/XMLSchema#int> .\r\n'
        '_:b1 <http://p> "hola"@es .\n'
        "\n"
        "<http://s3> <http://p> _:b1 .\n"
    )
    got = read_ntriples(str(d)).to_pandas().sort_values("subj").reset_index(drop=True)
    assert got["subj"].tolist() == ["_:b1", "http://s1", "http://s2", "http://s3"]
    assert got["obj"].tolist() == [
        '"hola"@es',
        "http://o1",
        '"lit val"^^<http://www.w3.org/2001/XMLSchema#int>',
        "_:b1",
    ]


def test_sized_read_parquet_block_counts(ray_session, tmp_path):
    """Block count is derived from data size: tiny tables collapse to ONE
    block (no per-block exchange tax), bigger tables are floored at the
    cluster CPU count; `columns` pruning is honored either way."""
    import numpy as np
    import ray

    from ontology_time_machine_ray.sources.readers import sized_read_parquet

    tiny = tmp_path / "tiny.parquet"
    pd.DataFrame({"k": range(100), "v": range(100)}).to_parquet(tiny)
    ds = sized_read_parquet(str(tiny), columns=["k"])
    assert ds.schema().names == ["k"]
    assert ds.materialize().num_blocks() == 1

    # ~48 MB on disk (incompressible) -> est = 48*6/32 = 9 > 1, so the
    # block count floors at the cluster CPU count
    big = tmp_path / "big.parquet"
    rng = np.random.default_rng(7)
    n = 3_000_000
    pd.DataFrame(
        {"k": np.arange(n), "v": rng.integers(0, 2**62, n)}
    ).to_parquet(big, compression=None, row_group_size=100_000)
    nb = sized_read_parquet(str(big)).materialize().num_blocks()
    cpus = int(ray.cluster_resources().get("CPU", 0))
    assert nb >= cpus

    # list-of-files input (the pruned layout-read shape)
    ds2 = sized_read_parquet([str(tiny), str(tiny)])
    assert ds2.count() == 200
    assert ds2.materialize().num_blocks() == 1
