"""Dedup family + similarity search tests (synthetic near-dups)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def dup_corpus(ray_session):
    """20 base docs + 5 planted near-duplicates (light edits)."""
    import ray.data as rd

    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(400)]
    rows = []
    for i in range(20):
        words = list(rng.choice(vocab, size=120))
        rows.append({"doc_id": i, "text": " ".join(words)})
    for j in range(5):  # near-dup of doc j: change 3 words
        words = rows[j]["text"].split()
        for k in (5, 50, 100):
            words[k] = "CHANGED"
        rows.append({"doc_id": 100 + j, "text": " ".join(words)})
    df = pd.DataFrame(rows)
    return df, rd.from_pandas(df)


def test_jaccard_pairs_find_planted_dups(dup_corpus):
    from ontology_time_machine_ray.stages.dedup_docs import jaccard_pairs

    df, ds = dup_corpus
    pairs = jaccard_pairs("unused", threshold=0.8, docs_ds=ds).to_pandas()
    got = {(a, b) for a, b in zip(pairs["a"], pairs["b"])}
    assert {(j, 100 + j) for j in range(5)} <= got
    # unrelated random docs never collide at 0.8
    assert all(b - a == 100 for a, b in got)


def test_minhash_clusters_match_planted_dups(dup_corpus):
    from ontology_time_machine_ray.stages.dedup_docs import minhash_clusters

    df, ds = dup_corpus
    out = minhash_clusters("unused", threshold=0.8, docs_ds=ds).to_pandas()
    by_doc = dict(zip(out["doc_id"], out["cluster"]))
    for j in range(5):
        assert by_doc[j] == by_doc[100 + j], f"near-dup pair {j} not clustered"
    # distinct base docs stay in distinct clusters
    assert len({by_doc[i] for i in range(5, 20)}) == 15


def test_minhash_label_partitioned_fallback_matches_broadcast(dup_corpus):
    """Forcing ``broadcast_limit`` to 0 routes the cluster-label rewrite
    through the doc_id-bucketed left join; the output must be identical
    to the broadcast path (same discipline as canonicalize's
    limit+fallback test)."""
    from ontology_time_machine_ray.stages.dedup_docs import minhash_clusters

    df, ds = dup_corpus
    bc = (
        minhash_clusters("unused", threshold=0.8, docs_ds=ds)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    part = (
        minhash_clusters("unused", threshold=0.8, docs_ds=ds, broadcast_limit=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(bc["doc_id"]) == list(part["doc_id"])
    assert list(bc["cluster"].astype(str)) == list(part["cluster"].astype(str))


def test_simhash_pairs_on_planted_dups(ray_session):
    """SimHash finds planted dups and nothing hamming-infeasible.

    The corpus plants an exact duplicate (hamming 0, must always appear)
    and a one-token-append near-dup; a 3-word edit like ``dup_corpus``'s
    is NOT guaranteed under hamming<=3 (each edited token flips every bit
    whose majority margin it covers), so this test owns its fixture."""
    import ray.data as rd

    from ontology_time_machine_ray.stages.dedup_docs import simhash_pairs

    rng = np.random.RandomState(11)
    vocab = [f"w{i}" for i in range(400)]
    rows = [
        {"doc_id": i, "text": " ".join(rng.choice(vocab, size=120))}
        for i in range(20)
    ]
    rows.append({"doc_id": 100, "text": rows[0]["text"]})  # exact dup
    rows.append({"doc_id": 101, "text": rows[1]["text"] + " zzz-rare"})
    df = pd.DataFrame(rows)
    ds = rd.from_pandas(df)
    pairs = simhash_pairs("unused", max_hamming=3, docs_ds=ds).to_pandas()
    assert (0, 100) in set(zip(pairs["a"], pairs["b"]))
    got = {(a, b) for a, b in zip(pairs["a"], pairs["b"])}
    # every reported pair must truly be within the hamming bound
    from ontology_time_machine_ray.stages.dedup_docs import _simhash_batch

    sims = dict(zip(df["doc_id"], _simhash_batch(df)["simhash"]))
    for a, b in got:
        assert bin(int(sims[a]) ^ int(sims[b])).count("1") <= 3
    # completeness: 4-segment blocking is pigeonhole-exact for hamming<=3,
    # so the result must equal the exhaustive pair set
    ids = sorted(sims)
    want = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(int(sims[a]) ^ int(sims[b])).count("1") <= 3
    }
    assert got == want


def test_ann_bruteforce_matches_numpy(ray_session, sf_dir):
    from ontology_time_machine_ray.stages.similarity import ann_bruteforce, default_queries

    got = ann_bruteforce(sf_dir, k=10, n_queries=3)
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    mat = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ids = t["vec_id"].to_numpy()
    q = default_queries(sf_dir, 3)
    for qid, qe in zip(q["vec_id"], q["embedding"]):
        qv = np.asarray(qe, dtype=np.float64)
        qv = qv / np.linalg.norm(qv)
        sims = mat @ qv
        order = np.lexsort((ids, -sims))[:10]
        want = set(ids[order])
        have = set(got[got["query_id"] == qid]["vec_id"])
        assert have == want


def test_ann_ivf_full_probe_equals_bruteforce(ray_session, sf_dir):
    """With n_probe == n_lists every list is scored, so IVF must equal the
    exact brute-force result -- pins assignment + pruning + merge."""
    from ontology_time_machine_ray.stages.similarity import ann_bruteforce, ann_ivf

    exact = ann_bruteforce(sf_dir, k=10, n_queries=3)
    full = ann_ivf(sf_dir, k=10, n_queries=3, n_lists=16, n_probe=16)
    for qid in exact["query_id"].unique():
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        f = set(full[full["query_id"] == qid]["vec_id"])
        assert f == e


def test_ann_ivf_default_probe_recall(ray_session, sf_dir):
    """At the default probe budget (8/16 lists) the query's own list is
    always probed (its centroid is the argmax), so recall >= 1/k and the
    query id itself is returned."""
    from ontology_time_machine_ray.stages.similarity import ann_bruteforce, ann_ivf

    exact = ann_bruteforce(sf_dir, k=10, n_queries=3)
    approx = ann_ivf(sf_dir, k=10, n_queries=3)
    total = hit = 0
    for qid in exact["query_id"].unique():
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        assert qid in a
        hit += len(a & e)
        total += len(e)
    assert hit / total >= 0.5, f"IVF recall {hit}/{total} below 0.5"


def test_ann_ivf_prunes_read(ray_session, sf_dir):
    """The index layout is one directory per inverted list and a probe of
    p lists reads exactly the p list files (prune at the read)."""
    import os

    from ontology_time_machine_ray.stages.similarity import build_ivf_index

    index_dir, centroids = build_ivf_index(sf_dir, n_lists=16)
    assert centroids.shape == (16, 64)
    lists = [d for d in os.listdir(index_dir) if d.startswith("list=")]
    assert len(lists) >= 2  # corpus actually split across lists
    # every vector lands in exactly one list: total rows == corpus rows
    import pyarrow.parquet as pq

    total = sum(
        pq.read_table(os.path.join(index_dir, d, "data.parquet")).num_rows
        for d in lists
    )
    assert total == pq.read_table(f"{sf_dir}/embeddings.parquet").num_rows


def test_ann_lsh_recall(ray_session, sf_dir):
    from ontology_time_machine_ray.stages.similarity import ann_bruteforce, ann_lsh

    exact = ann_bruteforce(sf_dir, k=10, n_queries=3)
    approx = ann_lsh(sf_dir, k=10, n_queries=3)
    # every approx result is a real vector id; per-query recall is nonzero
    # (each query is its own nearest neighbour and hashes to its own bucket)
    for qid in exact["query_id"].unique():
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        assert qid in a
        assert len(a & e) >= 1


def test_embed_kmeans_matches_numpy_lloyd(ray_session, sf_dir):
    """Distributed Lloyd must equal a single-process reference run with
    the same deterministic init (lowest-vec_id vectors)."""
    import pyarrow.parquet as pq

    from ontology_time_machine_ray.stages.similarity import embed_kmeans

    n_clusters, iters = 8, 3
    got = (
        embed_kmeans(sf_dir, n_clusters=n_clusters, iters=iters)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )

    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas().sort_values("vec_id")
    mat = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    c = mat[:n_clusters].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ c.T, axis=1)
        for j in range(n_clusters):
            member = mat[assign == j]
            if len(member):
                m = member.sum(axis=0) / len(member)
                c[j] = m / np.linalg.norm(m)
    want = np.argmax(mat @ c.T, axis=1)
    assert got["vec_id"].tolist() == t["vec_id"].tolist()
    assert (got["cluster"].to_numpy() == want).all()


def test_embedding_dedup_keep_collapses_components(ray_session):
    """Planted chain a~b~c plus singletons: exactly the two non-min chain
    members are dropped."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os, tempfile

    from ontology_time_machine_ray.stages import similarity

    rng = np.random.RandomState(5)
    dim = 16
    base = rng.normal(size=(6, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # ids 0,1,2 nearly identical (chain), 3..5 well separated
    vecs = [base[0], base[0] + 1e-4 * base[1], base[0] + 2e-4 * base[2],
            base[3], base[4], base[5]]
    vecs = [np.asarray(v / np.linalg.norm(v), dtype=np.float32) for v in vecs]
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "embeddings_aug.parquet")
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(range(6), pa.int64()),
                    "embedding": pa.array(
                        [v.tolist() for v in vecs], pa.list_(pa.float32(), dim)
                    ),
                }
            ),
            path,
        )
        from ontology_time_machine_ray.stages.canonicalize import connected_components
        from ontology_time_machine_ray.stages.groupagg import bucketed_join
        import ray.data as rd
        import pandas as pd_

        pairs = similarity.embedding_dup_pairs("unused", emb_path=path)
        edges = pairs.map_batches(
            lambda df: pd_.DataFrame(
                {"u": df["a"].astype("string"), "v": df["b"].astype("string")}
            ),
            batch_format="pandas",
        )
        dropped = connected_components(edges).map_batches(
            lambda df: pd_.DataFrame({"vec_id": df["node"].astype("int64")}),
            batch_format="pandas",
        )
        ids = similarity._read_emb(path).map_batches(
            lambda tt: tt.select(["vec_id"]), batch_format="pyarrow"
        )
        keep = bucketed_join(ids, dropped, on=["vec_id"], how="anti").to_pandas()
        assert sorted(keep["vec_id"]) == [0, 3, 4, 5]


def test_ivf_writes_every_list_directory(ray_session, sf_dir):
    """Every list_id with members gets its OWN directory (a hash bucket in
    the write stage can hold several list_ids -- regression test for the
    bucket-collision write bug) and the union of list files is exactly the
    corpus."""
    import os

    import pyarrow.parquet as pq

    from ontology_time_machine_ray.stages.similarity import build_ivf_index
    import numpy as np_
    import shutil

    shutil.rmtree("/tmp/otm_ivf", ignore_errors=True)
    out_dir, centroids = build_ivf_index(sf_dir, n_lists=16, iters=2)
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    mat = np_.stack(emb["embedding"].to_numpy()).astype(np_.float64)
    mat = mat / np_.linalg.norm(mat, axis=1, keepdims=True)
    assign = np_.argmax(mat @ centroids.T, axis=1)
    want_lists = sorted(set(assign.tolist()))
    have_lists = sorted(
        int(d.split("=")[1]) for d in os.listdir(out_dir) if d.startswith("list=")
    )
    assert have_lists == want_lists
    seen = []
    for lid in have_lists:
        t = pq.read_table(os.path.join(out_dir, f"list={lid:04d}", "data.parquet"))
        ids = t["vec_id"].to_pylist()
        seen.extend(ids)
        # every vector in the file truly belongs to this list
        assert all(assign[emb["vec_id"].tolist().index(i)] == lid for i in ids[:20])
    assert sorted(seen) == sorted(emb["vec_id"].tolist())


def test_ann_pq_recall_and_determinism(ray_session, sf_dir):
    """PQ ADC top-k: deterministic across runs, sane shape, and recall vs
    the exact brute force above a floor (random vectors are PQ's worst
    case -- the floor is deliberately modest; the SQL oracle pins the
    exact expected output separately)."""
    from ontology_time_machine_ray.stages.similarity import ann_bruteforce, ann_pq

    a = ann_pq(sf_dir)
    b = ann_pq(sf_dir)
    pd.testing.assert_frame_equal(a, b)
    assert list(a.columns) == ["query_id", "vec_id"]
    assert a.groupby("query_id").size().eq(10).all()
    bf = ann_bruteforce(sf_dir)
    got = set(map(tuple, a.values))
    want = set(map(tuple, bf.values))
    assert len(got & want) / len(want) >= 0.2


def test_ann_ivfpq_recall_and_determinism(ray_session, sf_dir):
    """Composed IVF-PQ: deterministic, k rows per query, recall above a
    floor, and -- the point of residual encoding -- recall at least as
    good as plain PQ at the same (m, ks) budget (Jegou et al. 2011:
    residuals concentrate the quantizer on within-list variation)."""
    from ontology_time_machine_ray.stages.similarity import (
        ann_bruteforce,
        ann_ivfpq,
        ann_pq,
    )

    a = ann_ivfpq(sf_dir)
    b = ann_ivfpq(sf_dir)
    pd.testing.assert_frame_equal(a, b)
    assert list(a.columns) == ["query_id", "vec_id"]
    assert a.groupby("query_id").size().eq(10).all()
    bf = ann_bruteforce(sf_dir)
    want = set(map(tuple, bf.values))
    got = set(map(tuple, a.values))
    recall_ivfpq = len(got & want) / len(want)
    assert recall_ivfpq >= 0.3, recall_ivfpq
    pq = set(map(tuple, ann_pq(sf_dir).values))
    recall_pq = len(pq & want) / len(want)
    assert recall_ivfpq >= recall_pq, (recall_ivfpq, recall_pq)


def test_ivfpq_residual_codebooks_shape(ray_session, sf_dir):
    """Residual codebook trainer: (m, ks, sub_d) shape, finite (empty
    codes keep the previous centroid), and NOT equal to the raw-vector
    codebooks -- it really trains on residuals."""
    import os

    import numpy as np

    from ontology_time_machine_ray.stages.similarity import (
        _emb_dim,
        _pq_codebooks,
        _pq_residual_codebooks,
        build_ivf_index,
    )

    path = os.path.join(sf_dir, "embeddings.parquet")
    dim = _emb_dim(path)
    _, centroids = build_ivf_index(sf_dir, 16)
    books = _pq_residual_codebooks(path, centroids, m=4, ks=16, iters=2)
    assert books.shape == (4, 16, dim // 4)
    assert np.isfinite(books).all()
    raw = _pq_codebooks(path, m=4, ks=16, iters=2)
    assert not np.allclose(books, raw)


def test_pq_codebooks_shape_and_empty_code_hold(ray_session, sf_dir):
    """Codebook trainer: (m, ks, sub_d) shape; a code left empty by the
    assignment keeps its previous centroid (never NaN)."""
    import os

    import numpy as np

    from ontology_time_machine_ray.stages.similarity import _emb_dim, _pq_codebooks

    path = os.path.join(sf_dir, "embeddings.parquet")
    dim = _emb_dim(path)
    books = _pq_codebooks(path, m=4, ks=16, iters=2)
    assert books.shape == (4, 16, dim // 4)
    assert np.isfinite(books).all()


def test_semantic_dedup_matches_numpy_reference(ray_session, sf_dir):
    """semantic_dedup == single-process SemDeDup: kmeans assign (the
    engine's own deterministic centroids), then drop any vector with a
    lower-id same-cluster neighbour at round(cos*1e6) >= tau."""
    import pyarrow.parquet as pq

    from ontology_time_machine_ray.fixtures import ensure_fixtures
    from ontology_time_machine_ray.stages import similarity

    got = sorted(
        similarity.semantic_dedup(sf_dir).to_pandas()["vec_id"].tolist()
    )

    emb_path = ensure_fixtures(sf_dir).embeddings_aug
    df = pq.read_table(emb_path).to_pandas().sort_values("vec_id")
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    c = similarity._kmeans_centroids(sf_dir, 16, 3, emb_path)
    cl = np.argmax(mat @ c.T, axis=1)
    ids = df["vec_id"].to_numpy()
    keep = []
    for k in np.unique(cl):
        sel = np.where(cl == k)[0]
        m = mat[sel]
        s = np.round(m @ m.T * 1e6).astype(np.int64)
        drop = np.any(np.triu(s >= 950_000, k=1), axis=0)
        keep.extend(ids[sel[~drop]].tolist())
    assert got == sorted(keep)
    # the augmented fixture plants near-dups, so something must drop
    assert len(got) < len(ids)


def test_embed_pca_power_approximates_leading_eigenvector(ray_session, tmp_path):
    """The integer power iteration converges to the true leading
    eigenvector of the (uncentered) second-moment matrix: cosine vs
    numpy's eigh direction > 0.999 on an anisotropic cloud."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ontology_time_machine_ray.stages.similarity import (
        _trunc_div,
        embed_pca_power,
    )

    rng = np.random.RandomState(7)
    d, n = 16, 400
    # dominant direction along axis 0, noise elsewhere
    x = rng.normal(0, 0.02, size=(n, d))
    x[:, 0] += rng.normal(0, 0.5, size=n)
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {"vec_id": range(n), "embedding": [row.astype("float32") for row in x]}
            )
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    out = embed_pca_power(str(tmp_path), iters=5).sort_values("j")
    v = out["v"].to_numpy(dtype="float64")
    m = (x.T @ x)
    w, vecs = np.linalg.eigh(m)
    lead = vecs[:, -1]
    cos = abs(v @ lead) / (np.linalg.norm(v) * np.linalg.norm(lead))
    assert cos > 0.999

    # truncating division matches DuckDB's // on negatives (not numpy's)
    a = np.array([-7, 7, -1, 0], dtype="int64")
    assert _trunc_div(a, 2).tolist() == [-3, 3, 0, 0]
