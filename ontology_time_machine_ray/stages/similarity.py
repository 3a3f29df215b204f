"""Similarity search over the embeddings table (``list<float>`` column).

* ``ann_bruteforce`` -- exact top-k cosine: per-batch numpy matmul against
  a BROADCAST query matrix (``ray.put`` once, fetched per actor), partial
  top-k per batch, final k-way merge of the tiny partials on the driver.
  The scalable baseline: one pass over the corpus, no shuffle.
* ``ann_lsh`` -- random-hyperplane LSH: bucket by sign pattern, search
  only the query's bucket(s).  Approximate; recall measured in pytest
  against the brute-force baseline.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def _read_emb(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])


def default_queries(sf_dir: str, n: int = 3) -> pd.DataFrame:
    """Deterministic query set: the first ``n`` vectors by vec_id."""
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet")).to_pandas()
    return t.nsmallest(n, "vec_id").reset_index(drop=True)


class _BruteForceScorer:
    """Actor stage: normalized query matrix fetched once per actor."""

    def __init__(self, queries_ref, k: int):
        q = ray.get(queries_ref)
        self.qids = q["vec_id"].to_numpy()
        qm = np.stack(q["embedding"].to_numpy()).astype(np.float64)
        self.qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
        self.k = k

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        sims = mat @ self.qm.T  # (batch, n_queries)
        ids = df["vec_id"].to_numpy()
        out_q, out_v, out_s = [], [], []
        k = min(self.k, len(ids))
        for qi, qid in enumerate(self.qids):
            col = sims[:, qi]
            top = np.argpartition(-col, k - 1)[:k] if len(col) > k else np.arange(len(col))
            for t in top:
                out_q.append(qid)
                out_v.append(ids[t])
                out_s.append(col[t])
        return pd.DataFrame({"query_id": out_q, "vec_id": out_v, "sim": out_s})


def ann_bruteforce(sf_dir: str, k: int = 10, n_queries: int = 3) -> pd.DataFrame:
    """Exact top-k cosine neighbours per query: (query_id, vec_id) rows.

    Per-batch partial top-k bounds the driver-side merge to
    (num_blocks x k x n_queries) rows regardless of corpus size.
    """
    queries_ref = ray.put(default_queries(sf_dir, n_queries))
    partials = (
        _read_emb(sf_dir)
        .map_batches(
            _BruteForceScorer,
            fn_constructor_args=(queries_ref, k),
            batch_format="pandas",
            concurrency=2,
        )
        .to_pandas()
    )
    # final merge: exact top-k per query with (sim desc, vec_id asc) tie-break
    partials = partials.sort_values(
        ["query_id", "sim", "vec_id"], ascending=[True, False, True], kind="stable"
    )
    top = partials.groupby("query_id", sort=True).head(k)
    return top[["query_id", "vec_id"]].reset_index(drop=True)


class _LshBucketer:
    def __init__(self, planes_ref):
        self.planes = ray.get(planes_ref)  # (n_planes, dim) float64

    def bucket_of(self, mat: np.ndarray) -> np.ndarray:
        signs = (mat @ self.planes.T) > 0
        return (signs @ (1 << np.arange(signs.shape[1]))).astype(np.int64)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        return pd.DataFrame(
            {"vec_id": df["vec_id"].to_numpy(), "bucket": self.bucket_of(mat),
             "embedding": df["embedding"].to_numpy()}
        )


def ann_lsh(sf_dir: str, k: int = 10, n_queries: int = 3, n_planes: int = 6, seed: int = 7) -> pd.DataFrame:
    """Approximate top-k: random-hyperplane buckets; each query searches
    only its own bucket.  The scale path -- the exhaustive scan shrinks to
    ~corpus/2^n_planes per query."""
    rng = np.random.RandomState(seed)
    # dim probed from the query set (cheap driver-side peek)
    q = default_queries(sf_dir, n_queries)
    dim = len(q["embedding"].iloc[0])
    planes = rng.normal(size=(n_planes, dim))
    planes_ref = ray.put(planes)

    bucketed = _read_emb(sf_dir).map_batches(
        _LshBucketer, fn_constructor_args=(planes_ref,), batch_format="pandas", concurrency=2
    )
    qm = np.stack(q["embedding"].to_numpy()).astype(np.float64)
    q_buckets = ((qm @ planes.T) > 0) @ (1 << np.arange(n_planes))
    wanted = set(int(b) for b in q_buckets)
    in_buckets = bucketed.map_batches(
        lambda df: df[df["bucket"].isin(wanted)], batch_format="pandas"
    ).to_pandas()

    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    out = []
    for qi, (qid, qb) in enumerate(zip(q["vec_id"], q_buckets)):
        cand = in_buckets[in_buckets["bucket"] == int(qb)]
        if len(cand) == 0:
            continue
        mat = np.stack(cand["embedding"].to_numpy()).astype(np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        sims = mat @ qn[qi]
        order = np.lexsort((cand["vec_id"].to_numpy(), -sims))[:k]
        for t in order:
            out.append((qid, int(cand["vec_id"].iloc[t])))
    return pd.DataFrame(out, columns=["query_id", "vec_id"])


def embedding_dup_pairs(sf_dir: str, threshold_e6: int = 990_000) -> pd.DataFrame:
    """Embedding-cosine near-dup pairs: all (a, b) with cosine >= theta.

    Brute force within blocks against the broadcast full matrix (the
    corpus is the query set).  Threshold in millionths compared on
    integers after a fixed rounding, for cross-engine determinism.
    """
    full = default_queries(sf_dir, n=1 << 62)  # all vectors, sorted by vec_id
    ids = full["vec_id"].to_numpy()
    mat = np.stack(full["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    full_ref = ray.put((ids, mat))

    class Scorer:
        def __init__(self):
            self.ids, self.mat = ray.get(full_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            bmat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
            bmat = bmat / np.maximum(np.linalg.norm(bmat, axis=1, keepdims=True), 1e-30)
            bids = df["vec_id"].to_numpy()
            sims = bmat @ self.mat.T
            sims_e6 = np.round(sims * 1e6).astype(np.int64)
            ai, bj = np.nonzero(sims_e6 >= threshold_e6)
            keep = bids[ai] < self.ids[bj]  # each unordered pair once
            return pd.DataFrame(
                {"a": bids[ai][keep], "b": self.ids[bj][keep],
                 "sim_e6": sims_e6[ai, bj][keep]}
            )

    out = (
        _read_emb(sf_dir)
        .map_batches(Scorer, batch_format="pandas", concurrency=2)
        .to_pandas()
    )
    if len(out) == 0:  # no near-dups: typed empty frame
        return pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
             "sim_e6": pd.Series(dtype="int64")}
        )
    return out.sort_values(["a", "b"]).reset_index(drop=True)
