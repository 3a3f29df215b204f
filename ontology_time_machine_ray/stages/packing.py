"""Token-budget sequence packing: assign every document to a training
shard by global token offset, via a DISTRIBUTED PREFIX SUM.

Training-data assembly needs "concatenate the corpus in a deterministic
order, then cut it into shards of ``budget`` tokens".  The shard of a
document is ``floor(start_offset / budget)`` where ``start_offset`` is
the sum of token counts of every document before it in ``doc_id`` order.
A global running sum looks inherently sequential; the classic distributed
restatement is three cheap passes, none of which moves the corpus:

1. **count**   -- one ``map_batches`` projection to (doc_id, n_tokens).
2. **bucket sums** -- docs are range-bucketed on ``doc_id`` (ordered
   buckets, unlike the hash buckets used elsewhere: prefix order must be
   preserved), and a tiny grouped aggregate ships ONE row per bucket to
   the driver, which exclusive-cumsums them into per-bucket offsets and
   broadcasts the (num_buckets)-sized dict back with ``ray.put``.
3. **local cumsum** -- a ``grouped_apply`` on the same bucket key sorts
   each bucket by ``doc_id``, adds the bucket's offset to the local
   cumulative sum, and emits ``shard = start_offset // budget``.

Only pass 3 shuffles, and it moves exactly the (doc_id, n_tokens)
projection -- never the text.  Range-bucketing on a skewed id space would
unbalance buckets; at production scale the bucket bounds would come from
a quantile sketch over doc_id (the repo's ``sketch.quantiles_sketched``)
instead of min/max -- min/max is used here because fixture ids are dense.

No reference counterpart (the reference has no notion of shards); this is
one of the beyond-reference training-data operators the build brief asks
for.  Oracle: a single SQL window cumsum (ORDER BY doc_id), exact.
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd

# one reader + one token rule shared with the text family: shard
# boundaries here must agree with text_stats' n_tokens by construction
from ontology_time_machine_ray.stages.textops import TOKEN_RE, _read_docs
from ontology_time_machine_ray.sources.readers import sized_read_parquet


def _token_counts(df: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"].astype("int64"),
            "n_tokens": df["text"].fillna("").str.count(TOKEN_RE).astype("int64"),
        }
    )


def pack_sequences(
    sf_dir: str,
    budget: int = 2048,
    num_buckets: int = 64,
    docs_ds: rd.Dataset | None = None,
    counts_ds: rd.Dataset | None = None,
) -> rd.Dataset:
    """(doc_id, n_tokens, shard) for every document; ``shard`` is the
    index of the ``budget``-token training shard the document STARTS in
    under doc_id-ordered concatenation.  ``counts_ds`` swaps in an
    alternative (doc_id, n_tokens) source -- e.g. REAL BPE token counts
    from ``stages/bpe.py`` -- without touching the prefix-sum plan."""
    import ray

    from ontology_time_machine_ray.functions.broadcast import cached_get
    from ontology_time_machine_ray.stages.groupagg import grouped_apply

    if budget < 1:
        raise ValueError("budget must be >= 1")
    if num_buckets < 1:
        raise ValueError("num_buckets must be >= 1")

    counts = counts_ds or (docs_ds or _read_docs(sf_dir)).map_batches(
        _token_counts, batch_format="pandas"
    )
    # checkpoint the narrow (doc_id, n_tokens) projection: three passes
    # read it, and re-deriving it would re-scan the text column each time
    counts = counts.materialize()

    # pass 1: id range (one tiny row per block to the driver)
    bounds = counts.map_batches(
        lambda df: pd.DataFrame(
            {"lo": [df["doc_id"].min()], "hi": [df["doc_id"].max()]}
        )
        if len(df)
        else pd.DataFrame({"lo": pd.Series(dtype="int64"), "hi": pd.Series(dtype="int64")}),
        batch_format="pandas",
    ).to_pandas()
    if len(bounds) == 0:
        return counts.map_batches(
            lambda df: df.assign(shard=pd.Series(dtype="int64")),
            batch_format="pandas",
        )
    lo = int(bounds["lo"].min())
    hi = int(bounds["hi"].max())
    span = max(1, (hi - lo) // num_buckets + 1)

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(bucket=((df["doc_id"] - lo) // span).astype("int64"))

    bucketed = counts.map_batches(with_bucket, batch_format="pandas")

    # pass 2: per-bucket token sums, SHUFFLE-FREE -- each block emits its
    # local per-bucket partial (<= num_buckets rows), the driver merges
    bparts = bucketed.map_batches(
        lambda df: df.groupby("bucket", as_index=False)["n_tokens"].sum(),
        batch_format="pandas",
    ).to_pandas()
    bsums = (
        bparts.groupby("bucket", as_index=False)["n_tokens"].sum().sort_values("bucket")
    )
    offsets = dict(
        zip(
            bsums["bucket"].astype(int),
            (bsums["n_tokens"].cumsum() - bsums["n_tokens"]).astype(int),
        )
    )
    off_ref = ray.put(offsets)

    # pass 3: within-bucket ordered cumsum + bucket offset
    def pack_bucket(g: pd.DataFrame) -> pd.DataFrame:
        off = cached_get(off_ref)
        g = g.sort_values(["bucket", "doc_id"], kind="stable")
        out = []
        for b, grp in g.groupby("bucket", sort=True):
            n = grp["n_tokens"].to_numpy()
            start = n.cumsum() - n + off[int(b)]
            out.append(
                pd.DataFrame(
                    {
                        "doc_id": grp["doc_id"].to_numpy(),
                        "n_tokens": n,
                        "shard": (start // budget).astype("int64"),
                    }
                )
            )
        if not out:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "n_tokens": pd.Series(dtype="int64"),
                    "shard": pd.Series(dtype="int64"),
                }
            )
        return pd.concat(out, ignore_index=True)

    return grouped_apply(bucketed, ["bucket"], pack_bucket)


def global_shuffle_index(
    sf_dir: str,
    seed: str = "",
    num_buckets: int = 256,
    docs_ds: rd.Dataset | None = None,
) -> rd.Dataset:
    """(doc_id, shuffle_pos): a deterministic, reproducible global shuffle
    order for training-data assembly -- rank by ``md5(seed || doc_id)``
    with doc_id as the tie-break -- WITHOUT a global sort.

    Hash order is uniform by construction, so ordered buckets on the first
    hash byte(s) are balanced with no skew handling needed (unlike value
    ranges): per-bucket COUNTS go to the driver (``num_buckets`` rows),
    the exclusive cumsum comes back as broadcast offsets, and each bucket
    sorts only its own slice locally.  The corpus moves through exactly
    one hash-bucket exchange; at 1e12 docs a ``ds.sort`` over the hash key
    would move the same data but serialize range-boundary sampling and
    lose the deterministic tie-break.  Same three-pass shape as
    ``pack_sequences``; md5 matches DuckDB's, so the oracle is a single
    ``row_number() OVER (ORDER BY md5(...))`` window."""
    import numpy as np
    import ray

    from ontology_time_machine_ray.functions.broadcast import cached_get
    from ontology_time_machine_ray.functions.hashing import md5_hex_and_prefix
    from ontology_time_machine_ray.stages.groupagg import grouped_apply

    if not 1 <= num_buckets <= 65536:
        raise ValueError("num_buckets must be in [1, 65536]")
    # bucket = integer value of the first 4 hex chars, scaled down: keeps
    # bucket order == hash order so offsets concatenate correctly
    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        key, prefix = md5_hex_and_prefix(seed + df["doc_id"].astype("string"), 4)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "_key": key,
                "_bkt": (prefix * num_buckets // 65536).astype("int64"),
            }
        )

    keyed_ds = (docs_ds or _read_docs(sf_dir)).select_columns(["doc_id"]).map_batches(
        keyed, batch_format="pandas"
    )
    keyed_ds = keyed_ds.materialize()  # two consumers of the hashed projection

    # per-bucket counts, SHUFFLE-FREE: per-block partials, driver merge
    cparts = keyed_ds.map_batches(
        lambda df: df["_bkt"].value_counts().rename_axis("_bkt").reset_index(name="n"),
        batch_format="pandas",
    ).to_pandas()
    counts = cparts.groupby("_bkt", as_index=False)["n"].sum().sort_values("_bkt")
    offsets = dict(
        zip(counts["_bkt"].astype(int), (counts["n"].cumsum() - counts["n"]).astype(int))
    )
    off_ref = ray.put(offsets)

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        off = cached_get(off_ref)
        g = g.sort_values(["_bkt", "_key", "doc_id"], kind="stable")
        out = []
        for b, grp in g.groupby("_bkt", sort=True):
            pos = off[int(b)] + np.arange(len(grp), dtype=np.int64)
            out.append(
                pd.DataFrame({"doc_id": grp["doc_id"].to_numpy(), "shuffle_pos": pos})
            )
        if not out:
            return pd.DataFrame(
                {"doc_id": pd.Series(dtype="int64"),
                 "shuffle_pos": pd.Series(dtype="int64")}
            )
        return pd.concat(out, ignore_index=True)

    return grouped_apply(keyed_ds, ["_bkt"], rank_bucket)


def chunk_documents(
    sf_dir: str,
    window: int = 64,
    stride: int = 48,
    docs_ds: rd.Dataset | None = None,
) -> rd.Dataset:
    """Split every document into overlapping token windows (RAG / context-
    window chunking): (doc_id, chunk_idx, start_tok, n_tokens, chunk_text)
    with chunks starting every ``stride`` tokens and spanning up to
    ``window`` tokens; the final chunk is the remainder.

    Embarrassingly parallel -- one ``map_batches`` pass, no shuffle; row
    expansion is bounded by ``window/stride`` (~1.33x here), so block
    sizes stay predictable.  Chunk-text assembly is per-chunk string
    joining (inherently so); token split and chunk counting are
    vectorized.  Deterministic in the text alone -> exact SQL oracle
    (list-slice + array_to_string over the same regexp token split)."""
    if window < 1 or stride < 1 or stride > window:
        raise ValueError("need 1 <= stride <= window")

    def chunk_batch(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.findall(r"\S+")
        ids, cidx, starts, lens, texts = [], [], [], [], []
        for did, ws in zip(df["doc_id"], toks):
            n = len(ws)
            if n == 0:
                continue
            n_chunks = 1 if n <= window else 1 + -(-(n - window) // stride)
            for ci in range(n_chunks):
                s = ci * stride
                ids.append(did)
                cidx.append(ci)
                starts.append(s)
                lens.append(min(n - s, window))
                texts.append(" ".join(ws[s : s + window]))
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "chunk_idx": pd.Series(cidx, dtype="int64"),
                "start_tok": pd.Series(starts, dtype="int64"),
                "n_tokens": pd.Series(lens, dtype="int64"),
                "chunk_text": pd.Series(texts, dtype="string"),
            }
        )

    return (docs_ds or _read_docs(sf_dir)).map_batches(chunk_batch, batch_format="pandas")


#: default mixing recipe (rate in millionths of one epoch): exercises
#: drop (unlisted sources), downsample, keep, fractional upsample and
#: integer upsample in one run.
DEFAULT_MIX_E6: dict[str, int] = {
    "src0": 250_000,    # 0.25x
    "src1": 500_000,    # 0.5x
    "src2": 1_000_000,  # 1x
    "src3": 1_750_000,  # 1.75x (one full epoch + 0.75 fractional)
    "src4": 3_000_000,  # 3x (three full epochs)
}


def corpus_mix(
    sf_dir: str,
    rates_e6: dict[str, int] | None = None,
    seed: str = "mix1",
    docs_ds: rd.Dataset | None = None,
) -> rd.Dataset:
    """Weighted corpus mixing: resample each ``source`` to a target rate
    (training-mix assembly, e.g. "2 epochs of wiki, 0.3 of crawl").

    Rates are integer millionths of an epoch for cross-engine exactness.
    A rate of ``r`` emits ``floor(r / 1e6)`` full copies (``epoch`` =
    0..full-1) plus one fractional copy at ``epoch = full`` containing the
    deterministic hash-uniform subset: a doc joins iff the first 6 hex
    chars of ``md5('{seed}:{epoch}:{doc_id}')`` sort below
    ``printf('%06x', frac_e6 * 16^6 // 1e6)`` -- a plain string compare
    with identical semantics in pandas and SQL.  Sources not in the
    recipe are dropped.

    Scale shape: one ``map_batches`` pass, no shuffle; row expansion is
    bounded by the recipe's max rate, so block sizes stay predictable.
    Selection depends only on (seed, epoch, doc_id) -- adding nodes,
    re-running, or resuming cannot change the mix.
    """
    from ontology_time_machine_ray.functions.hashing import content_md5_series

    rates = dict(DEFAULT_MIX_E6 if rates_e6 is None else rates_e6)
    if any(r < 0 for r in rates.values()):
        raise ValueError("rates_e6 must be non-negative")

    def mix_batch(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for src, rate in rates.items():
            sub = df[df["source"] == src]
            if sub.empty or rate == 0:
                continue
            full, frac = divmod(rate, 1_000_000)
            for ep in range(full):
                out.append(
                    pd.DataFrame(
                        {"doc_id": sub["doc_id"].astype("int64"),
                         "source": sub["source"].astype("string"),
                         "epoch": pd.Series(ep, index=sub.index, dtype="int64")}
                    )
                )
            if frac:
                thr = format(frac * 16**6 // 10**6, "06x")
                key = content_md5_series(
                    f"{seed}:{full}:" + sub["doc_id"].astype("string")
                )
                keep = sub[key.str.slice(0, 6) < thr]
                if len(keep):
                    out.append(
                        pd.DataFrame(
                            {"doc_id": keep["doc_id"].astype("int64"),
                             "source": keep["source"].astype("string"),
                             "epoch": pd.Series(full, index=keep.index, dtype="int64")}
                        )
                    )
        if not out:
            return pd.DataFrame(
                {"doc_id": pd.Series(dtype="int64"),
                 "source": pd.Series(dtype="string"),
                 "epoch": pd.Series(dtype="int64")}
            )
        return pd.concat(out, ignore_index=True)

    import os

    if docs_ds is None:
        # prune at the read: the mix never needs the text column
        docs_ds = sized_read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "source"]
        )
    else:
        docs_ds = docs_ds.select_columns(["doc_id", "source"])
    return docs_ds.map_batches(mix_batch, batch_format="pandas")


#: upsampling cap for temperature mixing (epochs, e6): standard practice
#: bounds how often a tiny source repeats (UnifiedQA/PaLM-style caps).
MIX_T_CAP_E6 = 4_000_000


def corpus_mix_temperature(
    sf_dir: str, seed: str = "mixT", docs_ds: rd.Dataset | None = None
) -> rd.Dataset:
    """Temperature-weighted corpus mixing, T = 1/2 (the sqrt rule of
    multilingual/multi-source LM training: sampling probability
    p_s ∝ n_s^T flattens the source distribution): per-source rates are
    DERIVED from the corpus instead of hand-specified, then fed through
    the same deterministic hash-uniform resampler as ``corpus_mix``.

    rate_e6(s) = min(cap, 1e6 * N * w_s // (W * n_s)) with
    w_s = floor(sqrt(n_s)), N = total docs, W = Σ w_s -- all integer
    arithmetic except the IEEE-correctly-rounded double sqrt, which
    numpy and DuckDB compute bit-identically, so the SQL oracle
    re-derives the identical rates from the same table.

    Scale shape: the rate derivation is one combiner-style counting
    pass whose output is source-cardinality (tiny); the mix itself is
    the usual single shuffle-free expansion pass."""
    import os

    import numpy as np

    from ontology_time_machine_ray.stages.groupagg import grouped_aggregate

    if docs_ds is None:
        docs_ds = sized_read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "source"]
        )
    else:
        docs_ds = docs_ds.select_columns(["doc_id", "source"])

    def src_counts(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["source"].value_counts()
        return pd.DataFrame(
            {"source": vc.index.astype("object"), "n": vc.to_numpy("int64")}
        )

    counts = grouped_aggregate(
        docs_ds.map_batches(src_counts, batch_format="pandas"),
        ["source"],
        {"n": ("n", "sum")},
    ).to_pandas()
    if len(counts) == 0:  # empty corpus: no sources, nothing to mix
        return corpus_mix(sf_dir, rates_e6={}, seed=seed, docs_ds=docs_ds)
    counts = counts.sort_values("source")
    n = counts["n"].to_numpy(np.int64)
    w = np.floor(np.sqrt(n.astype(np.float64))).astype(np.int64)
    big_n = int(n.sum())
    big_w = int(w.sum())  # >= 1: every present source has n >= 1
    rates = {
        str(src): min(
            MIX_T_CAP_E6, 1_000_000 * big_n * int(wi) // (big_w * int(ni))
        )
        for src, wi, ni in zip(counts["source"], w, n)
    }
    return corpus_mix(sf_dir, rates_e6=rates, seed=seed, docs_ds=docs_ds)
