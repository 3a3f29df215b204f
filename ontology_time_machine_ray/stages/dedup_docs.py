"""Document-level deduplication family for training-data pipelines.

* ``dedup_exact``      -- in textops.py (md5 fingerprint groupby).
* ``jaccard_pairs``    -- EXACT n-gram Jaccard similarity join: shingle
  explode -> groupby(shingle) -> pair counts -> threshold.  Deterministic,
  SQL-checkable.
* ``minhash_clusters`` -- MinHash + LSH banding: signature per doc, band
  rows, groupby((band, band_hash)) buckets, signature-estimated Jaccard
  verify, connected components over surviving pairs (reuses the KG
  union-find).  Approximate relative to true Jaccard, but DETERMINISTIC
  given the md5-derived shingle hash -- the full chain (signatures,
  banding, verify, components) has an exact DuckDB oracle in
  sql_oracles.py, plus a recall pytest against exact Jaccard.
* ``simhash_pairs``    -- 64-bit SimHash with 4-segment blocking (hamming
  <= 3 candidates must agree on >= 1 of 4 16-bit segments).  Same story:
  md5-derived token hash makes the bit votes SQL-replayable exactly.

Scale notes: every stage is a ``map_batches``/``groupby`` composition; the
only all-to-all exchanges are on (shingle), (band, band_hash) and (simhash
segment) keys.  Hot shingles (stopword-ish n-grams) are dropped by a
document-frequency cap BEFORE the pair explosion -- the skew guard that
keeps a common shingle from producing O(n^2) pairs on one reducer.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import ray.data as rd

from ontology_time_machine_ray.functions.hashing import md5_hash64_series
from ontology_time_machine_ray.sources.readers import sized_read_parquet

#: document-frequency cap for shingle-based pair generation (skew guard).
MAX_SHINGLE_DF = 50

_MERSENNE = (1 << 61) - 1


def _shingles(text: str, n: int = 3) -> list[str]:
    toks = text.lower().split()
    if len(toks) < n:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def _shingle_explode(texts: pd.Series, n: int = 3):
    """Vectorized ``_shingles`` over a whole batch: returns
    ``(doc_pos ndarray, shingle Series)`` with one row per shingle
    OCCURRENCE (duplicates within a doc kept; callers dedup when set
    semantics matter).

    Semantics match ``_shingles`` exactly -- lowercase, whitespace
    (``\\S+``) tokens, full n-grams for docs with >= n tokens, ONE
    whole-text shingle for docs with 1..n-1 tokens, nothing for empty
    docs -- via the same explode + shifted-slice concat + doc-boundary
    mask pattern as ``textops.ngram_rows`` (the round-2 verdict's fix for
    the per-row Python loop both Jaccard and MinHash were paying)."""
    toks = texts.astype("string").fillna("").str.lower().str.findall(r"\S+")
    lengths = toks.str.len().to_numpy()
    out_doc: list[np.ndarray] = []
    out_sh: list[np.ndarray] = []
    total = int(lengths.sum())
    if total >= n:
        doc_idx = np.repeat(np.arange(len(texts)), lengths)
        flat = pd.Series(toks.explode().dropna().to_numpy(), dtype="string")
        m = total - n + 1
        parts = [flat.iloc[i : m + i].reset_index(drop=True) for i in range(n)]
        grams = parts[0].str.cat(parts[1:], sep=" ") if n > 1 else parts[0]
        ok = doc_idx[:m] == doc_idx[n - 1 :]
        out_doc.append(doc_idx[:m][ok])
        out_sh.append(grams[ok].to_numpy())
    short = (lengths >= 1) & (lengths < n)
    if short.any():
        out_doc.append(np.nonzero(short)[0])
        out_sh.append(toks[short].str.join(" ").to_numpy())
    if not out_doc:
        return np.array([], dtype=np.int64), pd.Series([], dtype="string")
    return (
        np.concatenate(out_doc).astype(np.int64),
        pd.Series(np.concatenate(out_sh), dtype="string"),
    )


def _read_docs(sf_dir: str) -> rd.Dataset:
    return sized_read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])


# --------------------------------------------------------------------- #
# exact n-gram Jaccard                                                   #
# --------------------------------------------------------------------- #
def _shingle_rows(df: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, shingle, size) rows; ``size`` is the doc's distinct-shingle
    count, attached at emission so downstream pair rows carry both docs'
    sizes through the shuffle -- no driver-side size lookup ever exists."""
    doc_pos, shingles = _shingle_explode(df["text"], 3)
    res = pd.DataFrame(
        {
            "doc_id": df["doc_id"].to_numpy()[doc_pos],
            "shingle": shingles.to_numpy(),
        }
    ).drop_duplicates()
    if len(res) == 0:
        res["size"] = pd.Series(dtype="int64")
        return res
    res["size"] = res.groupby("doc_id")["shingle"].transform("size").astype("int64")
    return res


def jaccard_pairs(sf_dir: str, threshold: float = 0.8, docs_ds: rd.Dataset | None = None) -> rd.Dataset:
    """All document pairs with n-gram Jaccard >= threshold, as a Dataset of
    (a, b, inter, union_size).

    inter(a,b) via groupby(shingle) pair expansion (df-capped, the skew
    guard); per-doc sizes ride the shingle rows, so union_size is computed
    inside the (a, b) aggregation with no driver-side state.  Jaccard is
    thresholded on exact integers to avoid float boundary flakiness:
    inter / (|a|+|b|-inter) >= t  <=>  inter * 100 >= t*100 *
    (|a|+|b|-inter) with t in hundredths.
    """
    from ontology_time_machine_ray.stages.groupagg import grouped_aggregate, grouped_apply

    t100 = int(round(threshold * 100))
    shingle_ds = (docs_ds or _read_docs(sf_dir)).map_batches(
        _shingle_rows, batch_format="pandas"
    )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # keep only shingles with 2..MAX_SHINGLE_DF docs (df cap: skew
        # guard), then expand pairs per qualifying shingle
        df_counts = g["shingle"].value_counts()
        keep = df_counts[(df_counts >= 2) & (df_counts <= MAX_SHINGLE_DF)].index
        g = g[g["shingle"].isin(keep)]
        out_a, out_b, out_sa, out_sb = [], [], [], []
        for _, grp in g.groupby("shingle", sort=False):
            order = np.argsort(grp["doc_id"].to_numpy())
            ids = grp["doc_id"].to_numpy()[order]
            szs = grp["size"].to_numpy()[order]
            ii, jj = np.triu_indices(len(ids), k=1)
            out_a.append(ids[ii])
            out_b.append(ids[jj])
            out_sa.append(szs[ii])
            out_sb.append(szs[jj])
        if not out_a:
            return pd.DataFrame(
                {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
                 "size_a": pd.Series(dtype="int64"), "size_b": pd.Series(dtype="int64")}
            )
        return pd.DataFrame(
            {"a": np.concatenate(out_a), "b": np.concatenate(out_b),
             "size_a": np.concatenate(out_sa), "size_b": np.concatenate(out_sb)}
        )

    pair_rows = grouped_apply(shingle_ds, ["shingle"], pairs_in_bucket)
    inter = grouped_aggregate(
        pair_rows,
        ["a", "b"],
        {"inter": ("a", "size"), "size_a": ("size_a", "first"), "size_b": ("size_b", "first")},
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
                 "inter": pd.Series(dtype="int64"), "union_size": pd.Series(dtype="int64")}
            )
        union_size = (df["size_a"] + df["size_b"] - df["inter"]).astype("int64")
        out = df.assign(union_size=union_size)[["a", "b", "inter", "union_size"]]
        return out[out["inter"] * 100 >= t100 * out["union_size"]]

    return inter.map_batches(finish, batch_format="pandas")


# --------------------------------------------------------------------- #
# MinHash + LSH                                                          #
# --------------------------------------------------------------------- #
class MinHasher:
    """Stateful batch stage: the permutation coefficients are built once
    per actor from a fixed seed (deterministic across the pool).

    The whole batch's shingles are hashed in ONE vectorized pass and the
    per-document minima come from ``np.minimum.reduceat`` over the
    flattened shingle-hash array -- no per-document pandas overhead."""

    def __init__(self, num_perm: int = 64, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64)
        self.num_perm = num_perm

    def signature(self, text: str) -> np.ndarray:
        out = self._signatures([text])
        return out[0]

    def _signatures(self, texts: list[str]) -> np.ndarray:
        # vectorized shingle explode; duplicate shingles within a doc are
        # harmless (min over duplicated hashes == min over the set)
        doc_pos, shingles = _shingle_explode(pd.Series(texts, dtype="object"), 3)
        n_docs = len(texts)
        sigs = np.full((n_docs, self.num_perm), _MERSENNE, dtype=np.int64)
        if len(shingles) == 0:
            return sigs  # all docs empty -> sentinel signature
        # md5-derived shingle hash (not the faster pandas hash): the whole
        # signature pipeline stays exactly replayable in DuckDB, which is
        # what upgrades dedup_minhash from a rows-only to a full oracle
        x_all = (md5_hash64_series(shingles) >> np.uint64(3)).astype(np.int64)
        # reduceat needs contiguous per-doc segments: stable-sort by doc
        order = np.argsort(doc_pos, kind="stable")
        x = x_all[order]
        counts = np.bincount(doc_pos, minlength=n_docs)
        nonempty = counts > 0
        offsets = np.concatenate([[0], np.cumsum(counts[nonempty])[:-1]])
        for i in range(self.num_perm):
            vals = (self.a[i] * x + self.b[i]) % _MERSENNE
            sigs[nonempty, i] = np.minimum.reduceat(vals, offsets)
        return sigs

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sigs = self._signatures(list(df["text"].fillna("")))
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(), "sig": list(sigs)})


_MIX = np.uint64(0x9E3779B97F4A7C15)


def _band_rows(df: pd.DataFrame, bands: int, rows_per_band: int) -> pd.DataFrame:
    """One (band, band_hash) row per doc per band, fully vectorized: the
    band hash is a multiply-xor fold of the band's signature segment
    (deterministic numpy integer ops, stable across processes)."""
    n = len(df)
    if n == 0:
        # mirror the non-empty block dtypes (doc_id keeps the INPUT dtype,
        # sig stays object-of-arrays) or the downstream shuffle's Arrow
        # schema unification crashes on the mixed blocks
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "band": pd.Series(dtype="int64"),
             "band_hash": pd.Series(dtype="int64"),
             "sig": pd.Series(dtype="object")}
        )
    sig_mat = np.stack(df["sig"].to_numpy()).astype(np.uint64)  # (n, num_perm)
    segs = sig_mat.reshape(n, bands, rows_per_band)
    h = np.zeros((n, bands), dtype=np.uint64)
    with np.errstate(over="ignore"):  # uint64 wraparound is the hash
        for r in range(rows_per_band):
            h = (h ^ (segs[:, :, r] + np.uint64(r) * _MIX)) * _MIX
    band_hash = (h >> np.uint64(2)).astype(np.int64)
    sig_list = list(sig_mat.astype(np.int64))
    return pd.DataFrame(
        {
            "doc_id": np.repeat(df["doc_id"].to_numpy(), bands),
            "band": np.tile(np.arange(bands, dtype=np.int64), n),
            "band_hash": band_hash.ravel(),
            "sig": [sig_list[i] for i in range(n) for _ in range(bands)],
        }
    )


#: per-process MinHasher cache for the task-based signature stage: the
#: coefficients are deterministic in (num_perm, seed), so stateless tasks
#: rebuild them once per worker, not once per batch, and the stage scales
#: with the executor instead of a fixed actor-pool size.
_HASHER_CACHE: dict[tuple[int, int], "MinHasher"] = {}


def _minhash_batch(df: pd.DataFrame, num_perm: int, seed: int = 42) -> pd.DataFrame:
    key = (num_perm, seed)
    hasher = _HASHER_CACHE.get(key)
    if hasher is None:
        hasher = _HASHER_CACHE[key] = MinHasher(num_perm=num_perm, seed=seed)
    return hasher(df)


def minhash_clusters(
    sf_dir: str,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    docs_ds: rd.Dataset | None = None,
    broadcast_limit: int | None = None,
) -> rd.Dataset:
    """(doc_id, cluster) for every document; near-dups share a cluster.

    shingle -> minhash -> band -> bucket groupby -> verify (signature
    agreement >= threshold) -> connected components (alternating-star, the
    same distributed union-find as KG canonicalization).  Cluster labels
    are applied with the broadcast-mapping rewrite (``ray.put`` once,
    per-worker cached lookup inside ``map_batches``) while the mapping
    fits a worker; above ``broadcast_limit`` nodes it degrades to ONE
    doc_id-bucketed left join (the canonicalize_with_mapping pattern) --
    at web scale 30-50%% of docs carry a near-dup edge, so the mapping is
    corpus-proportional, not "small".
    """
    from ontology_time_machine_ray.stages.canonicalize import connected_components

    rows_per_band = num_perm // bands
    # the signature-agreement Jaccard estimator has std = sqrt(J(1-J)/k);
    # verify with a 2-sigma one-sided margin at J=threshold so true
    # near-dups at the threshold are kept (t=0.8, k=64 -> margin 0.1,
    # verify at 0.7).  NOT the loose 2/sqrt(k) bound (0.25), which let
    # ~0.6-Jaccard non-duplicates chain into clusters and get deleted by
    # the curation funnel.
    verify_threshold = max(
        0.0, threshold - 2.0 * (threshold * (1.0 - threshold) / num_perm) ** 0.5
    )
    docs = docs_ds or _read_docs(sf_dir)
    sigs = docs.map_batches(
        lambda df: _minhash_batch(df, num_perm), batch_format="pandas"
    )
    band_ds = sigs.map_batches(
        lambda df: _band_rows(df, bands, rows_per_band), batch_format="pandas"
    )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # only (band, band_hash) groups with a collision can yield pairs
        g = g[g.duplicated(["band", "band_hash"], keep=False)]
        out_u, out_v = [], []
        for _, grp in g.groupby(["band", "band_hash"], sort=False):
            if len(grp) > 200:  # bucket cap: hub guard
                continue
            grp = grp.sort_values("doc_id")
            ids = grp["doc_id"].to_numpy()
            sig_mat = np.stack(grp["sig"].to_numpy())
            # all-pairs signature agreement in one broadcasted comparison
            # (k <= 200, num_perm-wide: k*k*num_perm bools, < 3 MB) -- no
            # per-row Python in the verify, only the upper triangle kept
            k = len(ids)
            ii, jj = np.triu_indices(k, k=1)
            agree = (sig_mat[ii] == sig_mat[jj]).mean(axis=1)
            hit = agree >= verify_threshold
            out_u.append(ids[ii[hit]].astype(str))
            out_v.append(ids[jj[hit]].astype(str))
        if not out_u:
            return pd.DataFrame(
                {"u": pd.Series(dtype="string"), "v": pd.Series(dtype="string")}
            )
        return pd.DataFrame(
            {
                "u": pd.Series(np.concatenate(out_u), dtype="string"),
                "v": pd.Series(np.concatenate(out_v), dtype="string"),
            }
        )

    from ontology_time_machine_ray.stages.groupagg import grouped_apply

    pairs = grouped_apply(band_ds, ["band", "band_hash"], pairs_in_bucket)
    comp_ds = connected_components(pairs).materialize()
    return _label_clusters(docs, comp_ds, broadcast_limit)


def _label_clusters(
    docs: rd.Dataset, comp_ds: rd.Dataset, broadcast_limit: int | None = None
) -> rd.Dataset:
    """Rewrite (doc_id) -> (doc_id, cluster) through a (node, component)
    mapping Dataset; unmapped docs are their own singleton cluster.

    Mapping <= ``broadcast_limit`` nodes: ``ray.put`` once, per-worker
    cached dict lookup inside ``map_batches`` (one corpus pass, no
    shuffle).  Above the limit it degrades to ONE doc_id-bucketed left
    join -- the same limit+fallback discipline as
    ``canonicalize.canonicalize_with_mapping`` (near-dup mappings are
    corpus-proportional at web scale, so an unconditional driver
    ``to_pandas`` + broadcast would not survive 100 TB)."""
    import ray

    from ontology_time_machine_ray.functions.broadcast import cached_get
    from ontology_time_machine_ray.stages.canonicalize import MAX_BROADCAST_NODES

    if broadcast_limit is None:
        broadcast_limit = MAX_BROADCAST_NODES
    ids = docs.select_columns(["doc_id"])
    n_nodes = comp_ds.count()
    if n_nodes <= broadcast_limit:
        comp = comp_ds.to_pandas()
        mapping_ref = ray.put(dict(zip(comp["node"], comp["component"])))

        def label(df: pd.DataFrame) -> pd.DataFrame:
            m = cached_get(mapping_ref)
            s = df["doc_id"].astype(str)
            # C-level dict lookup (Series.map with a dict), not a per-row
            # Python closure -- this pass runs over the WHOLE corpus
            return pd.DataFrame({"doc_id": df["doc_id"], "cluster": s.map(m).fillna(s)})

        return ids.map_batches(label, batch_format="pandas")

    # partitioned fallback: both sides stay distributed; one hash-bucket
    # exchange on the stringified doc_id
    from ontology_time_machine_ray.stages.groupagg import bucketed_join, np_dtype_map

    id_dtype = np_dtype_map(ids.schema())["doc_id"]

    def add_key(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": df["doc_id"], "_k": df["doc_id"].astype(str)})

    left = ids.map_batches(add_key, batch_format="pandas")
    mapped = comp_ds.map_batches(
        lambda df: df.rename(columns={"node": "_k", "component": "_comp"}),
        batch_format="pandas",
    )
    joined = bucketed_join(
        left,
        mapped,
        on=["_k"],
        how="left",
        left_schema={"doc_id": id_dtype, "_k": "object"},
        right_schema={"_k": "object", "_comp": "object"},
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "cluster": df["_comp"].fillna(df["_k"])}
        )

    return joined.map_batches(finish, batch_format="pandas")


# --------------------------------------------------------------------- #
# SimHash                                                                #
# --------------------------------------------------------------------- #
def _simhash_batch(df: pd.DataFrame) -> pd.DataFrame:
    """64-bit SimHash per document, vectorized across the whole batch:
    one explode to (doc, token) rows, one bulk token hash, one bit unpack,
    and one ``np.add.reduceat`` over the sorted group starts for the
    per-document bit votes -- no per-document Python loop."""
    n_docs = len(df)
    sims = np.zeros(n_docs, dtype=np.uint64)
    if n_docs == 0:
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(), "simhash": sims})

    toks = df["text"].fillna("").str.lower().str.split().reset_index(drop=True)
    ex = toks.explode().dropna()
    if len(ex):
        # unique tokens per doc (the set() in the scalar formulation);
        # explode preserves doc order, so d stays sorted after the dedup
        pairs = pd.DataFrame({"d": ex.index.to_numpy(), "t": ex.to_numpy()})
        pairs = pairs.drop_duplicates(["d", "t"])
        d = pairs["d"].to_numpy()
        h = md5_hash64_series(pairs["t"])  # SQL-replayable token hash
        # (n_tokens, 64) bit matrix; little-endian byte+bit order makes
        # column i exactly bit i of the hash
        bits = np.unpackbits(h[:, None].view(np.uint8), axis=1, bitorder="little")
        # votes[d,i] = sum(2*bit - 1) > 0  <=>  2 * bitsum[d,i] > n_tokens[d]
        # d is sorted+contiguous, so per-doc sums come from one reduceat
        # over the group starts -- output-sized memory, unlike a full
        # (n_tokens x 64) cumsum matrix (4x int32 peak blowup)
        uniq, starts, counts = np.unique(d, return_index=True, return_counts=True)
        bitsum = np.add.reduceat(bits, starts, axis=0, dtype=np.int32)
        bitset = (2 * bitsum > counts[:, None]).astype(np.uint8)
        sims[uniq] = np.packbits(bitset, axis=1, bitorder="little").view(np.uint64).ravel()
        # all-zero-token docs keep simhash 0 (no votes -> no positive bits)
    return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(), "simhash": sims})


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (bit-unpack + row sum)."""
    return np.unpackbits(x.astype(np.uint64)[:, None].view(np.uint8), axis=1).sum(axis=1)


def simhash_pairs(sf_dir: str, max_hamming: int = 3, docs_ds: rd.Dataset | None = None) -> rd.Dataset:
    """Candidate near-dup pairs with hamming(simhash) <= max_hamming,
    found via 4-segment blocking (pigeonhole: <=3 differing bits must
    leave one 16-bit segment identical)."""
    docs = docs_ds or _read_docs(sf_dir)
    hashed = docs.map_batches(_simhash_batch, batch_format="pandas")

    def seg_rows(df: pd.DataFrame) -> pd.DataFrame:
        sims = df["simhash"].to_numpy(dtype=np.uint64)
        # seg_val must be doc-major to align with the repeat/tile layout of
        # doc_id/seg: stack(axis=1).ravel() interleaves per doc
        seg_val = (
            np.stack(
                [(sims >> np.uint64(16 * s)) & np.uint64(0xFFFF) for s in range(4)],
                axis=1,
            ).ravel()
            if len(df)
            else np.array([], dtype=np.uint64)
        )
        return pd.DataFrame(
            {
                "doc_id": np.repeat(df["doc_id"].to_numpy(), 4),
                "seg": np.tile(np.arange(4), len(df)),
                "seg_val": seg_val,
                "simhash": np.repeat(sims, 4),
            }
        )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g.duplicated(["seg", "seg_val"], keep=False)]
        out_a, out_b, out_h = [], [], []
        for _, grp in g.groupby(["seg", "seg_val"], sort=False):
            if len(grp) > 200:
                continue
            grp = grp.sort_values("doc_id").drop_duplicates("doc_id")
            ids = grp["doc_id"].to_numpy()
            sims = grp["simhash"].to_numpy(dtype=np.uint64)
            # all-pairs hamming in one vectorized pass over the upper
            # triangle (k <= 200) -- no per-row Python in the verify
            ii, jj = np.triu_indices(len(ids), k=1)
            ham = _popcount64(sims[ii] ^ sims[jj])
            hit = ham <= max_hamming
            out_a.append(ids[ii[hit]].astype(np.int64))
            out_b.append(ids[jj[hit]].astype(np.int64))
            out_h.append(ham[hit].astype(np.int64))
        if not out_a:
            return pd.DataFrame(
                {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
                 "hamming": pd.Series(dtype="int64")}
            )
        return pd.DataFrame(
            {"a": np.concatenate(out_a), "b": np.concatenate(out_b),
             "hamming": np.concatenate(out_h)}
        )

    from ontology_time_machine_ray.stages.groupagg import grouped_apply, grouped_head1

    pairs = grouped_apply(
        hashed.map_batches(seg_rows, batch_format="pandas"), ["seg", "seg_val"], pairs_in_bucket
    )
    # a pair can collide in several segments: distributed (a, b) dedup
    return grouped_head1(pairs, keys=["a", "b"], order_by=["hamming"])


def quality_dedup_keep(
    sf_dir: str,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
):
    """Quality-aware near-dup pruning (the FineWeb/CCNet curation step):
    within each MinHash near-dup cluster keep ONLY the highest-quality
    document (quality DESC, then smallest doc_id) -- singleton clusters
    keep their doc, so the output is exactly the curated corpus.

    Composition, not new machinery: ``minhash_clusters`` supplies
    (doc_id, cluster) and ``textops.quality_score`` supplies
    (doc_id, quality); ONE doc_id-bucketed join co-locates them (schema-
    hinted: both sides are lazy chains) and ONE cluster-bucketed
    vectorized argmax picks the winners.  Output: (doc_id, cluster,
    quality) of kept docs."""
    from ontology_time_machine_ray.stages.groupagg import bucketed_join, grouped_apply
    from ontology_time_machine_ray.stages.textops import quality_score

    clusters = minhash_clusters(sf_dir, threshold, num_perm, bands)
    quality = quality_score(sf_dir)
    j = bucketed_join(
        clusters,
        quality,
        on=["doc_id"],
        left_schema={"doc_id": "int64", "cluster": "object"},
        right_schema={"doc_id": "int64", "quality": "int64"},
    )

    def keep_best(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["cluster", "quality", "doc_id"],
            ascending=[True, False, True],
            kind="stable",
        )
        return g.drop_duplicates("cluster")[["doc_id", "cluster", "quality"]]

    return grouped_apply(j, ["cluster"], keep_best)


def corpus_curate(sf_dir: str) -> "rd.Dataset":
    """End-to-end model-aware curation -- the full FineWeb-style funnel
    as ONE composition of existing stages: a document survives iff

      1. the hashed linear classifier accepts it (clf_score >= 0),
      2. its heuristic quality score clears the floor (quality >= 2),
      3. it is the quality-keeper of its MinHash near-dup cluster
         (quality DESC, doc_id ASC -- singletons keep themselves).

    Scale shape inherited from the parts: the classifier adds one
    shuffle-free streaming pass; the near-dup keeper is the existing
    doc_id-bucketed join + cluster-bucketed argmax; the conjunction is
    ONE more doc_id-bucketed join (schema-hinted; nothing broadcasts).
    Output: (doc_id, cluster, quality, clf_score) of surviving docs."""
    from ontology_time_machine_ray.stages.groupagg import bucketed_join
    from ontology_time_machine_ray.stages.textops import classifier_filter

    keepers = quality_dedup_keep(sf_dir)
    clf = classifier_filter(sf_dir).map_batches(
        lambda df: df.loc[df["keep"] == 1, ["doc_id", "clf_score"]],
        batch_format="pandas",
    )
    j = bucketed_join(
        keepers,
        clf,
        on=["doc_id"],
        left_schema={"doc_id": "int64", "cluster": "object", "quality": "int64"},
        right_schema={"doc_id": "int64", "clf_score": "int64"},
    )
    return j.map_batches(
        lambda df: df.loc[
            df["quality"] >= 2, ["doc_id", "cluster", "quality", "clf_score"]
        ],
        batch_format="pandas",
    )
