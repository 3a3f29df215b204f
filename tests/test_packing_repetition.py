"""Repetition filter, decontamination and sequence packing vs naive
per-document Python oracles, including the edge cases the fixture corpus
does not exercise (skewed sparse ids, empty/one-token docs, repeated
text, boundary-exact shards)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ontology_time_machine_ray.stages import textops
from ontology_time_machine_ray.stages.packing import pack_sequences


def _write_docs(tmp_path, rows):
    df = pd.DataFrame(rows)
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "documents.parquet"))
    return str(tmp_path)


DOCS = [
    {"doc_id": 0, "text": "a b a b a b a b"},           # one dominant bigram
    {"doc_id": 3, "text": "x"},                          # no bigrams
    {"doc_id": 7, "text": ""},                           # empty
    {"doc_id": 97, "text": "alpha beta gamma delta epsilon zeta"},  # benchmark
    # long all-distinct-bigram doc: top bigram is 1 of 19 (<8%), not flagged
    {"doc_id": 150, "text": " ".join(f"w{i}" for i in range(20))},
    {"doc_id": 194, "text": "omega psi chi phi"},        # benchmark
    {"doc_id": 205, "text": "beta gamma delta epsilon trailing stuff"},  # contaminated
    {"doc_id": 9000000, "text": "alpha beta gamma delta epsilon zeta"},  # dup of bench text
]


def _naive_bigram_stats(text: str):
    w = text.split()
    bg = [w[i] + " " + w[i + 1] for i in range(len(w) - 1)]
    n = len(bg)
    dup = n - len(set(bg))
    top = max(pd.Series(bg).value_counts()) if bg else 0
    flag = int(dup * 100 > textops.REP_DUP_PCT * n or top * 100 > textops.REP_TOP_PCT * n)
    return n, dup, int(top), flag


def test_text_repetition_vs_naive(ray_session, tmp_path):
    sf = _write_docs(tmp_path, DOCS)
    got = textops.text_repetition(sf).to_pandas().set_index("doc_id").sort_index()
    for d in DOCS:
        n, dup, top, flag = _naive_bigram_stats(d["text"])
        row = got.loc[d["doc_id"]]
        assert (row["n_bigrams"], row["n_dup_bigrams"], row["top_bigram_count"], row["repetitive"]) == (
            n, dup, top, flag
        ), d
    # the dominant-bigram doc must be flagged, the plain one must not
    assert got.loc[0, "repetitive"] == 1
    assert got.loc[150, "repetitive"] == 0


def test_ngram_rows_never_cross_documents():
    df = pd.DataFrame({"doc_id": [1, 2], "text": ["a b c", "c d e"]})
    _, grams = textops.ngram_rows(df, 3)
    assert grams.tolist() == ["a b c", "c d e"]  # no "b c c" / "c c d"


def test_decontaminate_vs_naive(ray_session, tmp_path):
    sf = _write_docs(tmp_path, DOCS)
    got = textops.decontaminate(sf).to_pandas().set_index("doc_id").sort_index()
    # naive: benchmark 4-gram set from doc_id % 97 == 0 docs
    bench, corpus = {}, {}
    for d in DOCS:
        w = d["text"].split()
        grams = {" ".join(w[i : i + 4]) for i in range(len(w) - 3)}
        (bench if d["doc_id"] % 97 == 0 else corpus)[d["doc_id"]] = grams
    bset = set().union(*bench.values())
    expected = {did: len(g & bset) for did, g in corpus.items() if g & bset}
    assert dict(zip(got.index, got["n_hits"])) == expected
    # the planted overlap and the full-copy doc are both caught
    assert 205 in expected and 9000000 in expected


def test_pack_sequences_vs_window_cumsum(ray_session, tmp_path):
    # sparse, skewed ids across several range buckets; boundary-exact doc
    rows = [
        {"doc_id": i, "text": " ".join(["tok"] * n)}
        for i, n in [(0, 5), (1, 2043), (2, 1), (50, 2048), (51, 7),
                     (100000, 10), (100001, 2038), (5_000_000, 3)]
    ]
    sf = _write_docs(tmp_path, rows)
    got = (
        pack_sequences(sf, budget=2048, num_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    naive = pd.DataFrame(
        {"doc_id": [r["doc_id"] for r in rows],
         "n_tokens": [len(r["text"].split()) for r in rows]}
    ).sort_values("doc_id")
    start = naive["n_tokens"].cumsum() - naive["n_tokens"]
    naive["shard"] = start // 2048
    pd.testing.assert_frame_equal(got, naive.reset_index(drop=True), check_dtype=False)
    # shard ids must be monotone in doc order and start at 0
    assert got["shard"].is_monotonic_increasing and got["shard"].iloc[0] == 0


@pytest.mark.parametrize("num_buckets", [1, 3, 16])
def test_pack_sequences_bucket_count_invariant(ray_session, tmp_path, num_buckets):
    rows = [{"doc_id": i * 13 + 1, "text": " ".join(["w"] * (i % 7 + 1))} for i in range(40)]
    sf = _write_docs(tmp_path, rows)
    got = (
        pack_sequences(sf, budget=16, num_buckets=num_buckets)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    naive = pd.DataFrame(
        {"doc_id": [r["doc_id"] for r in rows],
         "n_tokens": [len(r["text"].split()) for r in rows]}
    ).sort_values("doc_id").reset_index(drop=True)
    naive["shard"] = (naive["n_tokens"].cumsum() - naive["n_tokens"]) // 16
    pd.testing.assert_frame_equal(got, naive, check_dtype=False)


def test_global_shuffle_index_vs_md5_rank(ray_session, tmp_path):
    import hashlib

    from ontology_time_machine_ray.stages.packing import global_shuffle_index

    rows = [{"doc_id": i * 7 + 2, "text": "x"} for i in range(60)]
    sf = _write_docs(tmp_path, rows)
    got = (
        global_shuffle_index(sf, num_buckets=8)
        .to_pandas()
        .sort_values("shuffle_pos")
        .reset_index(drop=True)
    )
    order = sorted(
        (r["doc_id"] for r in rows),
        key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d),
    )
    assert got["doc_id"].tolist() == order
    assert got["shuffle_pos"].tolist() == list(range(len(rows)))
    # a different seed must give a different (still complete) permutation
    seeded = (
        global_shuffle_index(sf, seed="s1", num_buckets=8)
        .to_pandas()
        .sort_values("shuffle_pos")
    )
    assert sorted(seeded["doc_id"]) == sorted(got["doc_id"])
    assert seeded["doc_id"].tolist() != got["doc_id"].tolist()


def test_chunk_documents_vs_naive(ray_session, tmp_path):
    from ontology_time_machine_ray.stages.packing import chunk_documents

    rows = [
        {"doc_id": 1, "text": " ".join(f"t{i}" for i in range(20))},  # 3 chunks
        {"doc_id": 2, "text": " ".join(f"t{i}" for i in range(8))},   # exactly W
        {"doc_id": 3, "text": "one two"},                              # < W
        {"doc_id": 4, "text": ""},                                     # no chunks
        {"doc_id": 5, "text": " ".join(f"t{i}" for i in range(15))},  # W + remainder
    ]
    sf = _write_docs(tmp_path, rows)
    got = (
        chunk_documents(sf, window=8, stride=6)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    exp = []
    for r in rows:
        ws = r["text"].split()
        n = len(ws)
        if n == 0:
            continue
        n_chunks = 1 if n <= 8 else 1 + -(-(n - 8) // 6)
        for ci in range(n_chunks):
            s = ci * 6
            exp.append((r["doc_id"], ci, s, min(n - s, 8), " ".join(ws[s : s + 8])))
    exp_df = pd.DataFrame(
        exp, columns=["doc_id", "chunk_idx", "start_tok", "n_tokens", "chunk_text"]
    )
    pd.testing.assert_frame_equal(got, exp_df, check_dtype=False)
    # every token of every doc appears in at least one chunk (coverage)
    assert got.groupby("doc_id").apply(
        lambda g: g["start_tok"].iloc[-1] + g["n_tokens"].iloc[-1], include_groups=False
    ).tolist() == [20, 8, 2, 15]


def test_chunk_documents_rejects_bad_stride(ray_session, tmp_path):
    from ontology_time_machine_ray.stages.packing import chunk_documents

    with pytest.raises(ValueError):
        chunk_documents("/nonexistent", window=4, stride=5)


def test_pack_sequences_rejects_bad_params(ray_session):
    with pytest.raises(ValueError):
        pack_sequences("/nonexistent", budget=0)
    with pytest.raises(ValueError):
        pack_sequences("/nonexistent", num_buckets=0)


def test_corpus_clean_each_drop_reason(ray_session, tmp_path):
    filler = " ".join(f"word{i}" for i in range(22))  # ~130 chars, distinct bigrams
    keep = "the " + filler
    rows = [
        # benchmark doc (id%97==0): own filler so only the planted 4-gram leaks
        {"doc_id": 0, "text": "the alpha beta gamma delta " + " ".join(f"b{i}" for i in range(22))},
        {"doc_id": 10, "text": keep},                                    # kept
        {"doc_id": 11, "text": keep},                                    # exact dup -> dropped
        {"doc_id": 12, "text": "the cat " * 20},                        # repetitive -> dropped
        {"doc_id": 13, "text": "short"},                                 # low quality -> dropped
        {"doc_id": 14, "text": "the alpha beta gamma delta " + " ".join(f"x{i}" for i in range(22))},  # contaminated
        {"doc_id": 15, "text": "the " + " ".join(f"z{i}" for i in range(22))},  # kept
    ]
    sf = _write_docs(tmp_path, rows)
    got = textops.corpus_clean(sf).to_pandas()
    assert sorted(got["doc_id"].tolist()) == [10, 15]


def test_corpus_mix_vs_naive(ray_session, tmp_path):
    import hashlib

    from ontology_time_machine_ray.stages.packing import corpus_mix

    rows = [
        {"doc_id": i, "text": "x", "source": f"s{i % 4}"} for i in range(400)
    ]
    sf = _write_docs(tmp_path, rows)
    rates = {"s0": 300_000, "s1": 1_000_000, "s2": 2_500_000}  # s3 dropped
    got = (
        corpus_mix(sf, rates_e6=rates, seed="t")
        .to_pandas()
        .sort_values(["source", "epoch", "doc_id"])
        .reset_index(drop=True)
    )

    # independent row-at-a-time reference
    exp = []
    for r in rows:
        rate = rates.get(r["source"], 0)
        full, frac = divmod(rate, 1_000_000)
        for ep in range(full):
            exp.append((r["doc_id"], r["source"], ep))
        if frac:
            thr = format(frac * 16**6 // 10**6, "06x")
            h = hashlib.md5(f"t:{full}:{r['doc_id']}".encode()).hexdigest()
            if h[:6] < thr:
                exp.append((r["doc_id"], r["source"], full))
    exp.sort(key=lambda t: (t[1], t[2], t[0]))
    assert list(map(tuple, got[["doc_id", "source", "epoch"]].to_numpy())) == exp

    # dropped source never appears; full epochs are complete copies
    assert "s3" not in set(got["source"])
    assert (got[(got["source"] == "s2") & (got["epoch"] < 2)]
            .groupby("epoch")["doc_id"].count() == 100).all()
    # fractional subsets land near their target rates (hash-uniform)
    n_s0 = (got["source"] == "s0").sum()
    assert 15 <= n_s0 <= 45  # 100 docs at 0.3 target
    # deterministic: same seed -> same mix
    again = corpus_mix(sf, rates_e6=rates, seed="t").to_pandas()
    assert len(again) == len(got)

    with pytest.raises(ValueError):
        corpus_mix(sf, rates_e6={"s0": -1})


def test_corpus_mix_temperature_flattens_skew(ray_session):
    """sqrt-rule rates on a skewed corpus: the small source is upsampled
    and the big one downsampled (p_s ∝ sqrt(n_s)), the cap bounds the
    upsampling, and the realized mix matches a Python replay of the
    integer rate formula + hash subset."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ontology_time_machine_ray.stages.packing import (
        MIX_T_CAP_E6,
        corpus_mix_temperature,
    )

    sizes = {"big": 900, "mid": 90, "tiny": 10}
    rows = []
    i = 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append({"doc_id": i, "source": src})
            i += 1
    docs = pd.DataFrame(rows)
    out = (
        corpus_mix_temperature("unused", docs_ds=rd.from_pandas(docs))
        .to_pandas()
        .groupby("source")
        .size()
    )

    # replay the integer rate rule
    n = np.array(list(sizes.values()), dtype=np.int64)
    w = np.floor(np.sqrt(n.astype(np.float64))).astype(np.int64)
    N, W = int(n.sum()), int(w.sum())
    rates = {
        s: min(MIX_T_CAP_E6, 1_000_000 * N * int(wi) // (W * int(ni)))
        for s, wi, ni in zip(sizes, w, n)
    }
    # direction of the flattening
    assert rates["big"] < 1_000_000 < rates["tiny"]
    # realized per-source volume ~= n * rate (exact for the full-epoch
    # part; the fractional subset is hash-uniform, so just bound it)
    for s in sizes:
        full, frac = divmod(rates[s], 1_000_000)
        lo = sizes[s] * full
        hi = sizes[s] * (full + (1 if frac else 0))
        assert lo <= out.get(s, 0) <= hi, (s, rates[s], out.get(s, 0))
    # cap engages on a pathologically tiny source
    one = pd.DataFrame(
        {"doc_id": range(101), "source": ["lone"] + ["rest"] * 100}
    )
    mixed = (
        corpus_mix_temperature("unused", docs_ds=rd.from_pandas(one))
        .to_pandas()
        .groupby("source")
        .size()
    )
    assert mixed["lone"] <= MIX_T_CAP_E6 // 1_000_000
