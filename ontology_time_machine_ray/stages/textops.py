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

from ontology_time_machine_ray.functions.hashing import content_md5_series

#: marker words per language for the n-gram/keyword language heuristic.
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "die"),
    "fr": ("le", "et", "les"),
    "es": ("el", "y", "los"),
}

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")


def _read_docs(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])


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
    Integer thresholds keep it bit-identical to the SQL restatement."""
    texts = df["text"].fillna("")
    n_chars = texts.str.len().astype("int64")
    n_tokens = texts.str.count(r"\S+").astype("int64")
    n_stop = sum(_word_count(texts, w) for w in STOPWORDS).astype("int64")
    n_punct = texts.str.count(r"[.,;:!?]").astype("int64")
    score = (
        ((n_chars >= 100) & (n_chars <= 20000)).astype("int64")
        + (n_stop * 100 >= n_tokens).astype("int64")  # >=1% stopwords
        + (n_punct * 10 <= n_tokens).astype("int64")  # <=10% punctuation
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
