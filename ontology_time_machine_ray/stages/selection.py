"""Exact distributed order-statistic selection (top-N / top-X% cutoff).

The "keep the best X% of the corpus by quality score" step of LLM corpus
curation (CCNet keeps the head of its perplexity buckets, Wenzek et al.
2020 sec. 4.4; DataComp-LM and FineWeb select score quantiles).  A naive
implementation global-sorts the corpus -- a full all-to-all shuffle just
to find one cutoff.  This one finds the EXACT cutoff with bounded driver
state and no sort:

1. score histogram: integer scores have bounded cardinality, so one
   combiner pass + a tiny bucketed aggregate yields exact per-score
   counts; the driver reads back <= |distinct scores| rows and picks the
   boundary score ``s*`` and the remaining slot count ``r`` inside it.
2. boundary refinement: ties at ``s*`` break by ascending id.  The id of
   rank ``r`` inside the boundary group is found by ITERATIVE HISTOGRAM
   REFINEMENT: each round histograms the candidate id-range into 1024
   bins (one pruned pass over the materialized boundary-id column; the
   driver sees <= 1024 rows), descends into the bin containing rank
   ``r``, and stops when the bin is small enough to resolve in one
   bounded fetch.  Rounds needed: ``log_1024(range)`` -- <= 7 even for a
   full int64 range, and 1-2 in practice.
3. final filter: one streaming pass keeps ``score > s*`` or
   ``(score == s*, id <= cutoff)``.

Driver state is O(distinct scores + rounds * 1024 + final bin); nothing
corpus-scale is ever collected or broadcast.  No reference analog (the
reference has no scoring); cited against the public curation recipes
above.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

#: histogram fan-out per refinement round (drives rounds = log_1024(range)).
BINS = 1024
#: a bin at or below this row count is resolved in one bounded fetch.
FINAL_FETCH_ROWS = 1_000_000


def exact_top_n(
    scored,
    n: int | None = None,
    pct: int | None = None,
    score_col: str = "quality",
    id_col: str = "doc_id",
):
    """Rows of ``scored`` whose rank by ``(score DESC, id ASC)`` is
    ``<= n`` (or ``<= ceil(total * pct / 100)``), exactly.  ``id_col``
    must be unique integers; ``score_col`` integer-valued (bounded
    distinct values).  Returns a lazy filtered Dataset over ``scored``.
    """
    from ontology_time_machine_ray.stages.groupagg import grouped_aggregate

    if (n is None) == (pct is None):
        raise ValueError("pass exactly one of n / pct")

    def s_hist(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(score_col, as_index=False).agg(n=(id_col, "size"))

    hist = (
        grouped_aggregate(
            scored.map_batches(s_hist, batch_format="pandas"),
            [score_col],
            {"n": ("n", "sum")},
        )
        .to_pandas()
        .sort_values(score_col, ascending=False)
    )
    total = int(hist["n"].sum())
    if pct is not None:
        n = (total * pct + 99) // 100
    n = min(int(n), total)
    if n <= 0:
        return scored.limit(0)

    cum = hist["n"].cumsum().to_numpy()
    i = int(np.searchsorted(cum, n))  # first score bucket reaching rank n
    s_star = hist[score_col].iloc[i]
    above = int(cum[i - 1]) if i > 0 else 0
    r = n - above  # slots left inside the s* group, filled by id ASC

    if r == int(hist["n"].iloc[i]):
        # the whole boundary group fits: plain score filter, no refinement
        return scored.map_batches(
            lambda df, s=s_star: df[df[score_col] >= s], batch_format="pandas"
        )

    # boundary ids only (one int64 column) -- reused across rounds
    boundary = scored.map_batches(
        lambda df, s=s_star: df.loc[df[score_col] == s, [id_col]],
        batch_format="pandas",
    ).materialize()

    def minmax(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"lo": [int(df[id_col].min())], "hi": [int(df[id_col].max())]}
        )

    mm = boundary.map_batches(minmax, batch_format="pandas").to_pandas()
    lo, hi = int(mm["lo"].min()), int(mm["hi"].max())

    while True:
        width = max(1, -(-(hi - lo + 1) // BINS))

        def bin_hist(df: pd.DataFrame, lo=lo, hi=hi, width=width) -> pd.DataFrame:
            ids = df[id_col]
            ids = ids[(ids >= lo) & (ids <= hi)]
            return (
                ((ids - lo) // width)
                .astype("int64")
                .value_counts()
                .rename_axis("bin")
                .reset_index(name="n")
            )

        bh = (
            grouped_aggregate(
                boundary.map_batches(bin_hist, batch_format="pandas"),
                ["bin"],
                {"n": ("n", "sum")},
            )
            .to_pandas()
            .sort_values("bin")
        )
        cumb = bh["n"].cumsum().to_numpy()
        j = int(np.searchsorted(cumb, r))
        r -= int(cumb[j - 1]) if j > 0 else 0
        b = int(bh["bin"].iloc[j])
        lo, hi = lo + b * width, lo + b * width + width - 1
        if width == 1 or int(bh["n"].iloc[j]) <= FINAL_FETCH_ROWS:
            break

    fin = boundary.map_batches(
        lambda df, lo=lo, hi=hi: df[(df[id_col] >= lo) & (df[id_col] <= hi)],
        batch_format="pandas",
    ).to_pandas()
    cutoff = int(np.partition(fin[id_col].to_numpy(), r - 1)[r - 1])

    return scored.map_batches(
        lambda df, s=s_star, c=cutoff: df[
            (df[score_col] > s) | ((df[score_col] == s) & (df[id_col] <= c))
        ],
        batch_format="pandas",
    )
