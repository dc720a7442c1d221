"""Exact set-similarity join via prefix filtering (PPJoin-style
candidate generation, exact Jaccard verification).

MinHash-LSH (`operators/dedup.py`) answers "probably similar" with
tunable recall; this operator answers the EXACT question "token-set
Jaccard ≥ t" without an all-pairs comparison, using the prefix-filter
theorem (Chaudhuri, Ganti & Kaushik, ICDE 2006; Xiao et al. PPJoin,
WWW 2008):

    order every document's distinct tokens by a global total order
    (ascending document frequency, ties on the token). If
    |x ∩ y| / |x ∪ y| ≥ t, then x and y MUST share at least one token
    within their first ``p = |x| - ceil(t * |x|) + 1`` tokens.

So candidate generation joins only on *prefix* tokens — the rarest
tokens of each document — instead of all tokens. Rare-first ordering
makes the join's blocking keys the least-frequent tokens in the
corpus, which is what keeps blocks small at scale; a loud guard
(`HotPrefixTokenError`) still bounds the worst case, same contract as
``dedup.ngram_jaccard_pairs``.

Scale shape: one groupBy for document frequencies (broadcast back —
token vocabulary, not corpus, sized), one window per doc to rank
tokens (single shuffle on doc_id), an equi self-join on prefix tokens,
and an exact intersection count over candidates only. No UDFs, no
cross join, recall = 1.0 by the theorem (exactness tested against a
brute-force oracle).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


class HotPrefixTokenError(RuntimeError):
    """A prefix token blocks more rows than ``max_block_rows`` — the
    candidate join would quadratically explode on it. Raise loudly
    with the offending tokens instead of running a runaway join."""


def prefix_jaccard_pairs(
    docs: DataFrame,
    id_col: str,
    tokens_col: str,
    threshold: float,
    max_block_rows: int | None = 10_000,
) -> DataFrame:
    """All pairs (id_a < id_b) whose distinct-token Jaccard ≥
    ``threshold``, with the exact similarity. Output:
    ``(id_a, id_b, n_shared, size_a, size_b, jaccard)``."""
    toks = (
        docs.select(F.col(id_col).alias("id"), F.explode(tokens_col).alias("tok"))
        .where(F.col("tok") != "")
        .distinct()
    )
    sizes = toks.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    # global total order: rare tokens first (document frequency asc,
    # token asc) — vocabulary-sized, broadcast back onto the pairs
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        toks.join(F.broadcast(dfreq), "tok")
        .join(F.broadcast(sizes), "id")
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("id").orderBy(F.asc("df"), F.asc("tok"))
            ),
        )
    )
    # prefix length p = |x| - ceil(t|x|) + 1
    prefix = ranked.where(
        F.col("pos") <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
    ).select("id", "tok", "sz")

    if max_block_rows is not None:
        hot = (
            prefix.groupBy("tok")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > max_block_rows)
            .limit(5)
            .collect()
        )
        if hot:
            names = ", ".join(f"{r['tok']}({r['n']})" for r in hot)
            raise HotPrefixTokenError(
                f"prefix tokens exceed max_block_rows={max_block_rows}: {names}; "
                "raise the threshold, the guard, or pre-drop stopwords"
            )

    left = prefix.select(
        F.col("id").alias("id_a"), F.col("tok"), F.col("sz").alias("size_a")
    )
    right = prefix.select(
        F.col("id").alias("id_b"), F.col("tok"), F.col("sz").alias("size_b")
    )
    cand = (
        left.join(right, "tok")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # exact verification: intersection size from the full token sets
    ta = toks.select(F.col("id").alias("id_a"), "tok")
    tb = toks.select(F.col("id").alias("id_b"), "tok")
    inter = (
        cand.join(ta, "id_a")
        .join(tb, ["id_b", "tok"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("size_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("size_b"))
    out = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_shared")
            / (F.col("size_a") + F.col("size_b") - F.col("n_shared")),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "n_shared", "size_a", "size_b", "jaccard")
