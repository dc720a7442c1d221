"""Distributed BPE merge learning — the tokenizer-training step of an
LLM data pipeline (Sennrich et al. 2016), shaped for a 100 TB corpus.

Standard BPE alternates two steps k times:

1. count adjacent symbol pairs across the corpus (weighted by word
   frequency) and pick the most frequent pair — with a DETERMINISTIC
   tie-break (count desc, then pair lexicographic), so reruns and
   partitionings agree;
2. merge that pair everywhere it occurs (greedy leftmost,
   non-overlapping — the `aaa` case merges positions 0-1, not 1-2).

Scale shape: the corpus collapses to a WORD-FREQUENCY table first
(`word, n` — vocabulary-sized, the classic BPE preprocessing), so
each iteration's pair count is a groupBy over word-level pair
explosions weighted by n, and the merge rewrites only words
CONTAINING the pair (a filtered pandas-UDF pass over the vocabulary
table, not the corpus). The corpus itself is read once. k iterations
= k (pair-count shuffle + vocabulary rewrite) rounds with
localCheckpoint lineage cuts, exactly PageRank's per-round discipline.

The greedy leftmost-nonoverlapping merge is sequential WITHIN one
word (bounded ~dozens of symbols) and embarrassingly parallel across
words — the textbook case for an Arrow-batched UDF island; everything
corpus-sized stays in JVM aggregates.

No SQL oracle: iterative argmax-dependent rewriting isn't
SQL-expressible (each round's input depends on the previous argmax).
Gated by pytest on corpora with hand-computable merge sequences
(tests/test_bpe.py), including the overlapping-run case.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def word_freq_table(docs: DataFrame, tokens_col: str) -> DataFrame:
    """Corpus → (word, n) vocabulary table: the only corpus-sized
    pass in BPE training."""
    return (
        docs.select(F.explode(tokens_col).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _merge_word(syms: list[str], a: str, b: str) -> list[str]:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2  # greedy leftmost, non-overlapping
        else:
            out.append(syms[i])
            i += 1
    return out


def learn_bpe_merges(
    docs: DataFrame, tokens_col: str, num_merges: int
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the
    ordered merge list [(left, right), ...]."""
    vocab = word_freq_table(docs, tokens_col).select(
        F.split(F.col("word"), "").alias("syms"), "n"
    ).localCheckpoint()

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs = vocab.select(
            F.explode(
                F.zip_with(
                    F.slice("syms", 1, F.greatest(F.size("syms") - 1, F.lit(0))),
                    F.slice("syms", 2, F.greatest(F.size("syms") - 1, F.lit(0))),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                )
            ).alias("p"),
            "n",
        ).groupBy("p.a", "p.b").agg(F.sum("n").alias("cnt"))
        top = pairs.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b")).limit(1).collect()
        if not top or top[0]["cnt"] is None:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))

        def _make_udf(a: str, b: str):
            # bind a/b by value: the UDF executes inside this
            # iteration's eager localCheckpoint, but explicit binding
            # keeps it correct even under lazy evaluation
            @pandas_udf("array<string>")
            def apply_merge(col: pd.Series) -> pd.Series:
                return col.apply(lambda syms: _merge_word(list(syms), a, b))

            return apply_merge

        apply_merge = _make_udf(a, b)

        # rewrite only words that can contain the pair — everything
        # else is carried through untouched (no recompute, no UDF)
        has_pair = F.exists(
            F.zip_with(
                F.slice("syms", 1, F.greatest(F.size("syms") - 1, F.lit(0))),
                F.slice("syms", 2, F.greatest(F.size("syms") - 1, F.lit(0))),
                lambda x, y: (x == F.lit(a)) & (y == F.lit(b)),
            ),
            lambda v: v,
        )
        vocab = vocab.withColumn(
            "syms",
            F.when(has_pair, apply_merge(F.col("syms"))).otherwise(F.col("syms")),
        ).localCheckpoint()
    return merges


def apply_bpe(docs: DataFrame, tokens_col: str, merges: list[tuple[str, str]],
              out_col: str = "bpe_pieces") -> DataFrame:
    """Encode: apply the learned merge list, in order, to every
    token. One Arrow-batched pass over the corpus."""

    @pandas_udf("array<string>")
    def encode(col: pd.Series) -> pd.Series:
        def enc(word: str) -> list[str]:
            syms = list(word)
            for a, b in merges:
                syms = _merge_word(syms, a, b)
            return syms

        return col.apply(
            lambda toks: [p for w in toks if w for p in enc(w)]
        )

    return docs.withColumn(out_col, encode(F.col(tokens_col)))
