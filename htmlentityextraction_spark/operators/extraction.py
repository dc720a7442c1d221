"""Price-candidate extraction — the reference's core custom operator.

One scraped page → N numeric candidates, each with its byte offset and
±snippet_size chars of context, then heuristic rejection. Semantics
mirror `utils/PriceParcer.scala:15-37` (``findFast``) and the filter
at `:22-27`:

- pattern ``([0-9,.]*[0-9])[^0-9,.]`` — a digits/commas/dots run
  ending in a digit, followed by one non-number char (so a number at
  end-of-input does NOT match — observable quirk kept for parity);
- ``text_before`` = up to snippet_size chars before the match start;
- ``text_after``  = snippet_size chars starting at the trailing
  non-number char (i.e. it begins with the char after the number);
- reject when: the candidate has neither ``.`` nor ``,``; or contains
  a doubled separator (``..``, ``,,``, ``.,``, ``,.``); or the whole
  snippet (before+candidate+after) has neither a currency symbol
  (\\p{Sc}) nor the literal word price/Price/PRICE.

Spark-first shape: positional regex over large strings is the one
place built-ins genuinely can't express the semantics
(``regexp_extract_all`` drops positions), so this is an Arrow-batched
pandas UDF returning ARRAY<STRUCT>, exploded afterwards (SURVEY.md §7
M3 — sanctioned UDF island #1). At 100 TB: shrink/normalize the html
columnar-side FIRST (`functions.text.shrink_string`) exactly as the
reference does, so the Python boundary crosses the smallest possible
bytes; the UDF is a narrow map — no shuffle, scales linearly with
input splits.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

NUM_PATTERN = re.compile(r"([0-9,.]*[0-9])(?:[^0-9,.])")
# r5's hot-path scan: NUM_PATTERN + the "must contain . or ," rejection
# folded into ONE pattern, so bare integer runs (the vast majority of
# digit runs in real HTML — ids, counts, dimensions) never surface as
# Python Match objects at all. Provably the same match set: a
# NUM_PATTERN match's group always runs to the final digit of its
# maximal [0-9,.] run (a group ending earlier would be followed by a
# class char, which the trailing [^0-9,.] forbids), so
# group-contains-separator <=> run-contains-separator — exactly what
# the lookahead tests; and a skipped bare run consumes nothing a
# later match could start inside (matches start on digits only).
# Equivalence property-tested against the plain two-step reference in
# tests/test_extraction.py.
FAST_NUM_PATTERN = re.compile(r"((?=[0-9.,]*[.,])[0-9,.]*[0-9])(?:[^0-9,.])")
# r7's scan (the one the hot path uses): digits* separator rest*
# final-digit, plus one next-char check in Python, is equivalent to a
# FAST_NUM_PATTERN match — and it keeps sre's first-charset skip loop
# (the leading lookahead above defeats it: measured 25 MB/s/core on
# digit-free 10 KB text vs 33 for this pattern) while still rejecting
# BARE integer runs inside C (a plain [0-9,.]+ run-scan was 2x faster
# still on prose but surfaced every bare id/count as a Python Match —
# a measured regression on digit-heavy pages). Equivalence: a
# FAST/NUM match's group always spans run-start..run-final-digit with
# the trailing char outside the class, which forces the group to be
# its ENTIRE maximal [0-9,.] run (any digit earlier in the run is
# followed by a class char); greedy matching makes this pattern
# produce exactly that run when the run ends in a digit and contains
# a separator, and the next-char check enforces the trailing
# [^0-9,.] (the reference's findFast quirk, `utils/PriceParcer.scala:
# 15-37`: a number at end-of-input never matches — and a match whose
# next char is still in-class means the run went on past its last
# digit, which FAST/NUM reject). Property-tested against the frozen
# two-step reference in tests/test_extraction.py.
SEP_RUN_PATTERN = re.compile(r"[0-9,.]*[.,][0-9,.]*[0-9]")
_RUN_CLASS = frozenset("0123456789,.")
# \p{Sc} in Java; the common currency symbols + the Sc block in BMP
CURRENCY = re.compile("[$¢-¥֏؋৲৳૱௹฿"
                      "៛₠-₿꠸﷼﹩＄￠￡￥￦]")
PRICE_TEXT = re.compile("price|Price|PRICE")
# one scan instead of two: the snippet gate is a plain boolean OR
CURRENCY_OR_PRICE = re.compile(CURRENCY.pattern + "|price|Price|PRICE")

CANDIDATE_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("candidate", T.StringType()),
            T.StructField("location", T.IntegerType()),
            T.StructField("text_before", T.StringType()),
            T.StructField("text_after", T.StringType()),
        ]
    )
)


def extract_candidates_py(html: str, snippet_size: int = 150) -> list[dict]:
    """Plain-Python reference implementation (used by the UDF per cell
    and unit-testable without Spark)."""
    if html is None:
        return []
    out = []
    n = len(html)
    # SEP_RUN_PATTERN already enforces ends-in-digit + has-separator
    # inside C; the next-char check reconstructs the trailing
    # [^0-9,.] (see the pattern comment), then the remaining
    # rejections run cheapest-first (candidate-only string scans
    # before any snippet slicing). Locals bound once: this loop is
    # the serve path's per-byte cost.
    in_class = _RUN_CLASS.__contains__
    search = CURRENCY_OR_PRICE.search
    append = out.append
    for m in SEP_RUN_PATTERN.finditer(html):
        end = m.end()
        # number at end-of-input never matches (parity quirk), and a
        # next char still in-class means the maximal run continued
        # past its last digit — FAST/NUM reject both
        if end >= n or in_class(html[end]):
            continue
        price = m.group()
        if ",," in price or ".," in price or ",." in price or ".." in price:
            continue
        start = m.start()
        before = html[max(start - snippet_size, 0) : start]
        after = html[end : end + snippet_size]
        if not search(before + price + after):
            continue
        append(
            {
                "candidate": price,
                "location": start,
                "text_before": before,
                "text_after": after,
            }
        )
    return out


def candidates_udf(snippet_size: int = 150):
    """Arrow-batched UDF: html → ARRAY<STRUCT<candidate,location,
    text_before,text_after>>."""

    @pandas_udf(CANDIDATE_TYPE)
    def _extract(html: pd.Series) -> pd.Series:
        return html.map(lambda h: extract_candidates_py(h, snippet_size))

    return _extract


def extract_candidates(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    snippet_size: int = 150,
    shrink: bool = True,
) -> DataFrame:
    """Page rows → candidate rows (url, candidate, location,
    text_before, text_after, page_length). ``shrink`` pre-normalizes
    the html columnar-side (JVM) before the Python boundary, as
    `utils/Utils.scala:131-145` (``htmlsToCandidsPipe``) does."""
    from htmlentityextraction_spark.functions.text import shrink_string

    html = shrink_string(F.col(html_col)) if shrink else F.col(html_col)
    pages = df.select(
        F.col(url_col).alias("url"),
        html.alias("__html"),
    ).withColumn("page_length", F.length("__html"))
    exploded = pages.select(
        "url",
        "page_length",
        F.explode(candidates_udf(snippet_size)(F.col("__html"))).alias("c"),
    )
    return exploded.select(
        "url",
        F.col("c.candidate").alias("candidate"),
        F.col("c.location").alias("location"),
        F.col("c.text_before").alias("text_before"),
        F.col("c.text_after").alias("text_after"),
        "page_length",
    )


def parse_price(c: Column) -> Column:
    """Locale-ish numeric parse of a candidate: strip thousands commas
    then try_cast — mirrors `utils/Utils.scala:123-129` returning null
    (None) on failure."""
    return F.regexp_replace(c, ",", "").try_cast("double")


def label_candidates(
    cand: DataFrame, truth: DataFrame, url_col: str = "url", price_col: str = "price"
) -> DataFrame:
    """``isTrueCandid`` (`utils/Utils.scala:115-121`): a candidate is
    positive when candidate == page price == updatedPrice numerically.
    `truth` carries (url, price, updated_price). Broadcast-joined by
    url; normalized location added per `data/DataSchema.scala:6-8`."""
    labeled = cand.join(F.broadcast(truth), url_col)
    num = parse_price(F.col("candidate"))
    return labeled.withColumn(
        "label",
        (num.isNotNull()
         & (num == F.col(price_col))
         & (num == F.col("updated_price"))).cast("boolean"),
    ).withColumn(
        "norm_location",
        F.col("location").cast("double") / F.greatest(F.col("page_length"), F.lit(1)).cast("double"),
    )
