"""Text-cleaning operators for corpus preparation: PII masking,
repeated-token collapse, and hard quality-filter rules (the
Gopher-style gates). All columnar; regex patterns stay inside the
Java-regex ∩ RE2 common subset (no backrefs/lookaheads) so the DuckDB
oracles run the SAME pattern.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from htmlentityextraction_spark.functions.text import tokenize

EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z][A-Za-z]+"
URL_RE = r"https?://[^ \t\n]+"
PHONE_RE = r"\+?[0-9][0-9()\- ]{7,}[0-9]"


def mask_pii(text: Column) -> Column:
    """Mask emails, URLs, and phone-shaped digit runs with typed
    placeholder tokens (order matters: URLs can contain @)."""
    out = F.regexp_replace(text, URL_RE, "<URL>")
    out = F.regexp_replace(out, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, PHONE_RE, "<PHONE>")


def collapse_repeated_tokens(text: Column) -> Column:
    """Collapse immediately-repeated tokens ("the the the" → "the") —
    backreference-free (RE2-safe): index-walk the token array and keep
    positions that differ from their predecessor."""
    toks = F.filter(tokenize(text), lambda t: t != "")
    n = F.size(toks)
    kept = F.filter(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
            lambda i: F.when(
                (i == 1) | (F.element_at(toks, i) != F.element_at(toks, i - 1)),
                F.element_at(toks, i),
            ),
        ),
        lambda x: x.isNotNull(),
    )
    return F.when(n > 0, F.array_join(kept, " ")).otherwise(F.lit(""))


def hard_quality_flags(text: Column) -> dict[str, Column]:
    """Gopher-style hard filter rules: token count bounds, mean word
    length band, max word length cap, repetition ratio cap. Returns
    the individual rule columns plus the combined keep flag."""
    toks = F.filter(tokenize(text), lambda t: t != "")
    n = F.size(toks).cast("double")
    word_lens = F.transform(toks, lambda t: F.length(t).cast("double"))
    mean_wl = F.when(n > 0, F.aggregate(word_lens, F.lit(0.0), lambda a, x: a + x) / n).otherwise(
        F.lit(0.0)
    )
    max_wl = F.when(n > 0, F.array_max(word_lens)).otherwise(F.lit(0.0))
    rep_ratio = F.when(
        n > 0, 1.0 - F.size(F.array_distinct(toks)).cast("double") / n
    ).otherwise(F.lit(0.0))
    rules = {
        "n_tokens_ok": (n >= 5) & (n <= 100000),
        "mean_word_len_ok": (mean_wl >= 2.0) & (mean_wl <= 12.0),
        "max_word_len_ok": max_wl <= 30.0,
        "repetition_ok": rep_ratio <= 0.85,
    }
    keep = F.lit(True)
    for c in rules.values():
        keep = keep & c
    rules["keep"] = keep
    rules["repetition_ratio"] = F.floor(rep_ratio * 1e6 + 0.5) / 1e6
    return rules
