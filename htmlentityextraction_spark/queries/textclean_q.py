"""Text-cleaning queries: PII masking over constructed dirty text,
repeated-token collapse, hard quality filters — each with a DuckDB
oracle running the same RE2-safe regex / list logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from htmlentityextraction_spark.operators import textclean as tc
from htmlentityextraction_spark.registry import register
from htmlentityextraction_spark.sources.tables import load_table

_TOKS = (
    "list_filter(string_split_regex(trim(regexp_replace(regexp_replace({c},"
    "'[^A-Za-z]+',' ','g'),' +',' ','g')), ' '), t -> t <> '')"
)


@register(
    "pii_masking",
    r"""
    WITH dirty AS (
        SELECT doc_id,
               text || ' contact user' || doc_id || '@mail' || (doc_id % 7) || '.com or '
                    || 'https://shop' || (doc_id % 5) || '.example.com/p?id=' || doc_id
                    || CASE WHEN doc_id % 3 = 0
                            THEN ' call +1 (555) 010-' || (1000 + doc_id % 9000)
                            ELSE '' END AS text
        FROM documents
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(text, 'https?://[^ \t\n]+', '<URL>', 'g'),
               '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z][A-Za-z]+', '<EMAIL>', 'g'),
             '\+?[0-9][0-9()\- ]{7,}[0-9]', '<PHONE>', 'g') AS masked
    FROM dirty
    """,
)
def pii_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Emails / URLs / phone runs planted into every document must come
    out as typed placeholders; DuckDB runs the identical patterns."""
    docs = load_table(spark, sf_dir, "documents")
    k = F.col("doc_id")
    dirty = F.concat(
        F.col("text"),
        F.lit(" contact user"), k.cast("string"), F.lit("@mail"),
        F.pmod(k, F.lit(7)).cast("string"), F.lit(".com or https://shop"),
        F.pmod(k, F.lit(5)).cast("string"), F.lit(".example.com/p?id="), k.cast("string"),
        F.when(
            F.pmod(k, F.lit(3)) == 0,
            F.concat(F.lit(" call +1 (555) 010-"), (F.lit(1000) + F.pmod(k, F.lit(9000))).cast("string")),
        ).otherwise(F.lit("")),
    )
    return docs.select("doc_id", tc.mask_pii(dirty).alias("masked"))


@register(
    "collapse_repeated_tokens",
    f"""
    WITH t AS (
        -- coalesce: Spark's concat_ws collapses NULL text to '' —
        -- the oracle matches that contract (null-fuzz aligned)
        SELECT doc_id, {_TOKS.format(c="coalesce(text,'')")} AS toks FROM documents
    )
    SELECT doc_id,
           -- coalesce: duck's array_to_string([]) is NULL, Spark's
           -- concat_ws of an empty array is ''
           coalesce(array_to_string(
             list_filter(
               list_transform(generate_series(1, greatest(len(toks), 1)),
                   i -> CASE WHEN i = 1 OR toks[i] <> toks[i-1] THEN toks[i] END),
               x -> x IS NOT NULL), ' '), '') AS collapsed
    FROM t
    """,
)
def collapse_repeated_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Immediately-repeated tokens collapse to one (the fixture's word
    salad contains real stutters); same index-walk in DuckDB."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", tc.collapse_repeated_tokens(F.col("text")).alias("collapsed")
    )


@register(
    "hard_quality_filters",
    f"""
    WITH t AS (
        -- NULL text gates as EMPTY text: zero tokens, keep=false —
        -- a corrupt doc is a reject, not an unknown (null-fuzz aligned)
        SELECT doc_id, {_TOKS.format(c="coalesce(text,'')")} AS toks FROM documents
    ), m AS (
        SELECT doc_id,
               len(toks)::DOUBLE AS n,
               CASE WHEN len(toks) > 0 THEN
                   list_aggregate(list_transform(toks, t -> length(t)::DOUBLE), 'sum') / len(toks)
               ELSE 0.0 END AS mean_wl,
               CASE WHEN len(toks) > 0 THEN
                   list_aggregate(list_transform(toks, t -> length(t)::DOUBLE), 'max')
               ELSE 0.0 END AS max_wl,
               CASE WHEN len(toks) > 0 THEN
                   1.0 - len(list_distinct(toks))::DOUBLE / len(toks)
               ELSE 0.0 END AS rep
        FROM t
    )
    SELECT doc_id,
           n >= 5 AND n <= 100000 AS n_tokens_ok,
           mean_wl >= 2.0 AND mean_wl <= 12.0 AS mean_word_len_ok,
           max_wl <= 30.0 AS max_word_len_ok,
           rep <= 0.85 AS repetition_ok,
           (n >= 5 AND n <= 100000) AND (mean_wl >= 2.0 AND mean_wl <= 12.0)
               AND max_wl <= 30.0 AND rep <= 0.85 AS keep,
           floor(rep * 1000000 + 0.5) / 1000000 AS repetition_ratio
    FROM m
    """,
)
def hard_quality_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style hard gates per document; the keep flag is the
    conjunction a corpus filter would apply."""
    docs = load_table(spark, sf_dir, "documents")
    flags = tc.hard_quality_flags(F.coalesce(F.col("text"), F.lit("")))
    return docs.select(
        "doc_id",
        flags["n_tokens_ok"].alias("n_tokens_ok"),
        flags["mean_word_len_ok"].alias("mean_word_len_ok"),
        flags["max_word_len_ok"].alias("max_word_len_ok"),
        flags["repetition_ok"].alias("repetition_ok"),
        flags["keep"].alias("keep"),
        flags["repetition_ratio"].alias("repetition_ratio"),
    )
