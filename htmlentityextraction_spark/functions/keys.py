"""Key/ID column semantics shared between the Spark queries and their
DuckDB oracles (r12, the keyfuzz axis).

Two engine facts this module is the single boundary for:

- **pmod vs ``%``**: Spark's ``F.pmod`` is always non-negative while
  both engines' ``%`` operator takes the sign of the dividend
  (``pmod(-1, 8) = 7`` but ``-1 % 8 = -1``). Every query that shards,
  buckets, or cohorts by ``F.pmod(key, n)`` must pair its oracle with
  :func:`pmod_sql`, never a raw ``%`` — a negative sentinel id
  otherwise lands in a different (or impossible) bucket per engine.
  ``% n = 0`` equality tests are exempt: a zero remainder has no sign,
  so raw ``%`` agrees with pmod there.
- **NULL ids under ASC ordering**: Spark sorts NULLS FIRST on ASC,
  DuckDB NULLS LAST — a NULL id used as a window ORDER BY tie-break
  silently shifts every lag/lead/rank/first between engines (the
  key-axis twin of the r10 datenull class). Negative and dangling ids
  are NOT a divergence hazard (both engines order ints identically;
  inner joins drop dangles identically on both) — only NULL is, so
  :func:`valid_id` gates exactly that. Use it at the ingestion
  boundary of any observation stream whose id columns feed an ASC
  ordering, a merge/upsert key, or an identity-sensitive derivation.

Fuzz axis: ``tools/null_fuzz.py --kind keyfuzz`` (NULL/dangling/
negative FKs + duplicated PKs); engine facts pinned in
tests/test_key_robustness.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pmod_sql(expr: str, n: int) -> str:
    """DuckDB twin of Spark's ``F.pmod(expr, n)``: non-negative
    remainder, NULL-preserving (``((expr % n) + n) % n``)."""
    return f"(((({expr}) % {n}) + {n}) % {n})"


def valid_id(col: str) -> Column:
    """The key-axis ingestion gate: TRUE for rows whose id is usable
    as an ordering / identity axis. Only NULL diverges cross-engine
    (see module docstring), so only NULL is excluded — negative and
    dangling ids stay in the population."""
    return F.col(col).isNotNull()


def valid_id_sql(expr: str) -> str:
    """DuckDB twin of :func:`valid_id`."""
    return f"({expr}) IS NOT NULL"


def keep_one_per_id(df, id_col: str):
    """Deterministic identity dedup for a dimension/corpus frame whose
    ``id_col`` is a primary key: drop NULL ids, then keep exactly one
    row per id — the winner under DESC NULLS LAST ordering of every
    other column (a total order, so the same row wins on any engine
    and no attributes are mixed across conflicting duplicates).

    The r12 keyfuzz duplicate-PK shape: at-least-once delivery lands
    the same doc/supplier twice, half the time with a conflicting
    attribute. Identity-sensitive consumers (dedup pipelines, shard
    assignment, per-id joins, payload derivations) must resolve that
    BEFORE their own logic or the two engines resolve it differently.
    Mirror with :func:`keep_one_per_id_sql`.

    Physical form: window row_number + the planner's partial
    WindowGroupLimit (map-side dedup before the exchange). An
    equivalent ``groupBy(id).agg(max(struct(<others>)))`` form — same
    winner: struct ordering is field-by-field with NULL smallest,
    exactly the total order desc_nulls_last-per-column ranks by — was
    built and ABBA-measured in r13 and TIED on every consumer
    (sequence_packing 0.87 vs 0.89 s, table_diff 1.61 vs 1.74,
    fuzzy 2.83 vs 2.64; pairwise wins split). Both forms are
    sort-based dedups around the same exchange, so the tie is
    structural; the driver-verified window form is kept
    (OPTIMIZATION_r13.md)."""
    from pyspark.sql import Window

    others = [c for c in df.columns if c != id_col]
    w = Window.partitionBy(id_col).orderBy(
        *[F.desc_nulls_last(c) for c in others]
    )
    return (
        df.filter(F.col(id_col).isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def keep_one_per_id_sql(table: str, id_col: str, cols: list[str]) -> str:
    """DuckDB twin of :func:`keep_one_per_id` — pass the table's FULL
    column list in schema order. Binary string collation agreement
    between the engines is a pinned contract
    (tests/test_text_robustness.py), so the DESC winners match."""
    others = ", ".join(f"{c} DESC NULLS LAST" for c in cols if c != id_col)
    sel = ", ".join(cols)
    return (
        f"SELECT {sel} FROM (SELECT {sel}, row_number() OVER "
        f"(PARTITION BY {id_col} ORDER BY {others}) AS __rn FROM {table} "
        f"WHERE {id_col} IS NOT NULL) WHERE __rn = 1"
    )
