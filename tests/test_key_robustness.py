"""Engine-fact pins for the r12 keyfuzz classes (functions/keys.py).

Each test states a cross-engine divergence the keyfuzz axis found and
proves the class boundary closes it — if an engine upgrade shifts
either side, these fail loudly instead of a sweep silently probing
the wrong fact.
"""
from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from htmlentityextraction_spark.functions.keys import (
    keep_one_per_id,
    keep_one_per_id_sql,
    pmod_sql,
    valid_id,
)


def test_pmod_vs_percent_engine_divergence_and_twin(spark):
    """FACT: Spark F.pmod is non-negative; BOTH engines' % takes the
    dividend sign. pmod_sql reproduces pmod in DuckDB exactly,
    including NULL propagation."""
    rows = [(-7,), (-1,), (0,), (1,), (13,), (None,)]
    df = spark.createDataFrame(rows, "k long")
    got_pmod = [r[0] for r in df.select(F.pmod("k", F.lit(8))).collect()]
    got_mod = [r[0] for r in df.select(F.col("k") % 8).collect()]
    assert got_pmod == [1, 7, 0, 1, 5, None]
    assert got_mod == [-7, -1, 0, 1, 5, None]  # Spark % == duck %

    con = duckdb.connect()
    con.execute("CREATE TABLE t(k BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(r[0],) for r in rows])
    duck_mod = [r[0] for r in con.execute("SELECT k % 8 FROM t ORDER BY rowid").fetchall()]
    assert duck_mod == got_mod, "the raw % dialects agree — pmod is the odd one out"
    duck_twin = [
        r[0] for r in con.execute(f"SELECT {pmod_sql('k', 8)} FROM t ORDER BY rowid").fetchall()
    ]
    assert duck_twin == got_pmod, "pmod_sql must replay Spark pmod exactly"


def test_null_id_asc_ordering_divergence(spark):
    """FACT: Spark ASC sorts NULLS FIRST, DuckDB NULLS LAST — the
    key-axis twin of the r10 datenull class. valid_id is the gate:
    after it, both engines order the remaining (possibly negative /
    dangling) ids identically."""
    rows = [(3,), (None,), (-5,), (10**9 + 7,)]
    df = spark.createDataFrame(rows, "k long")
    s_asc = [r[0] for r in df.orderBy(F.asc("k")).collect()]
    assert s_asc == [None, -5, 3, 10**9 + 7], "Spark ASC = NULLS FIRST"

    con = duckdb.connect()
    con.execute("CREATE TABLE t(k BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(r[0],) for r in rows])
    d_asc = [r[0] for r in con.execute("SELECT k FROM t ORDER BY k").fetchall()]
    assert d_asc == [-5, 3, 10**9 + 7, None], "DuckDB ASC = NULLS LAST"

    gated = [r[0] for r in df.filter(valid_id("k")).orderBy(F.asc("k")).collect()]
    d_gated = [
        r[0] for r in con.execute("SELECT k FROM t WHERE k IS NOT NULL ORDER BY k").fetchall()
    ]
    assert gated == d_gated == [-5, 3, 10**9 + 7]


def test_window_partition_groups_null_keys_but_join_drops_them(spark):
    """FACT (both engines agree on each half, but the two CONSTRUCTS
    differ): GROUP BY / PARTITION BY put all NULL keys in one group,
    while join equality never matches NULL — so a groupBy-shaped
    Spark query and a join-shaped oracle diverge on NULL keys unless
    a valid_id gate (or NULL-aware join) aligns them. This asymmetry
    caused the golden_user_record / sessionize / asof findings."""
    df = spark.createDataFrame([(None, 1), (None, 2), (1, 3)], "k long, v long")
    grouped = {r["k"]: r["n"] for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()}
    assert grouped == {None: 2, 1: 1}, "groupBy keeps a NULL-key group"
    joined = df.alias("a").join(df.alias("b"), F.col("a.k") == F.col("b.k")).count()
    assert joined == 1, "join equality never matches NULL = NULL"

    con = duckdb.connect()
    con.execute("CREATE TABLE t(k BIGINT, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", [(None, 1), (None, 2), (1, 3)])
    d_grouped = dict(con.execute("SELECT k, count(*) FROM t GROUP BY k").fetchall())
    assert d_grouped == {None: 2, 1: 1}
    assert con.execute(
        "SELECT count(*) FROM t a JOIN t b ON a.k = b.k"
    ).fetchone()[0] == 1


def test_keep_one_per_id_same_winner_both_engines(spark, tmp_path):
    """The duplicate-PK boundary: conflicting duplicates resolve to
    the SAME winner on both engines (DESC NULLS LAST total order),
    NULL ids drop, and no attributes mix across rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        (1, "alpha", "en", "web", 10),
        (1, "alpha ~v2", "en", "web", 10),   # conflicting duplicate
        (2, "beta", None, "web", 5),
        (2, "beta", None, "web", 5),         # identical duplicate
        (None, "ghost", "xx", "web", 1),     # NULL id: dropped
    ]
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    pq.write_table(
        pa.table({c: [r[i] for r in rows] for i, c in enumerate(cols)}),
        tmp_path / "documents.parquet",
    )
    df = spark.read.parquet(str(tmp_path / "documents.parquet")).select(*cols)
    got = sorted(
        tuple(r) for r in keep_one_per_id(df, "doc_id").collect()
    )
    assert got == [
        (1, "alpha ~v2", "en", "web", 10),
        (2, "beta", None, "web", 5),
    ]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    duck = sorted(
        tuple(r) for r in con.execute(keep_one_per_id_sql("documents", "doc_id", cols)).fetchall()
    )
    assert duck == got


def test_keep_one_per_id_hazard_winners(spark):
    """keep_one_per_id's winner on every hazard shape: duplicate ids
    with conflicting attributes, NULL attribute cells (DESC NULLS
    LAST — the non-null value wins), NaN doubles (Spark total order:
    NaN largest), negative ids, ties that resolve on a later column,
    NULL ids dropped. Pins the exact total order so any physical
    rewrite of the dedup (e.g. the r13 max(struct) experiment, which
    tied and was not adopted) must reproduce these winners."""
    nan = float("nan")
    rows = [
        (1, "alpha", None, 10.0),
        (1, "alpha", "en", 10.0),      # later-column tie-break: "en" > NULL
        (2, None, "xx", 5.0),
        (2, "beta", "xx", 5.0),        # first-column: "beta" > NULL
        (3, "gamma", "de", nan),
        (3, "gamma", "de", 99.0),      # NaN > any double in Spark's order
        (-4, "neg", "id", 1.0),        # negative ids are valid
        (None, "ghost", "xx", 1.0),    # NULL id drops
        (5, "solo", None, None),       # singleton id passes through
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string, lang string, score double")
    got = sorted(
        (tuple(r) for r in keep_one_per_id(df, "doc_id").collect()),
        key=lambda t: t[0],
    )

    def canon(rows_):
        return [
            tuple("NaN" if isinstance(v, float) and v != v else v for v in t)
            for t in rows_
        ]

    assert canon(got) == canon(
        [
            (-4, "neg", "id", 1.0),
            (1, "alpha", "en", 10.0),
            (2, "beta", "xx", 5.0),
            (3, "gamma", "de", nan),
            (5, "solo", None, None),
        ]
    )


def test_keyfuzz_negative_keys_survive_valid_id(spark):
    """valid_id excludes ONLY NULL: negative and dangling ids are
    valid data (both engines order and join them identically) — the
    gate must not amputate them."""
    df = spark.createDataFrame([(-1,), (10**9 + 7,), (None,), (0,)], "k long")
    kept = sorted(r[0] for r in df.filter(valid_id("k")).collect())
    assert kept == [-1, 0, 10**9 + 7]
