"""Round-3 wave: sequence packing, DataFrame Count-Min Sketch, exact
co-moment statistics."""

from __future__ import annotations

from pyspark.sql import functions as F

from htmlentityextraction_spark.operators import llmprep as lp


def test_pack_sequences_bins_and_attribution(spark):
    # 4 docs of 3 tokens each, budget 5: starts 0,3,6,9 → bins 0,0,1,1
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma", "s0") for i in range(4)],
        "doc_id long, text string, source string",
    )
    out = lp.pack_sequences(docs, budget=5, group_col="source").orderBy("bin_id").collect()
    assert [(r.bin_id, r.n_docs, r.bin_tokens) for r in out] == [(0, 2, 6), (1, 2, 6)]
    assert out[0].first_doc == 0 and out[0].last_doc == 1


def test_pack_sequences_empty_text_and_groups(spark):
    # empty docs contribute 0 tokens and stay in the current bin;
    # groups pack independently
    docs = spark.createDataFrame(
        [(0, "a b c d e f", "s0"), (1, "", "s0"), (2, "x y", "s0"), (3, "x y", "s1")],
        "doc_id long, text string, source string",
    )
    out = {(r.grp, r.bin_id): r for r in lp.pack_sequences(docs, budget=6).collect()}
    assert out[("s0", 0)].n_docs == 1 and out[("s0", 0)].bin_tokens == 6
    # doc 1 (0 tokens) and doc 2 start at offset 6 → bin 1
    assert out[("s0", 1)].n_docs == 2 and out[("s0", 1)].bin_tokens == 2
    assert out[("s1", 0)].n_docs == 1


def test_cms_estimates_never_undercount(spark, sf_dir):
    from htmlentityextraction_spark.queries.scalar2 import CMS_W, cms_estimates, cms_heavy_hitters

    rows = cms_heavy_hitters(spark, sf_dir).collect()
    assert len(rows) == 20
    assert all(r.overestimates for r in rows)
    # the 2N/w accuracy bound is probabilistic over hash choice, so
    # it is asserted here against the FIXED fixture (deterministic
    # given the pinned salts), not in the oracle gate
    ests = cms_estimates(spark, sf_dir).collect()
    import math

    for r in ests:
        assert r.exact_n <= r.est <= r.exact_n + math.ceil(2.0 * r.n_total / CMS_W)


def test_exact_comoments_match_builtin_corr(spark, sf_dir):
    # the exact-integer formulation must agree with Spark's float
    # corr() to ~1e-6 at this scale (the builtin is the reference
    # point; the exact form exists for cross-run determinism)
    from htmlentityextraction_spark.queries.scalar2 import corr_covar_qty_price

    ours = {r.flag: r for r in corr_covar_qty_price(spark, sf_dir).collect()}
    from htmlentityextraction_spark.sources.tables import load_table

    ref = {
        r.flag: r
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_returnflag").alias("flag"))
        .agg(F.corr("l_quantity", "l_extendedprice").alias("c"))
        .collect()
    }
    for flag, row in ours.items():
        assert abs(row.corr_qty_price - ref[flag].c) < 1e-5


def test_fuzzy_join_short_strings_and_no_match(spark):
    from htmlentityextraction_spark.operators.entity import fuzzy_join

    left = spark.createDataFrame(
        [(1, "ab"), (2, "hello"), (3, "zzz")], "lid long, lname string"
    )
    right = spark.createDataFrame(
        [(10, "ab"), (20, "hallo"), (30, "qqqq")], "rid long, rname string"
    )
    got = {(r.lid, r.rid): r.dist for r in
           fuzzy_join(left, right, "lid", "lname", "rid", "rname", 1).collect()}
    assert got[(1, 10)] == 0, "short strings (<3 chars) must still block and match"
    assert got[(2, 20)] == 1
    assert all(lid != 3 for lid, _ in got), "no spurious match for disjoint strings"


def test_fuzzy_join_mixed_length_short_keys(spark):
    # 'ab' vs 'abc' is levenshtein 1 but the UNPADDED trigram sets
    # ({'ab'} vs {'abc'}) are disjoint — boundary sentinels must make
    # this pair reachable
    from htmlentityextraction_spark.operators.entity import fuzzy_join

    left = spark.createDataFrame([(1, "ab"), (2, "x")], "lid long, lname string")
    right = spark.createDataFrame([(10, "abc"), (20, "xy")], "rid long, rname string")
    got = {(r.lid, r.rid): r.dist for r in
           fuzzy_join(left, right, "lid", "lname", "rid", "rname", 1).collect()}
    assert got[(1, 10)] == 1, "mixed-length short pair within distance 1 must match"
    assert got[(2, 20)] == 1


def test_fuzzy_join_hot_trigram_blocking_stays_linear(spark):
    # adversarial: every name shares the hot prefix 'thexx' so raw
    # trigram blocking would form an O(n^2) block on 'the'/'hex'/'exx';
    # prefix filtering keeps only each row's rarest (3d+1) trigrams,
    # so the hot trigrams never block and candidates stay near-linear
    from htmlentityextraction_spark.operators.entity import (
        blocking_candidates,
        fuzzy_join,
    )

    n = 300
    # hot shared 12-char prefix, distinct hashed tails (the realistic
    # killer: "the company of ..." style common prefixes)
    names = [(i, f"the-company-{(i * 2654435761) % 2**32:08x}") for i in range(n)]
    left = spark.createDataFrame(names, "lid long, lname string")
    right = spark.createDataFrame(names, "rid long, rname string")
    cand = blocking_candidates(left, right, "lid", "lname", "rid", "rname", 1)
    n_cand = cand.count()
    assert n_cand < 10 * n, f"hot shared trigrams must not explode blocking: {n_cand}"
    # recall intact: every identical pair is found
    matched = {(r.lid, r.rid) for r in
               fuzzy_join(left, right, "lid", "lname", "rid", "rname", 1).collect()}
    assert {(i, i) for i in range(n)} <= matched
