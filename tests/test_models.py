"""Unit + integration tests for the numpy GBT and the per-domain model
lifecycle (train via applyInPandas, registry, mapInPandas scoring,
argmax price pick)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from htmlentityextraction_spark.operators.gbt import GBTClassifier
from htmlentityextraction_spark.operators import models as md


# --- numpy GBT ---
def _separable(n=200, seed=7):
    rng = np.random.RandomState(seed)
    X = rng.randn(n, 5)
    y = (X[:, 2] > 0.1).astype(float)
    return X, y


def test_gbt_fits_separable_data():
    X, y = _separable()
    m = GBTClassifier(n_estimators=10, max_depth=3).fit(X, y)
    assert (m.predict(X) == y).mean() >= 0.99


def test_gbt_deterministic_and_picklable():
    X, y = _separable()
    m1 = GBTClassifier(n_estimators=5, max_depth=2).fit(X, y)
    m2 = GBTClassifier(n_estimators=5, max_depth=2).fit(X, y)
    assert np.array_equal(m1.margin(X), m2.margin(X))
    m3 = GBTClassifier.from_bytes(m1.to_bytes())
    assert np.array_equal(m1.margin(X), m3.margin(X))


def test_gbt_margin_sign_matches_prediction():
    X, y = _separable()
    m = GBTClassifier(n_estimators=5, max_depth=2).fit(X, y)
    assert np.array_equal(m.predict(X), (m.margin(X) > 0).astype(np.int64))


def test_gbt_xor_needs_depth():
    # depth-2 interactions: xor is unlearnable by depth-1 stumps
    rng = np.random.RandomState(3)
    X = rng.randn(400, 2)
    y = ((X[:, 0] > 0) ^ (X[:, 1] > 0)).astype(float)
    deep = GBTClassifier(n_estimators=20, max_depth=3).fit(X, y)
    assert (deep.predict(X) == y).mean() >= 0.95


# --- url-grouped split ---
def test_url_grouped_split_no_leakage(spark):
    df = spark.range(1000).select(
        F.concat(F.lit("u"), (F.col("id") % 100).cast("string")).alias("url"),
        F.col("id").alias("x"),
    )
    train, test = md.url_grouped_split(df, 0.7)
    tr = {r.url for r in train.select("url").distinct().collect()}
    te = {r.url for r in test.select("url").distinct().collect()}
    assert tr.isdisjoint(te)
    assert len(tr) + len(te) == 100
    assert 50 <= len(tr) <= 90  # ~70 of 100


# --- per-domain lifecycle ---
def _toy_candidates(spark, n_urls=40):
    # two domains; token 'good' marks the positive candidate of a url;
    # each url has one positive and one negative candidate
    rows = []
    for i in range(n_urls):
        dom = f"d{i % 2}.com"
        url = f"http://{dom}/p/{i}"
        rows.append((dom, url, 1, 0.25, f"{100+i}.50", "buy now good deal price", "great offer"))
        rows.append((dom, url, 0, 0.75, f"{200+i}.99", "footer copyright year", "terms apply"))
    return spark.createDataFrame(
        rows,
        "domain string, url string, label int, norm_location double,"
        "candidate string, text_before string, text_after string",
    )


def test_train_score_pick_roundtrip(spark):
    cand = _toy_candidates(spark)
    feats = md.featurize_candidates(cand)
    reg = md.train_per_domain(
        feats, n_estimators=5, max_depth=2, min_doc_freq=2, min_rows=10
    )
    rows = reg.collect()
    assert {r.domain for r in rows} == {"d0.com", "d1.com"}
    assert all(r.train_f1 == 1.0 for r in rows), "separable toy data must fit perfectly"

    scored = md.score_candidates(feats, reg)
    picked = {r.url: r.model_price for r in md.pick_model_price(scored).collect()}
    for i in range(40):
        assert picked[f"http://d{i % 2}.com/p/{i}"] == 100 + i + 0.5


def test_score_missing_model_sentinel(spark):
    cand = _toy_candidates(spark)
    feats = md.featurize_candidates(cand)
    # registry trained only on d0.com -> d1.com urls get sentinel -2.0
    reg = md.train_per_domain(
        feats.filter(F.col("domain") == "d0.com"),
        n_estimators=5, max_depth=2, min_doc_freq=2, min_rows=10,
    )
    picked = md.pick_model_price(md.score_candidates(feats, reg))
    vals = {r.url: r.model_price for r in picked.collect()}
    assert all(v == -2.0 for u, v in vals.items() if "d1.com" in u)
    assert all(v >= 0 for u, v in vals.items() if "d0.com" in u)


def test_train_skips_single_class_and_tiny_domains(spark):
    cand = _toy_candidates(spark).filter(F.col("label") == 1)  # single class
    feats = md.featurize_candidates(cand)
    reg = md.train_per_domain(feats, n_estimators=3, max_depth=2, min_rows=5)
    assert reg.count() == 0


def test_margin_curve_and_prefix_selection():
    X, y = _separable()
    m = GBTClassifier(n_estimators=10, max_depth=2).fit(X, y)
    curves = m.margin_curve(X)
    assert curves.shape == (11, len(y))
    # full-model margin equals the last curve row
    assert np.allclose(curves[-1], m.margin(X))
    k, f1 = m.best_prefix_by_f1(X, y)
    assert 1 <= k <= 10 and 0.9 <= f1 <= 1.0
    # truncation reproduces the prefix margin exactly
    sub = m.truncate(k)
    assert np.allclose(sub.margin(X), curves[k])


def test_truncated_model_survives_pickle():
    X, y = _separable()
    m = GBTClassifier(n_estimators=6, max_depth=2).fit(X, y)
    sub = GBTClassifier.from_bytes(m.truncate(3).to_bytes())
    assert np.allclose(sub.margin(X), m.margin_curve(X)[3])


def test_class_union_vocab_mode(spark):
    # M4 (models/ModelR.scala:51-68): pos ∪ (neg − pos) selection must
    # still fit the separable toy data perfectly and yield a registry
    cand = _toy_candidates(spark)
    feats = md.featurize_candidates(cand)
    reg = md.train_per_domain(
        feats, n_estimators=5, max_depth=2, min_doc_freq=2, min_rows=10,
        vocab_mode="class_union",
    )
    rows = reg.collect()
    assert {r.domain for r in rows} == {"d0.com", "d1.com"}
    assert all(r.train_f1 == 1.0 for r in rows)
    # scoring with class-union indices roundtrips
    picked = {r.url: r.model_price for r in md.pick_model_price(
        md.score_candidates(feats, reg)).collect()}
    assert all(v >= 0 for v in picked.values())


def test_registry_parquet_roundtrip_serves_identically(spark):
    import shutil
    import tempfile

    cand = _toy_candidates(spark)
    feats = md.featurize_candidates(cand)
    reg = md.train_per_domain(
        feats, n_estimators=5, max_depth=2, min_doc_freq=2, min_rows=10
    )
    d = tempfile.mkdtemp(prefix="registry_")
    md.save_registry(reg, d)
    reloaded = md.load_registry(spark, d)
    p1 = {r.url: r.model_price for r in md.pick_model_price(
        md.score_candidates(feats, reg)).collect()}
    p2 = {r.url: r.model_price for r in md.pick_model_price(
        md.score_candidates(feats, reloaded)).collect()}
    assert p1 == p2
    shutil.rmtree(d)


def test_spark_ml_pipeline_single_model(spark):
    # the pure pyspark.ml path must also learn the separable toy data
    from htmlentityextraction_spark.operators import mlpipeline as mp

    cand = _toy_candidates(spark)
    model = mp.fit_single_model(
        cand, min_doc_freq=2, top_k=50, max_iter=5, max_depth=2
    )
    scored = mp.score_with_pipeline(model, cand)
    acc = scored.select(
        F.avg((F.col("prediction") == F.col("label").cast("double")).cast("double")).alias("a")
    ).first().a
    assert acc >= 0.95
    # margin sign agrees with the prediction
    bad = scored.filter(
        ((F.col("confidence") > 0) & (F.col("prediction") == 0.0))
        | ((F.col("confidence") < 0) & (F.col("prediction") == 1.0))
    ).count()
    assert bad == 0


def test_cogrouped_scorer_equals_broadcast_scorer(spark):
    """The no-broadcast scorer (registry stays distributed, cogrouped
    on domain) must produce row-identical predictions/confidences to
    the broadcast path — including the missing-model -2 sentinel for
    domains the registry lacks."""
    cand = _toy_candidates(spark)
    feats = md.featurize_candidates(cand)
    # train on d0.com only so d1.com exercises the sentinel path
    reg = md.train_per_domain(
        feats.filter(F.col("domain") == "d0.com"),
        n_estimators=5, max_depth=2, min_doc_freq=2, min_rows=10,
    )
    key = ["url", "candidate", "norm_location"]
    want = {
        tuple(r[k] for k in key): (r.prediction, r.confidence)
        for r in md.score_candidates(feats, reg).collect()
    }
    got = {
        tuple(r[k] for k in key): (r.prediction, r.confidence)
        for r in md.score_candidates_cogrouped(feats, reg).collect()
    }
    assert got == want
    assert any(p == -2 for p, _ in got.values()), "sentinel rows must exist"
    # and the downstream argmax pick agrees too
    picked_b = {r.url: r.model_price
                for r in md.pick_model_price(md.score_candidates(feats, reg)).collect()}
    picked_c = {r.url: r.model_price
                for r in md.pick_model_price(md.score_candidates_cogrouped(feats, reg)).collect()}
    assert picked_c == picked_b


def test_gbt_predict_proba_is_sigmoid_of_margin():
    # the scikit-style probability surface: sigmoid(margin), in (0,1),
    # monotone in the margin, and 0.5 exactly at the decision boundary
    X, y = _separable()
    m = GBTClassifier(n_estimators=10, max_depth=3).fit(X, y)
    margin = m.margin(X)
    proba = m.predict_proba(X)
    assert np.allclose(proba, 1.0 / (1.0 + np.exp(-margin)))
    assert ((proba > 0.0) & (proba < 1.0)).all()
    assert ((proba > 0.5) == (m.predict(X) == 1)).all()
