"""Empty-input robustness: every major operator must return an empty
result with the right schema instead of raising — the behavior a
production pipeline hits on an empty partition, a filtered-out day,
or a cold-start stream."""

from __future__ import annotations

from pyspark.sql import functions as F

from htmlentityextraction_spark.operators import dedup as dd
from htmlentityextraction_spark.operators import extraction as ex
from htmlentityextraction_spark.operators import models as md
from htmlentityextraction_spark.operators import similarity as sim
from htmlentityextraction_spark.operators import skew
from htmlentityextraction_spark.operators import temporal as tp


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def test_extraction_empty(spark):
    df = spark.createDataFrame([], "url string, html string")
    out = ex.extract_candidates(df)
    assert out.count() == 0
    assert set(out.columns) == {
        "url", "candidate", "location", "text_before", "text_after", "page_length"
    }


def test_dedup_tiers_empty(spark):
    docs = _empty_docs(spark)
    assert dd.exact_dedup(docs).count() == 0
    assert dd.minhash_lsh_pairs(docs).count() == 0
    assert dd.simhash_pairs(docs).count() == 0


def test_similarity_empty_corpus(spark):
    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert sim.cosine_topk(emb, emb).count() == 0


def test_models_empty_candidates(spark):
    cand = spark.createDataFrame(
        [],
        "domain string, url string, label int, norm_location double,"
        "candidate string, text_before string, text_after string",
    )
    feats = md.featurize_candidates(cand)
    reg = md.train_per_domain(feats, min_rows=1)
    assert reg.count() == 0
    # scoring with an empty registry -> everything gets the -2 sentinel
    some = md.featurize_candidates(spark.createDataFrame(
        [("d.com", "u", 0, 0.5, "1.00", "price", "now")],
        "domain string, url string, label int, norm_location double,"
        "candidate string, text_before string, text_after string",
    ))
    picked = md.pick_model_price(md.score_candidates(some, reg))
    assert [r.model_price for r in picked.collect()] == [-2.0]


def test_asof_and_sessionize_empty(spark):
    probe = spark.createDataFrame([], "k long, pts date")
    build = spark.createDataFrame([], "k long, bts date, price double")
    assert tp.asof_join(probe, build, "k", "pts", "bts", ["price"]).count() == 0
    ev = spark.createDataFrame([], "user_id long, ts timestamp")
    assert skew.sessionize(ev).count() == 0
