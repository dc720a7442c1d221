"""Semantic tests for corpus-hygiene operators (operators/decontam.py):
planted contamination, cross-corpus dedup, boilerplate flagging."""

from __future__ import annotations

from pyspark.sql import functions as F

from htmlentityextraction_spark.operators import decontam as dc


def test_word_ngrams_short_doc_empty(spark):
    df = spark.createDataFrame([("a b c",), ("",)], "text string")
    out = df.select(dc.word_ngrams(F.split("text", " "), 4).alias("g")).collect()
    assert all(r.g == [] for r in out)


def test_word_ngrams_exact(spark):
    df = spark.createDataFrame([("a b c d",)], "text string")
    (row,) = df.select(dc.word_ngrams(F.split("text", " "), 2).alias("g")).collect()
    assert row.g == ["a b", "b c", "c d"]


def test_segment_tokens_trailing_partial(spark):
    df = spark.createDataFrame([("a b c d e",)], "text string")
    (row,) = df.select(dc.segment_tokens(F.split("text", " "), 2).alias("s")).collect()
    assert row.s == ["a b", "c d", "e"]


def test_decontaminate_planted_overlap(spark):
    # train doc 1 contains the held-out 3-gram "x y z"; doc 2 does not
    train = spark.createDataFrame(
        [(1, "p q x y z r"), (2, "a b c d e f")], "doc_id long, text string"
    )
    heldout = spark.createDataFrame([(99, "m x y z n")], "doc_id long, text string")
    rows = {r.doc_id: r for r in dc.decontaminate(train, heldout, n=3).collect()}
    assert rows[1].n_hits == 1 and rows[1].contaminated == 1
    assert rows[2].n_hits == 0 and rows[2].contaminated == 0


def test_dedup_against_corpus(spark):
    existing = spark.createDataFrame([(1, "already here")], "doc_id long, text string")
    incoming = spark.createDataFrame(
        [
            (10, "already here"),       # dup of existing -> dropped
            (11, "brand new words"),    # fresh
            (12, "brand new words"),    # within-batch dup -> keep min id 11
        ],
        "doc_id long, text string",
    )
    out = dc.dedup_against_corpus(incoming, existing).collect()
    assert [r.doc_id for r in out] == [11]


def test_boilerplate_segments_flags_common_segment(spark):
    # the 2-token segment "x y" appears in 3 docs -> boilerplate at min_docs=3
    docs = spark.createDataFrame(
        [(1, "x y a b"), (2, "x y c d"), (3, "x y e f"), (4, "g h i")],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in dc.boilerplate_segments(docs, seg_len=2, min_docs=3).collect()
    }
    for d in (1, 2, 3):
        assert rows[d].n_segments == 2
        assert rows[d].n_boilerplate == 1
        assert rows[d].tokens_kept == 2
    assert rows[4].n_segments == 2  # "g h" + trailing "i"
    assert rows[4].n_boilerplate == 0
    assert rows[4].tokens_kept == 3
