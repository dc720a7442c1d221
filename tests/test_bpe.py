"""BPE merge learning: hand-computable merge sequences, the greedy
leftmost-nonoverlapping rule, frequency weighting, and encode parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from htmlentityextraction_spark.operators.bpe import (
    _merge_word,
    apply_bpe,
    learn_bpe_merges,
)


def _docs(spark, words: list[list[str]]):
    return spark.createDataFrame([(w,) for w in words], "toks array<string>")


def test_merge_word_greedy_nonoverlapping():
    assert _merge_word(list("aaa"), "a", "a") == ["aa", "a"]
    assert _merge_word(list("aaaa"), "a", "a") == ["aa", "aa"]
    assert _merge_word(list("abab"), "a", "b") == ["ab", "ab"]
    assert _merge_word(["ab", "c"], "ab", "c") == ["abc"]


def test_learn_merges_classic_corpus(spark):
    # 4x "hug", 2x "pug": pair counts h-u 4, u-g 6, p-u 2 ->
    # first merge (u,g); then h-ug 4, p-ug 2 -> second merge (h, ug)
    docs = _docs(spark, [["hug"]] * 4 + [["pug"]] * 2)
    merges = learn_bpe_merges(docs, "toks", 2)
    assert merges == [("u", "g"), ("h", "ug")]


def test_tie_break_is_lexicographic(spark):
    # "ab" and "cd" both appear twice -> tie on count 2; (a,b) < (c,d)
    docs = _docs(spark, [["ab"], ["ab"], ["cd"], ["cd"]])
    merges = learn_bpe_merges(docs, "toks", 1)
    assert merges == [("a", "b")]


def test_apply_bpe_roundtrip(spark):
    docs = _docs(spark, [["hug"]] * 4 + [["pug"]] * 2 + [["hugs"]])
    merges = learn_bpe_merges(docs, "toks", 2)
    enc = apply_bpe(docs.distinct(), "toks", merges)
    got = {tuple(r["toks"]): r["bpe_pieces"] for r in enc.collect()}
    assert got[("hug",)] == ["hug"]
    assert got[("pug",)] == ["p", "ug"]
    assert got[("hugs",)] == ["hug", "s"]


def test_frequency_weighting_beats_breadth(spark):
    # "zz" once vs "xy" three times: (x,y) must win despite z-pairs
    # appearing in a longer word
    docs = _docs(spark, [["zzz"]] + [["xy"]] * 3)
    merges = learn_bpe_merges(docs, "toks", 1)
    assert merges == [("x", "y")]
