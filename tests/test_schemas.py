"""Canonical-schema boundary tests (§1): typed from_json parse with
corrupt-record routing, and hypothesis property invariants for the
extraction UDTF."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from htmlentityextraction_spark import schemas
from htmlentityextraction_spark.operators import extraction as ex


def test_parse_page_messages_typed_and_corrupt_routed(spark):
    good = (
        '{"url":"http://a.com/p/1","title":"t","html":"price 7.00 ",'
        '"price":7.0,"updatedPrice":7.0,"domain":"a.com",'
        '"lastUpdatedTime":"2024-01-01T00:00:00Z","modelPrice":-1.0}'
    )
    bad = "{definitely not json"
    raw = spark.createDataFrame([(good,), (bad,)], "value string")
    out = schemas.parse_page_messages(raw).collect()
    rows = {r.is_corrupt: r for r in out}
    assert rows[False].url == "http://a.com/p/1"
    assert rows[False].price == 7.0
    assert rows[False].modelPrice == -1.0
    assert rows[False].lastUpdatedTime is not None
    assert rows[True].url is None
    assert rows[True].raw_payload == bad  # error side output keeps payload


# --- hypothesis invariants for the extraction UDTF (plain python) ---
@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="0123456789.,$ abcprice\n", max_size=200))
def test_extraction_invariants(html):
    for c in ex.extract_candidates_py(html, snippet_size=20):
        cand, loc = c["candidate"], c["location"]
        # the candidate really is at its reported location
        assert html[loc : loc + len(cand)] == cand
        # filter rules hold for every emitted candidate
        assert ("." in cand) or ("," in cand)
        for doubled in ("..", ",,", ".,", ",."):
            assert doubled not in cand
        # snippet windows are bounded
        assert len(c["text_before"]) <= 20
        assert len(c["text_after"]) <= 20
        # text_before is exactly what precedes the match
        assert html[max(loc - 20, 0) : loc] == c["text_before"]


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="0123456789., abc$", max_size=100))
def test_extraction_deterministic(html):
    assert ex.extract_candidates_py(html) == ex.extract_candidates_py(html)
