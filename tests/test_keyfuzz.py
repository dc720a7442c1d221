"""Potency contracts for the referential-integrity fuzz axes (r12).

``--kind keyfuzz`` poisons JOIN-KEY/ID columns — NULL FKs, dangling
FKs (outside the parent domain, plus negative sentinels), and
duplicated PK rows (half byte-identical, half with a conflicting
attribute) — the one column class no prior kind ever touched.

``--kind matrix`` is the deterministic potency matrix: every pool
entry of every kind placed into every eligible column at least once,
built not sampled, so pool x column coverage is guaranteed instead of
probabilistic (the r11 whois miss survived 17 sweeps because the VT
entry landing in s_name was a ~1-in-4-per-sweep event at sf0.01).
"""
from __future__ import annotations

import importlib.util
import os

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def nf():
    spec = importlib.util.spec_from_file_location(
        "null_fuzz",
        os.path.join(os.path.dirname(__file__), "..", "tools", "null_fuzz.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


SRC = "/root/testdata/sf0.001"


def test_keyfuzz_lands_all_three_hazards(nf, tmp_path):
    """One keyfuzz run must produce (a) NULL FKs, (b) dangling FKs
    outside the parent key domain, (c) negative FKs, and (d)
    duplicated PK rows with both an identical and a conflicting copy
    — on every declared target table big enough to hit at the rate."""
    for table in nf.TABLES:
        nf.fuzz_table(SRC, str(tmp_path), table, 0.20, 77, "keyfuzz")

    # (a)-(c): lineitem's FKs at rate 0.20 hit every pool entry
    li = pq.read_table(tmp_path / "lineitem.parquet")
    for col in ("l_orderkey", "l_partkey", "l_suppkey"):
        arr = li.column(col)
        assert arr.null_count > 0, f"no NULL FKs in {col}"
        assert pc.sum(pc.greater(arr, 10**9).cast("int64")).as_py() > 0, (
            f"no dangling FKs in {col}"
        )
        assert pc.sum(pc.less(arr, 0).cast("int64")).as_py() > 0, (
            f"no negative FKs in {col}"
        )
    # dangling means OUTSIDE the parent domain
    part_keys = set(pq.read_table(tmp_path / "part.parquet").column("p_partkey").to_pylist())
    poisoned = [k for k in li.column("l_partkey").to_pylist() if k is not None and (k < 0 or k > 10**9)]
    assert poisoned and all(k not in part_keys for k in poisoned)

    # (d): duplicated PKs in orders — identical AND conflicting copies
    o = pq.read_table(tmp_path / "orders.parquet")
    n, nd = len(o), len(pc.unique(o.column("o_orderkey")))
    assert n > nd, "no duplicated PK rows in orders"
    # conflicting copy: same key, measure bumped by +1.0
    import collections
    by_key = collections.defaultdict(list)
    for k, v in zip(o.column("o_orderkey").to_pylist(), o.column("o_totalprice").to_pylist()):
        by_key[k].append(v)
    dup_vals = [vs for vs in by_key.values() if len(vs) > 1]
    assert any(len(set(vs)) == 1 for vs in dup_vals), "no identical duplicate"
    assert any(len(set(vs)) > 1 for vs in dup_vals), "no conflicting duplicate"

    # documents PK duplication with the " ~v2" text conflict
    d = pq.read_table(tmp_path / "documents.parquet")
    assert len(d) > len(pc.unique(d.column("doc_id")))
    assert any("~v2" in (x or "") for x in d.column("text").to_pylist())


def test_keyfuzz_deterministic(nf, tmp_path):
    """Same seed -> byte-identical fixture (sweep repros must replay)."""
    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(); b.mkdir()
    for d in (a, b):
        nf.fuzz_table(SRC, str(d), "lineitem", 0.10, 42, "keyfuzz")
    ta = pq.read_table(a / "lineitem.parquet")
    tb = pq.read_table(b / "lineitem.parquet")
    assert ta.equals(tb)


def test_matrix_guarantees_every_pool_entry_in_every_column(nf, tmp_path):
    """The matrix fixture must place EVERY pool entry in EVERY eligible
    column — the whole point is converting probabilistic coverage into
    a guarantee, so spot-check the exact entry class that escaped 17
    r11 sweeps (raw VT in s_name) plus one entry per pool family."""
    for table in nf.TABLES:
        nf.matrix_table(SRC, str(tmp_path), table)

    sup = pq.read_table(tmp_path / "supplier.parquet")
    names = [x for x in sup.column("s_name").to_pylist() if x]
    for entry in nf.TEXTUNI_POOL:
        assert entry in names, f"textuni entry {entry!r} missing from s_name"
    assert any("\x0b" in x for x in names), "the whois-class VT entry must be present"

    li = pq.read_table(tmp_path / "lineitem.parquet")
    prices = li.column("l_extendedprice").to_pylist()
    for entry in nf.EXTREME_POOL:
        assert any(
            v is not None and (v == entry or (v != v and entry != entry))
            for v in prices
        ), f"extreme entry {entry} missing from l_extendedprice"
    assert any(v is None for v in prices) and any(v != v for v in prices if v is not None)

    for col in ("l_orderkey", "l_partkey", "l_suppkey"):
        vals = li.column(col).to_pylist()
        for entry in nf.KEYFUZZ_FK_POOL:
            assert entry in vals, f"FK entry {entry} missing from {col}"

    ev = pq.read_table(tmp_path / "events.parquet")
    props = [x for x in ev.column("props").to_pylist() if x is not None]
    for entry in nf.JSON_POOL:
        assert entry in props, f"JSON entry {entry!r} missing from props"

    docs = pq.read_table(tmp_path / "documents.parquet")
    nchars = docs.column("n_chars").to_pylist()
    for entry in nf.INTEDGE_POOL64:
        assert entry in nchars, f"intedge entry {entry} missing from n_chars"

    # region is smaller than the string pool: growth must have kept
    # PK uniqueness while fitting every entry
    reg = pq.read_table(tmp_path / "region.parquet")
    assert len(reg) == len(pc.unique(reg.column("r_regionkey")))
    rnames = reg.column("r_name").to_pylist()
    for entry in nf.TEXT_POOL:
        assert entry in rnames, f"text entry {entry!r} missing from r_name"

    # vector poison: one zero-length vector and a NaN element
    emb = pq.read_table(tmp_path / "embeddings.parquet")
    vecs = emb.column("embedding").to_pylist()
    assert any(v == [] for v in vecs)
    flat = [e for v in vecs if v for e in v]
    assert any(e is None for e in flat)
    assert any(e is not None and e != e for e in flat)


def test_matrix_deterministic(nf, tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(); b.mkdir()
    for d in (a, b):
        for table in nf.TABLES:
            nf.matrix_table(SRC, str(d), table)
    for table in nf.TABLES:
        # byte compare (Table.equals treats the placed NaNs as unequal)
        fa = (a / f"{table}.parquet").read_bytes()
        fb = (b / f"{table}.parquet").read_bytes()
        assert fa == fb, table
