"""Null-injection fuzz harness for cross-engine NULL semantics.

The driver's fixtures contain no NULLs, so Spark-vs-DuckDB
divergences in NULL handling stay latent until 100 TB production
data hits them: concat_ws skips NULL segments while `||` nullifies,
Spark windows default NULLS FIRST on ASC while DuckDB defaults
NULLS LAST, AVG-of-empty vs AVG-of-all-NULL, UDFs crashing on None
payloads. (ADVICE round 4 caught two of these by reading; this tool
finds them by executing.)

It writes a copy of an sf dir with a deterministic fraction of
poison values injected into VALUE columns (keys and id columns stay
clean — the repo documents a non-null/non-negative id contract),
then the standard gate runs against the copy:

    python tools/null_fuzz.py --src /root/testdata/sf0.001 \
        --dst /tmp/nullfuzz_sf0.001
    python tools/check_correctness.py --sf-dir /tmp/nullfuzz_sf0.001

Twelve poison kinds, one failure surface each:

- ``null`` (default) — NULLs into every eligible value column.
- ``nan`` — float NaN into DOUBLE columns (groups as a plain value,
  compares unordered, poisons sums NULL would skip).
- ``nullgroup`` / ``nangroup`` / ``extremegroup`` — pick ~7% of GROUP
  KEYS (customers, users, parts) and poison EVERY value row of those
  groups: row-level rates almost never produce an all-poisoned group,
  so "customer whose every price is corrupt → SUM() is NULL →
  rank/ntile windows order a NULL key" stays latent under row fuzz.
- ``nullcat`` / ``nancat`` — poison EVERY value of the first CATEGORY
  (event_type, returnflag): category keys are too few for %-of-keys
  selection, yet one dead upstream producer is a common shape.
- ``text`` — adversarial-but-valid strings (empty/NFC-vs-NFD/emoji/
  entity bait/quote soup) into STRING columns; malformed JSON into
  props.
- ``empty`` — the append-only stream tables with ZERO rows.
- ``extreme`` — ±inf/±1e308/2^53+1/subnormal/−0.0 into FLOAT columns
  (pass every NOT-isnan guard, overflow ANSI cents casts, make float
  sums ulp-order-dependent).
- ``mixed`` — every class at once, interleaved per row (interactions
  between per-axis fixes only surface here).
- ``time`` — pathological-but-valid timestamps into events.ts
  (negative epochs, epoch zero, 2038, near-pandas-max 2262, leap-day):
  watermark starvation and calendar-spine explosion.
- ``infpair`` — BOTH ±1e308 extremes paired on ADJACENT rows of every
  float column. The pair telescopes to 0.0, but it SWALLOWS whatever
  partial sum precedes it (x + 1e308 == 1e308 exactly), and which
  values precede it depends on each engine's fold order — an ungated
  float sum over a group holding a pair diverges by the swallowed
  amount. Pairing makes group co-location deterministic where the
  mixed kind leaves it to seed luck.
- ``vecpoison`` — ELEMENT-level poison inside float-list columns
  (embeddings.embedding): one NULL/NaN/±inf/±1e10/1e38 element per
  picked vector, plus the occasional zero-length vector. Every other
  kind can only NULL the whole array, so the `valid_vectors` /
  VALID_VEC_SQL element predicates (NULL-element, isnan, |x|>=1e10)
  had NO fuzz axis exercising them — yet a failed encoder writes
  exactly this shape, and an unguarded element reaches engines that
  disagree (DuckDB var_pop/list aggregates RAISE on non-finite,
  Spark propagates NaN; one 1e38 element silently poisons a BLAS
  gram row).
- ``datenull`` — NULL + the ``time`` pool's pathological timestamps
  into the DIMENSION time axes (lineitem.l_shipdate,
  orders.o_orderdate) that the ``time`` kind never touches. The sharp
  hazard is the NULL: Spark windows sort NULLS FIRST on ASC by
  default, DuckDB NULLS LAST, so any per-group series walk ordered by
  a nullable date shifts every lag/rank/fold seed between engines;
  the extremes probe calendar arithmetic off the fixture's 2024 band.
- ``textuni`` — NON-ASCII content into the case-mapped / tokenized /
  regex'd string columns (see TEXTUNI_POOL for the hazard classes;
  r11 first sweep found 7 divergences: Xerces crashing on raw VT in
  constructed XML, Java-vs-utf8proc lower('İ') through 5 token
  pipelines, and RE2-vs-Java \\s through a sort key).
- ``keyfuzz`` — referential-integrity poison into JOIN-KEY/ID columns
  (NULL FKs, dangling/negative FKs, duplicated PK rows half-identical
  half-conflicting) — the one column class no other kind touches; see
  KEYFUZZ_FK / KEYFUZZ_PK.
- ``matrix`` — not a random kind: the deterministic potency matrix.
  Every pool entry of every kind placed into every eligible column at
  least once (built, not sampled). One full-registry sweep over it is
  a GUARANTEED pool x column coverage certificate; the probabilistic
  kinds above then add group-shape and interaction coverage on top.

A query is hardened when it is hash-green on the clean dir AND all
fuzzed dirs, at sf0.01 and sf0.001, under at least two seeds.
"""

from __future__ import annotations

import argparse
import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# table -> value columns eligible for NULL injection. Keys / join ids
# / event-time stay non-null: ids are contractually non-null and a
# NULL event-time row is dropped by Structured Streaming watermarking
# by design (separate contract, not a cross-engine comparison).
INJECT: dict[str, list[str]] = {
    "region": ["r_name"],
    "nation": ["n_name"],
    "customer": ["c_name", "c_acctbal", "c_mktsegment"],
    "supplier": ["s_name", "s_acctbal"],
    "part": ["p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
    "orders": ["o_orderstatus", "o_totalprice", "o_orderpriority"],
    "lineitem": [
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
    ],
    "events": ["event_type", "value", "props"],
    "documents": ["text", "lang", "source"],
    "embeddings": ["embedding", "label"],
}

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# ``--kind text``: adversarial-but-valid strings into STRING value
# columns — empty/whitespace, NFC vs NFD accents, non-BMP emoji,
# long unbroken tokens, HTML-entity bait, quote/backslash soup,
# numeric-looking text, stutter bait. Locale-special casefold chars
# (İ, ß, ligatures) are deliberately EXCLUDED: Spark (ICU full
# mappings) and DuckDB (utf8proc simple mappings) genuinely disagree
# on them, which is pinned as a documented engine contract in
# tests/test_text_robustness.py rather than fuzzed around.
TEXT_POOL = [
    "",
    "   ",
    "\tleading tab\nnewline\rcr",
    "Ünïcodé Café naïve",
    "Cafe\u0301 au lait",  # NFD combining accent - not codepoint-equal to NFC Café
    "\U0001f99c parrot \U0001f99c\U0001f99c",
    "MiXeD CaSe ToKeNs HERE",
    "x" * 300,
    "tok " * 120,
    "&amp;&lt;td&gt;99.99&lt;/td&gt;",
    "<td> 1,299.00 </td>",
    "'single' \"double\" \\backslash %percent _underscore",
    "12345",
    "-3.14159",
    "dup dup dup dup dup",
]

# events.props is a JSON payload — malformed and edge-shape JSON
# exercise the corrupt-row path (SURVEY §2 P4) on both engines.
# POOL INVARIANT (r11, machine-checked by
# tests/test_text_robustness.py::test_json_dialect_engine_divergence_documented):
# every entry's accept/reject verdict must AGREE across Jackson
# (Spark) and yyjson (DuckDB). The engines' non-strict dialects
# differ in BOTH directions (Jackson-only: single quotes, raw
# control chars in strings; yyjson-only: NaN literals, trailing
# commas; number-edge rendering differs too) and no SQL-expressible
# cross-engine strictness predicate exists — those shapes are pinned
# as documented divergences, not fuzzed.
JSON_POOL = [
    "",
    "{",
    "not json at all",
    "[]",
    "null",
    '{"price": "NaN"}',
    '{"a": {"b": [1, 2, 3]}}',
    '{"price": 123.45, "ok": true}',
    # r11: unicode INSIDE valid JSON strings — escapes, astral emoji,
    # zero-width, full-width "digits" (a string, never a number)
    '{"note": "\\u0130stanbul \\u200b ok", "price": 9.5}',
    '{"tag": "\U0001f99c parrot", "price": "１２３"}',
]

# table -> (group-key column, value columns) for the group-level
# kinds: every value row of a selected group key is poisoned, so
# per-group aggregates (SUM/AVG over the group) become NULL — the
# fixture shape row-level rates can't produce. Single-row-per-key
# tables (customer, part, ...) are already covered by row fuzz.
GROUP_INJECT: dict[str, tuple[str, list[str]]] = {
    "orders": ("o_custkey", ["o_totalprice"]),
    "lineitem": ("l_partkey", ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]),
    "events": ("user_id", ["value"]),
}

# ``--kind nullcat|nancat``: poison EVERY value of the first (min)
# CATEGORY — "one event_type whose every value is NULL/NaN". Distinct
# from the id-keyed group kinds: category keys have ~3-20 distinct
# values, so %-of-keys selection can't target them reliably, yet an
# all-poisoned category is a common production shape (one upstream
# producer emits a field the schema has but the payloads lack).
# Round-6 first run found 3 silent divergences (SAX ntile, forecast
# seasonal_wins, Holt fold poisoning) that every other axis missed.
CAT_INJECT: dict[str, tuple[str, list[str]]] = {
    "events": ("event_type", ["value"]),
    "lineitem": ("l_returnflag", ["l_quantity", "l_extendedprice"]),
}

# ``--kind textuni``: NON-ASCII text content — the axis no prior kind
# touched (every other kind injects ASCII whitespace/`tok` strings).
# Probes the full F4-F8 surface (shrink/textOnly/tokenize/ngrams/
# getDomain), every lower()/trim()/regexp path, string ORDER BY /
# min/max (both engines binary-collate UTF-8, which a green sweep
# certifies), and the Java-vs-RE2 regex dialect. Hazards, by class:
# - combining marks: NFD vs NFC are DIFFERENT codepoint sequences —
#   no engine normalizes implicitly; byte-collation must agree.
# - zero-width (ZWSP/ZWJ/ZWNJ/BOM) and bidi marks (LRM/RLM): count
#   as codepoints in length(), survive trim(), invisible in output.
# - astral-plane emoji + ZWJ family sequences + skin-tone modifiers:
#   surrogate-pair handling (Java UTF-16) vs codepoint (RE2/UTF-8).
# - full-width letters/digits: case-map simply (agree), never parse
#   as numbers on either engine.
# - locale-special casefolds İ/ß/ﬁ/ı: lower('İ') GENUINELY diverges
#   (Java full mapping i+U+0307 vs utf8proc simple 'i') — oracles
#   that lower raw text must use java_lower_sql (the class fix this
#   kind exists to enforce); ß/ﬁ diverge only on upper(), which no
#   query applies. Final-sigma (ΑΣ) stays EXCLUDED: Java's
#   context-sensitive Final_Sigma rule cannot be expressed in RE2
#   (pinned in tests/test_text_robustness.py instead).
# - vertical tab \x0B: Java \s includes it, RE2 \s does NOT — the
#   one char where the engines' \s sets differ; both sides must
#   spell explicit whitespace classes (functions.text.WS_CLASS).
# - NBSP/NEL: in NEITHER engine's \s (agreement probed).
# - U+2126 OHM vs U+03A9 OMEGA: canonical-equivalence bait for any
#   accidental normalization.
TEXTUNI_POOL = [
    "Café combining NFD",
    "café precomposed NFC",
    "zero​width‍joins‌here",
    "﻿BOM prefixed",
    "\U0001F469‍\U0001F469‍\U0001F467‍\U0001F466 family",
    "\U0001F44D\U0001F3FD skin tone",
    "\U0001D518\U0001D52B\U0001D526 math letters",
    "ＦＵＬＬｗｉｄｔｈ１２３",
    "straße groß ß",
    "İstanbul İİ dotted",
    "ırmak ı dotless",
    "ﬁnancial ﬂow ﬁ",
    "µ micro µs",
    "vertical\x0btab split",
    "nbsp andnel",
    "עברית with english مزيج",
    "‏‎LRM RLM marks",
    "z̀́̂̃algo stack",
    "Ω ohm vs Ω omega",
]

# textuni targets: the string columns case-mapped / tokenized /
# regex'd / ordered by registered queries (events.event_type is every
# behavioral grouping key; documents.* is the whole F4-F8 + dedup
# surface; s_name/p_brand are entity-resolution + ordering keys).
TEXTUNI_INJECT: dict[str, list[str]] = {
    "events": ["event_type"],
    "documents": ["text", "lang", "source"],
    "supplier": ["s_name"],
    "part": ["p_brand"],
}

# ``--kind intedge``: sentinel INTEGERS into the integer VALUE columns
# no other kind touches (documents.n_chars is in no INJECT list at
# all — even its NULL path was unprobed; part.p_size got NULLs only).
# Hazards: zero (division guards), negatives (a "length" that isn't),
# type-width extremes (INT32_MIN/MAX for int32, +-2^62 for int64 —
# ordering, int->string casts, ANSI overflow on any arithmetic fold,
# percent_rank/ntile domains), and NULL (ordering + coalesce paths).
INTEDGE_POOL64 = [None, 0, -1, 2**31 - 1, -(2**31), 2**62, -(2**62)]
INTEDGE_POOL32 = [None, 0, -1, 2**31 - 1, -(2**31), 12345, -12345]
INTEDGE_INJECT: dict[str, list[str]] = {
    "documents": ["n_chars"],
    "part": ["p_size"],
}

# ``--kind keyfuzz``: referential-integrity poison into the JOIN-KEY /
# ID columns — the one column class NO prior kind ever touched (every
# kind above targets VALUE columns; keys appeared only as group-
# selection handles). Three production shapes, r11-judge ask:
# - NULL FKs: an observation whose parent pointer was never filled.
#   Inner joins drop it on both engines; the divergent surfaces are
#   outer-join NULL propagation, GROUP BY / PARTITION BY on a NULL
#   key (both engines group NULLs together — certified by a green
#   sweep), and any ORDER BY over a nullable key (Spark ASC=NULLS
#   FIRST vs DuckDB NULLS LAST — the datenull class, one axis over).
# - DANGLING FKs: ids outside the parent domain (dropped by inner
#   joins, NULL-filled by left joins, never matched by broadcast
#   remaps) plus NEGATIVE ids — a sentinel shape that probes every
#   `% n` bucketing for pmod-vs-% sign parity between engines.
# - DUPLICATED PK rows in supplier/part/orders/documents: joins fan
#   out, "keep-first/keep-latest" dedup tie-breaks must stay
#   deterministic, and any driver-side key→value dict silently
#   dedupes where a SQL join duplicates. Half the appended duplicates
#   are byte-identical (pure fan-out); half carry a CONFLICTING
#   attribute (" ~v2" on the name-like column, +1.0 on the measure)
#   — the two-versions-of-one-id production shape that makes
#   nondeterministic conflict resolution visible.
KEYFUZZ_FK: dict[str, list[str]] = {
    "nation": ["n_regionkey"],
    "customer": ["c_nationkey"],
    "supplier": ["s_nationkey"],
    "orders": ["o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["user_id"],
}
# dangling values fit int32 (smallest key width in the fixture)
KEYFUZZ_FK_POOL = [None, 10**9 + 7, 10**9 + 11, -1, -7]
# table -> (pk column, conflict column) — conflict col gets " ~v2"
# (string) or +1.0 (float) on the mutated half of the duplicates.
KEYFUZZ_PK: dict[str, tuple[str, str]] = {
    "supplier": ("s_suppkey", "s_name"),
    "part": ("p_partkey", "p_name"),
    "orders": ("o_orderkey", "o_totalprice"),
    "documents": ("doc_id", "text"),
}

# ``--kind extreme``: cycle pathological-but-representable doubles
# through FLOAT columns. Distinct from NaN: ±inf passes every
# ``NOT isnan`` guard yet overflows ANSI casts at cents boundaries;
# ±1e308 is finite and does the same; 2^53+1 probes integer-precision
# loss; 5e-324 is subnormal; -0.0 probes sign-of-zero canonicalization
# divergence between engines.
EXTREME_POOL = [
    float("inf"),
    float("-inf"),
    1e308,
    -1e308,
    9007199254740993.0,  # 2^53 + 1 → rounds to 2^53 in float64
    5e-324,              # smallest positive subnormal
    -0.0,
]

# ``--kind time``: cycle pathological-but-valid TIMESTAMPS through
# events.ts ONLY (event-time is the one column every window, session,
# watermark, and cohort derivation keys on). All values stay inside
# pandas' datetime64[ns] range so the driver's canon can represent
# them; what they probe is semantics, not representability: negative
# epochs (pre-1970 % vs pmod sign, epoch truncation direction),
# epoch zero, the 2038 32-bit rollover, a near-pandas-max future
# timestamp (advances any watermark past every real event - the
# classic poisoned-producer streaming failure), a leap-day instant
# with max microseconds.
TIME_POOL_US = [
    -14182940000000,          # 1969-07-20 20:17:40 (negative epoch)
    0,                        # 1970-01-01 00:00:00
    2147483648000000,         # 2038-01-19 03:14:08 (32-bit rollover)
    9214646400000000,         # 2262-01-01 00:00:00 (near pandas ns max)
    1709251199999999,         # 2024-02-29 23:59:59.999999 (leap day)
    -2208988800000000,        # 1900-01-01 00:00:00 (far pre-epoch)
]

# ``--kind empty``: write these tables with ZERO rows (schema intact).
# The production shape is an empty day/partition of the append-only
# streams — behavior analytics, corpus prep, and vector search all
# see no input while the dimension/fact backbone still exists. The
# TPC-H tables stay populated: the page/serve fixtures derive from
# orders, and an all-empty warehouse is a bootstrap error a pipeline
# SHOULD fail loudly on, not silently return empty results for.
EMPTY_TABLES = ["events", "documents", "embeddings"]


def _matrix_place(t: pa.Table, col: str, pool: list, tag: str) -> tuple[pa.Table, int]:
    """Deterministically place EVERY pool entry into ``col`` at least
    once: entries land on a contiguous row band whose offset is a
    stable function of the column name (staggered per column so poison
    spreads across groups instead of stacking on row 0). Built, not
    sampled — coverage is guaranteed, not probabilistic."""
    idx = t.column_names.index(col)
    arr = t.column(idx)
    n = len(t)
    if n == 0:
        return t, 0
    if len(pool) > n:
        raise ValueError(
            f"pool of {len(pool)} entries cannot fit {n}-row column {col}; "
            "grow the table first (_matrix_grow)"
        )
    offset = zlib.crc32(f"{tag}:{col}".encode()) % n
    vals = arr.to_pylist()
    for j, entry in enumerate(pool):
        vals[(offset + j) % n] = entry
    return t.set_column(idx, col, pa.array(vals, type=arr.type)), len(pool)


# table -> primary id column, used to mint FRESH keys when the matrix
# must grow a table smaller than a pool (region: 5 rows vs a 16-entry
# string pool) — tiled copies keep PK uniqueness so the growth itself
# doesn't smuggle in duplicate-PK hazards (keyfuzz owns those).
_MATRIX_PK: dict[str, str] = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def _matrix_grow(t: pa.Table, table: str, need: int) -> pa.Table:
    """Tile the table with fresh-PK copies of its rows until it has at
    least ``need`` rows."""
    if len(t) >= need or len(t) == 0 or table not in _MATRIX_PK:
        return t
    pk = _MATRIX_PK[table]
    pieces = [t]
    next_key = pc.max(t.column(pk)).as_py() + 1
    while sum(len(p) for p in pieces) < need:
        chunk = t.slice(0, min(len(t), need - sum(len(p) for p in pieces)))
        idx = chunk.column_names.index(pk)
        fresh = pa.array(
            range(next_key, next_key + len(chunk)), type=chunk.column(idx).type
        )
        pieces.append(chunk.set_column(idx, pk, fresh))
        next_key += len(chunk)
    return pa.concat_tables(pieces).combine_chunks()


def matrix_table(src: str, dst: str, table: str) -> dict[str, int]:
    """``--kind matrix``: the deterministic potency matrix (r11 judge
    ask). The probabilistic kinds left a coverage hole the r11 whois
    miss proved: at sf0.01 x rate 0.05 the VT pool entry lands in
    s_name in ~1 of 4 sweeps, so a divergence can survive many sweeps
    by luck. This fixture PLACES every pool entry of every kind into
    every eligible column at least once — pool x column coverage is
    guaranteed by construction, and one full-registry sweep over it
    certifies the whole matrix. Rate and seed are ignored."""
    t = pq.read_table(os.path.join(src, f"{table}.parquet")).combine_chunks()
    counts: dict[str, int] = {}
    biggest_pool = 2 + max(
        len(TEXT_POOL), len(JSON_POOL), len(TEXTUNI_POOL), len(EXTREME_POOL),
        len(INTEDGE_POOL64), len(TIME_POOL_US), len(KEYFUZZ_FK_POOL),
    )
    t = _matrix_grow(t, table, biggest_pool)
    # value columns: the mixed-kind cycle pools, typed
    for col in INJECT.get(table, []):
        if col not in t.column_names:
            continue
        arr = t.column(t.column_names.index(col))
        if pa.types.is_floating(arr.type):
            pool = [None, float("nan")] + EXTREME_POOL
        elif arr.type in (pa.string(), pa.large_string()):
            pool = [None] + (JSON_POOL if col == "props" else TEXT_POOL)
        elif pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
            continue  # element-level poison handled below
        else:
            pool = [None]
        t, k = _matrix_place(t, col, pool, "value")
        counts[col] = k
    # textuni pool into its own columns, on a DIFFERENT band than the
    # TEXT_POOL placement above (tag differs -> offset differs)
    for col in TEXTUNI_INJECT.get(table, []):
        if col in t.column_names:
            t, k = _matrix_place(t, col, TEXTUNI_POOL, "textuni")
            counts[f"{col}:uni"] = k
    for col in INTEDGE_INJECT.get(table, []):
        if col not in t.column_names:
            continue
        arr = t.column(t.column_names.index(col))
        pool = INTEDGE_POOL32 if arr.type.bit_width <= 32 else INTEDGE_POOL64
        t, k = _matrix_place(t, col, pool, "intedge")
        counts[f"{col}:int"] = k
    # time axes: event time + the dimension date axes
    time_pool = [
        pa.scalar(v, type=pa.timestamp("us")).as_py() for v in TIME_POOL_US
    ]
    if table == "events" and "ts" in t.column_names:
        t, k = _matrix_place(t, "ts", time_pool, "time")
        counts["ts"] = k
    for col in ("l_shipdate", "o_orderdate"):
        if col in t.column_names:
            t, k = _matrix_place(t, col, [None] + time_pool, "datenull")
            counts[f"{col}:date"] = k
    # referential integrity: FK pool + one identical and one
    # conflicting PK duplicate
    for col in KEYFUZZ_FK.get(table, []):
        if col in t.column_names:
            t, k = _matrix_place(t, col, KEYFUZZ_FK_POOL, "keyfuzz")
            counts[f"{col}:fk"] = k
    if table in KEYFUZZ_PK:
        pk_col, conflict_col = KEYFUZZ_PK[table]
        pick = zlib.crc32(f"matrix:{table}:{pk_col}".encode()) % max(1, len(t) - 1)
        dup = t.slice(pick, 2).combine_chunks()
        cidx = dup.column_names.index(conflict_col)
        carr = dup.column(cidx)
        odd = pa.array([False, True][: len(dup)])
        if pa.types.is_floating(carr.type):
            mutated = pc.add(carr, pa.scalar(1.0, type=carr.type))
        else:
            mutated = pc.binary_join_element_wise(
                pc.cast(carr, pa.string()), " ~v2", ""
            ).cast(carr.type)
        dup = dup.set_column(cidx, conflict_col, pc.if_else(odd, mutated, carr))
        t = pa.concat_tables([t, dup]).combine_chunks()
        counts[f"{pk_col}:dup"] = len(dup)
    # element-level vector poison: every vecpoison pool entry once,
    # plus one zero-length vector
    vec_pool = [None, float("nan"), float("inf"), float("-inf"), 1e10, -1e10, 1e38]
    for col in t.column_names:
        arr = t.column(t.column_names.index(col))
        if not (
            pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type)
        ) or not pa.types.is_floating(arr.type.value_type):
            continue
        vals = arr.to_pylist()
        n = len(vals)
        if n == 0:
            continue
        offset = zlib.crc32(f"vec:{col}".encode()) % n
        for j, entry in enumerate(vec_pool):
            ri = (offset + j) % n
            if vals[ri]:
                v = list(vals[ri])
                v[j % len(v)] = entry
                vals[ri] = v
        vals[(offset + len(vec_pool)) % n] = []
        t = t.set_column(
            t.column_names.index(col), col, pa.array(vals, type=arr.type)
        )
        counts[f"{col}:vec"] = len(vec_pool) + 1
    pq.write_table(t, os.path.join(dst, f"{table}.parquet"))
    return counts


def _group_mask(key_arr: pa.ChunkedArray, seed: int, pct: int = 7) -> pa.Array:
    """Deterministic ~pct% of group keys, independent of row order:
    crc32(seed:key) % 100 < pct."""
    keys = key_arr.to_numpy(zero_copy_only=False)
    sel = np.array(
        [zlib.crc32(f"{seed}:{k}".encode()) % 100 < pct for k in keys], dtype=bool
    )
    return pa.array(sel)


def fuzz_table(
    src: str, dst: str, table: str, rate: float, seed: int, kind: str = "null"
) -> dict[str, int]:
    """kind='null' injects NULLs into every eligible column;
    kind='nan' injects float NaN into DOUBLE/FLOAT columns only (NaN
    and NULL have different grouping/ordering/aggregate semantics —
    both occur in production float columns)."""
    # combine_chunks: pc.if_else over a multi-chunk string column
    # produces corrupt binary offsets ("First or last binary offset
    # out of bounds" at write time) in this pyarrow build; sf0.01
    # tables fit one chunk, sf0.1 tables don't — the single-chunk
    # rewrite makes every kind safe at every scale
    t = pq.read_table(os.path.join(src, f"{table}.parquet")).combine_chunks()
    counts: dict[str, int] = {}
    if kind == "empty":
        if table in EMPTY_TABLES:
            t = t.slice(0, 0)
            counts["__rows_dropped__"] = len(
                pq.read_table(os.path.join(src, f"{table}.parquet"))
            )
        pq.write_table(t, os.path.join(dst, f"{table}.parquet"))
        return counts
    if kind == "text":
        rows = len(t)
        for col in INJECT.get(table, []):
            if col not in t.column_names:
                continue
            idx = t.column_names.index(col)
            arr = t.column(idx)
            if arr.type not in (pa.string(), pa.large_string()):
                continue
            pool = JSON_POOL if col == "props" else TEXT_POOL
            rng = np.random.default_rng(zlib.crc32(f"{seed}:{table}:{col}".encode()))
            mask = pa.array(rng.random(rows) < rate)
            repl = pa.array(
                [pool[i % len(pool)] for i in range(rows)], type=arr.type
            )
            t = t.set_column(idx, col, pc.if_else(mask, repl, arr))
            counts[col] = int(pc.sum(mask).as_py() or 0)
        pq.write_table(t, os.path.join(dst, f"{table}.parquet"))
        return counts
    if kind == "intedge":
        for col in INTEDGE_INJECT.get(table, []):
            if col not in t.column_names:
                continue
            idx = t.column_names.index(col)
            arr = t.column(idx)
            if not pa.types.is_integer(arr.type):
                continue
            pool = INTEDGE_POOL32 if arr.type.bit_width <= 32 else INTEDGE_POOL64
            rng = np.random.default_rng(
                zlib.crc32(f"{seed}:{table}:{col}:intedge".encode())
            )
            mask = pa.array(rng.random(len(t)) < rate)
            repl = pa.array(
                [pool[i % len(pool)] for i in range(len(t))], type=arr.type
            )
            t = t.set_column(idx, col, pc.if_else(mask, repl, arr))
            counts[col] = int(pc.sum(mask).as_py() or 0)
        pq.write_table(t, os.path.join(dst, f"{table}.parquet"))
        return counts
    if kind == "textuni":
        rows = len(t)
        for col in TEXTUNI_INJECT.get(table, []):
            if col not in t.column_names:
                continue
            idx = t.column_names.index(col)
            arr = t.column(idx)
            if arr.type not in (pa.string(), pa.large_string()):
                continue
            rng = np.random.default_rng(
                zlib.crc32(f"{seed}:{table}:{col}:textuni".encode())
            )
            mask = pa.array(rng.random(rows) < rate)
            repl = pa.array(
                [TEXTUNI_POOL[i % len(TEXTUNI_POOL)] for i in range(rows)],
                type=arr.type,
            )
            t = t.set_column(idx, col, pc.if_else(mask, repl, arr))
            counts[col] = int(pc.sum(mask).as_py() or 0)
        pq.write_table(t, os.path.join(dst, f"{table}.parquet"))
        return counts
    if kind in ("nullcat", "nancat"):
        if table not in CAT_INJECT:
            pq.write_table(t, os.path.join(dst, f"{table}.parquet"))
            return counts
        key_col, cols = CAT_INJECT[table]
        first = pc.min(t.column(key_col)).as_py()
        mask = pc.equal(t.column(key_col), first)
        for col in cols:
            idx = t.column_names.index(col)
            arr = t.column(idx)
            if kind == "nancat" and arr.type not in (pa.float64(), pa.float32()):
                continue
            poison = (
                pa.scalar(float("nan"), type=arr.type)
                if kind == "nancat"
                else pa.scalar(None, type=arr.type)
            )
            t = t.set_column(idx, col, pc.if_else(mask, poison, arr))
            counts[f"{col}[{key_col}={first}]"] = int(pc.sum(mask).as_py() or 0)
        pq.write_table(t, os.path.join(dst, f"{table}.parquet"))
        return counts
    if kind in ("nullgroup", "nangroup", "extremegroup"):
        if table not in GROUP_INJECT:
            pq.write_table(t, os.path.join(dst, f"{table}.parquet"))
            return counts
        key_col, cols = GROUP_INJECT[table]
        mask = _group_mask(t.column(key_col), seed)
        for col in cols:
            idx = t.column_names.index(col)
            arr = t.column(idx)
            if kind in ("nangroup", "extremegroup") and arr.type not in (
                pa.float64(), pa.float32()
            ):
                continue
            if kind == "extremegroup":
                # every value of the selected groups becomes an
                # extreme (cycled) — manufactures "customer whose
                # every price is out-of-domain" so per-group
                # aggregates go NULL through the finite_measure
                # boundary, the extreme twin of nullgroup
                repl = pa.array(
                    [EXTREME_POOL[i % len(EXTREME_POOL)] for i in range(len(t))],
                    type=arr.type,
                )
                t = t.set_column(idx, col, pc.if_else(mask, repl, arr))
            else:
                poison = (
                    pa.scalar(float("nan"), type=arr.type)
                    if kind == "nangroup"
                    else pa.scalar(None, type=arr.type)
                )
                t = t.set_column(idx, col, pc.if_else(mask, poison, arr))
            counts[col] = int(pc.sum(mask).as_py() or 0)
        pq.write_table(t, os.path.join(dst, f"{table}.parquet"))
        return counts
    if kind in ("keyfuzz", "keyfk", "keydup"):
        # keyfk/keydup: single-hazard sub-kinds for finding triage —
        # same placement code, FK poison only / PK duplication only.
        # FK poison: NULL / dangling / negative ids at row rate.
        for col in KEYFUZZ_FK.get(table, []) if kind != "keydup" else []:
            if col not in t.column_names:
                continue
            idx = t.column_names.index(col)
            arr = t.column(idx)
            rng = np.random.default_rng(
                zlib.crc32(f"{seed}:{table}:{col}:keyfuzz".encode())
            )
            mask = pa.array(rng.random(len(t)) < rate)
            repl = pa.array(
                [KEYFUZZ_FK_POOL[i % len(KEYFUZZ_FK_POOL)] for i in range(len(t))],
                type=arr.type,
            )
            t = t.set_column(idx, col, pc.if_else(mask, repl, arr))
            counts[col] = int(pc.sum(mask).as_py() or 0)
        # PK duplication: append rate/2 of rows again — even slots
        # byte-identical (pure fan-out), odd slots with one mutated
        # attribute (conflicting versions of the same id).
        if table in KEYFUZZ_PK and kind != "keyfk":
            pk_col, conflict_col = KEYFUZZ_PK[table]
            rng = np.random.default_rng(
                zlib.crc32(f"{seed}:{table}:{pk_col}:keydup".encode())
            )
            mask = rng.random(len(t)) < rate / 2
            dup = t.filter(pa.array(mask)).combine_chunks()
            if len(dup):
                cidx = dup.column_names.index(conflict_col)
                carr = dup.column(cidx)
                odd = pa.array(np.arange(len(dup)) % 2 == 1)
                if pa.types.is_floating(carr.type):
                    mutated = pc.add(carr, pa.scalar(1.0, type=carr.type))
                else:
                    mutated = pc.binary_join_element_wise(
                        pc.cast(carr, pa.string()), " ~v2", ""
                    ).cast(carr.type)
                dup = dup.set_column(
                    cidx, conflict_col, pc.if_else(odd, mutated, carr)
                )
                t = pa.concat_tables([t, dup]).combine_chunks()
                counts[f"{pk_col}__dup_rows"] = len(dup)
        pq.write_table(t, os.path.join(dst, f"{table}.parquet"))
        return counts
    if kind == "time":
        if table != "events":
            pq.write_table(t, os.path.join(dst, f"{table}.parquet"))
            return counts
        idx = t.column_names.index("ts")
        arr = t.column(idx)
        rng = np.random.default_rng(zlib.crc32(f"{seed}:{table}:ts".encode()))
        mask = pa.array(rng.random(len(t)) < rate)
        repl = pa.array(
            [TIME_POOL_US[i % len(TIME_POOL_US)] for i in range(len(t))],
            type=pa.timestamp("us"),
        ).cast(arr.type)
        t = t.set_column(idx, "ts", pc.if_else(mask, repl, arr.combine_chunks()))
        counts["ts"] = int(pc.sum(mask).as_py() or 0)
        pq.write_table(t, os.path.join(dst, f"{table}.parquet"))
        return counts
    if kind == "infpair":
        # BOTH ±1e308 extremes deliberately paired on ADJACENT rows of
        # every float column. The ± pair itself telescopes to exactly
        # 0.0 in any order — the hazard is CANCELLATION SWALLOWING:
        # whatever partial sum precedes the pair is absorbed
        # (x + 1e308 == 1e308 exactly for any |x| < ~2e292, so the
        # subsequent -1e308 zeroes the accumulator, losing x), and
        # which values are "before the pair" depends on each engine's
        # fold order and partial-aggregation boundaries — an UNGATED
        # float sum over a group containing a pair diverges by the
        # swallowed amount. A green full sweep certifies every
        # registered float sum either drops corrupt measurements at
        # ingestion (finite_measure) or never groups a pair. Adjacent
        # pairing makes group co-location the default for coarse
        # groupings instead of the mixed kind's seed luck. Pairs are
        # non-overlapping by construction (a start consumes its
        # partner slot) so every + has exactly one adjacent -.
        for col in INJECT.get(table, []):
            if col not in t.column_names:
                continue
            idx = t.column_names.index(col)
            arr = t.column(idx)
            if arr.type not in (pa.float64(), pa.float32()):
                continue
            rng = np.random.default_rng(
                zlib.crc32(f"{seed}:{table}:{col}:infpair".encode())
            )
            n = len(t)
            raw = rng.random(n) < rate / 2
            starts = np.zeros(n, dtype=bool)
            i = 0
            while i < n - 1:
                if raw[i]:
                    starts[i] = True
                    i += 2  # the partner slot is consumed
                else:
                    i += 1
            partners = np.zeros(n, dtype=bool)
            partners[1:] = starts[:-1]
            # 1e308 cast to float32 silently becomes +inf, turning the
            # telescoping pair into NaN poisoning (inf + -inf) — a
            # different hazard than the cancellation-swallowing this
            # kind exists to probe. Use a float32-representable extreme
            # there so the pair still sums to exactly 0.0.
            mag = 1e38 if arr.type == pa.float32() else 1e308
            out = pc.if_else(pa.array(starts), pa.scalar(mag, type=arr.type), arr)
            out = pc.if_else(pa.array(partners), pa.scalar(-mag, type=arr.type), out)
            t = t.set_column(idx, col, out)
            counts[col] = int(starts.sum() + partners.sum())
        pq.write_table(t, os.path.join(dst, f"{table}.parquet"))
        return counts
    if kind == "datenull":
        # NULL + pathological-but-valid timestamps into the DIMENSION
        # time axes (l_shipdate, o_orderdate) the `time` kind never
        # touches (it owns events.ts only). The sharp hazard is the
        # NULL: Spark windows sort NULLS FIRST on ASC by default,
        # DuckDB sorts NULLS LAST — any per-group series walk ordered
        # by a nullable date silently shifts every lag/rank between
        # engines. The extremes probe calendar arithmetic off the
        # fixture's narrow 2024 band.
        for col in ("l_shipdate", "o_orderdate"):
            if col not in t.column_names:
                continue
            idx = t.column_names.index(col)
            arr = t.column(idx)
            rng = np.random.default_rng(
                zlib.crc32(f"{seed}:{table}:{col}:datenull".encode())
            )
            mask = pa.array(rng.random(len(t)) < rate)
            pool = [None] + TIME_POOL_US
            repl = pa.array(
                [pool[i % len(pool)] for i in range(len(t))],
                type=pa.timestamp("us"),
            ).cast(arr.type)
            t = t.set_column(idx, col, pc.if_else(mask, repl, arr.combine_chunks()))
            counts[col] = int(pc.sum(mask).as_py() or 0)
        pq.write_table(t, os.path.join(dst, f"{table}.parquet"))
        return counts
    if kind == "vecpoison":
        pool = [
            None, float("nan"), float("inf"), float("-inf"),
            1e10, -1e10, 1e38,
        ]
        for col in t.column_names:
            idx = t.column_names.index(col)
            arr = t.column(idx)
            if not (
                pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type)
            ) or not pa.types.is_floating(arr.type.value_type):
                continue
            rng = np.random.default_rng(
                zlib.crc32(f"{seed}:{table}:{col}:vecpoison".encode())
            )
            vals = arr.to_pylist()
            k = 0
            for ri in range(len(vals)):
                if vals[ri] is None or rng.random() >= rate:
                    continue
                if k % 8 == 7:
                    vals[ri] = []  # zero-length vector
                elif vals[ri]:
                    v = list(vals[ri])
                    v[int(rng.integers(len(v)))] = pool[k % len(pool)]
                    vals[ri] = v
                k += 1
            t = t.set_column(idx, col, pa.array(vals, type=arr.type))
            counts[col] = k
        pq.write_table(t, os.path.join(dst, f"{table}.parquet"))
        return counts
    if kind == "mixed":
        # every poison class at once, interleaved per row — the shape
        # real production data has (a NULL category, a NaN metric,
        # an inf outlier, and an emoji string CAN share one group):
        # floats cycle NULL+NaN+extremes, strings cycle NULL+text
        # adversaries, other types take NULLs; since r10, the
        # dimension date axes additionally cycle NULL+sentinel clocks
        # (the datenull pool), so a NULL ship date and a poisoned
        # price CAN share one observation. Interactions between
        # per-axis fixes (e.g. NULL-key ordering x extreme-value
        # exclusion in the same window) only surface here.
        # r12: the referential-integrity axes join the interleave —
        # FK poison at half rate, so a NULL fk and a poisoned value
        # CAN share one row, and PK duplicates are appended LAST
        # (below) so duplicated rows carry poisoned attributes too.
        for col in KEYFUZZ_FK.get(table, []):
            if col not in t.column_names:
                continue
            idx = t.column_names.index(col)
            arr = t.column(idx)
            rng = np.random.default_rng(
                zlib.crc32(f"{seed}:{table}:{col}:mixed-key".encode())
            )
            mask = pa.array(rng.random(len(t)) < rate / 2)
            repl = pa.array(
                [KEYFUZZ_FK_POOL[i % len(KEYFUZZ_FK_POOL)] for i in range(len(t))],
                type=arr.type,
            )
            t = t.set_column(idx, col, pc.if_else(mask, repl, arr))
            counts[f"{col}:fk"] = int(pc.sum(mask).as_py() or 0)
        for col in ("l_shipdate", "o_orderdate"):
            if col not in t.column_names:
                continue
            idx = t.column_names.index(col)
            arr = t.column(idx)
            rng = np.random.default_rng(
                zlib.crc32(f"{seed}:{table}:{col}:mixed".encode())
            )
            mask = pa.array(rng.random(len(t)) < rate)
            pool = [None] + TIME_POOL_US
            repl = pa.array(
                [pool[i % len(pool)] for i in range(len(t))],
                type=pa.timestamp("us"),
            ).cast(arr.type)
            t = t.set_column(idx, col, pc.if_else(mask, repl, arr.combine_chunks()))
            counts[col] = int(pc.sum(mask).as_py() or 0)
        # r11: the integer value axes join the interleave too
        for col in INTEDGE_INJECT.get(table, []):
            if col not in t.column_names:
                continue
            idx = t.column_names.index(col)
            arr = t.column(idx)
            if not pa.types.is_integer(arr.type):
                continue
            pool = INTEDGE_POOL32 if arr.type.bit_width <= 32 else INTEDGE_POOL64
            rng = np.random.default_rng(
                zlib.crc32(f"{seed}:{table}:{col}:mixed".encode())
            )
            mask = pa.array(rng.random(len(t)) < rate)
            repl = pa.array(
                [pool[i % len(pool)] for i in range(len(t))], type=arr.type
            )
            t = t.set_column(idx, col, pc.if_else(mask, repl, arr))
            counts[col] = int(pc.sum(mask).as_py() or 0)
        for col in INJECT.get(table, []):
            if col not in t.column_names:
                continue
            idx = t.column_names.index(col)
            arr = t.column(idx)
            rng = np.random.default_rng(zlib.crc32(f"{seed}:{table}:{col}:mixed".encode()))
            mask = pa.array(rng.random(len(t)) < rate)
            if arr.type in (pa.float64(), pa.float32()):
                pool = [None, float("nan")] + EXTREME_POOL
                repl = pa.array(
                    [pool[i % len(pool)] for i in range(len(t))], type=arr.type
                )
            elif arr.type in (pa.string(), pa.large_string()):
                # since r11 the string cycle ALSO carries the textuni
                # hazards, so a NULL category, a NaN metric, an İ/VT
                # string, and a sentinel date CAN share one group —
                # per-axis fixes are only proven composable here
                pool = [None] + (
                    JSON_POOL if col == "props" else TEXT_POOL + TEXTUNI_POOL
                )
                repl = pa.array(
                    [pool[i % len(pool)] for i in range(len(t))], type=arr.type
                )
            else:
                repl = pa.nulls(len(t), type=arr.type)
            t = t.set_column(idx, col, pc.if_else(mask, repl, arr))
            counts[col] = int(pc.sum(mask).as_py() or 0)
        # r12: PK duplicates appended AFTER all value poison, so the
        # duplicated rows carry poisoned attributes too (half
        # byte-identical, half with the keydup conflict mutation)
        if table in KEYFUZZ_PK:
            pk_col, conflict_col = KEYFUZZ_PK[table]
            rng = np.random.default_rng(
                zlib.crc32(f"{seed}:{table}:{pk_col}:mixed-dup".encode())
            )
            dmask = rng.random(len(t)) < rate / 4
            dup = t.filter(pa.array(dmask)).combine_chunks()
            if len(dup):
                cidx = dup.column_names.index(conflict_col)
                carr = dup.column(cidx)
                odd = pa.array(np.arange(len(dup)) % 2 == 1)
                if pa.types.is_floating(carr.type):
                    mutated = pc.add(carr, pa.scalar(1.0, type=carr.type))
                else:
                    mutated = pc.binary_join_element_wise(
                        pc.cast(carr, pa.string()), " ~v2", "",
                        null_handling="replace", null_replacement="~v2",
                    ).cast(carr.type)
                dup = dup.set_column(
                    cidx, conflict_col, pc.if_else(odd, mutated, carr)
                )
                t = pa.concat_tables([t, dup]).combine_chunks()
                counts[f"{pk_col}:dup"] = len(dup)
        pq.write_table(t, os.path.join(dst, f"{table}.parquet"))
        return counts
    for col in INJECT.get(table, []):
        if col not in t.column_names:
            continue
        idx = t.column_names.index(col)
        arr = t.column(idx)
        if kind in ("nan", "extreme") and arr.type not in (pa.float64(), pa.float32()):
            continue
        if kind == "extreme":
            rng = np.random.default_rng(zlib.crc32(f"{seed}:{table}:{col}".encode()))
            mask = pa.array(rng.random(len(t)) < rate)
            repl = pa.array(
                [EXTREME_POOL[i % len(EXTREME_POOL)] for i in range(len(t))],
                type=arr.type,
            )
            t = t.set_column(idx, col, pc.if_else(mask, repl, arr))
            counts[col] = int(pc.sum(mask).as_py() or 0)
            continue
        # stable across processes (str hash() is salted per-process)
        rng = np.random.default_rng(zlib.crc32(f"{seed}:{table}:{col}".encode()))
        mask = pa.array(rng.random(len(t)) < rate)
        poison = (
            pa.scalar(float("nan"), type=arr.type)
            if kind == "nan"
            else pa.scalar(None, type=arr.type)
        )
        t = t.set_column(idx, col, pc.if_else(mask, poison, arr))
        counts[col] = int(pc.sum(mask).as_py() or 0)
    pq.write_table(t, os.path.join(dst, f"{table}.parquet"))
    return counts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument("--dst", default="/tmp/nullfuzz_sf0.001")
    ap.add_argument("--rate", type=float, default=0.03)
    ap.add_argument("--seed", type=int, default=5)
    ap.add_argument(
        "--kind",
        choices=[
            "null", "nan", "nullgroup", "nangroup", "extremegroup",
            "nullcat", "nancat", "text", "empty", "extreme", "mixed", "time",
            "infpair", "vecpoison", "datenull", "textuni", "intedge",
            "keyfuzz", "keyfk", "keydup", "matrix",
        ],
        default="null",
    )
    args = ap.parse_args()

    os.makedirs(args.dst, exist_ok=True)
    total = 0
    for table in TABLES:
        if args.kind == "matrix":
            counts = matrix_table(args.src, args.dst, table)
        else:
            counts = fuzz_table(args.src, args.dst, table, args.rate, args.seed, args.kind)
        total += sum(counts.values())
        print(f"{table}: {counts}")
    print(
        f"wrote {args.dst} with {total} injected {args.kind.upper()}s "
        f"(rate={args.rate}, seed={args.seed})"
    )


if __name__ == "__main__":
    main()
