"""One-decade scale probe: sf0.1 → sf1 for the three worst 0.01→0.1
scalers from SCALE_PROBE.md (`setsim_prefix_join_docs` ×3.09,
`pagerank_copurchase_parts` ×2.89, `exact_substring_dup_spans`
×2.58 per 10×). VERDICT r6 item 6.

The driver only ships sf ≤ 0.1, so the sf1 inputs are DERIVED from
sf0.1 by 10-fold replication with structure-preserving key/token
isolation (documented fixture, not driver data — ratios are the
point, not absolutes):

- ``lineitem``: replica i shifts l_orderkey by i*(max+1) and
  l_partkey by i*(max+1) → the co-purchase graph becomes 10 disjoint
  copies: 10× vertices, 10× edges, identical local structure (the
  TPC-H scaling shape: more orders/parts, same per-key cardinality).
- ``documents``: replica i shifts doc_id and applies a PER-REPLICA
  LETTER SUBSTITUTION CIPHER (a seeded bijection on a-z/A-Z;
  replica 0 is the identity, i.e. sf0.1 verbatim). A bijection on
  the alphabet maps every token and every char shingle 1:1, so
  WITHIN a replica all token-set and shingle-set structure — the
  same duplicate clusters, the same Jaccard values, bit-for-bit —
  is preserved, while ACROSS replicas tokens and shingles are
  images under different ciphers and collide only at noise level.
  The round-7 fixture instead SUFFIX-salted every word, which is
  sound for token operators but catastrophically wrong for char-
  shingle ones: every word ending in the same 2-char suffix lifts
  UNRELATED-doc shingle Jaccard from ~0.18 to ~0.52 (measured) —
  past the 0.5 near-dup threshold — so the sf1 corpus became one
  giant near-dup clique (44.6M verified pairs vs 256 at sf0.1) and
  the minhash probe measured a pathological workload the operator
  never claims. The cipher keeps per-replica pair counts at exactly
  sf0.1's, the honest 10× shape for every documents operator.

Run AFTER generation on an otherwise-idle box:
    python tools/sf1_probe.py --generate   # build /tmp/sf1_probe
    python tools/sf1_probe.py              # timed probe, prints JSON
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1_probe"
PROBES = [
    "setsim_prefix_join_docs",
    "pagerank_copurchase_parts",
    "exact_substring_dup_spans",
    # r8 addition: next-worst 0.01→0.1 grower (×2.36), documents-only
    "dedup_minhash_lsh",
]
REPLICAS = 10


def generate() -> None:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(DST, exist_ok=True)

    li = pq.read_table(os.path.join(SRC, "lineitem.parquet")).combine_chunks()
    ok_shift = int(pc.max(li.column("l_orderkey")).as_py()) + 1
    pk_shift = int(pc.max(li.column("l_partkey")).as_py()) + 1
    parts = []
    for i in range(REPLICAS):
        t = li
        t = t.set_column(
            t.column_names.index("l_orderkey"),
            "l_orderkey",
            pc.add(t.column("l_orderkey"), i * ok_shift),
        )
        t = t.set_column(
            t.column_names.index("l_partkey"),
            "l_partkey",
            pc.add(t.column("l_partkey"), i * pk_shift),
        )
        parts.append(t)
    pq.write_table(pa.concat_tables(parts), os.path.join(DST, "lineitem.parquet"))

    import random
    import string

    docs = pq.read_table(os.path.join(SRC, "documents.parquet")).combine_chunks()
    id_shift = int(pc.max(docs.column("doc_id")).as_py()) + 1
    texts = docs.column("text").to_pylist()
    parts = []
    for i in range(REPLICAS):
        if i == 0:
            ciphered = docs.column("text")  # identity: sf0.1 verbatim
        else:
            perm = list(string.ascii_lowercase)
            random.Random(i).shuffle(perm)
            table = str.maketrans(
                string.ascii_lowercase + string.ascii_uppercase,
                "".join(perm) + "".join(perm).upper(),
            )
            ciphered = pa.array(
                [None if t is None else t.translate(table) for t in texts],
                type=docs.column("text").type,
            )
        t = docs.set_column(
            docs.column_names.index("doc_id"),
            "doc_id",
            pc.add(docs.column("doc_id"), i * id_shift),
        )
        t = t.set_column(t.column_names.index("text"), "text", ciphered)
        parts.append(t)
    pq.write_table(pa.concat_tables(parts), os.path.join(DST, "documents.parquet"))
    print(
        f"wrote {DST}: lineitem x{REPLICAS} (key-shifted), "
        f"documents x{REPLICAS} (per-replica letter cipher)"
    )


def probe() -> None:
    from htmlentityextraction_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark("sf1-probe")
    qs = entry.queries()
    out = {"loadavg_1m_at_start": round(os.getloadavg()[0], 2)}

    def run(name: str, sf_dir: str) -> float:
        ts = []
        for _ in range(3):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 2))
        return sorted(ts)[1]  # median-of-3, run 1 absorbs warm-up

    for name in PROBES:
        t01 = run(name, SRC)
        t1 = run(name, DST)
        out[name] = {
            "sf0.1_s": t01,
            "sf1_s": t1,
            "ratio_per_10x": round(t1 / t01, 2),
        }
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


def hash_check() -> int:
    """Correctness at sf1, not just wall time (VERDICT r7 item 2): run
    the driver-mirroring compare (Spark query vs DuckDB oracle, row
    count + schema + order-insensitive value hash) over the derived
    sf1 fixtures for every probed query. Delegates to
    tools/check_correctness.py with --sf-dir pointed at the fixture
    dir (which registers only the tables the fixture ships)."""
    import subprocess

    cmd = [
        sys.executable,
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "check_correctness.py"),
        "--sf-dir",
        DST,
        *PROBES,
    ]
    return subprocess.call(cmd)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--generate", action="store_true")
    ap.add_argument(
        "--hash-check",
        action="store_true",
        help="driver-mirroring hash compare of the probed queries at sf1",
    )
    args = ap.parse_args()
    if args.generate:
        generate()
    elif args.hash_check:
        raise SystemExit(hash_check())
    else:
        probe()
