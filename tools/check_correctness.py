"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 (or --sf-dir) and compares
against ``oracle_sql()`` via DuckDB: row count, sorted column names,
and an order-insensitive value hash (rows canonicalized then sorted).

Usage: python tools/check_correctness.py [query ...]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0  # normalize -0.0
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def frame_hash(cols: list[str], rows: list[tuple]) -> tuple[str, list[str]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return h, lines


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from htmlentityextraction_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("correctness-check")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or list(qs)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    failures = 0
    for name in names:
        t0 = time.time()
        sdf = qs[name](spark, args.sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"{name}: rows-only ({len(srows)} rows, {t_spark:.1f}s spark)")
            continue
        t0 = time.time()
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        t_duck = time.time() - t0
        ok_count = len(srows) == len(drows)
        ok_schema = sorted(scols) == sorted(dcols)
        sh, slines = frame_hash(scols, srows)
        dh, dlines = frame_hash(dcols, drows)
        ok_hash = sh == dh
        status = "OK" if (ok_count and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{name}: {status} rows={len(srows)}/{len(drows)} "
            f"schema={'ok' if ok_schema else f'{sorted(scols)} vs {sorted(dcols)}'} "
            f"hash={'ok' if ok_hash else f'{sh} vs {dh}'} "
            f"({t_spark:.1f}s spark, {t_duck:.1f}s duck)"
        )
        if not ok_hash and ok_schema:
            sset, dset = set(slines), set(dlines)
            for line in list(sset - dset)[:3]:
                print(f"   spark-only: {line[:200]}")
            for line in list(dset - sset)[:3]:
                print(f"   duck-only:  {line[:200]}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
