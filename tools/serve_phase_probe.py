"""Per-run phase timing for stream_serve_pipeline (r12 continuation).

Mirrors the query body (queries/serve_q.stream_serve_pipeline) but
times each phase separately, N consecutive runs in ONE session, to
attribute the bench's warm-up tail (fresh benches decay
12.9 -> 8.9 -> 7.6 s across the median-of-3) to a phase:

  registry  — _registry_rows (fit_once cache: run 1 only)
  fixture   — _page_messages write to parquet (incl. keyfuzz dedup)
  stream    — serve_stream availableNow start->done
  readback  — read historical/ + noop write (the bench's timed action)

Usage: python tools/serve_phase_probe.py [--runs 6] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=6)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from htmlentityextraction_spark.session import get_spark
    from htmlentityextraction_spark.queries.ml import _registry_rows
    from htmlentityextraction_spark.queries.serve_q import _page_messages
    from htmlentityextraction_spark.streaming import serve

    spark = get_spark("serve-phase-probe")
    sf_dir = args.sf_dir

    # same warmup as bench.py (untimed)
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long").count()

    rows = []
    try:
        for i in range(args.runs):
            t0 = time.time()
            registry = _registry_rows(spark, sf_dir)
            t1 = time.time()
            src = tempfile.mkdtemp(prefix="serve_probe_src_")
            out = tempfile.mkdtemp(prefix="serve_probe_out_")
            try:
                _page_messages(spark, sf_dir).write.mode("overwrite").parquet(src)
                t2 = time.time()
                raw = spark.readStream.schema("value string").parquet(src)
                serve.serve_stream(spark, raw, registry, out).await_done()
                t3 = time.time()
                df = spark.read.parquet(os.path.join(out, "historical"))
                df.write.format("noop").mode("overwrite").save()
                t4 = time.time()
            finally:
                # ADVICE r12: clean up even when a run dies mid-iteration
                shutil.rmtree(src, ignore_errors=True)
                shutil.rmtree(out, ignore_errors=True)
            rec = {
                "run": i + 1,
                "registry": round(t1 - t0, 3),
                "fixture": round(t2 - t1, 3),
                "stream": round(t3 - t2, 3),
                "readback": round(t4 - t3, 3),
                "total": round(t4 - t0, 3),
            }
            rows.append(rec)
            print(f"# {rec}", file=sys.stderr)
        print(json.dumps(rows))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
