"""Order-controlled in-session A/B harness (the THROUGHPUT.md round-10
protocol lesson: an arm that always runs last inherits the warmest JVM,
so arms must interleave in ONE session).

Arms are environment toggles read per-call by the code under test
(e.g. SPARK_GRAFT_SCAN_REPARTITION). Pattern: warmup, then ABBA BAAB
(each arm runs 4 times, order-balanced); report per-query middle-two
medians per arm.

Usage:
  python tools/ab_bench.py --env SPARK_GRAFT_SCAN_REPARTITION --a 0 --b 1 \
      --queries dedup_minhash_lsh,text_quality_profile [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", required=True)
    ap.add_argument("--a", required=True)
    ap.add_argument("--b", required=True)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--rounds", type=int, default=4, help="runs per arm (order-balanced)")
    args = ap.parse_args()

    from htmlentityextraction_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark("ab-bench")
    qs = entry.queries()
    names = [n for n in args.queries.split(",") if n]

    def run_once(name: str) -> float:
        t0 = time.time()
        df = qs[name](spark, args.sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    # arm order: ABBA BAAB ... (balanced within every pair of rounds)
    order = []
    for i in range(args.rounds):
        order += (["a", "b", "b", "a"] if i % 2 == 0 else ["b", "a", "a", "b"])
    order = order[: args.rounds * 2]

    results: dict[str, dict[str, list[float]]] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"ab:{name}")
        os.environ[args.env] = args.a
        run_once(name)  # warmup (arm a shape), not recorded
        os.environ[args.env] = args.b
        run_once(name)  # warmup (arm b shape), not recorded
        times: dict[str, list[float]] = {"a": [], "b": []}
        for arm in order:
            os.environ[args.env] = args.a if arm == "a" else args.b
            times[arm].append(run_once(name))
        results[name] = times
        med = {k: round(statistics.median(v), 3) for k, v in times.items()}
        print(
            f"# {name}: A({args.env}={args.a}) med {med['a']}s {times['a']} | "
            f"B(={args.b}) med {med['b']}s {times['b']}",
            file=sys.stderr,
        )
    print(json.dumps({
        n: {
            "a_median": round(statistics.median(t["a"]), 3),
            "b_median": round(statistics.median(t["b"]), 3),
            "a_runs": t["a"], "b_runs": t["b"],
        } for n, t in results.items()
    }))
    spark.stop()


if __name__ == "__main__":
    main()
