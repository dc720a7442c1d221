"""TRUE multi-process writer race on the merge table: two live OS
processes (each its own SparkSession/JVM) concurrently stage + commit
merges against ONE table. The in-process crash matrix
(test_drop_widen.py) walks residue states; this walks the live race
the OCC commit path (`operators/incremental.py::commit`,
`_acquire_lock`) exists to arbitrate:

- exactly one writer wins each version (no double-granted lock —
  the version set the two writers report is a disjoint partition of
  the contiguous history),
- the loser's retry (re-stage on the new base) converges, so no
  merge is ever lost: a shared counter key every merge increments
  via ``combine={"n": "sum"}`` must end at the total merge count —
  one lost update and the sum comes up short,
- concurrent readers never see a torn manifest: the parent polls the
  manifest file throughout and requires valid JSON with a
  monotonically non-decreasing version.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WRITER = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from htmlentityextraction_spark.operators.incremental import (
    ConcurrentWriteError,
    ParquetMergeTable,
)

path, wid, wkey, n = sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
spark = (
    SparkSession.builder.master("local[2]")
    .appName(f"race-writer-{{wid}}")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
tbl = ParquetMergeTable(spark, path, "k", num_buckets=4)
won = []
for i in range(n):
    upd = spark.createDataFrame(
        [(0, 1, f"{{wid}}-{{i}}", "upsert"), (wkey, 1, f"{{wid}}-{{i}}", "upsert")],
        "k long, n long, tag string, op string",
    )
    while True:
        staged = tbl.staged_merge(upd, combine={{"n": "sum"}})
        try:
            tbl.commit(staged)
            won.append(staged["version"])
            break
        except ConcurrentWriteError:
            continue  # lost the race: re-stage on the new base
print("WON " + ",".join(map(str, won)))
spark.stop()
"""


def test_two_process_commit_race_no_lost_updates(spark, tmp_path):
    from htmlentityextraction_spark.operators.incremental import ParquetMergeTable

    path = str(tmp_path / "raced")
    tbl = ParquetMergeTable(spark, path, "k", num_buckets=4)
    tbl.create(
        spark.createDataFrame(
            [(k, 0, "seed") for k in range(4)], "k long, n long, tag string"
        )
    )

    n_each = 10
    script = _WRITER.format(repo=REPO)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, path, wid, wkey, str(n_each)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for wid, wkey in (("A", "1"), ("B", "2"))
    ]

    # concurrent reader: the manifest pointer must NEVER be torn —
    # always valid JSON, version never moving backwards. Every ~2 s a
    # VACUUM joins the race from this process (it takes the same
    # commit lock, so it contends with both writers — the path the r9
    # lock hardening changed most); writers must still converge and
    # no kept snapshot may lose files.
    manifest = os.path.join(path, "manifest.json")
    last_v = 1
    last_vacuum = time.monotonic()
    deadline = time.monotonic() + 600
    while any(p.poll() is None for p in procs):
        assert time.monotonic() < deadline, "race writers did not finish"
        with open(manifest) as f:
            m = json.load(f)  # torn write would fail to parse
        assert m["version"] >= last_v, "manifest version moved backwards"
        last_v = m["version"]
        if time.monotonic() - last_vacuum > 2.0:
            tbl.vacuum(keep_last=3)
            last_vacuum = time.monotonic()
        time.sleep(0.05)

    outs = []
    for p in procs:
        out, err = p.communicate()
        assert p.returncode == 0, f"writer failed:\n{err[-2000:]}"
        outs.append(out)
    won = [
        [int(v) for v in line.split(" ", 1)[1].split(",") if v]
        for out in outs
        for line in out.splitlines()
        if line.startswith("WON ")
    ]
    assert len(won) == 2

    # exactly one winner per version: the two writers' version sets
    # are disjoint and together form the contiguous history 2..21
    a, b = set(won[0]), set(won[1])
    assert len(won[0]) == len(won[1]) == n_each
    assert not (a & b), f"both writers claim version(s) {sorted(a & b)}"
    assert a | b == set(range(2, 2 + 2 * n_each))

    # no lost updates: every merge bumped shared key 0 once
    final = {r.k: (r.n, r.tag) for r in tbl.read().collect()}
    assert final[0][0] == 2 * n_each, "a raced commit lost an update"
    assert final[1][0] == n_each and final[1][1] == f"A-{n_each - 1}"
    assert final[2][0] == n_each and final[2][1] == f"B-{n_each - 1}"
    assert tbl._read_manifest()["version"] == 1 + 2 * n_each
    # the concurrent vacuums trimmed history to a suffix; whatever
    # remains must be contiguous, end at the final version, and verify
    hist = [h["version"] for h in tbl.history()]
    assert hist == list(range(hist[0], 2 + 2 * n_each))
    assert tbl.verify_integrity()["ok"]
