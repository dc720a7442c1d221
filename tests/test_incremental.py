"""High-watermark incremental processing + per-domain skew-cap
behavior."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from htmlentityextraction_spark.operators import incremental as inc
from htmlentityextraction_spark.operators import models as md


def test_incremental_runs_process_only_new_rows(spark):
    state = tempfile.mkdtemp(prefix="wm_state_")
    from htmlentityextraction_spark.sources.tables import load_table
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    cut = ev.agg(
        F.timestamp_micros(
            F.percentile(F.unix_micros("ts"), F.lit(0.5)).cast("long")
        ).alias("p")
    ).first().p

    counts = []
    def process(rows):
        n = rows.count()
        counts.append(n)
        return n

    # first run with watermark preset to the median: only newer half
    inc.write_watermark(state, str(cut))
    _, n1 = inc.incremental_run(ev, "ts", state, process)
    assert 0 < n1 < 1000
    # second run: watermark advanced to max ts -> nothing new, process
    # must NOT be called
    res, n2 = inc.incremental_run(ev, "ts", state, process)
    assert n2 == 0 and res is None
    assert len(counts) == 1
    shutil.rmtree(state)


def test_train_per_domain_caps_mega_domains(spark):
    # one domain with 300 rows, cap at 50: the fit must see exactly 50
    rows = []
    for i in range(150):
        rows.append(("big.com", f"http://big.com/p/{i}", 1, 0.2, f"{i}.50", "good price", "x"))
        rows.append(("big.com", f"http://big.com/p/{i}", 0, 0.8, f"{i}.99", "footer junk", "y"))
    cand = spark.createDataFrame(
        rows,
        "domain string, url string, label int, norm_location double,"
        "candidate string, text_before string, text_after string",
    )
    feats = md.featurize_candidates(cand)
    reg = md.train_per_domain(
        feats, n_estimators=3, max_depth=2, min_doc_freq=2, min_rows=10,
        max_rows_per_domain=50,
    ).collect()
    assert len(reg) == 1
    assert reg[0].n_rows == 50, "skew cap must bound the per-domain fit"
