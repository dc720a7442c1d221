"""Incremental batch processing with a persisted high-watermark —
the reference's re-run pattern (`analytics/UpdateProdMetrics.scala:102`
reads `tmsp > ?` from the last run; `analytics/CalcIndices.scala:68`
likewise) made explicit: each run processes only rows newer than the
stored watermark, then advances it atomically (write-new + rename).

At 100 TB this is the batch complement to Structured Streaming
checkpoints: time-partitioned tables + watermark filter = partition
pruning does the skipping, so an incremental run's scan cost is the
new data only.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def read_watermark(state_dir: str, default: str = "1970-01-01 00:00:00") -> str:
    p = os.path.join(state_dir, "watermark.json")
    if not os.path.exists(p):
        return default
    with open(p) as f:
        return json.load(f)["watermark"]


def write_watermark(state_dir: str, value: str) -> None:
    os.makedirs(state_dir, exist_ok=True)
    tmp = os.path.join(state_dir, "watermark.json.tmp")
    with open(tmp, "w") as f:
        json.dump({"watermark": value}, f)
    os.replace(tmp, os.path.join(state_dir, "watermark.json"))


def incremental_run(
    df: DataFrame,
    ts_col: str,
    state_dir: str,
    process,
):
    """Filter to rows strictly newer than the stored watermark, apply
    `process(new_rows) -> result`, advance the watermark to the max
    processed timestamp. Returns (result, n_new). Idempotent when no
    new data arrives (n_new == 0 → process not called)."""
    wm = read_watermark(state_dir)
    new_rows = df.filter(F.col(ts_col) > F.lit(wm).cast("timestamp"))
    stats = new_rows.agg(
        F.count("*").alias("n"), F.max(ts_col).alias("mx")
    ).first()
    if stats["n"] == 0:
        return None, 0
    result = process(new_rows)
    write_watermark(state_dir, str(stats["mx"]))
    return result, stats["n"]


# ---------------------------------------------------------------------------
# Copy-on-write MERGE table (K3/K8 upsert + anti-upsert as a table format)
# ---------------------------------------------------------------------------

OP_UPSERT = "upsert"
OP_DELETE = "delete"


class ParquetMergeTable:
    """Minimal copy-on-write table format supporting incremental MERGE
    (matched → update, matched tombstone → delete, unmatched → insert)
    over key-bucketed parquet with an atomic manifest swap.

    This is the table-format answer to the reference's mutable-store
    sinks: MySQL ``INSERT … ON DUPLICATE KEY UPDATE``
    (`analytics/UpdateProdMetrics.scala:264-306`) and Cassandra CQL
    DELETE (`emr/SwapIDs.scala:119-128`) — the Delta/Iceberg-style
    MERGE a production user runs daily, reduced to its load-bearing
    parts:

    - data lives in ``num_buckets`` key-hash buckets, one parquet dir
      per (bucket, version); a JSON manifest maps bucket → current dir.
    - MERGE rewrites ONLY the buckets that contain updated keys
      (copy-on-write file reuse for the rest) — at 100 TB a trickle
      merge touches |update-buckets|, not the table.
    - readers resolve the manifest first: a snapshot is immutable.
    - commit = write-new-files, then atomically replace the manifest
      (os.replace here; a conditional PUT on an object store). A crash
      BEFORE the swap leaves the old snapshot fully intact — verified
      by the restart-safety test, which stages a merge, "crashes", and
      re-runs it.
    """

    def __init__(self, spark: SparkSession, path: str, key_col: str, num_buckets: int = 16):
        self.spark = spark
        self.path = path
        self.key_col = key_col
        self.num_buckets = num_buckets

    # -- manifest ----------------------------------------------------------
    @property
    def _manifest_file(self) -> str:
        return os.path.join(self.path, "manifest.json")

    def _read_manifest(self) -> dict:
        with open(self._manifest_file) as f:
            return json.load(f)

    def _swap_manifest(self, manifest: dict) -> None:
        # Retain every published snapshot: the versioned manifest is
        # written first (immutable once written), then the current
        # pointer swaps — so history is complete even mid-crash, and
        # time-travel reads resolve manifest-v{N} exactly like Delta/
        # Iceberg log entries. Copy-on-write already keeps old bucket
        # dirs, so a historical manifest's files all still exist
        # (until vacuum drops them).
        vfile = os.path.join(self.path, f"manifest-v{manifest['version']}.json")
        with open(vfile, "w") as f:
            json.dump(manifest, f)
        tmp = self._manifest_file + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_file)

    def _bucket(self, key: Column) -> Column:
        return F.pmod(F.xxhash64(key), F.lit(self.num_buckets))

    def _write_buckets(self, df: DataFrame, version: int, buckets: list[int]) -> dict[str, str]:
        """Write one dir per bucket under v{version}/, return
        bucket → relative path entries."""
        vdir = f"v{version}"
        out = df.withColumn("__bucket", self._bucket(F.col(self.key_col)))
        out.write.mode("overwrite").partitionBy("__bucket").parquet(
            os.path.join(self.path, vdir)
        )
        return {str(b): os.path.join(vdir, f"__bucket={b}") for b in buckets}

    # -- operations --------------------------------------------------------
    def create(self, df: DataFrame) -> None:
        """Initial snapshot (version 1, all buckets)."""
        os.makedirs(self.path, exist_ok=True)
        entries = self._write_buckets(df, 1, list(range(self.num_buckets)))
        # drop entries for buckets with no rows (partitionBy writes none)
        entries = {
            b: p for b, p in entries.items()
            if os.path.isdir(os.path.join(self.path, p))
        }
        self._swap_manifest({"version": 1, "buckets": entries})

    def read(self, version: int | None = None) -> DataFrame:
        """Snapshot read: current manifest, or time-travel to a prior
        published ``version``. Every snapshot is immutable — a reader
        holding version N is unaffected by later merges (and by
        vacuum, until vacuum drops N)."""
        if version is None:
            m = self._read_manifest()
        else:
            vfile = os.path.join(self.path, f"manifest-v{version}.json")
            if not os.path.exists(vfile):
                raise FileNotFoundError(
                    f"version {version} not available (never published, or vacuumed)"
                )
            with open(vfile) as f:
                m = json.load(f)
        paths = [os.path.join(self.path, p) for p in m["buckets"].values()]
        if not paths:
            return self.spark.createDataFrame([], self._schema_of_empty())
        return self.spark.read.parquet(*paths)

    def history(self) -> list[dict]:
        """Published versions, oldest first: [{version, n_buckets}]."""
        out = []
        for name in sorted(os.listdir(self.path)):
            if name.startswith("manifest-v") and name.endswith(".json"):
                with open(os.path.join(self.path, name)) as f:
                    m = json.load(f)
                out.append({"version": m["version"], "n_buckets": len(m["buckets"])})
        return sorted(out, key=lambda r: r["version"])

    def vacuum(self, keep_last: int = 1) -> list[str]:
        """Drop snapshots older than the newest ``keep_last`` versions
        and delete bucket dirs no KEPT manifest references. Copy-on-
        write means an old version dir can still back the current
        snapshot, so deletion is reference-counted against the kept
        manifests, never by version-dir age. Returns deleted paths."""
        hist = self.history()
        keep_versions = {h["version"] for h in hist[-max(keep_last, 1):]}
        keep_versions.add(self._read_manifest()["version"])
        referenced: set[str] = set()
        for v in keep_versions:
            vfile = os.path.join(self.path, f"manifest-v{v}.json")
            if os.path.exists(vfile):
                with open(vfile) as f:
                    referenced.update(json.load(f)["buckets"].values())
        deleted = []
        for h in hist:
            if h["version"] not in keep_versions:
                os.remove(os.path.join(self.path, f"manifest-v{h['version']}.json"))
        for vdir in sorted(os.listdir(self.path)):
            if not vdir.startswith("v") or not vdir[1:].isdigit():
                continue
            for bdir in sorted(os.listdir(os.path.join(self.path, vdir))):
                rel = os.path.join(vdir, bdir)
                if bdir.startswith("__bucket=") and rel not in referenced:
                    import shutil

                    shutil.rmtree(os.path.join(self.path, rel))
                    deleted.append(rel)
            if not any(
                b.startswith("__bucket=")
                for b in os.listdir(os.path.join(self.path, vdir))
            ):
                import shutil

                shutil.rmtree(os.path.join(self.path, vdir))
        return deleted

    def merge(self, updates: DataFrame, op_col: str = "op") -> dict:
        """MERGE: rows with op='upsert' update matched keys or insert
        new ones; op='delete' removes matched keys. Returns the new
        manifest. Equal to staged_merge + commit."""
        staged = self.staged_merge(updates, op_col)
        self.commit(staged)
        return staged

    def staged_merge(self, updates: DataFrame, op_col: str = "op") -> dict:
        """Write the post-merge files for every affected bucket and
        return the NEW manifest — without publishing it. A crash here
        (or a discarded stage) leaves readers on the old snapshot."""
        m = self._read_manifest()
        version = m["version"] + 1
        upd = updates.withColumn("__bucket", self._bucket(F.col(self.key_col))).cache()
        affected = sorted(r["__bucket"] for r in upd.select("__bucket").distinct().collect())
        if not affected:
            return {"version": version, "buckets": dict(m["buckets"])}

        old_paths = [
            os.path.join(self.path, m["buckets"][str(b)])
            for b in affected
            if str(b) in m["buckets"]
        ]
        data_cols = [c for c in upd.columns if c not in (op_col, "__bucket")]
        if old_paths:
            old = self.spark.read.parquet(*old_paths)
        else:
            old = self.spark.createDataFrame([], updates.drop(op_col).schema)

        k = self.key_col
        upd_named = upd.select(
            F.col(k).alias("__uk"),
            F.col(op_col).alias("__op"),
            *[F.col(c).alias(f"__u_{c}") for c in data_cols if c != k],
        )
        joined = old.join(upd_named, old[k] == upd_named["__uk"], "full_outer")
        merged_cols = [
            F.coalesce(F.col(k), F.col("__uk")).alias(k),
            *[
                F.when(F.col("__uk").isNotNull(), F.col(f"__u_{c}"))
                .otherwise(F.col(c))
                .alias(c)
                for c in data_cols
                if c != k
            ],
        ]
        merged = joined.filter(
            F.col("__op").isNull() | (F.col("__op") == OP_UPSERT)
        ).select(*merged_cols)

        entries = dict(m["buckets"])
        new_entries = self._write_buckets(merged, version, affected)
        for b in affected:
            p = new_entries[str(b)]
            if os.path.isdir(os.path.join(self.path, p)):
                entries[str(b)] = p
            else:
                entries.pop(str(b), None)  # bucket emptied by deletes
        upd.unpersist()
        return {"version": version, "buckets": entries}

    def commit(self, manifest: dict) -> None:
        """Publish a staged manifest (the atomic swap)."""
        self._swap_manifest(manifest)

    def _schema_of_empty(self):
        raise ValueError("cannot read an empty table with no manifest entries")
