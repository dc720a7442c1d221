"""Merge-table CHANGE FEED as a Structured Streaming source (Spark 4
Python DataSource API): ``spark.readStream.format("mergetable-cdc")
.option("path", table_dir)`` emits one row per changed key per
published snapshot — Delta's CDF-as-stream shape for this repo's
``ParquetMergeTable`` (`operators/incremental.py`), closing the
stream-side half of the reference's mutable-store sinks (K3/K8): a
downstream consumer replicates or aggregates table changes without
rescanning the table.

Semantics (mirrors ``ParquetMergeTable.table_changes``):

- **Offsets are manifest versions.** A micro-batch covers the
  published snapshots in ``(start, end]``; each snapshot step (v-1,
  v) contributes its changed keys stamped ``_commit_version = v``.
  Offsets checkpoint/restart exactly like any Spark source.
- **Manifest-diff pruning, executor-side reads.** The driver only
  diffs the (tiny, JSON) manifests: a bucket whose relative path is
  unchanged between adjacent snapshots is byte-identical under
  copy-on-write and contributes no partition. One InputPartition per
  (changed bucket, version step); executors read that bucket's old
  and new parquet files with pyarrow and classify keys — cost is
  O(changed buckets), never O(table), and the per-task working set
  is one bucket (bounded by the table's bucket sizing).
- **insert / update / delete** classification with null-safe column
  comparison, old_*/new_* side-by-side — identical layout to the
  batch ``table_changes`` plus ``_commit_version``.

Schema evolution contract (round 7): the source schema is fixed at
stream start from the CURRENT manifest schema + column mapping
(logical old_/new_ names; bucket files are read under their stable
PHYSICAL names, so replayed history spanning a rename stays
column-aligned). A column add/rename published AFTER stream start
fails the stream LOUDLY at ``partitions()`` with a restart
instruction — silently diffing the pinned column set would
under-report changes (Delta CDF requires the same restart).
Historical steps replayed via ``startingVersion`` that predate the
pinned schema null-fill instead. The restart resumes from the
checkpointed offset under the evolved schema. The
``startingVersion`` option replays history from that snapshot
(``1`` = full-table bootstrap: version 1's rows arrive as inserts);
default is changes published after stream start.
``maxVersionsPerTrigger`` bounds how many snapshots one micro-batch
covers (the Kafka ``maxOffsetsPerTrigger`` analogue — see
THROUGHPUT.md's bounded-ingest contract).

Retention contract: ``ParquetMergeTable.vacuum(keep_last=N)`` must
retain at least the snapshots the slowest stream consumer has not
committed yet — a vacuumed-away version fails the stream loudly at
``partitions()`` (missing ``manifest-v{N}.json``), never silently
skips changes. Same rule Delta CDF consumers live under.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType


def _read_manifest_file(path: str, version: int | None = None) -> dict:
    name = "manifest.json" if version is None else f"manifest-v{version}.json"
    with open(os.path.join(path, name)) as f:
        return json.load(f)


def _schema_fingerprint(m: dict) -> tuple:
    """What the fail-loud evolution check compares: physical schema,
    column mapping, and the dropped-column list (a DROP changes the
    output column set just like an add/rename does)."""
    return (
        m.get("schema"),
        m.get("mapping") or None,
        tuple(m.get("dropped") or ()),
    )


class MergeTableCDCDataSource(DataSource):
    """``format("mergetable-cdc")``; options: ``path`` (required),
    ``startingVersion`` (optional, see module docstring)."""

    @classmethod
    def name(cls) -> str:
        return "mergetable-cdc"

    def _table_path(self) -> str:
        p = self.options.get("path")
        if not p:
            raise ValueError("mergetable-cdc requires a 'path' option")
        return p

    def _pinned(self) -> dict:
        """The ONE manifest read this stream's schema, column set, and
        evolution fingerprint all derive from. ``schema()`` and the
        reader previously each read the manifest; a schema-evolving
        commit landing between those two reads could pin a column set
        that disagrees with the output schema (row arity mismatch) or
        mis-pin the fingerprint so the fail-loud evolution check is
        silently skipped.

        The cache lives only from ``schema()`` to the ``streamReader``
        call of ONE query start — ``streamReader`` consumes it (pops
        the attribute), so a DataSource instance Spark reuses to start
        a second stream after the table evolved re-pins a FRESH
        snapshot instead of replaying the first start's manifest (and
        mis-basing the fail-loud evolution check)."""
        m = getattr(self, "_pinned_manifest", None)
        if m is None:
            m = _read_manifest_file(self._table_path())
            self._pinned_manifest = m
        return m

    def schema(self) -> StructType:
        m = self._pinned()
        key = (m.get("spec") or {}).get("key_col") or self.options.get("keycol")
        if not key:
            raise ValueError(
                "table manifest predates key_col in spec; pass .option('keyCol', ...)"
            )
        # manifest schema records PHYSICAL names; the optional column
        # mapping (rename-without-rewrite) supplies the user-visible
        # logical names for the old_/new_ output columns
        inv = {p: l for l, p in (m.get("mapping") or {}).items()}
        dropped = set(m.get("dropped") or [])
        tbl_schema = StructType.fromJson(json.loads(m["schema"]))
        key_field = next(f for f in tbl_schema.fields if f.name == key)
        data_fields = [
            f for f in tbl_schema.fields if f.name != key and f.name not in dropped
        ]
        return StructType(
            [
                StructField(key, key_field.dataType, True),
                StructField("change_type", StringType(), True),
                StructField("_commit_version", LongType(), True),
                *[
                    StructField(f"old_{inv.get(f.name, f.name)}", f.dataType, True)
                    for f in data_fields
                ],
                *[
                    StructField(f"new_{inv.get(f.name, f.name)}", f.dataType, True)
                    for f in data_fields
                ],
            ]
        )

    def streamReader(self, schema: StructType) -> "MergeTableCDCStreamReader":
        m = self._pinned()
        self._pinned_manifest = None  # consume: next query start re-pins
        return MergeTableCDCStreamReader(
            self._table_path(), schema, self.options, manifest=m
        )


class _BucketDiffPartition(InputPartition):
    def __init__(
        self,
        key: str,
        data_cols: list[str],
        old_paths: list[str],
        new_paths: list[str],
        commit_version: int,
    ):
        self.key = key
        self.data_cols = data_cols
        self.old_paths = old_paths
        self.new_paths = new_paths
        self.commit_version = commit_version


class MergeTableCDCStreamReader(DataSourceStreamReader):
    def __init__(
        self,
        path: str,
        schema: StructType,
        options: dict,
        manifest: dict | None = None,
    ):
        self.path = path
        self.key = schema.fields[0].name
        # schema layout: key, change_type, _commit_version, old_*, new_*
        # — LOGICAL names; bucket files are read under the manifest's
        # PHYSICAL names (stable across renames), in schema order.
        # ``manifest`` is the SAME pinned snapshot the DataSource
        # resolved the output schema from (one read for both — a
        # commit between two reads could desync column set and
        # schema); reading here is only a fallback for direct
        # construction outside the DataSource.
        m0 = manifest if manifest is not None else _read_manifest_file(path)
        self._pinned_fingerprint = _schema_fingerprint(m0)
        self._start_version = int(m0["version"])
        dropped = set(m0.get("dropped") or [])
        phys_fields = json.loads(m0["schema"])["fields"]
        self.data_cols = [
            f["name"]
            for f in phys_fields
            if f["name"] != self.key and f["name"] not in dropped
        ]
        starting = options.get("startingversion")
        if starting is not None:
            self._initial = max(int(starting) - 1, 0)
        else:
            self._initial = self._start_version
        # bounded ingest (the maxOffsetsPerTrigger analogue): cap how
        # many published snapshots one micro-batch may cover, so a
        # long-idle consumer catching up on a busy table cannot pull
        # an unbounded backlog into a single batch
        mvpt = options.get("maxversionspertrigger")
        self._max_versions = int(mvpt) if mvpt is not None else None
        self._last_end = self._initial

    # -- offsets -----------------------------------------------------------
    def initialOffset(self) -> dict:
        return {"version": self._initial}

    def latestOffset(self) -> dict:
        current = int(_read_manifest_file(self.path)["version"])
        if self._max_versions is not None:
            current = min(current, self._last_end + self._max_versions)
        self._last_end = max(self._last_end, current)
        return {"version": current}

    def commit(self, end: dict) -> None:
        # manifests are immutable — nothing to ack; just keep the
        # bounded-ingest cap base in step with real progress (after a
        # checkpoint restart the committed offset can be ahead of
        # stream-start state, and the cap must never trail it)
        self._last_end = max(self._last_end, int(end["version"]))

    # -- planning (driver: manifest JSON diffs only) -----------------------
    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        self._last_end = max(self._last_end, int(start["version"]))
        parts: list[InputPartition] = []
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            new_m = _read_manifest_file(self.path, v)
            # fail-loud on schema evolution published AFTER stream
            # start: the pinned output schema cannot represent added/
            # renamed columns, and silently diffing the old column set
            # would under-report changes. Historical steps (replay via
            # startingVersion) legitimately predate the pinned schema
            # and null-fill instead — same contract as Delta CDF.
            if v > self._start_version:
                fp = _schema_fingerprint(new_m)
                if fp != self._pinned_fingerprint:
                    raise RuntimeError(
                        f"merge-table schema changed at version {v} (column "
                        "add/rename/drop/widen published after stream "
                        "start); restart the stream to adopt the evolved "
                        "schema — offsets are checkpointed, the restart "
                        "resumes exactly here"
                    )
            old_b = (
                _read_manifest_file(self.path, v - 1)["buckets"] if v > 1 else {}
            )
            new_b = new_m["buckets"]
            for b in sorted(set(old_b) | set(new_b)):
                if old_b.get(b) == new_b.get(b):
                    continue  # copy-on-write: identical path == identical bytes
                parts.append(
                    _BucketDiffPartition(
                        self.key,
                        self.data_cols,
                        [os.path.join(self.path, old_b[b])] if b in old_b else [],
                        [os.path.join(self.path, new_b[b])] if b in new_b else [],
                        v,
                    )
                )
        # a version step may publish no bucket changes (e.g. a no-op
        # merge); Spark still needs a partition list — empty is fine
        return parts

    # -- execution (executor: pyarrow bucket reads) ------------------------
    def read(self, partition: _BucketDiffPartition) -> Iterator[tuple]:
        rows_old = self._load(partition.old_paths, partition)
        rows_new = self._load(partition.new_paths, partition)
        v = partition.commit_version
        cols = partition.data_cols
        def differs(a, b):  # null-safe AND NaN-safe, like eqNullSafe
            if a != b:
                return not (a != a and b != b)  # both-NaN counts as equal
            return False

        for k, old in rows_old.items():
            new = rows_new.get(k)
            if new is None:
                yield (k, "delete", v, *[old[c] for c in cols], *[None] * len(cols))
            elif any(differs(old[c], new[c]) for c in cols):
                yield (k, "update", v, *[old[c] for c in cols], *[new[c] for c in cols])
        for k, new in rows_new.items():
            if k not in rows_old:
                yield (k, "insert", v, *[None] * len(cols), *[new[c] for c in cols])

    @staticmethod
    def _load(paths: list[str], partition: _BucketDiffPartition) -> dict:
        """key -> {col: value} for one bucket snapshot. Reads with
        pyarrow directly (no SparkSession on executors); columns the
        bucket predates (schema evolution) are null-filled, matching
        the mergeSchema read the batch path does."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        out: dict = {}
        want = [partition.key, *partition.data_cols]
        for p in paths:
            tbl = pq.read_table(p)
            # Spark writes TIMESTAMP as INT96 by default; arrow reads
            # that as tz-NAIVE nanoseconds, whose to_pylist() yields
            # pandas Timestamps Spark's row converter rejects. Those
            # nanos are UTC instants, so cast to tz-aware micros.
            # TIMESTAMP_NTZ arrives as naive MICROseconds and must
            # stay naive — the ns precision is the INT96 signature.
            for i, field in enumerate(tbl.schema):
                if (
                    pa.types.is_timestamp(field.type)
                    and field.type.tz is None
                    and field.type.unit == "ns"
                ):
                    tbl = tbl.set_column(
                        i, field.name,
                        tbl.column(i).cast(pa.timestamp("us", tz="UTC")),
                    )
            present = [c for c in want if c in tbl.column_names]
            cols = {c: tbl.column(c).to_pylist() for c in present}
            n = tbl.num_rows
            for i in range(n):
                rec = {
                    c: (cols[c][i] if c in cols else None)
                    for c in partition.data_cols
                }
                out[cols[partition.key][i]] = rec
        return out
