"""Corpus-hygiene operators a training-data pipeline runs before
pretraining: benchmark decontamination, incremental (cross-corpus)
dedup, and boilerplate-segment removal.

The reference has no equivalent (its dedup surface stops at URL-level
keep-latest, `emr/SwapIDs.scala`); these extend the LLM-data family
(`operators/dedup.py`) with the ops run against a *held-out* set or an
*existing* corpus rather than within one batch.

All three are pure DataFrame compositions — tokenization and n-gram
construction use sequence/transform/slice array SQL (JVM-side, no
Python), and every join is either broadcast (held-out benchmark sets
are small by construction) or a single hash shuffle on a 64-bit gram
hash / fingerprint (never on raw text), which is the shape that holds
at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from htmlentityextraction_spark.functions.text import tokenize


def word_ngrams(toks: Column, n: int) -> Column:
    """All space-joined word n-grams of a token array; empty array when
    the doc has fewer than ``n`` tokens. sequence+transform+slice keeps
    it JVM-side; the guard matters because Spark ``sequence(1, 0)``
    DESCENDS ([1, 0]) instead of returning empty."""
    k = F.size(toks) - F.lit(n - 1)
    return F.when(
        k >= 1,
        F.transform(F.sequence(F.lit(1), k), lambda i: F.array_join(F.slice(toks, i, n), " ")),
    ).otherwise(F.array().cast("array<string>"))


def segment_tokens(toks: Column, seg_len: int) -> Column:
    """Non-overlapping ``seg_len``-token segments (trailing partial
    segment kept) as space-joined strings."""
    n_seg = F.ceil(F.size(toks) / F.lit(seg_len)).cast("int")
    return F.when(
        n_seg >= 1,
        F.transform(
            F.sequence(F.lit(1), n_seg),
            lambda i: F.array_join(F.slice(toks, (i - F.lit(1)) * seg_len + F.lit(1), seg_len), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def decontaminate(
    train: DataFrame,
    heldout: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: per train doc, the number of distinct
    word ``n``-grams it shares with ANY held-out document, plus a
    0/1 ``contaminated`` flag (>= 1 hit).

    Scale shape: the held-out side (benchmark suites) is small by
    construction → its distinct gram-hash set is broadcast; the train
    side explodes grams map-side, hashes to a 64-bit key (narrow rows,
    never raw text on the wire), survives the broadcast semi-filter,
    and only the surviving (doc, gram-hash) pairs hit the one shuffle
    (groupBy doc). Docs with zero hits never shuffle at all.
    """
    h_grams = (
        heldout.select(F.explode(word_ngrams(tokenize(F.col(text_col)), n)).alias("g"))
        .select(F.xxhash64("g").alias("gh"))
        .distinct()
    )
    t_grams = train.select(
        F.col(id_col), F.explode(word_ngrams(tokenize(F.col(text_col)), n)).alias("g")
    ).select(id_col, F.xxhash64("g").alias("gh"))
    hits = (
        t_grams.join(F.broadcast(h_grams), "gh")
        .groupBy(id_col)
        .agg(F.count_distinct("gh").alias("n_hits"))
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) >= 1).cast("int").alias("contaminated"),
        )
    )


def dedup_against_corpus(
    incoming: DataFrame,
    existing: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental dedup: keep incoming docs whose normalized-text
    fingerprint appears nowhere in the existing corpus, then keep-min-id
    within the incoming batch itself.

    The existing-corpus fingerprint set is NOT broadcastable at 100 TB,
    so this is a shuffle anti-join on the 32-byte fingerprint — one
    shuffle, no raw text moved — followed by the same keep-first
    groupBy used by ``dedup.exact_dedup``.
    """
    from htmlentityextraction_spark.operators.dedup import normalized_fingerprint

    inc = incoming.withColumn("fingerprint", normalized_fingerprint(F.col(text_col)))
    ex_fp = existing.select(
        normalized_fingerprint(F.col(text_col)).alias("fingerprint")
    ).distinct()
    fresh = inc.join(ex_fp, "fingerprint", "left_anti")
    first = fresh.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    return first.select(id_col, "fingerprint")


def advance_dedup_index(
    index_tbl,
    corpus_tbl,
    from_version: int,
    to_version: int | None = None,
    *,
    fp_col: str = "fingerprint",
    id_col: str = "doc_id",
) -> dict:
    """Advance a (fingerprint → doc_id) dedup-index merge table from
    the corpus table's CHANGE FEED — the corpus-version-level half of
    incremental dedup (VERDICT r7 item 8): the fingerprint set a new
    batch probes is maintained at O(delta) cost, never by rescanning
    the corpus.

    ``table_changes`` reads ONLY buckets whose manifest paths differ
    between the two versions (copy-on-write manifest-diff pruning), so
    a trickle merge into a 100 TB corpus costs a handful of bucket
    reads here. Inserts/updates upsert the doc's new fingerprint;
    deletes (and fingerprint-changing updates) retire the old one. The
    feed is netted per fingerprint first — a doc deleted and another
    inserted with the same fingerprint inside one version window must
    collapse to a single live upsert, not a conflicting delete+upsert
    pair in one MERGE batch.

    The one-live-doc-per-fingerprint invariant is ENFORCED, not
    assumed: a caller who merges an unprobed batch straight into the
    corpus (bypassing ``dedup_batch_against_index``) gets a loud
    ``ValueError`` here instead of a silently wrong index. Two checks,
    both O(delta):

    - intra-window: >1 distinct live (upserted) doc per fingerprint
      inside the change window — a duplicate-carrying batch.
    - cross-window: a net-new fingerprint the index ALREADY maps to a
      different doc, with nothing in the window retiring that mapping
      — the older copy is still live in the corpus. Probed with the
      same bucket-transform pruning the merge itself uses, so the
      check reads only the index buckets the window's fingerprints
      land in.
    """
    ch = corpus_tbl.table_changes(from_version, to_version)
    return _apply_dedup_feed(
        index_tbl, ch, fp_col, id_col, f"versions ({from_version}, {to_version}]"
    )


def _apply_dedup_feed(
    index_tbl, ch: DataFrame, fp_col: str, id_col: str, window_desc: str
) -> dict:
    """Net one ENDPOINT-EXACT change feed (adjacent or batch
    ``table_changes`` — one row per key whose state differs between
    the window's two endpoint snapshots) into the fingerprint index:
    the shared core of batch ``advance_dedup_index`` and the
    per-trigger streaming consumer ``dedup_index_stream_sink``.
    Idempotent under replay: re-upserting an existing (fp → doc)
    mapping and re-deleting an absent fp are both no-ops, so a
    restarted stream re-applying a version step converges."""
    old_fp, new_fp = f"old_{fp_col}", f"new_{fp_col}"
    # NULL fingerprints never enter the index (a fp-less doc indexes
    # nothing, retires nothing): without the filters, two null-fp docs
    # in one window would share the NULL groupBy group and trip the
    # duplicate check for docs that are not duplicates of each other.
    adds = (
        ch.filter(F.col("change_type").isin("insert", "update"))
        .filter(F.col(new_fp).isNotNull())
        .select(F.col(new_fp).alias(fp_col), F.col(id_col), F.lit("upsert").alias("op"))
    )
    drops = (
        ch.filter(
            (F.col("change_type") == "delete")
            | (
                (F.col("change_type") == "update")
                & ~F.col(old_fp).eqNullSafe(F.col(new_fp))
            )
        )
        .filter(F.col(old_fp).isNotNull())
        .select(F.col(old_fp).alias(fp_col), F.col(id_col), F.lit("delete").alias("op"))
    )
    net = (
        adds.unionByName(drops)
        .groupBy(fp_col)
        .agg(
            F.min(F.when(F.col("op") == "upsert", F.col(id_col))).alias("__doc"),
            F.count_distinct(
                F.when(F.col("op") == "upsert", F.col(id_col))
            ).alias("__n_live"),
            F.max(F.col("op") == "delete").alias("__retired"),
        )
        .persist()
    )
    try:
        dup = net.filter(F.col("__n_live") > 1).limit(3).collect()
        if dup:
            raise ValueError(
                "dedup-index invariant violated: fingerprints with more than "
                f"one live doc in {window_desc} of "
                f"the corpus, e.g. {[r[fp_col] for r in dup]} — a batch was "
                "merged into the corpus without probing "
                "dedup_batch_against_index first"
            )
        fresh_ups = net.filter(
            F.col("__doc").isNotNull() & ~F.coalesce("__retired", F.lit(False))
        )
        bks = index_tbl.affected_buckets(fresh_ups, fp_col)
        idx = index_tbl.read_buckets(bks).select(
            fp_col, F.col(id_col).alias("__idx_doc")
        )
        clash = (
            fresh_ups.join(idx, fp_col)
            .filter(F.col("__idx_doc") != F.col("__doc"))
            .limit(3)
            .collect()
        )
        if clash:
            raise ValueError(
                "dedup-index invariant violated: the index already maps "
                f"fingerprint(s) {[r[fp_col] for r in clash]} to a different "
                f"live doc and nothing in {window_desc} retired the old "
                "mapping — the corpus now holds a duplicate merged without "
                "probing dedup_batch_against_index"
            )
        ops = net.select(
            fp_col,
            F.col("__doc").alias(id_col),
            F.when(F.col("__doc").isNotNull(), F.lit("upsert"))
            .otherwise(F.lit("delete"))
            .alias("op"),
        )
        return index_tbl.merge(ops)
    finally:
        net.unpersist()


def dedup_batch_against_index(
    batch: DataFrame,
    index_tbl,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dedup an incoming batch against the LIVE corpus state via the
    fingerprint-index merge table: bucket-transform pruning reads only
    the index buckets the batch's fingerprints land in (O(batch), not
    O(corpus) — at production bucket counts a small batch touches a
    sliver of the index), then anti-join + keep-min-id within the
    batch. Returns the accepted (id, fingerprint) rows — the exact
    frame the caller merges into the corpus table, which keeps the
    index's one-live-doc-per-fingerprint invariant. NULL-text docs
    carry no fingerprint and are excluded (quality gates drop them
    upstream)."""
    from htmlentityextraction_spark.operators.dedup import normalized_fingerprint

    fps = batch.select(
        F.col(id_col), normalized_fingerprint(F.col(text_col)).alias("fingerprint")
    ).filter(F.col("fingerprint").isNotNull())
    bks = index_tbl.affected_buckets(fps, "fingerprint")
    known = index_tbl.read_buckets(bks).select("fingerprint")
    fresh = fps.join(known, "fingerprint", "left_anti")
    return (
        fresh.groupBy("fingerprint")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col, "fingerprint")
    )


def dedup_index_stream_sink(index_tbl, *, fp_col: str = "fingerprint", id_col: str = "doc_id"):
    """``foreachBatch`` consumer that keeps the fingerprint index
    CURRENT from the corpus table's live change stream — the streaming
    half of ``advance_dedup_index`` (which is batch-invoked between
    two pinned versions). Wire it to the CDC source
    (`sources/mergetable_cdc_source.py`)::

        spark.readStream.format("mergetable-cdc")
            .option("path", corpus_dir).load()
            .writeStream.foreachBatch(dedup_index_stream_sink(index_tbl))
            .option("checkpointLocation", ck).start()

    and the loop from "corpus merge commits" to "index current" closes
    with no batch job. Per micro-batch, the feed is applied ONE
    VERSION STEP AT A TIME in commit order (a multi-version batch may
    contain a doc inserted in one step and deleted in the next —
    netting the steps together would resurrect the intermediate
    state; each adjacent step is endpoint-exact, so the shared
    ``_apply_dedup_feed`` netting and its loud invariant checks apply
    unchanged). ``foreachBatch`` runs on the driver, so the table
    handle is used directly.

    Restart replays are handled with a SYNC WATERMARK persisted in
    the index table's directory (Delta's txn-version idempotent-sink
    pattern): after each applied step the watermark advances
    atomically, and a replayed batch skips every step at or below it.
    Re-applying one step (crash between apply and watermark write) is
    idempotent; skipping fully-applied steps is what makes the replay
    SAFE against the cross-window duplicate check — without it, a
    replayed step that an already-applied LATER step superseded (fp
    moved to a new doc) would read as an unprobed duplicate and wedge
    the stream. Mid-stream corpus schema evolution inherits the
    SOURCE's fail-loud contract — the stream dies at ``partitions()``
    before this sink ever sees a mixed-schema batch."""
    import json as _json
    import os as _os

    wm_file = _os.path.join(index_tbl.path, "_dedup_sync.json")

    def _watermark() -> int:
        try:
            with open(wm_file) as f:
                return int(_json.load(f)["applied_through"])
        except (OSError, ValueError, KeyError):
            return 0

    def _advance_watermark(v: int) -> None:
        tmp = wm_file + ".tmp"
        with open(tmp, "w") as f:
            _json.dump({"applied_through": v}, f)
        _os.replace(tmp, wm_file)

    def _apply(batch: DataFrame, batch_id: int) -> None:
        batch.persist()  # one source scan, not one per version step
        try:
            versions = sorted(
                r["_commit_version"]
                for r in batch.select("_commit_version").distinct().collect()
            )
            applied = _watermark()
            for v in versions:
                if v <= applied:
                    continue  # restart replay of an already-applied step
                step = batch.filter(F.col("_commit_version") == v)
                _apply_dedup_feed(
                    index_tbl, step, fp_col, id_col, f"version step {v}"
                )
                _advance_watermark(v)
        finally:
            batch.unpersist()

    return _apply


def semantic_admission_merge_sink(
    corpus_tbl,
    *,
    block_col: str,
    threshold: float = 0.35,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
):
    """``foreachBatch`` consumer closing the SEMANTIC admission loop —
    the embedding-level twin of ``dedup_index_stream_sink``'s exact-
    fingerprint loop. Per micro-batch of candidate documents:

    1. probe the LIVE corpus snapshot
       (`similarity.admission_best_match`: batch broadcast, corpus
       scanned once and block-pruned, never shuffled),
    2. resolve WITHIN-batch near-dups among the corpus survivors with
       sequential-arrival semantics — ascending-id greedy per block: a
       doc is rejected iff it matches an EARLIER **admitted** doc
       (docs the corpus already rejected veto nothing), an exact
       O(k²)-per-block pass that is micro-batch-sized by construction,
    3. upsert only the admitted docs into the corpus table, so the
       NEXT trigger's probe sees them.

    Restart replays are idempotent WITHOUT a sync watermark (unlike
    the fingerprint sink, which must replay version-stepped deletes): a
    replayed doc that was admitted finds ITSELF in the corpus —
    same id, cosine 1.0 — and is re-rejected, and re-upserting an
    identical row would be a CDC no-op anyway; a replayed doc that was
    rejected deterministically re-rejects. Corrupt vectors are dropped
    at the probe boundary and never reach the corpus. Arrivals are
    insert-only candidates: a re-crawl UPDATE of an existing doc is a
    merge-table operation, not an admission question.

    Block key is the corpus's blocking column (label on the fixture,
    the LSH bucket / IVF cell at 100 TB — the same trade the batch
    query documents)."""
    import numpy as np
    import pandas as pd

    from htmlentityextraction_spark.operators.similarity import (
        _round6,
        admission_best_match,
    )

    def _greedy_within(pdf: "pd.DataFrame") -> "pd.DataFrame":
        if len(pdf) < 2:
            return pdf
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        # Vectors compare only within their own dimensionality: a
        # mixed-dim pair has no defined cosine (the JVM path's
        # zip_with yields NULL and no veto — mirror that instead of
        # crashing a vstack over ragged rows). Zero vectors match
        # nothing and veto nothing.
        kept_by_dim: dict[int, list] = {}
        kept_idx: list[int] = []
        for i, raw in enumerate(pdf[vec_col]):
            v = np.asarray(raw, dtype=np.float64)
            n = np.linalg.norm(v)
            u = v / n if n > 0 else None
            peers = kept_by_dim.get(v.shape[0])
            if (
                u is not None
                and peers
                and (_round6(np.stack(peers) @ u) >= threshold).any()
            ):
                continue
            kept_idx.append(i)
            if u is not None:
                kept_by_dim.setdefault(v.shape[0], []).append(u)
        return pdf.iloc[kept_idx]

    def _corpus_for(batch: DataFrame) -> DataFrame:
        """The corpus snapshot the probe scans. When the table tracks
        zone-map stats on the block column (create it with
        ``stats_cols=[block_col]`` and keep it OPTIMIZE-ZORDERed by
        block), each trigger reads ONLY the buckets whose block range
        intersects the batch's blocks — manifest-level pruning via
        ``read_where_in``, the O(touched blocks) shape; the batch's
        distinct-block collect is micro-batch-bounded. Otherwise fall
        back to the full snapshot (the isin pushdown still prunes
        row-groups inside files, but every file is listed)."""
        if block_col not in (getattr(corpus_tbl, "stats_cols", None) or []):
            return corpus_tbl.read()
        blocks = [
            r["_b"]
            for r in batch.select(F.col(block_col).alias("_b")).distinct().collect()
            if r["_b"] is not None
        ]
        if not blocks:
            return corpus_tbl.read()
        # ONE manifest pass + ONE scan however many blocks the batch
        # touches (a per-block read_where union degenerates to
        # |blocks| manifest probes + plans once block cardinality
        # grows past a handful).
        return corpus_tbl.read_where_in(block_col, blocks)

    def _apply(batch: DataFrame, batch_id: int) -> None:
        corpus = _corpus_for(batch).select(id_col, block_col, vec_col)
        verdict = admission_best_match(
            corpus, batch, block_col=block_col, threshold=threshold,
            id_col=id_col, vec_col=vec_col,
        )
        survivors = batch.join(
            verdict.filter(F.col("admitted")).select(id_col), id_col
        )
        admitted = survivors.groupBy(block_col).applyInPandas(
            _greedy_within, survivors.schema
        )
        if admitted.isEmpty():
            return
        corpus_tbl.merge(admitted.withColumn("op", F.lit("upsert")))

    return _apply


def segment_dedup_keep_first(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_len: int = 15,
) -> DataFrame:
    """Exact passage-level dedup: the FIRST global occurrence of each
    distinct ``seg_len``-token segment (order = (doc_id, pos)) is
    kept, every later repeat dropped — the within-corpus complement of
    ``boilerplate_segments`` (which drops by doc-frequency regardless
    of position). Emits per-doc accounting plus an md5 fingerprint of
    the reassembled deduped text, so downstream can verify the
    rewrite without shipping full text through the gate.

    Scale shape: one shuffle partitioned on the 64-bit segment hash
    for the first-occurrence rank (the raw segment rides along only
    for the hash-collision guard and reassembly), then one shuffle on
    doc_id for the rollup. Duplicate groups are tiny (how many times
    can one passage repeat), so the per-key sort inside the window is
    bounded.
    """
    segs = docs.select(
        F.col(id_col),
        F.posexplode(segment_tokens(tokenize(F.col(text_col)), seg_len)).alias("pos", "seg"),
    ).withColumn("sh", F.xxhash64("seg"))
    # Partition on (sh, seg): the hash dominates the partitioner for
    # balance; the raw segment keeps a 64-bit collision from merging
    # two different segments into one dedup group.
    win = Window.partitionBy("sh", "seg").orderBy(id_col, "pos")
    marked = segs.withColumn("keep", F.row_number().over(win) == 1)
    kept_struct = F.when(F.col("keep"), F.struct("pos", "seg"))
    return marked.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_segments"),
        F.sum(F.col("keep").cast("int")).cast("bigint").alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)), lambda s: s["seg"]
                ),
                " ",
            )
        ).alias("dedup_fp"),
    )


def boilerplate_segments(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_len: int = 15,
    min_docs: int = 3,
) -> DataFrame:
    """C4-style boilerplate removal at segment granularity: split each
    doc into consecutive ``seg_len``-token segments, count how many
    DISTINCT docs each segment occurs in corpus-wide, and drop segments
    seen in >= ``min_docs`` docs. Emits per-doc keep/drop accounting
    (the reassembled text is a deterministic function of the kept
    segments).

    Two hash shuffles on the 64-bit segment hash (global doc-frequency,
    then the join back) plus one on doc_id for the final rollup — no
    all-pairs step anywhere, so corpus size only scales the shuffles
    linearly.
    """
    segs = docs.select(
        F.col(id_col),
        F.posexplode(segment_tokens(tokenize(F.col(text_col)), seg_len)).alias("pos", "seg"),
    ).select(
        id_col,
        "pos",
        F.xxhash64("seg").alias("sh"),
        F.size(F.split("seg", " ")).alias("seg_toks"),
    )
    freq = segs.groupBy("sh").agg(F.count_distinct(id_col).alias("df"))
    marked = segs.join(freq, "sh").withColumn(
        "is_boiler", (F.col("df") >= min_docs).cast("int")
    )
    return (
        marked.groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_segments"),
            F.sum("is_boiler").cast("bigint").alias("n_boilerplate"),
            F.sum(F.when(F.col("is_boiler") == 0, F.col("seg_toks")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("tokens_kept"),
        )
    )
