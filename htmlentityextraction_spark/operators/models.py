"""Per-domain model lifecycle: featurize → group-train → registry →
score → pick price (SURVEY.md §2.9 M1-M15, §3.2).

Spark-first split of work:

- ALL text work is columnar JVM-side: tokenization, term hashing
  (xxhash64 mod num_features — the HashingTF trick), so the Python
  boundary carries only int arrays + a label + a location double.
- Per-domain TF-IDF fit (IDF weights, top-k mean-tfidf feature
  selection — `transform/Transformer.scala:26-43`) and the GBT fit
  happen INSIDE one ``applyInPandas`` group task, exactly the
  per-domain isolation the reference gets from its driver-side `.par`
  loop over spark jobs (`domain/models/GBTPerDomainPar.scala:40-43`) —
  but here domains train concurrently as ordinary shuffle tasks, so
  1000 executors train 1000 domains at once with no driver loop.
- The registry is a small DataFrame (domain, model bytes, idf, top-k
  indices, metrics) — collected and broadcast for serving, mirroring
  `emr/Models2Object.scala:27-36` + `streaming/Htmls2PredsPipe.scala:
  89-90`.
- Scoring is ``mapInPandas`` over candidate rows with the broadcast
  registry: featurize with the domain's idf/indices, margin from the
  domain's GBT (`streaming/Htmls2PredsPipe.scala:104-159`).

Scale note: groupBy(domain) skew (one huge domain) is the real risk at
100 TB — cap rows per domain with a deterministic per-group limit
(`max_rows_per_domain`, a windowed rank filter) before the shuffle,
the same defense as the reference's per-domain coalesce(10).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from htmlentityextraction_spark.functions.text import tokenize
from htmlentityextraction_spark.operators.gbt import GBTClassifier

REGISTRY_SCHEMA = T.StructType(
    [
        T.StructField("domain", T.StringType()),
        T.StructField("model", T.BinaryType()),
        T.StructField("idf", T.ArrayType(T.DoubleType())),
        T.StructField("indices", T.ArrayType(T.IntegerType())),
        T.StructField("n_rows", T.LongType()),
        T.StructField("n_pos", T.LongType()),
        T.StructField("train_f1", T.DoubleType()),
    ]
)


def featurize_candidates(
    cand: DataFrame,
    text_cols: tuple[str, str] = ("text_before", "text_after"),
    num_features: int = 1000,
) -> DataFrame:
    """Candidate rows → (domain, url, label, norm_location, hashed
    term ids). Hashing = xxhash64 mod num_features, all JVM-side
    (HashingTF(1000) at serving parity, `streaming/Htmls2PredsPipe.
    scala:121`)."""
    toks = F.filter(
        F.concat(tokenize(F.col(text_cols[0])), tokenize(F.col(text_cols[1]))),
        lambda t: t != "",
    )
    hashed = F.transform(toks, lambda t: F.pmod(F.xxhash64(t), F.lit(num_features)).cast("int"))
    return cand.select(
        "domain",
        "url",
        F.col("label").cast("int").alias("label"),
        F.col("norm_location").cast("double").alias("norm_location"),
        hashed.alias("term_ids"),
        "candidate",
    )


def url_grouped_split(
    df: DataFrame, train_frac: float = 0.7, seed: int = 42, url_col: str = "url"
) -> tuple[DataFrame, DataFrame]:
    """Leakage-safe split: all candidates of one url land on the same
    side (`transform/Transformer.scala:15-24`). Deterministic via hash
    of the url, not sample(), so re-runs agree."""
    bucket = F.pmod(F.xxhash64(F.col(url_col), F.lit(seed)), F.lit(1000))
    cut = int(train_frac * 1000)
    return df.filter(bucket < cut), df.filter(bucket >= cut)


def _tfidf_matrix(
    pdf: pd.DataFrame, num_features: int, min_doc_freq: int, top_k: int,
    idf: np.ndarray | None = None, indices: np.ndarray | None = None,
    vocab_mode: str = "mean",
):
    """Counts → tf-idf → top-k slice (+ norm_location column). When
    idf/indices are given (serving), reuse them; else fit (training):
    idf = log((n+1)/(df+1)), Spark ML's formula, zeroed under
    min_doc_freq. Selection modes:

    - "mean": top-k by overall mean tf-idf
      (`transform/Transformer.scala:26-43`);
    - "class_union": top-k/2 per class, pos ∪ (neg − pos) — the
      ModelR variant (`models/ModelR.scala:51-68`) that keeps
      class-discriminative terms a global mean would drown out.
    """
    n = len(pdf)
    tf = np.zeros((n, num_features), dtype=np.float64)
    for i, ids in enumerate(pdf["term_ids"]):
        if ids is not None and len(ids):
            np.add.at(tf[i], np.asarray(ids, dtype=np.int64), 1.0)
    if idf is None:
        docfreq = (tf > 0).sum(axis=0)
        idf = np.log((n + 1.0) / (docfreq + 1.0))
        idf[docfreq < min_doc_freq] = 0.0
        tfidf = tf * idf
        if vocab_mode == "class_union":
            y = pdf["label"].to_numpy(dtype=np.float64)
            half = max(top_k // 2, 1)
            pos = np.argsort(-tfidf[y == 1].mean(axis=0), kind="stable")[:half]
            neg = np.argsort(-tfidf[y == 0].mean(axis=0), kind="stable")[:half]
            neg_minus_pos = np.setdiff1d(neg, pos, assume_unique=False)
            indices = np.concatenate([pos, neg_minus_pos])
        else:
            indices = np.argsort(-tfidf.mean(axis=0), kind="stable")[:top_k]
    else:
        tfidf = tf * idf
    X = np.column_stack([tfidf[:, indices], pdf["norm_location"].to_numpy(dtype=np.float64)])
    return X, idf, indices


def train_per_domain(
    cand: DataFrame,
    num_features: int = 1000,
    min_doc_freq: int = 5,
    top_k: int = 100,
    n_estimators: int = 30,
    max_depth: int = 5,
    min_rows: int = 20,
    max_rows_per_domain: int = 100_000,
    vocab_mode: str = "mean",
) -> DataFrame:
    """groupBy(domain).applyInPandas fit → registry DataFrame. Domains
    with < min_rows candidates or a single class are skipped (the
    reference's missingModel path)."""
    def fit(key, pdf: pd.DataFrame) -> pd.DataFrame:
        (domain,) = key
        pdf = pdf.sort_values(["url", "candidate"], kind="stable").reset_index(drop=True)
        y = pdf["label"].to_numpy(dtype=np.float64)
        if len(pdf) < min_rows or y.sum() == 0 or y.sum() == len(y):
            return pd.DataFrame(columns=[f.name for f in REGISTRY_SCHEMA.fields])
        X, idf, indices = _tfidf_matrix(
            pdf, num_features, min_doc_freq, top_k, vocab_mode=vocab_mode
        )
        model = GBTClassifier(n_estimators=n_estimators, max_depth=max_depth).fit(X, y)
        pred = model.predict(X)
        tp = float(((pred == 1) & (y == 1)).sum())
        prec = tp / max(float((pred == 1).sum()), 1.0)
        rec = tp / max(float((y == 1).sum()), 1.0)
        f1 = 2 * prec * rec / max(prec + rec, 1e-12)
        return pd.DataFrame(
            [
                {
                    "domain": domain,
                    "model": model.to_bytes(),
                    "idf": idf.tolist(),
                    "indices": [int(i) for i in indices],
                    "n_rows": len(pdf),
                    "n_pos": int(y.sum()),
                    "train_f1": round(f1, 6),
                }
            ]
        )

    w = Window.partitionBy("domain").orderBy("url", "candidate")
    capped = (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_rows_per_domain)
        .drop("__rn")
    )
    return capped.groupBy("domain").applyInPandas(fit, REGISTRY_SCHEMA)


CURVE_SCHEMA = T.StructType(
    [
        T.StructField("domain", T.StringType()),
        T.StructField("n_trees", T.LongType()),
        T.StructField("f1", T.DoubleType()),
        T.StructField("selected", T.BooleanType()),
    ]
)


def submodel_curve_per_domain(
    cand: DataFrame,
    num_features: int = 1000,
    min_doc_freq: int = 5,
    top_k: int = 100,
    n_estimators: int = 10,
    max_depth: int = 3,
    min_rows: int = 20,
    max_rows_per_domain: int = 100_000,
) -> DataFrame:
    """M11/M13 (`transform/Transformer.scala:295-304`,
    `emr/BuildModels.scala:45-55`, `domain/models/GBTPerDomain.scala:
    62-68`): per domain, the tree-prefix sub-model curve — one row per
    (domain, k) with the training F-score of the first-k-trees model —
    plus the reference's model-size selection (argmax F, ties to the
    smaller model) marked on the selected row. Same applyInPandas
    group-task shape as train_per_domain: the curve costs one extra
    margin pass per tree over the group, nothing cluster-wide."""

    def curve(key, pdf: pd.DataFrame) -> pd.DataFrame:
        (domain,) = key
        pdf = pdf.sort_values(["url", "candidate"], kind="stable").reset_index(drop=True)
        y = pdf["label"].to_numpy(dtype=np.float64)
        if len(pdf) < min_rows or y.sum() == 0 or y.sum() == len(y):
            return pd.DataFrame(columns=[f.name for f in CURVE_SCHEMA.fields])
        X, _idf, _indices = _tfidf_matrix(pdf, num_features, min_doc_freq, top_k)
        model = GBTClassifier(n_estimators=n_estimators, max_depth=max_depth).fit(X, y)
        curves = model.margin_curve(X)
        rows = []
        for k in range(1, curves.shape[0]):
            pred = curves[k] > 0
            tp = float((pred & (y == 1)).sum())
            prec = tp / max(float(pred.sum()), 1.0)
            sen = tp / max(float((y == 1).sum()), 1.0)
            f1 = 2 * sen * prec / max(sen + prec, 1e-12)
            rows.append({"domain": domain, "n_trees": k, "f1": round(f1, 6)})
        best_k, _best_f1 = model.best_prefix_by_f1(X, y)
        for r in rows:
            r["selected"] = r["n_trees"] == best_k
        return pd.DataFrame(rows)

    w = Window.partitionBy("domain").orderBy("url", "candidate")
    capped = (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_rows_per_domain)
        .drop("__rn")
    )
    return capped.groupBy("domain").applyInPandas(curve, CURVE_SCHEMA)


def save_registry(registry: DataFrame, path: str) -> None:
    """Persist the per-domain model registry (M15 — the reference's
    single HashMap object file, `emr/Models2Object.scala:27-36`,
    becomes a queryable parquet table: model bytes + idf + indices +
    metrics per domain)."""
    registry.write.mode("overwrite").parquet(path)


def load_registry(spark: SparkSession, path: str) -> DataFrame:
    """Reload a persisted registry for serving (broadcast happens in
    score_candidates)."""
    return spark.read.parquet(path)


def score_candidates(
    cand: DataFrame,
    registry: DataFrame | list,
    num_features: int = 1000,
) -> DataFrame:
    """mapInPandas scoring with the collected registry broadcast to
    executors. Adds prediction (0/1), confidence (margin), and the
    missing-model sentinel prediction = -2 (`streaming/Htmls2PredsPipe.
    scala:146-156`)."""
    rows = registry.collect() if isinstance(registry, DataFrame) else registry
    spark = cand.sparkSession
    reg = {
        r["domain"]: (
            bytes(r["model"]),
            np.asarray(r["idf"], dtype=np.float64),
            np.asarray(r["indices"], dtype=np.int64),
        )
        for r in rows
    }
    bc = spark.sparkContext.broadcast(reg)
    out_schema = T.StructType(
        cand.schema.fields
        + [
            T.StructField("prediction", T.IntegerType()),
            T.StructField("confidence", T.DoubleType()),
        ]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, GBTClassifier] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            pred = np.full(len(pdf), -2, dtype=np.int64)
            conf = np.zeros(len(pdf), dtype=np.float64)
            for domain, grp in pdf.groupby("domain", sort=False):
                entry = bc.value.get(domain)
                if entry is None:
                    continue
                model = cache.get(domain)
                if model is None:
                    model = cache[domain] = GBTClassifier.from_bytes(entry[0])
                X, _, _ = _tfidf_matrix(
                    grp, num_features, 0, 0, idf=entry[1], indices=entry[2]
                )
                m = model.margin(X)
                idx = grp.index.to_numpy()
                pred[pdf.index.get_indexer(idx)] = (m > 0).astype(np.int64)
                conf[pdf.index.get_indexer(idx)] = m
            pdf = pdf.copy()
            pdf["prediction"] = pred
            pdf["confidence"] = np.round(conf, 9)
            yield pdf

    return cand.mapInPandas(score, out_schema)


def score_candidates_cogrouped(
    cand: DataFrame,
    registry: DataFrame,
    num_features: int = 1000,
) -> DataFrame:
    """Join-based scorer for registries too large to broadcast: the
    registry STAYS a DataFrame, co-grouped with candidates on domain
    (``groupBy.cogroup.applyInPandas``) — no driver collect, no
    broadcast, model rows shuffle alongside their candidates.

    Same outputs as ``score_candidates`` (equivalence-tested in
    tests/test_models.py), different scale trade: the broadcast path
    never shuffles candidates but holds every model on every executor
    (fine to ~hundreds of domains — `queries/ml.py` fit_once note);
    this path shuffles candidates once on domain and holds ONE
    domain's model at a time, so it is the shape for ~100k+ domain
    registries. Mega-domain skew on that shuffle is the known cost —
    AQE skew-split applies, and the per-domain row cap used at fit
    time (`train_per_domain` max_rows_per_domain) bounds it upstream.
    """
    out_schema = T.StructType(
        cand.schema.fields
        + [
            T.StructField("prediction", T.IntegerType()),
            T.StructField("confidence", T.DoubleType()),
        ]
    )

    def score(key, cand_pdf: pd.DataFrame, reg_pdf: pd.DataFrame) -> pd.DataFrame:
        if cand_pdf.empty:
            return cand_pdf.assign(
                prediction=np.array([], dtype=np.int64),
                confidence=np.array([], dtype=np.float64),
            )
        pred = np.full(len(cand_pdf), -2, dtype=np.int64)
        conf = np.zeros(len(cand_pdf), dtype=np.float64)
        if not reg_pdf.empty:
            row = reg_pdf.iloc[0]
            model = GBTClassifier.from_bytes(bytes(row["model"]))
            X, _, _ = _tfidf_matrix(
                cand_pdf,
                num_features,
                0,
                0,
                idf=np.asarray(row["idf"], dtype=np.float64),
                indices=np.asarray(row["indices"], dtype=np.int64),
            )
            m = model.margin(X)
            pred = (m > 0).astype(np.int64)
            conf = m
        out = cand_pdf.copy()
        out["prediction"] = pred
        out["confidence"] = np.round(conf, 9)
        return out

    return (
        cand.groupBy("domain")
        .cogroup(registry.groupBy("domain"))
        .applyInPandas(score, out_schema)
    )


def pick_model_price(scored: DataFrame) -> DataFrame:
    """Per url: the highest-confidence positive candidate's numeric
    value, sentinel -1.0 when no positive, -2.0 when the domain had no
    model (`streaming/Htmls2PredsPipe.scala:134-156`). max_by over a
    deterministic (confidence, candidate) struct — one shuffle."""
    from htmlentityextraction_spark.operators.extraction import parse_price

    agg = scored.groupBy("url", "domain").agg(
        F.max(F.when(F.col("prediction") == 1, F.struct("confidence", "candidate"))).alias("best"),
        F.max("prediction").alias("max_pred"),
    )
    return agg.select(
        "url",
        "domain",
        F.when(F.col("max_pred") == -2, F.lit(-2.0))
        .when(F.col("best").isNull(), F.lit(-1.0))
        .otherwise(F.coalesce(parse_price(F.col("best.candidate")), F.lit(-1.0)))
        .alias("model_price"),
    )


def eval_url_level(scored_with_truth: DataFrame) -> DataFrame:
    """URL-level eval (`transform/Transformer.scala:322-337`): did the
    selected candidate equal the page truth? Returns per-domain
    tp/fp/fn/selected-accuracy."""
    picked = pick_model_price(scored_with_truth)
    truth = scored_with_truth.select("url", "domain", "price").dropDuplicates(["url", "domain"])
    j = picked.join(truth, ["url", "domain"])
    hit = (F.col("model_price") >= 0) & (F.abs(F.col("model_price") - F.col("price")) < 0.009)
    return j.groupBy("domain").agg(
        F.count("*").cast("long").alias("n_urls"),
        F.sum(hit.cast("long")).alias("n_correct"),
        F.round(F.avg(hit.cast("double")) + 1e-9, 6).alias("url_accuracy"),
    )
