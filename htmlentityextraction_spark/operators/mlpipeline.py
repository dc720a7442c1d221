"""Pure Spark ML pipeline for the single-model case (SURVEY.md §2.9
M1-M8 in genuine ``pyspark.ml`` form): HashingTF → IDF(minDocFreq) →
top-k mean-tfidf VectorSlicer → VectorAssembler(+norm_location) →
GBTClassifier.

Two training shapes coexist deliberately:

- THIS pipeline: one model over the whole (or one domain's) data —
  distributed fit, idiomatic ml.Pipeline, model persistence via
  ml save/load. Right when models are few and data per model is huge.
- `operators/models.train_per_domain`: numpy GBT inside
  applyInPandas — thousands of small per-domain models trained
  concurrently as shuffle tasks. Right for the reference's ~190
  domains (`domain/models/GBTPerDomainPar.scala` needed driver-side
  .par loops for this; applyInPandas needs nothing).
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import GBTClassifier
from pyspark.ml.feature import IDF, HashingTF, VectorAssembler, VectorSlicer
from pyspark.ml.stat import Summarizer
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from htmlentityextraction_spark.functions.text import tokenize


def prepare_tokens(cand: DataFrame) -> DataFrame:
    toks = F.filter(
        F.concat(tokenize(F.col("text_before")), tokenize(F.col("text_after"))),
        lambda t: t != "",
    )
    return cand.withColumn("tokens", toks).withColumn(
        "label_d", F.col("label").cast("double")
    )


def fit_single_model(
    cand: DataFrame,
    num_features: int = 1000,
    min_doc_freq: int = 5,
    top_k: int = 100,
    max_iter: int = 10,
    max_depth: int = 3,
) -> PipelineModel:
    """Two-phase fit matching `transform/Transformer.scala:26-43`:
    fit TF-IDF, pick the top-k indices by mean tf-idf (Summarizer),
    then fit the full pipeline with a VectorSlicer on those indices."""
    data = prepare_tokens(cand)
    tf = HashingTF(inputCol="tokens", outputCol="tf", numFeatures=num_features)
    idf = IDF(inputCol="tf", outputCol="tfidf", minDocFreq=min_doc_freq)
    pre = Pipeline(stages=[tf, idf]).fit(data)
    tfidf = pre.transform(data)
    mean_vec = tfidf.select(Summarizer.mean(F.col("tfidf")).alias("m")).first().m
    top = sorted(range(len(mean_vec)), key=lambda i: -mean_vec[i])[:top_k]
    slicer = VectorSlicer(inputCol="tfidf", outputCol="sliced", indices=sorted(top))
    asm = VectorAssembler(inputCols=["sliced", "norm_location"], outputCol="features")
    gbt = GBTClassifier(
        labelCol="label_d", featuresCol="features", maxIter=max_iter, maxDepth=max_depth,
        seed=42,
    )
    return Pipeline(stages=[tf, idf, slicer, asm, gbt]).fit(data)


def score_with_pipeline(model: PipelineModel, cand: DataFrame) -> DataFrame:
    """Adds prediction + the rawPrediction margin (M10: the modern
    form of the reference's confidenceGBT weighted vote)."""
    from pyspark.ml.functions import vector_to_array

    out = model.transform(prepare_tokens(cand))
    return out.withColumn(
        "confidence", vector_to_array("rawPrediction")[1]
    ).select(*cand.columns, "prediction", "confidence")
