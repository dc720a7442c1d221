"""Spark ML extra-model queries (M16-M19). Model internals aren't
SQL-expressible — these are rows-only entries with deterministic
seeds and fixed output shapes; quality contracts (accuracy above
baseline, topic structure, PCA variance ordering) are pytest-enforced
in tests/test_mlx.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from htmlentityextraction_spark.operators import mlx
from htmlentityextraction_spark.registry import register
from htmlentityextraction_spark.sources.tables import load_table


@register("ml_random_forest_eval")
def ml_random_forest_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mlx.random_forest_eval(load_table(spark, sf_dir, "embeddings"))


@register("ml_linear_svc_eval")
def ml_linear_svc_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mlx.linear_svc_eval(load_table(spark, sf_dir, "embeddings"))


@register("ml_lda_topics")
def ml_lda_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mlx.lda_topics(load_table(spark, sf_dir, "documents"))


@register("ml_pca_projection")
def ml_pca_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mlx.pca_project(load_table(spark, sf_dir, "embeddings"))
