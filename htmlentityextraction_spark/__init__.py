"""PySpark-native analytics engine with the query & data-processing
capabilities of big-datai/HtmlEntityExtraction (reference surveyed in
SURVEY.md), re-expressed Spark-first: DataFrame/SQL plans compiled by
Catalyst, Structured Streaming for the serving path, Spark ML +
``applyInPandas`` for the per-domain model lifecycle, plus the
large-scale training-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis).

Package layout
--------------
- ``session``    SparkSession factory tuned for scale (AQE, Arrow).
- ``sources``    table loaders / schema registry (parquet fixtures,
                 Kafka-shaped streams).
- ``functions``  scalar column-expression library (SURVEY.md §2.8).
- ``operators``  relational + LLM-pipeline operators (dedup,
                 similarity, text analysis, multimodal).
- ``plans``      batch analytics query plans (SURVEY.md §2.5/2.6/§3.3).
- ``extraction`` price-candidate UDTF (SURVEY.md §2.8 F1-F3/F7/F12).
- ``ml``         featurization + per-domain model train/score
                 (SURVEY.md §2.9).
- ``streaming``  Structured Streaming pipelines (SURVEY.md §2.10).
"""

__version__ = "0.1.0"
