"""Table loaders over the driver's parquet fixtures.

The reference reads Elasticsearch / S3 object files / Cassandra / Kafka
(SURVEY.md §2.1 S1-S10). In the rebuild every batch source is a
DataFrame scan with Catalyst predicate pushdown + column pruning doing
the work the reference hand-coded (`es.query` strings, `.where()` on
the Cassandra connector — `utils/UConf.scala:37-40`,
`analytics/CalcIndices.scala:68`). Parquet stands in for all of them in
the test rig; swapping in a real connector is a one-line format change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Filters/projections applied by callers
    are pushed into the parquet reader by Catalyst (verify with
    ``df.explain()`` → ``PushedFilters`` / ``ReadSchema``).

    ``events`` is written with TIMESTAMP(NANOS), which Spark's parquet
    reader rejects; read nanos as long (legacy conf, set dynamically so
    it also works on a driver-owned session) and truncate to
    microsecond timestamps — the same value DuckDB returns after its
    ns→us cast.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            from pyspark.sql import functions as F

            # integer DIV, not floor(double /): nanos exceed double's
            # 53-bit mantissa and round up by 1 us on ~13% of rows
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register all tables as temp views for ``spark.sql`` entry points
    (the reference's CassandraSQLContext path, SURVEY.md §2.1 S10)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
