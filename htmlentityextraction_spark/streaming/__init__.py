from htmlentityextraction_spark.streaming import pipeline  # noqa: F401
