"""Import-for-effect: each module registers its queries + oracles."""

from htmlentityextraction_spark.queries import analytics, relational, scalar, windows  # noqa: F401
