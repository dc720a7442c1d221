"""Import-for-effect: each module registers its queries + oracles."""

from htmlentityextraction_spark.queries import analytics, relational  # noqa: F401
