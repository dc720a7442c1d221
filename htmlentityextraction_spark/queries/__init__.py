"""Import-for-effect: each module registers its queries + oracles."""

from htmlentityextraction_spark.queries import (  # noqa: F401
    analytics,
    analytics2,
    extraction,
    llmdata,
    ml,
    multimodal_q,
    relational,
    scalar,
    streaming_q,
    windows,
)
