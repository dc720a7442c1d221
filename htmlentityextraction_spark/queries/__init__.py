"""Import-for-effect: each module registers its queries + oracles."""

from htmlentityextraction_spark.queries import (  # noqa: F401
    analytics,
    analytics2,
    corpus_q,
    extraction,
    llmdata,
    llmprep_q,
    ml,
    mlx_q,
    multimodal_q,
    prodmetrics_q,
    relational,
    scalar,
    scalar2,
    serve_q,
    sessions_q,
    streaming_q,
    temporal_q,
    textclean_q,
    vocab_q,
    windows,
)
