from htmlentityextraction_spark.functions.pricing import (
    cv_rank,
    descretize,
    price_status,
    rel_place_rank,
    selected_price,
)
from htmlentityextraction_spark.functions.text import (
    char_ngrams,
    get_domain,
    shrink_string,
    text_num,
    text_only,
    three_plus_trim,
    tokenize,
)

__all__ = [
    "cv_rank",
    "descretize",
    "price_status",
    "rel_place_rank",
    "selected_price",
    "char_ngrams",
    "get_domain",
    "shrink_string",
    "text_num",
    "text_only",
    "three_plus_trim",
    "tokenize",
]
