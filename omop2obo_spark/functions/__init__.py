from omop2obo_spark.functions.normalize import (  # noqa: F401
    normalize_source_codes,
    uri_ont_type,
    uri_short_id,
    uri_to_code,
)
from omop2obo_spark.functions.text import (  # noqa: F401
    STOPWORDS,
    normalize_text,
    preprocess_tokens_expr,
)
