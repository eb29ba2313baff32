from omop2obo_spark.streaming.incremental import (  # noqa: F401
    stream_code_mentions,
    stream_triples,
)
