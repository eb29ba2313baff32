from omop2obo_spark.sources.readers import (  # noqa: F401
    read_lexicon,
    read_mrconso_rrf,
    read_mrsty_rrf,
    read_transcripts,
    read_vocab_map,
)
from omop2obo_spark.sources.writers import GraphSink  # noqa: F401
