from omop2obo_spark.fixtures.generators import (  # noqa: F401
    ancestors_df,
    cached_dims,
    lexicon_df,
    mrconso_df,
    mrsty_df,
    transcripts_df,
    vocab_map_df,
)
