"""omop2obo_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch reimplementation of the query/data-processing capabilities of
callahantiff/OMOP2OBO (reference at /root/reference, read-only) as an
idiomatic Spark pipeline over multi-turn agent transcripts:

    transcripts -> mention detection -> entity linking (exact / dbxref /
    UMLS-CUI / ancestor / TF-IDF tiers) -> canonicalization (mapping-category
    tiers) -> (subj, pred, obj) triple materialization.

Everything is DataFrame-first: broadcast dictionary joins (salted for skew),
native column expressions wherever possible, Arrow-vectorized pandas UDFs
only where Spark lacks the primitive (TF-IDF cosine top-k).
"""

__version__ = "0.1.0"

from omop2obo_spark.session import get_spark  # noqa: F401
