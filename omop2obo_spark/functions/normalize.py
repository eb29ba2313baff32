"""Source-code / URI normalization as native Spark column expressions.

``normalize_source_codes`` reproduces the reference's prefix-normalization
semantics (/root/reference/omop2obo/utils/data_utils.py:236-275) exactly —
including its surprising ``str.rstrip(last_segment)`` behavior, which strips
a trailing *character set* (not a suffix) before dropping one separator
char. Spark's two-arg ``rtrim(str, trimStr)`` has exactly those
character-set semantics, so the whole transform stays inside whole-stage
codegen — no Python UDF, no per-row regex compilation.

Validated against the reference's own test vectors
(/root/reference/tests/test_data_utils.py:165-183):
    reactome:r-hsa-937045                                 -> identity
    http://linkedlifedata.com/resource/umls/id/C0010323   -> umls:c0010323
    snomedct_us:111395007                                 -> snomed:111395007
    pesticides:derivatives/benazolin-ethyl                -> pesticides:derivatives:benazolin-ethyl
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_HTTP_SPLIT = "[_:|/]"  # used when the value is a URL containing '_'
_PLAIN_SPLIT = "[:|/]"


def _last_segment(col: Column, pattern: str) -> Column:
    """Last non-empty segment after splitting on ``pattern``.

    ``try_element_at``: a malformed identifier (empty, separators-only)
    yields NULL instead of failing the task — the reference would raise
    IndexError row-by-row, which is not an option on a 10^12-row table.
    """
    return F.try_element_at(F.filter(F.split(col, pattern), lambda x: x != ""), F.lit(-1))


def normalize_source_codes(col: Column, vocab_map: dict[str, str]) -> Column:
    """Normalize an identifier to ``canonical_prefix:lowercase_id``.

    Args:
        col: column of raw identifiers (e.g. ``SNOMEDCT_US:190787008``,
            ``http://linkedlifedata.com/resource/umls/id/C0010323``).
        vocab_map: alias → canonical prefix (the reference's
            source_code_vocab_map, clinical_concept_annotator.py:78-85).
    """
    is_url = col.contains("http") & col.contains("_")
    seg = F.when(is_url, _last_segment(col, _HTTP_SPLIT)).otherwise(
        _last_segment(col, _PLAIN_SPLIT)
    )
    # rstrip(character set of seg), then drop one more char — exact parity
    # with data_utils.py:260-261. Two-arg rtrim IS Python's rstrip(charset)
    # (trailing character-SET strip); the previous per-row regex
    # ("[\\Qseg\\E]+$") both compiled a pattern per row and blew up with
    # PatternSyntaxException when the segment contained a literal "\\E".
    stripped = F.rtrim(col, seg)
    prefix = stripped.substr(F.lit(1), F.length(stripped) - 1)
    if vocab_map:
        mapping = F.create_map(*[F.lit(x) for kv in vocab_map.items() for x in kv])
        prefix = F.coalesce(mapping[prefix], prefix)
    return F.concat(prefix, F.lit(":"), F.lower(seg))


def uri_short_id(col: Column) -> Column:
    """``http://purl.obolibrary.org/obo/HP_0008181`` → ``HP_0008181``.

    (reference: ``uri.split('/')[-1]``, e.g. data_utils.py:442)
    """
    return F.element_at(F.split(col, "/"), -1)


def uri_ont_type(col: Column) -> Column:
    """URI → ontology type, e.g. ``HP`` (clinical_concept_annotator.py:270)."""
    return F.element_at(F.split(uri_short_id(col), "_"), 1)


def uri_to_code(col: Column) -> Column:
    """URI → joinable code, e.g. ``hp:0008181`` (data_utils.py:327)."""
    return F.lower(F.regexp_replace(uri_short_id(col), "_", ":"))
