"""Output-boundary compatibility exports.

The reference ships wide CSV mapping files and per-concept JSON exports
(SURVEY.md §2.1 S7/S9); these helpers reproduce that boundary:
  * ``export_wide_csv`` — single-header CSV with the reference's Excel cell
    clamp: every string cell truncated to 32,500 chars
    (/root/reference/omop2obo/utils/data_utils.py:617-620, P8) and nulls
    rendered as '' (P3 fillna, main.py:142)
  * ``export_json`` — line-delimited JSON (the N3C-style export surface,
    applications/N3C/n3c_mapping_conversion.py:116-140)
  * ``explode_result_types`` — the LABS RESULT_TYPE row fan-out
    (main.py:127-139, F10): rows whose result type is '/'-packed
    (``Normal/Low/High``) are duplicated per component
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EXCEL_CELL_LIMIT = 32500


def clamp_cells(df: DataFrame) -> DataFrame:
    """Truncate every string column to the Excel cell limit, '' for null."""
    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, T.StringType):
            cols.append(F.substring(F.coalesce(F.col(f.name), F.lit("")), 1, EXCEL_CELL_LIMIT).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def export_wide_csv(df: DataFrame, path: str) -> None:
    clamp_cells(df).coalesce(1).write.option("header", True).mode("overwrite").csv(path)


def export_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def explode_result_types(df: DataFrame, result_col: str = "RESULT_TYPE") -> DataFrame:
    """Fan out '/'-packed result types into one row per component; rows
    without the packed pattern pass through unchanged."""
    packed = F.col(result_col).isNotNull() & F.col(result_col).contains("/")
    parts = F.when(packed, F.split(F.col(result_col), "/")).otherwise(F.array(F.col(result_col)))
    return df.withColumn(result_col, F.explode(parts))


# ---------------------------------------------------------------------------
# RDF N-Triples serialization (the standards-conformant face of the triple
# sink — S7's graph output as consumable RDF, one line per triple)
# ---------------------------------------------------------------------------

# CURIE prefix → absolute IRI base. obo:/owl: are the public namespaces;
# transcript:/omop2obo: are this engine's own output namespaces.
NT_PREFIXES = {
    "obo:": "http://purl.obolibrary.org/obo/",
    "owl:": "http://www.w3.org/2002/07/owl#",
    "omop2obo:": "https://w3id.org/omop2obo/",
    "transcript:": "https://w3id.org/omop2obo/transcript/",
    "umls:": "https://w3id.org/omop2obo/umls/",
}


def _nt_escape(col: Column) -> Column:
    """N-Triples literal escaping: backslash first, then quote/LF/CR/TAB."""
    out = F.regexp_replace(col, r"\\", r"\\\\")
    out = F.regexp_replace(out, '"', r'\\"')
    out = F.regexp_replace(out, "\n", r"\\n")
    out = F.regexp_replace(out, "\r", r"\\r")
    out = F.regexp_replace(out, "\t", r"\\t")
    return out


def _nt_expand(col: Column) -> Column:
    expr = None
    for pfx, base in NT_PREFIXES.items():
        branch = F.concat(F.lit(base), F.substring(col, len(pfx) + 1, 1 << 24))
        cond = col.startswith(pfx)
        expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
    return expr.otherwise(col)


def ntriple_lines(triples: DataFrame) -> DataFrame:
    """(subj, pred, obj) → one N-Triples line per row (column ``line``).

    Subjects/predicates are CURIEs expanded via :data:`NT_PREFIXES`;
    objects are IRIs when they carry a known CURIE prefix, otherwise
    escaped literals (mapping categories, evidence strings). Pure native
    expressions — serialization happens at the scan, no shuffle; pair
    with ``df.write.text`` for the partitioned sink.
    """
    is_iri = None
    for pfx in NT_PREFIXES:
        c = F.col("obj").startswith(pfx)
        is_iri = c if is_iri is None else (is_iri | c)
    obj_term = F.when(
        is_iri, F.concat(F.lit("<"), _nt_expand(F.col("obj")), F.lit(">"))
    ).otherwise(F.concat(F.lit('"'), _nt_escape(F.col("obj")), F.lit('"')))
    line = F.concat(
        F.lit("<"), _nt_expand(F.col("subj")), F.lit("> <"),
        _nt_expand(F.col("pred")), F.lit("> "), obj_term, F.lit(" ."),
    )
    return triples.select(line.alias("line"))


def export_ntriples(triples: DataFrame, path: str) -> None:
    """Write the graph as partitioned N-Triples text files."""
    ntriple_lines(triples).write.mode("overwrite").text(path)
