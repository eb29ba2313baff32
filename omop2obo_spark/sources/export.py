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

import json
import os

import pandas as pd
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
# N3C / OHDSI Atlas concept-set export
# (applications/N3C/n3c_mapping_conversion.py:46-140): each OMOP concept's
# mapping becomes one Atlas-formatted JSON concept-set expression, filed as
# '<concept_id>-<slugified_name>.json'. The reference builds these with a
# driver-side iterrows loop; here the whole layout is native column
# expressions + to_json, so the expression column materializes at the scan
# with no shuffle — only the optional per-file writer touches the driver,
# and the concept dimension is bounded (OMOP concept ids, ~10^6).
# ---------------------------------------------------------------------------


@F.pandas_udf(T.StringType())
def _py_title(s: pd.Series) -> pd.Series:
    # exact str.title() parity with the reference (capitalizes after ANY
    # non-letter — '/', digits — where initcap only splits on whitespace);
    # Arrow-vectorized and only ever applied to the bounded concept dim
    return s.str.title()


def atlas_filename_expr(concept_id: Column, concept_name: Column) -> Column:
    """'{id}-{name.lower().replace(' | ','|').replace('/','-').replace(' ','_')}.json'
    — the reference's slug chain, in its exact order (n3c_mapping_conversion.py:63-64)."""
    slug = F.lower(concept_name)
    slug = F.replace(slug, F.lit(" | "), F.lit("|"))
    slug = F.replace(slug, F.lit("/"), F.lit("-"))
    slug = F.replace(slug, F.lit(" "), F.lit("_"))
    return F.concat(concept_id.cast("string"), F.lit("-"), slug, F.lit(".json"))


def atlas_concept_sets(
    mappings: DataFrame, include_descendants: bool = False
) -> DataFrame:
    """Mapping rows → Atlas concept-set expressions.

    Input columns (the reference's mapping-file layout,
    n3c_mapping_conversion.py:58-62): CONCEPT_ID, CONCEPT_NAME,
    CONCEPT_CODE, CONCEPT_VOCAB, MAPPING_CATEGORY, MAPPING_EVIDENCE,
    ONTOLOGY_LOGIC, ONTOLOGY_URI, ONTOLOGY_LABEL.

    Output: (concept_id, filename, atlas_json) where atlas_json is the
    reference's ``{'items': omop_concept_set_exp(...)}`` object
    (n3c_mapping_conversion.py:92-133) — field order, the .title()-cased
    concept name, the lower()+space-stripped ontology URI, the int-cast
    concept code, and the explicit nulls all preserved. One deliberate
    divergence: a non-numeric CONCEPT_CODE becomes JSON null instead of
    the reference's driver-stopping ValueError — at 10^12 rows one dirty
    code must not kill the job.
    """
    exp = F.struct(
        F.struct(
            F.col("CONCEPT_ID").cast("long").alias("CONCEPT_ID"),
            _py_title(F.col("CONCEPT_NAME")).alias("CONCEPT_NAME"),
            F.lit(None).cast("string").alias("STANDARD_CONCEPT"),
            F.lit(None).cast("string").alias("STANDARD_CONCEPT_CAPTION"),
            F.col("CONCEPT_CODE").cast("long").alias("CONCEPT_CODE"),
            F.lit(None).cast("string").alias("DOMAIN_ID"),
            F.col("CONCEPT_VOCAB").alias("VOCABULARY_ID"),
        ).alias("concept"),
        F.lit(False).alias("isExcluded"),
        F.lit(include_descendants).alias("includeDescendants"),
        F.lit(True).alias("includeMapped"),
        F.struct(
            F.replace(F.lower(F.col("ONTOLOGY_URI")), F.lit(" "), F.lit("")).alias("identifiers"),
            F.col("ONTOLOGY_LABEL").alias("labels"),
        ).alias("ONTOLOGY_CONCEPT_MAPPING_MEMBERS"),
        F.col("ONTOLOGY_LOGIC").alias("ONTOLOGY_CONCEPT_MAPPING_LOGIC"),
        F.col("MAPPING_CATEGORY").alias("MAPPING_CATEGORY"),
        F.col("MAPPING_EVIDENCE").alias("MAPPING_EVIDENCE"),
    )
    return mappings.select(
        F.col("CONCEPT_ID").cast("long").alias("concept_id"),
        atlas_filename_expr(F.col("CONCEPT_ID"), F.col("CONCEPT_NAME")).alias("filename"),
        F.to_json(F.struct(exp.alias("items")), {"ignoreNullFields": "false"}).alias("atlas_json"),
    )


def write_atlas_json(
    concept_sets: DataFrame, output_location: str, per_file: bool = False
) -> None:
    """Persist Atlas concept sets. The scale path (default) writes one
    partitioned JSONL dataset — (filename, atlas_json) rows, consumable by
    any downstream filer. ``per_file=True`` reproduces the reference's
    one-file-per-concept Atlas layout (indent=4, reference filename):
    that is inherently a small-files output boundary, so it streams
    ``toLocalIterator`` (never a full collect) and is meant for the
    bounded curated-mapping dim, not a fact table."""
    if not per_file:
        concept_sets.write.mode("overwrite").json(output_location)
        return
    os.makedirs(output_location, exist_ok=True)
    for row in concept_sets.select("filename", "atlas_json").toLocalIterator():
        with open(os.path.join(output_location, row.filename), "w") as f:
            json.dump(json.loads(row.atlas_json), f, indent=4)


def concept_set_container(
    mappings: DataFrame,
    *,
    status: str = "Under Construction",
    stage: str = "Awaiting Editing",
    assigned_informatician: str = "",
    assigned_sme: str = "",
    project_id: str = "",
    n3c_reviewer: str = "",
    archived: str = "false",
    created_by: str = "",
    created_at: str = "",
    intention_header: str = "Mixed\n",
    intention_template: str = "OMOP2OBO ontology mapping for concept {}: {} ({})",
) -> DataFrame:
    """The N3C Enclave concept-set *container* table (reference
    ``applications/N3C/n3c_mapping_conversion.py:145-198`` —
    ``creates_concept_set_container``), one row per mapping with the
    reference's 13 columns. Input is the same mapping layout
    :func:`atlas_concept_sets` takes. Enclave parameters arrive as
    keyword literals (the reference reads them from an
    ``enclave_params`` dict). Faithful quirks: the ``'[OMOP2OBO] '``
    prefix on id AND name from the filename stem (:160-161), the
    ids-labels ``alias`` with the ``' | '→'|'`` / ``'/'→'-'`` /
    ``' '→'_'`` chains (:166-167), and ``intention`` as header + the
    per-concept line rendered from category + evidence (:172-177).
    Narrow per-row plan — no shuffle; at 10^6 concept sets this is one
    partitioned CSV write, not the reference's driver list append loop.
    """
    stem = F.regexp_replace(
        atlas_filename_expr(F.col("CONCEPT_ID"), F.col("CONCEPT_NAME")),
        r"\.json$",
        "",
    )
    set_id = F.concat(F.lit("[OMOP2OBO] "), stem)
    ids = F.replace(F.lower(F.col("ONTOLOGY_URI")), F.lit(" | "), F.lit("|"))
    labels = F.replace(
        F.replace(
            F.replace(F.lower(F.col("ONTOLOGY_LABEL")), F.lit("/"), F.lit("-")),
            F.lit(" | "),
            F.lit("|"),
        ),
        F.lit(" "),
        F.lit("_"),
    )
    if intention_template.count("{}") != 3:
        raise ValueError(
            "intention_template needs exactly 3 '{}' placeholders "
            "(concept_id, category, evidence); got "
            f"{intention_template.count('{}')}"
        )
    # escape literal % BEFORE the placeholder substitution: the template
    # becomes a java.util.Formatter string, where a stray '% c' crashes
    tmpl = intention_template.replace("%", "%%").replace("{}", "%s")
    intention = F.concat(
        F.lit(intention_header),
        F.format_string(
            tmpl,
            F.col("CONCEPT_ID").cast("string"),
            F.col("MAPPING_CATEGORY"),
            F.col("MAPPING_EVIDENCE"),
        ),
    )
    return mappings.select(
        set_id.alias("concept_set_id"),
        set_id.alias("concept_set_name"),
        intention.alias("intention"),
        F.lit(assigned_informatician).alias("assigned_informatician"),
        F.lit(assigned_sme).alias("assigned_sme"),
        F.lit(project_id).alias("project_id"),
        F.lit(status).alias("status"),
        F.lit(stage).alias("stage"),
        F.lit(n3c_reviewer).alias("n3c_reviewer"),
        F.concat(ids, F.lit("-"), labels).alias("alias"),
        F.lit(archived).alias("archived"),
        F.lit(created_by).alias("created_by"),
        F.lit(created_at).alias("created_at"),
    )


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


def dot_lines(
    edges: DataFrame,
    src_col: str = "ent_a",
    dst_col: str = "ent_b",
    label_col: str | None = None,
    graph_name: str = "kg",
) -> DataFrame:
    """Serialize an edge list as Graphviz DOT — the review-queue
    visualization boundary next to the N-Triples one. One ``line`` row
    per edge (``"a" -- "b" [label="..."];``) plus header/footer rows,
    ordered by ``sort_key`` so ``coalesce(1).write.text`` (or the
    oracle's string_agg) reproduces a byte-identical file.

    Quotes/backslashes in ids and labels are escaped. Pure native
    expressions at the scan; DOT output is for dimension-scale curation
    graphs (a 10^9-edge corpus graph is not a viz artifact).
    """

    def esc(c):
        return F.regexp_replace(
            F.regexp_replace(c.cast("string"), r"\\", r"\\\\"), '"', '\\\\"'
        )

    lab = (
        F.concat(F.lit(' [label="'), esc(F.col(label_col)), F.lit('"]'))
        if label_col
        else F.lit("")
    )
    edge_line = F.concat(
        F.lit('  "'), esc(F.col(src_col)), F.lit('" -- "'),
        esc(F.col(dst_col)), F.lit('"'), lab, F.lit(";"),
    )
    # sort_key carries the full rendered line (not just src|dst) so two
    # edges with identical endpoints but different labels still have a
    # deterministic relative order — required for the byte-identical-file
    # guarantee on multi-edge inputs
    body = edges.select(
        edge_line.alias("line"),
        F.concat(F.lit("1:"), edge_line).alias("sort_key"),
    )
    spark = edges.sparkSession
    head = spark.createDataFrame(
        [(f"graph {graph_name} {{", "0:"), ("}", "2:")], "line: string, sort_key: string"
    )
    return body.unionByName(head)
