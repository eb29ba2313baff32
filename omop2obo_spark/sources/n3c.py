"""N3C / OHDSI-Atlas concept-set export layouts.

The reference ships an N3C application that converts finished OMOP2OBO
mappings into (a) one Atlas-formatted concept-set-expression JSON file
per OMOP concept and (b) a concept-set *container* CSV for the N3C
Enclave (reference ``applications/N3C/n3c_mapping_conversion.py:46-198``
— ``omop_concept_set_exp`` / ``writes_atlas_json_files`` /
``creates_concept_set_container``).  The reference builds both with
driver-side dict loops + per-file ``json.dump``; here each layout is a
DataFrame transformation — one row per concept with the rendered
``filename`` + payload — so a 10^6-concept export is a partitioned
write, not a million sequential ``open()`` calls.

Faithfulness notes:
  * the JSON text is rendered byte-for-byte as the reference's
    ``json.dump(.., indent=4)`` output (pinned by a differential test
    that executes the reference's own ``omop_concept_set_exp``);
  * the reference's formatting quirks are preserved: ``CONCEPT_NAME``
    title-cased, ``CONCEPT_CODE`` emitted as an int, the ontology URI
    lower-cased with spaces removed (``:60``), the filename's
    ``' | '→'|'  '/'→'-'  ' '→'_'`` replacement chain (``:63-64``),
    and the container's ``'[OMOP2OBO] '`` id/name prefix and
    ids-labels alias (``:160-167``);
  * title-casing is word-wise (upper first letter, lower rest, split on
    single spaces) — identical to Python ``str.title()`` for the
    alphanumeric space-separated vocabulary these exports carry.

Expected input columns (the wide-mapping export grain):
(concept_id, concept_name, concept_code, vocabulary_id, map_category,
 map_evidence, map_logic, ontology_uri, ontology_label).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ATLAS_TEMPLATE = """{
    "items": {
        "concept": {
            "CONCEPT_ID": %s,
            "CONCEPT_NAME": "%s",
            "STANDARD_CONCEPT": null,
            "STANDARD_CONCEPT_CAPTION": null,
            "CONCEPT_CODE": %s,
            "DOMAIN_ID": null,
            "VOCABULARY_ID": "%s"
        },
        "isExcluded": false,
        "includeDescendants": %s,
        "includeMapped": true,
        "ONTOLOGY_CONCEPT_MAPPING_MEMBERS": {
            "identifiers": "%s",
            "labels": "%s"
        },
        "ONTOLOGY_CONCEPT_MAPPING_LOGIC": "%s",
        "MAPPING_CATEGORY": "%s",
        "MAPPING_EVIDENCE": "%s"
    }
}"""


def _title_case(col: Column) -> Column:
    """Python ``str.title()`` for single-space-separated alnum words."""
    return F.array_join(
        F.transform(
            F.split(col, " "),
            lambda w: F.concat(
                F.upper(w.substr(F.lit(1), F.lit(1))),
                F.lower(w.substr(F.lit(2), F.length(w))),
            ),
        ),
        " ",
    )


def _ont_id(col: Column) -> Column:
    """Reference :60 — URI lower-cased, spaces removed."""
    return F.replace(F.lower(col), F.lit(" "), F.lit(""))


def _filename(concept_id: Column, concept_name: Column) -> Column:
    """Reference :63-64 — ``{id}-{name | cleaned}.json``."""
    cleaned = F.replace(
        F.replace(
            F.replace(F.lower(concept_name), F.lit(" | "), F.lit("|")),
            F.lit("/"),
            F.lit("-"),
        ),
        F.lit(" "),
        F.lit("_"),
    )
    return F.format_string("%s-%s.json", concept_id.cast("string"), cleaned)


def atlas_concept_sets(
    mappings: DataFrame, include_descendants: bool = False
) -> DataFrame:
    """One Atlas concept-set-expression JSON document per mapping row:
    (concept_id, filename, atlas_json).  ``atlas_json`` is the exact
    ``json.dump(indent=4)`` rendering of the reference's
    ``omop_concept_set_exp`` dict wrapped in ``{'items': ...}``.

    Narrow (per-row) transformation — no shuffle at all; a 100 TB-scale
    export parallelizes by input partitioning and writes with
    ``partitionBy`` instead of the reference's sequential file loop.
    """
    return mappings.select(
        "concept_id",
        _filename(F.col("concept_id"), F.col("concept_name")).alias("filename"),
        F.format_string(
            _ATLAS_TEMPLATE,
            F.col("concept_id").cast("string"),
            _title_case(F.col("concept_name")),
            F.col("concept_code").cast("long").cast("string"),
            F.col("vocabulary_id"),
            F.lit("true" if include_descendants else "false"),
            _ont_id(F.col("ontology_uri")),
            F.col("ontology_label"),
            F.col("map_logic"),
            F.col("map_category"),
            F.col("map_evidence"),
        ).alias("atlas_json"),
    )


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
    """The N3C Enclave concept-set container table (reference :145-198),
    one row per mapping with the reference's 13 columns.  The enclave
    parameters arrive as keyword literals (the reference reads them from
    an ``enclave_params`` dict).  ``intention`` is the header plus the
    per-concept line rendered from category + evidence, and ``alias`` is
    the lower-cased ids-labels pair with the reference's replacement
    chain (:166-167).  Narrow per-row plan, no shuffle.
    """
    stem = F.regexp_replace(
        _filename(F.col("concept_id"), F.col("concept_name")), r"\.json$", ""
    )
    set_id = F.format_string("[OMOP2OBO] %s", stem)
    ids = F.replace(F.lower(F.col("ontology_uri")), F.lit(" | "), F.lit("|"))
    labels = F.replace(
        F.replace(
            F.replace(F.lower(F.col("ontology_label")), F.lit("/"), F.lit("-")),
            F.lit(" | "),
            F.lit("|"),
        ),
        F.lit(" "),
        F.lit("_"),
    )
    tmpl = intention_template.replace("{}", "%s")
    intention = F.concat(
        F.lit(intention_header),
        F.format_string(
            tmpl,
            F.col("concept_id").cast("string"),
            F.col("map_category"),
            F.col("map_evidence"),
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
        F.format_string("%s-%s", ids, labels).alias("alias"),
        F.lit(archived).alias("archived"),
        F.lit(created_by).alias("created_by"),
        F.lit(created_at).alias("created_at"),
    )
