"""Canonicalization: compile link candidates into final per-entity,
per-ontology mappings with category tiers and formatted evidence.

This is the Spark-native replacement for the reference's single-threaded
aggregates_mapping_results row loop
(/root/reference/omop2obo/utils/data_utils.py:551-622 — the step its
authors flag as taking "up to several hours" and needing parallelization,
:557,:575-576). Everything here is one groupBy per side (exact, sim) plus
window functions — no Python in the path.

Semantics reproduced:
  * concept-over-ancestor level preference: if any concept-level exact link
    exists, ancestor-level links are dropped (compiles_mapping_content
    ``if exact_uri: break``, data_utils.py:438-449);
  * similarity short-circuit: any 1.0 → keep only 1.0s; elif any ≥
    threshold → keep those; else keep all (filters_mapping_content,
    data_utils.py:407-418);
  * mapping categories (assigns_mapping_category, data_utils.py:518-548):
    similarity → >1 match = 'Automatic Constructor - Concept' else 'Manual
    Exact - Concept Similarity'; exact → ancestor evidence present =
    'Automatic {Exact|Constructor} - Ancestor' else '- Concept', plural by
    #distinct URIs;
  * formatted evidence (formats_mapping_evidence, data_utils.py:458-515):
    ``OBO_DbXref-OMOP_<LVL>_CODE:<prefix>_<id>``,
    ``OBO_<LABEL|synonymType>-OMOP_<LVL>_<LABEL|SYNONYM>:<string>``,
    ``CONCEPT_SIMILARITY:<URI>_<score>`` — golden values per
    tests/test_data_utils.py:457-562.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from omop2obo_spark.functions.normalize import uri_short_id
from omop2obo_spark.operators.aggregate import ordered_concat_expr


def format_exact_evidence(links: DataFrame, level_col: str = "LEVEL") -> DataFrame:
    """Add ``FMT_EVIDENCE`` per link row (native expressions)."""
    lvl = F.upper(F.col(level_col))
    ev = F.col("EVIDENCE")
    # dbxref: 'OBO_<type>-OMOP_<LVL>_CODE:<prefix>_<id>' — prefix is the
    # first ':' component of the tail-after-last-underscore of the raw
    # evidence, id is the last ':' component (data_utils.py:486-492).
    tail = F.element_at(F.split(ev, "_"), -1)
    dbx_fmt = F.concat(
        F.lit("OBO_"), F.col("MATCH_SUBTYPE"), F.lit("-OMOP_"), lvl, F.lit("_CODE:"),
        F.element_at(F.split(tail, ":"), 1), F.lit("_"), F.element_at(F.split(ev, ":"), -1),
    )
    # string: 'OBO_<LABEL|synType>-OMOP_<LVL>_<LABEL|SYNONYM>:<string>'
    obo_side = F.when(F.col("MATCH_KIND") == "label", F.lit("LABEL")).otherwise(F.col("MATCH_SUBTYPE"))
    omop_side = F.when(F.lower(F.col("CODE_COLUMN")).contains("label"), F.lit("LABEL")).otherwise(
        F.lit("SYNONYM")
    )
    str_fmt = F.concat(
        F.lit("OBO_"), obo_side, F.lit("-OMOP_"), lvl, F.lit("_"), omop_side, F.lit(":"),
        F.element_at(F.split(ev, ":"), -1),
    )
    return links.withColumn(
        "FMT_EVIDENCE", F.when(F.col("MATCH_KIND") == "dbxref", dbx_fmt).otherwise(str_fmt)
    )


def compile_exact_mappings(links: DataFrame, key_cols: list[str], level_col: str = "LEVEL") -> DataFrame:
    """Aggregate exact-tier links → one row per (key, ONT_TYPE).

    Output: key cols + ONT_TYPE + AGG_URI, AGG_LABEL, AGG_MAPPING,
    AGG_EVIDENCE (the reference's AGGREGATED_<ONT>_* block).
    """
    fmt = format_exact_evidence(links, level_col)
    grp = [*key_cols, "ONT_TYPE"]

    # concept-over-ancestor preference
    w = Window.partitionBy(*grp)
    has_concept = F.max(F.when(F.col(level_col) == "concept", 1).otherwise(0)).over(w)
    kept = fmt.withColumn("__hc", has_concept).filter(
        (F.col("__hc") == 0) | (F.col(level_col) == "concept")
    )

    # ordering: dbxref block before string block (the reference iterates
    # DBXREF columns before STR columns), then tier/src ranks, then the
    # evidence text for a stable total order.
    kept = kept.withColumn(
        "__blk", F.when(F.col("MATCH_KIND") == "dbxref", 0).otherwise(1)
    ).withColumn("__uri_short", uri_short_id(F.col("URI")))
    order = ["__blk", "tier_rank", "src_rank", "EVIDENCE"]

    agg = kept.groupBy(*grp).agg(
        ordered_concat_expr("__uri_short", order).alias("AGG_URI"),
        ordered_concat_expr("LABEL", order).alias("AGG_LABEL"),
        ordered_concat_expr("FMT_EVIDENCE", order).alias("AGG_EVIDENCE"),
        F.countDistinct("URI").alias("__n_uri"),
        F.max(F.when(F.upper(F.col(level_col)) == "ANCESTOR", 1).otherwise(0)).alias("__anc"),
    )
    category = (
        F.when((F.col("__anc") == 0) & (F.col("__n_uri") > 1), "Automatic Constructor - Concept")
        .when(F.col("__anc") == 0, "Automatic Exact - Concept")
        .when(F.col("__n_uri") > 1, "Automatic Constructor - Ancestor")
        .otherwise("Automatic Exact - Ancestor")
    )
    return agg.withColumn("AGG_MAPPING", category).drop("__n_uri", "__anc")


def compile_similarity_mappings(
    sim: DataFrame,
    labels: DataFrame,
    key_cols: list[str],
    threshold: float = 0.25,
) -> DataFrame:
    """Aggregate similarity-tier matches → one row per (key, ONT_TYPE).

    ``sim`` columns: key cols + sim_uri (short id) + score (rounded 3) +
    rank (desc-score order). ``labels``: (URI, LABEL) dimension.
    Output: key cols + ONT_TYPE + SIM_URI, SIM_LABEL, SIM_MAPPING,
    SIM_EVIDENCE (the reference's SIMILARITY_<ONT>_* block).
    """
    with_ont = sim.withColumn("ONT_TYPE", F.element_at(F.split(F.col("sim_uri"), "_"), 1))
    grp = [*key_cols, "ONT_TYPE"]
    w = Window.partitionBy(*grp)

    # 1.0 short-circuit / threshold keep / keep-all
    mx = F.max("score").over(w)
    kept = with_ont.withColumn("__mx", mx).filter(
        F.when(F.col("__mx") == 1.0, F.col("score") == 1.0)
        .when(F.col("__mx") >= threshold, F.col("score") >= threshold)
        .otherwise(F.lit(True))
    )
    short_labels = labels.select(uri_short_id(F.col("URI")).alias("sim_uri"), F.col("LABEL"))
    kept = (
        kept.join(F.broadcast(short_labels), on="sim_uri", how="left")
        .withColumn("LABEL", F.coalesce(F.col("LABEL"), F.col("sim_uri")))
        .withColumn(
            "__evid",
            F.concat(F.lit("CONCEPT_SIMILARITY:"), F.col("sim_uri"), F.lit("_"),
                     F.round(F.col("score"), 3).cast("string")),
        )
    )
    order = ["rank", "sim_uri"]
    agg = kept.groupBy(*grp).agg(
        ordered_concat_expr("sim_uri", order).alias("SIM_URI"),
        ordered_concat_expr("LABEL", order).alias("SIM_LABEL"),
        ordered_concat_expr("__evid", order).alias("SIM_EVIDENCE"),
        F.count("*").alias("__n"),
    )
    category = F.when(F.col("__n") > 1, "Automatic Constructor - Concept").otherwise(
        "Manual Exact - Concept Similarity"
    )
    return agg.withColumn("SIM_MAPPING", category).drop("__n")


def compile_mappings(
    exact_links: DataFrame | None,
    sim: DataFrame | None,
    labels: DataFrame,
    key_cols: list[str],
    threshold: float = 0.25,
) -> DataFrame:
    """Full-outer merge of exact and similarity blocks per (key, ONT_TYPE)."""
    parts = []
    if exact_links is not None:
        parts.append(compile_exact_mappings(exact_links, key_cols))
    if sim is not None:
        parts.append(compile_similarity_mappings(sim, labels, key_cols, threshold))
    if len(parts) == 1:
        return parts[0]
    return parts[0].join(parts[1], on=[*key_cols, "ONT_TYPE"], how="full_outer")
