"""Differential tests for the reshape/aggregation/normalization primitives:
execute the REFERENCE'S OWN functions (normalizes_source_codes,
aggregates_column_values, column_splitter, data_frame_grouper —
/root/reference/omop2obo/utils/data_utils.py) on randomized fixtures next
to our Spark operators and require exact equality.

Complements the golden-vector tests (which pin a handful of
reference-authored cases) with breadth: hundreds of seeded-random inputs
per primitive, same shim-import machinery as
tests/test_reference_differential.py.

Known hardening divergence (not exercised here): the reference raises
IndexError on identifiers with no non-empty segment (e.g. ``':::'``);
our ``try_element_at`` yields NULL instead — mandatory on a 10^12-row
table (functions/normalize.py:29-35).
"""

from __future__ import annotations

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.test_reference_differential import ref

pytestmark = pytest.mark.skipif(ref is None, reason="reference repo not present")

VOCAB_MAP = {
    "snomedct_us": "snomed",
    "snomed_ct": "snomed",
    "ICD10CM": "icd10",
    "msh2024": "msh",
}


def _random_codes(rng: random.Random, n=300) -> list[str]:
    prefixes = ["snomedct_us", "snomed_ct", "ICD10CM", "msh2024", "umls", "rxnorm",
                "reactome", "pesticides"]
    out = []
    for _ in range(n):
        kind = rng.random()
        num = str(rng.randint(100, 99999999))
        if kind < 0.5:
            pfx = rng.choice(prefixes)
            idp = rng.choice([num, f"c{num}", f"C{num}", f"r-hsa-{num}", f"{num}.9"])
            out.append(f"{pfx}:{idp}")
        elif kind < 0.65:  # multi-separator form (derivatives/benazolin-ethyl class)
            out.append(f"{rng.choice(prefixes)}:derivatives/benazolin-{num}")
        elif kind < 0.8:  # URL without underscore -> plain split on [:|/]
            out.append(f"http://www.snomedbrowser.com/codes/details/{num}")
        else:  # URL with underscore -> split on [_:|/]
            out.append(f"http://www.orpha.net/ordo/orphanet_{num}")
    return out


def test_normalize_source_codes_differential(spark):
    rng = random.Random(7)
    codes = _random_codes(rng)
    expected = list(
        ref.normalizes_source_codes(pd.DataFrame({"CODE": codes}), VOCAB_MAP)
    )

    from omop2obo_spark.functions.normalize import normalize_source_codes

    df = spark.createDataFrame([(c,) for c in codes], "CODE string")
    got = [
        r.norm
        for r in df.select(
            normalize_source_codes(F.col("CODE"), VOCAB_MAP).alias("norm")
        ).collect()
    ]
    assert got == expected


def test_aggregates_column_values_differential(spark):
    rng = random.Random(11)
    rows = []
    for i in range(200):
        key = f"k{rng.randint(0, 40)}"
        rows.append((key, f"a{rng.randint(0, 5)}", f"b{rng.randint(0, 3)}", i))
    pdf = pd.DataFrame(rows, columns=["KEY", "A", "B", "rn"])
    ref_out = ref.aggregates_column_values(pdf[["KEY", "A", "B"]], "KEY", ["A", "B"], " | ")
    expected = {r.KEY: (r.A, r.B) for r in ref_out.itertuples()}

    from omop2obo_spark.operators.aggregate import ordered_concat_agg

    df = spark.createDataFrame(rows, "KEY string, A string, B string, rn int")
    got = {
        r.KEY: (r.A, r.B)
        for r in ordered_concat_agg(df, "KEY", ["A", "B"], ["rn"]).collect()
    }
    assert got == expected


def test_column_splitter_differential(spark):
    rng = random.Random(13)
    rows = []
    for i in range(60):
        a = "|".join(f" a{rng.randint(0, 9)} " for _ in range(rng.randint(1, 3)))
        b = "|".join(f"b{rng.randint(0, 9)}" for _ in range(rng.randint(1, 4)))
        rows.append((f"k{i % 25}", a, b))
    pdf = pd.DataFrame(rows, columns=["KEY", "CA", "CB"])
    ref_out = ref.column_splitter(pdf.copy(), "KEY", ["CA", "CB"], "|")
    expected = {tuple(r) for r in ref_out[["KEY", "CA", "CB"]].itertuples(index=False)}

    from omop2obo_spark.operators.reshape import split_explode_columns

    df = spark.createDataFrame(rows, "KEY string, CA string, CB string")
    got = {
        (r.KEY, r.CA, r.CB)
        for r in split_explode_columns(df, "KEY", ["CA", "CB"], "|").collect()
    }
    assert got == expected
    # the reference's 13-from-5 class cross-product is present: some key
    # with len(CA-parts) x len(CB-parts) > parts-sum must exist
    assert len(expected) > len({k for k, _, _ in expected})


def test_data_frame_grouper_differential(spark):
    rng = random.Random(17)
    rows = []
    for i in range(120):
        ont = rng.choice(["HP", "MONDO"])
        rows.append(
            (f"c{rng.randint(0, 30)}",
             f"http://purl.obolibrary.org/obo/{ont}_{rng.randint(1, 20):07d}",
             ont,
             f"label {rng.randint(0, 9)}",
             f"CONCEPT_DBXREF_sctid:{rng.randint(100, 999)}",
             i)
        )
    cols = [
        "CONCEPT_ID", "CONCEPT_DBXREF_ONT_URI", "CONCEPT_DBXREF_ONT_TYPE",
        "CONCEPT_DBXREF_ONT_LABEL", "CONCEPT_DBXREF_ONT_EVIDENCE", "rn",
    ]
    pdf = pd.DataFrame(rows, columns=cols)
    ref_out = ref.data_frame_grouper(
        pdf[cols[:-1]].copy(), "CONCEPT_ID", "CONCEPT_DBXREF_ONT_TYPE",
        ref.aggregates_column_values,
    )

    from omop2obo_spark.operators.aggregate import grouped_pivot_agg

    df = spark.createDataFrame(
        rows,
        "CONCEPT_ID string, CONCEPT_DBXREF_ONT_URI string, "
        "CONCEPT_DBXREF_ONT_TYPE string, CONCEPT_DBXREF_ONT_LABEL string, "
        "CONCEPT_DBXREF_ONT_EVIDENCE string, rn int",
    )
    ours = grouped_pivot_agg(
        df, "CONCEPT_ID", "CONCEPT_DBXREF_ONT_TYPE",
        ["CONCEPT_DBXREF_ONT_URI", "CONCEPT_DBXREF_ONT_LABEL", "CONCEPT_DBXREF_ONT_EVIDENCE"],
        ["rn"], type_values=["HP", "MONDO"],
    ).toPandas()

    assert set(ref_out.columns) == set(ours.columns)
    ref_idx = ref_out.set_index("CONCEPT_ID").sort_index()
    our_idx = ours.set_index("CONCEPT_ID").sort_index()
    assert list(ref_idx.index) == list(our_idx.index)
    for col in ref_idx.columns:
        for cid in ref_idx.index:
            rv, ov = ref_idx.at[cid, col], our_idx.at[cid, col]
            rv = None if pd.isna(rv) else rv
            ov = None if ov is None or pd.isna(ov) else ov
            assert rv == ov, (cid, col, rv, ov)
