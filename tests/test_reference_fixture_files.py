"""Differential test over the REFERENCE'S OWN test-fixture FILES.

The north rule pins verification "against OMOP2OBO's own mapping test
fixtures". The golden-vector suites already mirror the reference's
expected values; this suite goes one step further and feeds the actual
fixture files its test-suite ships
(/root/reference/tests/data/mappings/MRCONSO_FAKE.RRF, MRSTY_FAKE.RRF,
source_code_vocab_map.csv — the files
tests/test_clinical_concept_annotator.py:33-49 constructs the annotator
from) through OUR Spark readers and UMLS prep, side-by-side with the
reference's own loading recipe:

* vocab map — clinical_concept_annotator.py:79-84 (header-skipped
  ``' | '``-exploded alias dict);
* MRCONSO — clinical_concept_annotator.py:158-170 (usecols 0/1/11/13,
  NOCODE/ENG filter, ``SAB:code.lower()`` with the >2-colon collapse,
  then ``normalizes_source_codes`` — the reference's function imported
  and EXECUTED in-process, never copied);
* MRSTY — clinical_concept_annotator.py:183-185 (usecols 0/3).

Row-exact equality required on every surface.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

import pandas as pd
import pytest

REF_ROOT = "/root/reference"
REF_DATA_UTILS = f"{REF_ROOT}/omop2obo/utils/data_utils.py"
MRCONSO_FAKE = f"{REF_ROOT}/tests/data/mappings/MRCONSO_FAKE.RRF"
MRSTY_FAKE = f"{REF_ROOT}/tests/data/mappings/MRSTY_FAKE.RRF"
VOCAB_CSV = f"{REF_ROOT}/tests/data/mappings/source_code_vocab_map.csv"

pytestmark = pytest.mark.skipif(
    not os.path.exists(MRCONSO_FAKE), reason="reference fixture files unavailable"
)


def _load_reference_data_utils():
    """Import the reference module with stdlib shims for its missing deps
    (same shim as test_reference_differential.py — imported and executed,
    never copied)."""
    if "more_itertools" not in sys.modules:
        mi = types.ModuleType("more_itertools")

        def unique_everseen(iterable):
            seen = set()
            for x in iterable:
                if x not in seen:
                    seen.add(x)
                    yield x

        mi.unique_everseen = unique_everseen
        sys.modules["more_itertools"] = mi
    if "tqdm" not in sys.modules:
        tq = types.ModuleType("tqdm")
        tq.tqdm = lambda it, total=None: it
        sys.modules["tqdm"] = tq
    spec = importlib.util.spec_from_file_location("ref_data_utils_fx", REF_DATA_UTILS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _reference_vocab_map() -> dict[str, str]:
    """The reference's own 5-line loader recipe
    (clinical_concept_annotator.py:79-84), driven on its own file."""
    out: dict[str, str] = {}
    with open(VOCAB_CSV) as f:
        for x in f.read().splitlines()[1:]:
            row = x.split(",")
            for i in row[1].split(" | "):
                out[i] = row[0]
    return out


def test_vocab_map_reader_matches_reference_loader(spark):
    from omop2obo_spark.sources.readers import read_vocab_map

    ours = read_vocab_map(spark, VOCAB_CSV)
    theirs = _reference_vocab_map()
    assert ours == theirs
    assert len(ours) > 100  # the real file, not a stub


def test_mrconso_prep_matches_reference_on_its_own_fixture(spark):
    from omop2obo_spark.operators.linking import prepare_mrconso
    from omop2obo_spark.sources.readers import read_mrconso_rrf, read_vocab_map

    ref = _load_reference_data_utils()
    vm = read_vocab_map(spark, VOCAB_CSV)

    ours = (
        prepare_mrconso(read_mrconso_rrf(spark, MRCONSO_FAKE), vm)
        .toPandas()
        .sort_values(["CUI", "SAB", "CODE"])
        .reset_index(drop=True)
    )

    # the reference's own recipe, clinical_concept_annotator.py:158-170,
    # with ITS normalizes_source_codes doing the normalization
    headers = ["CUI", "LANG", "SAB", "CODE"]
    raw = pd.read_csv(
        MRCONSO_FAKE, sep="|", names=headers, low_memory=False, header=None,
        usecols=[0, 1, 11, 13],
    ).drop_duplicates().astype(str)
    df = raw[(raw.CODE != "NOCODE") & (raw.LANG == "ENG")]
    theirs = df[["CUI", "SAB", "CODE"]].drop_duplicates().copy()
    theirs["CODE"] = theirs["SAB"] + ":" + theirs["CODE"].str.lower()
    theirs["CODE"] = theirs["CODE"].apply(
        lambda j: ":".join(j.split(":")[1:]) if len(j.split(":")) > 2 else j
    )
    theirs["CODE"] = ref.normalizes_source_codes(theirs["CODE"].to_frame(), vm)
    theirs = theirs.sort_values(["CUI", "SAB", "CODE"]).reset_index(drop=True)

    assert len(ours) > 0
    pd.testing.assert_frame_equal(ours, theirs, check_dtype=False)


def test_mrsty_reader_matches_reference_on_its_own_fixture(spark):
    from omop2obo_spark.sources.readers import read_mrsty_rrf

    ours = {
        (r.CUI, r.STY) for r in read_mrsty_rrf(spark, MRSTY_FAKE).collect()
    }
    theirs = pd.read_csv(
        MRSTY_FAKE, header=None, sep="|", names=["CUI", "STY"],
        low_memory=False, usecols=[0, 3],
    ).drop_duplicates().astype(str)
    assert ours == set(map(tuple, theirs.itertuples(index=False)))
    assert len(ours) > 0


CHI_FIXTURE = f"{REF_ROOT}/tests/data/chi_square_test_data.txt"


def test_chi_square_on_reference_analysis_fixture(spark):
    """Drive the reference's shipped contingency fixture
    (tests/data/chi_square_test_data.txt — per-ontology dbxref/label/
    synonym counts) through the weighted chi-square path and require the
    scipy-semantics statistic per pair (the same arithmetic
    analytic_utils.py:199 feeds to chi2_contingency)."""
    from omop2obo_spark.operators.analysis import chi_square_pairs

    wide = pd.read_csv(CHI_FIXTURE)
    kinds = ["dbxref", "label", "synonym"]
    long_rows = [
        (r["ontology"], k, int(r[k])) for _, r in wide.iterrows() for k in kinds
    ]
    df = spark.createDataFrame(long_rows, "ontology string, kind string, n long")
    got = {
        r["comparison"]: r
        for r in chi_square_pairs(df, "ontology", "kind", weight_col="n").collect()
    }

    def ref_chi2(table):
        # plain-Python chi2_contingency(correction=True) twin (scipy absent)
        r, c = len(table), len(table[0])
        rt = [sum(row) for row in table]
        ct = [sum(table[i][j] for i in range(r)) for j in range(c)]
        g = sum(rt)
        dof = (r - 1) * (c - 1)
        chi2 = 0.0
        for i in range(r):
            for j in range(c):
                e = rt[i] * ct[j] / g
                d = abs(table[i][j] - e)
                if dof == 1:
                    d = max(d - 0.5, 0.0)
                chi2 += d * d / e
        return chi2, dof

    onts = list(wide["ontology"])
    table = {o: [int(wide[wide.ontology == o][k].iloc[0]) for k in kinds] for o in onts}
    want_omni, want_dof = ref_chi2([table[o] for o in onts])
    assert got["omnibus"]["dof"] == want_dof
    assert got["omnibus"]["chi2"] == pytest.approx(want_omni, rel=1e-9)
    assert got["omnibus"]["n"] == int(wide[kinds].to_numpy().sum())
    # every unordered ontology pair, including the VO row with a 0 cell
    import itertools

    for a, b in itertools.combinations(sorted(onts), 2):
        want_chi2, want_pair_dof = ref_chi2([table[a], table[b]])
        r = got[f"{a}-{b}"]
        assert r["dof"] == want_pair_dof
        assert r["chi2"] == pytest.approx(want_chi2, rel=1e-9)
