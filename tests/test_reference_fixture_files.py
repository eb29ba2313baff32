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


CLIN_CSV = f"{REF_ROOT}/tests/data/clinical_data/sample_omop_condition_occurrence_data.csv"
REF_ANNOTATOR = f"{REF_ROOT}/omop2obo/clinical_concept_annotator.py"


def _load_reference_annotator_class():
    """Import the reference's ConceptAnnotator with a package shim for its
    ``from omop2obo.utils import *`` (backed by the shimmed data_utils
    module — reference code imported and executed, never copied). The
    shim modules are removed from sys.modules after the import so they
    cannot leak into other tests."""
    ref_utils = _load_reference_data_utils()
    pkg = types.ModuleType("omop2obo")
    pkg.__path__ = []  # mark as package
    utils_mod = types.ModuleType("omop2obo.utils")
    for name in dir(ref_utils):
        if not name.startswith("_"):
            setattr(utils_mod, name, getattr(ref_utils, name))
    saved = {k: sys.modules.get(k) for k in ("omop2obo", "omop2obo.utils")}
    sys.modules["omop2obo"] = pkg
    sys.modules["omop2obo.utils"] = utils_mod
    try:
        spec = importlib.util.spec_from_file_location("ref_annotator_fx", REF_ANNOTATOR)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod.ConceptAnnotator, ref_utils


def _reference_umls_tables(ref, vm):
    """The reference's own MRCONSO/MRSTY prep recipes
    (clinical_concept_annotator.py:158-170, :183-185) on its own files,
    with ITS normalizes_source_codes."""
    headers = ["CUI", "LANG", "SAB", "CODE"]
    raw = pd.read_csv(
        MRCONSO_FAKE, sep="|", names=headers, low_memory=False, header=None,
        usecols=[0, 1, 11, 13],
    ).drop_duplicates().astype(str)
    df = raw[(raw.CODE != "NOCODE") & (raw.LANG == "ENG")]
    cui = df[["CUI", "SAB", "CODE"]].drop_duplicates().copy()
    cui["CODE"] = cui["SAB"] + ":" + cui["CODE"].str.lower()
    cui["CODE"] = cui["CODE"].apply(
        lambda j: ":".join(j.split(":")[1:]) if len(j.split(":")) > 2 else j
    )
    cui["CODE"] = ref.normalizes_source_codes(cui["CODE"].to_frame(), vm)
    tui = pd.read_csv(
        MRSTY_FAKE, header=None, sep="|", names=["CUI", "STY"],
        low_memory=False, usecols=[0, 3],
    ).drop_duplicates().astype(str)
    return cui, tui


@pytest.mark.parametrize("double_merge,ref_expected_rows", [(True, 66), (False, 3)])
def test_umls_annotate_matches_annotator_on_reference_fixtures(
    spark, double_merge, ref_expected_rows
):
    """End-to-end J1/J2/J3 differential on the reference's OWN fixture
    stack: its clinical sample CSV + MRCONSO_FAKE/MRSTY_FAKE through its
    own ConceptAnnotator.umls_cui_annotator (executed in-process) vs our
    umls_annotate — row-set equality, plus the reference test-suite's own
    pinned cardinalities (test_clinical_concept_annotator.py:241, :260)."""
    from omop2obo_spark.operators.linking import prepare_mrconso, umls_annotate
    from omop2obo_spark.sources.readers import (
        read_mrconso_rrf,
        read_mrsty_rrf,
        read_vocab_map,
    )

    Annotator, ref = _load_reference_annotator_class()
    vm = read_vocab_map(spark, VOCAB_CSV)

    # identical pre-normalized clinical input on both sides (the reference's
    # own test normalizes codes first, test_clinical_concept_annotator.py:236)
    clin = pd.read_csv(CLIN_CSV, header=0, low_memory=False).astype(str)
    clin["CONCEPT_SOURCE_CODE"] = ref.normalizes_source_codes(
        clin["CONCEPT_SOURCE_CODE"].to_frame(), vm
    )

    # reference side: the real method on an attribute-stub instance (its
    # __init__ only validates paths and loads the same three tables)
    cui, tui = _reference_umls_tables(ref, vm)
    ann = object.__new__(Annotator)
    ann.umls_double_merge = double_merge
    ann.umls_cui_data = cui
    ann.umls_tui_data = tui
    theirs = ann.umls_cui_annotator(clin, "CONCEPT_ID", "CONCEPT_SOURCE_CODE")
    assert len(theirs) == ref_expected_rows  # the reference's own pins

    # our side: Spark readers + prep + annotate on the same files
    codes = spark.createDataFrame(clin[["CONCEPT_ID", "CONCEPT_SOURCE_CODE"]])
    umls = prepare_mrconso(read_mrconso_rrf(spark, MRCONSO_FAKE), vm)
    ours_df = umls_annotate(
        codes, umls, read_mrsty_rrf(spark, MRSTY_FAKE),
        ["CONCEPT_ID"], "CONCEPT_SOURCE_CODE", double_merge=double_merge,
    )

    def rowset(frame: pd.DataFrame) -> set[tuple]:
        cols = ["CONCEPT_ID", "CONCEPT_SOURCE_CODE", "UMLS_CUI", "UMLS_SAB",
                "UMLS_CODE", "UMLS_SEM_TYPE"]
        f = frame[cols].where(pd.notna(frame[cols]), None)
        return set(map(tuple, f.itertuples(index=False)))

    assert rowset(ours_df.toPandas()) == rowset(theirs)
