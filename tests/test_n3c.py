"""N3C / Atlas export differential + container tests.

The differential imports and executes the reference's own
``omop_concept_set_exp`` (never copies it) and requires byte equality
between ``json.dumps(.., indent=4)`` of its output and the re-indented
rendering of ``sources/export.py:atlas_concept_sets`` — the same
rendering ``write_atlas_json(per_file=True)`` files to disk.  The
container tests pin ``concept_set_container``'s 13-column Enclave
layout and alias/intention quirks.
"""

from __future__ import annotations

import importlib.util
import json
import sys
import types

import pytest

from omop2obo_spark.sources.export import atlas_concept_sets, concept_set_container

REF_N3C = "/root/reference/applications/N3C/n3c_mapping_conversion.py"


def _load_reference_n3c():
    """Import the reference module, shimming its network/progress deps
    (requests/urllib3/tqdm are absent in this container and unused by the
    layout functions under test)."""
    for name in ("requests", "tqdm", "urllib3"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "tqdm":
                mod.tqdm = lambda it, total=None: it
            if name == "urllib3":
                mod.exceptions = types.SimpleNamespace(InsecureRequestWarning=Warning)
                mod.disable_warnings = lambda *a, **k: None
            sys.modules[name] = mod
    spec = importlib.util.spec_from_file_location("ref_n3c", REF_N3C)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


try:
    ref = _load_reference_n3c()
except (FileNotFoundError, OSError):  # pragma: no cover
    ref = None

pytestmark = pytest.mark.skipif(ref is None, reason="reference repo not present")

SCHEMA = (
    "CONCEPT_ID long, CONCEPT_NAME string, CONCEPT_CODE string, "
    "CONCEPT_VOCAB string, MAPPING_CATEGORY string, MAPPING_EVIDENCE string, "
    "ONTOLOGY_LOGIC string, ONTOLOGY_URI string, ONTOLOGY_LABEL string"
)

ROWS = [
    (22274, "neoplasm of uncertain behavior", "123", "SNOMED",
     "Automatic Exact - Concept", "OBO_DbXref:umls_c00001", "AND",
     "OBO HP_0000001", "Phenotype One"),
    (42, "pulmonary edema / chronic", "77", "ICD10CM",
     "Manual Exact - Concept Similarity", "CONCEPT_SIMILARITY:HP_2", "OR",
     "obo mondo_0000002 | obo hp_0000009", "Edema | Fluid"),
]


def test_atlas_json_matches_reference_renderer(spark):
    """Byte-for-byte parity with the reference's omop_concept_set_exp +
    json.dumps(indent=4) — key order, explicit nulls, .title() casing
    (incl. after '/'), URI lower/space quirk, int CONCEPT_CODE cast."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = {r.concept_id: r.atlas_json for r in atlas_concept_sets(df).collect()}
    for (cid, name, code, vocab, cat, evid, logic, uri, label) in ROWS:
        dict_entry = {
            cid: {
                "CONCEPT_ID": cid,
                "CONCEPT_NAME": name,
                "CONCEPT_CODE": code,
                "VOCABULARY_ID": vocab,
                "MAP_CATEGORY": cat,
                "MAP_EVIDENCE": evid,
                "MAP_LOGIC": logic,
                "ONTOLOGY_URI": uri.lower().replace(" ", ""),
                "ONTOLOGY_LABEL": label,
            }
        }
        expected = json.dumps(
            {"items": ref.omop_concept_set_exp(cid, dict_entry, False)}, indent=4
        )
        # write_atlas_json(per_file=True) files exactly this re-indented text
        assert json.dumps(json.loads(got[cid]), indent=4) == expected


def test_concept_set_container_columns_and_alias(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = concept_set_container(df, created_by="tester", created_at="2026-01-01")
    assert out.columns == [
        "concept_set_id", "concept_set_name", "intention",
        "assigned_informatician", "assigned_sme", "project_id", "status",
        "stage", "n3c_reviewer", "alias", "archived", "created_by", "created_at",
    ]
    rows = {r.concept_set_id: r for r in out.collect()}
    r1 = rows["[OMOP2OBO] 22274-neoplasm_of_uncertain_behavior"]
    assert r1.concept_set_name == r1.concept_set_id
    assert r1.alias == "obo hp_0000001-phenotype_one"
    assert r1.intention.startswith("Mixed\n")
    assert "22274" in r1.intention and "Automatic Exact - Concept" in r1.intention
    assert r1.created_by == "tester" and r1.status == "Under Construction"
    # filename stem applies the slug chain; alias applies ' | '->'|' on ids
    # and the '/'->'-' / ' | '->'|' / ' '->'_' chain on labels (ref :166-167)
    r2 = rows["[OMOP2OBO] 42-pulmonary_edema_-_chronic"]
    assert r2.alias == "obo mondo_0000002|obo hp_0000009-edema|fluid"


def test_concept_set_container_percent_and_arity_guard(spark):
    import pytest as _pt

    df = spark.createDataFrame(ROWS, SCHEMA)
    out = concept_set_container(
        df, intention_template="at 95% confidence {}: {} ({})"
    )
    row = out.collect()[0]
    assert "95% confidence" in row.intention  # literal %, not a format crash
    with _pt.raises(ValueError, match="placeholders"):
        concept_set_container(df, intention_template="only {} and {}")
