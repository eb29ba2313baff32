"""Driver-contract invariants of ``__spark_entry__``.

These are source-level checks (no Spark session): the registry dict
would silently swallow a duplicate key — exactly how a shadowed
duplicate query shipped mid-round-3 before being caught — so the
duplicate check parses the literal source instead of the dict.
"""

from __future__ import annotations

import ast
import re
from pathlib import Path

ENTRY = Path(__file__).resolve().parent.parent / "__spark_entry__.py"


def _registry_keys_from_source() -> list[str]:
    src = ENTRY.read_text()
    m = re.search(r"def queries\(\).*?return \{(.*?)\n    \}\n", src, re.S)
    assert m, "queries() return dict not found"
    return re.findall(r'"(q_\w+)":', m.group(1))


def test_registry_has_no_duplicate_keys():
    keys = _registry_keys_from_source()
    dupes = {k for k in keys if keys.count(k) > 1}
    assert not dupes, f"duplicate registry keys (dict would shadow): {dupes}"


def test_every_query_has_oracle_or_documented_rows_only():
    import __spark_entry__ as entry

    qs = set(entry.queries().keys())
    oracles = set(entry.oracle_sql().keys())
    rows_only = qs - oracles
    # the declared exceptions: genuinely non-SQL-expressible queries
    assert rows_only <= {"q_bpe_train"}, (
        f"queries without oracle nor declared rows-only status: {rows_only}"
    )
    stale = oracles - qs
    assert not stale, f"oracles for unregistered queries: {stale}"


def test_entry_module_parses_and_exports_driver_surface():
    tree = ast.parse(ENTRY.read_text())
    top = {n.name for n in tree.body if isinstance(n, (ast.FunctionDef,))}
    assert {"entry", "queries", "oracle_sql"} <= top


def test_r5_driver_window_promotes_only_ungated_queries():
    """Round-5 rotation invariant: the driver hashes the FIRST 50 registry
    entries; besides the two cache-attribution flagships, every window
    slot must go to a query with NO driver CORRECTNESS row from rounds
    1-4 (GATE_MANIFEST.md is generated from the same inputs)."""
    import json

    keys = _registry_keys_from_source()
    assert keys[:2] == ["q_kg_triples", "q_kg_triples_sim"]
    gated = set()
    root = ENTRY.parent
    for r in (1, 2, 3, 4):
        f = root / f"CORRECTNESS_r0{r}.json"
        if f.exists():
            gated |= set(json.loads(f.read_text()).keys())
    window_tail = keys[2:50]
    regated = [k for k in window_tail if k in gated]
    assert not regated, f"window slots wasted on already-gated queries: {regated}"


def test_gate_manifest_lists_every_registry_entry():
    manifest = (ENTRY.parent / "GATE_MANIFEST.md").read_text()
    keys = _registry_keys_from_source()
    missing = [k for k in keys if f"`{k}`" not in manifest]
    assert not missing, f"GATE_MANIFEST.md missing entries: {missing}"
