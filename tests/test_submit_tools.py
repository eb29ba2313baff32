"""Launch-shape tests: --py-files packaging + cluster entrypoint wiring.

The north rule launches the job via ``spark-submit --py-files`` (reference
runs as a driver script too: /root/reference/main.py:1-40). Pinned here:
the zip is importable-shaped, the entrypoint's argument contract stays
stable, and the REAL spark-submit subprocess runs end-to-end and resumes
from its manifest.
"""

from __future__ import annotations

import zipfile

from tools.package_pyfiles import build
from tools.submit_job import parse_args


def test_pyfiles_zip_contains_package_only(tmp_path):
    out = build(str(tmp_path / "pkg.zip"))
    with zipfile.ZipFile(out) as zf:
        names = zf.namelist()
    assert "omop2obo_spark/__init__.py" in names
    assert all(n.startswith("omop2obo_spark/") for n in names)
    assert all(n.endswith(".py") for n in names)
    # executors unpack onto sys.path: no tests, no bytecode, no fixtures data
    assert not any("__pycache__" in n or n.startswith("tests/") for n in names)
    # every package subdir made it in
    pkgs = {n.split("/")[1] for n in names if n.count("/") == 2}
    assert {"operators", "sources", "functions", "plans", "streaming"} <= pkgs


def test_submit_args_defaults_and_resume_contract():
    a = parse_args(["--transcripts", "db.tbl", "--output", "/tmp/o"])
    assert a.lexicon == "fixture" and a.buckets == 256
    assert a.batch_partitions is None and not a.with_similarity
    b = parse_args([
        "--transcripts", "db.tbl", "--output", "/tmp/o",
        "--buckets", "8", "--batch-partitions", "2",
        "--with-similarity", "--run-id", "r1",
    ])
    assert (b.buckets, b.batch_partitions, b.with_similarity, b.run_id) == (8, 2, True, "r1")


def test_spark_submit_end_to_end_then_resume(tmp_path):
    """The REAL launch shape, not a simulation: package --py-files, run
    ``spark-submit`` as a subprocess against sf0.001, assert triples
    land with a per-partition manifest — then rerun the identical
    command and assert every bucket is skipped (checkpoint-resume)."""
    import json
    import shutil
    import subprocess
    import pytest

    if shutil.which("spark-submit") is None:
        pytest.skip("spark-submit not on PATH")

    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = build(str(tmp_path / "pkg.zip"))
    out_dir = str(tmp_path / "graph")
    cmd = [
        "spark-submit", "--master", "local[4]", "--py-files", zip_path,
        os.path.join(repo, "tools", "submit_job.py"),
        "--transcripts", "/root/testdata/sf0.001",
        "--output", out_dir, "--lexicon", "fixture", "--buckets", "2",
    ]
    env = {**os.environ, "PYTHONPATH": repo}

    def run():
        p = subprocess.run(cmd, capture_output=True, text=True, timeout=560, env=env)
        assert p.returncode == 0, p.stderr[-2000:]
        return json.loads(p.stdout.strip().splitlines()[-1])

    first = run()
    assert first["processed"] == [0, 1] and first["rows"] > 0
    assert os.path.exists(os.path.join(out_dir, "manifest.jsonl"))

    second = run()
    assert second["processed"] == [] and second["skipped"] == [0, 1]
