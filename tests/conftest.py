import pytest

from omop2obo_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="omop2obo-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


def py_levenshtein(a: str, b: str) -> int:
    """Shared pure-Python Levenshtein reference for the edit-join
    brute-force oracles (test_corpus_ops, test_properties)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]
