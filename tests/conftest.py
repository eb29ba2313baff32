import pytest

from omop2obo_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="omop2obo-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()
