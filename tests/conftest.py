import pytest

from kgx_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # small local session: 4 threads / 8 shuffle partitions keeps test wall
    # time low; production sizing lives in kgx_spark.session defaults.
    s = get_spark("kgx_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s
