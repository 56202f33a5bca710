import pytest

from trading_etl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def spark_prop(spark):
    """Alias for hypothesis-driven tests (function-scoped @given can't take a
    session fixture named the same as the module-level one it shadows)."""
    return spark
