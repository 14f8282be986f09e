import sys

import pytest

sys.path.insert(0, ".")


@pytest.fixture(scope="session")
def spark():
    from geospark.session import get_spark

    s = get_spark("pytest", master="local[8]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def geo(spark):
    """Built engine state over the committed fixtures (cached once)."""
    from geospark import entry_queries as eq

    return eq.geo_state(spark)
