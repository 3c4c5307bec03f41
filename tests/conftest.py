import pytest

from data_engineering_bootcamp_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # session-scoped local SparkSession, mirroring the reference's test
    # fixture (M3/src/tests/conftest.py:4-9)
    s = get_spark(app_name="engine-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf_small():
    return "/root/testdata/sf0.001"
