import pytest

from anomalyzer_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("anomalyzer-tests", shuffle_partitions=8)
    yield s


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
