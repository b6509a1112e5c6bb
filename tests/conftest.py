import os

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


#: larger fixtures for recall-style tests whose thresholds are tuned to the
#: sf0.01 corpus statistics (not a scale the unit suite should default to)
SF01_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf01_dir():
    if not os.path.isfile(os.path.join(SF01_DIR, "embeddings.parquet")):
        pytest.skip("sf0.01 fixtures absent at /root/testdata/sf0.01")
    return SF01_DIR
