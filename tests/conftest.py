import sys

import pytest

sys.path.insert(0, "/root/repo")

from ulh_etl_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    return get_spark("ulh-etl-tests", cpus="8")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
