import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from league_of_legends_data_pipeline_spark.session import get_spark

    s = get_spark("tests", shuffle_partitions=8, extra_conf={
        "spark.driver.memory": "8g",
        "spark.sql.legacy.parquet.nanosAsLong": "true",
    })
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def fixtures_dir(tmp_path_factory):
    """Bronze domain fixtures (match/timeline/ranks JSON), seed=42."""
    from league_of_legends_data_pipeline_spark.sources.fixtures import write_fixtures

    out = str(tmp_path_factory.mktemp("bronze"))
    write_fixtures(out)
    return out
