import pytest

from msi_preprocessing_pipeline_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session("msi-spark-tests", parallelism=4, shuffle_partitions=8)
    yield s
    s.stop()
