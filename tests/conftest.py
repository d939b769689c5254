import pytest


@pytest.fixture(scope="session")
def spark():
    from tsdisagg_spark.spark.session import get_spark

    session = get_spark(
        app_name="tsdisagg-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "2g"},
    )
    yield session
    session.stop()
