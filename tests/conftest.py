import pytest


@pytest.fixture(scope="session")
def spark():
    from simhash_spark.session import get_spark

    s = get_spark(app="simhash-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def clips_small():
    from simhash_spark.sources.synth import make_clips

    return make_clips(600, seed=42)
