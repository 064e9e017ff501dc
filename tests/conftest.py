import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from gazetteer_entity_parser_spark.session import build_session

    session = build_session(
        "gazetteer-kg-tests",
        parallelism=4,
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield session
    session.stop()


SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf_smoke():
    return SF_SMOKE
