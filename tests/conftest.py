import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from face_hunter_spark.session import build_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="fhs-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s
    s.stop()


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


# CI portability: the driver parquet fixtures and the read-only
# reference checkout exist on the build host but not on generic CI
# runners; fixture-dependent modules skip cleanly there.
requires_testdata = pytest.mark.skipif(
    not os.path.isdir(SF_DIR),
    reason=f"driver testdata not present at {SF_DIR}",
)
requires_reference = pytest.mark.skipif(
    not os.path.exists("/root/reference/models/example_graph"),
    reason="reference checkout not present",
)
