import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


_SPARK = None  # populated by the session fixture; used by hypothesis tests
# (hypothesis @given can't take pytest fixtures directly)


@pytest.fixture(scope="session")
def spark():
    from pulsar_3_2_codedump_spark.session import get_spark
    from pulsar_3_2_codedump_spark.sources import register

    s = get_spark("tests", cpus=8)
    s.conf.set("spark.sql.shuffle.partitions", "8")
    register(s)
    global _SPARK
    _SPARK = s
    yield s


@pytest.fixture()
def tmp_root(tmp_path):
    return str(tmp_path)


@pytest.fixture(autouse=True)
def _release_shared_frames_between_tests():
    # shared DISK_ONLY frames have a per-query lifecycle (ADVICE r13); the
    # suite is one long session, so release after every test to keep blocks
    # bounded and plans cache-splice-free.
    yield
    from pulsar_3_2_codedump_spark.catalog import release_shared_frames

    release_shared_frames()
