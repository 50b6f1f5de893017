import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "src")
if SRC not in sys.path:
    sys.path.insert(0, SRC)
# python workers spawned by Spark inherit this
os.environ["PYTHONPATH"] = SRC + os.pathsep + os.environ.get("PYTHONPATH", "")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    from glcmstream.session import get_spark
    s = get_spark(app="glcmstream-tests")
    yield s


@pytest.fixture(scope="session")
def sf_smoke():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_correctness():
    return "/root/testdata/sf0.01"
