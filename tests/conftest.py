import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from milvus_cdc_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master=os.environ.get("TEST_MASTER", "local[8]"))
    yield s


@pytest.fixture()
def tmp_base(tmp_path):
    return str(tmp_path)
