from __future__ import annotations

import shutil
import tempfile

import pytest

from elastic_stream_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="ess-test-")
    yield d
    shutil.rmtree(d, ignore_errors=True)
