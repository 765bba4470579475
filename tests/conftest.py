from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

# The gate breadcrumb trail (.gate_trace.jsonl) should record EXTERNAL
# driver runs, not our own suite — must be set before __spark_entry__
# is first imported anywhere in the session.
os.environ.setdefault("SPARK_GRAFT_TRACE", "0")

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from spark_dns_spark.session import get_session

    s = get_session("tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMALL
