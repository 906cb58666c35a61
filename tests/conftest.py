from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_computing_go_spark import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="gcgs-tests",
        master="local[4]",
        shuffle_partitions=8,
        # 6g: the wide tddc lifecycle plan OOMs at 4g once ~90 tests of
        # codegen classes and checkpoint blocks have accreted in the session
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "6g"},
    )
    yield s
    s.stop()


def edge_df(spark, edges):
    return spark.createDataFrame(
        [(int(s), int(t)) for s, t in edges], "src long, dst long"
    )


def vert_df(spark, cats):
    return spark.createDataFrame(
        [(int(i), list(c)) for i, c in cats.items()],
        "id long, cats array<string>",
    )


def wedge_df(spark, wedges):
    return spark.createDataFrame(
        [(int(a), int(b), float(w)) for a, b, w in wedges],
        "a long, b long, distance double",
    )
