"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship statistics pipeline on sf0.001;
``queries()``/``oracle_sql()`` expose every SQL-expressible operator from
SURVEY.md §2 (registry lives in graph_computing_go_spark/api.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: structural + degree-distribution entropy of the derived link
    graph at sf0.001 (the reference's `wikiEntropy -t total` in miniature)."""
    from pyspark.sql import functions as F

    from graph_computing_go_spark.api import (
        q_degree_distribution_entropy,
        q_structural_entropy,
    )

    sf_dir = "/root/testdata/sf0.001"
    dd = q_degree_distribution_entropy(spark, sf_dir)
    dd = dd.select([F.col(c).alias(f"dd_{c}") for c in dd.columns])
    return q_structural_entropy(spark, sf_dir).crossJoin(dd)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from graph_computing_go_spark.api import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from graph_computing_go_spark.api import ORACLES

    return dict(ORACLES)
