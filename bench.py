"""Benchmark runner — prints ONE JSON line with per-query wall times.

Headline queries: the statistics suite (entropy, NGD, distance complexity,
percent ladder) plus the iterative algorithms (PageRank-to-convergence,
connected components, triangle count) on the derived link graph at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1), on
``local[$SPARK_GRAFT_CPUS]``.

The primary metric follows BASELINE.json: edges/sec for
PageRank-to-convergence + connected components.  Run at two parallelism
levels for the scaling-efficiency evidence:

    SPARK_GRAFT_CPUS=8 python bench.py
    SPARK_GRAFT_CPUS=32 python bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from graph_computing_go_spark import get_spark  # noqa: E402
from graph_computing_go_spark.api import QUERIES  # noqa: E402
from graph_computing_go_spark.operators.graph import derive_edges  # noqa: E402
from graph_computing_go_spark.plans import (  # noqa: E402
    connected_components,
    pagerank,
    triangle_count,
)

BENCH_QUERIES = [
    "in_degree_count",
    "degree_distribution_entropy",
    "structural_entropy",
    "multilayer_entropy",
    "distance_complexity",
    "google_distance",
    "top_percent_slice",
    "pricing_summary",
    "events_hourly",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark(
        app_name=f"bench-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 8),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        t0 = time.time()
        fn(spark, sf_dir).collect()
        times[name] = round(time.time() - t0, 3)

    edges = derive_edges(spark, sf_dir).cache()
    n_edges = edges.count()

    t0 = time.time()
    ranks, pr_iters = pagerank(edges, tol=1e-6, max_iter=100)
    ranks.collect()
    pr_s = time.time() - t0
    times["pagerank"] = round(pr_s, 3)

    t0 = time.time()
    comps, cc_iters = connected_components(edges)
    comps.collect()
    cc_s = time.time() - t0
    times["connected_components"] = round(cc_s, 3)

    t0 = time.time()
    triangle_count(edges).collect()
    times["triangle_count"] = round(time.time() - t0, 3)

    total = round(sum(times.values()), 3)
    # edges/sec across all supersteps of PR + CC (the BASELINE.json metric);
    # one "executor" here is the whole local[N] JVM.
    iter_edges = n_edges * (pr_iters + cc_iters)
    eps = round(iter_edges / (pr_s + cc_s), 1)
    print(
        json.dumps(
            {
                "metric": "total_bench_seconds",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "cpus": cpus,
                "n_edges": n_edges,
                "pagerank_iters": pr_iters,
                "cc_iters": cc_iters,
                "edges_per_sec_iterative": eps,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
