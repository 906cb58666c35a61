"""Executor-per-process scaling evidence (BASELINE.json north rule).

Runs the identical PageRank(5 supersteps) + connected-components job from
``bench.py``'s scale section on ``local-cluster[N, cores, mem]`` — Spark's
multi-executor test mode where every executor is its OWN JVM process with
its own heap, GC, and Python workers.  This is the closest this sandbox can
get to the north rule's "N vs 4N executors on a multi-executor cluster":
unlike ``local[N]`` threads, per-executor resources (heap, GC) stay
constant as N grows, exactly as on a real cluster.  The remaining shared
terms are the host's memory bus, page cache, and turbo budget
(BENCH/BASELINE.md §3 quantifies those ceilings).

Usage (one JSON line per run):

    SPARK_GRAFT_EXECUTORS=2  python tools/clusterbench.py   # N
    SPARK_GRAFT_EXECUTORS=8  python tools/clusterbench.py   # 4N

Env: SPARK_GRAFT_EXECUTORS (default 2), SPARK_GRAFT_EXEC_CORES (default 2),
SPARK_GRAFT_EXEC_MEM_MB (default 6144), SPARK_GRAFT_EDGES (default 60M).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_computing_go_spark import get_spark  # noqa: E402


def main() -> None:
    n_exec = int(os.environ.get("SPARK_GRAFT_EXECUTORS", "2"))
    cores = int(os.environ.get("SPARK_GRAFT_EXEC_CORES", "2"))
    mem_mb = int(os.environ.get("SPARK_GRAFT_EXEC_MEM_MB", "6144"))
    n_edges = int(os.environ.get("SPARK_GRAFT_EDGES", str(60_000_000)))
    total_cores = n_exec * cores

    spark = get_spark(
        app_name=f"clusterbench-{n_exec}x{cores}",
        master=f"local-cluster[{n_exec},{cores},{mem_mb}]",
        shuffle_partitions=total_cores * 2,
        extra_conf={
            "spark.ui.enabled": "false",
            # worker JVM gets mem_mb; leave the executor heap 1 GiB under it
            "spark.executor.memory": f"{mem_mb - 1024}m",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
            "spark.driver.extraJavaOptions": "-Xlog:disable",
            "spark.executor.extraJavaOptions": "-Xlog:disable",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bench import synth_graph
    from graph_computing_go_spark.plans import connected_components, pagerank
    from graph_computing_go_spark.plans.superstep import SuperstepRunner

    big = synth_graph(spark, n_edges=n_edges, n_vertices=n_edges // 20).cache()
    big_edges = big.count()

    r_pr = SuperstepRunner(spark)
    t0 = time.time()
    _, pr_iters = pagerank(big, tol=0.0, max_iter=5, dangling="drop", runner=r_pr)
    pr_s = time.time() - t0

    r_cc = SuperstepRunner(spark)
    t0 = time.time()
    _, cc_iters = connected_components(big, max_iter=30, runner=r_cc)
    cc_s = time.time() - t0

    steady_ms = [m["wall_ms"] for m in r_pr.metrics[1:]] + [
        m["wall_ms"] for m in r_cc.metrics[1:]
    ]
    eps = round(big_edges * (pr_iters + cc_iters) / (pr_s + cc_s), 1)
    steady_eps = (
        round(big_edges * len(steady_ms) / (sum(steady_ms) / 1000.0), 1)
        if steady_ms and sum(steady_ms) > 0
        else None
    )
    print(
        json.dumps(
            {
                "metric": "edges_per_sec_iterative",
                "value": eps,
                "unit": "edges/sec",
                "mode": "local-cluster",
                "executors": n_exec,
                "cores_per_executor": cores,
                "executor_mem_mb": mem_mb,
                "scale_n_edges": big_edges,
                "pagerank_s": round(pr_s, 3),
                "cc_s": round(cc_s, 3),
                "pr_iters": pr_iters,
                "cc_iters": cc_iters,
                "steady_superstep_eps": steady_eps,
                "eps_per_executor": round(eps / n_exec, 1),
                "pr_superstep_ms": [m["wall_ms"] for m in r_pr.metrics],
                "cc_superstep_ms": [m["wall_ms"] for m in r_cc.metrics],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
