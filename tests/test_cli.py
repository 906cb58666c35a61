"""CLI surface tests: subcommands run end-to-end (in-process), and one
spark-submit --py-files smoke test for the cluster launch path."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def graph_dirs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("cli")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3), (6, 7)],
        "src long, dst long",
    )
    epath = str(base / "edges")
    edges.write.parquet(epath)
    verts = spark.createDataFrame(
        [(i, 1995 + i % 3) for i in range(1, 8)], "id long, year int"
    )
    vpath = str(base / "verts")
    verts.write.parquet(vpath)
    return base, epath, vpath


def _run_inproc(capsys, argv):
    from graph_computing_go_spark.cli import main

    main(argv)
    out = [
        line
        for line in capsys.readouterr().out.strip().splitlines()
        if line.startswith("{")
    ]
    return json.loads(out[-1])


def test_cli_pagerank_and_resume(spark, graph_dirs, capsys):
    base, epath, _ = graph_dirs
    out = str(base / "wh1")
    ck = str(base / "ck")
    res = _run_inproc(
        capsys,
        ["pagerank", "--edges", epath, "--output", out,
         "--checkpoint-dir", ck, "--max-iter", "5", "--tol", "0"],
    )
    assert res["iterations"] == 5 and res["rows"] == 7
    res2 = _run_inproc(
        capsys,
        ["pagerank", "--edges", epath, "--output", out,
         "--checkpoint-dir", ck, "--max-iter", "8", "--tol", "0", "--resume"],
    )
    assert res2["iterations"] == 8


def test_cli_degree_stats_and_triangles(spark, graph_dirs, capsys):
    base, epath, _ = graph_dirs
    out = str(base / "wh2")
    _run_inproc(capsys, ["degree-stats", "--edges", epath, "--output", out])
    assert spark.read.parquet(f"{out}/degree_histogram").count() > 0
    res = _run_inproc(capsys, ["triangles", "--edges", epath, "--output", out])
    assert res["n_triangles"] == 2  # (1,2,3) and (3,4,5)


def test_cli_yearly_entropy(spark, graph_dirs, capsys):
    base, epath, vpath = graph_dirs
    out = str(base / "wh3")
    res = _run_inproc(
        capsys,
        ["yearly-entropy", "--edges", epath, "--vertices", vpath,
         "--years", "1996", "1997", "--percents", "50", "100",
         "--output", out],
    )
    # 1996 has no min-in-degree>=2 candidates -> contributes no rows;
    # 1997's single candidate yields 2 ladder points x 2 universes
    assert res["rows"] == 4


def test_spark_submit_py_files(graph_dirs, tmp_path):
    """The north-rule launch path: spark-submit --py-files <zip> cli.py."""
    base, epath, _ = graph_dirs
    spark_submit = os.path.join(
        os.path.dirname(sys.modules["pyspark"].__file__)
        if "pyspark" in sys.modules
        else "",
        "bin",
        "spark-submit",
    )
    if not os.path.exists(spark_submit):
        spark_submit = "/opt/spark/bin/spark-submit"
    zpath = str(tmp_path / "gcgs.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "graph_computing_go_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    out = str(tmp_path / "wh")
    env = dict(os.environ, SPARK_GRAFT_CPUS="2")
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[2]",
            "--py-files", zpath,
            os.path.join(REPO, "graph_computing_go_spark", "cli.py"),
            "in-degree", "--edges", epath, "--output", out,
        ],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert json.loads(lines[-1])["rows"] == 6


def test_cli_in_degree_merge_idempotent(spark, graph_dirs, capsys):
    """S10 via the CLI: --merge re-runs replace by vertex id (no dupes);
    plain append duplicates (the r1-documented limitation --merge fixes)."""
    base, epath, _ = graph_dirs
    out = str(base / "wh_merge")
    for _ in range(2):
        res = _run_inproc(
            capsys,
            ["in-degree", "--edges", epath, "--output", out, "--merge"],
        )
    assert res["rows"] == 6  # distinct dsts: 1,2,3,4,5,7
    merged = spark.read.parquet(os.path.join(out, "in_degree"))
    rows = sorted(tuple(r) for r in merged.collect())
    assert len(rows) == len({r[0] for r in rows})  # one row per vertex
