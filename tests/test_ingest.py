"""Ingest-pipeline tests: generator determinism, sha256 invariant, link
extraction + resolution semantics, end-to-end code-graph statistics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_computing_go_spark.functions.entropy import structural_entropy
from graph_computing_go_spark.sources import (
    build_edge_table,
    extract_imports,
    resolve_imports,
    synthesize_repos,
    verify_content_sha256,
)


@pytest.fixture(scope="module")
def repos(spark):
    return synthesize_repos(spark, n_files=200, seed=42).cache()


def test_generator_deterministic(spark, repos):
    again = synthesize_repos(spark, n_files=200, seed=42)
    a = sorted(
        (r["repo"], r["path"], r["sha"])
        for r in repos.select("repo", "path", F.sha2("content", 256).alias("sha")).collect()
    )
    b = sorted(
        (r["repo"], r["path"], r["sha"])
        for r in again.select("repo", "path", F.sha2("content", 256).alias("sha")).collect()
    )
    assert a == b and len(a) == 200


def test_ingest_sha256_invariant(spark, repos, tmp_path):
    path = str(tmp_path / "repos_ingested")
    repos.write.parquet(path)
    ingested = spark.read.parquet(path)
    assert verify_content_sha256(repos, ingested) == 200
    # corruption is detected
    corrupted = ingested.withColumn(
        "content",
        F.when(F.col("path").startswith("a"), F.lit("tampered")).otherwise(
            F.col("content")
        ),
    )
    n_tampered = corrupted.filter(F.col("content") == "tampered").count()
    if n_tampered:
        with pytest.raises(AssertionError):
            verify_content_sha256(repos, corrupted)


def test_handwritten_resolution_cases(spark):
    rows = [
        ("o/r1", "a/b_1.py", "c", "python", "import o/r1:a.target_2"),
        ("o/r1", "a/target_2.py", "c", "python", "x"),
        # case-mangled ref -> resolves via normalized fallback
        ("o/r1", "a/b_3.py", "c", "python", "import o/r1:A.TARGET_2"),
        # dangling -> dropped
        ("o/r1", "a/b_4.py", "c", "python", "import o/r1:missing.mod"),
        # self-import -> dropped
        ("o/r1", "a/b_5.py", "c", "python", "import o/r1:a.b_5"),
        # go cross-repo
        ("o/r2", "x/y_6.go", "c", "go", 'import "o/r1/a/target_2"'),
        # js require
        ("o/r2", "x/y_7.js", "c", "js", "const m = require('o/r1:a/target_2')"),
    ]
    repos = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    refs = extract_imports(repos)
    assert refs.count() == 6  # 'x' body line has no import
    got = {
        (r["src_repo"], r["src_path"], r["dst_repo"], r["dst_path"])
        for r in resolve_imports(repos, refs).collect()
    }
    assert got == {
        ("o/r1", "a/b_1.py", "o/r1", "a/target_2.py"),
        ("o/r1", "a/b_3.py", "o/r1", "a/target_2.py"),
        ("o/r2", "x/y_6.go", "o/r1", "a/target_2.py"),
        ("o/r2", "x/y_7.js", "o/r1", "a/target_2.py"),
    }


def test_edge_table_end_to_end(spark, repos):
    edges = build_edge_table(repos).cache()
    n = edges.count()
    assert n > 50  # the corpus plants ~3 imports/file, most resolvable
    # vertex ids deterministic: rebuild gives identical edge set
    again = build_edge_table(synthesize_repos(spark, n_files=200, seed=42))
    assert sorted(map(tuple, edges.select("src", "dst").collect())) == sorted(
        map(tuple, again.select("src", "dst").collect())
    )
    # no self-loops survived
    assert edges.filter(F.col("src") == F.col("dst")).count() == 0
    # the flagship statistics run on the code graph
    se = structural_entropy(edges.select("src", "dst")).collect()[0]
    assert se["h_in"] is not None and se["h_in"] > 0


def test_stem_collision_single_winner(spark):
    """Two files sharing a stem (util.py / util.js): one import ref must
    resolve to exactly ONE edge (smallest path wins), like the reference's
    map insertion keeps one winner."""
    rows = [
        ("o/r1", "lib/util.py", "c", "python", "x"),
        ("o/r1", "lib/util.js", "c", "js", "x"),
        ("o/r1", "a/b.py", "c", "python", "import o/r1:lib.util"),
    ]
    repos = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    got = resolve_imports(repos, extract_imports(repos)).collect()
    assert len(got) == 1
    assert got[0]["dst_path"] == "lib/util.js"  # lexicographically smallest


def test_extraction_edge_cases(spark):
    """Null content, unknown language, and empty repos must not crash the
    vectorized extraction path."""
    rows = [
        ("o/r1", "a.py", "c", "python", None),
        ("o/r1", "b.rs", "c", "rust", "use foo::bar;"),  # no extractor
        ("o/r1", "c.py", "c", "python", ""),
    ]
    repos = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    assert extract_imports(repos).count() == 0
    empty = repos.filter("1=0")
    assert extract_imports(empty).count() == 0
    assert build_edge_table(repos).count() == 0


def test_roundtrip_dir_pruning_liveness(tmp_path):
    """Reclaim rules for the code_repos_roundtrip scratch dirs: dead or
    PID-recycled owners are reclaimed, a verifiably-alive owner is kept even
    past the 24h mtime fallback (no reclaim race against a live long-running
    driver), and unverifiable dirs fall back to mtime."""
    import os
    import time

    from graph_computing_go_spark.api import (
        _proc_start,
        _prune_roundtrip_dirs,
        _write_owner_marker,
    )

    td = str(tmp_path)
    old = time.time() - 48 * 3600

    def mk(name, marker=None, stale=False):
        d = os.path.join(td, f"code_repos_roundtrip_{name}")
        os.mkdir(d)
        if marker is not None:
            with open(os.path.join(d, ".owner_pid"), "w") as fh:
                fh.write(marker)
        if stale:
            os.utime(d, (old, old))
        return d

    me, start = os.getpid(), _proc_start(os.getpid())
    assert start is not None  # Linux CI: /proc is available
    # find a dead pid: fork a child that exits immediately
    pid = os.fork()
    if pid == 0:
        os._exit(0)
    os.waitpid(pid, 0)

    live_stale = mk("live", f"{me} {start}", stale=True)
    recycled = mk("recycled", f"{me} 1")  # starttime mismatch = recycled
    dead = mk("dead", f"{pid} 12345")
    markerless_stale = mk("mstale", stale=True)
    markerless_fresh = mk("mfresh")
    pid_only_stale = mk("pidonly", f"{me}", stale=True)
    keep = mk("keep")

    _prune_roundtrip_dirs(td, keep=keep)

    assert os.path.isdir(live_stale)  # alive owner: never reclaimed
    assert not os.path.isdir(recycled)
    assert not os.path.isdir(dead)
    assert not os.path.isdir(markerless_stale)
    assert os.path.isdir(markerless_fresh)
    assert not os.path.isdir(pid_only_stale)  # unverifiable + stale
    assert os.path.isdir(keep)

    # marker round-trip: what _write_owner_marker writes reads back as alive
    _write_owner_marker(keep)
    from graph_computing_go_spark.api import _owner_alive

    assert _owner_alive(keep) is True
