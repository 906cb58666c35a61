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


def test_cli_dedup_clusters(spark, graph_dirs, capsys):
    base, _, _ = graph_dirs
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta"),
            (2, "alpha beta gamma delta epsilon zeta eta"),
            (3, "totally different unrelated words entirely here now"),
        ],
        "doc_id long, text string",
    )
    dpath = str(base / "docs")
    docs.write.parquet(dpath)
    out = str(base / "wh_dedup")
    res = _run_inproc(
        capsys,
        ["dedup", "--docs", dpath, "--output", out, "--min-jaccard", "0.5"],
    )
    assert res["rows"] == 3 and res["kept"] == 2
    mapping = spark.read.parquet(f"{out}/dedup_clusters")
    got = {r["id"]: r["canonical_id"] for r in mapping.collect()}
    assert got == {1: 1, 2: 1, 3: 3}


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


def test_cli_subject_entropy(spark, graph_dirs, capsys, tmp_path):
    base, epath, _ = graph_dirs
    sverts = spark.createDataFrame(
        [(i, 1995 + i % 3, ["s1"] if i % 2 else ["s1", "s2"]) for i in range(1, 8)],
        "id long, year int, subjects array<string>",
    )
    svpath = str(tmp_path / "sverts")
    sverts.write.parquet(svpath)
    out = str(base / "wh_subj")
    res = _run_inproc(
        capsys,
        ["subject-entropy", "--edges", epath, "--vertices", svpath,
         "--years", "1997", "--min-in-degree", "1", "--output", out],
    )
    # every vertex is in subject s1; evens add s2 — both subjects survive
    # the min-in-degree=1 gate in the 1997 snapshot
    assert res["rows"] == 2
    got = spark.read.parquet(f"{out}/subject_entropy")
    assert {r["subject"] for r in got.collect()} == {"s1", "s2"}


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


def test_cli_tddc_grouped_lifecycle(spark, tmp_path, capsys):
    """`tddc` (the reference's oae -t tddc): TSV -> dense ids -> label
    routing -> grouped big/little, one result row per (year, discipline);
    values equal independent per-group distance_complexity invocations."""
    from pyspark.sql import functions as F

    from graph_computing_go_spark.functions.distance_complexity import (
        distance_complexity,
    )

    tsv = tmp_path / "nis.tsv"
    # two years; concepts c1..c4; c5 appears only via a malformed row
    rows = [
        (2008, "c1", "c2", 1.0), (2008, "c1", "c3", 2.0),
        (2008, "c2", "c3", 1.5), (2008, "c3", "c4", 3.0),
        (2019, "c1", "c2", 4.0), (2019, "c2", "c4", 2.0),
    ]
    lines = [f"{y}\t{a}\t{b}\t{d}" for y, a, b, d in rows]
    lines.insert(2, "garbage line without tabs")        # malformed -> dropped
    lines.append("2019\tc1\tc5\t0.0000000001")          # ~zero -> dropped
    tsv.write_text("\n".join(lines) + "\n")

    labels = tmp_path / "labels"
    spark.createDataFrame(
        [("c1", ["Math", "CS"]), ("c2", ["Math"]), ("c3", ["Math", "CS"]),
         ("c4", ["CS"])],
        "key string, labels array<string>",
    ).write.parquet(str(labels))
    categories = tmp_path / "cats"
    spark.createDataFrame(
        [("c1", ["alg"]), ("c2", ["alg", "geo"]), ("c3", ["geo"]),
         ("c4", ["sys"])],
        "key string, cats array<string>",
    ).write.parquet(str(categories))

    from graph_computing_go_spark.cli import main

    out = str(tmp_path / "wh")
    main(["tddc", "--tsv", str(tsv), "--labels", str(labels),
          "--categories", str(categories), "--output", out])
    res = json.loads(
        [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    )
    got = {
        (r["year"], r["discipline"]): (r["big"], r["little"])
        for r in spark.read.parquet(
            f"{out}/discipline_distance_complexity"
        ).collect()
    }
    assert res["groups"] == len(got)
    # routing: an edge joins every discipline shared by both endpoints
    # (c1-c2: Math; c1-c3: Math+CS; c2-c3: Math; c3-c4: CS; 2019 c1-c2:
    # Math; c2-c4: none -> dropped). Dense ids are 1-based over sorted keys.
    ids = {"c1": 1, "c2": 2, "c3": 3, "c4": 4}
    cats_map = {"c1": ["alg"], "c2": ["alg", "geo"], "c3": ["geo"], "c4": ["sys"]}
    expect_groups = {
        (2008, "Math"): [("c1", "c2", 1.0), ("c1", "c3", 2.0), ("c2", "c3", 1.5)],
        (2008, "CS"): [("c1", "c3", 2.0), ("c3", "c4", 3.0)],
        (2019, "Math"): [("c1", "c2", 4.0)],
    }
    assert set(got) == set(expect_groups)
    for key, ge in expect_groups.items():
        w = spark.createDataFrame(
            [(max(ids[a], ids[b]), min(ids[a], ids[b]), d) for a, b, d in ge],
            "a long, b long, distance double",
        )
        nodes = sorted({c for a, b, _ in ge for c in (a, b)})
        c = spark.createDataFrame(
            [(ids[n], cats_map[n]) for n in nodes],
            "id long, cats array<string>",
        )
        solo = distance_complexity(w, c).collect()[0]
        assert got[key][0] == pytest.approx(solo["big"], abs=1e-9), key
        assert got[key][1] == pytest.approx(solo["little"], abs=1e-9), key


def test_cli_prepare_corpus(spark, graph_dirs, capsys):
    base, _, _ = graph_dirs
    long_en = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the quiet green forest before the sun finally sets"
    )
    docs = spark.createDataFrame(
        [
            (1, long_en),
            (2, long_en + " tonight"),
            (3, "@@ ## 1 2"),
        ],
        "doc_id long, text string",
    )
    dpath = str(base / "prep_docs")
    docs.write.parquet(dpath)
    out = str(base / "wh_prep")
    res = _run_inproc(
        capsys,
        ["prepare", "--docs", dpath, "--output", out, "--min-jaccard", "0.5"],
    )
    assert res["rows"] == 3 and res["kept"] == 1
    assert res["duplicate"] == 1 and res["low_quality"] == 1
    ledger = spark.read.parquet(f"{out}/corpus_ledger")
    got = {r["id"]: r["status"] for r in ledger.collect()}
    assert got[3] == "low_quality" and {got[1], got[2]} == {"kept", "duplicate"}


def test_cli_chunk_and_pack(spark, graph_dirs, capsys):
    base, _, _ = graph_dirs
    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(20))), (2, "tiny doc")],
        "doc_id long, text string",
    )
    dpath = str(base / "chunk_docs")
    docs.write.parquet(dpath)
    out = str(base / "wh_chunk")
    res = _run_inproc(
        capsys,
        ["chunk", "--docs", dpath, "--output", out,
         "--max-tokens", "8", "--overlap", "2", "--pack-target", "16"],
    )
    # doc 1: 20 tokens, step 6 -> windows at 0,6,12 (3 chunks); doc 2: 1
    assert res["rows"] == 4 and res["packs"] >= 1
    chunks = spark.read.parquet(f"{out}/chunks")
    assert chunks.count() == 4
    packs = spark.read.parquet(f"{out}/packs")
    # every chunk packed exactly once, no pack over target
    assert packs.count() == 4
    fills = {
        r["pack_id"]: r["tot"]
        for r in packs.groupBy("pack_id").sum("n_tokens")
        .withColumnRenamed("sum(n_tokens)", "tot").collect()
    }
    assert all(v <= 16 for v in fills.values())


def test_cli_pack_ids_no_int_wrap(spark, graph_dirs, capsys):
    """ADVICE r3 (medium): int-typed doc ids >= 2048 wrapped in the
    synthesized pack doc_id (id * 2^20 in int arithmetic) — ids 2048 and
    6144 collided at -2^31.  The long-cast fix must keep them distinct."""
    base, _, _ = graph_dirs
    docs = spark.createDataFrame(
        [(2048, "one two"), (6144, "three four")],
        "doc_id int, text string",
    )
    dpath = str(base / "wrap_docs")
    docs.write.parquet(dpath)
    out = str(base / "wh_wrap")
    res = _run_inproc(
        capsys,
        ["chunk", "--docs", dpath, "--output", out,
         "--max-tokens", "8", "--overlap", "0", "--pack-target", "100"],
    )
    assert res["rows"] == 2
    packs = spark.read.parquet(f"{out}/packs")
    ids = sorted(r["id"] for r in packs.select("id").collect())
    assert ids == [2048 * (1 << 20), 6144 * (1 << 20)]


def test_cli_decontaminate(spark, graph_dirs, capsys):
    base, _, _ = graph_dirs
    corpus = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "totally clean words only here")],
        "doc_id long, text string",
    )
    evald = spark.createDataFrame([(9, "c d e f")], "doc_id long, text string")
    cpath, epath = str(base / "decon_corpus"), str(base / "decon_eval")
    corpus.write.parquet(cpath)
    evald.write.parquet(epath)
    out = str(base / "wh_decon")
    res = _run_inproc(
        capsys,
        ["decontaminate", "--docs", cpath, "--eval", epath,
         "--output", out, "--k", "3", "--spans"],
    )
    assert res["rows"] == 2 and res["contaminated"] == 1 and res["spans"] == 1
    spans = spark.read.parquet(f"{out}/contaminated_spans").collect()
    assert [(r["id"], r["start_token"], r["end_token"]) for r in spans] == [
        (1, 2, 6)
    ]


def test_cli_prepare_stream_incremental(spark, graph_dirs, capsys):
    """Two invocations over a growing source directory: the second admits
    only genuinely new content (checkpoint state persists across runs)."""
    import datetime

    base, _, _ = graph_dirs
    long_en = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the quiet green forest before the sun finally sets"
    )
    t0 = datetime.datetime(2024, 1, 1)
    ddl = "doc_id long, text string, ts timestamp"
    src = str(base / "stream_docs")
    out, ck = str(base / "stream_out"), str(base / "stream_ck")
    spark.createDataFrame([(1, long_en, t0), (2, "@@ ##", t0)], ddl).write.mode(
        "append"
    ).parquet(src)
    argv = ["prepare-stream", "--docs", src, "--output", out,
            "--checkpoint", ck, "--watermark", "10 minutes"]
    res1 = _run_inproc(capsys, argv)
    assert res1["rows_total"] == 1
    # second delivery: a duplicate of admitted content + one new doc
    spark.createDataFrame(
        [(3, long_en, t0 + datetime.timedelta(minutes=1)),
         (4, long_en + " with a few genuinely new trailing words to keep",
          t0 + datetime.timedelta(minutes=2))],
        ddl,
    ).write.mode("append").parquet(src)
    res2 = _run_inproc(capsys, argv)
    assert res2["rows_total"] == 2
    kept = {r["id"] for r in spark.read.parquet(out).collect()}
    assert kept == {1, 4}


def test_cli_stream_compact_two_cycles(spark, graph_dirs, capsys):
    """The 100 TB stream/batch split end-to-end (VERDICT r4 #6): the stream
    admits exact-first-seen content; `compact` sweeps near-dups from the
    accumulated kept set and MERGEs the mapping.  Two cycles: cycle 2's
    smaller-id near-variant must DEMOTE cycle 1's survivor (upsert, not
    insert), and re-running compact with no new stream data is a no-op."""
    import datetime

    base, _, _ = graph_dirs
    long_en = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the quiet green forest before the sun finally sets"
    )
    variant = long_en + " tonight"
    other = (
        "a completely different story about the old ship that sails over "
        "the winter sea toward the small harbor town every single year"
    )
    t0 = datetime.datetime(2024, 1, 1)
    ddl = "doc_id long, text string, ts timestamp"
    src = str(base / "cstream_docs")
    out, ck = str(base / "cstream_out"), str(base / "cstream_ck")
    wh = str(base / "cstream_wh")

    # cycle 1: base doc + near-variant (distinct content -> both admitted)
    spark.createDataFrame([(5, long_en, t0), (6, variant, t0)], ddl).write.mode(
        "append"
    ).parquet(src)
    stream_argv = ["prepare-stream", "--docs", src, "--output", out,
                   "--checkpoint", ck, "--watermark", "10 minutes"]
    assert _run_inproc(capsys, stream_argv)["rows_total"] == 2
    compact_argv = ["compact", "--docs", src, "--stream-out", out,
                    "--output", wh, "--min-jaccard", "0.5"]
    res1 = _run_inproc(capsys, compact_argv)
    assert res1["rows"] == 2 and res1["kept"] == 1
    tbl = spark.read.parquet(f"{wh}/corpus_compacted")
    assert {r["id"] for r in tbl.filter("is_canonical").collect()} == {5}

    # cycle 2: a SMALLER-id near-variant of the same cluster + a new doc
    spark.createDataFrame(
        [(2, long_en + " again tonight", t0 + datetime.timedelta(minutes=1)),
         (7, other, t0 + datetime.timedelta(minutes=2))],
        ddl,
    ).write.mode("append").parquet(src)
    assert _run_inproc(capsys, stream_argv)["rows_total"] == 4
    res2 = _run_inproc(capsys, compact_argv)
    assert res2["rows"] == 4 and res2["kept"] == 2
    tbl = spark.read.parquet(f"{wh}/corpus_compacted")
    rows = {r["id"]: (r["canonical_id"], r["is_canonical"]) for r in tbl.collect()}
    # doc 2 stole canonical status; cycle-1 survivor 5 was DEMOTED in place
    assert rows[2] == (2, True) and rows[7] == (7, True)
    assert rows[5] == (2, False) and rows[6] == (2, False)

    # idempotence: compact again with no new stream data -> identical table
    res3 = _run_inproc(capsys, compact_argv)
    assert (res3["rows"], res3["kept"]) == (4, 2)
    tbl2 = spark.read.parquet(f"{wh}/corpus_compacted")
    assert {r["id"]: (r["canonical_id"], r["is_canonical"])
            for r in tbl2.collect()} == rows
