"""Local mimic of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a given SF dir, runs the
matching ``oracle_sql()`` in DuckDB with the same parquet tables registered
as views, and compares row count, column names, and an order-insensitive
value snapshot (floats rounded to 6 decimals before hashing, since both
sides round their float outputs anyway).

Usage: python tools/compare.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(rows, cols):
    """Mimics the DRIVER's canonicalizer: a pandas sort_values over all
    columns (which, like the driver's, raises TypeError on unhashable cells
    such as lists — round 1's only red row was exactly that, and the old
    repr-based canon here masked it), then per-cell repr with floats
    rounded to 6."""
    import pandas as pd

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    df = pd.DataFrame(
        [[r[i] for i in order] for r in rows],
        columns=[cols[i] for i in order],
    )
    if len(df):
        # the driver sorts rows via pandas — list/dict cells die HERE, as
        # they do in the real harness.  (The resulting ORDER is irrelevant —
        # the return value is re-sorted by repr below; the sort exists as
        # the unhashable-cell tripwire.)
        df = df.sort_values(by=list(df.columns))
    out = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0:
                    v = 0.0
            vals.append(repr(v))
        out.append("|".join(vals))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from graph_computing_go_spark import get_spark

    spark = get_spark(app_name="compare", extra_conf={"spark.ui.enabled": "false"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows={len(srows)} (no oracle — rows-only check) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {e}")
            failures.append(name)
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(c.lower() for c in ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if not problems:
            try:
                cs, co = canon(srows, scols), canon(orows, [c.lower() for c in ocols])
            except Exception as e:  # noqa: BLE001 — e.g. unhashable cells
                cs = co = None
                problems.append(f"canonicalization error (driver would die): {e}")
            if cs is not None and cs != co:
                diffs = [(a, b) for a, b in zip(cs, co) if a != b][:3]
                problems.append(f"values differ, e.g. {diffs}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            print(f"PASS {name}: rows={len(srows)} [{time.time()-t0:.1f}s]")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
