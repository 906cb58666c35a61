"""Deterministic sampling for corpus mixing (task mandate: training-data
pipeline operations).

Mixing a pre-training corpus means sampling each source/domain at its own
rate ("30% of web, 100% of books, 5% of logs").  ``sample()``-style random
sampling is partition-order-dependent and unrepeatable across runs; here
admission is a pure function of the ROW ID — a portable 31-base polynomial
hash mapped to [0, 1) and compared to the stratum's rate — so the same
corpus always yields the same sample (resumable jobs, reproducible
ablations), with zero shuffle: the operator is one row-local filter.

The hash is the first 32 bits of md5 over the id's string form — uniform
(a polynomial rolling hash is NOT: short numeric ids all land near zero)
and engine-portable (md5 exists everywhere; not xxhash64, which DuckDB
cannot reproduce), so a SQL oracle or any other engine can re-derive the
exact admitted set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _unit_hash(col: Column, salt: str) -> Column:
    """Deterministic uniform value in [0, 1): first 8 md5 hex chars of
    salt||id as an integer over 2^32."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    return h / F.lit(float(1 << 32))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Rows admitted at their stratum's rate, deterministically by id.

    ``fractions`` maps stratum value → admission rate in [0, 1]; strata
    not listed get ``default_fraction``.  Change ``salt`` to draw an
    independent sample (e.g. a held-out split: the same salt always
    carves the same rows, so train/heldout never overlap when drawn with
    disjoint rate windows or different salts are tracked explicitly).

    One row-local filter — no shuffle, no RNG state, reproducible under
    any partitioning and any engine that can evaluate the polynomial hash.
    """
    for k_, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for {k_!r} must be in [0, 1]")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError("default_fraction must be in [0, 1]")
    rate = F.lit(default_fraction)
    for stratum, frac in sorted(fractions.items()):
        rate = F.when(
            F.col(stratum_col) == stratum, F.lit(float(frac))
        ).otherwise(rate)
    return df.filter(_unit_hash(F.col(id_col), salt) < rate)
