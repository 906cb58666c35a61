"""Deterministic sampling for corpus mixing (task mandate: training-data
pipeline operations).

Mixing a pre-training corpus means sampling each source/domain at its own
rate ("30% of web, 100% of books, 5% of logs").  ``sample()``-style random
sampling is partition-order-dependent and unrepeatable across runs; here
admission is a pure function of the ROW ID — an md5-based unit hash mapped
to [0, 1) and compared to the stratum's rate — so the same corpus always
yields the same sample (resumable jobs, reproducible ablations), with zero
shuffle: the operator is one row-local filter.

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
    not listed get ``default_fraction``.  Under ONE salt, samples are
    nested: a rate-0.05 sample is a subset of the rate-0.30 sample, so
    disjoint train/heldout splits come from disjoint hash windows on the
    same salt (e.g. train = hash < 0.30, heldout = 0.30 <= hash < 0.35
    via :func:`stratified_split`).  A *different* salt draws an
    independent — possibly overlapping — sample; use that for unrelated
    ablations, never for splits that must not leak.

    One row-local filter — no shuffle, no RNG state, reproducible under
    any partitioning and any engine that can evaluate md5.
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


def stratified_split(
    df: DataFrame,
    fractions: dict[str, tuple[float, float]],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Rows whose unit hash falls in the stratum's half-open window.

    ``fractions`` maps stratum value → ``(lo, hi)`` with
    ``0 <= lo <= hi <= 1``; a row is admitted iff
    ``lo <= unit_hash(id) < hi``.  Strata not listed are dropped.

    This is the disjoint-split primitive: under the SAME salt,
    ``stratified_split(df, {"web": (0.0, 0.30)})`` and
    ``stratified_split(df, {"web": (0.30, 0.35)})`` partition the ids —
    no row can appear in both, on any engine, in any run.  Same
    execution shape as :func:`stratified_sample` (one row-local filter,
    zero shuffle).
    """
    for k_, (lo, hi) in fractions.items():
        if not 0.0 <= lo <= hi <= 1.0:
            raise ValueError(
                f"window for {k_!r} must satisfy 0 <= lo <= hi <= 1"
            )
    h = _unit_hash(F.col(id_col), salt)
    keep = F.lit(False)
    for stratum, (lo, hi) in sorted(fractions.items()):
        keep = F.when(
            F.col(stratum_col) == stratum,
            (h >= F.lit(float(lo))) & (h < F.lit(float(hi))),
        ).otherwise(keep)
    return df.filter(keep)
