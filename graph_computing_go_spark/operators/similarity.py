"""Similarity search over embedding columns (task mandate).

Input shape: (vec_id: long, embedding: array<float>[, label]).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.  The
  dot product is a built-in ``aggregate(zip_with(...))`` over the arrays, so
  the whole plan is JVM-side; queries are broadcast (they are the small side
  by construction).
- ``cosine_topk_arrow``: the scale path — same result, computed per
  partition as one numpy matmul via ``mapInPandas`` (Arrow batches); the
  query matrix rides along as a plain broadcast variable.  At 100 TB the
  candidate side streams through executors once, queries stay in memory.
- ``lsh_ann_topk``: random-hyperplane LSH bucketing — deterministic
  hyperplanes from an LCG (engine-portable arithmetic), bucket equi-join,
  exact cosine within the bucket.  Recall < 1 by design; the bucket join
  replaces the full cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = _as_double(F.col(vec_col))
    return df.withColumn("_v", v).withColumn("_norm", _norm(F.col("_v")))


def cosine_pairs(
    df: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(q_id, c_id, cosine) for every (query, candidate) pair, q != c."""
    cand = with_norm(df, vec_col).select(
        F.col(id_col).alias("c_id"), F.col("_v").alias("c_v"), F.col("_norm").alias("c_n")
    )
    qry = with_norm(queries, vec_col).select(
        F.col(id_col).alias("q_id"), F.col("_v").alias("q_v"), F.col("_norm").alias("q_n")
    )
    pairs = cand.crossJoin(F.broadcast(qry)).filter(F.col("q_id") != F.col("c_id"))
    return pairs.select(
        "q_id",
        "c_id",
        F.round(
            _dot(F.col("q_v"), F.col("c_v")) / (F.col("q_n") * F.col("c_n")), 6
        ).alias("cosine"),
    )


def cosine_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(q_id, c_id, cosine, rank) — exact top-k by cosine, ties by c_id."""
    scored = cosine_pairs(df, queries, id_col, vec_col)
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "cosine", "rank")
    )


def cosine_topk_arrow(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Same contract as ``cosine_topk`` but the per-partition scoring is one
    numpy matmul (Arrow-vectorized, no per-row Python — BASELINE.json:15).

    Partial top-k per partition (heap-free: argpartition) then a global
    window over k·n_partitions rows — the shuffle carries only candidates.

    Requires INTEGER ids (the pruning lexsort and the broadcast query-id
    array are int64); use ``dense_string_ids`` first for string keys.
    """
    import numpy as np
    import pandas as pd

    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)
    spark = df.sparkSession
    b = spark.sparkContext.broadcast((q_ids, q_mat, q_norm))

    out_schema = "q_id long, c_id long, cosine double"

    def score(batches):
        q_ids, q_mat, q_norm = b.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            c_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            c_norm = np.linalg.norm(c_mat, axis=1)
            # round BEFORE pruning: the final window ranks by rounded cosine
            # with c_id tie-break, so the per-partition top-k must use the
            # same ordering or k-boundary ties diverge from cosine_topk
            sims = np.round((c_mat @ q_mat.T) / np.outer(c_norm, q_norm), 6)
            for qi in range(len(q_ids)):
                col = sims[:, qi]
                mask = c_ids != q_ids[qi]
                ids, vals = c_ids[mask], col[mask]
                if len(ids) > k:
                    order = np.lexsort((ids, -vals))[:k]
                    ids, vals = ids[order], vals[order]
                yield pd.DataFrame(
                    {"q_id": q_ids[qi], "c_id": ids, "cosine": vals}
                )

    partial = df.select(id_col, vec_col).mapInPandas(score, out_schema)
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "cosine", "rank")
    )


def _lcg_matrix(n_rows: int, dim: int, stride: int, offset: int):
    """Deterministic pseudo-random matrix in [-0.5, 0.5): row r, column j =
    ((1103515245*(r*stride + j) + offset) mod 2^31)/2^31 - 0.5 — the same
    arithmetic the DuckDB oracles evaluate in SQL, done once in numpy
    (int64-exact: |products| << 2^63)."""
    import numpy as np

    r = np.arange(n_rows, dtype=np.int64)[:, None]
    j = np.arange(dim, dtype=np.int64)
    x = (1103515245 * (r * stride + j) + offset) % 2147483648
    return x / 2147483648.0 - 0.5


def hyperplane_signature(
    df: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket): sign-pattern bucket over n_planes LCG hyperplanes.

    Arrow kernel: one numpy matmul per batch against the deterministic plane
    matrix — a narrow map over the vectors.  (The previous formulation
    posexploded every vector into n·dim·planes shuffle rows; at d=768 that is
    ~6k shuffled rows per vector, dwarfing the data at scale.)

    The id column passes through untouched (output schema derives from the
    input field), so string/decimal ids work the same as integers.
    """
    import numpy as np
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()

    def kernel(batches):
        P = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(list(pdf[vec_col]), dtype=np.float64)
            if P is None or P.shape[1] != X.shape[1]:
                P = _lcg_matrix(n_planes, X.shape[1], stride=64, offset=12345)
            dots = X @ P.T
            bucket = (
                (dots > 0).astype(np.int64) << np.arange(n_planes, dtype=np.int64)
            ).sum(axis=1)
            yield pd.DataFrame({"id": pdf[id_col], "bucket": bucket})

    return df.select(id_col, vec_col).mapInPandas(
        kernel, f"id {id_type}, bucket long"
    )


def lsh_ann_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(q_id, c_id, cosine, rank) — approximate top-k within the LSH bucket.

    Same-bucket candidates only: recall trades against the n_planes-implied
    bucket count (2^n_planes).  Exact cosine re-ranking inside the bucket.

    Measured on the seeded 100k-vector mixture bench (recall@10 vs brute
    force, BENCH/BASELINE.md §5): n_planes=3 → 0.998, 4 → 0.874, 6 → 0.746,
    8 → 0.624.  The default 3 clears the ≥0.9 bar; every +1 plane halves
    per-bucket candidate cost and pays recall — raise it only with a
    measured recall check on your data, or prefer ``ivf_ann_topk`` with
    trained centroids (1.0 at n_probe=4 on the same bench), which holds
    recall at much smaller candidate sets.
    """
    sig = hyperplane_signature(df, n_planes, id_col, vec_col)
    cand = with_norm(df, vec_col).join(
        sig.withColumnRenamed("id", id_col), id_col
    ).select(
        F.col(id_col).alias("c_id"),
        F.col("_v").alias("c_v"),
        F.col("_norm").alias("c_n"),
        "bucket",
    )
    qsig = hyperplane_signature(queries, n_planes, id_col, vec_col)
    qry = with_norm(queries, vec_col).join(
        qsig.withColumnRenamed("id", id_col), id_col
    ).select(
        F.col(id_col).alias("q_id"),
        F.col("_v").alias("q_v"),
        F.col("_norm").alias("q_n"),
        "bucket",
    )
    pairs = cand.join(F.broadcast(qry), "bucket").filter(
        F.col("q_id") != F.col("c_id")
    )
    scored = pairs.select(
        "q_id",
        "c_id",
        F.round(
            _dot(F.col("q_v"), F.col("c_v")) / (F.col("q_n") * F.col("c_n")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "cosine", "rank")
    )


def ivf_assign(
    df: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rank_limit: int = 1,
    centroids=None,
) -> DataFrame:
    """(id, centroid, dot): nearest ``rank_limit`` centroids per vector by
    dot product — against TRAINED centroids when ``centroids`` (a k×d
    numpy array / nested list, e.g. from ``train_ivf_centroids``) is given,
    else the deterministic LCG matrix (the oracle-checkable stand-in).
    Trained centroids ride into the kernel via closure capture → Spark
    broadcast; the plan is identical either way.

    Arrow kernel: batch matmul + stable per-row argsort (ties → smaller
    centroid id, matching the oracle's ``ORDER BY dot DESC, k ASC``) — no
    exploded (id, k, j) shuffle rows.  The id column passes through untouched
    (output schema derives from the input field), so non-integer ids work.
    """
    import numpy as np
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()
    fixed = None if centroids is None else np.asarray(centroids, dtype=np.float64)

    def kernel(batches):
        C = fixed
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(list(pdf[vec_col]), dtype=np.float64)
            if C is None or (fixed is None and C.shape[1] != X.shape[1]):
                C = _lcg_matrix(n_centroids, X.shape[1], stride=997, offset=54321)
            dots = X @ C.T  # (n, n_centroids)
            # stable argsort on -dot keeps ascending k among ties
            order = np.argsort(-dots, axis=1, kind="stable")[:, :rank_limit]
            n, m = order.shape
            rows = np.repeat(np.arange(n), m)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy()[rows],
                    "centroid": order.ravel().astype(np.int64),
                    "dot": dots[rows, order.ravel()],
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        kernel, f"id {id_type}, centroid long, dot double"
    )


def train_ivf_centroids(
    df: DataFrame,
    n_centroids: int = 8,
    n_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """SPHERICAL k-means over the embedding column — real trained centroids
    for the IVF index (the LCG matrix is only the oracle-checkable
    stand-in).  Returns a k×d numpy array of UNIT centroids for
    ``ivf_assign``/``ivf_ann_topk``'s ``centroids`` argument.

    Spherical (cosine) k-means is the consistent choice here because both
    assignment and search rank by dot product: with unit centroids,
    argmax_j x·c_j IS the cosine-nearest centroid for every x, and the
    mean-then-renormalize update monotonically improves the spherical
    objective Σ max_j cos(x, c_j).

    Spark-first iteration: assignment is the existing Arrow matmul kernel;
    the centroid update is ONE groupBy aggregation per iteration —
    ``posexplode`` to (centroid, dim, x) then avg, where map-side partial
    aggregation bounds the shuffle at partitions×k×d rows no matter how
    many vectors stream through.  Only k×d floats ever reach the driver
    (the standard IVF training contract; at 65536×768 that is ~200 MB —
    cache ``df`` before calling, every iteration scans it).

    Deterministic: init from the k data vectors with the smallest
    xxhash64(id) — a pseudo-random deterministic sample executed as a
    distributed top-k (TakeOrderedAndProject: per-partition heads + driver
    merge of k rows, no global sort materialization) — padded with LCG rows
    if the input has fewer than k vectors; argmax ties to the smaller
    centroid id; empty clusters keep their previous centroid.
    """
    import numpy as np

    def _unit(M):
        n = np.linalg.norm(M, axis=1, keepdims=True)
        return M / np.where(n == 0, 1.0, n)

    seed_rows = (
        df.select(vec_col, F.xxhash64(F.col(id_col)).alias("__h"))
        .orderBy("__h")
        .limit(n_centroids)
        .collect()
    )
    if not seed_rows:
        raise ValueError("train_ivf_centroids: empty input")
    dim = len(seed_rows[0][vec_col])
    C = _lcg_matrix(n_centroids, dim, stride=997, offset=54321)
    for i, r in enumerate(seed_rows):
        C[i] = np.asarray(r[vec_col], dtype=np.float64)
    C = _unit(C)
    for _ in range(n_iters):
        assign = ivf_assign(
            df, n_centroids, id_col, vec_col, rank_limit=1, centroids=C
        ).select(F.col("id").alias(id_col), "centroid")
        # second tiny groupBy folds the k×d per-dim means into k array rows
        # BEFORE collect: k Row objects of d-length arrays reach the driver,
        # not k·d scalar Rows (at 65536×768 that is the difference between
        # ~200 MB of floats and ~50M Python Row objects per iteration)
        means = (
            df.join(assign, id_col)
            .select("centroid", F.posexplode(_as_double(F.col(vec_col))).alias("pos", "x"))
            .groupBy("centroid", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("centroid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("mean")
            )
            .collect()
        )
        newC = C.copy()  # empty clusters keep their previous centroid
        for r in means:
            newC[r["centroid"]] = np.asarray(r["mean"], dtype=np.float64)
        C = _unit(newC)
    return C


def ivf_ann_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids=None,
) -> DataFrame:
    """(q_id, c_id, cosine, rank): IVF search — candidates live in their
    single nearest centroid's inverted list; each query probes its
    ``n_probe`` nearest centroids and re-ranks exactly within them.

    Scale shape: the inverted-list assignment is one grouped aggregation;
    the probe is an equi-join on centroid id (no cross product); recall
    trades against n_probe exactly like a trained IVF index.

    Measured recall@10 vs brute force on the seeded 100k-vector mixture
    bench (BENCH/BASELINE.md §5): the defaults (n_centroids=8, n_probe=2)
    score 1.0; at the scaled-out geometry n_centroids=64 the LCG stand-in
    centroids score 0.936/0.978 at n_probe=4/8 and TRAINED centroids
    (``train_ivf_centroids``) score 1.0 at n_probe=4 — train for the
    production index, and grow n_centroids ~ sqrt(n) with n_probe >= 4.
    """
    assign = ivf_assign(
        df, n_centroids, id_col, vec_col, rank_limit=1, centroids=centroids
    )
    cand = with_norm(df, vec_col).join(
        assign.withColumnRenamed("id", id_col).select(id_col, "centroid"), id_col
    ).select(
        F.col(id_col).alias("c_id"),
        F.col("_v").alias("c_v"),
        F.col("_norm").alias("c_n"),
        "centroid",
    )
    probes = ivf_assign(
        queries, n_centroids, id_col, vec_col, rank_limit=n_probe,
        centroids=centroids,
    )
    qry = with_norm(queries, vec_col).join(
        probes.withColumnRenamed("id", id_col).select(id_col, "centroid"), id_col
    ).select(
        F.col(id_col).alias("q_id"),
        F.col("_v").alias("q_v"),
        F.col("_norm").alias("q_n"),
        "centroid",
    )
    pairs = cand.join(F.broadcast(qry), "centroid").filter(
        F.col("q_id") != F.col("c_id")
    )
    scored = pairs.select(
        "q_id",
        "c_id",
        F.round(
            _dot(F.col("q_v"), F.col("c_v")) / (F.col("q_n") * F.col("c_n")), 6
        ).alias("cosine"),
    ).dropDuplicates(["q_id", "c_id"])
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "cosine", "rank")
    )


def save_centroids(spark, centroids, path: str) -> None:
    """Persist a trained centroid matrix as a (centroid, vec) parquet table.

    Training and serving are separate jobs at scale — train once on a
    sample (``train_ivf_centroids``), persist, then every ingest/search
    job loads the same index geometry.  k×d floats: a driver-side
    createDataFrame is the right size class (same contract as training's
    collect), and parquet keeps the artifact readable by any engine."""
    rows = [
        (i, [float(x) for x in centroids[i]]) for i in range(len(centroids))
    ]
    (
        spark.createDataFrame(rows, "centroid int, vec array<double>")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(path)
    )


def load_centroids(spark, path: str):
    """Load a ``save_centroids`` artifact back into the numpy matrix form
    ``ivf_assign``/``ivf_ann_topk``/``train_ivf_centroids`` accept (row i =
    centroid i)."""
    import numpy as np

    rows = spark.read.parquet(path).orderBy("centroid").collect()
    if not rows:
        raise ValueError(f"no centroids at {path}")
    return np.asarray([r["vec"] for r in rows], dtype=np.float64)
