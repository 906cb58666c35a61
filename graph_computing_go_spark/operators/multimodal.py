"""Multimodal-column plumbing: binary payloads + typed metadata (task
mandate).

Design: media rides as an opaque ``binary`` column with a typed metadata
struct alongside (modality, mime, width/height/duration, sha256).  Decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` kernels so payload
bytes never round-trip through per-row Python.  The actual codecs (PIL /
torchaudio / ffmpeg) are NOT in this container, so the decode step is
STUBBED: ``decode_stub="fake"`` produces deterministic features derived from
the payload bytes (byte histogram / moments — real Spark plumbing, fake
pixels), and ``decode_stub="error"`` raises NotImplementedError exactly
where a codec would plug in.

Schemas are real and tested; swapping in a real codec changes only the
inner numpy function.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("modality", T.StringType(), True),
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("sha256", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, modality string, n_bytes long, "
    "mean_byte double, feature array<double>"
)


def synthesize_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic fake media table from any (id, text) source: payload =
    utf-8 bytes, modality round-robins image/audio/video.  Used by tests and
    the driver query so the pipeline is runnable without codecs."""
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            modality.alias("modality"),
            F.concat(F.lit("application/x-fake-"), modality).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.sha2(payload, 256).alias("sha256"),
        ).alias("meta"),
    )


def extract_features(
    media: DataFrame, decode_stub: str = "fake", n_bins: int = 8
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``decode_stub='fake'``: per-payload byte-histogram features (n_bins
    buckets, L1-normalized) + mean byte value — deterministic, so testable.
    ``decode_stub='error'``: the seam where a real codec goes.

    Bin contract: byte ``b`` lands in bin ``min(b // (256 // n_bins),
    n_bins - 1)`` — when ``256 % n_bins != 0`` the LAST bin is wider and
    absorbs the remainder (the feature vector is always exactly ``n_bins``
    long; no overflow bin).
    """
    import numpy as np
    import pandas as pd

    if decode_stub not in ("fake", "error"):
        raise ValueError(f"unknown decode_stub: {decode_stub}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "error":
                raise NotImplementedError(
                    "real image/audio decode requires PIL/torchaudio — "
                    "not available in this environment"
                )
            if len(pdf) == 0:
                continue
            # fully vectorized over the Arrow batch: one concatenated byte
            # buffer + segment ids, histogram/sum via bincount (the
            # np.add.at scatter, fused) — no per-row Python on the payloads
            n = len(pdf)
            lens = (
                pdf["payload"].str.len().fillna(0).to_numpy(dtype=np.int64)
            )
            buf = np.frombuffer(
                b"".join(pdf["payload"].dropna()), dtype=np.uint8
            )
            seg = np.repeat(np.arange(n), lens)
            # clip the bin index: when 256 % n_bins != 0 the quotient maps
            # bytes >= n_bins*(256//n_bins) to bin n_bins (the last bin is
            # simply wider) — unclipped, that index bleeds into the NEXT
            # row's bin 0 in the flattened bincount and overflows the
            # reshape on the final row
            bins = np.minimum(buf // max(1, 256 // n_bins), n_bins - 1)
            hist = np.bincount(
                seg * n_bins + bins, minlength=n * n_bins
            ).reshape(n, n_bins)
            sums = np.bincount(seg, weights=buf.astype(np.float64), minlength=n)
            denom = np.maximum(lens, 1)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["meta"].str.get("modality"),
                    "n_bytes": lens,
                    "mean_byte": sums / denom,
                    "feature": list(hist / denom[:, None]),
                }
            )

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def resize_media(
    media: DataFrame, width: int, height: int, decode_stub: str = "fake"
) -> DataFrame:
    """Resize every payload to exactly ``width*height`` bytes (same
    MEDIA_SCHEMA out, meta.width/height set, sha256 recomputed JVM-side).

    ``decode_stub='fake'`` treats the payload as a 1-D byte image and
    nearest-neighbor-resamples it — one vectorized gather over the whole
    Arrow batch (index arithmetic on the concatenated buffer; no per-byte
    Python).  A real deployment swaps the gather for PIL/cv2 per batch;
    everything else — batch shape, output schema, JVM-side metadata
    rebuild — is the production plumbing.  Empty/NULL payloads resize to
    zeros (their sha is still well-defined).
    """
    import numpy as np
    import pandas as pd

    if decode_stub not in ("fake", "error"):
        raise ValueError(f"unknown decode_stub: {decode_stub}")
    wh = int(width) * int(height)
    if wh <= 0:
        raise ValueError("width*height must be positive")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "error":
                raise NotImplementedError(
                    "real image resize requires PIL/cv2 — not available "
                    "in this environment"
                )
            if len(pdf) == 0:
                continue
            n = len(pdf)
            lens = pdf["payload"].str.len().fillna(0).to_numpy(dtype=np.int64)
            buf = np.frombuffer(
                b"".join(pdf["payload"].dropna()), dtype=np.uint8
            )
            # nearest-neighbor gather, whole batch at once: row i's output
            # byte j reads input byte floor(j * L_i / wh) at that row's
            # offset; L_i == 0 rows read a dummy index and are zeroed after
            starts = np.repeat(np.concatenate(([0], np.cumsum(lens)[:-1])), wh)
            j = np.tile(np.arange(wh, dtype=np.int64), n)
            l_rep = np.repeat(lens, wh)
            idx = starts + (j * l_rep) // wh
            out = (
                buf[np.minimum(idx, max(len(buf) - 1, 0))]
                if len(buf)
                else np.zeros(n * wh, dtype=np.uint8)
            )
            out = np.where(l_rep > 0, out, 0).astype(np.uint8).reshape(n, wh)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [r.tobytes() for r in out],
                    "modality": pdf["meta"].str.get("modality"),
                    "mime": pdf["meta"].str.get("mime"),
                    "duration_ms": pdf["meta"].str.get("duration_ms"),
                }
            )

    resized = media.mapInPandas(
        kernel,
        "media_id long, payload binary, modality string, mime string, "
        "duration_ms int",
    )
    # metadata rebuild stays JVM-side (sha2 over the new payload is a
    # built-in — no reason to hash inside the Python kernel)
    return resized.select(
        "media_id",
        "payload",
        F.struct(
            F.col("modality"),
            F.col("mime"),
            F.lit(int(width)).alias("width"),
            F.lit(int(height)).alias("height"),
            F.col("duration_ms"),
            F.sha2("payload", 256).alias("sha256"),
        ).alias("meta"),
    )


def sample_frames(
    media: DataFrame, n_frames: int, decode_stub: str = "fake"
) -> DataFrame:
    """Row-exploding frame sampler: each payload yields ``n_frames`` rows
    ``(media_id, frame_idx, ts_ms, frame binary)`` — the batch shape a real
    video pipeline needs (one input row fans out to many output rows inside
    mapInPandas; Spark only sees the declared output schema).

    ``decode_stub='fake'``: frame k is the payload byte-slice
    ``[k*L/n, (k+1)*L/n)`` and ``ts_ms`` spaces ``meta.duration_ms``
    evenly (NULL duration → NULL ts).  Boundary arithmetic is vectorized;
    the per-frame ``bytes`` objects are C-level buffer slices.  A real
    deployment replaces the slice with an ffmpeg/pyav keyframe grab.
    Empty/NULL payloads yield ``n_frames`` empty frames (ledger-style: no
    input row silently disappears).
    """
    import numpy as np
    import pandas as pd

    if decode_stub not in ("fake", "error"):
        raise ValueError(f"unknown decode_stub: {decode_stub}")
    k = int(n_frames)
    if k <= 0:
        raise ValueError("n_frames must be positive")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "error":
                raise NotImplementedError(
                    "real frame extraction requires ffmpeg/pyav — not "
                    "available in this environment"
                )
            if len(pdf) == 0:
                continue
            n = len(pdf)
            lens = pdf["payload"].str.len().fillna(0).to_numpy(dtype=np.int64)
            # frame boundaries for ALL (row, frame) pairs in one shot
            f = np.arange(k + 1, dtype=np.int64)
            bounds = (lens[:, None] * f[None, :]) // k  # (n, k+1)
            dur = pdf["meta"].str.get("duration_ms").to_numpy(dtype=object)
            payloads = pdf["payload"].to_numpy(dtype=object)
            frames = [
                bytes(payloads[i][bounds[i, j] : bounds[i, j + 1]] or b"")
                if payloads[i] is not None
                else b""
                for i in range(n)
                for j in range(k)
            ]
            ts = [
                float(dur[i]) * j / k if dur[i] is not None else None
                for i in range(n)
                for j in range(k)
            ]
            yield pd.DataFrame(
                {
                    "media_id": np.repeat(
                        pdf["media_id"].to_numpy(dtype=np.int64), k
                    ),
                    "frame_idx": np.tile(np.arange(k, dtype=np.int32), n),
                    "ts_ms": pd.array(ts, dtype="float64"),
                    "frame": frames,
                }
            )

    return media.mapInPandas(
        kernel, "media_id long, frame_idx int, ts_ms double, frame binary"
    )
