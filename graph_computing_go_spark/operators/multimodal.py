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
