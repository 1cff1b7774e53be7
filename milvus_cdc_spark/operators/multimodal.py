"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a
typed metadata struct alongside. The Spark-side plumbing — schema,
Arrow batch shape, ``mapInPandas`` iterator contract, partition sizing —
is real and tested; the actual media decode is STUBBED (no image/audio
libraries ship in this container): ``decode_stub=True`` produces a
deterministic fake feature vector from the bytes' sha256, and
``decode_stub=False`` raises NotImplementedError where a real decoder
(PIL/ffmpeg) would plug in.

Scale notes: binary payloads dominate partition size — repartition so
``rows_per_partition × avg_payload`` stays well under executor memory
(the packer-size-protector analog, ``server/msgpacker/packer.go:57-98``),
and keep metadata in separate (pruned) columns so metadata-only queries
never read the blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, meta_format string, meta_n_bytes long"
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, payload_sha256 string, feature array<double>"


def to_media(df: DataFrame, id_col: str, bytes_col, kind: str, fmt: str) -> DataFrame:
    """Wrap a binary column into the standard media shape."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col(bytes_col).cast("binary").alias("payload"),
        F.lit(fmt).alias("meta_format"),
        F.octet_length(F.col(bytes_col).cast("binary")).cast("long").alias("meta_n_bytes"),
    )


def extract_features(
    media: DataFrame, feature_dim: int = 8, decode_stub: bool = True
) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow batches).

    The deterministic fake: feature[i] = byte i of sha256(payload) / 255
    — stable across runs and cluster sizes, so tests can assert exact
    values. Swap the body for a real decoder without touching the
    Spark plan.
    """
    if not 1 <= feature_dim <= 32:
        raise ValueError(
            f"feature_dim must be in 1..32 (sha256 digest bytes), got {feature_dim}"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode needs PIL/ffmpeg — not in this container"
                )
            digests = pdf["payload"].map(
                lambda b: hashlib.sha256(bytes(b)).digest() if b is not None else None
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "payload_sha256": digests.map(
                        lambda d: d.hex() if d is not None else None
                    ),
                    "feature": digests.map(
                        lambda d: [d[i] / 255.0 for i in range(feature_dim)]
                        if d is not None
                        else None
                    ),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """'Frame sampling' plumbing demo: slice the payload every N bytes
    (stand-in for video frame extraction) — pure built-ins
    (substring on binary), exploded to one row per frame."""
    # frames = ceil(len / N), capped: a 64-byte payload at N=64 is ONE
    # frame, not two; empty/NULL payloads yield zero frames (least()
    # SKIPS nulls, so an unguarded least(null_len, cap) would emit the
    # full cap of phantom frames for a missing payload)
    n_bytes = F.coalesce(F.octet_length("payload"), F.lit(0))
    n_frames = F.least(
        F.ceil(n_bytes / F.lit(every_n_bytes)).cast("int"), F.lit(max_frames)
    )
    idx = F.when(
        n_frames > 0, F.sequence(F.lit(0), n_frames - 1)
    ).otherwise(F.array().cast("array<int>"))
    return media.select(
        "media_id",
        F.posexplode(idx).alias("frame_no", "_i"),
    ).select("media_id", "frame_no")
