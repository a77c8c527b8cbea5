"""Multimodal (image/audio/video) column plumbing.

Opaque media travel as ``binary`` columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` operators so bytes stream through executors in columnar
batches and never transit the driver.

The decode kernels themselves are STUBBED (no image/audio libs in this
container): ``decode_image`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder (derived from
the payload bytes) exercises the real plumbing — schema, partitioning,
UDF signature, batch shape — end to end.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame as SDF, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)


def attach_media(sdf: SDF, payload_col: str, mime: str = "application/octet-stream") -> SDF:
    """Promote a binary column to the media schema (payload + meta)."""
    return sdf.withColumn(
        "meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    ).withColumnRenamed(payload_col, "payload")


_FEATURE_SCHEMA = "media_id long, n_bytes long, digest string, features array<double>"


def extract_features(sdf: SDF, id_col: str = "media_id", payload_col: str = "payload", fake: bool = True, dim: int = 8) -> SDF:
    """Per-item feature extraction via mapInPandas (Arrow batches).

    With ``fake=True`` features are a deterministic function of the bytes
    (length + md5-derived values) so tests can assert exact results; with
    ``fake=False`` this is where a real decoder (PIL/ffmpeg) would slot
    in — raises NotImplementedError in this container.
    """
    if not fake:
        raise NotImplementedError("real media decode needs image/audio libs not present in this container")

    def op(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import hashlib

        import pandas as pd

        for pdf in batches:
            ids, sizes, digests, feats = [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                digest = hashlib.md5(raw).hexdigest()
                ids.append(mid)
                sizes.append(len(raw))
                digests.append(digest)
                feats.append([int(digest[i * 2 : i * 2 + 2], 16) / 255.0 for i in range(dim)])
            yield pd.DataFrame(
                {"media_id": ids, "n_bytes": sizes, "digest": digests, "features": feats}
            )

    return sdf.mapInPandas(op, _FEATURE_SCHEMA)


def frame_sample(sdf: SDF, every_ms: int = 1000, id_col: str = "media_id", payload_col: str = "payload") -> SDF:
    """Frame sampling stub: emits (media_id, frame_idx, frame_payload)
    rows — one fake frame per ``every_ms`` of (fake) duration. Shows the
    1->N mapInPandas explode shape a real video sampler uses."""

    def op(batches):
        import pandas as pd

        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_payload": []}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                n_frames = max(1, min(5, len(raw) // 64))
                for i in range(n_frames):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_payload"].append(raw[i * 64 : (i + 1) * 64])
            yield pd.DataFrame(rows)

    return sdf.mapInPandas(op, "media_id long, frame_idx int, frame_payload binary")
