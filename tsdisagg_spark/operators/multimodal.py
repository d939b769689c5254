"""Multimodal column plumbing: images/audio/video as opaque binary columns.

The Spark-side machinery here is real and tested — schemas, Arrow-batched
``mapInPandas`` decode pipelines, batch sizing, partition hygiene.  The
actual media decoding is STUBBED: codec libraries (Pillow, torchaudio,
ffmpeg) are not available in this environment, so ``decode_fn`` defaults to
a clearly-marked deterministic fake that derives features from the payload
bytes.  Swap in a real decoder by passing ``decode_fn``; the distributed
plumbing does not change.

Design for 100 TB of media:

* Binary payloads ride in their own column, nullable, next to typed
  metadata (``media_type``, ``width``..).  Never explode payloads into rows.
* ``mapInPandas`` (not a scalar UDF) so one Python call handles a whole
  Arrow batch, and ``maxRecordsPerBatch`` bounds executor memory:
  batch_bytes ~ batch_rows x payload_size.
* Feature extraction emits fixed-size ``array<float>`` columns that feed
  directly into :mod:`tsdisagg_spark.operators.similarity`.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical media-asset schema: opaque payload + typed metadata
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_DIM = 16


def fake_decode(payload: bytes, media_type: str) -> np.ndarray:
    """STUB decoder: deterministic pseudo-features from the payload digest.

    Stands in for image resize / audio frame-sample / video keyframe
    extraction, which need codec libraries absent from this environment.
    Deterministic so tests are stable; raise-on-None mirrors real decoders.
    """
    if payload is None:
        raise ValueError("cannot decode a null payload")
    digest = hashlib.sha256(media_type.encode() + payload).digest()
    raw = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16)
    return (raw.astype(np.float32) / 65535.0).astype(np.float32)


def extract_features(
    assets: DataFrame,
    decode_fn: Callable[[bytes, str], np.ndarray] = fake_decode,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    type_col: str = "media_type",
    batch_size: int | None = 256,
) -> DataFrame:
    """Decode + featurize assets into ``(asset_id, n_bytes, features)``.

    Runs as ``mapInPandas``: the decode loop sees whole Arrow batches and
    yields columnar results, never one Python call per row.  Failed decodes
    surface as null features (per-asset isolation, same philosophy as
    ``disaggregate(errors='skip')``).

    ``batch_size`` bounds the rows *yielded* per output frame by re-chunking
    inside Python — it does NOT touch the session-global
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` (an earlier version did,
    silently changing Arrow batching for every later query in the session).
    The Arrow *transfer* batch size stays under the caller's session conf.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            step = batch_size if batch_size else len(pdf) or 1
            for lo in range(0, len(pdf), step):
                chunk = pdf.iloc[lo : lo + step]
                ids, sizes, feats = [], [], []
                for aid, payload, mtype in zip(
                    chunk[id_col], chunk[payload_col], chunk[type_col]
                ):
                    ids.append(aid)
                    sizes.append(len(payload) if payload is not None else 0)
                    try:
                        feats.append([float(x) for x in decode_fn(payload, mtype)])
                    except Exception:  # noqa: BLE001 — per-asset isolation
                        feats.append(None)
                yield pd.DataFrame(
                    {id_col: ids, "n_bytes": sizes, "features": feats}
                )

    return assets.select(id_col, payload_col, type_col).mapInPandas(
        decode_batches, schema=out_schema
    )


def sample_frames(
    assets: DataFrame,
    n_frames: int = 4,
    decode_fn: Callable[[bytes, str], np.ndarray] = fake_decode,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    type_col: str = "media_type",
) -> DataFrame:
    """Keyframe sampling: one input asset expands to ``n_frames`` rows of
    ``(asset_id, frame_idx, features)`` — the video/audio-chunking shape.

    Structurally different from :func:`extract_features`: the
    ``mapInPandas`` batch yields MORE rows than it receives (1-to-N row
    expansion), so output batch size is bounded by rows-in x n_frames —
    size Arrow batches for the EXPANDED side when frames are wide.  The
    per-frame decode is STUBBED (deterministic features from the payload
    digest salted by frame index); a real decoder slots into ``decode_fn``
    without touching the distributed plumbing.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def expand_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, feats = [], [], []
            for aid, payload, mtype in zip(
                pdf[id_col], pdf[payload_col], pdf[type_col]
            ):
                for fi in range(n_frames):
                    ids.append(aid)
                    idxs.append(fi)
                    try:
                        feats.append(
                            [
                                float(x)
                                for x in decode_fn(payload, f"{mtype}#frame{fi}")
                            ]
                        )
                    except Exception:  # noqa: BLE001 — per-frame isolation
                        feats.append(None)
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "features": feats})

    return assets.select(id_col, payload_col, type_col).mapInPandas(
        expand_batches, schema=out_schema
    )


def payload_stats(assets: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap metadata scan without touching Python: byte sizes and digests
    via built-in expressions (the audit pass before an expensive decode)."""
    return assets.select(
        "asset_id",
        "media_type",
        F.octet_length(payload_col).cast("long").alias("n_bytes"),
        F.md5(payload_col).alias("digest"),
        F.col(payload_col).isNull().alias("missing_payload"),
    )


def synthesize_assets(
    spark, n: int = 64, seed: int = 7
) -> DataFrame:
    """Deterministic fake asset table for tests/benches (binary payloads of
    varying size with metadata)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        mtype = ("image", "audio", "video")[i % 3]
        size = int(rng.integers(64, 4096))
        payload = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
        rows.append((i, mtype, bytearray(payload), {"src": f"synthetic/{i}"}))
    return spark.createDataFrame(rows, schema=ASSET_SCHEMA)
