"""Multimodal column plumbing: images/audio/video as opaque binary columns.

The Spark-side machinery here is real and tested — schemas, Arrow-batched
``mapInPandas`` decode pipelines, batch sizing, partition hygiene.  Media
decoding comes in two tiers: :func:`auto_decode` routes payloads whose
magic bytes match a container this environment can GENUINELY parse without
codec libraries — WAV PCM (stdlib ``wave``), binary PPM, uncompressed BMP —
through a real decode path (``wav_feature_quanta`` oracle-checks it
end-to-end); everything else (JPEG/MP3/MP4 need Pillow/torchaudio/ffmpeg,
absent here) falls back to :func:`fake_decode`, a clearly-marked
deterministic stub deriving features from the payload digest.  Swap in a
richer decoder by passing ``decode_fn``; the distributed plumbing does not
change.

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
import io
import struct
import wave
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


def _segment_means(x: np.ndarray, scale: float) -> np.ndarray:
    """FEATURE_DIM equal-length segment means of ``x`` normalized by
    ``scale`` — zero-padded up to a segment multiple so every sample lands
    in exactly one segment.  Computed in an exact-integer-safe order (sum of
    <=2^24-magnitude float32 values, then two divisions) so the quanta
    oracle can recover the integer segment sums bit-exactly."""
    if x.size == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    seg = -(-x.size // FEATURE_DIM)  # ceil
    padded = np.zeros(seg * FEATURE_DIM, dtype=np.float32)
    padded[: x.size] = x
    sums = padded.reshape(FEATURE_DIM, seg).sum(axis=1)
    return (sums / (seg * scale)).astype(np.float32)


def decode_wav(payload: bytes) -> np.ndarray:
    """REAL audio decoder (stdlib ``wave`` — no external deps): parse the
    RIFF/WAVE container, read the PCM frames, and emit ``FEATURE_DIM``
    segment mean amplitudes normalized to [0, 1].

    Handles mono/stereo 8-bit unsigned and 16-bit signed PCM — the formats
    the stdlib reader covers.  This is the genuine decode path the stub
    stands in for elsewhere: the bytes that come out are the samples that
    went in through a real codec container round-trip.
    """
    with wave.open(io.BytesIO(payload), "rb") as w:
        n_ch, samp_w = w.getnchannels(), w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if samp_w == 1:
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
        scale = 255.0
    elif samp_w == 2:
        x = np.abs(np.frombuffer(raw, dtype="<i2").astype(np.float32))
        scale = 32768.0
    else:
        raise ValueError(f"unsupported PCM sample width {samp_w}")
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return _segment_means(x, scale)


def _parse_ppm(payload: bytes) -> tuple[int, int, int, int]:
    """Parse a binary-PPM (``P6``) header: ``(width, height, maxval,
    data_offset)``; ``#`` comments allowed."""
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment runs to end of line
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval, then raw pixel data
    width, height, maxval = tokens
    return width, height, maxval, i


def decode_ppm(payload: bytes) -> np.ndarray:
    """REAL image decoder for binary PPM (``P6``): parse the ASCII header,
    then segment-mean the raw interleaved RGB bytes normalized by maxval."""
    width, height, maxval, off = _parse_ppm(payload)
    pixels = np.frombuffer(
        payload, dtype=np.uint8, count=width * height * 3, offset=off
    )
    return _segment_means(pixels.astype(np.float32), float(maxval))


def resize_ppm_gray(payload: bytes, box: int = 3) -> np.ndarray:
    """REAL image resize: box-average a binary PPM down by ``box`` in each
    dimension, collapsing RGB to grayscale — the classic area-interpolation
    downsample.  The image is floor-cropped to multiples of ``box`` (the
    partial edge rows/cols are dropped), so every output cell is the exact
    mean of ``box*box*3`` input bytes — which is what makes the distributed
    path oracle-checkable: ``cell * (box*box*3) * maxval`` is an integer
    byte sum a SQL engine can recompute from the raw payload.  Returns a
    float32 ``(height//box, width//box)`` matrix in [0, 1]."""
    width, height, maxval, off = _parse_ppm(payload)
    pixels = np.frombuffer(
        payload, dtype=np.uint8, count=width * height * 3, offset=off
    ).reshape(height, width, 3)
    h_out, w_out = height // box, width // box
    if h_out == 0 or w_out == 0:
        raise ValueError(f"image {width}x{height} smaller than box {box}")
    cropped = pixels[: h_out * box, : w_out * box, :].astype(np.float64)
    cells = cropped.reshape(h_out, box, w_out, box, 3)
    out = cells.sum(axis=(1, 3, 4)) / (box * box * 3 * maxval)
    return out.astype(np.float32)


def decimate_wav(payload: bytes, factor: int = 4) -> np.ndarray:
    """REAL audio downsampling: decode the WAV container and box-average
    every ``factor`` consecutive PCM samples (the anti-aliasing-free
    decimation used for cheap feature pyramids) — the audio twin of
    :func:`resize_ppm_gray`.  The trailing partial block is dropped
    (floor semantics, mirroring the image crop), so every output sample
    is the exact mean of ``factor`` input samples: ``out * factor *
    scale`` is an integer sum a SQL engine can recompute from the raw
    payload bytes.  Returns float32 samples in [0, 1]."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        n_ch, samp_w = w.getnchannels(), w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if samp_w != 1 or n_ch != 1:
        raise ValueError("decimate_wav supports mono 8-bit PCM")
    x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
    n_out = x.size // factor
    if n_out == 0:
        raise ValueError(f"{x.size} samples shorter than factor {factor}")
    blocks = x[: n_out * factor].reshape(n_out, factor)
    return (blocks.sum(axis=1) / (factor * 255.0)).astype(np.float32)


def decimate_audio(
    assets: DataFrame,
    factor: int = 4,
    decimate_fn: Callable[[bytes, int], np.ndarray] = decimate_wav,
    id_col: str = "asset_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Distributed audio downsampling: ``(asset_id, n_out, samples)`` with
    ``samples`` the decimated float32 stream — same Arrow-batch shape and
    per-asset failure isolation as :func:`resize_images`."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("n_out", T.IntegerType()),
            T.StructField("samples", T.ArrayType(T.FloatType())),
        ]
    )

    def decimate_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, out = [], [], []
            for aid, payload in zip(pdf[id_col], pdf[payload_col]):
                ids.append(aid)
                try:
                    y = decimate_fn(payload, factor)
                    ns.append(y.size)
                    out.append([float(v) for v in y])
                except Exception:  # noqa: BLE001 — per-asset isolation
                    ns.append(0)
                    out.append(None)
            yield pd.DataFrame({id_col: ids, "n_out": ns, "samples": out})

    return assets.select(id_col, payload_col).mapInPandas(
        decimate_batches, schema=out_schema
    )


def resize_images(
    assets: DataFrame,
    box: int = 3,
    resize_fn: Callable[[bytes, int], np.ndarray] = resize_ppm_gray,
    id_col: str = "asset_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Distributed image downsampling: ``(asset_id, out_h, out_w, pixels)``
    with ``pixels`` the row-major flattened grayscale grid.

    Same Arrow-batch shape as :func:`extract_features` (mapInPandas, whole
    batches, per-asset failure isolation via null pixels)."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("out_h", T.IntegerType()),
            T.StructField("out_w", T.IntegerType()),
            T.StructField("pixels", T.ArrayType(T.FloatType())),
        ]
    )

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs, ws, px = [], [], [], []
            for aid, payload in zip(pdf[id_col], pdf[payload_col]):
                ids.append(aid)
                try:
                    grid = resize_fn(payload, box)
                    hs.append(grid.shape[0])
                    ws.append(grid.shape[1])
                    px.append([float(x) for x in grid.ravel()])
                except Exception:  # noqa: BLE001 — per-asset isolation
                    hs.append(0)
                    ws.append(0)
                    px.append(None)
            yield pd.DataFrame(
                {id_col: ids, "out_h": hs, "out_w": ws, "pixels": px}
            )

    return assets.select(id_col, payload_col).mapInPandas(
        resize_batches, schema=out_schema
    )


def decode_bmp(payload: bytes) -> np.ndarray:
    """REAL image decoder for uncompressed BMP: struct-parse the file +
    info headers (pixel-array offset, dimensions, bpp, BI_RGB check), then
    segment-mean the pixel bytes."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_offset,) = struct.unpack_from("<I", payload, 10)
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if compression != 0:
        raise ValueError(f"compressed BMP (method {compression}) unsupported")
    row_bytes = (abs(width) * bpp // 8 + 3) & ~3  # rows pad to 4 bytes
    pixels = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * abs(height), offset=data_offset
    )
    return _segment_means(pixels.astype(np.float32), 255.0)


def auto_decode(payload: bytes, media_type: str) -> np.ndarray:
    """Magic-sniffing decoder: route to the REAL pure-Python decoder when
    the payload is a container this environment can parse without codec
    libraries (WAV PCM via stdlib ``wave``, binary PPM, uncompressed BMP),
    else fall back to the deterministic :func:`fake_decode` stub.  Drop-in
    ``decode_fn`` for :func:`extract_features` / :func:`sample_frames`."""
    if payload is None:
        raise ValueError("cannot decode a null payload")
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    return fake_decode(payload, media_type)


#: container formats auto_decode parses with a REAL decoder in this
#: environment (no codec libraries: JPEG/PNG/FLAC/MP4 etc. fall back to
#: the deterministic stub).  Pinned by a registry test so a future
#: environment that grows codec libs flips coverage VISIBLY instead of
#: silently.
REAL_CONTAINERS: frozenset[str] = frozenset({"wav-pcm", "ppm", "bmp"})


def decode_status(payload: bytes) -> str:
    """``'real:<container>'`` when :func:`auto_decode` would route this
    payload to a genuine decoder, ``'stub'`` when it would fall back to
    the digest-derived fake — the loud marker for which media actually
    decode in this container."""
    if payload is None:
        return "stub"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "real:wav-pcm"
    if payload[:2] == b"P6":
        return "real:ppm"
    if payload[:2] == b"BM":
        return "real:bmp"
    return "stub"


def make_wav_pcm8(
    data: bytes, sample_rate: int = 8000, n_samples: int = 512
) -> bytes:
    """Wrap ``data`` as a genuine mono 8-bit PCM WAV container (truncated /
    zero-padded to exactly ``n_samples`` samples) using the stdlib writer —
    the asset synthesizer for exercising :func:`decode_wav` on real
    containers.  512 samples = 32 per feature segment, so the quanta oracle
    recovers exact integer segment sums."""
    body = (data or b"")[:n_samples].ljust(n_samples, b"\x00")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(sample_rate)
        w.writeframes(body)
    return buf.getvalue()


def make_ppm(data: bytes, width: int = 19, height: int = 9) -> bytes:
    """Wrap ``data`` as a genuine binary PPM (P6) image — ``width*height*3``
    raw RGB bytes (truncated / zero-padded), preceded by the documented
    ASCII header.  The image synthesizer for exercising :func:`decode_ppm`
    on real containers (default 19x9 = 513 pixel bytes)."""
    n_pix = width * height * 3
    body = (data or b"")[:n_pix].ljust(n_pix, b"\x00")
    return f"P6\n{width} {height}\n255\n".encode() + body


def make_bmp(data: bytes, width: int = 20, height: int = 9) -> bytes:
    """Wrap ``data`` as a genuine uncompressed 24-bpp BMP — 14-byte file
    header + 40-byte BITMAPINFOHEADER + ``width*height*3`` raw pixel bytes
    (truncated / zero-padded).  Default width 20 makes each row exactly 60
    bytes — already a multiple of 4, so the BMP row padding is empty and
    the pixel array is byte-for-byte the input data, which is what lets a
    SQL oracle recompute segment sums from the raw text.  The image
    synthesizer for exercising :func:`decode_bmp` on real containers."""
    n_px = width * height * 3
    if (width * 3) % 4:
        raise ValueError("pick a width with 4-byte-aligned rows for oracle use")
    body = (data or b"")[:n_px].ljust(n_px, b"\x00")
    file_header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return file_header + info_header + body


def bmp_assets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 20,
    height: int = 9,
) -> DataFrame:
    """Text table -> image assets whose payloads are REAL uncompressed BMP
    containers (the text's UTF-8 bytes as the pixel array) — the third
    genuine-decoder twin next to :func:`wav_assets` / :func:`ppm_assets`,
    built distributed via an Arrow-batched pandas UDF."""

    @F.pandas_udf(T.BinaryType())
    def to_bmp(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda s: make_bmp((s or "").encode("utf-8"), width, height)
        )

    # NOT spread (r13 measured): at bench scale the synthesis stage costs
    # less than the spread exchange (media family A/B: none beats spread
    # by ~0.4s/query); real media corpora arrive as many files/splits,
    # where spread_small_input is a structural no-op anyway.
    return df.select(
        F.col(id_col).alias("asset_id"),
        F.lit("image").alias("media_type"),
        to_bmp(F.col(text_col)).alias("payload"),
    )


def ppm_assets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 19,
    height: int = 9,
) -> DataFrame:
    """Text table -> image assets whose payloads are REAL PPM containers
    (the text's UTF-8 bytes as raw RGB) — the image twin of
    :func:`wav_assets`, built distributed via an Arrow-batched pandas
    UDF."""

    @F.pandas_udf(T.BinaryType())
    def to_ppm(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda s: make_ppm((s or "").encode("utf-8"), width, height)
        )

    # NOT spread (r13 measured): at bench scale the synthesis stage costs
    # less than the spread exchange (media family A/B: none beats spread
    # by ~0.4s/query); real media corpora arrive as many files/splits,
    # where spread_small_input is a structural no-op anyway.
    return df.select(
        F.col(id_col).alias("asset_id"),
        F.lit("image").alias("media_type"),
        to_ppm(F.col(text_col)).alias("payload"),
    )


def wav_assets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_samples: int = 512,
) -> DataFrame:
    """Turn a text table into audio assets whose payloads are REAL WAV
    containers (the text's UTF-8 bytes as 8-bit PCM samples) — deterministic
    input for the genuine decode path, synthesized distributed (Arrow-batched
    pandas UDF), never on the driver."""

    @F.pandas_udf(T.BinaryType())
    def to_wav(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda s: make_wav_pcm8((s or "").encode("utf-8"), n_samples=n_samples)
        )

    # NOT spread (r13 measured): at bench scale the synthesis stage costs
    # less than the spread exchange (media family A/B: none beats spread
    # by ~0.4s/query); real media corpora arrive as many files/splits,
    # where spread_small_input is a structural no-op anyway.
    return df.select(
        F.col(id_col).alias("asset_id"),
        F.lit("audio").alias("media_type"),
        to_wav(F.col(text_col)).alias("payload"),
    )


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

    # the select matters at scale — an opaque map defeats column pruning,
    # so only the three needed columns cross the boundary.  NOT spread
    # (r13 measured): the exchange would move payload bytes and costs
    # more than the decode stage it parallelizes at bench scale; at real
    # scale assets arrive as many splits and a spread is a no-op.
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

    # project to the three needed columns first; NOT spread (r13
    # measured — see extract_features)
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
