"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with a typed metadata struct
alongside — the table shape a 100 TB multimodal corpus uses:

    (sample_id string, modality string, payload binary,
     meta struct<mime:string, width:int, height:int, duration_ms:long>)

The Spark-side machinery here is REAL and tested: schemas, hashing,
partition-friendly batch shapes, Arrow-batched mapInPandas signatures.
The codec step itself (JPEG decode, audio resample, video frame-sample)
is STUBBED — the decode libraries are not in this container — behind
``set_decoder``: production installs a real decoder, tests install the
deterministic fake. Calling a decode op without either raises
NotImplementedError at executor time.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("sample_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = "sample_id string, modality string, n_bytes long, payload_sha256 string, feature array<float>"

#: decoder registry: modality → callable(payload bytes, meta dict) → list[float]
_DECODERS: dict[str, Callable[[bytes, dict[str, Any]], list[float]]] = {}


def set_decoder(
    modality: str, fn: Callable[[bytes, dict[str, Any]], list[float]]
) -> None:
    """Install a codec for a modality. Production: wraps PIL/ffmpeg/etc.
    Tests: a deterministic fake. MUST be called before building the decode
    plan if that plan will execute."""
    _DECODERS[modality] = fn


def deterministic_fake_decoder(n_features: int = 8):
    """A stand-in codec: features derived from byte content only —
    reproducible across executors, no external libraries."""

    def decode(payload: bytes, meta: dict[str, Any]) -> list[float]:
        if payload is None:
            return [0.0] * n_features
        acc = [0] * n_features
        for i, byte in enumerate(payload):
            acc[i % n_features] = (acc[i % n_features] * 31 + byte) % 100003
        return [v / 100003.0 for v in acc]

    return decode


def payload_metadata(df: DataFrame) -> DataFrame:
    """Cheap metadata pass — native expressions only, no decode: byte
    length + sha256 of the payload (the no-mutation invariant for binary
    columns), plus the declared meta fields."""
    return df.select(
        "sample_id",
        "modality",
        F.length("payload").cast("long").alias("n_bytes"),
        F.sha2("payload", 256).alias("payload_sha256"),
        F.col("meta.mime").alias("mime"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.duration_ms").alias("duration_ms"),
    )


def extract_features(df: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Decode + feature-extract via Arrow-batched ``mapInPandas``.

    Executor-side flow per Arrow batch (vectorized where Python must run):
    hash + length come from the bytes directly; the registered decoder maps
    payload→feature vector. Raises NotImplementedError for modalities with
    no registered decoder — the explicit stub contract.
    """
    decoders = dict(_DECODERS)  # capture at plan-build time for the closure

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = []
            for payload, modality, meta in zip(
                pdf["payload"], pdf["modality"], pdf["meta"]
            ):
                decoder = decoders.get(modality)
                if decoder is None:
                    raise NotImplementedError(
                        f"no decoder registered for modality {modality!r}; "
                        "install one with set_decoder() (image/audio codecs "
                        "are not available in this environment)"
                    )
                feats.append(
                    [float(x) for x in decoder(payload, meta or {})]
                )
            yield pd.DataFrame(
                {
                    "sample_id": pdf["sample_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "payload_sha256": [
                        hashlib.sha256(p).hexdigest() if p is not None else None
                        for p in pdf["payload"]
                    ],
                    "feature": feats,
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "sample_id string, modality string, payload binary, "
    "meta struct<mime:string, width:int, height:int, duration_ms:long>"
)

#: transform registry: modality → callable(payload, meta, (w, h)) → bytes
_RESIZERS: dict[str, Callable[[bytes, dict[str, Any], tuple[int, int]], bytes]] = {}

#: frame-sampler registry: modality →
#: callable(payload, meta, every_ms) → list[(ts_ms, frame_bytes)]
_FRAME_SAMPLERS: dict[
    str, Callable[[bytes, dict[str, Any], int], list[tuple[int, bytes]]]
] = {}


def set_resizer(
    modality: str,
    fn: Callable[[bytes, dict[str, Any], tuple[int, int]], bytes],
) -> None:
    """Install a resize codec (production: PIL/libvips wrapper; tests: a
    deterministic fake). Same stub contract as set_decoder."""
    _RESIZERS[modality] = fn


def set_frame_sampler(
    modality: str,
    fn: Callable[[bytes, dict[str, Any], int], list[tuple[int, bytes]]],
) -> None:
    """Install a frame extractor (production: ffmpeg/pyav wrapper)."""
    _FRAME_SAMPLERS[modality] = fn


def deterministic_fake_resizer():
    """Stand-in resize: truncate/strobe the byte stream to w*h bytes —
    no codec library, reproducible across executors."""

    def resize(payload: bytes, meta: dict[str, Any], size: tuple[int, int]) -> bytes:
        if payload is None:
            return b""
        w, h = size
        n = max(w * h // 64, 1)
        step = max(len(payload) // n, 1)
        return bytes(payload[::step][:n])

    return resize


def deterministic_fake_frame_sampler():
    """Stand-in frame extraction: fixed-size byte chunks as 'frames',
    timestamps derived from meta.duration_ms."""

    def sample(payload: bytes, meta: dict[str, Any], every_ms: int) -> list:
        if payload is None:
            return []
        duration = (meta or {}).get("duration_ms") or 1000
        n_frames = max(int(duration) // max(every_ms, 1), 1)
        chunk = max(len(payload) // n_frames, 1)
        return [
            (i * every_ms, bytes(payload[i * chunk : (i + 1) * chunk]))
            for i in range(n_frames)
            if payload[i * chunk : (i + 1) * chunk]
        ]

    return sample


def resize_media(
    df: DataFrame, width: int, height: int
) -> DataFrame:
    """Resize pass via Arrow-batched ``mapInPandas`` — 1:1 row shape, the
    payload column is REPLACED and the meta struct updated to the target
    dimensions. The transform itself comes from the ``set_resizer``
    registry (stub contract as :func:`extract_features`); everything
    Spark-side — schema, batch iteration, meta rewrite — is real."""
    resizers = dict(_RESIZERS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_payload = []
            out_meta = []
            for payload, modality, meta in zip(
                pdf["payload"], pdf["modality"], pdf["meta"]
            ):
                fn = resizers.get(modality)
                if fn is None:
                    raise NotImplementedError(
                        f"no resizer registered for modality {modality!r}; "
                        "install one with set_resizer()"
                    )
                out_payload.append(fn(payload, meta or {}, (width, height)))
                m = dict(meta or {})
                m["width"], m["height"] = width, height
                m.setdefault("mime", None)
                m.setdefault("duration_ms", None)
                out_meta.append(m)
            yield pd.DataFrame(
                {
                    "sample_id": pdf["sample_id"],
                    "modality": pdf["modality"],
                    "payload": out_payload,
                    "meta": out_meta,
                }
            )

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = (
    "sample_id string, frame_index int, ts_ms long, frame binary"
)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling via ``mapInPandas`` with an EXPLODING batch shape —
    one input video row yields N frame rows (the output iterator is not
    1:1 with the input, which is exactly why this is mapInPandas and not
    a scalar pandas UDF). Extractor from ``set_frame_sampler``; at scale
    the fan-out is bounded by duration/every_ms per row and frames land
    partition-local (no shuffle)."""
    samplers = dict(_FRAME_SAMPLERS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for sample_id, payload, modality, meta in zip(
                pdf["sample_id"], pdf["payload"], pdf["modality"], pdf["meta"]
            ):
                fn = samplers.get(modality)
                if fn is None:
                    raise NotImplementedError(
                        f"no frame sampler registered for modality "
                        f"{modality!r}; install one with set_frame_sampler()"
                    )
                for i, (ts, frame) in enumerate(fn(payload, meta or {}, every_ms)):
                    ids.append(sample_id)
                    idxs.append(i)
                    tss.append(ts)
                    frames.append(frame)
            if ids:
                yield pd.DataFrame(
                    {
                        "sample_id": ids,
                        "frame_index": idxs,
                        "ts_ms": tss,
                        "frame": frames,
                    }
                )

    return df.mapInPandas(run, schema=FRAMES_SCHEMA)


def synthetic_media(spark, n: int, modality: str = "image") -> DataFrame:
    """Deterministic fake media table (payload = sha-derived bytes) for
    tests and benches — same generator style as fixtures.code_files."""
    base = spark.range(0, n)
    payload = F.to_binary(
        F.sha2(F.concat(F.lit("media"), F.col("id").cast("string")), 256), F.lit("hex")
    )
    return base.select(
        F.concat(F.lit("m"), F.col("id").cast("string")).alias("sample_id"),
        F.lit(modality).alias("modality"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
            (
                F.lit(4000).cast("long")
                if modality == "video"
                else F.lit(None).cast("long")
            ).alias("duration_ms"),
        ).alias("meta"),
    )
