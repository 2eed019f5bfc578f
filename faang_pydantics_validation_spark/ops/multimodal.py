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
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )
