"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extraction runs as ``mapInPandas`` over
Arrow batches. The actual codecs are NOT available in this environment, so
the decode kernel is stubbed behind ``decoder=`` — the default
deterministic fake keeps the Spark-side plumbing (schema, batching,
partitioning, UDF signatures) fully real and testable, and a real decoder
(PIL/libsndfile/ffmpeg) drops in without touching the plan.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def fake_decode(payload: bytes, kind: str, dim: int = 64) -> np.ndarray:
    """Deterministic stand-in for a real decoder: hash-seeded feature vector.

    A real implementation decodes pixels/samples and pools them; codecs are
    not installed here, so this derives a stable unit vector from the bytes.
    """
    if payload is None or len(payload) == 0:
        return np.zeros(dim, dtype=np.float32)
    digest = hashlib.blake2b(payload, digest_size=8, person=kind.encode()[:16]).digest()
    rng = np.random.RandomState(int.from_bytes(digest[:4], "little"))
    v = rng.standard_normal(dim).astype(np.float32)
    return v / np.linalg.norm(v)


def real_decode(payload: bytes, kind: str, dim: int = 64) -> np.ndarray:
    """Real decoder entry point — requires PIL / soundfile / av, absent here."""
    raise NotImplementedError(
        "media codecs are not installed in this environment; "
        "pass decoder=fake_decode (default) or provide your own"
    )


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], np.ndarray] = fake_decode,
    dim: int = 64,
) -> DataFrame:
    """Binary payloads → pooled feature vectors, one Arrow batch at a time.

    The per-batch loop is over *payloads* (unavoidable for codec calls);
    everything around it — batching, schema, shuffle-free map — is the
    production plan shape.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(p, k, dim).tolist() for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(gen, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts) to decode.

    Pure column math over the metadata (no payload touched): the fan-out
    that a distributed frame extractor consumes. Decode itself is the
    stubbed kernel above.
    """
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (binary payloads + metadata)."""
    rng = np.random.RandomState(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(int(rng.randint(64, 2048)))
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                (
                    {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                    int(rng.randint(16, 512)) if kind == "image" else None,
                    int(rng.randint(16, 512)) if kind == "image" else None,
                    int(rng.randint(500, 10_000)) if kind != "image" else None,
                ),
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
