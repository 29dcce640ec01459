"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode step is STUBBED (image/audio libraries are not in this
container): ``decode_image_stub`` produces a deterministic fake
"feature vector" from the bytes so the Spark-side plumbing — schema,
partition sizing, mapInPandas batch shape, metadata propagation — is
real and tested.  Swapping in a real decoder is a one-function
change (see ``REAL_DECODER_NOTE``).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

REAL_DECODER_NOTE = (
    "Replace _fake_decode with e.g. PIL.Image.open(io.BytesIO(b)) + "
    "resize + np.asarray; the mapInPandas signature, schema and "
    "batch handling stay identical."
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def synth_media(spark, n: int, seed: int = 42, payload_bytes: int = 256) -> DataFrame:
    """Deterministic fake media table (binary payload = seeded bytes)."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    base = spark.range(0, n, 1, max(4, spark.sparkContext.defaultParallelism))
    kind = F.element_at(kinds, F.pmod(F.col("id"), F.lit(3)).cast("int") + 1)
    payload = F.repeat(
        F.unbase64(F.base64(F.encode(F.concat(F.lit(f"seed{seed}:"), F.col("id").cast("string")), "utf-8"))),
        payload_bytes // 8 + 1,
    )
    return base.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        F.concat(F.lit("x/"), kind).alias("mime"),
        (F.pmod(F.col("id"), F.lit(64)) * 16 + 64).cast("int").alias("width"),
        (F.pmod(F.col("id"), F.lit(48)) * 16 + 64).cast("int").alias("height"),
        (F.pmod(F.col("id"), F.lit(1000)) * 40).cast("long").alias("duration_ms"),
        payload.cast("binary").alias("payload"),
    )


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: derive a feature
    vector from an md5-seeded RNG over the payload bytes."""
    if payload is None:
        raise NotImplementedError(
            "real decode unavailable in this container; " + REAL_DECODER_NOTE
        )
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim)


def extract_features(media: DataFrame, dim: int = 32, decoder=None) -> DataFrame:
    """mapInPandas feature extraction: batches of binary payloads →
    float feature arrays; metadata columns ride along untouched.

    ``decoder``: an INJECTABLE ``(payload_bytes, dim) -> np.ndarray``
    callable — a real implementation (PIL/ffmpeg) drops in without
    touching the engine (it is serialized into the task closure like
    any pandas-UDF dependency; see REAL_DECODER_NOTE).  Defaults to
    the deterministic stub because image/audio libraries are not in
    this container.

    At scale: binary payloads dominate partition size — pair this
    with ``spark.sql.files.maxPartitionBytes`` tuned to ~128 MB and
    avoid wide shuffles after decode (project features, drop
    payload as early as possible — done here)."""
    decode = decoder or _fake_decode

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                np.asarray(decode(p, dim), dtype=np.float64)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": [f.tolist() for f in feats],
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema="media_id long, kind string, feature array<double>"
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explode frame timestamps from
    duration metadata (the real frame grab would decode at these
    offsets).  Pure built-in sequence/explode."""
    frames = F.sequence(
        F.lit(0).cast("long"),
        F.greatest(F.col("duration_ms") - 1, F.lit(0).cast("long")),
        F.lit(every_ms).cast("long"),
    )
    return (
        media.where(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_ts_ms"))
    )
