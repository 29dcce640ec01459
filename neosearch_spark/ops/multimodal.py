"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

Decode support has two tiers:

- REAL decoders for uncompressed container formats, implemented in
  pure numpy (no image/audio libraries needed): P6 PPM images
  (``decode_ppm``) and PCM16 WAV audio (``decode_wav``), with
  matching encoders for deterministic synthesis and round-trip
  tests.  ``real_decoder`` sniffs the payload magic (``P6`` /
  ``RIFF``) and extracts genuine features (channel stats + luma
  histogram for images; RMS, zero-crossing rate, spectral band
  energies for audio).
- Compressed formats (JPEG/MP3/H.264 …) need codec libraries that
  are not in this container — the ``decoder=`` seam of
  ``extract_features`` accepts any ``(payload, dim) -> ndarray``
  callable (e.g. PIL/ffmpeg-backed), serialized into the task
  closure like any pandas-UDF dependency.  ``_fake_decode`` remains
  the default for opaque payloads so plumbing tests never depend on
  payload format.
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


# ---------------- real decoders (pure numpy, uncompressed formats) ----


def encode_ppm(img: np.ndarray) -> bytes:
    """uint8 HxWx3 array → binary P6 PPM bytes."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary P6 PPM → uint8 HxWx3 array.  Real parse: magic check,
    whitespace/comment-tolerant header scan, raw pixel frombuffer."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            pos = payload.index(b"\n", pos) + 1
            continue
        end = pos
        # EOF-bounded: b''.isspace() is False, so an unbounded scan
        # would spin forever on a truncated header
        while end < len(payload) and not payload[end : end + 1].isspace():
            end += 1
        if end == pos:
            raise ValueError("truncated PPM header")
        fields.append(int(payload[pos:end]))
        pos = end
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    pos += 1  # single whitespace after maxval
    pix = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return pix.reshape(h, w, 3)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono samples → RIFF/WAVE PCM16 bytes."""
    import struct

    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM16 → (sample_rate, int16 sample array).  Real
    parse: chunk walk (tolerates extra chunks), PCM16-mono check."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            afmt, ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", body)
            if (afmt, ch, bits) != (1, 1, 16):
                raise ValueError("only PCM16 mono supported")
        elif cid == b"data":
            data = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return rate, data


def image_features(img: np.ndarray, dim: int) -> np.ndarray:
    """Genuine image features: per-channel mean/std (6) + a luma
    histogram filling the remaining dim-6 bins; all vectorized."""
    f = img.reshape(-1, 3).astype(np.float64)
    stats = np.concatenate([f.mean(axis=0), f.std(axis=0)])
    luma = f @ np.array([0.299, 0.587, 0.114])
    hist, _ = np.histogram(luma, bins=max(1, dim - 6), range=(0.0, 255.0))
    out = np.concatenate([stats, hist / max(1, luma.size)])
    return out[:dim] if out.size >= dim else np.pad(out, (0, dim - out.size))


def audio_features(rate: int, samples: np.ndarray, dim: int) -> np.ndarray:
    """Genuine audio features: duration, RMS, zero-crossing rate,
    peak (4) + FFT band energies filling the remaining bins."""
    x = samples.astype(np.float64) / 32768.0
    n = max(1, x.size)
    zcr = float(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1]))) / n
    head = np.array(
        [n / rate, float(np.sqrt(np.mean(x**2))), zcr, float(np.abs(x).max(initial=0.0))]
    )
    spec = np.abs(np.fft.rfft(x)) ** 2
    n_bands = max(1, dim - 4)
    bands = np.array_split(spec, n_bands)
    energy = np.array([float(b.sum()) for b in bands])
    tot = energy.sum()
    out = np.concatenate([head, energy / tot if tot > 0 else energy])
    return out[:dim] if out.size >= dim else np.pad(out, (0, dim - out.size))


def real_decoder(payload: bytes, dim: int) -> np.ndarray:
    """Magic-sniffing decoder for the in-container real formats:
    P6 PPM → image features, RIFF/WAVE → audio features.  Anything
    else raises — compressed formats need an injected codec-backed
    decoder (see module docstring)."""
    if payload is None:
        raise ValueError("null payload")
    if payload.startswith(b"P6"):
        return image_features(decode_ppm(payload), dim)
    if payload.startswith(b"RIFF"):
        return audio_features(*decode_wav(payload), dim)
    raise ValueError(
        "unrecognized payload magic — inject a codec-backed decoder "
        "for compressed formats"
    )


def synth_decodable_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic media table with REAL decodable payloads:
    even media_id → P6 PPM gradient images, odd → PCM16 WAV sine
    tones.  Payloads are generated inside mapInPandas (distributed,
    numpy per batch) so no driver-side byte blobs at scale."""
    base = spark.range(0, n, 1, max(4, spark.sparkContext.defaultParallelism))

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                if mid % 2 == 0:  # image: seeded gradient + stripe
                    w, h = 32 + (mid % 4) * 8, 24 + (mid % 3) * 8
                    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
                    img = np.stack(
                        [
                            (xx * (seed % 7 + 1) + mid) % 256,
                            (yy * 3 + mid) % 256,
                            ((xx + yy) * 2 + seed) % 256,
                        ],
                        axis=-1,
                    ).astype(np.uint8)
                    rows.append(
                        (mid, "image", "image/x-portable-pixmap", w, h,
                         None, encode_ppm(img))
                    )
                else:  # audio: 50ms sine, frequency varies per id
                    rate = 16000
                    t = np.arange(int(rate * 0.05))
                    freq = 200.0 + (mid % 40) * 50.0
                    s = (
                        np.sin(2 * np.pi * freq * t / rate) * 0.5 * 32767
                    ).astype(np.int16)
                    rows.append(
                        (mid, "audio", "audio/wav", None, None,
                         int(1000 * s.size / rate), encode_wav(s, rate))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "mime", "width", "height",
                    "duration_ms", "payload",
                ],
            )

    return base.mapInPandas(
        gen,
        schema="media_id long, kind string, mime string, width int, "
        "height int, duration_ms long, payload binary",
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
