"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Extension surface (BASELINE.json north star). Images/audio/video are
``binary`` columns with a typed metadata struct; decode / feature
extraction run as Arrow-batched functions over ``mapInPandas`` so the
payload never round-trips through Python row-by-row.

The actual codec step is STUBBED (image/audio libraries are not in this
container): ``decode_stub=True`` produces deterministic fake features
from the payload bytes so the Spark-side plumbing — schema, batch
iteration, partitioning — is real and tested; ``decode_stub=False``
raises NotImplementedError where a codec (Pillow/ffmpeg) would plug in.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, mime string, n_bytes long, checksum string, "
    "feat_mean double, feat_max double"
)


def _fake_features(payload: bytes) -> tuple[float, float]:
    """Deterministic stand-in for a real decode: byte-level statistics."""
    if not payload:
        return 0.0, 0.0
    vals = list(payload[:4096])
    return sum(vals) / len(vals), float(max(vals))


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Per-payload feature extraction via mapInPandas (Arrow batches).

    Partitioning note: payloads are large — repartition upstream by
    media_id so batches stay balanced and one huge file can't skew a
    task; the batch iterator keeps peak memory at one Arrow batch.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real codec path requires image/audio libraries "
                    "(Pillow/ffmpeg) not present in this container"
                )
            import hashlib

            feats = pdf["payload"].map(
                lambda p: _fake_features(bytes(p) if p is not None else b"")
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "checksum": pdf["payload"].map(
                        lambda p: hashlib.md5(
                            bytes(p) if p is not None else b""
                        ).hexdigest()
                    ),
                    "feat_mean": feats.map(lambda t: t[0]),
                    "feat_max": feats.map(lambda t: t[1]),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Deterministic sampling of media rows (every_n-th id) — the cheap
    pre-filter before expensive decode at scale; pure JVM-side filter."""
    return media.filter(F.col("media_id") % every_n == 0)


RESIZED_SCHEMA = (
    "media_id long, mime string, width int, height int, payload binary"
)


def resize_media(
    media: DataFrame, target_w: int, target_h: int, decode_stub: bool = True
) -> DataFrame:
    """Binary-in → binary-out resize through Arrow batches: the shape a
    real decode-resize-reencode pipeline has (payload never crosses into
    Python per row, metadata updated alongside the bytes).

    Stubbed codec: the fake 'resized' payload is a deterministic
    size-proportional prefix of the original (target pixels / source
    pixels of the bytes), so output sizes scale the way a real resize
    would and tests can assert on them; ``decode_stub=False`` raises
    where Pillow/ffmpeg would plug in.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real resize requires image/audio libraries "
                    "(Pillow/ffmpeg) not present in this container"
                )

            def fake_resize(row):
                p = bytes(row["payload"]) if row["payload"] is not None else b""
                src_px = max((row["width"] or 1) * (row["height"] or 1), 1)
                keep = max(1, int(len(p) * min(1.0, (target_w * target_h) / src_px)))
                return p[:keep]

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "width": target_w,
                    "height": target_h,
                    "payload": pdf.apply(fake_resize, axis=1),
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


ENTROPY_SCHEMA = "media_id long, n_bytes long, entropy double"
# Per-byte-value terms round to 12dp before the exact sum; the entropy
# rounds to 6dp at the edge — the cross-engine determinism contract
# (math.fsum of 12dp-rounded terms == CAST(SUM(DECIMAL(18,12)) AS
# DOUBLE): both are the correctly-rounded double of the same exact sum).
ENTROPY_TERM_SCALE = 12
ENTROPY_SCALE = 6


def byte_entropy(media: DataFrame) -> DataFrame:
    """Shannon entropy of each payload's byte distribution (bits-free,
    natural log) — the classic media sniff: ~ln(256) means compressed/
    encrypted, low values mean padding or degenerate content; a sudden
    corpus-wide shift flags upstream corruption before any decode runs.

    This is the REAL Arrow path, not a stub: payloads stream through
    mapInPandas one batch at a time, the histogram is a vectorized
    numpy bincount per payload, and only (id, n_bytes, entropy) leaves
    Python — the per-byte expansion that would explode a SQL-side
    explode-and-group (payload_bytes × rows) never materializes.

    Determinism: per-value terms p·ln(p) round to 12dp and sum via
    math.fsum in ascending byte order; an engine summing the same
    rounded terms exactly (DECIMAL) lands on the identical double.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        import numpy as np

        def ent(p) -> tuple[int, float]:
            b = bytes(p) if p is not None else b""
            n = len(b)
            if n == 0:
                return 0, 0.0
            counts = np.bincount(np.frombuffer(b, dtype=np.uint8))
            terms = [
                round(c / n * math.log(c / n), ENTROPY_TERM_SCALE)
                for c in counts[counts > 0].tolist()
            ]
            return n, round(-math.fsum(terms), ENTROPY_SCALE)

        for pdf in batches:
            pairs = pdf["payload"].map(ent)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pairs.map(lambda t: t[0]),
                    "entropy": pairs.map(lambda t: t[1]),
                }
            )

    return media.mapInPandas(run, schema=ENTROPY_SCHEMA)
