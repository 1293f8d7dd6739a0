"""Round-11 operator tests: the ANN segment manifest + compaction
(r10 VERDICT #3 / the r10 ADVICE append data-loss class), and the
quantile_blocks reliable-mode unpersist handle (r10 ADVICE)."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

DIM = 8
M = 2


def _emb(spark, n, start=0, shift=0.0):
    rows = [
        (
            start + i,
            [float((i * 7 + d * 3) % 13) + shift for d in range(DIM)],
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _build(spark, tmp, n=60):
    from supplier_performance_data_pipeline_spark.operators.clustering import (
        ivfpq_index_write,
    )

    path = os.path.join(tmp, "idx")
    ivfpq_index_write(
        _emb(spark, n),
        path,
        sample_mod=10,
        sample_thr=10,  # all rows train: tiny fixture
        m=M,
        k_pq=4,
        k_coarse=2,
        iters=1,
        dim=DIM,
    )
    return path


def _serve(spark, path, queries, segments=None):
    from supplier_performance_data_pipeline_spark.operators.clustering import (
        ivfpq_adc_from_index,
    )

    df = ivfpq_adc_from_index(
        spark, path, queries, topk=3, m=M, dim=DIM, segments=segments
    )
    return sorted(
        (r.query_id, r.rank, r.neighbor_id, r.adc_dist) for r in df.collect()
    )


def test_append_auto_names_unique_segments_and_manifest_serves_all(spark):
    """r10 ADVICE (medium): two appends with the default segment name
    used to silently overwrite each other. Now each append derives a
    fresh manifest-tracked name, and manifest-default serving sees
    every appended vector without the caller enumerating segments."""
    from supplier_performance_data_pipeline_spark.operators.clustering import (
        _read_segment_manifest,
        ivfpq_index_append,
    )

    with tempfile.TemporaryDirectory() as tmp:
        path = _build(spark, tmp)
        s1 = ivfpq_index_append(
            _emb(spark, 5, start=100), path, m=M, dim=DIM
        )
        s2 = ivfpq_index_append(
            _emb(spark, 5, start=200), path, m=M, dim=DIM
        )
        assert s1 != s2
        assert _read_segment_manifest(spark, path) == ["codes", s1, s2]
        q = _emb(spark, 1).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("v")
        )
        served_ids = {t[2] for t in _serve(spark, path, q)}
        # Explicit single-segment serving of each append proves both
        # batches' codes exist on disk independently (no overwrite).
        ids1 = {t[2] for t in _serve(spark, path, q, segments=(s1,))}
        ids2 = {t[2] for t in _serve(spark, path, q, segments=(s2,))}
        assert ids1 and all(100 <= i < 105 for i in ids1)
        assert ids2 and all(200 <= i < 205 for i in ids2)
        # Manifest-default serving ranks over the full union.
        full = _serve(
            spark, path, q, segments=("codes", s1, s2)
        )
        assert _serve(spark, path, q) == full
        assert served_ids  # non-empty


def test_append_refuses_explicit_duplicate_segment(spark):
    from supplier_performance_data_pipeline_spark.operators.clustering import (
        ivfpq_index_append,
    )

    with tempfile.TemporaryDirectory() as tmp:
        path = _build(spark, tmp)
        ivfpq_index_append(
            _emb(spark, 5, start=100), path, m=M, dim=DIM, segment="seg_a"
        )
        with pytest.raises(ValueError, match="already exists"):
            ivfpq_index_append(
                _emb(spark, 5, start=200), path, m=M, dim=DIM,
                segment="seg_a",
            )


def test_compaction_serves_bit_equal_and_flips_manifest(spark):
    """r10 VERDICT #3: compaction rewrites segments into one
    generation; codes unchanged => serving bit-equal to the segment
    union, manifest flips to the single generation."""
    from supplier_performance_data_pipeline_spark.operators.clustering import (
        _read_segment_manifest,
        ivfpq_index_append,
        ivfpq_index_compact,
    )

    with tempfile.TemporaryDirectory() as tmp:
        path = _build(spark, tmp)
        ivfpq_index_append(_emb(spark, 7, start=100), path, m=M, dim=DIM)
        ivfpq_index_append(_emb(spark, 7, start=200), path, m=M, dim=DIM)
        q = _emb(spark, 2).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("v")
        )
        before = _serve(spark, path, q)
        gen = ivfpq_index_compact(spark, path)
        assert _read_segment_manifest(spark, path) == [gen]
        assert _serve(spark, path, q) == before
        # idempotent: single-segment index compacts to itself
        assert ivfpq_index_compact(spark, path) == gen


def test_png_palette_roundtrip_and_traps():
    """Palette (type 3) decode: encode indices+PLTE with all five
    filters at bpp=1, decode, compare against direct palette lookup;
    missing PLTE and out-of-range indices fail loudly."""
    import numpy as np

    from supplier_performance_data_pipeline_spark.operators import (
        multimodal as m,
    )

    rng_idx = (np.arange(7 * 16, dtype=np.int64) * 29 + 3) % 250
    idx = rng_idx.reshape(7, 16).astype(np.uint8)  # h=7: all 5 filters
    pal = (
        (np.arange(256)[:, None] * 11 + np.arange(3)[None, :] * 59 + 5) % 256
    ).astype(np.uint8)
    png = m.encode_png_palette(idx, pal)
    got = m.decode_png(png)
    assert got.shape == (7, 16, 3)
    assert (got == pal[idx]).all()
    # grayscale/truecolor paths unaffected
    rgb = ((np.arange(6 * 16 * 3) * 7) % 256).astype(np.uint8).reshape(6, 16, 3)
    assert (m.decode_png(m.encode_png(rgb)) == rgb).all()
    # out-of-range index fails loudly
    small_pal = pal[:100]
    bad = m.encode_png_palette(idx, small_pal)  # idx has values >= 100
    with pytest.raises(ValueError, match="palette index"):
        m.decode_png(bad)
    # missing PLTE fails loudly: strip the PLTE chunk
    import struct

    pos, out = 8, bytearray(png[:8])
    while pos < len(png):
        (ln,) = struct.unpack(">I", png[pos : pos + 4])
        ctype = png[pos + 4 : pos + 8]
        if ctype != b"PLTE":
            out += png[pos : pos + 12 + ln]
        pos += 12 + ln
    with pytest.raises(ValueError, match="missing PLTE"):
        m.decode_png(bytes(out))


def test_png_graya_roundtrip_bpp2():
    """Gray+alpha (type 4): encode two closed-form planes with all
    five filters at bpp=2, decode, expect the luma replicated to RGB
    and the alpha dropped. The alpha plane differs from luma, so a
    bpp=1 unfilter (predicting luma from the previous alpha byte)
    would corrupt every Sub/Average/Paeth scanline."""
    import numpy as np

    from supplier_performance_data_pipeline_spark.operators import (
        multimodal as m,
    )

    h, w = 7, 16  # h >= 5: all five filters
    j = np.arange(h * w, dtype=np.int64)
    g = ((j * 37 + 11) % 256).astype(np.uint8).reshape(h, w)
    a = ((j * 101 + 5) % 256).astype(np.uint8).reshape(h, w)
    got = m.decode_png(m.encode_png_graya(g, a))
    assert got.shape == (h, w, 3)
    assert (got == np.repeat(g[:, :, None], 3, axis=2)).all()
    with pytest.raises(ValueError):
        m.encode_png_graya(g, a[:-1])  # mismatched planes


def test_quantile_blocks_reliable_release_handle_unpersists(spark):
    """r10 ADVICE (low): reliable=True persists DISK_ONLY and could
    never unpersist (the cache must outlive downstream consumers) —
    the release handle lets the caller drop the entry after the
    action, leaving the cache manager clean."""
    from supplier_performance_data_pipeline_spark.operators.ranking import (
        blocked_row_number,
        quantile_blocks,
    )

    # Track the SPECIFIC RDD ids this test adds, not the global count:
    # localCheckpointed RDDs from earlier tests in the session are
    # unpersisted ASYNCHRONOUSLY by the ContextCleaner, so a count
    # snapshot races with cleanups landing mid-test (observed flaky in
    # full-suite order). Set-difference on ids is immune — nothing
    # else ADDS entries while this test runs single-threaded.
    jjsc = spark.sparkContext._jsc

    def _ids():
        return {int(k) for k in jjsc.getPersistentRDDs().keySet().toArray()}

    base_ids = _ids()
    rows = [(i, float((i * 31) % 59)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, v double")
    handles = []
    ranked = blocked_row_number(
        quantile_blocks(
            df, "v", desc=True, num_blocks=8, reliable=True,
            release=handles,
        ),
        [F.desc("v"), F.asc("id")],
    )
    n = ranked.count()
    assert n == 300
    assert len(handles) == 1
    added = _ids() - base_ids
    assert len(added) == 1
    for h in handles:
        h.unpersist(blocking=True)
    assert not (added & _ids())
    # localCheckpoint mode never appends
    handles2 = []
    quantile_blocks(df, "v", num_blocks=8, release=handles2).count()
    assert handles2 == []
