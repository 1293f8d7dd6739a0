"""Round-13 operator tests: the r12 ADVICE closures on the ANN index
manifest — orphan-aware legacy ``max_seq`` reconstruction, writer
conflict detection that survives POSIX rename-replace semantics, and
the GC retention window (keep-last-N versions / min-age vacuum guard).
"""

import json
import os
import tempfile

import pytest

from tests.test_round12_ops import DIM, M, _build, _emb, _queries, _serve


def test_legacy_manifest_max_seq_covers_orphan_dirs(spark):
    """r12 ADVICE (medium): a legacy (parquet-manifest) index can hold
    orphan segment DIRS whose seq exceeds every live entry's — e.g. a
    pre-JSON compact that dropped codes_seg0002 from the manifest but
    left its directory. ``max_seq`` reconstructed from live entries
    alone would re-mint the orphan's name on the next derived-name
    append and overwrite a directory a pre-compaction reader may still
    scan; the fallback must scan scheme-matching dirs on disk."""
    from supplier_performance_data_pipeline_spark.operators.clustering import (
        MANIFEST_DIR,
        SEGMENT_MANIFEST,
        _load_manifest,
        ivfpq_index_append,
    )
    from supplier_performance_data_pipeline_spark.sources.writers import (
        write_parquet,
    )
    import shutil

    with tempfile.TemporaryDirectory() as tmp:
        path = _build(spark, tmp)
        s1 = ivfpq_index_append(_emb(spark, 5, start=100), path, m=M, dim=DIM)
        s2 = ivfpq_index_append(_emb(spark, 5, start=200), path, m=M, dim=DIM)
        assert (s1, s2) == ("codes_seg0001", "codes_seg0002")
        # Reconstruct the adversarial legacy layout: parquet manifest
        # listing ONLY the base table (seg0001/seg0002 are orphan dirs
        # from a dropped era), no JSON log.
        legacy = spark.sql(
            "SELECT CAST(seq AS INT) AS seq, segment "
            "FROM (VALUES (0, 'codes')) AS t(seq, segment)"
        )
        write_parquet(legacy, os.path.join(path, SEGMENT_MANIFEST))
        shutil.rmtree(os.path.join(path, MANIFEST_DIR))
        man = _load_manifest(spark, path)
        assert man["segments"] == ["codes"]
        # live entries alone say 0; the on-disk orphans say 2.
        assert man["max_seq"] == 2
        orphan_files = sorted(os.listdir(os.path.join(path, s1)))
        s3 = ivfpq_index_append(_emb(spark, 5, start=300), path, m=M, dim=DIM)
        # The derived name must clear BOTH orphans, never resurrect one.
        assert s3 == "codes_seg0003"
        assert sorted(os.listdir(os.path.join(path, s1))) == orphan_files


def test_stale_writer_conflict_detected_before_clobber(spark):
    """r12 VERDICT #4: two writers deriving the same next version from
    one manifest snapshot — the second publish must raise (existence
    pre-check), the first's bytes must survive untouched, and no
    staging temp may be left behind."""
    from supplier_performance_data_pipeline_spark.operators.clustering import (
        MANIFEST_DIR,
        _write_segment_manifest,
    )

    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "idx")
        _write_segment_manifest(
            spark, path, ["codes"], max_seq=0, prev_version=0
        )
        with pytest.raises(RuntimeError, match="concurrent writer"):
            _write_segment_manifest(
                spark,
                path,
                ["codes", "codes_seg0001"],
                max_seq=1,
                prev_version=0,
            )
        mdir = os.path.join(path, MANIFEST_DIR)
        # ignore Hadoop LocalFS .crc sidecars; assert no stray staging
        # temp survives the refused publish
        entries = sorted(
            n for n in os.listdir(mdir) if not n.endswith(".crc")
        )
        assert entries == ["manifest-0000000001.json"]
        v1 = json.load(open(os.path.join(mdir, "manifest-0000000001.json")))
        assert v1["segments"] == ["codes"]  # first writer's commit intact


def test_lost_rename_race_detected_by_readback(spark, monkeypatch):
    """r12 ADVICE (low): Hadoop's RawLocalFileSystem rename maps to
    POSIX rename(2), which silently REPLACES an existing destination —
    the rename return value cannot detect a lost race. Simulate the
    loser's view (existence pre-check blind, rename claims success but
    another writer's bytes occupy the version): the post-rename
    read-back must raise instead of reporting a commit that never
    landed."""
    from supplier_performance_data_pipeline_spark.operators import clustering

    real = clustering._hadoop_fs

    class LostRenameFS:
        def __init__(self, fs):
            self._fs = fs

        def exists(self, p):  # S3-ish: the pre-check sees nothing
            return False

        def rename(self, src, dst):  # claims success, moves nothing
            return True

        def __getattr__(self, name):
            return getattr(self._fs, name)

    def fake(spark_, p):
        fs, jp, jvm = real(spark_, p)
        if p.endswith(".json") and not p.endswith(".tmp"):
            return LostRenameFS(fs), jp, jvm
        return fs, jp, jvm

    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "idx")
        mdir = os.path.join(path, clustering.MANIFEST_DIR)
        os.makedirs(mdir)
        other = {"version": 1, "max_seq": 9, "segments": ["codes_g0009"]}
        with open(os.path.join(mdir, "manifest-0000000001.json"), "w") as f:
            json.dump(other, f)
        monkeypatch.setattr(clustering, "_hadoop_fs", fake)
        with pytest.raises(RuntimeError, match="lost-update"):
            clustering._write_segment_manifest(
                spark, path, ["codes"], max_seq=0, prev_version=0
            )
        # The racing winner's manifest is untouched.
        landed = json.load(
            open(os.path.join(mdir, "manifest-0000000001.json"))
        )
        assert landed == other


def test_gc_retention_window_keeps_prior_versions(spark):
    """r12 ADVICE (low): ``keep_versions=N`` protects a reader holding
    a manifest up to N-1 versions stale — every retained version's
    segment dirs survive GC and serving from that stale view still
    works; dropping to the default then reclaims everything outside
    the latest version."""
    from supplier_performance_data_pipeline_spark.operators.clustering import (
        MANIFEST_DIR,
        ivfpq_index_append,
        ivfpq_index_compact,
        ivfpq_index_gc,
    )

    with tempfile.TemporaryDirectory() as tmp:
        path = _build(spark, tmp)                      # v1: [codes]
        s1 = ivfpq_index_append(                       # v2: [codes, s1]
            _emb(spark, 5, start=100), path, m=M, dim=DIM
        )
        gen = ivfpq_index_compact(spark, path)         # v3: [gen]
        q = _queries(spark)
        stale_view = _serve(spark, path, q, segments=("codes", s1))
        deleted = ivfpq_index_gc(spark, path, keep_versions=2)
        # v2's segments are retained, so no code dir may be reclaimed;
        # only the v1 manifest file falls outside the window.
        assert deleted == [f"{MANIFEST_DIR}/manifest-0000000001.json"]
        for seg in ("codes", s1, gen):
            assert os.path.isdir(os.path.join(path, seg))
        # a reader holding v2 (one version stale) still serves
        assert _serve(spark, path, q, segments=("codes", s1)) == stale_view
        # default vacuum then reclaims everything outside v3
        deleted2 = ivfpq_index_gc(spark, path)
        assert set(deleted2) == {
            "codes",
            s1,
            f"{MANIFEST_DIR}/manifest-0000000002.json",
        }
        assert set(os.listdir(path)) == {
            gen,
            "coarse_centroids",
            "pq_centroids",
            MANIFEST_DIR,
        }


def test_gc_min_age_retains_fresh_files(spark):
    """r12 ADVICE (low): a min-age floor turns GC into a bounded
    vacuum — nothing younger than the window is reclaimed, so
    in-flight scans of freshly superseded generations survive."""
    from supplier_performance_data_pipeline_spark.operators.clustering import (
        ivfpq_index_append,
        ivfpq_index_compact,
        ivfpq_index_gc,
    )

    with tempfile.TemporaryDirectory() as tmp:
        path = _build(spark, tmp)
        ivfpq_index_append(_emb(spark, 5, start=100), path, m=M, dim=DIM)
        ivfpq_index_compact(spark, path)
        before = sorted(os.listdir(path))
        assert ivfpq_index_gc(spark, path, min_age_sec=3600.0) == []
        assert sorted(os.listdir(path)) == before
        # and the age floor composes with the version window
        assert (
            ivfpq_index_gc(
                spark, path, keep_versions=2, min_age_sec=3600.0
            )
            == []
        )
