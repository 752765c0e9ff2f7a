"""Stage-cache policy: all three modes must produce identical results.

The knob exists for cluster fault tolerance (caching.py module docstring);
it must never change semantics. Exercises the two structurally different
consumers: a multi-branch LSH dedup (signatures referenced 4x) and the
iterative connected-components loop (eager round-boundary materialization).
"""

from __future__ import annotations

import pytest

from sat_bucket_spark.caching import (
    STAGE_CACHE_MODES,
    get_stage_cache_mode,
    set_stage_cache_mode,
    stage_cache,
    stage_cache_mode,
)


def _docs(spark):
    rows = [
        (i, f"the quick brown fox jumps over dog number {i % 7} again and again")
        for i in range(60)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs_result(spark):
    from sat_bucket_spark.operators.dedup import minhash_lsh_dedup_pairs

    return sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in minhash_lsh_dedup_pairs(
            _docs(spark), n_hashes=8, n_bands=4, min_jaccard=0.5
        ).collect()
    )


def _components_result(spark):
    from sat_bucket_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 40, 2)] + [(1, 2), (5, 6), (100, 100)],
        "src long, dst long",
    )
    cc = connected_components(edges, driver_threshold=0)  # force distributed
    return sorted((r["node"], r["component"]) for r in cc.collect())


class TestModesAgree:
    def test_lsh_dedup_identical_across_modes(self, spark, tmp_path):
        spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
        baseline = None
        for mode in STAGE_CACHE_MODES:
            with stage_cache_mode(mode):
                got = _pairs_result(spark)
            if baseline is None:
                baseline = got
                assert baseline  # non-vacuous: the fixture has near-dups
            else:
                assert got == baseline, mode

    def test_connected_components_identical_across_modes(self, spark, tmp_path):
        spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
        baseline = None
        for mode in STAGE_CACHE_MODES:
            with stage_cache_mode(mode):
                got = _components_result(spark)
            if baseline is None:
                baseline = got
                assert len({c for _, c in baseline}) > 1
            else:
                assert got == baseline, mode


class TestKnob:
    def test_default_and_validation(self):
        assert get_stage_cache_mode() == "local_checkpoint"
        with pytest.raises(ValueError, match="stage-cache mode"):
            set_stage_cache_mode("nope")
        with stage_cache_mode("persist"):
            assert get_stage_cache_mode() == "persist"
        assert get_stage_cache_mode() == "local_checkpoint"

    def test_reliable_requires_checkpoint_dir(self, spark):
        # a fresh session scope may or may not carry a dir from other tests;
        # only assert the error path when none is set
        if spark.sparkContext.getCheckpointDir() is not None:
            pytest.skip("checkpoint dir already set in this shared session")
        df = spark.range(5)
        with stage_cache_mode("reliable_checkpoint"):
            with pytest.raises(RuntimeError, match="checkpoint directory"):
                stage_cache(df)

    def test_persist_eager_materializes(self, spark):
        with stage_cache_mode("persist"):
            out = stage_cache(spark.range(10), eager=True)
            assert out.storageLevel.useMemory
            assert out.count() == 10
            out.unpersist()


class TestRoundRelease:
    """release_stage_cache must actually free round-frame storage (it is
    invisible to the cache manager) and leave the loops correct."""

    def test_local_checkpoint_blocks_freed(self, spark):
        from sat_bucket_spark.caching import release_stage_cache, round_cache

        jsc = spark.sparkContext._jsc.sc()

        def cached_ids():
            return {i.id() for i in jsc.getRDDStorageInfo()}

        before = cached_ids()
        rc = round_cache(spark.range(10_000).selectExpr("id", "id * 2 as y"))
        held = cached_ids() - before
        assert held, "round_cache should hold executor blocks"
        # non-destructive default must be a safe no-op on a lineage-less frame
        release_stage_cache(rc)
        assert cached_ids() & held, "default call must NOT free checkpoint blocks"
        assert rc.count() == 10_000
        release_stage_cache(rc, destructive=True)
        assert not (cached_ids() & held), "destructive release must free the blocks"

    def test_reliable_checkpoint_files_deleted(self, spark, tmp_path):
        from sat_bucket_spark.caching import (
            release_stage_cache,
            round_cache,
            stage_cache_mode,
        )

        ckpt = tmp_path / "ckpt_release"
        spark.sparkContext.setCheckpointDir(str(ckpt))
        with stage_cache_mode("reliable_checkpoint"):
            rc = round_cache(spark.range(1000).selectExpr("id"))
        files_before = [p for p in ckpt.rglob("*") if p.is_file()]
        assert files_before, "checkpoint should have written files"
        # non-destructive default must leave the checkpoint files intact
        release_stage_cache(rc)
        assert [p for p in ckpt.rglob("*") if p.is_file()], (
            "default call must NOT delete checkpoint files"
        )
        assert rc.count() == 1000
        release_stage_cache(rc, destructive=True)
        assert not [p for p in ckpt.rglob("*") if p.is_file()], (
            "destructive release must delete the round's checkpoint files"
        )

    def test_persist_mode_loop_releases_rounds(self, spark, tmp_path):
        # persist mode + checkpoint dir => round_cache writes one reliable
        # checkpoint per round; the loop must clean all but the last round
        from sat_bucket_spark.caching import stage_cache_mode
        from sat_bucket_spark.operators.graph import pagerank

        ckpt = tmp_path / "ckpt_loop"
        spark.sparkContext.setCheckpointDir(str(ckpt))
        edges = spark.createDataFrame(
            [(i, (i + 1) % 8) for i in range(8)], "src long, dst long"
        )
        with stage_cache_mode("persist"):
            # driver_threshold=0: the round-release contract under test
            # only exists on the distributed loop
            ranks = pagerank(edges, iterations=5, directed=True, driver_threshold=0)
            got = {r["node"]: r["rank"] for r in ranks.collect()}
        # ring graph: uniform stationary distribution
        assert all(abs(v - 1 / 8) < 1e-9 for v in got.values())
        round_dirs = {p.parent for p in ckpt.rglob("*") if p.is_file()}
        # r10: the loop releases its loop-invariant frames (edges, base)
        # on exit too — only the ONE live final round may remain
        assert len(round_dirs) <= 1, sorted(round_dirs)
