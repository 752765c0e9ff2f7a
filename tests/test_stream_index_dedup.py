"""stream_dedup_against_indexes: continuous dedup against the STANDING
archive via the persisted Bloom + MinHash indexes — the piece
streaming_curate's watermark-bounded state explicitly defers. With
learn=True the gate appends each batch's survivors back, so a duplicate
arriving in a LATER micro-batch is dropped by the standing state."""

import os

from pyspark.sql import functions as F


def _long(tag: str) -> str:
    """A long text whose every shingle contains the tag, so texts with
    different tags share (essentially) no shingles — distinct docs are
    genuinely distinct under MinHash, while a suffix edit stays a
    near-dup (~0.95 Jaccard)."""
    return f"{tag} " + " ".join(f"{tag}{i}" for i in range(20))


def _mk_batches(spark, tmp_path, batches):
    """One file per batch, mtimes staggered so the file source processes
    them as ordered micro-batches (maxFilesPerTrigger=1)."""
    d = str(tmp_path / "stream_src")
    os.makedirs(d, exist_ok=True)
    for i, rows in enumerate(batches):
        sub = str(tmp_path / f"b{i}")
        spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(sub)
        src = [f for f in os.listdir(sub) if f.endswith(".parquet")][0]
        os.rename(os.path.join(sub, src), os.path.join(d, f"{i:03d}.parquet"))
        os.utime(os.path.join(d, f"{i:03d}.parquet"), (1e9 + i * 100, 1e9 + i * 100))
    return d


class TestStreamDedupAgainstIndexes:
    def _indexes(self, spark, tmp_path):
        from sat_bucket_spark.operators.dedup import (
            build_bloom_index,
            build_minhash_index,
        )

        corpus = spark.createDataFrame(
            [(i, _long(f"corpus{i}")) for i in range(20)], ["doc_id", "text"]
        )
        bidx = str(tmp_path / "bloom_idx")
        midx = str(tmp_path / "mh_idx")
        build_bloom_index(corpus, bidx, ["text"])
        build_minhash_index(corpus, midx, n_hashes=8, n_bands=4, shingle_size=8)
        return bidx, midx

    def _run(self, spark, tmp_path, batches, learn):
        from sat_bucket_spark.streaming.curation import (
            stream_dedup_against_indexes,
        )

        bidx, midx = self._indexes(spark, tmp_path)
        src = _mk_batches(spark, tmp_path, batches)
        sink = str(tmp_path / f"sink_{learn}")
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream_dedup_against_indexes(
            stream,
            sink,
            str(tmp_path / f"ckpt_{learn}"),
            bloom_index_dir=bidx,
            minhash_index_dir=midx,
            min_jaccard=0.5,
            learn=learn,
            trigger={"availableNow": True},
        )
        q.awaitTermination(300)
        return {
            r["doc_id"]
            for r in spark.read.option("basePath", sink)
            .parquet(f"{sink}/batch=*")
            .collect()
        }

    def test_learn_drops_cross_batch_and_corpus_dups(self, spark, tmp_path):
        batches = [
            # b0: two novel docs
            [(100, _long("novelX")), (101, _long("novelY"))],
            # b1: exact copy of X (new id) — only catchable via learn;
            # plus an exact corpus dup and a novel doc
            [(200, _long("novelX")), (201, _long("corpus3")), (202, _long("novelZ"))],
            # b2: near-dup of Y (suffix edit) + a novel doc
            [(300, _long("novelY") + " tail"), (301, _long("novelW"))],
        ]
        kept = self._run(spark, tmp_path, batches, learn=True)
        assert kept == {100, 101, 202, 301}

    def test_without_learn_only_standing_corpus_gates(self, spark, tmp_path):
        batches = [
            [(100, _long("novelX"))],
            # exact cross-batch copy passes without learn (no watermark
            # state here — that is streaming_curate's job upstream), but
            # the corpus dup still drops
            [(200, _long("novelX")), (201, _long("corpus3"))],
        ]
        kept = self._run(spark, tmp_path, batches, learn=False)
        assert kept == {100, 200}

    def test_gate_replay_same_batch_id_is_idempotent(self, spark, tmp_path):
        """foreachBatch is at-least-once: a batch that fully staged (sink
        write + learn appends) but crashed BEFORE the checkpoint offset
        commit is replayed. The replay must NOT re-probe — with learn=True
        the indexes now contain the batch's own survivors, so a re-probe
        drops every row and the overwrite would replace the committed
        partition with an EMPTY one (silent data loss). The _SUCCESS
        marker skips the probe-and-write; the learn appends re-run
        idempotently (the crash may also have landed between sink commit
        and appends)."""
        from sat_bucket_spark.streaming.curation import _make_gate

        bidx, midx = self._indexes(spark, tmp_path)
        sink = str(tmp_path / "sink_replay")
        gate = _make_gate(sink, bidx, midx, 0.5, True)
        batch = spark.createDataFrame(
            [(100, _long("novelX")), (101, _long("corpus3"))],
            ["doc_id", "text"],
        )
        gate(batch, 0)
        kept_once = {
            r["doc_id"] for r in spark.read.parquet(f"{sink}/batch=0").collect()
        }
        assert kept_once == {100}  # corpus dup dropped, novel doc staged
        # the replay: same batch, same id, indexes already learned doc 100
        gate(batch, 0)
        kept_again = {
            r["doc_id"] for r in spark.read.parquet(f"{sink}/batch=0").collect()
        }
        assert kept_again == {100}  # NOT empty — the committed stage survives
        # and the standing state still gates a later batch's duplicate
        later = spark.createDataFrame(
            [(300, _long("novelX")), (301, _long("novelQ"))], ["doc_id", "text"]
        )
        gate(later, 1)
        assert {
            r["doc_id"] for r in spark.read.parquet(f"{sink}/batch=1").collect()
        } == {301}

    def test_compact_every_bounds_fragmentation_output_identical(
        self, spark, tmp_path
    ):
        """compact_every=N runs compact_minhash_index inside the gate
        every N learned batches: the kept id-set must be IDENTICAL to the
        uncompacted run (compaction is content-preserving maintenance)
        while band fragmentation stays bounded instead of growing one
        file per learn batch."""
        import glob

        from sat_bucket_spark.streaming.curation import _make_gate

        def band_frag(midx):
            root = os.path.join(midx, "bands")
            return max(
                len(glob.glob(os.path.join(root, d, "*.parquet")))
                for d in os.listdir(root)
                if d.startswith("band_idx=")
            )

        batches = [
            [(100 + 10 * i + j, _long(f"novel{i}_{j}")) for j in range(2)]
            for i in range(6)
        ]
        kept = {}
        frag = {}
        for cadence in (None, 2):
            bidx, midx = self._indexes(spark, tmp_path / f"c{cadence}")
            sink = str(tmp_path / f"sink_c{cadence}")
            gate = _make_gate(sink, bidx, midx, 0.5, True, cadence)
            for i, rows in enumerate(batches):
                gate(spark.createDataFrame(rows, ["doc_id", "text"]), i)
            kept[cadence] = {
                r["doc_id"]
                for r in spark.read.option("basePath", sink)
                .parquet(f"{sink}/batch=*")
                .collect()
            }
            frag[cadence] = band_frag(midx)
        assert kept[2] == kept[None] == {
            100 + 10 * i + j for i in range(6) for j in range(2)
        }
        # 6 learn appends on a 1-file build: uncompacted = 7 files/band;
        # with cadence 2 the periodic folds keep it strictly lower
        assert frag[2] < frag[None]

    def test_compact_every_requires_learn_and_minhash(self, spark, tmp_path):
        import pytest

        from sat_bucket_spark.streaming.curation import (
            stream_dedup_against_indexes,
        )

        stream = spark.readStream.schema("doc_id long, text string").parquet(
            str(tmp_path)
        )
        with pytest.raises(ValueError, match="compact_every"):
            stream_dedup_against_indexes(
                stream, str(tmp_path / "s"), str(tmp_path / "c"),
                bloom_index_dir=str(tmp_path / "b"), learn=True,
                compact_every=2,
            )

    def test_semantic_leg_drops_archive_and_learned_dups(self, spark, tmp_path):
        """The third dedup axis in-stream: an IVFPQ-only gate drops exact
        embedding copies of the standing archive, and with learn=True a
        later batch's copy of an earlier batch's survivor."""
        import numpy as np

        from sat_bucket_spark.operators.similarity import (
            _hyperplanes,
            build_ivfpq_index,
        )
        from sat_bucket_spark.streaming.curation import _make_gate

        cents = _hyperplanes(8, 64, seed=7)
        books = np.stack([_hyperplanes(8, 16, seed=11 + j) for j in range(4)])

        def vec(tup):
            # codebook-exact vectors: ADC self-distance is exactly 0, any
            # differing tuple scores >= the min codebook-row separation
            # (measured ~12.6 — far above the 0.3 gate threshold)
            return [float(x) for x in np.concatenate([books[j][tup[j]] for j in range(4)])]

        corpus = spark.createDataFrame(
            [(i, vec((i % 4, (i + 1) % 8, (i + 2) % 8, (i + 3) % 8))) for i in range(20)],
            "vec_id long, embedding array<double>",
        )
        vidx = str(tmp_path / "sem_idx")
        build_ivfpq_index(corpus, vidx, dim=64, centroids=cents, codebooks=books)

        sink = str(tmp_path / "sink_sem")
        gate = _make_gate(sink, None, None, 0.5, True, None, vidx)
        b0 = spark.createDataFrame(
            [
                (200, vec((3, 4, 5, 6))),   # copy of corpus vec_id=3
                (201, vec((4, 0, 0, 0))),   # fresh (first code 4..7 never in corpus)
            ],
            "vec_id long, embedding array<double>",
        )
        gate(b0, 0)
        assert {
            r["vec_id"] for r in spark.read.parquet(f"{sink}/batch=0").collect()
        } == {201}
        b1 = spark.createDataFrame(
            [
                (300, vec((4, 0, 0, 0))),   # copy of b0's survivor — learn catches it
                (301, vec((5, 1, 1, 1))),   # fresh
            ],
            "vec_id long, embedding array<double>",
        )
        gate(b1, 1)
        assert {
            r["vec_id"] for r in spark.read.parquet(f"{sink}/batch=1").collect()
        } == {301}

    def test_compact_every_covers_ivfpq(self, spark, tmp_path):
        """The in-stream compaction cadence folds the semantic index's
        per-learn-batch code files too, with the kept id-set identical."""
        import glob

        import numpy as np

        from sat_bucket_spark.operators.similarity import (
            _hyperplanes,
            build_ivfpq_index,
        )
        from sat_bucket_spark.streaming.curation import _make_gate

        cents = _hyperplanes(8, 64, seed=7)
        books = np.stack([_hyperplanes(8, 16, seed=11 + j) for j in range(4)])

        def vec(tup):
            return [float(x) for x in np.concatenate([books[j][tup[j]] for j in range(4)])]

        def code_frag(vidx):
            root = os.path.join(vidx, "codes")
            return max(
                len(glob.glob(os.path.join(root, d, "*.parquet")))
                for d in os.listdir(root)
                if d.startswith("__cluster=")
            )

        batches = [
            [(100 + 10 * i + j, vec((4 + (i + j) % 4, i % 8, j % 8, (i + j) % 8)))
             for j in range(2)]
            for i in range(6)
        ]
        kept = {}
        frag = {}
        for cadence in (None, 2):
            corpus = spark.createDataFrame(
                [(i, vec((i % 4, i % 8, (i + 1) % 8, (i + 2) % 8))) for i in range(12)],
                "vec_id long, embedding array<double>",
            )
            vidx = str(tmp_path / f"vc{cadence}")
            build_ivfpq_index(corpus, vidx, dim=64, centroids=cents, codebooks=books)
            sink = str(tmp_path / f"sink_vc{cadence}")
            gate = _make_gate(sink, None, None, 0.5, True, cadence, vidx)
            for i, rows in enumerate(batches):
                gate(
                    spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
                    i,
                )
            kept[cadence] = {
                r["vec_id"]
                for r in spark.read.option("basePath", sink)
                .parquet(f"{sink}/batch=*")
                .collect()
            }
            frag[cadence] = code_frag(vidx)
        assert kept[2] == kept[None]
        # within-batch duplicate embeddings are not the gate's job, so every
        # first-seen id survives; cross-batch copies of survivors are dropped
        assert len(kept[None]) > 0
        assert frag[2] < frag[None]

    def test_semantic_leg_verified_posture_with_sink_reader(self, spark, tmp_path):
        """ivfpq_verify as a CALLABLE re-resolved per batch: the exact
        verify must see the sink's learned survivors, so a later batch's
        copy of an earlier survivor drops under adc_margin=None even
        though the index stores only codes."""
        import numpy as np

        from sat_bucket_spark.operators.similarity import (
            _hyperplanes,
            build_ivfpq_index,
        )
        from sat_bucket_spark.streaming.curation import _make_gate

        cents = _hyperplanes(8, 64, seed=7)
        books = np.stack([_hyperplanes(8, 16, seed=11 + j) for j in range(4)])

        def vec(tup):
            return [float(x) for x in np.concatenate([books[j][tup[j]] for j in range(4)])]

        corpus = spark.createDataFrame(
            [(i, vec((i % 4, i % 8, (i + 1) % 8, (i + 2) % 8))) for i in range(16)],
            "vec_id long, embedding array<double>",
        )
        arch_path = str(tmp_path / "arch")
        corpus.write.parquet(arch_path)
        vidx = str(tmp_path / "sem_v_idx")
        build_ivfpq_index(corpus, vidx, dim=64, centroids=cents, codebooks=books)
        sink = str(tmp_path / "sink_verified")

        def verify(sp):
            import glob

            base = sp.read.parquet(arch_path)
            if glob.glob(f"{sink}/batch=*"):
                base = base.unionByName(
                    sp.read.option("basePath", sink)
                    .parquet(f"{sink}/batch=*")
                    .select("vec_id", "embedding")
                )
            return base

        gate = _make_gate(
            sink, None, None, 0.5, True, None, vidx, 0.95, 2, "embedding",
            verify, None,
        )
        b0 = spark.createDataFrame(
            # (3,3,4,5) = corpus row 3's exact tuple; (4,0,0,0) is novel
            # (corpus first codes are 0..3)
            [(200, vec((3, 3, 4, 5))), (201, vec((4, 0, 0, 0)))],
            "vec_id long, embedding array<double>",
        )
        gate(b0, 0)
        assert {
            r["vec_id"] for r in spark.read.parquet(f"{sink}/batch=0").collect()
        } == {201}
        b1 = spark.createDataFrame(
            [(300, vec((4, 0, 0, 0))), (301, vec((5, 1, 1, 1)))],
            "vec_id long, embedding array<double>",
        )
        gate(b1, 1)
        assert {
            r["vec_id"] for r in spark.read.parquet(f"{sink}/batch=1").collect()
        } == {301}

    def test_candidate_complete_gate_requires_verify(self, spark, tmp_path):
        import pytest

        from sat_bucket_spark.streaming.curation import (
            stream_dedup_against_indexes,
        )

        stream = spark.readStream.schema(
            "vec_id long, embedding array<double>"
        ).parquet(str(tmp_path))
        with pytest.raises(ValueError, match="ivfpq_verify"):
            stream_dedup_against_indexes(
                stream, str(tmp_path / "s3"), str(tmp_path / "c3"),
                ivfpq_index_dir=str(tmp_path / "v3"), adc_margin=None,
            )

    def test_compact_every_accepts_ivfpq_only(self, spark, tmp_path):
        from sat_bucket_spark.streaming.curation import (
            stream_dedup_against_indexes,
        )

        stream = spark.readStream.schema(
            "vec_id long, embedding array<double>"
        ).parquet(str(tmp_path))
        # must NOT raise: ivfpq is a compactable index leg
        q = None
        try:
            q = stream_dedup_against_indexes(
                stream, str(tmp_path / "s2"), str(tmp_path / "c2"),
                ivfpq_index_dir=str(tmp_path / "v"), learn=True,
                compact_every=2, trigger={"availableNow": True},
            )
        finally:
            if q is not None:
                q.stop()

    def test_fresh_checkpoint_with_stale_sink_refuses(self, spark, tmp_path):
        """Batch ids restart at 0 with a fresh checkpoint, so a sink left
        over from a previous checkpoint lifecycle would make the _SUCCESS
        idempotence skip silently drop every new batch — the gate must
        refuse loudly instead."""
        import pytest

        from sat_bucket_spark.operators.dedup import build_bloom_index
        from sat_bucket_spark.streaming.curation import (
            stream_dedup_against_indexes,
        )

        corpus = spark.createDataFrame(
            [(i, _long(f"corpus{i}")) for i in range(5)], ["doc_id", "text"]
        )
        bidx = str(tmp_path / "b_guard")
        build_bloom_index(corpus, bidx, ["text"])
        sink = str(tmp_path / "stale_sink")
        # a committed partition from a "previous run"
        corpus.limit(1).write.parquet(f"{sink}/batch=0")
        src = str(tmp_path / "src_guard")
        os.makedirs(src, exist_ok=True)
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        with pytest.raises(ValueError, match="fresh checkpoint"):
            stream_dedup_against_indexes(
                stream, sink, str(tmp_path / "ckpt_fresh"),
                bloom_index_dir=bidx,
            )

    def test_requires_an_index(self, spark, tmp_path):
        import pytest

        from sat_bucket_spark.streaming.curation import (
            stream_dedup_against_indexes,
        )

        with pytest.raises(ValueError, match="at least one"):
            stream_dedup_against_indexes(
                spark.readStream.schema("doc_id long, text string").parquet(
                    str(tmp_path)
                ),
                str(tmp_path / "s"),
                str(tmp_path / "c"),
            )
