"""Structured Streaming sessionization tests (file source -> memory sink)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from sat_bucket_spark.partitioning import LonLatPartitioning
from sat_bucket_spark.streaming.sessions import (
    streaming_overpass_counts,
    streaming_time_partition_counts,
)


@pytest.fixture(scope="module")
def stream_source_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_src"))
    base = datetime.datetime(2021, 1, 1)
    rows = []
    # two sessions: 3 rows tight, gap 30 min, 2 rows tight
    for s in (0, 30, 60):
        rows.append((base + datetime.timedelta(seconds=s), 10.0, 10.0))
    for s in (0, 30):
        rows.append((base + datetime.timedelta(minutes=30, seconds=s), -10.0, -10.0))
    spark.createDataFrame(rows, ["time", "lon", "lat"]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(d)
    return d


def _run_stream(spark, out_df, name):
    q = (
        out_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_streaming_overpass_counts(spark, stream_source_dir):
    schema = spark.read.parquet(stream_source_dir).schema
    stream = spark.readStream.schema(schema).parquet(stream_source_dir)
    out = streaming_overpass_counts(stream, gap="2 minutes", watermark="1 hour")
    result = _run_stream(spark, out, "overpass_counts").collect()
    counts = sorted(r["count_overpass_occurence"] for r in result)
    assert counts == [2, 3]


class TestStatefulSessionize:
    @staticmethod
    def _mk(spark, tmp_path, rows, n_files=1):
        import os

        d = str(tmp_path)
        df = spark.createDataFrame(rows, ["user", "time"])
        if n_files == 1:
            df.coalesce(1).write.mode("overwrite").parquet(d)
        else:
            # one file per time-ordered slice, mtimes staggered so the file
            # stream processes them as separate ordered micro-batches
            os.makedirs(d, exist_ok=True)
            per = (len(rows) + n_files - 1) // n_files
            for i in range(n_files):
                part = spark.createDataFrame(
                    rows[i * per : (i + 1) * per], ["user", "time"]
                )
                sub = f"{d}/batch{i}"
                part.coalesce(1).write.mode("overwrite").parquet(sub)
                src = [f for f in os.listdir(sub) if f.endswith(".parquet")][0]
                os.rename(f"{sub}/{src}", f"{d}/{i:03d}.parquet")
                os.utime(f"{d}/{i:03d}.parquet", (1e9 + i * 100, 1e9 + i * 100))
        return d

    def _run(self, spark, src_dir, name, max_files=None, gap=120.0):
        from sat_bucket_spark.streaming.sessions import streaming_sessionize_stateful

        schema = spark.read.parquet(src_dir).schema
        reader = spark.readStream.schema(schema)
        if max_files:
            reader = reader.option("maxFilesPerTrigger", max_files)
        stream = reader.parquet(src_dir)
        out = streaming_sessionize_stateful(
            stream, ["user"], gap=gap, watermark="0 seconds"
        )
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return spark.sql(f"SELECT * FROM {name}").collect()

    def test_in_batch_gap_closure_holds_trailing(self, spark, tmp_path):
        base = datetime.datetime(2021, 1, 1)
        rows = []
        # user a: 3 tight rows, 10-min gap, 2 tight rows, 10-min gap, 1 trailing
        for s in (0, 30, 60):
            rows.append(("a", base + datetime.timedelta(seconds=s)))
        for s in (0, 45):
            rows.append(("a", base + datetime.timedelta(minutes=10, seconds=s)))
        rows.append(("a", base + datetime.timedelta(minutes=20)))
        # user b: one lone session (trailing, never closed)
        rows.append(("b", base))
        d = self._mk(spark, tmp_path, rows)
        got = self._run(spark, d, "stateful_s1")
        sessions = {(r["user"], r["n_rows"]) for r in got}
        # a's first two sessions close by in-batch gap; b's lone session closes
        # by event-time timeout once the finalizing batch advances the
        # watermark to base+20min (> b's timeout at base+2min). a's trailing
        # session (timeout base+22min) stays open in state.
        assert sessions == {("a", 3), ("a", 2), ("b", 1)}
        row3 = next(r for r in got if r["n_rows"] == 3)
        assert row3["session_start"] == base
        assert row3["session_end"] == base + datetime.timedelta(seconds=60)

    def test_watermark_timeout_emits_trailing(self, spark, tmp_path):
        base = datetime.datetime(2021, 1, 1)
        rows = [
            ("a", base),
            ("a", base + datetime.timedelta(seconds=30)),
            # second batch far in the future: watermark passes a's timeout
            ("c", base + datetime.timedelta(hours=2)),
        ]
        d = self._mk(spark, tmp_path, rows, n_files=2)
        got = self._run(spark, d, "stateful_s2", max_files=1)
        sessions = {(r["user"], r["n_rows"]) for r in got}
        # a's session closed by event-time timeout; c's still open
        assert sessions == {("a", 2)}

    def test_late_row_not_folded_into_open_session(self, spark, tmp_path):
        base = datetime.datetime(2021, 1, 1)
        rows = [
            # batch 1: open session [t0, t0+30s] for a
            ("a", base),
            ("a", base + datetime.timedelta(seconds=30)),
            # batch 2: a row 30 min EARLIER (within the 1h watermark) + a far
            # future row for c that advances the watermark past a's timeout
            ("a", base - datetime.timedelta(minutes=30)),
            ("c", base + datetime.timedelta(hours=3)),
        ]
        d = self._mk(spark, tmp_path, rows, n_files=2)
        from sat_bucket_spark.streaming.sessions import streaming_sessionize_stateful

        schema = spark.read.parquet(d).schema
        stream = (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
        )
        out = streaming_sessionize_stateful(
            stream, ["user"], gap=120.0, watermark="1 hour"
        )
        q = (
            out.writeStream.format("memory")
            .queryName("stateful_late")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = spark.sql("SELECT * FROM stateful_late").collect()
        sessions = {
            (r["user"], r["n_rows"], r["session_start"]) for r in got if r["user"] == "a"
        }
        # the late row forms its OWN earlier session (n=1); the open session
        # [t0, t0+30s] closes by timeout with n=2 — NOT one folded n=3 session
        assert sessions == {
            ("a", 1, base - datetime.timedelta(minutes=30)),
            ("a", 2, base),
        }

    def test_exact_gap_does_not_split(self, spark, tmp_path):
        base = datetime.datetime(2021, 1, 1)
        rows = [
            ("a", base),
            ("a", base + datetime.timedelta(seconds=120)),  # == gap: same session
            ("a", base + datetime.timedelta(seconds=361)),  # > gap from 120: split
        ]
        d = self._mk(spark, tmp_path, rows)
        got = self._run(spark, d, "stateful_s3")
        assert {(r["user"], r["n_rows"]) for r in got} == {("a", 2)}


def test_streaming_dedup_exact(spark, tmp_path):
    from sat_bucket_spark.streaming.sessions import streaming_dedup_exact

    base = datetime.datetime(2021, 1, 1)
    rows = [
        ("fp1", base, 1),
        ("fp1", base + datetime.timedelta(minutes=5), 2),  # dup within watermark
        ("fp2", base + datetime.timedelta(minutes=1), 3),
        ("fp2", base + datetime.timedelta(minutes=2), 4),  # dup
        ("fp3", base, 5),
    ]
    d = str(tmp_path)
    spark.createDataFrame(rows, ["fingerprint", "time", "doc"]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(d)
    schema = spark.read.parquet(d).schema
    stream = spark.readStream.schema(schema).parquet(d)
    out = streaming_dedup_exact(stream, ["fingerprint"], watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("sdedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT fingerprint FROM sdedup").collect()
    assert sorted(r["fingerprint"] for r in got) == ["fp1", "fp2", "fp3"]


def test_streaming_partition_counts(spark, stream_source_dir):
    schema = spark.read.parquet(stream_source_dir).schema
    stream = spark.readStream.schema(schema).parquet(stream_source_dir)
    p = LonLatPartitioning(size=10)
    out = streaming_time_partition_counts(stream, p, window="1 hour", watermark="2 hours")
    result = _run_stream(spark, out, "part_counts").collect()
    got = {(r["lon_bin"], r["lat_bin"]): r["n"] for r in result}
    # right-closed bins: 10.0 -> (0,10] centroid 5.0; -10.0 -> (-20,-10] centroid -15.0
    assert got == {("5.0", "5.0"): 3, ("-15.0", "-15.0"): 2}


def test_streaming_curate(spark, tmp_path):
    from sat_bucket_spark.streaming.curation import streaming_curate

    base = datetime.datetime(2021, 1, 1)
    rows = [
        # same content after normalization -> same fingerprint -> dedup
        (1, "Hello  world, mail me at a@b.io", base),
        (2, "Hello world, mail me at a@b.io", base + datetime.timedelta(minutes=3)),
        (3, "Entirely different document text", base + datetime.timedelta(minutes=1)),
    ]
    d = str(tmp_path / "src")
    spark.createDataFrame(rows, ["doc_id", "text", "time"]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(d)
    schema = spark.read.parquet(d).schema
    stream = spark.readStream.schema(schema).parquet(d)
    out = streaming_curate(stream, watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("scurate")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"]: r for r in spark.sql("SELECT * FROM scurate").collect()}
    # docs 1 and 2 normalize to identical text -> one survives (first-seen)
    assert len(got) == 2 and 3 in got
    survivor = got[1 if 1 in got else 2]
    assert "[EMAIL]" in survivor["text"] and "@" not in survivor["text"]
    assert survivor["n_tokens"] > 0 and 0.0 <= survivor["quality_score"] <= 1.0


class TestStreamingMapOnlyOps:
    """Round-3 map-only operators must compose with Structured Streaming
    unchanged: pure expressions have no batch-only dependency (no windows,
    no global agg), so a readStream source flows straight through them."""

    def _docs_stream(self, spark, tmp_path_factory):
        d = str(tmp_path_factory.mktemp("stream_docs"))
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(
            50
        ).coalesce(1).write.mode("overwrite").parquet(d)
        schema = spark.read.parquet(d).schema
        return spark.readStream.schema(schema).parquet(d)

    def test_cdc_chunking_streams(self, spark, tmp_path_factory):
        from sat_bucket_spark.operators.chunking import chunk_documents_cdc

        stream = self._docs_stream(spark, tmp_path_factory)
        out = chunk_documents_cdc(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("cdc_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql("SELECT * FROM cdc_stream").collect()
        assert len(got) >= 50
        rebuilt = {}
        for r in sorted(got, key=lambda r: (r["doc_id"], r["chunk_id"])):
            rebuilt[r["doc_id"]] = rebuilt.get(r["doc_id"], "") + r["chunk"]
        orig = {
            r["doc_id"]: r["text"]
            for r in spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .limit(50)
            .collect()
        }
        assert rebuilt == orig

    def test_pq_encode_streams(self, spark, tmp_path_factory):
        import numpy as np

        from sat_bucket_spark.operators.similarity import _hyperplanes, pq_encode

        d = str(tmp_path_factory.mktemp("stream_emb"))
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").coalesce(
            1
        ).write.mode("overwrite").parquet(d)
        schema = spark.read.parquet(d).schema
        stream = spark.readStream.schema(schema).parquet(d)
        books = np.stack([_hyperplanes(8, 16, seed=11 + j) for j in range(4)])
        out = pq_encode(stream, books).select("vec_id", "pq_code")
        q = (
            out.writeStream.format("memory")
            .queryName("pq_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {r["vec_id"]: r["pq_code"] for r in spark.sql("SELECT * FROM pq_stream").collect()}
        batch = {
            r["vec_id"]: r["pq_code"]
            for r in pq_encode(spark.read.parquet(d), books)
            .select("vec_id", "pq_code")
            .collect()
        }
        assert got == batch  # streaming == batch, row for row


class TestStreamingBucketIngest:
    def test_stream_ingest_equals_batch_bucket(self, spark, orbit_df, tmp_path):
        """availableNow stream into a bucket == batch write_bucket: same
        rows, same hive layout, readable by read() while/after streaming."""
        from sat_bucket_spark import LonLatPartitioning, read, write_bucket
        from sat_bucket_spark.streaming.ingest import stream_write_bucket

        src = str(tmp_path / "src")
        orbit_df.coalesce(2).write.mode("overwrite").parquet(src)
        schema = spark.read.parquet(src).schema
        p = LonLatPartitioning(size=(10, 10))

        sbucket = str(tmp_path / "stream_bucket")
        q = stream_write_bucket(
            spark.readStream.schema(schema).parquet(src),
            sbucket,
            p,
            checkpoint_dir=str(tmp_path / "ckpt"),
            trigger={"availableNow": True},
        )
        q.awaitTermination(120)

        bbucket = str(tmp_path / "batch_bucket")
        write_bucket(orbit_df, bbucket, p, x="lon", y="lat")

        assert read(spark, sbucket).count() == 150
        got = {tuple(r) for r in read(spark, sbucket).select("gpm_id", "lon_bin", "lat_bin").collect()}
        want = {tuple(r) for r in read(spark, bbucket).select("gpm_id", "lon_bin", "lat_bin").collect()}
        assert got == want

        ext = {r["gpm_id"] for r in read(spark, sbucket, extent=[5, 8, 0, 20]).collect()}
        bxt = {r["gpm_id"] for r in read(spark, bbucket, extent=[5, 8, 0, 20]).collect()}
        assert ext == bxt

    def test_repartitioned_sink_same_rows_fewer_files(self, spark, orbit_df, tmp_path):
        """repartition=N keys micro-batch rows by label before the sink:
        identical content, and each spatial partition's rows land in one
        task (files-per-partition bounded by batches, not source tasks)."""
        import glob

        from sat_bucket_spark import LonLatPartitioning, read
        from sat_bucket_spark.streaming.ingest import stream_write_bucket

        src = str(tmp_path / "src")
        orbit_df.repartition(4).write.mode("overwrite").parquet(src)
        schema = spark.read.parquet(src).schema
        p = LonLatPartitioning(size=(10, 10))

        buckets = {}
        for name, rep in [("plain", None), ("keyed", 4)]:
            b = str(tmp_path / f"b_{name}")
            q = stream_write_bucket(
                spark.readStream.schema(schema).parquet(src),
                b,
                p,
                checkpoint_dir=str(tmp_path / f"ckpt_{name}"),
                trigger={"availableNow": True},
                repartition=rep,
            )
            q.awaitTermination(120)
            buckets[name] = b

        rows = {
            name: {tuple(r) for r in read(spark, b).select("gpm_id", "lon_bin", "lat_bin").collect()}
            for name, b in buckets.items()
        }
        assert rows["plain"] == rows["keyed"]
        assert read(spark, buckets["keyed"]).count() == 150
        n_files = {
            name: len(glob.glob(f"{b}/**/*.parquet", recursive=True))
            for name, b in buckets.items()
        }
        # 4 source tasks x shared cells without keying; exactly 1 file per
        # touched cell with it (single availableNow batch)
        assert n_files["keyed"] <= n_files["plain"]

    def test_restart_is_exactly_once(self, spark, orbit_df, tmp_path):
        """Re-running the drained stream over the same checkpoint must not
        duplicate rows (file-sink write-ahead log)."""
        from sat_bucket_spark import LonLatPartitioning, read
        from sat_bucket_spark.streaming.ingest import stream_write_bucket

        src = str(tmp_path / "src")
        orbit_df.write.mode("overwrite").parquet(src)
        schema = spark.read.parquet(src).schema
        p = LonLatPartitioning(size=(10, 10))
        bucket = str(tmp_path / "bucket")
        for _ in range(2):
            q = stream_write_bucket(
                spark.readStream.schema(schema).parquet(src),
                bucket,
                p,
                checkpoint_dir=str(tmp_path / "ckpt"),
                trigger={"availableNow": True},
            )
            q.awaitTermination(120)
        assert read(spark, bucket).count() == 150

    def test_batch_frame_rejected(self, spark, orbit_df, tmp_path):
        import pytest as _pytest

        from sat_bucket_spark import LonLatPartitioning
        from sat_bucket_spark.streaming.ingest import stream_write_bucket

        with _pytest.raises(ValueError, match="streaming"):
            stream_write_bucket(
                orbit_df, str(tmp_path / "b"), LonLatPartitioning(size=10),
                checkpoint_dir=str(tmp_path / "c"),
            )

    def test_streamed_bucket_compacts_with_batch_merge(self, spark, orbit_df, tmp_path):
        """The Lambda split: continuous ingest, periodic batch compaction.
        merge_granule_buckets must read every committed row of a streamed
        bucket (the sink's _spark_metadata log does not confuse the
        file-listing merge path) and produce a complete merged archive."""
        from sat_bucket_spark import LonLatPartitioning, merge_granule_buckets, read
        from sat_bucket_spark.streaming.ingest import stream_write_bucket

        src = str(tmp_path / "src")
        orbit_df.write.mode("overwrite").parquet(src)
        schema = spark.read.parquet(src).schema
        p = LonLatPartitioning(size=(10, 10))
        bucket = str(tmp_path / "bucket")
        q = stream_write_bucket(
            spark.readStream.schema(schema).parquet(src),
            bucket,
            p,
            checkpoint_dir=str(tmp_path / "ckpt"),
            trigger={"availableNow": True},
        )
        q.awaitTermination(120)
        merged = str(tmp_path / "merged")
        merge_granule_buckets(spark, bucket, merged, temporal_partitioning="year")
        assert read(spark, merged).count() == 150


class TestStreamIntervalJoin:
    """Stream-stream interval join: bounded state, batch-equivalent result."""

    def _sources(self, spark, tmp_path):
        base = datetime.datetime(2021, 1, 1)
        ev = [
            (base + datetime.timedelta(seconds=s), "sat1", float(s))
            for s in (0, 100, 200, 300)
        ] + [(base + datetime.timedelta(seconds=150), "sat2", 150.0)]
        cal = [
            (base + datetime.timedelta(seconds=s), "sat1", f"c{s}")
            for s in (30, 290, 5000)
        ] + [(base + datetime.timedelta(seconds=160), "sat2", "c2")]
        evd, cald = str(tmp_path / "ev"), str(tmp_path / "cal")
        spark.createDataFrame(ev, ["time", "sat", "value"]).coalesce(1).write.parquet(evd)
        spark.createDataFrame(cal, ["time", "sat", "cal_id"]).coalesce(1).write.parquet(cald)
        return evd, cald

    def test_stream_matches_batch_join(self, spark, tmp_path):
        from sat_bucket_spark.streaming.joins import stream_interval_join

        evd, cald = self._sources(spark, tmp_path)
        sch_ev = spark.read.parquet(evd).schema
        sch_cal = spark.read.parquet(cald).schema

        left = spark.readStream.schema(sch_ev).parquet(evd)
        right = spark.readStream.schema(sch_cal).parquet(cald)
        joined = stream_interval_join(
            left, right, on=["sat"], tolerance_seconds=60, watermark="1 hour"
        )
        out = str(tmp_path / "out")
        q = (
            joined.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(
            (r["sat"], r["value"], r["cal_id"])
            for r in spark.read.parquet(out).collect()
        )

        # batch reference: same semantics on static frames
        ev_b = spark.read.parquet(evd)
        cal_b = spark.read.parquet(cald).withColumnRenamed("time", "r_time")
        ref = sorted(
            (r["sat"], r["value"], r["cal_id"])
            for r in ev_b.join(
                cal_b,
                (ev_b["sat"] == cal_b["sat"])
                & (F.abs(ev_b["time"].cast("long") - cal_b["r_time"].cast("long")) <= 60),
            ).collect()
        )
        assert got == ref and len(got) > 0
        # the isolated calibration at +5000s matches nothing
        assert all(c != "c5000" for _, _, c in got)
