"""Property pins for the persisted Bloom index routing invariants.

For ANY corpus/batch key sets and ANY filter sizing (including absurdly
small filters where false positives dominate):

1. the VERIFIED probe equals exact set-difference semantics (drop rows
   whose key the corpus holds, keep the rest — including FP restoration);
2. the UNVERIFIED probe's survivors are a SUBSET of the verified ones
   (Blooms have no false negatives, so it can over-drop but can never
   leak a true duplicate);
3. appending a batch makes exactly that batch's keys duplicates for the
   next probe (union closure), again with no leakage.

Hypothesis drives the key universes and n_bits; one shared Spark session,
bounded examples (Spark-backed property tests follow
test_binning_properties' convention).
"""

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

keys = st.lists(
    st.integers(min_value=0, max_value=60), min_size=1, max_size=30, unique=True
)


@pytest.fixture(scope="module")
def idx_root(tmp_path_factory):
    return tmp_path_factory.mktemp("bloom_prop")


_counter = [0]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    corpus_keys=keys,
    batch_keys=keys,
    n_bits=st.sampled_from([64, 256, 1 << 16]),
)
def test_routing_invariants(spark, idx_root, corpus_keys, batch_keys, n_bits):
    from sat_bucket_spark.operators.dedup import (
        append_to_bloom_index,
        build_bloom_index,
        dedup_exact_against_bloom_index,
    )

    _counter[0] += 1
    idx = os.path.join(str(idx_root), f"idx_{_counter[0]}")
    corpus = spark.createDataFrame(
        [(k, f"key-{k}") for k in corpus_keys], ["cid", "text"]
    )
    batch = spark.createDataFrame(
        [(1000 + k, f"key-{k}") for k in batch_keys], ["bid", "text"]
    )
    build_bloom_index(corpus, idx, ["text"], n_bits=n_bits)

    exact_clean = {1000 + k for k in batch_keys if k not in set(corpus_keys)}
    verified = {
        r["bid"]
        for r in dedup_exact_against_bloom_index(
            batch, idx, verify_corpus=corpus
        ).collect()
    }
    assert verified == exact_clean  # (1) verified == exact, FPs restored

    unverified = {
        r["bid"] for r in dedup_exact_against_bloom_index(batch, idx).collect()
    }
    assert unverified <= verified  # (2) over-drop only, never leak

    # (3) append the batch (staged, per the contract); every batch key is
    # now a duplicate for a re-keyed resubmission — no false negatives
    staged = os.path.join(idx, "staged_batch")
    batch.write.mode("overwrite").parquet(staged)
    append_to_bloom_index(spark.read.parquet(staged), idx)
    resubmit = spark.createDataFrame(
        [(2000 + k, f"key-{k}") for k in batch_keys], ["bid", "text"]
    )
    assert dedup_exact_against_bloom_index(resubmit, idx).count() == 0
