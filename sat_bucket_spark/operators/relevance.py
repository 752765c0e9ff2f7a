"""TF-IDF / BM25 relevance scoring over a document corpus.

The retrieval-side companion of the curation operators: given a query
term list, score every document by BM25 (or classic TF-IDF) using corpus
statistics computed in the same job. Everything is relational:

    explode tokens -> (doc, term) term frequencies          [1 shuffle]
    term doc-frequencies for the query terms                [broadcast]
    per-doc score = sum over matched terms                  [1 shuffle]

Only rows whose term is IN the query survive the explode (an ``isin``
filter pushed to the token stream), so the shuffled volume is bounded by
query-term matches, not corpus token count. Corpus constants (N, avgdl)
ride along as broadcast scalars via a literal after one tiny aggregate.

BM25 is the standard ranking function (Robertson-Sparck Jones): the
docstring formula uses k1 saturation and b length normalization with the
plain-IDF variant ``ln((N - df + 0.5) / (df + 0.5) + 1)`` (Lucene's
non-negative form).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sat_bucket_spark.operators.parallel import ensure_parallelism
from sat_bucket_spark.operators.text import tokens_expr

__all__ = [
    "append_to_bm25_index",
    "bm25_index_topk",
    "bm25_scores",
    "build_bm25_index",
    "compact_bm25_index",
    "dedupe_bm25_index",
    "inverted_index",
    "load_bm25_index",
    "tf_idf_scores",
]


def _doc_terms(df: DataFrame, id_col: str, text: str, terms: list[str]) -> DataFrame:
    # tokenize ONCE per row (r16): stage the token array in a projection so
    # size() and explode share one evaluation, and use explode_OUTER —
    # a plain explode over a staged attribute re-enables Catalyst's
    # InferFiltersFromGenerate, whose pushed `size(toks)>0 AND isnotnull`
    # filter re-inlines the tokenizer TWICE below the projection (plan-
    # verified: 4 tokenizes/row staged+inner, 2 inline, 1 outer+post-filter).
    # Outer generates admit no inferred filter; the isin() below drops the
    # NULL rows outer keeps for empty docs, restoring inner-explode rows.
    df = ensure_parallelism(df).select(
        F.col(id_col), tokens_expr(F.lower(F.col(text))).alias("__toks")
    )
    exploded = df.select(
        F.col(id_col),
        F.size("__toks").cast("double").alias("__dl"),
        F.explode_outer("__toks").alias("__term"),
    )
    return exploded.where(F.col("__term").isin([t.lower() for t in terms]))


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 score of every document matching >= 1 query term.

    Returns ``(id, n_matched, score)`` sorted-stable (callers order). The
    corpus stats pass collects exactly two scalars (N, avgdl) plus one df
    per query term — driver data volume is O(len(query_terms)).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    stats = df.select(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.size(tokens_expr(F.lower(F.col(text))))).alias("avgdl"),
    ).collect()[0]
    n_docs, avgdl = stats["n"], float(stats["avgdl"] or 1.0)

    matches = _doc_terms(df, id_col, text, query_terms)
    tf = matches.groupBy(id_col, "__dl", "__term").agg(
        F.count(F.lit(1)).cast("double").alias("__tf")
    )
    dfreq = {
        r["__term"]: r["df"]
        for r in matches.select(id_col, "__term")
        .distinct()
        .groupBy("__term")
        .agg(F.count(F.lit(1)).alias("df"))
        .collect()
    }
    idf_expr = None
    for term in set(t.lower() for t in query_terms):
        idf = math.log((n_docs - dfreq.get(term, 0) + 0.5) / (dfreq.get(term, 0) + 0.5) + 1.0)
        branch = F.when(F.col("__term") == F.lit(term), F.lit(idf))
        idf_expr = branch if idf_expr is None else idf_expr.when(
            F.col("__term") == F.lit(term), F.lit(idf)
        )
    idf_expr = idf_expr.otherwise(F.lit(0.0))

    denom = F.col("__tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("__dl") / F.lit(avgdl)
    )
    contrib = idf_expr * (F.col("__tf") * F.lit(k1 + 1.0)) / denom
    return (
        tf.withColumn("__c", contrib)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matched"),
            # decimal-exact sum: per-doc accumulation order cannot move the
            # result between engines (house determinism rule for float sums)
            F.round(
                F.sum(F.col("__c").cast("decimal(28,10)")).cast("double"), 6
            ).alias("score"),
        )
    )


def tf_idf_scores(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Classic TF-IDF: sum over query terms of tf * ln(N / df).

    Same plan shape as BM25 without the saturation/length terms — kept
    separate because its formula is exactly replayable in ANSI SQL for the
    correctness oracle (BM25 is too, but TF-IDF is the textbook contract).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    n_docs = df.count()
    matches = _doc_terms(df, id_col, text, query_terms)
    tf = matches.groupBy(id_col, "__term").agg(
        F.count(F.lit(1)).cast("double").alias("__tf")
    )
    dfreq = {
        r["__term"]: r["df"]
        for r in matches.select(id_col, "__term")
        .distinct()
        .groupBy("__term")
        .agg(F.count(F.lit(1)).alias("df"))
        .collect()
    }
    idf_expr = None
    for term in set(t.lower() for t in query_terms):
        idf = math.log(n_docs / dfreq[term]) if dfreq.get(term) else 0.0
        branch = F.when(F.col("__term") == F.lit(term), F.lit(idf))
        idf_expr = branch if idf_expr is None else idf_expr.when(
            F.col("__term") == F.lit(term), F.lit(idf)
        )
    idf_expr = idf_expr.otherwise(F.lit(0.0))
    return (
        tf.withColumn("__c", F.col("__tf") * idf_expr)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matched"),
            # decimal-exact sum: per-doc accumulation order cannot move the
            # result between engines (house determinism rule for float sums)
            F.round(
                F.sum(F.col("__c").cast("decimal(28,10)")).cast("double"), 6
            ).alias("score"),
        )
    )


# --- persisted BM25 index: the retrieval leg of the persisted-index family
# (exact keys -> Bloom bitmap, near-dup -> MinHash bands, semantic -> IVFPQ
# codes, RETRIEVAL -> BM25 postings). bm25_scores re-tokenizes the WHOLE
# corpus per query batch; at 100 TB that is the dominant cost repeated for
# every decontamination-by-retrieval / quality-audit lookup. The index pays
# the tokenize ONCE and makes each query a term point-lookup.
#
# Layout (reference analogue: incremental update,
# /root/reference/satbucket/routines.py:580-587 — re-expressed as
# build-once/append-increments state like the other three legs):
#   postings/       (term, doc_id, tf, dl) — one row per (doc, distinct
#                   term), files SORTED BY TERM. Query terms are always
#                   a handful, so a pushed In(term) prunes row groups by
#                   min/max string stats — this is the true point-lookup
#                   regime (probe keys << row groups), unlike the MinHash
#                   batch-sig case where pushdown is opt-in.
#   gen.v<N>/terms/ (term, df) — per-term document frequency.
#   gen.v<N>/stats/ (n_docs, total_dl) — the corpus constants.
#                   terms+stats are GENERATIONAL because appends must
#                   update them exactly (df/N/avgdl drift with the corpus,
#                   unlike the other legs' frozen state): an append writes
#                   gen.v<N+1> (stats LAST — its _SUCCESS is the commit
#                   point) and then retires v<N>; a crash leaves the old
#                   generation serving. Postings appends are plain file
#                   appends (no rewrite, no stale rows — df lives only in
#                   terms/).
#   meta/           frozen tokenizer params + fmt, committed LAST at build
#                   (same validity-marker protocol as the other legs).
#
# Appends are EXACT, not approximations: df, n_docs, and total_dl are all
# sums, so build(A) + append(B) == build(A ∪ B) row for row (pinned by
# test) — scores never drift from the batch operator.


def _bm25_gen(spark, index_dir: str) -> tuple[int, list[str]]:
    """(current generation, stale generation paths) for the mutable
    terms/stats state — highest gen.v<N> whose stats/_SUCCESS exists."""
    import os
    import re

    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(index_dir)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    gens: dict[int, str] = {}
    if fs.exists(root):
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            m = re.fullmatch(r"gen\.v(\d+)", name)
            if m and st.isDirectory():
                gens[int(m.group(1))] = os.path.join(index_dir, name)
    current = 0
    for n in sorted(gens, reverse=True):
        ok = jvm.org.apache.hadoop.fs.Path(
            os.path.join(gens[n], "stats", "_SUCCESS")
        )
        if fs.exists(ok):
            current = n
            break
    stale = [p for n, p in gens.items() if n != current]
    return current, stale


def _bm25_posting_rows(docs: DataFrame, id_col: str, text: str) -> DataFrame:
    """(term, doc_id, tf, dl) rows + the doc-length frame, token rules
    shared with :func:`bm25_scores` (lowercased ``tokens_expr``).

    Tokenizes ONCE per row (see :func:`_doc_terms` for the plan-verified
    shape): staged projection + explode_OUTER + NULL post-filter — inner
    explode over the staged attribute would let InferFiltersFromGenerate
    re-inline the tokenizer twice in a pushed filter."""
    staged = ensure_parallelism(docs).select(
        F.col(id_col).alias("doc_id"),
        tokens_expr(F.lower(F.col(text))).alias("__toks"),
    )
    exploded = staged.select(
        "doc_id",
        F.size("__toks").cast("double").alias("dl"),
        F.explode_outer("__toks").alias("term"),
    ).where(F.col("term").isNotNull())
    return exploded.groupBy("term", "doc_id", "dl").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )


def _write_bm25_generation(spark, index_dir: str, terms: DataFrame,
                           n_docs: int, total_dl: float, n_dl: int,
                           gen: int) -> None:
    import os

    from sat_bucket_spark.operators.dedup import _fs_delete

    nxt = os.path.join(index_dir, f"gen.v{gen + 1}")
    terms.sortWithinPartitions("term").write.mode("overwrite").parquet(
        os.path.join(nxt, "terms")
    )
    # stats is the generation's COMMIT point — written last. n_dl (docs
    # with a tokenizable text) is kept SEPARATE from n_docs: bm25_scores'
    # avgdl averages over non-NULL docs while its N counts all rows —
    # the index replays both denominators exactly.
    spark.createDataFrame(
        [(int(n_docs), float(total_dl), int(n_dl))],
        "n_docs long, total_dl double, n_dl long",
    ).write.mode("overwrite").parquet(os.path.join(nxt, "stats"))
    if gen > 0:
        _fs_delete(spark, os.path.join(index_dir, f"gen.v{gen}"))


def build_bm25_index(
    corpus: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text: str = "text",
) -> None:
    """Persist the corpus's BM25 state once (see the family note above).

    One tokenize scan builds term-sorted postings; one aggregate builds
    per-term df; one aggregate builds (n_docs, total_dl). ``meta/`` is
    invalidated first and committed LAST, so a mid-build crash leaves a
    loudly-invalid index, never mixed tokenizer generations.
    """
    import os

    from sat_bucket_spark.operators.dedup import _fs_delete

    spark = corpus.sparkSession
    meta_path = os.path.join(index_dir, "meta")
    _fs_delete(spark, meta_path)
    gen, stale = _bm25_gen(spark, index_dir)
    for old in stale:
        _fs_delete(spark, old)
    if gen:
        _fs_delete(spark, os.path.join(index_dir, f"gen.v{gen}"))
    _fs_delete(spark, os.path.join(index_dir, "postings"))

    rows = _bm25_posting_rows(corpus, id_col, text)
    rows.sortWithinPartitions("term").write.mode("overwrite").parquet(
        os.path.join(index_dir, "postings")
    )
    posted = spark.read.parquet(os.path.join(index_dir, "postings"))
    terms = posted.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    # stats WITHOUT a second tokenize pass over the corpus: a doc's dl is
    # by definition the sum of its term frequencies, so total_dl is a
    # map-side-combined SUM(tf) over the written postings (no shuffle, no
    # tokenize; zero/NULL-token docs have no rows and contribute 0 —
    # identical to the direct tokenize aggregate); n_docs is a plain
    # count and n_dl (docs with a tokenizable text) a null-check count
    crow = corpus.agg(
        F.count(F.lit(1)).alias("n"), F.count(text).alias("n_dl")
    ).collect()[0]
    dl_row = posted.agg(F.sum("tf").alias("dl")).collect()[0]
    _write_bm25_generation(
        spark, index_dir, terms, int(crow["n"]), float(dl_row["dl"] or 0.0),
        int(crow["n_dl"]), 0,
    )
    spark.createDataFrame(
        [(id_col, text, "bm25-v1")], "id_col string, text string, fmt string"
    ).write.mode("overwrite").parquet(meta_path)


def load_bm25_index(spark, index_dir: str):
    """(params dict, postings DataFrame, terms DataFrame, stats row)."""
    import os

    from sat_bucket_spark.operators.dedup import _load_meta_row

    row = _load_meta_row(spark, index_dir)
    fmt = row.asDict().get("fmt")
    if fmt != "bm25-v1":
        raise ValueError(
            f"BM25 index at {index_dir} has format {fmt!r}; this engine "
            "reads 'bm25-v1' — rebuild it with build_bm25_index"
        )
    params = {"id_col": row["id_col"], "text": row["text"]}
    gen, _stale = _bm25_gen(spark, index_dir)
    gen_dir = os.path.join(index_dir, f"gen.v{gen}")
    stats = spark.read.parquet(os.path.join(gen_dir, "stats")).collect()[0]
    return (
        params,
        spark.read.parquet(os.path.join(index_dir, "postings")),
        spark.read.parquet(os.path.join(gen_dir, "terms")),
        stats,
    )


def append_to_bm25_index(docs: DataFrame, index_dir: str) -> None:
    """Fold new docs in EXACTLY: postings rows append as new files (no
    rewrite — per-row state is immutable), while df/n_docs/total_dl are
    sums and re-commit as the next terms/stats generation (stats-last
    crash protocol; a failed append leaves the previous generation
    serving and simply re-runs). ``build(A); append(B)`` equals
    ``build(A ∪ B)`` — pinned by test, so index scores can never drift
    from :func:`bm25_scores` on the same corpus.

    Appends fragment ``postings/`` (each lands as new files);
    :func:`compact_bm25_index` restores the few-files term-range layout
    on the cadence ``index_report``'s ``mean_file_bytes`` row suggests.

    NOT idempotent: the postings append is visible immediately and lands
    again if the append re-runs — a crash AFTER the postings write but
    BEFORE the stats commit leaves the new posting rows scored with the
    OLD generation's df/avgdl until the re-run commits, and the re-run
    itself duplicates the batch's posting rows. :func:`dedupe_bm25_index`
    detects and heals the duplication (``index_report(scan=True)`` flags
    it); the stats double-count only arises when a FULLY-committed append
    is replayed by an at-least-once scheduler — pass the corpus to the
    healer to restore exact stats in that case.

    Same live-reader caveat as every index append in this engine:
    materialize anything derived from the OLD generation before
    appending."""
    import os

    from sat_bucket_spark.caching import release_stage_cache, stage_cache

    spark = docs.sparkSession
    p, _postings, terms, stats = load_bm25_index(spark, index_dir)
    # tokenize the batch ONCE: the cached (batch-sized) posting rows feed
    # the write, the df delta, and the dl sum
    rows = stage_cache(_bm25_posting_rows(docs, p["id_col"], p["text"]), eager=True)
    try:
        rows.sortWithinPartitions("term").write.mode("append").parquet(
            os.path.join(index_dir, "postings")
        )
        delta_terms = rows.groupBy("term").agg(
            F.count(F.lit(1)).cast("long").alias("df")
        )
        merged = (
            terms.unionByName(delta_terms)
            .groupBy("term")
            .agg(F.sum("df").cast("long").alias("df"))
        )
        crow = docs.agg(
            F.count(F.lit(1)).alias("n"), F.count(p["text"]).alias("n_dl")
        ).collect()[0]
        n, n_dl = int(crow["n"]), int(crow["n_dl"])
        # dl == sum of the doc's tfs, so SUM(tf) over the batch's rows is
        # the exact dl total with no per-doc shuffle
        dl_row = rows.agg(F.sum("tf").alias("dl")).collect()[0]
        gen, stale = _bm25_gen(spark, index_dir)
        from sat_bucket_spark.operators.dedup import _fs_delete

        for old in stale:
            _fs_delete(spark, old)
        _write_bm25_generation(
            spark, index_dir,
            merged,
            int(stats["n_docs"]) + int(n),
            float(stats["total_dl"]) + float(dl_row["dl"] or 0.0),
            int(stats["n_dl"]) + int(n_dl),
            gen,
        )
    finally:
        release_stage_cache(rows, destructive=True)


def dedupe_bm25_index(spark, index_dir: str, corpus: DataFrame | None = None) -> int:
    """Heal duplicate posting rows left by REPLAYED appends (the
    non-idempotence :func:`append_to_bm25_index` documents).

    Detection is one narrow scan (a FULL-ROW ``(term, doc_id, tf, dl)``
    group count over the postings — no text, no tokenize). Keying on the
    full row means only bit-identical replays are flagged and healed: a
    doc legitimately re-ingested with DIFFERENT text leaves rows that
    agree on (term, doc_id) but differ in (tf, dl) — that is an UPSERT
    the caller performed without deleting the old doc, not replay
    duplication, and this healer deliberately leaves it alone rather
    than keeping an arbitrary (tf, dl) row (the same policy line
    :func:`~sat_bucket_spark.operators.similarity.dedupe_ivfpq_index`
    documents; such rows double-count the doc in df/score until the
    caller rebuilds or removes the stale version). When replay
    duplicates exist, the
    postings are rewritten exact-duplicate-free (term-sorted, staged to a
    sibling dir and swapped — a crash between the delete and the rename
    is LOUD, the index serves nothing rather than wrong scores, and a
    plain RERUN self-heals it: the healer finishes the crashed rename
    first, exactly as the compactors resume their own swap windows;
    ``index_report`` describes the state with that hint) and the
    terms/stats
    generation is REBUILT from the healed postings: per-term df and
    total_dl derive exactly; ``n_docs``/``n_dl`` derive exactly when the
    ``corpus`` frame is given (two count jobs), else fall back to the
    healed postings' distinct doc count — exact unless the corpus holds
    docs with NULL/zero-token text (documented undercount; pass the
    corpus when those exist). Returns the number of duplicate
    full-row groups healed (0 = clean, nothing rewritten — except on a
    rerun that RESUMED a crashed heal, which still rebuilds the stats
    generation from the already-healed rows before returning 0: the
    crashed run died before reaching that rebuild).

    Covers BOTH replay shapes: a crash-window replay (stats were never
    committed, so the re-run's single delta is already right — the
    rebuild reproduces it) and an at-least-once replay of a COMPLETED
    append (stats were double-counted — the rebuild-from-postings undoes
    it)."""
    import os

    from sat_bucket_spark.operators.dedup import (
        _fs_delete,
        _fs_rename,
        _resume_crashed_compact_swap,
    )

    # a prior heal killed between its delete and rename left postings
    # missing with a complete postings.healed: finish that swap first,
    # then re-detect (the healed postings may already be duplicate-free,
    # in which case only the generation rebuild below still matters —
    # the crashed run never reached it, so re-running the detection and
    # rebuild from the healed rows restores exact stats)
    resumed = _resume_crashed_compact_swap(
        spark, os.path.join(index_dir, "postings"), suffix=".healed"
    )
    p, postings, _terms, _stats = load_bm25_index(spark, index_dir)

    def _rebuild_generation(healed) -> None:
        terms = healed.groupBy("term").agg(
            F.count(F.lit(1)).cast("long").alias("df")
        )
        dl_row = healed.agg(
            F.sum("tf").alias("dl"),
            F.count_distinct("doc_id").alias("n_posted"),
        ).collect()[0]
        if corpus is not None:
            crow = corpus.agg(
                F.count(F.lit(1)).alias("n"), F.count(p["text"]).alias("n_dl")
            ).collect()[0]
            n, n_dl = int(crow["n"]), int(crow["n_dl"])
        else:
            n = n_dl = int(dl_row["n_posted"])
        gen, stale = _bm25_gen(spark, index_dir)
        for old in stale:
            _fs_delete(spark, old)
        _write_bm25_generation(
            spark, index_dir, terms, n, float(dl_row["dl"] or 0.0),
            int(n_dl), gen,
        )

    n_dup = (
        postings.groupBy("term", "doc_id", "tf", "dl")
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    if resumed and n_dup == 0:
        # the crashed run healed the rows but died before rebuilding the
        # terms/stats generation from them — force that rebuild even
        # though the rows now scan duplicate-free. When duplicates REMAIN
        # after the resumed swap, skip this pre-heal rebuild: the heal
        # path below ends with the same rebuild over the final healed
        # rows, so rebuilding here would just generate the terms/stats
        # twice per invocation (ADVICE r16).
        _rebuild_generation(postings)
    if n_dup == 0:
        return 0
    post_path = os.path.join(index_dir, "postings")
    healed_path = post_path + ".healed"
    _fs_delete(spark, healed_path)
    (
        postings.dropDuplicates(["term", "doc_id", "tf", "dl"])
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(healed_path)
    )
    _fs_delete(spark, post_path)
    _fs_rename(spark, healed_path, post_path)
    _rebuild_generation(spark.read.parquet(post_path))
    return int(n_dup)


def compact_bm25_index(
    spark,
    index_dir: str,
    target_file_size: str | int = "64MB",
    min_files: int = 2,
) -> dict:
    """Defragment ``postings/`` after nightly appends — the maintenance
    half of the fourth index leg, completing the family
    (:func:`~sat_bucket_spark.operators.dedup.compact_minhash_index`,
    Bloom generations,
    :func:`~sat_bucket_spark.operators.similarity.compact_ivfpq_index`).

    Appends land posting rows as plain new files — exact by design (df
    lives only in ``terms/``), but an append-heavy index accumulates many
    small term-sorted files: every probe opens every file's footer and
    per-file row groups shrink until the pushed ``In(term)`` stat-pruning
    stops paying. When ``postings/`` holds >= ``min_files`` files
    averaging under ``target_file_size``, this rewrites them into
    ~total/target term-RANGE-partitioned files
    (``repartitionByRange(n, term)`` + ``sortWithinPartitions(term)`` —
    file-level AND row-group term stats end up disjoint, strictly tighter
    than the build's concatenation of independently-sorted runs), staged
    to a temp sibling and swapped through the FS API. ``terms/``,
    ``stats/`` (the current generation), and ``meta/`` are untouched:
    content is identical row-for-row, so probe results are bit-identical
    across build -> appends -> compact (pinned by test, the
    compact_minhash_index gate pattern). The swap's crash window leaves a
    missing ``postings/`` that probes fail LOUDLY on — never mixed
    layouts; recovery is renaming ``postings.compact`` into place.

    Returns ``{"posting_files": (before, after)}`` (equal when below the
    fragmentation criterion — nothing rewritten).

    Concurrency contract: the pre-swap file-set re-check NARROWS the
    append/compaction race but cannot close it (check-then-act — an
    append landing between the re-check and the delete+rename is still
    silently deleted while its committed stats survive). Concurrent
    appends during maintenance require external mutual exclusion; the
    guard makes violations loud, not licensed (same contract as
    ``compact_minhash_index`` and ``retrain_ivfpq_index``).

    Reference analogue: temporal compaction,
    /root/reference/satbucket/routines.py:530-852.
    """
    import math
    import os

    from sat_bucket_spark.operators.dedup import (
        _fs_delete,
        _fs_parquet_names,
        _fs_parquet_stats,
        _fs_rename,
        _resume_crashed_compact_swap,
    )
    from sat_bucket_spark.writers import parse_size

    target = parse_size(target_file_size)
    post_path = os.path.join(index_dir, "postings")
    # a prior run killed between its delete and rename left postings
    # missing with a complete postings.compact: finish that swap first,
    # so a plain rerun heals the crash window fsck describes
    _resume_crashed_compact_swap(spark, post_path)
    n_before, total_bytes = _fs_parquet_stats(spark, post_path)
    # n_before == 0 short-circuits BEFORE the mean-size division: a
    # missing/empty postings dir (crash debris, min_files=0 callers) is
    # fsck's problem to describe, not a ZeroDivisionError here
    if n_before == 0 or n_before < min_files or total_bytes / n_before >= target:
        return {"posting_files": (n_before, n_before)}
    load_bm25_index(spark, index_dir)  # only compact a loadably-valid index
    seen = _fs_parquet_names(spark, post_path)
    rows = spark.read.parquet(post_path)
    n_out = max(1, math.ceil(total_bytes / target))
    tmp = post_path + ".compact"
    _fs_delete(spark, tmp)
    (
        rows.repartitionByRange(n_out, "term")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(tmp)
    )
    # concurrency guard: an append landing in postings/ after the tmp
    # rewrite read its input would be deleted by the swap while its
    # committed terms/ stats survive — abort and leave the original
    # intact (the next cadenced compaction picks the append up)
    if _fs_parquet_names(spark, post_path) != seen:
        _fs_delete(spark, tmp)
        raise RuntimeError(
            f"{post_path}: file set changed during compaction (concurrent "
            "append?) — swap aborted, original postings left intact; rerun "
            "compact_bm25_index"
        )
    _fs_delete(spark, post_path)
    _fs_rename(spark, tmp, post_path)
    n_after, _ = _fs_parquet_stats(spark, post_path)
    return {"posting_files": (n_before, n_after)}


def bm25_index_topk(
    spark,
    index_dir: str,
    query_terms: list[str],
    k: int | None = 10,
    k1: float = 1.2,
    b: float = 0.75,
    max_df: int | None = None,
    idf_join_threshold: int = 100,
) -> DataFrame:
    """Score documents against ``query_terms`` from the persisted index —
    zero corpus access, zero tokenization: the probe's inputs are the
    matched posting rows and a query-terms-sized slice of ``terms/``.

    The term filter is a pushed ``In(term, ...)`` over TERM-SORTED
    posting files, so parquet row-group min/max stats skip everything a
    handful of query terms cannot touch — the point-lookup regime where
    pushdown always wins (probe keys ≪ row groups; contrast the MinHash
    probe's opt-in knob). Scoring replays :func:`bm25_scores`'s exact
    formula — same Lucene-form IDF, same decimal-exact sum, same
    rounding — so index results are bit-identical to the batch operator
    (pinned by test). ``max_df`` optionally drops stopword-grade terms at
    query time (df is known from ``terms/``, so thresholds are free and
    never baked into the stored state). ``k=None`` returns all matches
    (the decontamination posture); an integer k returns the top-k by
    (score desc, doc_id asc) — a deterministic total order.

    Term-count routing: up to ``idf_join_threshold`` query terms (the
    point-lookup regime this probe exists for) the plan carries per-term
    LITERALS — the pushed ``In(term)`` filter plus a chained
    ``when(term == ...)`` IDF expression — because literal pushdown is
    what makes a handful-of-terms probe skip row groups. ABOVE the
    threshold the plan carries NO per-term literals anywhere: the df
    lookup, the posting filter, and the IDF attachment all ride one
    broadcast ``(term, idf)`` frame inner join (the join IS the filter),
    so plan size is O(1) in term count. That deliberately gives up
    parquet pushdown in the large regime — a 10k-term probe touches
    most row groups anyway, while 10k In-literals are the
    planning-cost trap this engine has measured three times (SCALE.md).
    Both routes produce bit-identical scores (pinned by a
    cross-threshold equality test + literal-free plan assertion).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    qterms = sorted({t.lower() for t in query_terms})
    p, postings, terms, stats = load_bm25_index(spark, index_dir)
    n_docs = int(stats["n_docs"])
    n_dl = int(stats["n_dl"])
    avgdl = float(stats["total_dl"]) / n_dl if n_dl else 1.0
    if len(qterms) <= idf_join_threshold:
        term_rows = terms.where(F.col("term").isin(qterms)).collect()
    else:
        qdf = spark.createDataFrame(
            [(t,) for t in qterms], schema="term string"
        )
        term_rows = terms.join(F.broadcast(qdf), "term").collect()
    dfreq = {r["term"]: int(r["df"]) for r in term_rows}
    if max_df is not None:
        qterms = [t for t in qterms if dfreq.get(t, 0) <= max_df]
        if not qterms:
            qterms = ["\x00__no_term__"]  # empty-result sentinel
    idf_by_term = {
        term: math.log(
            (n_docs - dfreq.get(term, 0) + 0.5) / (dfreq.get(term, 0) + 0.5)
            + 1.0
        )
        for term in qterms
    }
    if len(qterms) <= idf_join_threshold:
        matched = postings.where(F.col("term").isin(qterms))
        idf_expr = None
        for term in qterms:
            idf = idf_by_term[term]
            branch = F.when(F.col("term") == F.lit(term), F.lit(idf))
            idf_expr = branch if idf_expr is None else idf_expr.when(
                F.col("term") == F.lit(term), F.lit(idf)
            )
        idf_expr = idf_expr.otherwise(F.lit(0.0))
        matched = matched.withColumn("__idf", idf_expr)
    else:
        idf_df = spark.createDataFrame(
            [(t, idf_by_term[t]) for t in qterms],
            schema="term string, __idf double",
        )
        # the inner join IS the term filter: no In literal, no isin —
        # zero per-term plan nodes in the large regime
        matched = postings.join(F.broadcast(idf_df), "term")
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.lit(avgdl)
    )
    contrib = F.col("__idf") * (F.col("tf") * F.lit(k1 + 1.0)) / denom
    scored = (
        matched.withColumn("__c", contrib)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matched"),
            F.round(
                F.sum(F.col("__c").cast("decimal(28,10)")).cast("double"), 6
            ).alias("score"),
        )
    )
    if k is None:
        return scored
    return scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)


def inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    min_df: int = 1,
    max_df: int | None = None,
) -> DataFrame:
    """Term -> sorted posting list (doc ids), with document-frequency bounds.

    The retrieval-side materialization of :func:`~sat_bucket_spark.operators.
    text.vocabulary`: one shuffle keyed by term builds
    ``(term, df, postings)``; ``min_df`` prunes hapax noise, ``max_df``
    prunes stopword-grade terms whose posting lists are the classic skew
    hazard (a term in every document collects the whole corpus into one
    group — cap it out before the collect_list).

    Postings are sorted ascending for deterministic, merge-friendly output.
    """
    toks = F.explode(
        F.array_distinct(tokens_expr(F.lower(F.col(text))))
    ).alias("term")
    per_term = (
        ensure_parallelism(df)
        .select(F.col(id_col), toks)
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.array_sort(F.collect_list(id_col)).alias("postings"),
        )
    )
    out = per_term.where(F.col("df") >= F.lit(min_df))
    if max_df is not None:
        out = out.where(F.col("df") <= F.lit(max_df))
    return out
