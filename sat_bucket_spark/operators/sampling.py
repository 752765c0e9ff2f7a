"""Deterministic sampling and dataset splitting for training pipelines.

Random sampling (``df.sample``) is non-reproducible across engines, runs, and
partitionings — useless for a 100 TB corpus where the train/val/test split
must be stable under re-ingest, backfill, and engine migration. These
operators derive the decision from a content hash of a stable id
(operators.hashing: md5-based, bit-identical in DuckDB), so:

- the same row always lands in the same sample/split, on any engine;
- sampling composes with incremental ingest (new rows don't reshuffle old);
- a salt namespaces independent draws (two 10% samples with different salts
  overlap ~1%, same salt = identical).

Everything is a Column expression — codegen'd, zero shuffle, oracle-replayable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sat_bucket_spark.operators.hashing import MERSENNE_P, h31_expr

__all__ = [
    "assign_shards",
    "assign_splits",
    "assign_quality_buckets",
    "leakage_safe_splits",
    "cap_per_group",
    "filter_by_group_quantile",
    "hash_fraction_expr",
    "hash_sample",
    "mix_sources",
    "mix_sources_temperature",
    "stratified_hash_sample",
    "temperature_mixture_weights",
]


def hash_fraction_expr(col: Column | str, salt: str = "") -> Column:
    """Uniform-ish [0, 1) value derived from a stable id — the decision knob.

    ``h31(salt || id) / (2^31 - 1)``; the md5-derived h31 is engine-portable,
    so DuckDB replays the exact same fractions.
    """
    c = F.col(col) if isinstance(col, str) else col
    keyed = F.concat(F.lit(salt), c.cast("string"))
    return h31_expr(keyed).cast("double") / F.lit(float(MERSENNE_P))


def hash_sample(
    df: DataFrame,
    id_col: str,
    fraction: float,
    salt: str = "",
) -> DataFrame:
    """Deterministic ``fraction`` sample keyed on ``id_col``.

    Unlike ``df.sample`` this is stable across runs/partitionings/engines and
    consistent under incremental ingest. The filter is a pure expression, so
    Catalyst pushes it into the scan where the id is a top-level column.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.where(hash_fraction_expr(id_col, salt=salt) < F.lit(float(fraction)))


def assign_splits(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "",
    out: str = "split",
) -> DataFrame:
    """Attach a deterministic train/val/test (or any) split label.

    ``weights`` maps label -> fraction (must sum to ~1); rows are assigned by
    which cumulative-weight interval their hash fraction falls in, so the
    assignment is total (every row gets a label), disjoint, and stable. Label
    interval order follows dict insertion order.
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"weights must sum to 1, got {total}")
    frac = hash_fraction_expr(id_col, salt=salt)
    expr = None
    acc = 0.0
    labels = list(weights.items())
    for name, w in labels[:-1]:
        acc += w
        expr = (
            F.when(frac < F.lit(acc), F.lit(name))
            if expr is None
            else expr.when(frac < F.lit(acc), F.lit(name))
        )
    last = labels[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(out, expr)


def leakage_safe_splits(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    weights: dict[str, float] | None = None,
    salt: str = "",
    out: str = "split",
    group_out: str = "split_group",
) -> DataFrame:
    """Train/val/test splits that near-duplicates cannot straddle.

    :func:`assign_splits` hashes each row's OWN id, so two near-duplicate
    documents can land in train and test — the eval-set contamination the
    dedup pipeline exists to prevent, reintroduced at split time. This
    keys the split hash on the row's DUPLICATE-CLUSTER id instead:
    connected components of ``pairs`` (near-dup candidate pairs from any
    of the MinHash/SimHash/embedding engines) give every clustered
    document its cluster's minimum id as ``group_out``; documents in no
    pair fall back to their own id (for them the assignment is IDENTICAL
    to :func:`assign_splits`, pinned by test). Every cluster member then
    receives the same label by construction — zero straddling clusters,
    also pinned by test.

    Scale shape: the cluster map comes from
    :func:`~sat_bucket_spark.operators.graph.connected_components`
    (driver union-find below its edge threshold, alternating star rounds
    above); mapping it onto the corpus is ONE left join on the id — the
    driver route's result arrives broadcast-HINTED (its LogicalRDD plan
    has unknown stats, which would otherwise force a corpus-sized
    SortMergeJoin shuffle; the hint is bounded by the route's edge
    threshold), the distributed route leaves the choice to AQE; the label
    itself is a map-only expression on the group key. Composes with the
    same ``weights``/``salt`` conventions as :func:`assign_splits`.
    """
    from sat_bucket_spark.operators.graph import connected_components

    cc = connected_components(pairs, src=id_a, dst=id_b).withColumnRenamed(
        "node", id_col
    )
    grouped = (
        df.join(cc, id_col, "left")
        .withColumn(group_out, F.coalesce(F.col("component"), F.col(id_col)))
        .drop("component")
    )
    return assign_splits(grouped, group_out, weights=weights, salt=salt, out=out)


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum sampling (rebalancing a skewed corpus).

    ``fractions`` maps stratum value -> keep fraction; strata absent from the
    map keep ``default_fraction``. The decision is the same content-hash
    fraction as :func:`hash_sample`, compared against a per-stratum threshold
    chosen by a CASE expression — still a pure, pushdown-friendly filter with
    zero shuffle, unlike ``df.sampleBy`` (seed- and partitioning-dependent).

    Up/down-weighting languages or sources to a target mix is THE
    corpus-composition operation at 100 TB; doing it with a stable hash means
    the kept set is reproducible across engines and incremental re-ingests
    (a re-run keeps exactly the same documents).
    """
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for stratum {k!r} must be in [0, 1], got {v}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0, 1], got {default_fraction}")
    thresh = None
    s = F.col(strata_col)
    for k, v in fractions.items():
        cond = s == F.lit(k)
        thresh = (
            F.when(cond, F.lit(float(v)))
            if thresh is None
            else thresh.when(cond, F.lit(float(v)))
        )
    thresh = (
        F.lit(float(default_fraction))
        if thresh is None
        else thresh.otherwise(F.lit(float(default_fraction)))
    )
    return df.where(hash_fraction_expr(id_col, salt=salt) < thresh)


def mix_sources(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str,
    source_col: str = "source",
    salt: str = "mix",
    mass_col: str | None = None,
    counts: dict[str, float] | None = None,
) -> DataFrame:
    """Deterministically downsample to a target source mixture.

    Training mixtures are specified as proportions ("50% web, 30% wiki,
    20% books"); given the actual per-source counts this computes the
    largest dataset achieving the target ratios WITHOUT upsampling — the
    binding source (smallest ``count/weight``) keeps everything, every other
    source downsamples to match. Sources absent from ``weights`` are
    dropped.

    ``mass_col`` switches the mixture unit from rows to a per-row mass —
    pass a token-count column and the proportions become TOKEN budgets
    (the unit training mixtures are actually specified in; document
    lengths differ systematically across sources, so a row mixture is not
    a token mixture). Keep decisions stay per-row hash draws, so the
    realized token mass matches the target in expectation with
    O(1/sqrt(docs-per-source)) relative deviation.

    One tiny counting aggregate (O(#sources) rows to the driver — planning
    metadata, same as the reference's file-listing collects) fixes the
    per-source keep rates; the filter itself is the hash-fraction expression
    keyed on ``id_col``, so the sample is stable across runs, engines, and
    re-partitionings, and the full scan stays map-only.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    total = sum(weights.values())
    norm = {s: w / total for s, w in weights.items()}
    if counts is None:
        mass = (
            F.count(F.lit(1)).alias("n")
            if mass_col is None
            else F.sum(mass_col).alias("n")
        )
        counts = {
            r[source_col]: r["n"]
            for r in df.where(F.col(source_col).isin(list(weights)))
            .groupBy(source_col)
            .agg(mass)
            .collect()
        }
    else:
        # precomputed per-source masses (callers that already aggregated —
        # mix_sources_temperature — avoid a second full-corpus scan)
        counts = {s: n for s, n in counts.items() if s in weights}
    present = {s: w for s, w in norm.items() if counts.get(s)}
    if not present:
        return df.where(F.lit(False))
    t = min(counts[s] / w for s, w in present.items())
    rates = {s: w * t / counts[s] for s, w in present.items()}
    frac = hash_fraction_expr(id_col, salt=salt)
    keep = F.lit(False)
    for s, rate in rates.items():
        keep = F.when(
            F.col(source_col) == F.lit(s), frac < F.lit(float(rate))
        ).otherwise(keep)
    return df.where(keep)


def temperature_mixture_weights(
    df: DataFrame,
    source_col: str = "source",
    alpha: float = 0.5,
    mass_col: str | None = None,
) -> dict[str, float]:
    """Temperature-smoothed mixture proportions: ``p_s ∝ mass_s^alpha``.

    The multilingual/multi-source sampling standard (mBERT/XLM-R lineage —
    public): ``alpha=1`` keeps natural proportions, ``alpha=0`` makes all
    sources equal, ``alpha~0.3-0.7`` up-weights small sources without
    flattening. Returns per-source proportions rounded to 9 decimals —
    the rounding makes the value engine-portable (an oracle replaying the
    same POWER/SUM arithmetic lands on the identical literal), and the
    dict is built in sorted-source order so the downstream normalization
    sums in a deterministic association.

    One O(#sources) counting aggregate; pass the result to
    :func:`mix_sources` (or use :func:`mix_sources_temperature`).
    """
    weights, _counts = _temperature_weights_and_counts(
        df, source_col, alpha, mass_col
    )
    return weights


def _temperature_weights_and_counts(df, source_col, alpha, mass_col):
    """(alpha-proportions, per-source masses) from ONE aggregation scan."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    mass = (
        F.count(F.lit(1)).alias("n")
        if mass_col is None
        else F.sum(mass_col).alias("n")
    )
    counts = {
        r[source_col]: r["n"]
        for r in df.groupBy(source_col).agg(mass).collect()
        if r[source_col] is not None and r["n"]
    }
    if not counts:
        return {}, {}
    powered = {s: float(n) ** alpha for s, n in sorted(counts.items())}
    total = sum(powered.values())
    return {s: round(p / total, 9) for s, p in powered.items()}, counts


def mix_sources_temperature(
    df: DataFrame,
    id_col: str,
    source_col: str = "source",
    alpha: float = 0.5,
    salt: str = "mix",
    mass_col: str | None = None,
) -> DataFrame:
    """Downsample to the ``alpha``-temperature mixture of the corpus.

    :func:`temperature_mixture_weights` + :func:`mix_sources` in one call:
    proportions derive from the data (``mass^alpha`` normalized), then the
    binding source keeps everything and the rest downsample by the
    deterministic hash draw. ONE O(#sources) aggregate — the per-source
    masses feed both the weight derivation and the keep-rate computation
    (no second corpus scan); the data scan itself stays map-only.
    """
    weights, counts = _temperature_weights_and_counts(
        df, source_col, alpha, mass_col
    )
    if not weights:
        return df.where(F.lit(False))
    return mix_sources(
        df,
        weights,
        id_col,
        source_col=source_col,
        salt=salt,
        mass_col=mass_col,
        counts=counts,
    )


def assign_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    salt: str = "shard",
    shard_col: str = "shard",
    pos_col: str = "shard_pos",
) -> DataFrame:
    """Deterministic global shuffle into ``n_shards`` training shards.

    Training runs read shards sequentially, so the *global* row order must be
    random w.r.t. the corpus's natural order (source, crawl date, partition)
    or the loss curve sees distribution drift within an epoch. Assigning
    ``shard = h31(salt||id) % n`` and ordering within shards by a second
    independent hash gives a reproducible permutation: stable across engines
    and re-runs, no ``rand()`` (which changes under retries/speculation).

    The shard is a pure expression (map-only); the within-shard position is
    a window keyed ON THE SHARD — n_shards reducers, each sorting its own
    shard locally, never a global sort. Feed the result to a
    ``partitionBy(shard)`` + ``sortWithinPartitions(order hash)`` write for
    training-ready output files.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    shard = (h31_expr(F.concat(F.lit(salt), F.col(id_col).cast("string"))) % n_shards).cast(
        "int"
    )
    order = h31_expr(F.concat(F.lit(salt + ":order"), F.col(id_col).cast("string")))
    from pyspark.sql import Window

    w = Window.partitionBy(shard_col).orderBy(order.asc(), F.col(id_col).asc())
    return (
        df.withColumn(shard_col, shard)
        .withColumn(pos_col, F.row_number().over(w).cast("long"))
    )


def cap_per_group(
    df: DataFrame,
    group_cols: list[str],
    n_max: int,
    id_col: str,
    salt: str = "",
    rank_col: Column | None = None,
    salt_buckets: int = 1,
) -> DataFrame:
    """Keep at most ``n_max`` rows per group, chosen deterministically.

    The domain-cap curation rule: web corpora are Zipf-skewed over domains /
    sources, and training mixtures cap any single origin's contribution so
    one boilerplate-heavy site cannot dominate an epoch. Selection is a
    hash-rank within the group — stable across engines, runs, and
    partitionings, and fair (hash order is uncorrelated with the corpus's
    natural order). Pass ``rank_col`` to keep the BEST rows instead
    (e.g. ``F.col("quality").desc()``); the id remains the tie-break, so the
    result stays deterministic under duplicate scores.

    Shape: one shuffle on the group key; each reducer ranks its own groups
    (bounded top-n, no global sort). Hot groups are exactly the rows the cap
    discards, so the skew a plain window would suffer shrinks with the
    output; for pathological single-domain corpora, pre-filter with
    ``hash_sample`` to bound the reducer input first.
    """
    if n_max <= 0:
        raise ValueError(f"n_max must be positive, got {n_max}")
    from pyspark.sql import Window

    order = (
        rank_col
        if rank_col is not None
        else h31_expr(F.concat(F.lit(salt), F.col(id_col).cast("string"))).asc()
    )
    if salt_buckets > 1:
        # Skew-proof two-phase rank, OUTPUT-IDENTICAL to the single window:
        # phase 1 ranks within (group, hash-salt) cells and keeps each
        # cell's top n_max — a superset of the group's true top n_max,
        # because any row in the global top-n is also in the top-n of
        # whatever cell it hashed into. Phase 2 ranks exactly over the
        # <= salt_buckets * n_max survivors per group. The hot group's sort
        # spreads across salt_buckets reducers; the exact pass touches a
        # bounded residue, not the group.
        cell = F.pmod(
            F.xxhash64(F.col(id_col), F.lit(salt)), F.lit(salt_buckets)
        )
        w1 = Window.partitionBy(*group_cols, "__cell").orderBy(
            order, F.col(id_col).asc()
        )
        df = (
            df.withColumn("__cell", cell)
            .withColumn("__r1", F.row_number().over(w1))
            .where(F.col("__r1") <= n_max)
            .drop("__cell", "__r1")
        )
    w = Window.partitionBy(*group_cols).orderBy(order, F.col(id_col).asc())
    return (
        df.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= n_max)
        .drop("__r")
    )


def filter_by_group_quantile(
    df: DataFrame,
    score_col: str,
    quantile: float,
    group_cols: list[str] | None = None,
    id_col: str | None = None,
    keep: str = "top",
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Keep rows whose score sits in the top (or bottom) ``1 - quantile`` of
    their group.

    The per-language quality-threshold rule: a fixed global cutoff
    over-prunes low-resource languages whose score distribution sits lower,
    so curation thresholds are quantiles WITHIN each group. Implemented as
    ``percent_rank`` over the group — one shuffle on the group key, no
    driver-side percentile collection, deterministic for duplicate scores
    when ``id_col`` is given (rank ties break on id).

    ``keep="top"`` retains rows with ``percent_rank >= quantile`` (e.g.
    0.4 keeps the top 60%); ``keep="bottom"`` retains ``< quantile``.

    ``exact=False`` switches to the SCALE path: the per-group threshold
    comes from a ``percentile_approx`` sketch (partial-aggregated, bounded
    state set by ``accuracy``) joined back broadcast — no group is ever
    sorted on one reducer, at the cost of a boundary-resolution error of
    ~``1/accuracy`` of the group. Use it when any single group is bigger
    than one executor's comfortable sort.
    """
    if not 0.0 <= quantile <= 1.0:
        raise ValueError(f"quantile must be in [0, 1], got {quantile}")
    if keep not in ("top", "bottom"):
        raise ValueError(f"keep must be 'top' or 'bottom', got {keep!r}")
    if not exact:
        # Scale path: percent_rank sorts each group on ONE reducer — a group
        # holding most of a 100 TB corpus (lang='en'...) serializes there.
        # The sketch path aggregates a per-group approximate-percentile
        # threshold (partial-merged map-side, tiny state), broadcasts the
        # per-group thresholds back, and filters — no group ever sorts.
        thr = df.groupBy(*(group_cols or [])).agg(
            F.percentile_approx(score_col, float(quantile), accuracy).alias("__thr")
        )
        joined = (
            df.join(F.broadcast(thr), group_cols)
            if group_cols
            else df.crossJoin(F.broadcast(thr))
        )
        cond = (
            F.col(score_col) >= F.col("__thr")
            if keep == "top"
            else F.col(score_col) < F.col("__thr")
        )
        return joined.where(cond).drop("__thr")
    from pyspark.sql import Window

    order = [F.col(score_col).asc()]
    if id_col is not None:
        order.append(F.col(id_col).asc())
    w = Window.partitionBy(*(group_cols or [])).orderBy(*order)
    staged = df.withColumn("__pr", F.percent_rank().over(w))
    cond = (
        F.col("__pr") >= F.lit(float(quantile))
        if keep == "top"
        else F.col("__pr") < F.lit(float(quantile))
    )
    return staged.where(cond).drop("__pr")


def assign_quality_buckets(
    df: DataFrame,
    score_col: str,
    n_buckets: int = 4,
    group_cols: list[str] | None = None,
    id_col: str | None = None,
    out: str = "quality_bucket",
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Assign each row an equal-frequency quality bucket within its group.

    Curriculum-style data ordering: training mixtures schedule buckets
    (e.g. highest-quality quartile late in training) rather than applying a
    hard filter. ``ntile`` over the group score order — same single-shuffle
    shape as :func:`filter_by_group_quantile`; bucket 1 is the LOWEST
    scoring tile, ``n_buckets`` the highest. Ties break on ``id_col`` when
    given, keeping the assignment deterministic across runs and engines.
    """
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    if not exact:
        # Scale path (same reasoning as filter_by_group_quantile): sketch the
        # k-1 interior boundaries per group, broadcast back, and derive the
        # bucket as 1 + #boundaries strictly below the score — a pure
        # expression, no per-group sort. Tiles are approximately (not
        # exactly) equal-frequency.
        qs = [i / n_buckets for i in range(1, n_buckets)]
        thr = df.groupBy(*(group_cols or [])).agg(
            F.percentile_approx(
                score_col, F.array(*[F.lit(q) for q in qs]), accuracy
            ).alias("__bnds")
        )
        joined = (
            df.join(F.broadcast(thr), group_cols)
            if group_cols
            else df.crossJoin(F.broadcast(thr))
        )
        bucket = F.lit(1) + F.size(
            F.filter(F.col("__bnds"), lambda b: F.col(score_col) > b)
        )
        return joined.withColumn(out, bucket.cast("int")).drop("__bnds")
    from pyspark.sql import Window

    order = [F.col(score_col).asc()]
    if id_col is not None:
        order.append(F.col(id_col).asc())
    w = Window.partitionBy(*(group_cols or [])).orderBy(*order)
    return df.withColumn(out, F.ntile(n_buckets).over(w))
