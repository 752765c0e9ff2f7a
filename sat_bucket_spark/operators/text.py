"""Text analysis operators for large-scale training-data pipelines.

All operators are pure Column-expression pipelines (JVM-side, whole-stage
codegen, no Python in the hot path) over a documents table with a string
``text`` column. Each has an exact ANSI-SQL equivalent used by the DuckDB
correctness oracle (see __spark_entry__.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sat_bucket_spark.operators.parallel import ensure_parallelism

__all__ = [
    "BPE_TOKEN_PATTERN",
    "GOPHER_STOPWORDS",
    "STOPWORDS",
    "add_bpe_token_count",
    "add_compression_ratio",
    "add_fingerprint",
    "add_language_id",
    "add_nfc_normalized",
    "add_quality_score",
    "add_rolling_fingerprint",
    "add_token_count",
    "blocklist_matches",
    "bpe_tokens_expr",
    "filter_blocklist",
    "filter_lines",
    "gopher_quality_flags",
    "line_keep_expr",
    "normalize_text",
    "repair_mojibake",
    "repetition_signals",
    "repetition_signals_full",
    "rolling_hash_expr",
    "tokens_expr",
    "vocabulary",
]

# GPT-2-style segmentation, simplified to the portable common core (Java regex
# and RE2 agree on it): letter runs | digit runs | punctuation runs, over
# lowercased text. Real BPE merges within these pre-token boundaries, so this
# count upper-bounds (and tracks) BPE token counts far better than whitespace.
BPE_TOKEN_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]+"

# Compact stopword lists for the n-gram/stopword language-ID heuristic.
# Public knowledge (most frequent function words per language).
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "den"],
    "fr": ["le", "la", "et", "les", "des", "est", "dans", "que", "une", "pour"],
    "es": ["el", "la", "que", "de", "los", "una", "es", "por", "con", "para"],
    "it": ["il", "la", "che", "di", "e", "un", "per", "una", "sono", "con"],
}


def tokens_expr(text: Column | str) -> Column:
    """Whitespace tokenization with empty-string safety.

    ``split`` of an empty string yields [""]; filter it out so token counts are
    0 for empty documents (both engines agree on this formulation).
    """
    t = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.trim(t), r"\s+"), lambda x: x != F.lit(""))


def add_token_count(df: DataFrame, text: str = "text", out: str = "n_tokens") -> DataFrame:
    """Whitespace token count per document."""
    return df.withColumn(out, F.size(tokens_expr(text)).cast("long"))


def bpe_tokens_expr(text: Column | str) -> Column:
    """BPE-ish pre-tokenization: letter/digit/punctuation runs (lowercased)."""
    t = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(F.lower(t), F.lit(BPE_TOKEN_PATTERN), 0)


def add_bpe_token_count(
    df: DataFrame, text: str = "text", out: str = "n_bpe_tokens"
) -> DataFrame:
    """BPE-ish token count — the budget metric for LLM training data."""
    return df.withColumn(out, F.size(bpe_tokens_expr(text)).cast("long"))


def rolling_hash_expr(
    text: Column | str, base: int = 31, mod: int = 1_000_000_007
) -> Column:
    """Polynomial rolling hash of the full text: fold of ``acc*base + code``.

    The Rabin-Karp primitive — one pass over the char codes, pure expressions
    (``split``-to-chars + ``aggregate`` fold), engine-portable (DuckDB replays
    it with ``list_reduce``). ``acc < mod`` keeps ``acc*base + code`` well
    inside int64. Unlike md5 it composes incrementally, which is what makes
    windowed/content-defined chunking variants possible downstream.
    """
    t = F.col(text) if isinstance(text, str) else text
    codes = F.transform(F.split(t, ""), lambda c: F.ascii(c))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(base) + c) % F.lit(mod),
    )


def add_rolling_fingerprint(
    df: DataFrame, text: str = "text", out: str = "rhash"
) -> DataFrame:
    """Rolling-hash document fingerprint (companion to the md5 fingerprint)."""
    return df.withColumn(out, rolling_hash_expr(text))


def add_quality_score(df: DataFrame, text: str = "text", out: str = "quality_score") -> DataFrame:
    """Heuristic document quality score in [0, 1].

    Components (each a cheap JVM expression):
    - length score: min(n_chars / 500, 1)
    - punctuation ratio penalty: fraction of non-alphanumeric-non-space chars
    - digit ratio penalty
    - mean word length sanity (3..12 chars)
    Combined: 0.4*length + 0.3*(1-punct) + 0.2*(1-digit) + 0.1*word_len_ok.
    """
    t = F.col(text)
    n_chars = F.length(t).cast("double")
    n_punct = (n_chars - F.length(F.regexp_replace(t, r"[^A-Za-z0-9\s]", ""))).cast("double")
    n_digit = (n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))).cast("double")
    n_tokens = F.size(tokens_expr(text)).cast("double")
    safe_chars = F.greatest(n_chars, F.lit(1.0))
    punct_ratio = n_punct / safe_chars
    digit_ratio = n_digit / safe_chars
    mean_word_len = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
    length_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    word_len_ok = F.when((mean_word_len >= 3.0) & (mean_word_len <= 12.0), 1.0).otherwise(0.0)
    score = (
        F.lit(0.4) * length_score
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.2) * (F.lit(1.0) - digit_ratio)
        + F.lit(0.1) * word_len_ok
    )
    return df.withColumn(out, F.round(score, 6))


def add_language_id(df: DataFrame, text: str = "text", out: str = "lang_pred") -> DataFrame:
    """Stopword-hit language identification.

    For each language, count tokens that are stopwords of that language; pick
    the argmax (ties and zero hits -> 'und' for undetermined). Entirely
    JVM-side: lowercased token array intersected with literal arrays.
    """
    toks = F.transform(tokens_expr(text), lambda x: F.lower(x))
    hits = {
        lang: F.size(F.filter(toks, lambda x: x.isin(words)))  # noqa: B023
        for lang, words in STOPWORDS.items()
    }
    # argmax with deterministic tiebreak: language order as listed
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    for lang in STOPWORDS:  # insertion order fixed
        cond = hits[lang] > best_hits
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(cond, hits[lang]).otherwise(best_hits)
    return df.withColumn(out, best_lang)


def add_fingerprint(df: DataFrame, text: str = "text", out: str = "fingerprint") -> DataFrame:
    """Normalization fingerprint: md5 of lowercased, punctuation-stripped,
    whitespace-collapsed text — the classic near-exact dedup key.
    """
    t = F.col(text)
    norm = F.lower(t)
    norm = F.regexp_replace(norm, r"[^a-z0-9\s]", "")
    norm = F.trim(F.regexp_replace(norm, r"\s+", " "))
    return df.withColumn(out, F.md5(norm))


def vocabulary(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
    min_doc_freq: int = 1,
    top_k: int | None = None,
) -> DataFrame:
    """Corpus vocabulary: per-token document frequency + total occurrences.

    The tokenizer-building primitive for a training corpus: explode tokens,
    count total occurrences (term frequency) and distinct documents (document
    frequency) per token in ONE aggregation pass — `count(1)` + partial-agg
    `count(distinct id)` over the exploded tokens, a single shuffle keyed by
    token. At 100 TB the skew concern is stopword-heavy tokens; map-side
    partial aggregation absorbs most of it, and AQE splits residual skew.

    ``top_k`` orders by (doc_freq, term_freq, token) descending-count for a
    deterministic cut.
    """
    t = F.lower(F.col(text)) if lowercase else F.col(text)
    tok = df.select(F.col(id_col), F.explode(tokens_expr(t)).alias("token"))
    agg = tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("term_freq"),
        F.countDistinct(id_col).alias("doc_freq"),
    )
    if min_doc_freq > 1:
        agg = agg.where(F.col("doc_freq") >= F.lit(min_doc_freq))
    if top_k is not None:
        agg = agg.orderBy(
            F.col("doc_freq").desc(), F.col("term_freq").desc(), F.col("token").asc()
        ).limit(top_k)
    return agg


def repetition_signals(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher-style within-document repetition quality signals.

    Per document: ``n_words`` (whitespace tokens), ``dup_word_frac``
    (1 - distinct/total words — high for word-salad spam), and
    ``top_bigram_frac`` (occurrences of the most frequent word bigram over
    all bigram occurrences — high for templated/repeated boilerplate).
    The standard repetition filters from the Gopher/MassiveText quality
    rules, re-expressed relationally.

    Shape: everything is row-local — the bigram mode (max bigram count /
    total bigrams) is computed by sorting the per-row bigram array and
    folding the longest run of equal adjacent elements with ``aggregate``.
    No explode, no shuffle, no aggregation: a pure map operator whose cost
    is O(m log m) per document in codegen, vs the relational alternative
    (explode -> (doc, bigram) count -> per-doc max) whose shuffle carries
    every bigram occurrence of the corpus.

    Single-word documents have one degenerate "bigram" (the word itself),
    giving top_bigram_frac 1.0 — consistent across engines rather than
    null-prone.
    """
    # Stage the tokenization once: Spark does not CSE the regex split across
    # sibling expressions, and re-splitting per derived column dominates.
    toks = F.col("__toks")
    n_bg = F.greatest(F.size(toks) - F.lit(1), F.lit(1))
    bigrams = F.transform(
        F.sequence(F.lit(1), n_bg), lambda i: F.concat_ws(" ", F.slice(toks, i, F.lit(2)))
    )

    # Longest run of equal adjacent elements in the SORTED bigram array ==
    # the max occurrence count of any bigram. Fold state: (prev, run, best).
    def _run_step(acc, x):
        new_run = F.when(x == acc["prev"], acc["run"] + F.lit(1)).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), new_run.alias("run"), F.greatest(acc["best"], new_run).alias("best")
        )

    top_count = F.aggregate(
        F.array_sort(bigrams),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        _run_step,
        lambda acc: acc["best"],
    )
    return ensure_parallelism(df).select(
        F.col(id_col), tokens_expr(F.lower(F.col(text))).alias("__toks")
    ).select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_words"),
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 6
        ).alias("dup_word_frac"),
        F.round(top_count.cast("double") / n_bg, 6).alias("top_bigram_frac"),
    )


def _top_run_with_gram(arr: Column) -> Column:
    """(max occurrence count, arg-max element) of an array, row-local.

    Sort + fold (see ``repetition_signals``): the longest run of equal
    adjacent elements in the sorted array is the mode's count. Updating only
    on a STRICTLY longer run makes the tie-break deterministic — the
    lexicographically smallest element wins (runs arrive in sorted order) —
    which the SQL oracle mirrors with ``ORDER BY cnt DESC, gram ASC``.
    """

    def step(acc, x):
        new_run = F.when(x == acc["prev"], acc["run"] + F.lit(1)).otherwise(
            F.lit(1)
        )
        better = new_run > acc["best"]
        return F.struct(
            x.alias("prev"),
            new_run.alias("run"),
            F.when(better, new_run).otherwise(acc["best"]).alias("best"),
            F.when(better, x).otherwise(acc["bestg"]).alias("bestg"),
        )

    return F.aggregate(
        F.array_sort(arr),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
            F.lit("").alias("bestg"),
        ),
        step,
        lambda acc: F.struct(acc["best"].alias("n"), acc["bestg"].alias("gram")),
    )


def repetition_signals_full(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    ngram_ns: tuple[int, ...] = (2, 3, 4),
) -> DataFrame:
    """The full Gopher/MassiveText repetition rule set, row-local.

    Extends :func:`repetition_signals` (dup-word + top-bigram fractions)
    with the remaining repetition filters of Rae et al. 2021 Appendix A:

    - ``dup_line_frac``: fraction of the document's lines that are repeats
      (1 - distinct/total) — templated boilerplate shows up here first;
    - ``dup_line_char_frac``: fraction of line characters sitting in the
      repeated occurrences (total line chars minus distinct-line chars,
      over total line chars);
    - ``top_{n}gram_char_frac`` for each ``n``: characters covered by the
      most frequent word n-gram (count x n-gram length over document
      length), the "one slogan repeated forever" signal.

    Lines come from the ORIGINAL text (boilerplate is case-sensitive);
    n-grams from lowercased whitespace tokens (matching
    ``repetition_signals``). Documents shorter than ``n`` tokens have one
    degenerate n-gram (the whole token list), consistent with the bigram
    convention there. Ties in the n-gram mode resolve to the
    lexicographically smallest gram (see ``_top_run_with_gram``).

    Shape: entirely row-local fold expressions — no explode, no shuffle;
    cost is O(m log m) per document per ``n``. The relational alternative
    shuffles every n-gram occurrence of the corpus, three times.
    """
    toks = F.col("__toks")
    lines = F.col("__lines")
    t = F.col("__t")
    n_words = F.size(toks)
    safe_words = F.greatest(n_words, F.lit(1)).cast("double")
    line_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    dline_chars = F.aggregate(
        F.array_distinct(lines), F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    n_bg = F.greatest(n_words - F.lit(1), F.lit(1))

    def grams(n: int) -> Column:
        return F.transform(
            F.sequence(F.lit(1), F.greatest(n_words - F.lit(n - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, F.lit(n))),
        )

    cols = [
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double") / safe_words,
            6,
        ).alias("dup_word_frac"),
        F.round(
            _top_run_with_gram(grams(2))["n"].cast("double") / n_bg, 6
        ).alias("top_bigram_frac"),
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct(lines)).cast("double")
            / F.greatest(F.size(lines), F.lit(1)),
            6,
        ).alias("dup_line_frac"),
        F.round(
            (line_chars - dline_chars).cast("double")
            / F.greatest(line_chars, F.lit(1)),
            6,
        ).alias("dup_line_char_frac"),
    ]
    for n in ngram_ns:
        top = _top_run_with_gram(grams(n))
        cols.append(
            F.round(
                (top["n"] * F.length(top["gram"])).cast("double")
                / F.greatest(F.length(t), F.lit(1)),
                6,
            ).alias(f"top_{n}gram_char_frac")
        )
    return ensure_parallelism(df).select(
        F.col(id_col),
        F.col(text).alias("__t"),
        tokens_expr(F.lower(F.col(text))).alias("__toks"),
        F.split(F.col(text), "\n").alias("__lines"),
    ).select(*cols)


def add_compression_ratio(
    df: DataFrame,
    text: str = "text",
    out: str = "compression_ratio",
    level: int = 6,
) -> DataFrame:
    """zlib compression ratio per document (compressed/raw bytes).

    The Dolma/RefinedWeb-lineage "too compressible" quality signal: highly
    repetitive machine-generated text compresses far below prose (ratio
    ~0.1 vs ~0.4-0.6), and already-compressed/base64 junk sits near or
    above 1.0 — both tails are cut by thresholding this column. Empty
    documents get ratio 0.0.

    No SQL-expressible oracle exists (DEFLATE is not relational), so this
    operator is test-verified against Python zlib directly; it is the one
    text signal that needs Python, and it runs as an Arrow-batched series
    transform (one zlib call per document — C speed — not per-row Python
    plumbing).
    """
    import zlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ratio(s: pd.Series) -> pd.Series:
        def one(t):
            if not t:
                return 0.0
            raw = t.encode("utf-8", "replace")
            return round(len(zlib.compress(raw, level)) / len(raw), 6)

        return s.map(one)

    return df.withColumn(out, _ratio(F.col(text)))


# The 8-word function-word list of the Gopher/MassiveText stopword rule
# (Rae et al. 2021, "Scaling Language Models: ... Gopher" — public).
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_flags(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
    passthrough: "tuple[str, ...]" = (),
) -> DataFrame:
    """Gopher/MassiveText document-level quality rules as per-rule flags.

    The standard pre-training document filter (Rae et al. 2021, Appendix A
    — public): word-count bounds, mean-word-length sanity, symbol-to-word
    ratio (``#`` and ``...``), bullet-started and ellipsis-ended line
    fractions, alphabetic-word fraction, and the 8-stopword containment
    rule. Returns one row per document with each rule's boolean
    (``ok_*``), the measured ``n_words``, and ``keep`` = AND of all rules
    — per-rule flags rather than a bare filter so a pipeline can report
    WHY documents drop (the rejection-breakdown every curation run needs).
    ``passthrough`` names input columns to carry into the output unchanged
    (e.g. the text itself for a composed filter-then-dedup pipeline —
    keeping the gate row-local instead of forcing a re-scan self-join).

    Shape: row-local Column expressions only — the token array and line
    array are each staged once per row (Spark does not CSE the regex split
    across sibling expressions), every rule folds over them JVM-side, and
    no shuffle or Python is involved. Fractions are rounded to 6 places
    before threshold comparison so engines computing in double agree at
    the boundary. The companion ``repetition_signals`` covers Gopher's
    repetition rules; compose both for the full filter.
    """
    toks = F.col("__toks")
    lines = F.col("__lines")
    t = F.col("__t")
    n_words = F.size(toks)
    safe_words = F.greatest(n_words, F.lit(1)).cast("double")
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")

    total_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    mean_word_len = F.round(total_len.cast("double") / safe_words, 6)

    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    # both ellipsis spellings, like the line rule below — '…' junk must not
    # evade the ratio the '...' spelling fails
    n_ellipsis = (
        F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))
    ) / F.lit(3) + (F.length(t) - F.length(F.replace(t, F.lit("…"), F.lit(""))))
    symbol_ratio = F.round((n_hash + n_ellipsis).cast("double") / safe_words, 6)

    bullet_frac = F.round(
        F.size(
            F.filter(
                lines,
                lambda l: F.substring(F.ltrim(l), 1, 1).isin("-", "*", "•"),
            )
        ).cast("double")
        / n_lines,
        6,
    )
    ellipsis_frac = F.round(
        F.size(
            F.filter(
                lines,
                lambda l: F.rtrim(l).endswith("...") | F.rtrim(l).endswith("…"),
            )
        ).cast("double")
        / n_lines,
        6,
    )
    alpha_frac = F.round(
        F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]"))).cast("double")
        / safe_words,
        6,
    )
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(toks, F.lower)),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    )

    staged = ensure_parallelism(df).select(
        F.col(id_col),
        *[F.col(c) for c in passthrough],
        F.col(text).alias("__t"),
        tokens_expr(text).alias("__toks"),
        F.split(F.col(text), "\n").alias("__lines"),
    )
    return staged.select(
        F.col(id_col),
        *[F.col(c) for c in passthrough],
        n_words.cast("long").alias("n_words"),
        ((n_words >= F.lit(min_words)) & (n_words <= F.lit(max_words))).alias(
            "ok_word_count"
        ),
        (
            (mean_word_len >= F.lit(min_mean_word_len))
            & (mean_word_len <= F.lit(max_mean_word_len))
        ).alias("ok_mean_word_len"),
        (symbol_ratio <= F.lit(max_symbol_word_ratio)).alias("ok_symbol_ratio"),
        (bullet_frac <= F.lit(max_bullet_line_frac)).alias("ok_bullet_lines"),
        (ellipsis_frac <= F.lit(max_ellipsis_line_frac)).alias(
            "ok_ellipsis_lines"
        ),
        (alpha_frac >= F.lit(min_alpha_word_frac)).alias("ok_alpha_words"),
        (stop_hits >= F.lit(min_stopword_hits)).alias("ok_stopwords"),
    ).withColumn(
        "keep",
        F.col("ok_word_count")
        & F.col("ok_mean_word_len")
        & F.col("ok_symbol_ratio")
        & F.col("ok_bullet_lines")
        & F.col("ok_ellipsis_lines")
        & F.col("ok_alpha_words")
        & F.col("ok_stopwords"),
    )


def normalize_text(
    df: DataFrame,
    text: str = "text",
    out: str | None = None,
    lowercase: bool = False,
    collapse_whitespace: bool = True,
    strip_control: bool = True,
    normalize_punct: bool = True,
) -> DataFrame:
    """Canonical text cleanup for corpus ingestion.

    Composable regex/translate passes, all JVM-side single-scan expressions:

    - ``strip_control``: remove C0/C1 control characters (keep \\t \\n);
    - ``normalize_punct``: fold typographic variants to ASCII — curly
      single/double quotes, en/em dashes, ellipsis, non-breaking space;
    - ``collapse_whitespace``: any whitespace run -> one space, trimmed;
    - ``lowercase``: optional case fold (off by default — case is signal
      for quality scoring and language ID).

    The standard first stage of a crawl-to-corpus pipeline: downstream
    fingerprints, shingles, and token counts all assume normalized input.
    ``out=None`` rewrites the text column in place.
    """
    t: Column = F.col(text)
    if strip_control:
        t = F.regexp_replace(t, r"[\x00-\x08\x0b-\x1f\x7f-\x9f]", "")
    if normalize_punct:
        # translate: 1:1 codepoint mapping, cheaper than a regex alternation.
        # curly quotes -> ascii, en/em dash -> '-', NBSP -> space.
        t = F.translate(t, "‘’“”–— ", "''\"\"-- ")
        t = F.regexp_replace(t, "…", "...")
    if collapse_whitespace:
        t = F.trim(F.regexp_replace(t, r"\s+", " "))
    if lowercase:
        t = F.lower(t)
    return df.withColumn(out or text, t)


def line_keep_expr(
    line: Column,
    min_words: int = 3,
    require_terminal_punct: bool = False,
    drop_substrings: tuple[str, ...] = ("lorem ipsum", "javascript", "cookie"),
) -> Column:
    """C4-style per-line keep predicate (reference pipeline: C4/RefinedWeb
    line rules, public knowledge).

    A line survives when it has >= ``min_words`` whitespace tokens, contains
    none of the boilerplate markers (case-insensitive substring match), and —
    if required — ends in terminal punctuation. Pure expression; usable
    inside ``filter`` over a split-lines array.
    """
    lw = F.lower(line)
    words = F.filter(F.split(F.trim(line), r"\s+"), lambda x: x != F.lit(""))
    keep = F.size(words) >= F.lit(min_words)
    for s in drop_substrings:
        keep = keep & ~lw.contains(s)
    if require_terminal_punct:
        keep = keep & F.trim(line).rlike(r"[.!?\"']$")
    return keep


def filter_lines(
    df: DataFrame,
    text_col: str = "text",
    out: str | None = None,
    min_words: int = 3,
    require_terminal_punct: bool = False,
    drop_substrings: tuple[str, ...] = ("lorem ipsum", "javascript", "cookie"),
) -> DataFrame:
    """Rebuild each document from only its surviving lines.

    The C4 cleaning stage: split on newline, apply :func:`line_keep_expr`,
    rejoin. Entirely row-local (split -> array filter -> array_join), so the
    pass is map-only: no shuffle, no Python, and it composes with any scan
    pushdown. Documents whose lines all drop become empty strings (callers
    typically follow with a min-length filter).
    """
    out = out or text_col
    lines = F.split(F.col(text_col), r"\n")
    kept = F.filter(
        lines,
        lambda l: line_keep_expr(
            l,
            min_words=min_words,
            require_terminal_punct=require_terminal_punct,
            drop_substrings=drop_substrings,
        ),
    )
    return df.withColumn(out, F.array_join(kept, "\n"))


# -- mojibake repair ---------------------------------------------------------

# UTF-8 lead bytes misread as latin-1/cp1252 text: U+00C2-U+00DF (2-byte
# leads, e.g. "Ã" in "cafÃ©") followed by one continuation
# char, or U+00E0-U+00EF heading a 3-byte sequence (curly quotes/dashes:
# "â€™"). cp1252 maps continuation bytes 0x80-0x9F to
# printable punctuation, so the continuation class includes both the raw
# U+0080-U+00BF range and its cp1252 images.
_MOJI_CONT = (
    "-¿"
    "€‚ƒ„…†‡ˆ‰Š"
    "‹ŒŽ‘’“”•–—"
    "˜™š›œžŸ"
)
_MOJI_PATTERN = (
    f"[Â-ß][{_MOJI_CONT}]|[à-ï][{_MOJI_CONT}]{{2}}"
)


def repair_mojibake(
    df: DataFrame,
    text: str = "text",
    out: str | None = None,
    max_passes: int = 2,
) -> DataFrame:
    """Repair double-encoded UTF-8 ("mojibake": UTF-8 bytes once decoded as
    latin-1/cp1252 — ``cafÃ©`` for ``café``,
    ``â€™`` for a curly apostrophe).

    Web-crawl corpora carry this at the percent level; it poisons token
    statistics, dedup fingerprints and LM scoring, so curation pipelines
    repair it before anything hashes the text. The repair is the inverse
    round trip — re-encode as cp1252/latin-1, re-decode as UTF-8 — applied
    ONLY when (a) the text matches a conservative mojibake signature
    (UTF-8 lead-byte chars followed by continuation-class chars), (b) the
    re-encode is lossless, and (c) the result is valid UTF-8. Anything
    else (already-clean text, CJK, genuine latin-1 prose like ``naïve``
    without lead-byte patterns) passes through byte-identical.
    ``max_passes`` > 1 also unwinds doubly-mojibaked text.

    Arrow-batched ``pandas_udf`` rather than ``encode``/``decode``
    expressions: Spark 4's ANSI codecs RAISE on unmappable/malformed input
    (MALFORMED_CHARACTER_CODING) where this operator must fall back to the
    original text, and CASE cannot pre-test "is valid UTF-8 after
    re-encode" without performing the conversion. Row-local, zero shuffle;
    the Python stage ships only (and returns only) the string column, so
    at 100 TB the Arrow transfer is bounded by the text column itself.
    """
    import re as _re

    sig = _re.compile(_MOJI_PATTERN)

    @F.pandas_udf("string")
    def _fix(s: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            for _ in range(max_passes):
                if not sig.search(t):
                    return t
                # cp1252 first (covers the 0x80-0x9F punctuation images),
                # latin-1 as fallback for raw C1 control chars.
                try:
                    b = t.encode("cp1252")
                except UnicodeEncodeError:
                    try:
                        b = t.encode("latin-1")
                    except UnicodeEncodeError:
                        return t
                try:
                    repaired = b.decode("utf-8")
                except UnicodeDecodeError:
                    return t
                if repaired == t:
                    return t
                t = repaired
            return t

        return s.map(one)

    return df.withColumn(out or text, _fix(F.col(text)))


def blocklist_matches(
    df: DataFrame,
    terms,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All (document, blocked phrase) matches — the scalable blocklist scan.

    ``terms`` is a list of phrases (one or more words each; matching is
    lowercase, whitespace-normalized, at word boundaries) or a one-column
    DataFrame of them. The shape that works at 100 TB with a
    thousands-of-entries list: for each distinct phrase word-length k in
    the list, the document's DISTINCT word k-grams are generated row-
    locally (``shingles_expr`` — JVM expressions, no UDF) and the union is
    equi-joined against the BROADCAST term table. Substring ``contains``
    scans would be per-term work on every row (O(rows x terms)) and match
    inside words; the shingle join is O(rows x doc_len) + a hash probe,
    independent of list size, and exact at word granularity.

    Returns one row per matched (id, term) — compose with ``left_anti``
    to drop, or aggregate for a rejection report (``filter_blocklist``).
    A DataFrame ``terms`` costs one tiny driver job to learn the distinct
    phrase lengths (lists that size belong in a table anyway).
    """
    spark = df.sparkSession
    if isinstance(terms, (list, tuple, set)):
        norm = sorted({" ".join(str(t).lower().split()) for t in terms} - {""})
        if not norm:
            raise ValueError("empty blocklist")
        terms_df = spark.createDataFrame([(t,) for t in norm], "term string")
        lengths = sorted({t.count(" ") + 1 for t in norm})
    else:
        tcol = terms.columns[0]
        terms_df = terms.select(
            F.regexp_replace(F.trim(F.lower(F.col(tcol))), r"\s+", " ").alias("term")
        ).where(F.col("term") != "").distinct()
        lengths = sorted(
            r["k"]
            for r in terms_df.select(
                (F.size(F.split(F.col("term"), " "))).alias("k")
            ).distinct().collect()
        )
        if not lengths:
            raise ValueError("empty blocklist")
    from sat_bucket_spark.operators.dedup import shingles_expr

    grams = F.array_distinct(
        F.flatten(
            F.array(
                *[shingles_expr(text_col, k=k, unit="word") for k in lengths]
            )
        )
    )
    exploded = df.select(F.col(id_col), F.explode(grams).alias("term"))
    return exploded.join(F.broadcast(terms_df), "term").select(id_col, "term")


def filter_blocklist(
    df: DataFrame,
    terms,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop every document matching any blocked phrase (left-anti on the
    broadcast shingle join of :func:`blocklist_matches`)."""
    hits = blocklist_matches(df, terms, id_col=id_col, text_col=text_col)
    return df.join(hits.select(id_col).distinct(), id_col, "left_anti")


def add_nfc_normalized(
    df: DataFrame,
    text: str = "text",
    out: str | None = None,
    form: str = "NFC",
) -> DataFrame:
    """Unicode-normalize a text column (NFC/NFKC/NFD/NFKD).

    The canonicalization every dedup/fingerprint pass should run first:
    'e' + COMBINING ACUTE and the precomposed 'é' are different byte
    strings for the same text — without normalization they hash apart and
    duplicates survive. Spark has no built-in normalizer, so this is an
    Arrow-batched pandas_udf over stdlib ``unicodedata`` (the one
    non-SQL-expressible step; everything downstream stays Column
    expressions). NFC is engine-portable — DuckDB's ``nfc_normalize``
    replays it exactly, which is how the entry hash-verifies.
    """
    import unicodedata

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"invalid normalization form {form!r}")
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: unicodedata.normalize(form, t) if t is not None else None
        )

    return df.withColumn(out or text, _norm(F.col(text)))
