"""PII detection and redaction for training-data curation.

A corpus destined for model training must be scanned for (and usually
scrubbed of) personally identifiable information. These operators implement
the standard regex-family scan — emails, phone numbers, IPv4 addresses,
SSN-shaped ids, credit-card-shaped numbers — as pure Column expressions:

- detection is ``regexp_extract_all`` + ``size`` (one pass per type, all
  inside whole-stage codegen, zero shuffle, filter-pushdown friendly);
- redaction is a chain of ``regexp_replace`` with typed placeholders.

The patterns deliberately use the regex subset shared by Java's
``java.util.regex`` (Spark executors) and RE2 (DuckDB and most scanners):
character classes, bounded quantifiers, alternation, non-capturing groups,
and ``\\b`` word boundaries — no backreferences or lookaround, so the same
pattern string replays bit-identically on the oracle side.

Scale shape: per-row expressions only. On 100 TB the scan cost is the
regex engine itself; keeping it JVM-side (no Python) and single-pass per
type is the whole game. Order of redaction matters (credit-card before
phone, so a 16-digit number is not half-eaten by the phone pattern) and is
fixed by ``PII_TYPES``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "PII_TYPES", "add_pii_counts", "pii_summary", "redact_pii"]

# Ordered: longer/more-specific shapes first so redaction never partially
# consumes a match of a later, shorter pattern.
PII_TYPES = ["email", "credit_card", "ssn", "phone", "ipv4"]

PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # 16 digits in 4 groups separated by spaces/dashes (loose Luhn-less shape).
    "credit_card": r"\b\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    # NANP-ish: optional area-code parens, 3-3-4 with -, ., or space. The
    # parenthesized form is an explicit alternative because \b cannot anchor
    # before a literal "(".
    "phone": r"(?:\(\d{3}\)|\b\d{3})[-. ]\d{3}[-. ]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def _count_expr(text: Column, pattern: str) -> Column:
    found = F.regexp_extract_all(text, F.lit(pattern), 0)
    return F.size(found).cast("long")


def add_pii_counts(
    df: DataFrame,
    text: str = "text",
    types: list[str] | None = None,
    prefix: str = "n_",
) -> DataFrame:
    """Append one ``{prefix}{type}`` count column per PII type.

    Counts are match occurrences (not booleans) so downstream policy can
    threshold (e.g. drop documents with >3 emails, flag any SSN).
    """
    types = list(types) if types is not None else list(PII_TYPES)
    c = F.col(text)
    cols = [df["*"]]
    for t in types:
        if t not in PII_PATTERNS:
            raise ValueError(f"unknown PII type {t!r}; known: {PII_TYPES}")
        cols.append(_count_expr(c, PII_PATTERNS[t]).alias(f"{prefix}{t}"))
    return df.select(*cols)


def redact_pii(
    df: DataFrame,
    text: str = "text",
    types: list[str] | None = None,
    out: str | None = None,
    placeholder: str = "[{TYPE}]",
) -> DataFrame:
    """Replace every PII match with a typed placeholder (default ``[EMAIL]``).

    The replace chain runs in PII_TYPES order so multi-pattern overlaps
    resolve deterministically. ``out=None`` overwrites the text column.
    """
    types_l = [t for t in PII_TYPES if types is None or t in types]
    unknown = set(types or []) - set(PII_TYPES)
    if unknown:
        raise ValueError(f"unknown PII types {sorted(unknown)}; known: {PII_TYPES}")
    expr: Column = F.col(text)
    for t in types_l:
        expr = F.regexp_replace(
            expr, F.lit(PII_PATTERNS[t]), F.lit(placeholder.format(TYPE=t.upper()))
        )
    return df.withColumn(out or text, expr)


def pii_summary(
    df: DataFrame,
    text: str = "text",
    group_by: str | None = None,
) -> DataFrame:
    """Corpus-level PII incidence: documents-with and total matches per type.

    One aggregation over per-row counts — the report a curation run ships.
    With ``group_by`` (e.g. source or language), one row per group.
    """
    counted = add_pii_counts(df, text=text)
    aggs = []
    for t in PII_TYPES:
        c = F.col(f"n_{t}")
        aggs.append(F.sum((c > 0).cast("long")).alias(f"docs_{t}"))
        aggs.append(F.sum(c).alias(f"total_{t}"))
    if group_by is None:
        return counted.agg(*aggs)
    return counted.groupBy(group_by).agg(*aggs)
