"""PII redaction: replace emails / IPv4 addresses / phone numbers in a
text column with typed placeholder tags, and account for what was
removed. The compliance-scrub step of a web-crawl curation funnel runs
exactly this shape (regex families over every document) — it has to
stay JVM-side because it touches every byte of a 100 TB corpus.

All patterns are written in the common subset of Java regex (Spark)
and RE2 (DuckDB): no backreferences, no lookaround, so the oracle can
run the byte-identical scrub. Redaction is sequential per family
(emails first — an email must not be half-eaten by the phone pattern);
counts are taken BEFORE any replacement, from the original text.

Everything is ``regexp_count`` / ``regexp_replace`` — whole-stage
codegen, no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (name, pattern, replacement) — pattern valid in Java regex AND RE2.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,2}-\d{3}-\d{3}-\d{4}", "<PHONE>"),
)


def pii_counts(text: str | Column) -> list[Column]:
    """One count column per PII family (``n_<name>``), measured on the
    un-redacted text."""
    c = F.col(text) if isinstance(text, str) else text
    return [
        F.regexp_count(c, F.lit(pat)).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]


def redact_text(text: str | Column) -> Column:
    """The scrubbed text: each family replaced by its placeholder, in
    PII_PATTERNS order."""
    c = F.col(text) if isinstance(text, str) else text
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def with_pii_redaction(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``redacted`` plus per-family counts ``n_email`` /
    ``n_ipv4`` / ``n_phone`` (counted before replacement)."""
    return df.select(
        "*", *pii_counts(text_col), redact_text(text_col).alias("redacted")
    )


def pseudonymize(
    df: DataFrame,
    cols: tuple[str, ...],
    secret: str,
    token_len: int = 16,
) -> DataFrame:
    """Deterministic keyed pseudonymization: each listed column's value
    is replaced by ``substr(sha2(secret || ':' || column_name || ':' ||
    value, 256), 1, token_len)`` — the PII-safe export transform that
    PRESERVES JOINABILITY: the same value under the same secret always
    maps to the same token, so foreign keys still line up across
    pseudonymized tables (re-identification requires the secret; rotate
    it to unlink releases). The column NAME is folded into the hash so
    equal values in unrelated columns don't produce linkable tokens —
    pass the same logical name on both sides of an FK (rename first)
    when cross-table joinability is wanted.

    Nulls stay null (a null is not an identity). Pure codegen
    projection — no shuffle, no Python; sha2 is identical in DuckDB
    (sha256) so tokens are engine-exact.

    Truncation note: ``token_len`` hex chars = 4*token_len bits; at the
    default 64 bits a birthday collision needs ~2^32 distinct values —
    raise it for corpora beyond billions of identities."""
    if not cols:
        raise ValueError("pseudonymize: at least one column required")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(
            f"pseudonymize: unknown column(s) {missing!r}; "
            f"frame has {list(df.columns)!r}"
        )
    if not 8 <= int(token_len) <= 64:
        raise ValueError(f"token_len must be in [8, 64], got {token_len}")
    out = df
    for c in cols:
        token = F.substring(
            F.sha2(
                F.concat_ws(":", F.lit(secret), F.lit(c), F.col(c).cast("string")),
                256,
            ),
            1,
            int(token_len),
        )
        out = out.withColumn(
            c, F.when(F.col(c).isNotNull(), token)
        )
    return out
