"""C4-style line-level cleaning (Raffel et al., JMLR'20 §2.2 rules,
re-expressed as Spark higher-order functions): web-extracted text is
cleaned line-by-line —

- keep only lines ending in terminal punctuation;
- drop lines with fewer than ``min_words`` words;
- drop lines containing blocklist markers (cookie/javascript
  boilerplate, code braces);
- de-duplicate repeated lines within a document (first occurrence
  wins, order preserved);
- finally drop documents left with fewer than ``min_lines`` lines.

Everything is array lambdas over the split lines — whole-stage
codegen, zero shuffle, no Python: this stage touches every byte of the
corpus, so it must be a pure narrow map. First-occurrence dedup is an
EXPLICIT append-if-unseen fold (not array_distinct) so the DuckDB
oracle can replicate the order guarantee exactly (its twin uses a
position filter over the materialized kept array — same output).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: line must end with one of these to survive (C4's "terminal
#: punctuation" rule)
TERMINAL_RE = '[.!?"]$'

#: case-insensitive markers of boilerplate / code lines
DEFAULT_BLOCKLIST: tuple[str, ...] = ("javascript", "cookie", "lorem ipsum", "{")


def _line_ok(line: Column, min_words: int, blocklist: tuple[str, ...]) -> Column:
    ok = line.rlike(TERMINAL_RE) & (
        F.size(F.split(F.trim(line), " ")) >= min_words
    )
    low = F.lower(line)
    for marker in blocklist:
        ok = ok & ~low.contains(marker.lower())
    return ok


def clean_lines(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 3,
    min_lines: int = 1,
    blocklist: tuple[str, ...] = DEFAULT_BLOCKLIST,
) -> DataFrame:
    """Adds ``clean_text`` (surviving lines joined by newline) and
    ``n_lines_kept``; drops documents with fewer than ``min_lines``
    surviving lines."""
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(lines, lambda l: _line_ok(l, min_words, blocklist))
    # First-occurrence line dedup as a single fold (append iff unseen):
    # order-preserving, and crucially it references ``kept`` exactly
    # ONCE. The position-filter formulation (keep element i iff
    # array_position == i+1) names the filtered array twice, and
    # Catalyst's projection collapse re-inlines the WHOLE regex/
    # blocklist filter into every per-element position probe —
    # O(lines^2) regex evaluations, measured 15s vs 2s at sf0.1.
    deduped = F.aggregate(
        kept,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(F.array_contains(acc, x), acc).otherwise(
            F.concat(acc, F.array(x))
        ),
    )
    return (
        df.withColumn("clean_text", F.array_join(deduped, "\n"))
        .withColumn("n_lines_kept", F.size(deduped))
        .filter(F.col("n_lines_kept") >= min_lines)
    )
