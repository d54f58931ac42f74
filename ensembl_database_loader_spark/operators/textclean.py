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
EXPLICIT position filter (not array_distinct) so the DuckDB oracle can
replicate the order guarantee exactly.
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
    # first-occurrence line dedup, order-preserving and oracle-exact:
    # keep element i iff its first position in the array is i
    deduped = F.filter(
        kept, lambda l, i: F.array_position(kept, l) == i.cast("bigint") + 1
    )
    return (
        df.withColumn("clean_text", F.array_join(deduped, "\n"))
        .withColumn("n_lines_kept", F.size(deduped))
        .filter(F.col("n_lines_kept") >= min_lines)
    )
