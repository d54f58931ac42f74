"""Exact-substring deduplication — the ExactSubstr pass of
"Deduplicating Training Data Makes Language Models Better"
(Lee et al., 2022), re-expressed for Spark.

Doc-level dedup (exact / MinHash / SimHash / SemDeDup) misses
boilerplate repeated INSIDE otherwise-distinct documents: license
headers, navigation bars, templated paragraphs. ExactSubstr removes
every token span that appears verbatim more than once in the corpus
(including self-repetition within one document — the paper's
any-repeated-n-gram rule).

The paper builds a single suffix array, which does not distribute; the
map-reduce equivalent is rolling-window hashing:

1. every document emits its ``window``-token rolling windows as md5
   hashes — a NARROW per-row fan-out (no shuffle),
2. one partial-aggregated groupBy counts each window hash corpus-wide;
   hashes with count >= 2 are the duplicated windows,
3. the duplicated set joins back to the per-doc window stream
   (``shuffle_hash`` hint — the dup set scales with the corpus, so it
   must never broadcast) and per-doc duplicated START positions
   aggregate into one array,
4. a token is dropped iff >= 1 duplicated window covers it
   (``exists(starts, s -> i-window+1 <= s <= i)`` — pure higher-order
   array functions, no Python); survivors rejoin with single spaces.

Three shuffles total (hash count, per-doc starts, doc back-join), each
linear in corpus size. Window hashing, coverage, and the cleaned text
are all SQL-expressible, so the whole operator is oracle-checked
end-to-end (probe ``tx_substr_dedup`` hash-gates the distinct-md5 of
every cleaned text). md5 is used for cross-engine oracle parity; a
production run at 100 TB would swap in ``xxhash64`` (half the key
bytes, same plan shape).

Output text is NORMALIZED (lowercase, collapsed whitespace) — the
same canonical form every dedup operator in this family keys on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tok_expr(text_col: str) -> str:
    """Normalized whitespace tokens (matches functions.text.tokens and
    the oracle's string_split(_norm) exactly)."""
    return f"split(regexp_replace(lower(trim({text_col})), '\\\\s+', ' '), ' ')"


def _windows_expr(text_col: str, window: int) -> str:
    """Array of md5(window) for every rolling ``window``-token slice
    (empty for NULL / empty / shorter-than-window docs)."""
    t = _tok_expr(text_col)
    return (
        f"CASE WHEN {text_col} IS NULL OR size({t}) < {window} "
        f"OR (size({t}) = 1 AND element_at({t}, 1) = '') THEN array() "
        f"ELSE transform(sequence(1, size({t}) - {window} + 1), "
        f"s -> md5(array_join(slice({t}, s, {window}), ' '))) END"
    )


def window_hashes(
    df: DataFrame, id_col: str, text_col: str, window: int = 8
) -> DataFrame:
    """(id, pos, whash): one row per rolling window; ``pos`` is the
    1-based start token index. Narrow fan-out — no shuffle."""
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.expr(_windows_expr(text_col, window))).alias("pos0", "whash"),
    ).select("id", (F.col("pos0") + 1).alias("pos"), "whash")


def duplicated_window_hashes(
    df: DataFrame, id_col: str, text_col: str, window: int = 8
) -> DataFrame:
    """(whash, cnt) for every window occurring >= 2 times corpus-wide
    (across documents OR repeated within one). One partial-aggregated
    shuffle on the hash."""
    return (
        window_hashes(df, id_col, text_col, window)
        .groupBy("whash")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 2)
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 8,
    method: str = "fold",
    hashes: DataFrame | None = None,
    duplicated: DataFrame | None = None,
) -> DataFrame:
    """ExactSubstr removal: drop every token covered by >= 1 duplicated
    window; returns the input columns plus

    - ``clean_text``  — surviving tokens joined with single spaces
      (normalized form; empty string when everything was duplicated),
    - ``n_tokens``    — token count before removal,
    - ``n_removed``   — tokens dropped.

    Documents shorter than ``window`` tokens pass through untouched (no
    window can cover them — same as the paper).

    ``method`` picks the coverage stage (identical output, pinned by
    test_corpus_ops equivalence):

    - ``'fold'`` (default): per-doc duplicated starts collect into one
      array and a higher-order ``filter(exists(...))`` drops covered
      tokens — zero extra shuffles, but the coverage term is
      O(len x dup_starts) PER DOC. The right plan when documents are
      chunk-sized (the usual case after chunking/packing).
    - ``'explode'``: duplicated windows explode to their covered
      positions (bounded x``window`` fan-out), tokens posexplode, an
      anti-join on (id, pos) keeps survivors, and an ordered regroup
      rebuilds the text. Two more shuffles, but every stage is linear
      in tokens — the plan for book-length documents where a single
      doc's len x starts product would blow up an executor.

    Pass precomputed (ideally persisted) ``hashes`` (window_hashes
    output) and/or ``duplicated`` (duplicated_window_hashes output) to
    avoid re-deriving them when the caller also aggregates over them
    (probe tx_substr_dedup does)."""
    wh = (
        hashes
        if hashes is not None
        else window_hashes(df, id_col, text_col, window)
    )
    dup = (
        duplicated
        if duplicated is not None
        else wh.groupBy("whash")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 2)
    ).select("whash")
    toks = F.expr(_tok_expr(text_col))
    base = df.withColumn("_toks", toks)

    if method == "fold":
        # the duplicated-hash set scales with the corpus — never broadcast
        starts = (
            wh.join(dup.hint("shuffle_hash"), "whash")
            .groupBy("id")
            .agg(F.collect_list("pos").alias("_dstarts"))
            .withColumnRenamed("id", "_sd_id")
        )
        joined = base.join(
            starts, base[id_col] == starts["_sd_id"], "left"
        ).drop("_sd_id")
        ds = F.coalesce(F.col("_dstarts"), F.array())
        keep = F.filter(
            "_toks",
            lambda x, i: ~F.exists(
                ds,
                lambda s: (s <= i + 1) & (s >= i + 2 - window),
            ),
        )
        return (
            joined.withColumn("clean_text", F.array_join(keep, " "))
            .withColumn("n_tokens", F.size("_toks").cast("bigint"))
            .withColumn(
                "n_removed",
                (F.size("_toks") - F.size(keep)).cast("bigint"),
            )
            .drop("_toks", "_dstarts")
        )
    if method == "explode":
        covered = (
            wh.join(dup.hint("shuffle_hash"), "whash")
            .select(
                "id",
                F.explode(
                    F.sequence(F.col("pos"), F.col("pos") + window - 1)
                ).alias("pos"),
            )
            .distinct()
        )
        tokd = base.select(
            F.col(id_col).alias("id"), F.posexplode("_toks").alias("pos0", "tok")
        ).select("id", (F.col("pos0") + 1).alias("pos"), "tok")
        kept = (
            tokd.join(covered.hint("shuffle_hash"), ["id", "pos"], "left_anti")
            .groupBy("id")
            .agg(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                        lambda x: x["tok"],
                    ),
                    " ",
                ).alias("_ct"),
                F.count(F.lit(1)).alias("_nk"),
            )
            .withColumnRenamed("id", "_sd_id")
        )
        joined = base.join(
            kept, base[id_col] == kept["_sd_id"], "left"
        ).drop("_sd_id")
        return (
            joined.withColumn("clean_text", F.coalesce("_ct", F.lit("")))
            .withColumn("n_tokens", F.size("_toks").cast("bigint"))
            .withColumn(
                "n_removed",
                (F.size("_toks") - F.coalesce("_nk", F.lit(0))).cast("bigint"),
            )
            .drop("_toks", "_ct", "_nk")
        )
    raise ValueError(f"unknown method: {method!r}")
