"""Paragraph-granularity corpus dedup: remove REPEATED paragraphs
across the whole corpus, keep documents.

Document-level dedup (exact / MinHash / SemDeDup — ``operators/
dedup.py``, ``operators/similarity.py``) drops whole near-identical
documents, but the dominant duplication in crawled training data is
sub-document: boilerplate headers/footers/cookie banners and quoted
passages repeated across millions of otherwise-distinct pages. The
RefinedWeb/CCNet-style answer is paragraph dedup: split every document
on a separator, keep only the FIRST occurrence of each distinct
paragraph corpus-wide, and stitch the survivors back into documents.
(``operators/substrdedup.py`` is the finer-grained token-span variant;
``operators/textclean.py`` drops boilerplate LINES per-document by
frequency. This operator is the corpus-wide middle granularity.)

Spark shape (three linear shuffles, all skew-safe):

1. ``posexplode(split(text, sep))`` — map-side; position is kept so
   reconstruction preserves document order.
2. First occurrence per paragraph hash via ``groupBy(hash).agg(
   min(struct(id, pos)))`` — PARTIAL-AGGREGATED map-side, so the
   boilerplate paragraph that appears in half the corpus (the exact
   row this operator exists for) reduces to one row per input
   partition before it ever shuffles. A window/row_number formulation
   would instead sort that paragraph's entire occurrence list on one
   reducer — the skew trap.
3. Join occurrences to their hash's canonical (id, pos) to decide
   survival (``shuffle_hash`` hint: the occurrence side is corpus-
   sized and UDF-opaque-stats-free here, but the firsts side is
   distinct-paragraphs-sized — possibly corpus-sized too — so never
   let a misestimated broadcast build it driver-side; same posture as
   operators/dedup.py), then ``groupBy(id)`` + ordered array_join to
   rebuild texts, and one id-equi-join to reattach the untouched
   payload columns.

Short paragraphs (< ``min_chars``) are exempt — "Introduction" or a
bare number repeating corpus-wide is structure, not duplication, and
removing it everywhere-but-once would mangle documents.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
) -> DataFrame:
    """(id, pos, para) — one row per paragraph, 0-based document order.
    Pure map-side (posexplode over a literal-separator split)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), re.escape(sep))).alias("pos", "para"),
    )


def dedup_paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
    min_chars: int = 1,
) -> DataFrame:
    """Rewrite ``text_col`` with every non-first corpus-wide occurrence
    of each paragraph removed (first = smallest (id, pos)); all other
    columns pass through untouched. Adds ``paras_kept`` /
    ``paras_removed`` per-document counters (the accounting a curation
    funnel records). A document whose every paragraph was seen before
    keeps its row with empty text — dropping documents is a separate
    policy decision (filter on paras_kept == 0 downstream).

    Paragraphs shorter than ``min_chars`` are always kept. Determinism:
    survival depends only on (paragraph bytes, id, pos) — layout- and
    engine-independent, so reruns and the SQL oracle agree row-for-row.
    """
    if min_chars < 0:
        raise ValueError(f"min_chars must be >= 0, got {min_chars}")
    for c in (id_col, text_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in {df.columns}")
    # sha2-256 key: at 100 TB the corpus holds ~trillions of paragraphs,
    # where 64-bit hashes WILL collide (birthday bound ~4B) and silently
    # merge distinct paragraphs; 256 bits makes collision negligible, so
    # grouping by the digest is exact without shuffling paragraph text
    # into the aggregate
    # collision-proof internal aliases: '__pd_id' never collides with a
    # payload column, and only the alias is dropped at the end — so
    # id_col='id', or a payload column literally named 'id' alongside
    # doc_id, passes through untouched
    paras = split_paragraphs(df, id_col, text_col, sep).select(
        F.col("id").alias("__pd_id"), "pos", "para"
    ).withColumn("_h", F.sha2("para", 256))
    firsts = paras.groupBy("_h").agg(
        F.min(F.struct(F.col("__pd_id").alias("id"), "pos")).alias("_first")
    )
    kept = (
        paras.join(firsts.hint("shuffle_hash"), "_h")
        .where(
            (F.length("para") < F.lit(min_chars))
            | (
                (F.col("__pd_id") == F.col("_first.id"))
                & (F.col("pos") == F.col("_first.pos"))
            )
        )
        .select("__pd_id", "pos", "para")
    )
    rebuilt = kept.groupBy("__pd_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda x: x["para"],
            ),
            sep,
        ).alias("_new_text"),
        F.count(F.lit(1)).cast("bigint").alias("paras_kept"),
    )
    n_paras = F.size(F.split(F.col(text_col), re.escape(sep))).cast("bigint")
    return (
        df.join(rebuilt, df[id_col] == rebuilt["__pd_id"], "left")
        .withColumn("paras_kept", F.coalesce("paras_kept", F.lit(0).cast("bigint")))
        .withColumn("paras_removed", n_paras - F.col("paras_kept"))
        .withColumn(text_col, F.coalesce("_new_text", F.lit("")))
        .drop("__pd_id", "_new_text")
    )
