"""Corpus curation pipeline: the user-facing composition of the
training-data operators — quality filter -> exact dedup -> near-dup
dedup -> token accounting — as one DataFrame-in, DataFrame-out call
plus a funnel-stats frame.

This is the shape a pretraining data pipeline actually runs at 100 TB:
each stage is a narrow transformation or a bucketed join from
operators/ (no new shuffle classes introduced here), so the composed
plan inherits the per-operator scale properties. Stage semantics are
deliberately SQL-expressible so the whole funnel is oracle-checkable
end to end (probe ``llp_curation_funnel``).

Near-dup survivor rule: a document is dropped iff some near-dup PAIR
links it to a smaller-id document ("keep first"). This is the standard
greedy approximation — exact cluster-level dedup needs connected
components (see the iterative operator in operators/components.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ensembl_database_loader_spark.functions.text import normalize_text, tokens
from ensembl_database_loader_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_prefix,
)
from ensembl_database_loader_spark.operators.textstats import with_quality_score


def _near_dup_pairs(
    exact: DataFrame, strategy: str, jaccard_threshold: float
) -> DataFrame:
    """The strategy-selectable near-dup stage over the exact-dedup
    survivors; every strategy returns (id1, id2, jaccard >= threshold).

    - ``prefix`` (default): PPJoin prefix-filtered exact Jaccard —
      identical pairs to ``inverted`` (equivalence-tested) but hot
      shingles never enter the index, so a heavy-tailed real corpus
      can't blow up the freq^2 join term. The safe default at 100 TB.
    - ``inverted``: plain inverted-index exact Jaccard — one shuffle
      cheaper; fine when the shingle frequency tail is known benign
      (e.g. pre-filtered or synthetic corpora).
    - ``minhash``: MinHash-LSH candidates verified by exact Jaccard —
      sub-linear candidate generation; precision stays exact (verify
      step) but recall follows the LSH S-curve, so the kept set can
      only GROW vs the exact strategies (fewer detected pairs =>
      fewer drops)."""
    if strategy == "prefix":
        return ngram_jaccard_pairs_prefix(
            exact, "id", "text", "blk", n=3, threshold=jaccard_threshold
        )
    if strategy == "inverted":
        return ngram_jaccard_pairs(
            exact, "id", "text", "blk", n=3, threshold=jaccard_threshold
        )
    if strategy == "minhash":
        from ensembl_database_loader_spark.operators.dedup import (
            minhash_lsh_candidates,
        )

        # restrict LSH candidates to the same block before the exact
        # verify — the funnel's near-dup stage is block-scoped in every
        # strategy (the unblocked operator would drop cross-block
        # near-dups the exact strategies never consider)
        blk = exact.select("id", "blk")
        cand = (
            minhash_lsh_candidates(exact, "id", "text", n=3)
            .join(
                blk.select(F.col("id").alias("id1"), F.col("blk").alias("_b1")),
                "id1",
            )
            .join(
                blk.select(F.col("id").alias("id2"), F.col("blk").alias("_b2")),
                "id2",
            )
            .filter(F.col("_b1") == F.col("_b2"))
            .select("id1", "id2")
        )
        return minhash_lsh_pairs(
            exact, "id", "text", threshold=jaccard_threshold, n=3, candidates=cand
        )
    raise ValueError(
        f"unknown near_dup strategy {strategy!r}; "
        "expected 'prefix' | 'inverted' | 'minhash'"
    )


def curate_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str = "lang",
    min_quality: int = 2,
    jaccard_threshold: float = 0.8,
    cluster_exact: bool = False,
    near_dup: str = "prefix",
) -> tuple[DataFrame, DataFrame]:
    """Run the curation funnel; returns (kept_docs, stats).

    Stages:
    1. quality: heuristic score (length/diversity/token-shape) >= min_quality
    2. exact:   one survivor per normalized text (smallest id wins —
                deterministic, unlike dropDuplicates' arbitrary pick)
    3. neardup: pair generation per ``near_dup`` strategy
                ('prefix' default | 'inverted' | 'minhash' — see
                ``_near_dup_pairs`` for the trade-offs; 'prefix' and
                'inverted' produce identical pairs, 'minhash' is the
                sub-linear approximate path). Survivor rule:
                ``cluster_exact=False`` (default) drops any doc with a
                >=threshold Jaccard pair to ANY smaller-id document
                (whether or not that document itself survives — the
                keep-first greedy rule, matching the oracle);
                ``cluster_exact=True`` computes
                connected components of the pair graph and keeps only
                each cluster's minimum id (exact, costs O(diameter)
                extra rounds)

    ``stats`` is a 1-row frame: n_input, n_quality, n_exact, n_kept,
    tokens_kept — the funnel numbers every curation run reports."""
    base = df.select(F.col(id_col).alias("id"), F.col(block_col).alias("blk"), F.col(text_col).alias("text"))

    quality = with_quality_score(base, "text").filter(
        F.col("quality_score") >= min_quality
    ).select("id", "blk", "text")

    # exact dedup, smallest id per normalized text (deterministic)
    from pyspark.sql import Window

    w = Window.partitionBy(normalize_text("text")).orderBy("id")
    # the survivor frame is referenced by the pair join (both sides),
    # the keep anti-join, and two stats aggregates — persist so the
    # quality+window pipeline runs once. Freed when the returned frames
    # are garbage-collected (ContextCleaner) or on catalog.clearCache();
    # at 100 TB use persist(DISK_ONLY) or a materialized stage table.
    exact = (
        quality.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .persist()
    )

    pairs = _near_dup_pairs(exact, near_dup, jaccard_threshold)
    if cluster_exact:
        # exact cluster-level dedup: transitive closure of the pair
        # graph, keep the minimum id of every component
        from ensembl_database_loader_spark.operators.components import (
            connected_components,
        )

        labels = connected_components(exact.select("id"), pairs.select("id1", "id2"))
        survivors = labels.filter(F.col("id") == F.col("component")).select("id")
        kept = exact.join(survivors, "id", "left_semi")
    else:
        # keep-first greedy: drop any doc a pair links to a smaller id
        dropped = pairs.select(F.col("id2").alias("id")).distinct()
        kept = exact.join(dropped, "id", "left_anti")

    stats = (
        base.agg(F.count(F.lit(1)).alias("n_input"))
        .crossJoin(quality.agg(F.count(F.lit(1)).alias("n_quality")))
        .crossJoin(exact.agg(F.count(F.lit(1)).alias("n_exact")))
        .crossJoin(
            kept.agg(
                F.count(F.lit(1)).alias("n_kept"),
                F.sum(F.size(tokens("text"))).cast("bigint").alias("tokens_kept"),
            )
        )
    )
    return kept, stats
