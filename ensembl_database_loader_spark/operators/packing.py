"""Sequence packing: bin documents into fixed token-budget training
sequences (the "example packing" step of LLM pre-training pipelines —
wasted pad tokens are wasted FLOPs, so documents are packed
first-fit-decreasing into budget-sized bins before tokenized export).

Distribution strategy (the part that matters at 100 TB): packing is a
bin-packing problem, which is NP-hard globally but embarrassingly
parallel when applied per-shard — production pipelines pack within
shards, accepting a bounded waste factor, because a global pack would
serialize the corpus. We shard documents by a DETERMINISTIC id hash
(operators/mixing.keyed_hash, not ``spark_partition_id()`` — layouts
must not change the output), then run first-fit-decreasing inside each
shard via ``applyInPandas``. Each shard's work is O(n_docs_in_shard *
n_open_bins) with numpy bookkeeping; shards pack concurrently.

Guarantees (the probe's hash-gated contract):
- every document appears in exactly one pack;
- no pack exceeds the budget (oversize documents — tokens > budget —
  get a dedicated single-doc pack, flagged ``oversize``);
- per shard, FFD with items <= budget leaves at most one bin at most
  half-full (any two bins together exceed the budget), so
  ``n_packs_shard <= floor(2 * total_tokens_shard / budget) + 1`` —
  an exactly-SQL-computable bound the oracle can check.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ensembl_database_loader_spark.operators.mixing import keyed_hash

_SCHEMA = (
    "shard int, pack_id bigint, id bigint, n_tokens bigint, oversize boolean"
)


def _ffd_pack(pdf: pd.DataFrame, budget: int) -> pd.DataFrame:
    """First-fit-decreasing within one shard. Deterministic: items are
    sorted (n_tokens desc, id asc) and bins probed in creation order."""
    pdf = pdf.sort_values(["n_tokens", "id"], ascending=[False, True])
    shard = int(pdf["shard"].iloc[0]) if len(pdf) else 0
    bins: list[int] = []  # remaining capacity per open bin
    out_pack: list[int] = []
    out_over: list[bool] = []
    for tok in pdf["n_tokens"].to_numpy():
        t = int(tok)
        if t > budget:
            bins.append(-1)  # closed oversize bin
            out_pack.append(len(bins) - 1)
            out_over.append(True)
            continue
        for i, cap in enumerate(bins):
            if cap >= t:
                bins[i] = cap - t
                out_pack.append(i)
                break
        else:
            bins.append(budget - t)
            out_pack.append(len(bins) - 1)
        out_over.append(False)
    return pd.DataFrame(
        {
            "shard": shard,
            # globally-unique pack id: shard * 2^32 + local bin index
            "pack_id": [shard * (2**32) + p for p in out_pack],
            "id": pdf["id"].to_numpy(),
            "n_tokens": pdf["n_tokens"].to_numpy(),
            "oversize": out_over,
        }
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    n_shards: int = 8,
) -> DataFrame:
    """Assign every document to a pack: ``(shard, pack_id, id,
    n_tokens, oversize)``. ``tokens_col`` is a precomputed token count
    (see operators/textstats.with_token_stats); budget is the training
    sequence length. One shuffle (the shard groupBy); packing itself is
    shard-local Python over Arrow batches."""
    prepared = df.select(
        keyed_hash(id_col, n_shards).cast("int").alias("shard"),
        F.col(id_col).cast("bigint").alias("id"),
        F.col(tokens_col).cast("bigint").alias("n_tokens"),
    )
    return prepared.groupBy("shard").applyInPandas(
        lambda pdf: _ffd_pack(pdf, budget), _SCHEMA
    )


def packing_report(packed: DataFrame, budget: int) -> DataFrame:
    """One-row audit of a ``pack_sequences`` result: doc/pack/token
    totals plus the hash-gateable contract booleans (no overflow, FFD
    per-shard pack-count bound, full coverage)."""
    per_pack = packed.groupBy("shard", "pack_id").agg(
        F.sum("n_tokens").alias("pack_tokens"),
        F.max(F.col("oversize").cast("int")).alias("has_oversize"),
    )
    per_shard = per_pack.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("pack_tokens").alias("shard_tokens"),
        F.sum("has_oversize").alias("n_oversize"),
    )
    shard_ok = per_shard.agg(
        F.min(
            # regular packs obey the FFD 2x bound; oversize packs are
            # one-doc bins excluded from it
            (
                F.col("n_packs") - F.col("n_oversize")
                <= F.floor(F.lit(2) * F.col("shard_tokens") / F.lit(budget))
                + F.lit(1)
            ).cast("int")
        ).alias("ffd_bound_ok")
    )
    overflow_ok = per_pack.agg(
        F.min(
            ((F.col("pack_tokens") <= budget) | (F.col("has_oversize") == 1)).cast(
                "int"
            )
        ).alias("no_overflow")
    )
    totals = packed.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("id").alias("n_distinct_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.countDistinct("shard", "pack_id").alias("n_packs"),
        # the lower bound must count oversize docs as their own packs,
        # not by their token mass: one 10x-budget doc is ONE pack, while
        # ceil(total/budget) would demand ten
        F.sum(F.when(~F.col("oversize"), F.col("n_tokens")).otherwise(0)).alias(
            "_regular_tokens"
        ),
        F.sum(F.col("oversize").cast("int")).alias("_n_oversize"),
    )
    return (
        totals.crossJoin(shard_ok)
        .crossJoin(overflow_ok)
        .select(
            "n_docs",
            "total_tokens",
            (F.col("n_docs") == F.col("n_distinct_docs")).alias("each_doc_once"),
            (F.col("no_overflow") == 1).alias("no_overflow"),
            (F.col("ffd_bound_ok") == 1).alias("ffd_bound_ok"),
            (
                F.col("n_packs")
                >= F.ceil(F.col("_regular_tokens") / F.lit(budget))
                + F.col("_n_oversize")
            ).alias("above_lower_bound"),
        )
    )


__all__: Iterable[str] = ("pack_sequences", "packing_report")


def pack_concat(
    df: DataFrame,
    id_col: str,
    token_col: str,
    seq_len: int,
    n_shards: int = 64,
    eos_tokens: int = 1,
) -> DataFrame:
    """GPT-style concatenation packing — the OTHER standard packing
    scheme next to FFD binning (``pack_sequences``): each shard's
    documents concatenate into one token stream (every document
    followed by ``eos_tokens`` separator tokens) and training examples
    are fixed ``seq_len`` windows cut from the stream; documents SPAN
    example boundaries (that is the point — zero padding waste).

    Returns the input columns plus:

    - ``shard``          — deterministic id-hash shard;
    - ``start_offset``   — the document body's first token position in
      the shard stream (cumsum of prior docs' n_tokens + eos);
    - ``first_example`` / ``last_example`` — the example indices the
      body touches (``floor(start / seq_len)`` /
      ``floor((start + max(n_tokens,1) - 1) / seq_len)``);
    - ``spans_boundary`` — whether the body crosses an example cut.

    Everything after the shard shuffle is ONE window cumsum per shard
    (pure BIGINT arithmetic, so the DuckDB oracle matches row-level) —
    the same bounded-shard pattern as FFD packing: choose ``n_shards``
    so a shard's documents fit one task comfortably; shards pack
    concurrently and the ordering key (knuth32(id), id) makes the
    layout irrelevant."""
    from pyspark.sql import Window

    from ensembl_database_loader_spark.operators.mixing import knuth32

    work = df.withColumn("_h", knuth32(id_col)).withColumn(
        "shard", keyed_hash(id_col, n_shards).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("_h", id_col)
    start = F.coalesce(
        F.sum(F.col(token_col) + F.lit(eos_tokens)).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    ).cast("bigint")
    out = (
        work.withColumn("start_offset", start)
        # integer DIV, not double division: keeps the example-index
        # arithmetic genuinely BIGINT-exact as documented (float division
        # loses exactness near 2^52-scale stream offsets)
        .withColumn("first_example", F.expr(f"start_offset DIV {int(seq_len)}"))
        .withColumn(
            "last_example",
            F.expr(
                f"(start_offset + greatest(`{token_col}`, 1) - 1) DIV {int(seq_len)}"
            ),
        )
        .withColumn(
            "spans_boundary", F.col("first_example") != F.col("last_example")
        )
        .drop("_h")
    )
    return out


def materialize_examples(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    seq_len: int,
    n_shards: int = 64,
    eos=None,
) -> DataFrame:
    """Cut the ACTUAL fixed-length training examples out of each
    shard's concatenated token stream — the materialization step after
    ``pack_concat``'s offset arithmetic: where pack_concat says which
    example indices a document touches, this emits the examples
    themselves, ``(shard, example, tokens, n_tokens, n_docs,
    complete)``, with documents spanning example boundaries (zero
    padding waste — the GPT-style packing contract).

    ``tokens_col`` is the document's token ARRAY (BPE ids from
    ``bpe.encode_corpus`` or any other element type — the slicing is
    type-agnostic); ``eos`` (appended per document when not None) must
    be the same element type. Only the stream's final example can be
    shorter than ``seq_len`` (``complete = false``).

    Spark shape: the per-document fragment list is pure JVM array
    arithmetic (``transform(sequence(first_ex, last_ex), slice(...))``
    over the pack_concat offsets — no Python, no per-token rows), then
    ONE shuffle groups fragments by (shard, example) and flattens them
    in stream order. Fragment count per document is
    ceil(len/seq_len)+1, so the exploded frame is barely larger than
    the corpus; per-example state is bounded by seq_len."""
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    work = pack_concat(
        df.select(
            F.col(id_col).alias("__me_id"),
            F.col(tokens_col).alias("__me_toks"),
            F.size(tokens_col).cast("bigint").alias("__me_n"),
        ),
        "__me_id",
        "__me_n",
        seq_len,
        n_shards=n_shards,
        eos_tokens=0 if eos is None else 1,
    )
    ext = (
        F.col("__me_toks")
        if eos is None
        else F.concat("__me_toks", F.array(F.lit(eos)))
    )
    start = F.col("start_offset")
    L = F.size(ext).cast("bigint")
    frags = F.transform(
        F.sequence(
            F.expr(f"start_offset DIV {int(seq_len)}"),
            F.expr(
                f"(start_offset + __me_len - 1) DIV {int(seq_len)}"
            ),
        ),
        lambda e: F.struct(
            e.alias("ex"),
            F.greatest(e * seq_len, start).alias("fpos"),
            F.slice(
                ext,
                (F.greatest(e * seq_len - start, F.lit(0)) + 1).cast("int"),
                (
                    F.least((e + 1) * seq_len, start + L)
                    - F.greatest(e * seq_len, start)
                ).cast("int"),
            ).alias("part"),
        ),
    )
    exploded = (
        work.withColumn("__me_len", L)
        .filter(F.col("__me_len") > 0)
        .select("shard", F.explode(frags).alias("f"))
        .select("shard", "f.ex", "f.fpos", "f.part")
    )
    per_ex = exploded.groupBy("shard", F.col("ex").alias("example")).agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("fpos", "part"))),
                lambda x: x["part"],
            )
        ).alias("tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )
    return per_ex.select(
        "shard",
        "example",
        "tokens",
        F.size("tokens").cast("bigint").alias("n_tokens"),
        "n_docs",
        (F.size("tokens") == seq_len).alias("complete"),
    )
