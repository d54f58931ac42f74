"""N-gram language-model perplexity scoring — the CCNet-style quality
filter (Wenzek et al. 2020 score web text with a KenLM model and keep
the low-perplexity head; the heuristic filters in textstats.py are the
cheap first pass, this is the model-based second pass).

Spark formulation, fully DataFrame-side and oracle-replicable:

- ``train_bigram_lm``: unigram + bigram counts over the reference
  corpus — two partial-aggregated groupBys (token explode is a narrow
  fan-out). The vocabulary size rides along for smoothing.
- ``score_bigram_logprob``: every document's mean add-alpha-smoothed
  bigram log-probability
  ``mean over i of ln((c(w_i, w_i+1) + alpha) / (c(w_i) + alpha * V))``
  — doc bigrams explode (narrow), two count joins (``shuffle_hash``:
  count tables scale with the reference corpus, so they must never
  broadcast), one per-doc aggregate. Unseen bigrams/unigrams fall back
  to the same smoothed mass (COALESCE 0), so scoring is total.
- ``perplexity_filter``: keep documents with mean logprob above a
  threshold (equivalently perplexity = exp(-mean) below exp(-t)).

The probabilities are exact rationals of BIGINT counts; the only
doubles are the final ``ln`` calls, which both engines evaluate on
identical inputs (probe rounds the aggregate to 3 decimals).

At 100 TB: training is two linear shuffles over the reference corpus
(typically a SAMPLE — pass any DataFrame); scoring is linear in corpus
bigrams with the two count joins shuffle-partitioned on the token key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ensembl_database_loader_spark.functions.text import tokens


def _doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, w1, w2) for every adjacent token pair (docs with < 2
    tokens produce no rows)."""
    t = tokens(text_col)
    pairs = F.expr(
        "CASE WHEN size(_t) < 2 THEN array() ELSE "
        "transform(sequence(1, size(_t) - 1), "
        "i -> struct(element_at(_t, i) AS w1, element_at(_t, i + 1) AS w2)) END"
    )
    return (
        df.withColumn("_t", t)
        .select(F.col(id_col).alias("id"), F.posexplode(pairs).alias("pos0", "bg"))
        .select(
            "id",
            (F.col("pos0") + 1).alias("pos"),
            F.col("bg.w1").alias("w1"),
            F.col("bg.w2").alias("w2"),
        )
    )


def train_bigram_lm(
    ref: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int]:
    """(unigram_counts(w, uc), bigram_counts(w1, w2, bc), vocab_size)
    over the reference corpus. Two partial-aggregated shuffles; the
    vocabulary size is the one scalar collected (broadcast-dim
    pattern). The empty token (``tokens`` on empty/whitespace-only text
    yields ``['']``) is excluded from the unigram table and V — same
    convention as ``train_kn_bigram_lm`` and ``bpe.word_frequencies``,
    so the two trainers agree on the vocabulary and add-alpha mass is
    never spent on a non-word."""
    t = tokens(text_col)
    uni = (
        ref.select(F.explode(t).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("uc"))
    )
    bi = (
        _doc_bigrams(ref.select(F.lit(0).alias("_id"), text_col), "_id", text_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("bc"))
    )
    vocab = uni.count()
    return uni, bi, int(vocab)


def score_bigram_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str,
    unigrams: DataFrame,
    bigrams: DataFrame,
    vocab_size: int,
    alpha: float = 1.0,
) -> DataFrame:
    """Attach ``mean_logprob`` (mean smoothed bigram ln-probability;
    NULL for docs with < 2 tokens) and ``n_bigrams`` to every document.

    add-alpha smoothing keeps every probability strictly inside (0, 1):
    p(w2 | w1) = (bc + alpha) / (uc + alpha * V).
    """
    bg = _doc_bigrams(df, id_col, text_col)
    scored = (
        bg.join(bigrams.hint("shuffle_hash"), ["w1", "w2"], "left")
        .join(
            unigrams.hint("shuffle_hash").withColumnRenamed("w", "w1"),
            "w1",
            "left",
        )
        .select(
            "id",
            F.log(
                (F.coalesce("bc", F.lit(0)) + F.lit(float(alpha)))
                / (F.coalesce("uc", F.lit(0)) + F.lit(float(alpha * vocab_size)))
            ).alias("_lp"),
        )
        .groupBy("id")
        .agg(
            F.avg("_lp").alias("mean_logprob"),
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        )
        .withColumnRenamed("id", "_lm_id")
    )
    return df.join(
        scored, df[id_col] == scored["_lm_id"], "left"
    ).drop("_lm_id")


def perplexity_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    unigrams: DataFrame,
    bigrams: DataFrame,
    vocab_size: int,
    min_mean_logprob: float,
    alpha: float = 1.0,
) -> DataFrame:
    """Keep documents whose mean bigram log-probability is >= the
    threshold (= perplexity <= exp(-threshold)). Docs with < 2 tokens
    have no score and are dropped (no evidence — the CCNet convention
    is to route them to the 'unknown' bucket; callers wanting to keep
    them filter ``mean_logprob IS NULL`` separately)."""
    scored = score_bigram_logprob(
        df, id_col, text_col, unigrams, bigrams, vocab_size, alpha
    )
    return scored.filter(F.col("mean_logprob") >= min_mean_logprob)


def train_kn_bigram_lm(
    ref: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame, int, int]:
    """Interpolated Kneser-Ney statistics over the reference corpus —
    the smoothing KenLM (and hence CCNet's quality filter) actually
    uses, next to the add-alpha baseline of ``train_bigram_lm``: the
    lower-order distribution is the CONTINUATION probability (how many
    distinct contexts a word completes), not raw frequency, so
    boilerplate-frequent-but-context-bound words stop inflating
    backoff mass.

    Returns ``(bigrams, contexts, continuations, n_bigram_types,
    vocab_size)``:

    - ``bigrams (w1, w2, bc)``   — bigram counts;
    - ``contexts (w1, c1, n1f)`` — per-context total bigram count and
      distinct-successor count N1+(w1, .): ONE partial-aggregated
      groupBy over the bigram table (bigram-types-sized, not corpus);
    - ``continuations (w2, n1b)`` — distinct-predecessor count
      N1+(., w2), the continuation numerator;
    - ``n_bigram_types``         — N1+(. .), the continuation
      denominator; ``vocab_size`` for the +1/(B+V) uniform floor that
      keeps scoring total (strictly positive for OOV words).

    Every statistic is a BIGINT count, so scoring probabilities are
    exact rationals until the final ln — the oracle-replicability
    contract of this module."""
    t = tokens(text_col)
    bi = (
        _doc_bigrams(ref.select(F.lit(0).alias("_id"), text_col), "_id", text_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("bc"))
    )
    bi = bi.localCheckpoint()  # three consumers: cut the recompute
    ctx = bi.groupBy("w1").agg(
        F.sum("bc").cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("n1f"),
    )
    cont = bi.groupBy("w2").agg(F.count(F.lit(1)).cast("bigint").alias("n1b"))
    n_bigram_types = bi.count()
    vocab = (
        ref.select(F.explode(t).alias("w"))
        .filter(F.col("w") != "")
        .agg(F.countDistinct("w"))
        .collect()[0][0]
    )
    return bi, ctx, cont, int(n_bigram_types), int(vocab)


def score_kn_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bigrams: DataFrame,
    contexts: DataFrame,
    continuations: DataFrame,
    n_bigram_types: int,
    vocab_size: int,
    discount: float = 0.75,
) -> DataFrame:
    """Attach ``mean_logprob`` (mean interpolated-Kneser-Ney bigram
    ln-probability; NULL for docs with < 2 tokens) and ``n_bigrams``.

    P(w2|w1) = max(bc - D, 0)/c1 + D * N1+(w1,.)/c1 * Pcont(w2) for a
    seen context, Pcont(w2) alone for an unseen one, with
    Pcont(w2) = (N1+(., w2) + 1) / (B + V) — the +1/(B+V) uniform floor
    makes scoring total (an OOV word still gets positive mass). The
    expression is written ONCE and mirrored character-for-character in
    the SQL oracle, so both engines run the identical IEEE operation
    sequence on identical BIGINT-count inputs.

    Joins are ``shuffle_hash`` on the token keys — the three count
    tables scale with the reference corpus and must never be built
    driver-side on a misestimate (the operators/dedup.py posture)."""
    if not 0.0 < discount < 1.0:
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    bg = _doc_bigrams(df, id_col, text_col)
    d = F.lit(float(discount))
    denom = F.lit(float(n_bigram_types + vocab_size))
    pcont = (F.coalesce("n1b", F.lit(0)) + F.lit(1.0)) / denom
    # explicit COALESCE, not greatest-over-null: engines disagree on
    # GREATEST's null semantics, and the oracle must mirror exactly
    seen = (
        F.greatest(F.coalesce("bc", F.lit(0)) - d, F.lit(0.0)) / F.col("c1")
        + d * F.col("n1f") / F.col("c1") * pcont
    )
    p = F.when(F.col("c1").isNotNull(), seen).otherwise(pcont)
    scored = (
        bg.join(bigrams.hint("shuffle_hash"), ["w1", "w2"], "left")
        .join(contexts.hint("shuffle_hash"), "w1", "left")
        .join(continuations.hint("shuffle_hash"), "w2", "left")
        .select("id", F.log(p).alias("_lp"))
        .groupBy("id")
        .agg(
            F.avg("_lp").alias("mean_logprob"),
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        )
        .withColumnRenamed("id", "_lm_id")
    )
    return df.join(
        scored, df[id_col] == scored["_lm_id"], "left"
    ).drop("_lm_id")
