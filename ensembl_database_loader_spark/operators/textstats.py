"""Text-analysis operators: language-ID heuristic, quality scoring,
token statistics, document fingerprinting. All JVM-side expressions
(built-ins + higher-order folds), designed to run in a single pass over
a 100 TB documents table (no shuffle until the final aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ensembl_database_loader_spark.functions.text import (
    mean_token_length,
    normalize_text,
    stopword_ratio,
    tokens,
)

#: Tiny per-language stopword lists for the n-gram/stopword heuristic.
#: Deliberately minimal + deterministic (this is a heuristic operator;
#: swap in real profiles for production corpora).
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "y", "que"),
    "fr": ("le", "la", "et", "de", "un"),
    "de": ("der", "die", "und", "das", "ein"),
}


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n_tokens, n_distinct_tokens, mean token length per document."""
    toks = tokens(text_col)
    return df.withColumns(
        {
            "n_tokens": F.size(toks).cast("bigint"),
            "n_distinct_tokens": F.size(F.array_distinct(toks)).cast("bigint"),
            "mean_tok_len": mean_token_length(toks),
        }
    )


#: BPE-style pre-tokenizer pattern (the GPT-2 pre-split shape reduced to
#: engine-portable character classes): letter runs, digit runs, and
#: non-alphanumeric-non-space runs each become one pre-token. Kept to
#: plain ASCII classes so Java regex (Spark) and RE2-ish (DuckDB)
#: tokenize byte-identically.
BPE_PRETOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \\t\\n]+"


def with_regex_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    """BPE-ish pre-tokenization: token count, distinct count, and
    punctuation-run count per document — the tokenizer-cost estimator a
    pretraining pipeline runs before the real BPE pass. Pure JVM regex
    (one codegen'd pass, no Python)."""
    toks = F.expr(
        f"regexp_extract_all(lower({text_col}), '{BPE_PRETOKEN_RE}', 0)"
    )
    return df.withColumns(
        {
            "n_pretokens": F.size(toks).cast("bigint"),
            "n_distinct_pretokens": F.size(F.array_distinct(toks)).cast("bigint"),
            "n_punct_runs": F.size(
                F.filter(toks, lambda t: ~t.rlike("^[a-z0-9]"))
            ).cast("bigint"),
        }
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals per document: (id, n_words,
    top_word_frac, dup_word_frac, top_bigram_frac) — the fraction of
    the doc taken by its most frequent word / bigram and the
    duplicate-word fraction. Boilerplate, keyword-stuffed, and
    generated-loop pages light these up; a pretraining curation stack
    thresholds on them right next to the LL5 quality filters.

    Plan shape: explode words / bigrams -> partially-aggregated
    groupBy counts -> per-doc max+sum — two shuffles keyed by (doc,
    term), both map-side combined, no per-doc value buffering. Bigrams
    come from zip_with over two slices of the token array (JVM-side,
    no UDF)."""
    toks = tokens(text_col)
    base = df.select(F.col(id_col).alias("id"), toks.alias("_t"))
    n = F.size(F.col("_t"))
    bigrams = F.zip_with(
        F.slice("_t", 1, F.greatest(n - 1, F.lit(0))),
        F.slice("_t", 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    base = base.withColumn("_bg", bigrams)

    words = base.select("id", F.explode("_t").alias("w"))
    wstats = (
        words.groupBy("id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(
            F.max("c").alias("_top_w"),
            F.sum("c").alias("n_words"),
            F.count(F.lit(1)).alias("_n_distinct"),
        )
    )
    bg = base.select("id", F.explode("_bg").alias("b"))
    bstats = (
        bg.groupBy("id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(F.max("c").alias("_top_b"), F.sum("c").alias("_n_bg"))
    )
    out = wstats.join(bstats, "id", "left")
    return out.select(
        "id",
        F.col("n_words").cast("bigint").alias("n_words"),
        (F.col("_top_w") / F.col("n_words")).alias("top_word_frac"),
        ((F.col("n_words") - F.col("_n_distinct")) / F.col("n_words")).alias(
            "dup_word_frac"
        ),
        F.coalesce(F.col("_top_b") / F.col("_n_bg"), F.lit(0.0)).alias(
            "top_bigram_frac"
        ),
    )


def crossdoc_boilerplate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_docs: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Cross-document boilerplate detection: word n-grams that recur in
    >= ``min_docs`` DISTINCT documents (headers, footers, license
    blurbs, template chrome) and the per-document contamination they
    cause.

    Returns (boilerplate_ngrams, doc_stats):
    - boilerplate_ngrams: (shingle, n_docs) for every flagged n-gram;
    - doc_stats: (id, n_shingles, n_boilerplate, boilerplate_frac) per
      document (docs shorter than n words have 0/0/0.0).

    Plan shape: distinct-shingle explode -> groupBy shingle with a
    distinct-doc count (partial-aggregated; shingles, not documents,
    cross the wire) -> semi-join back. The flagged set is small by
    construction (an n-gram in >= min_docs docs), so the back-join
    broadcasts at any corpus size."""
    from ensembl_database_loader_spark.functions.text import shingle_udf

    sh = df.select(
        F.col(id_col).alias("id"), shingle_udf(n)(F.col(text_col)).alias("_sh")
    )
    exploded = sh.select("id", F.explode("_sh").alias("shingle"))
    flagged = (
        exploded.groupBy("shingle")
        .agg(F.countDistinct("id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )
    hits = (
        exploded.join(F.broadcast(flagged.select("shingle")), "shingle", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_boilerplate"))
    )
    doc_stats = (
        sh.select("id", F.size("_sh").cast("bigint").alias("n_shingles"))
        .join(hits, "id", "left")
        .select(
            "id",
            "n_shingles",
            F.coalesce("n_boilerplate", F.lit(0)).cast("bigint").alias(
                "n_boilerplate"
            ),
            F.when(F.col("n_shingles") > 0, F.coalesce("n_boilerplate", F.lit(0)) / F.col("n_shingles"))
            .otherwise(F.lit(0.0))
            .alias("boilerplate_frac"),
        )
    )
    return flagged, doc_stats


def with_quality_score(
    df: DataFrame,
    text_col: str = "text",
    min_chars: int = 100,
    max_chars: int = 400,
) -> DataFrame:
    """Heuristic quality score in [0, 3]: length-in-bounds + lexical
    diversity + sane mean word length. (LL5 family — the kind of filter
    a pretraining pipeline stacks before dedup.)"""
    toks = tokens(text_col)
    n = F.length(F.col(text_col))
    diversity = F.size(F.array_distinct(toks)) / F.greatest(F.size(toks), F.lit(1))
    mtl = mean_token_length(toks)
    score = (
        F.when((n >= min_chars) & (n <= max_chars), 1).otherwise(0)
        + F.when(diversity >= 0.5, 1).otherwise(0)
        + F.when((mtl >= 3.0) & (mtl <= 10.0), 1).otherwise(0)
    )
    return df.withColumn("quality_score", score.cast("int"))


def with_lang_guess(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-profile language guess: the language whose stopword
    ratio is highest, if above 2%; else 'und'. Ties break by language
    code order (deterministic).

    One Arrow-batched pandas UDF pass: tokenizing once and counting all
    profiles per document beats the 4x interpreted higher-order filter
    chain ~5x; the ratio arithmetic (int/int in IEEE double) is
    bit-identical to the JVM/DuckDB twins, so the >-chain tie-break
    (first-in-sorted-order wins, matching the oracle's >= cascade)
    stays oracle-exact."""
    import re

    ws = re.compile(r"[ \t\n\x0b\f\r]+")  # Java \s (ASCII), as in shingle_udf
    profiles = [(lang, frozenset(sws)) for lang, sws in sorted(STOPWORDS.items())]

    @F.pandas_udf("string")
    def _guess(s):  # type: ignore[no-untyped-def]
        def g(x: str) -> str:
            toks = ws.sub(" ", x.strip(" ").lower()).split(" ")
            denom = max(len(toks), 1)
            best_lang, best_r = "und", 0.0
            for lang, sws in profiles:
                r = sum(1 for t in toks if t in sws) / denom
                if r > best_r:
                    best_lang, best_r = lang, r
            return best_lang if best_r >= 0.02 else "und"

        return s.map(g)

    return df.withColumn("lang_guess", _guess(F.col(text_col)))


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: polynomial rolling hash of
    the normalized text (mod 1e9+7). Exact-dedup key cheaper than sha2
    when an oracle-replicable integer is wanted.

    Arrow-batched pandas UDF rather than the JVM higher-order fold:
    the char-at-a-time aggregate() lambda is interpreted (outside
    whole-stage codegen) and ~50x slower than this per-document Python
    loop over an Arrow batch. poly_hash() remains for short strings
    (SimHash tokens) where the fold is cheap."""
    import pandas as pd  # noqa: F401 (pandas_udf batch type)

    @F.pandas_udf("bigint")
    def _fp(s):  # type: ignore[no-untyped-def]
        def h(x: str) -> int:
            acc = 0
            for ch in x:
                acc = (acc * 31 + ord(ch)) % 1_000_000_007
            return acc

        return s.map(h)

    return df.withColumn("fingerprint", _fp(normalize_text(text_col)))


def with_compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "compression_ratio",
    level: int = 6,
) -> DataFrame:
    """zlib compression ratio per document (``compressed_bytes /
    raw_bytes``, 4 decimals; empty text -> null) — the
    C4/RefinedWeb-style redundancy signal: highly templated or
    repetitive text compresses far below natural prose, so a low ratio
    flags boilerplate farms and a ratio near 1.0 flags
    random/binary-ish content. Complements the token-level
    `with_repetition_stats` (which sees n-gram repeats; zlib sees ALL
    byte-level structure).

    Implementation: an Arrow-batched pandas UDF (zlib is stdlib C —
    per-batch cost is the compressor itself, not Python). zlib output
    is fully deterministic for a fixed level/strategy, so the column is
    reproducible across runs and layouts (pinned by test); there is no
    SQL twin (DuckDB ships no compressor), hence pytest-gated rather
    than oracle-gated. No shuffle: a pure projection stage."""
    lvl = int(level)
    if not 1 <= lvl <= 9:
        raise ValueError(f"level must be in [1, 9], got {level}")

    @F.pandas_udf("double")
    def _ratio(s):  # type: ignore[no-untyped-def]
        import zlib

        def one(t):
            if t is None:
                return None
            b = t.encode("utf-8")
            if not b:
                return None
            return round(len(zlib.compress(b, lvl)) / len(b), 4)

        return s.map(one)

    return df.withColumn(out_col, _ratio(F.col(text_col)))


def filter_by_compression(
    df: DataFrame,
    text_col: str = "text",
    min_ratio: float = 0.25,
    max_ratio: float = 1.05,
) -> DataFrame:
    """Keep documents whose zlib ratio sits in the natural-prose band
    (null ratios — empty docs — drop). The two thresholds are the
    standard cut: below ``min_ratio`` is template/boilerplate spam,
    above ``max_ratio`` is non-text bytes."""
    out = with_compression_ratio(df, text_col)
    return out.where(
        F.col("compression_ratio").isNotNull()
        & (F.col("compression_ratio") >= min_ratio)
        & (F.col("compression_ratio") <= max_ratio)
    ).drop("compression_ratio")
