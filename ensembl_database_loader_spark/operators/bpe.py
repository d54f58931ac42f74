"""Distributed BPE (byte-pair-encoding) vocabulary training + encoding
— the tokenizer-training step of an LLM data pipeline, Spark-first.

Classic BPE (Sennrich et al., ACL'16) operates on the WORD-FREQUENCY
table, not raw text: the corpus collapses to (word, freq) once (one
shuffle — even a web-scale corpus collapses to a distinct-word table
orders of magnitude smaller), then each merge step is

    count adjacent symbol pairs weighted by word freq
    -> pick argmax (count desc, pair lexicographic — deterministic)
    -> rewrite every word's symbol array, merging that pair greedily
       left-to-right

Spark shape: pair counting is an explode + partial-aggregated groupBy;
only the SINGLE winning pair row is collected per step; the rewrite is
a pure JVM higher-order fold (no Python in the loop). Lineage is cut
with localCheckpoint every few merges (the components-operator idiom)
so the plan doesn't deepen linearly in vocab size.

Word-internal merges only (no end-of-word marker): symbol
concatenation always reconstructs the word, so encoding is a partition
of the word by construction — the probe's round-trip contract.

Encoding applies the learned merges by rank per word — a dict-driven
Arrow-batched pandas UDF (the production encoder is a library; the
Python-per-distinct-word cost is the realistic shape, and it runs on
the distinct-word table, not the corpus).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ensembl_database_loader_spark.functions.text import tokens


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over normalized whitespace tokens — the one corpus
    pass; everything after runs on the distinct-word table."""
    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _chars(word_col: str) -> Column:
    """Character array of a word column (name, not expression — it is
    interpolated into a SQL snippet)."""
    return F.expr(
        f"transform(sequence(1, length(`{word_col}`)), "
        f"i -> substring(`{word_col}`, i, 1))"
    )


def _apply_merge(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) -> a||b, as a JVM
    fold: the merged symbol becomes the new 'last', so overlapping
    occurrences resolve exactly like the sequential reference."""
    merged = F.array(F.lit(a + b))

    def step(acc: Column, x: Column) -> Column:
        return F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), merged),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(syms, F.array().cast("array<string>"), step)


def _pair_counts(words: DataFrame) -> DataFrame:
    pairs = F.expr(
        "CASE WHEN size(syms) < 2 THEN array() ELSE "
        "transform(sequence(1, size(syms) - 1), "
        "i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b)) END"
    )
    return (
        words.select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("cnt"))
    )


def _select_disjoint(
    ranked_pairs: list[tuple[str, str]], want: int
) -> list[tuple[str, str]]:
    """Greedy prefix of the ranked pair list whose symbols (and merge
    products) are pairwise disjoint — the condition under which K
    rewrites in one pass cannot interact."""
    used: set[str] = set()
    batch: list[tuple[str, str]] = []
    for a, b in ranked_pairs:
        if len(batch) == want:
            break
        if a in used or b in used or a + b in used:
            continue
        batch.append((a, b))
        used.update((a, b, a + b))
    return batch


def train_bpe(
    word_freq: DataFrame,
    num_merges: int,
    checkpoint_every: int = 5,
    merges_per_pass: int = 1,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merges from a (word, freq) frame. Returns
    the ordered merge list (the vocabulary is base chars + one product
    per merge). Stops early when no adjacent pair remains.

    ``merges_per_pass=1`` (default) is EXACT Sennrich BPE — one
    count/argmax/rewrite cycle per merge, i.e. one Spark job per merge.
    At a 50k vocabulary that is 50k sequential jobs, so for scale the
    parallel-BPE approximation is available: ``merges_per_pass=K``
    takes the top-K pairs of one counting pass whose symbols are
    pairwise DISJOINT (no symbol appears in two chosen pairs, so the
    K rewrites cannot interact) and applies them as one chained fold —
    cutting driver round-trips and corpus passes by ~K at the cost of
    not recomputing counts between the K merges (the standard
    parallel-BPE trade-off; ranks within a pass still follow the
    count/lex order). K=1 equality with the sequential reference is
    pinned in tests."""
    words = word_freq.select(
        "freq", _chars("word").alias("syms")
    ).localCheckpoint()
    merges: list[tuple[str, str]] = []
    passes = 0
    while len(merges) < num_merges:
        want = min(merges_per_pass, num_merges - len(merges))
        top = (
            _pair_counts(words)
            .orderBy(F.col("cnt").desc(), F.col("a"), F.col("b"))
            # over-fetch: disjointness filtering may reject candidates
            .limit(max(want * 4, 16))
            .collect()
        )
        if not top:
            break
        batch = _select_disjoint([(r.a, r.b) for r in top], want)
        merges.extend(batch)
        syms = F.col("syms")
        for a, b in batch:
            syms = _apply_merge(syms, a, b)
        words = words.select("freq", syms.alias("syms"))
        passes += 1
        if passes % checkpoint_every == 0:
            words = words.localCheckpoint()
    return merges


def encode_words(
    word_freq: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """(word, freq, syms): each distinct word encoded with the learned
    merges applied in rank order (Arrow-batched; runs on distinct
    words, not corpus occurrences)."""
    rank = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf("array<string>")
    def _enc(s):  # type: ignore[no-untyped-def]
        def enc(word: str) -> list[str]:
            syms = list(word)
            while len(syms) > 1:
                pairs = {(syms[i], syms[i + 1]) for i in range(len(syms) - 1)}
                cand = [p for p in pairs if p in rank]
                if not cand:
                    break
                a, b = min(cand, key=rank.__getitem__)
                out: list[str] = []
                for x in syms:
                    if out and out[-1] == a and x == b:
                        out[-1] = a + b
                    else:
                        out.append(x)
                syms = out
            return syms

        return s.map(enc)

    return word_freq.select("word", "freq", _enc("word").alias("syms"))


def token_vocabulary(
    word_freq: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """(token, token_id) — the trained tokenizer's id table: the
    corpus's base characters first (sorted, ids 0..B-1 — deterministic
    across engines/layouts), then the merge products in TRAINING RANK
    order (ids B..B+M-1), the standard BPE id assignment. Built from
    one tiny distinct-chars aggregate plus the driver-side merge list;
    the result is vocabulary-sized (thousands), the canonical broadcast
    dimension."""
    spark = word_freq.sparkSession
    base = sorted(
        r.ch
        for r in word_freq.select(
            F.explode(_chars("word")).alias("ch")
        ).distinct().collect()
    )
    products = [a + b for a, b in merges]
    # a merge product can collide with nothing: products have length
    # >= 2, base symbols length 1; products are distinct because each
    # merge introduces a new symbol
    rows = [(t, i) for i, t in enumerate(base + products)]
    return spark.createDataFrame(rows, "token string, token_id int")


def encode_corpus(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_tokens: bool = False,
) -> DataFrame:
    """Every document encoded to BPE ``token_ids`` (``array<int>``) —
    the corpus-scale serving pass that completes the tokenize→pack→
    export chain (``pack_concat`` / ``export_training_shards`` consume
    the ``n_tokens`` this adds).

    Spark shape — the encoder NEVER runs per occurrence: the corpus
    collapses to its distinct-word table (Zipf: orders of magnitude
    smaller), each distinct word is encoded ONCE (Arrow-batched UDF,
    ``encode_words``), symbols map to ids through the vocabulary (a
    broadcast join — the vocab is thousands of rows), and documents
    reassemble by joining occurrences to their word's id array
    (``shuffle_hash``: the distinct-word side is UDF-opaque and can be
    large, so never let a misestimate build it driver-side) and
    flattening in (word position, symbol position) order. Three
    shuffles total, all linear; no Python touches corpus-sized data.

    Documents whose normalized text has no words keep their row with
    an empty ``token_ids`` and ``n_tokens = 0``.

    ``keep_tokens=True`` adds the symbol-string array ``tokens`` (the
    decode of ``token_ids`` — concatenating it reconstructs the
    normalized text with separators removed, the round-trip contract
    probes gate)."""
    for c in (id_col, text_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in {df.columns}")
    words = df.select(
        F.col(id_col).alias("__bpe_id"),
        F.posexplode(
            F.filter(tokens(text_col), lambda w: w != "")
        ).alias("__bpe_pos", "word"),
    )
    wf = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    vocab = token_vocabulary(wf, merges)
    enc = encode_words(wf, merges)
    # posexplode_OUTER, not posexplode: the plain form lets Catalyst
    # infer `size(syms) > 0` and push that UDF-referencing filter BELOW
    # the distinct-word aggregate — running the encoder on every word
    # OCCURRENCE (corpus-sized) instead of once per distinct word. The
    # outer form carries no such constraint (and is semantically
    # identical here: every non-empty word encodes to >= 1 symbol).
    word_ids = (
        enc.select("word", F.posexplode_outer("syms").alias("spos", "token"))
        .join(F.broadcast(vocab), "token")
        .groupBy("word")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("spos", "token_id", "token"))
                ),
                lambda x: F.struct(
                    x["token_id"].alias("tid"), x["token"].alias("tok")
                ),
            ).alias("_wtoks")
        )
    )
    per_doc = (
        words.join(word_ids.hint("shuffle_hash"), "word")
        .groupBy("__bpe_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("__bpe_pos"), F.col("_wtoks")))
                    ),
                    lambda x: x["_wtoks"],
                )
            ).alias("_toks")
        )
    )
    out = (
        df.join(per_doc, df[id_col] == per_doc["__bpe_id"], "left")
        .withColumn(
            "token_ids",
            F.coalesce(
                F.transform("_toks", lambda x: x["tid"]),
                F.array().cast("array<int>"),
            ),
        )
        .withColumn("n_tokens", F.size("token_ids").cast("bigint"))
    )
    if keep_tokens:
        out = out.withColumn(
            "tokens",
            F.coalesce(
                F.transform("_toks", lambda x: x["tok"]),
                F.array().cast("array<string>"),
            ),
        )
    return out.drop("__bpe_id", "_toks")
