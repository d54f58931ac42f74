"""Paragraph-granularity corpus dedup tests (operators/paradedup.py):
first-occurrence survival across documents, in-document repeats,
min_chars exemption, order-preserving reconstruction, untouched payload
columns, and the python-reference equality that pins exact semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ensembl_database_loader_spark.operators.paradedup import (
    dedup_paragraphs,
    split_paragraphs,
)

SEP = "\n\n"


def _mk(spark, docs):
    return spark.createDataFrame(
        [(i, SEP.join(paras), f"src{i}") for i, paras in docs],
        "doc_id bigint, text string, source string",
    )


def _reference(docs, min_chars=1):
    seen = set()
    out = {}
    for i, paras in sorted(docs):
        kept = []
        for p in paras:
            if len(p) < min_chars:
                kept.append(p)
            elif p not in seen:
                seen.add(p)
                kept.append(p)
        out[i] = (SEP.join(kept), len(kept), len(paras) - len(kept))
    return out


def test_first_occurrence_survives_corpus_wide(spark):
    docs = [
        (1, ["alpha beta", "boilerplate footer", "gamma"]),
        (2, ["boilerplate footer", "delta", "alpha beta"]),
        (3, ["boilerplate footer", "delta", "epsilon"]),
    ]
    got = {
        r.doc_id: (r.text, r.paras_kept, r.paras_removed)
        for r in dedup_paragraphs(_mk(spark, docs), sep=SEP).collect()
    }
    assert got == _reference(docs)
    # doc 1 (smallest id) kept everything; later docs lost the repeats
    assert got[1][2] == 0 and got[2][2] == 2 and got[3][2] == 2


def test_in_document_repeats_and_order_preserved(spark):
    docs = [(5, ["x", "same para", "middle", "same para", "end"])]
    got = dedup_paragraphs(_mk(spark, docs), min_chars=1).first()
    assert got.text == SEP.join(["x", "same para", "middle", "end"])
    assert (got.paras_kept, got.paras_removed) == (4, 1)


def test_min_chars_exempts_short_structure(spark):
    docs = [(1, ["Intro", "long unique paragraph one"]),
            (2, ["Intro", "long unique paragraph two"])]
    # min_chars=10: "Intro" repeats but is structure — kept in both
    got = {
        r.doc_id: r.text
        for r in dedup_paragraphs(_mk(spark, docs), min_chars=10).collect()
    }
    assert got[2] == SEP.join(["Intro", "long unique paragraph two"])
    # default min_chars=1: second "Intro" removed, empty paras kept
    got1 = {
        r.doc_id: r.text
        for r in dedup_paragraphs(_mk(spark, docs)).collect()
    }
    assert got1[2] == "long unique paragraph two"


def test_fully_duplicate_doc_keeps_row_with_empty_text(spark):
    docs = [(1, ["only para"]), (2, ["only para"])]
    got = {r.doc_id: r for r in dedup_paragraphs(_mk(spark, docs)).collect()}
    assert len(got) == 2
    assert got[2].text == "" and got[2].paras_kept == 0 and got[2].paras_removed == 1
    # payload columns pass through untouched
    assert got[2].source == "src2"


def test_randomized_equals_python_reference(spark):
    import random

    rng = random.Random(13)
    pool = [f"paragraph number {i} with some text" for i in range(40)]
    docs = [
        (i, [rng.choice(pool) for _ in range(rng.randint(1, 12))])
        for i in range(60)
    ]
    got = {
        r.doc_id: (r.text, r.paras_kept, r.paras_removed)
        for r in dedup_paragraphs(_mk(spark, docs).repartition(7)).collect()
    }
    assert got == _reference(docs)


def test_split_paragraphs_positions_and_guards(spark):
    df = _mk(spark, [(1, ["a", "b", "c"])])
    rows = sorted(
        (r.pos, r.para) for r in split_paragraphs(df, sep=SEP).collect()
    )
    assert rows == [(0, "a"), (1, "b"), (2, "c")]
    with pytest.raises(ValueError, match="min_chars"):
        dedup_paragraphs(df, min_chars=-1)
    with pytest.raises(ValueError, match="not in"):
        dedup_paragraphs(df, text_col="nope")


def test_id_col_named_id_survives(spark):
    # id_col="id": the output must keep the user's id column (a prior
    # version dropped every column literally named 'id')
    df = spark.createDataFrame(
        [(1, SEP.join(["x", "y"])), (2, SEP.join(["y", "z"]))],
        "id bigint, text string",
    )
    got = {r.id: r.text for r in dedup_paragraphs(df, id_col="id").collect()}
    assert got == {1: SEP.join(["x", "y"]), 2: "z"}


def test_payload_column_named_id_passes_through(spark):
    # a payload column literally named 'id' alongside doc_id must not
    # be silently deleted
    df = spark.createDataFrame(
        [(1, SEP.join(["x", "y"]), 101), (2, SEP.join(["y", "z"]), 102)],
        "doc_id bigint, text string, id bigint",
    )
    rows = {r.doc_id: (r.id, r.text) for r in dedup_paragraphs(df).collect()}
    assert rows == {1: (101, SEP.join(["x", "y"])), 2: (102, "z")}
