"""streaming/ingest.py — live incremental curation over a landing
directory: two file drops through the stream must equal the one-shot
batch curation of the union (the streaming twin of
llp_incremental_dedup's contract)."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from ensembl_database_loader_spark.pipeline.curate import curate_corpus
from ensembl_database_loader_spark.streaming.ingest import (
    stream_documents,
    streaming_curate,
)


def _docs(offset: int):
    words = [f"tok{i:03d}" for i in range(40)]
    out = []
    for d in range(6):
        toks = [f"{w}x{d}" for w in words]
        out.append(
            {"doc_id": offset + d, "lang": "en", "text": " ".join(toks)}
        )
    return out


def _near_dups(docs, id_offset: int):
    return [
        {
            "doc_id": d["doc_id"] + id_offset,
            "lang": d["lang"],
            "text": d["text"].split(" ", 1)[1],  # drop first token
        }
        for d in docs
    ]


def _drain(q):
    q.awaitTermination(120)


def test_streaming_curate_two_drops_equal_one_shot(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    store = str(tmp_path / "store")
    out = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")

    batch1 = _docs(0)
    with open(landing / "b1.jsonl", "w") as f:
        f.writelines(json.dumps(r) + "\n" for r in batch1)

    s = stream_documents(spark, str(landing))
    _drain(streaming_curate(s, store, out, ckpt))

    # second drop: fresh docs + near-dups of batch1 (monotone ids)
    batch2 = _docs(1000) + _near_dups(batch1, 100000)
    with open(landing / "b2.jsonl", "w") as f:
        f.writelines(json.dumps(r) + "\n" for r in batch2)
    time.sleep(1.1)  # file-source timestamps have 1s granularity
    s = stream_documents(spark, str(landing))
    _drain(streaming_curate(s, store, out, ckpt))

    streamed = {r.id for r in spark.read.parquet(out).select("id").collect()}

    union = spark.createDataFrame(
        batch1 + batch2, "doc_id bigint, lang string, text string"
    )
    one_shot, _ = curate_corpus(union, near_dup="minhash")
    expected = {r.id for r in one_shot.select("id").collect()}
    assert streamed == expected
    # the near-dups of batch1 must have been dropped via the STORE
    # (batch1 was in a previous micro-batch)
    assert not any(i >= 100000 for i in streamed)

    # store grew across batches: next increments see both drops
    sigs = spark.read.parquet(store + "/exact_sigs")
    assert sigs.filter(F.col("id") >= 1000).count() > 0
    assert sigs.filter(F.col("id") < 1000).count() > 0
