"""Document chunking: split documents into fixed-size token windows
with overlap — the retrieval/embedding preprocessing step (RAG
indexing, long-document embedding) that fans one document out to many
chunk rows.

Two implementations with identical semantics (equivalence is
hash-gated by probe tx_chunking):

- ``chunk_documents``: pure JVM — a higher-order ``transform`` over the
  chunk-start sequence plus ``posexplode``. The hot path: stays in
  whole-stage codegen, no Python, scales as a narrow per-row fan-out.
- ``chunk_udtf``: a Python UDTF (Spark 4 user-defined *table*
  function) declaring the same (chunk_idx, chunk, n_tokens) rows. The
  API-surface demonstration: UDTFs are the right tool when the fan-out
  logic needs a Python library (a real sentence splitter, a tokenizer)
  — this one mirrors the JVM chunker exactly so the two paths can be
  compared row-for-row.

Chunking rule: token windows of ``size`` starting every
``size - overlap`` tokens; the last window may be short; empty
documents produce no chunks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """JVM chunker: ``(id, chunk_idx, chunk, n_tokens)`` — one row per
    token window. Narrow fan-out (no shuffle)."""
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    step = size - overlap
    toks = f"split(regexp_replace(lower(trim({text_col})), '\\\\s+', ' '), ' ')"
    chunks = (
        f"CASE WHEN {text_col} IS NULL OR size({toks}) = 0 OR "
        f"(size({toks}) = 1 AND element_at({toks}, 1) = '') "
        f"THEN array() "
        f"ELSE transform(sequence(1, size({toks}), {step}), "
        f"s -> array_join(slice({toks}, s, {size}), ' ')) END"
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.expr(chunks)).alias("chunk_idx", "chunk"),
    ).withColumn("n_tokens", F.size(F.split("chunk", " ")))


def chunk_udtf(size: int = 32, overlap: int = 8):
    """Python UDTF with the same semantics; register and use laterally:

        spark.udtf.register("chunk_text", chunk_udtf(32, 8))
        spark.sql("SELECT d.doc_id, c.* FROM docs d, "
                  "LATERAL chunk_text(d.text) c")
    """
    import re

    from pyspark.sql.functions import udtf

    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    step = size - overlap
    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    @udtf(returnType="chunk_idx int, chunk string, n_tokens int")
    class ChunkText:
        def eval(self, text: str):  # noqa: D102
            if text is None:
                return
            toks = ws.sub(" ", text.strip(" ").lower()).split(" ")
            if toks == [""]:
                return
            idx = 0
            for i in range(0, len(toks), step):
                c = toks[i : i + size]
                yield idx, " ".join(c), len(c)
                idx += 1

    return ChunkText
