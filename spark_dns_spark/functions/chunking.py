"""Context-window text chunking — the standard LLM-training splitter
(fixed ``max_tokens`` windows advancing by ``stride``, so consecutive
chunks overlap by ``max_tokens - stride`` tokens).

Two formulations, row-identical by contract (``tests/test_chunking.py``):

- :func:`chunk_expr` — pure Catalyst expressions
  (``sequence`` -> ``transform`` -> ``posexplode`` over ``slice``),
  whole-stage codegen, no Python.  THE hot path: at 100 TB chunking is
  a map-only explode whose output feeds the tokenizer fleet, and it
  must not serialize through Python workers.
- :class:`ChunkText` — a Python UDTF (Spark 4 user-defined table
  function) with the same semantics, registered via
  :func:`register_chunk_udtf` for SQL ``LATERAL`` use.  This is the
  extension-point demo: swap the body for a real BPE tokenizer (which
  no expression can host) without touching query shapes.

Chunk rule: tokens = whitespace split; starts = 0, stride, 2*stride, …
while start < n_tokens; a chunk is ``tokens[start : start+max_tokens]``.
Every token lands in ceil(max_tokens/stride) chunks at most; the final
chunk may be short but is never empty.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf


def chunk_expr(
    df: DataFrame,
    text_col: str = "text",
    max_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Explode ``df`` into (chunk_idx, chunk_text, n_tokens) rows per
    input row, keeping all other columns.  Map-only: no shuffle, no
    Python."""
    if stride <= 0 or max_tokens <= 0:
        raise ValueError("max_tokens and stride must be positive")
    toks = F.split(F.col(text_col), " ")
    # start offsets: 0, stride, ... strictly below size(toks); sequence
    # is inclusive, so the stop is size-1 (size >= 1 always: split('')
    # yields ['']).
    spans = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 1, F.lit(stride)),
        lambda s: F.slice(toks, s + 1, max_tokens),
    )
    out = df.withColumn("__spans", spans).select(
        "*", F.posexplode("__spans").alias("chunk_idx", "__chunk")
    )
    return out.select(
        *[c for c in df.columns],
        "chunk_idx",
        F.array_join("__chunk", " ").alias("chunk_text"),
        F.size("__chunk").alias("n_tokens"),
    )


@udtf(returnType="chunk_idx int, chunk_text string, n_tokens int")
class ChunkText:
    """UDTF twin of :func:`chunk_expr` (same chunk rule, one input
    text per call).  Replace the whitespace split with a real tokenizer
    to move beyond what expressions can host."""

    def eval(self, text: str, max_tokens: int, stride: int):  # noqa: D102
        if text is None:
            return
        toks = text.split(" ")
        idx = 0
        for start in range(0, len(toks), stride):
            chunk = toks[start : start + max_tokens]
            yield idx, " ".join(chunk), len(chunk)
            idx += 1


def register_chunk_udtf(spark, name: str = "chunk_text") -> None:
    """Register :class:`ChunkText` for SQL:
    ``SELECT d.doc_id, c.* FROM docs d, LATERAL chunk_text(d.text, 64, 48) c``
    """
    spark.udtf.register(name, ChunkText)
