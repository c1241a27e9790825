"""Document chunking: split long documents into fixed-token windows
with optional overlap — the step between curation and tokenization
that turns arbitrary-length documents into training-sequence-sized
pieces (the complement of `operators/packing.py`, which packs many
SMALL documents into budget-sized shards).

Plan shape at 100 TB: entirely ROW-LOCAL — the token array, the chunk
starts (`sequence`), and each chunk's slice/join are higher-order
array expressions inside the scan projection, followed by one
`explode`.  No shuffle, no UDF, no state: chunking a corpus costs
exactly one data pass, and the output order within a document is the
chunk index, so downstream packing can keep document locality by
ordering on (id, chunk_idx).

Engine-portable (tokens are the engine's md5-family-friendly
`[a-z0-9]+` alphabet, chunk text is a plain join) so a SQL oracle can
replay it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokens


def chunk_documents(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    stride: int | None = None,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Explode each document into ``(id, chunk_idx, n_tokens,
    chunk_text)`` rows: chunk ``k`` covers tokens
    ``[1 + k*stride, 1 + k*stride + chunk_tokens)`` (1-based), for
    every start position ≤ the document's token count.

    ``stride`` defaults to ``chunk_tokens`` (disjoint chunks); a
    smaller stride overlaps consecutive chunks by ``chunk_tokens -
    stride`` tokens (standard for training-sequence windows so no
    span is split across a boundary without context).  With ``stride
    <= chunk_tokens`` every token appears in at least one chunk.  A
    document with zero tokens yields zero rows (there is nothing to
    train on; count inputs upstream if auditing).  ``keep_cols`` ride
    through unchanged onto every chunk row (e.g. the source/group
    column a downstream mixture or audit needs)."""
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive (got {chunk_tokens})")
    stride = chunk_tokens if stride is None else stride
    if stride <= 0:
        raise ValueError(f"stride must be positive (got {stride})")
    toks = df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        tokens(F.col(text_col)).alias("__t"),
    ).filter(F.size("__t") > 0)
    # chunk starts: 1, 1+stride, ... while start <= len(t)
    n_chunks = ((F.size("__t") - F.lit(1)) / F.lit(stride)).cast("int") + F.lit(1)
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - F.lit(1)),
        lambda k: F.slice(F.col("__t"), k * stride + 1, chunk_tokens),
    )
    exploded = toks.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.posexplode(chunks).alias("chunk_idx", "__chunk"),
    )
    return exploded.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size("__chunk").cast("bigint").alias("n_tokens"),
        F.array_join(F.col("__chunk"), " ").alias("chunk_text"),
    )
