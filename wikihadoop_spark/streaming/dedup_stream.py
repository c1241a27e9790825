"""Incremental near-duplicate detection: dedup NEW documents against an
EXISTING corpus without recomputing the corpus.

The 100 TB shape this models: a crawl pipeline lands fresh shards
continuously, and each new document must be checked against billions of
already-ingested documents.  Recomputing all-corpus LSH per batch is a
non-starter; the corpus instead keeps a persisted **signature index**
(band-key exploded minhash signatures, one parquet table, built once
and appended as documents are admitted), and arriving documents probe
it with a stream-static equi-join:

  new docs (stream)
    → row-local minhash (stateless projection — no aggregation state,
      no watermark needed: operators/dedup.py:minhash_signatures_rowwise)
    → band-key explode (stateless)
    → stream-static inner join against the index on the band key
    → estimated Jaccard from the two signatures, threshold filter

Every stage is stateless, so the query runs in append mode with
exactly-once file-sink semantics, and the static side is re-read per
micro-batch (pick up index appends by restarting the query or using a
Delta-style source in production).

State note: a pair that collides in several bands is emitted once per
band; :func:`stream_candidate_pairs` leaves those duplicates in place
(zero state — downstream exact-verify is naturally idempotent), while
:func:`stream_candidate_pairs_collapsed` collapses them with
``dropDuplicatesWithinWatermark`` — per-pair state bounded by the
event-time watermark instead of the unbounded history a plain
``dropDuplicates`` would keep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import minhash_signatures_rowwise


def signature_index(
    sig: DataFrame,
    *,
    id_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    bucket_cap: int = 1000,
    observation=None,
) -> DataFrame:
    """Explode a signature frame into its LSH index rows:
    ``(band, key0..key{r-1}, id, s0..s{n-1})`` — the persisted corpus
    side of the stream-static probe join.  Write this as parquet
    (partitioned by ``band`` at scale so each probe join prunes to one
    band's files).

    ``bucket_cap`` bounds hot band keys AT BUILD TIME, because the
    probe join cannot: a mega near-dup family in the corpus shares one
    band key, and every arriving probe row would fan out to the whole
    family per band — the unbounded skew the batch path caps via
    ``lsh_candidate_pairs``.  Same deterministic contract: the lowest
    ``bucket_cap`` corpus ids per (band, key) stay in the index; pass
    a ``TruncationCounter`` to count dropped index rows
    (``index_dropped_members`` — nonzero means a family bigger than
    the cap is under-indexed; probes still match its ``bucket_cap``
    representatives, so membership detection survives, but per-member
    attribution past the cap does not)."""
    from pyspark.sql import Window

    from ..operators.dedup import band_key_structs

    rows = n_hashes // bands
    flat = sig.select(
        F.col(id_col).alias("corpus_id"),
        *[F.col(f"s{i}").alias(f"cs{i}") for i in range(n_hashes)],
        F.explode(
            F.array(*band_key_structs(n_hashes, bands, field_prefix="key"))
        ).alias("bk"),
    ).select(
        "bk.band",
        *[F.col(f"bk.key{r}") for r in range(rows)],
        "corpus_id",
        *[F.col(f"cs{i}") for i in range(n_hashes)],
    )
    key_cols = ["band"] + [f"key{r}" for r in range(rows)]
    from ..observability import TruncationCounter

    if observation is not None and not isinstance(observation, TruncationCounter):
        raise TypeError(
            "pass observability.TruncationCounter, not Observation: the "
            "dropped-row count needs two attach points (total below the "
            "window, kept above the truncation filter) to ride the "
            "single linear plan without re-evaluating the signatures"
        )
    if observation is not None:
        # BELOW the window: counts every index row before the partial
        # truncation the group-limit rewrite inserts above this node
        flat = observation._observe_total(flat, "index_dropped_members")
    w = Window.partitionBy(*key_cols).orderBy("corpus_id")
    ranked = flat.withColumn("__rn", F.row_number().over(w))
    # rank filter directly above the window → WindowGroupLimit partial
    # truncation before the exchange (a mega family never sorts in one
    # task); the drop counter never sits between window and filter (it
    # would block the rewrite) — dropped = total - kept, the kept-side
    # observe attaching above the filter on this same linear plan
    kept = ranked.filter(F.col("__rn") <= bucket_cap).drop("__rn")
    if observation is not None:
        kept = observation._observe_kept(kept)
    return kept


def stream_candidate_pairs(
    new_docs: DataFrame,
    index: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    min_jaccard: float = 0.5,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Candidate (new_id, corpus_id, est_jaccard) pairs of an arriving
    document stream against a static signature index.  Works identically
    on a batch ``new_docs`` frame (the equivalence test runs both).
    ``carry_cols`` ride through from ``new_docs`` (e.g. the event-time
    column the watermark-collapsed variant keys on)."""
    rows = n_hashes // bands
    sig = minhash_signatures_rowwise(
        new_docs,
        id_col=id_col,
        text_col=text_col,
        n_hashes=n_hashes,
        keep_cols=carry_cols,
    )
    from ..operators.dedup import band_key_structs

    probes = sig.select(
        F.col(id_col).alias("new_id"),
        *[F.col(c) for c in carry_cols],
        *[F.col(f"s{i}") for i in range(n_hashes)],
        F.explode(
            F.array(*band_key_structs(n_hashes, bands, field_prefix="key"))
        ).alias("bk"),
    ).select(
        F.col("bk.band").alias("band"),
        *[F.col(f"bk.key{r}").alias(f"key{r}") for r in range(rows)],
        "new_id",
        *[F.col(c) for c in carry_cols],
        *[F.col(f"s{i}") for i in range(n_hashes)],
    )
    joined = probes.join(index, ["band"] + [f"key{r}" for r in range(rows)])
    matches = sum(
        (F.col(f"s{i}") == F.col(f"cs{i}")).cast("int") for i in range(n_hashes)
    )
    return (
        joined.select(
            "new_id",
            *[F.col(c) for c in carry_cols],
            "corpus_id",
            (matches.cast("double") / F.lit(float(n_hashes))).alias("est_jaccard"),
        )
        # a re-crawled document whose id is already in the index would
        # otherwise match its own row in every band and be flagged as a
        # duplicate of itself
        .filter(F.col("new_id") != F.col("corpus_id"))
        .filter(F.col("est_jaccard") >= min_jaccard)
    )


def stream_candidate_pairs_collapsed(
    new_docs: DataFrame,
    index: DataFrame,
    *,
    time_col: str,
    watermark: str = "10 minutes",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """:func:`stream_candidate_pairs` with per-band duplicate emissions
    collapsed to ONE row per (new_id, corpus_id) pair via
    ``dropDuplicatesWithinWatermark`` — every surviving column of a
    pair's rows is identical across its bands (the Jaccard estimate
    comes from the full signatures, not the band), so which row
    survives is immaterial.

    State contract at 100 TB: the dedup operator keeps a pair key only
    until the ``watermark`` horizon passes its event time (``time_col``
    from the arriving document), so state is bounded by pair arrival
    rate × watermark — NOT by stream history, which is what a plain
    ``dropDuplicates`` would hold.  A pair re-emitted for a document
    arriving later than the watermark can duplicate; downstream
    exact-verify is idempotent to that by design.  All upstream stages
    stay stateless, so the query still runs in append mode."""
    pairs = stream_candidate_pairs(
        new_docs,
        index,
        id_col=id_col,
        text_col=text_col,
        n_hashes=n_hashes,
        bands=bands,
        min_jaccard=min_jaccard,
        carry_cols=(time_col,),
    )
    return pairs.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        ["new_id", "corpus_id"]
    )


def int8_ann_index(
    corpus: DataFrame,
    planes: list[list[int]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The persisted int8 ANN index (round-11 verdict item 7): the
    corpus embeddings quantized to int8 with their integer norms and
    integer-hyperplane bucket ids —
    ``(corpus_id, qb array<int>, nb bigint, bucket int)``.  Write this
    as parquet partitioned by ``bucket`` at scale: each probe join
    prunes to one bucket's files, and every byte read is 4× smaller
    than the float column (the same written-SQ8 artifact the batch
    int8 LSH gate documents).  Zero-norm vectors are excluded at build
    time (cosine against them is undefined — identical rule to the
    batch path).  Bucket ids are exact integer math, so the index is
    bit-identical however it is built."""
    from ..operators.quantize import (
        hyperplane_bucket_int,
        int_norm2,
        quantize_int8,
    )

    return (
        corpus.select(
            F.col(id_col).alias("corpus_id"),
            quantize_int8(F.col(vec_col).cast("array<double>")).alias("qb"),
        )
        .withColumn("nb", int_norm2(F.col("qb")))
        .filter(F.col("nb") > 0)
        .withColumn("bucket", hyperplane_bucket_int(F.col("qb"), planes))
    )


def stream_ann_matches(
    new_docs: DataFrame,
    index: DataFrame,
    planes: list[list[int]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cosine: float | None = None,
) -> DataFrame:
    """Arriving embeddings probe a static int8 ANN index: row-local
    quantize + bucket (stateless projections — no aggregation state,
    no watermark), stream-static equi-join on the bucket id, exact
    int8 cosine.  Every stage is stateless, so the query runs in
    append mode with exactly-once file-sink semantics — the int8
    variant of :func:`stream_candidate_pairs`, with the 4×-smaller
    index on disk and over the join.

    Identical math to the batch ``cosine_topk_int8_lsh`` MINUS the
    top-k rank: a rank window over a non-time column cannot run in
    append mode, so the stream emits every bucket-collision row
    ``(query_id, neighbor_id, int_dot, qcos)`` (optionally thresholded
    by ``min_cosine``) and the reader ranks at read time — ranking is
    a pure function of the emitted rows, so stream ≡ batch end-to-end
    (pinned in tests/test_streaming.py).  Works identically on a batch
    ``new_docs`` frame (the equivalence test runs both)."""
    from ..operators.quantize import (
        hyperplane_bucket_int,
        int_dot,
        int_norm2,
        quantize_int8,
        quantized_cosine,
    )

    probes = (
        new_docs.select(
            F.col(id_col).alias("query_id"),
            quantize_int8(F.col(vec_col).cast("array<double>")).alias("qa"),
        )
        .withColumn("na", int_norm2(F.col("qa")))
        .filter(F.col("na") > 0)
        .withColumn("bucket", hyperplane_bucket_int(F.col("qa"), planes))
    )
    out = (
        probes.join(index, "bucket")
        .filter(F.col("query_id") != F.col("corpus_id"))
        .withColumn("int_dot", int_dot(F.col("qa"), F.col("qb")))
        .withColumn(
            "qcos",
            quantized_cosine(F.col("int_dot"), F.col("na"), F.col("nb")),
        )
        .select(
            "query_id",
            F.col("corpus_id").alias("neighbor_id"),
            "int_dot",
            "qcos",
        )
    )
    if min_cosine is not None:
        out = out.filter(F.col("qcos") >= F.lit(float(min_cosine)))
    return out


def stream_ivf_matches(
    new_docs: DataFrame,
    index: DataFrame,
    centroids: list[list[int]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_col: str = "q",
    n2_col: str = "n2",
    nprobe: int = 4,
    min_cosine: float | None = None,
) -> DataFrame:
    """Arriving embeddings probe a WRITTEN int8 IVF index (the
    artifact `operators/quantize.py::ivf_write_int8` stores): each new
    vector quantizes row-locally, picks its ``nprobe`` nearest integer
    centroids from the K×D driver-held literal list (exact integer
    distances, index tiebreak — bit-identical to the batch probe), and
    joins the static index on the cluster id.  Every stage is a
    stateless projection or a stream-static equi-join, so the query
    runs in append mode — the IVF twin of :func:`stream_ann_matches`,
    completing the streaming story for BOTH bucketed ANN index types.
    At scale the index parquet is partitioned by ``cluster`` so each
    probe prunes to nprobe clusters' files, all on the 4×-smaller int8
    column.

    Emits ``(query_id, neighbor_id, int_dot, qcos)`` — ranking is a
    pure function of the emitted rows and happens at read time, where
    it must equal the batch ``cosine_topk_int8_ivf`` bit-for-bit
    (pinned in tests/test_streaming.py).  Works identically on a batch
    ``new_docs`` frame (the equivalence test runs both)."""
    from ..operators.quantize import (
        int_dot,
        int_norm2,
        nprobe_clusters,
        quantize_int8,
        quantized_cosine,
    )

    probes = (
        new_docs.select(
            F.col(id_col).alias("query_id"),
            quantize_int8(F.col(vec_col).cast("array<double>")).alias("qa"),
        )
        .withColumn("na", int_norm2(F.col("qa")))
        .filter(F.col("na") > 0)
    )
    # the SHARED probe rule (operators/quantize.py::nprobe_clusters):
    # the batch IVF search uses the same expression, which is what the
    # stream≡batch bit-equality pin rests on
    probes = probes.withColumn(
        "cluster", F.explode(nprobe_clusters(F.col("qa"), centroids, nprobe))
    )
    out = (
        probes.join(
            # the index stores its columns under the names the build
            # used — id_col/q_col/n2_col mirror the batch API's
            # defaults ("vec_id"/"q"/"n2", the canonical artifact row
            # shape ivf_write_int8 stores); pass the build's names
            # when probing an index written with non-default columns
            index.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(q_col).alias("qb"),
                F.col(n2_col).alias("nb"),
                "cluster",
            ),
            "cluster",
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("int_dot", int_dot(F.col("qa"), F.col("qb")))
        .withColumn(
            "qcos",
            quantized_cosine(F.col("int_dot"), F.col("na"), F.col("nb")),
        )
        .select("query_id", "neighbor_id", "int_dot", "qcos")
    )
    if min_cosine is not None:
        out = out.filter(F.col("qcos") >= F.lit(float(min_cosine)))
    return out
