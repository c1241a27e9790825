"""Int8 quantization kernel (operators/quantize.py) — property tests.

The kernel's portability claim is that every step is exact or
IEEE-exactly-rounded, so ANY conforming engine reproduces it
bit-for-bit.  These properties pin that against a pure-Python
reference (CPython doubles are the same IEEE-754 binary64 the JVM
uses): quantization on random vectors, trunc-toward-zero symmetry,
exact integer dots under permutation/order changes, and the quantized
cosine's bit equality including the sqrt step.
"""

from __future__ import annotations

import pytest

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from wikihadoop_spark.operators.quantize import (
    int_dot,
    int_norm2,
    quantize_int8,
    quantized_cosine,
)

finite = st.floats(
    min_value=-1e12,
    max_value=1e12,
    allow_nan=False,
    allow_infinity=False,
    width=64,
)


def _py_quantize(vec: list[float]) -> list[int]:
    mx = max((abs(x) for x in vec), default=0.0)
    if mx <= 0.0:
        return [0 for _ in vec]
    return [int(math.trunc(x * 127.0 / mx)) for x in vec]


@settings(max_examples=25, deadline=None)
@given(st.lists(finite, min_size=1, max_size=16))
@pytest.mark.slow
def test_quantize_matches_python_reference_bitwise(spark, vec):
    got = (
        spark.createDataFrame([(vec,)], "v array<double>")
        .select(quantize_int8(F.col("v")).alias("q"))
        .collect()[0]
        .q
    )
    want = _py_quantize(vec)
    assert got == want
    assert all(-127 <= q <= 127 for q in got)
    # trunc is symmetric toward zero: negating the vector negates q
    neg = (
        spark.createDataFrame([([-x for x in vec],)], "v array<double>")
        .select(quantize_int8(F.col("v")).alias("q"))
        .collect()[0]
        .q
    )
    assert neg == [-q for q in want]


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(min_value=-127, max_value=127), min_size=1, max_size=64)
)
def test_int_dot_and_norm_are_exact(spark, qs):
    other = list(reversed(qs))
    row = (
        spark.createDataFrame([(qs, other)], "a array<int>, b array<int>")
        .select(
            int_dot(F.col("a"), F.col("b")).alias("d"),
            int_norm2(F.col("a")).alias("na"),
            int_norm2(F.col("b")).alias("nb"),
        )
        .collect()[0]
    )
    assert row.d == sum(x * y for x, y in zip(qs, other))
    assert row.na == row.nb == sum(x * x for x in qs)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.integers(min_value=-127, max_value=127), min_size=1, max_size=64)
)
def test_quantized_cosine_bitwise_vs_python(spark, qs):
    other = [((i * 37) % 255) - 127 for i, _ in enumerate(qs)]
    na = sum(x * x for x in qs)
    nb = sum(x * x for x in other)
    if na == 0 or nb == 0:
        return
    got = (
        spark.createDataFrame([(qs, other)], "a array<int>, b array<int>")
        .select(
            quantized_cosine(
                int_dot(F.col("a"), F.col("b")),
                int_norm2(F.col("a")),
                int_norm2(F.col("b")),
            ).alias("c")
        )
        .collect()[0]
        .c
    )
    want = sum(x * y for x, y in zip(qs, other)) / math.sqrt(float(na * nb))
    # bitwise: both stacks do exact-int -> one sqrt -> one divide
    assert got.hex() == want.hex()


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.integers(min_value=-127, max_value=127), min_size=64, max_size=64)
)
def test_hyperplane_bucket_int_matches_python_exactly(spark, qs):
    """The integer-hyperplane bucket is exact integer math — the Spark
    expression must equal the pure-Python computation on every input
    (no fold-order caveat to carve out, unlike the float family)."""
    from wikihadoop_spark.operators.quantize import hyperplane_bucket_int
    from wikihadoop_spark.relational import _INT8_LSH_PLANES

    got = (
        spark.createDataFrame([(qs,)], "q array<int>")
        .select(hyperplane_bucket_int(F.col("q"), _INT8_LSH_PLANES).alias("b"))
        .collect()[0]
        .b
    )
    want = sum(
        (1 << i)
        for i, p in enumerate(_INT8_LSH_PLANES)
        if sum(x * y for x, y in zip(qs, p)) >= 0
    )
    assert got == want
    assert 0 <= got < 2 ** len(_INT8_LSH_PLANES)


def test_int8_lsh_ranks_like_float_within_candidates(spark):
    """The composed path's two approximations, pinned separately:
    (a) LSH pruning — every returned pair must be a same-bucket pair
    (candidate set identical to what the float vectors would probe,
    up to quantization of the bucket inputs); (b) int8 scoring — the
    top-10 WITHIN the candidate set must near-match exact float
    cosine ranking of the same candidates (measured 0.99-1.0 at both
    small SFs; the vs-brute recall is the plane family's pruning
    behavior, shared with the gated float LSH path, not the kernel's).
    Also pins the gate body == the public operator function."""
    from wikihadoop_spark.operators.quantize import (
        cosine_topk_int8_lsh,
        hyperplane_bucket_int,
    )
    from wikihadoop_spark.operators.similarity import cosine
    from wikihadoop_spark.relational import _INT8_LSH_PLANES, QUERIES, Tables

    sf = "/root/testdata/sf0.001"
    t = Tables(spark, sf)
    emb = t.embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    qn = (
        emb.select("vec_id", "v", quantize_int8(F.col("v")).alias("q"))
        .withColumn("n2", int_norm2(F.col("q")))
        .filter(F.col("n2") > 0)
        .withColumn("bkt", hyperplane_bucket_int(F.col("q"), _INT8_LSH_PLANES))
        .persist()
    )
    buckets = {r.vec_id: r.bkt for r in qn.select("vec_id", "bkt").collect()}

    got = QUERIES["similarity_topk_int8_lsh"](spark, sf).collect()
    assert got, "gate fixture produced no pairs"
    lsh_top: dict[int, set[int]] = {}
    for r in got:
        # (a) structural: only same-bucket pairs may appear
        assert buckets[r.query_id] == buckets[r.neighbor_id]
        lsh_top.setdefault(r.query_id, set()).add(r.neighbor_id)

    # (b) float cosine ranking of the SAME candidate set
    probes = qn.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "bkt"
    )
    cand = qn.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"), "bkt"
    )
    pairs = (
        cand.join(F.broadcast(probes), "bkt")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("fcos", cosine(F.col("qv"), F.col("cv")))
        .collect()
    )
    by_q: dict[int, list] = {}
    for r in pairs:
        by_q.setdefault(r.query_id, []).append((r.fcos, r.neighbor_id))
    overlaps = []
    for q, scored in by_q.items():
        ftop = {n for _, n in sorted(scored, key=lambda x: (-x[0], x[1]))[:10]}
        overlaps.append(len(ftop & lsh_top.get(q, set())) / len(ftop))
    assert sum(overlaps) / len(overlaps) >= 0.9, overlaps

    # gate body == public operator (probes are a corpus subset there too)
    op = cosine_topk_int8_lsh(
        t.embeddings,
        t.embeddings.filter(F.col("vec_id") < 10),
        _INT8_LSH_PLANES,
        id_col="vec_id",
        vec_col="embedding",
        k=10,
    ).collect()
    key = lambda r: (r.query_id, r.neighbor_id, r.int_dot, r.qcos.hex(), r.rank)
    assert sorted(map(key, op)) == sorted(map(key, got))
    qn.unpersist()


def test_ivf_build_int8_matches_python_reference_exactly(spark):
    """The integer Lloyd build must be EXACT — assignment by integer
    squared L2 with lowest-cluster tiebreak, centroid update by
    trunc-toward-zero integer mean, empty clusters keeping their
    previous centroid — so a pure-Python replay lands on identical
    centroids and tags (this is what lets the SQL oracle replay the
    whole build with no rounding knob).  Partitioning must not
    matter."""
    from wikihadoop_spark.operators.quantize import ivf_build_int8

    rows = [
        (0, [10, 0, 0]), (1, [-9, 1, 0]), (2, [0, 12, 0]),
        (3, [1, 11, -1]), (4, [0, 0, -8]), (5, [2, -1, -9]),
        (6, [9, 1, 1]), (7, [-1, 10, 2]),
    ]

    def py_ivf(data, k, iterations):
        cents = [list(v) for _, v in data[:k]]
        def assign():
            out = {}
            for i, v in data:
                ds = [sum((a - b) ** 2 for a, b in zip(v, c)) for c in cents]
                out[i] = ds.index(min(ds))  # first minimum = lowest cl
            return out
        for _ in range(iterations):
            tags = assign()
            for cl in range(k):
                members = [v for i, v in data if tags[i] == cl]
                if members:
                    cents[cl] = [
                        int(sum(col) / len(members))  # trunc toward zero
                        for col in zip(*members)
                    ]
        return cents, assign()

    want_cents, want_tags = py_ivf(rows, k=3, iterations=2)
    for parts in (1, 5):
        df = spark.createDataFrame(
            rows, "vec_id bigint, q array<int>"
        ).repartition(parts)
        tagged, cents = ivf_build_int8(df, k=3, iterations=2)
        assert cents == want_cents, (parts, cents, want_cents)
        got_tags = {r.vec_id: r.cluster for r in tagged.collect()}
        assert got_tags == want_tags, (parts, got_tags)

    import pytest
    with pytest.raises(ValueError, match="empty"):
        ivf_build_int8(
            spark.createDataFrame([], "vec_id bigint, q array<int>"), k=2
        )


def test_int8_ivf_recall_and_cluster_membership(spark):
    """The composed int8+IVF path: (a) every returned neighbor must
    sit in one of its query's nprobe nearest clusters (the probe
    contract); (b) recall vs the brute-force int8 top-10 must clear
    0.75 mean on the gate fixture (measured 0.89 at sf0.001 / 0.94 at
    sf0.01 with nprobe=4 of k=8 — half the corpus scanned per probe,
    ~90% of the exact answer)."""
    from pyspark.sql import functions as F
    from wikihadoop_spark.operators.quantize import (
        _int_sq_dist,
        int_norm2,
        ivf_build_int8,
        quantize_int8,
    )
    from wikihadoop_spark.relational import QUERIES, Tables

    sf = "/root/testdata/sf0.001"
    got = QUERIES["similarity_topk_int8_ivf"](spark, sf).collect()
    assert got

    # rebuild the index exactly as the gate does (deterministic)
    t = Tables(spark, sf)
    qn = (
        t.embeddings.select(
            "vec_id",
            quantize_int8(F.col("embedding").cast("array<double>")).alias("q"),
        )
        .withColumn("n2", int_norm2(F.col("q")))
        .filter(F.col("n2") > 0)
        .persist()
    )
    tagged, cents = ivf_build_int8(qn, k=8, iterations=2)
    tags = {r.vec_id: r.cluster for r in tagged.collect()}
    qvecs = {
        r.vec_id: r.q
        for r in qn.filter(F.col("vec_id") < 10).collect()
    }

    def probed(qv, nprobe=4):
        ds = [
            (sum((a - b) ** 2 for a, b in zip(qv, c)), i)
            for i, c in enumerate(cents)
        ]
        return {i for _, i in sorted(ds)[:nprobe]}

    ivf_top: dict[int, set[int]] = {}
    for r in got:
        assert tags[r.neighbor_id] in probed(qvecs[r.query_id]), r
        ivf_top.setdefault(r.query_id, set()).add(r.neighbor_id)

    brute: dict[int, set[int]] = {}
    for r in QUERIES["similarity_topk_int8"](spark, sf).collect():
        brute.setdefault(r.query_id, set()).add(r.neighbor_id)
    recs = [len(brute[q] & ivf_top.get(q, set())) / len(brute[q]) for q in brute]
    assert sum(recs) / len(recs) >= 0.75, recs
    qn.unpersist()


def test_multiprobe_pairs_int8_union_and_exactness(spark):
    """SemDeDup blocking over int8: (a) every returned pair must score
    >= threshold under a brute-force exact-int8 replay (no false
    positives — the score is exact, not approximated); (b) the
    two-family union must be a superset of each single family's pairs
    (the multiprobe recall knob is monotone); (c) every returned pair
    must co-bucket under at least one family; (d) qcos must equal the
    pure-Python kernel bitwise."""
    import math

    from pyspark.sql import functions as F
    from wikihadoop_spark.operators.quantize import multiprobe_pairs_int8
    from wikihadoop_spark.relational import (
        _INT8_LSH_PLANES,
        _INT8_LSH_PLANES_B,
        QUERIES,
        Tables,
    )

    sf = "/root/testdata/sf0.001"
    got = {(r.id_a, r.id_b): r.qcos
           for r in QUERIES["embedding_cosine_dedup_int8"](spark, sf).collect()}
    assert got

    t = Tables(spark, sf)
    vecs = {
        r.vec_id: r.embedding
        for r in t.embeddings.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        ).collect()
    }

    def pyq(v):
        mx = max((abs(x) for x in v), default=0.0)
        if mx <= 0.0:
            return [0] * len(v)
        return [int(math.trunc(x * 127.0 / mx)) for x in v]

    q = {i: pyq(v) for i, v in vecs.items()}
    n2 = {i: sum(x * x for x in qq) for i, qq in q.items()}

    def bucket(qq, planes):
        return sum(
            (1 << k)
            for k, p in enumerate(planes)
            if sum(a * b for a, b in zip(qq, p)) >= 0
        )

    for (a, b), qcos in got.items():
        dot = sum(x * y for x, y in zip(q[a], q[b]))
        want = dot / math.sqrt(float(n2[a] * n2[b]))
        assert qcos.hex() == want.hex(), (a, b)  # (d) bitwise kernel
        assert want >= 0.35  # (a) no false positives
        assert any(  # (c) co-bucketed under some family
            bucket(q[a], fam) == bucket(q[b], fam)
            for fam in (_INT8_LSH_PLANES, _INT8_LSH_PLANES_B)
        ), (a, b)

    # (b) union monotone: each single family's pairs are contained
    for fam in (_INT8_LSH_PLANES, _INT8_LSH_PLANES_B):
        single = {
            (r.id_a, r.id_b)
            for r in multiprobe_pairs_int8(
                t.embeddings, [fam], id_col="vec_id", vec_col="embedding",
                threshold=0.35, cap=1000,
            ).collect()
        }
        assert single <= set(got)
    # and the union genuinely adds recall over family A alone on this
    # fixture (otherwise the second family is dead weight)
    fam_a = {
        (r.id_a, r.id_b)
        for r in multiprobe_pairs_int8(
            t.embeddings, [_INT8_LSH_PLANES], id_col="vec_id",
            vec_col="embedding", threshold=0.35, cap=1000,
        ).collect()
    }
    assert fam_a < set(got)


def test_ivf_index_build_once_search_twice(spark, tmp_path, monkeypatch):
    """Round-11 verdict item 4: the IVF index is a written artifact —
    the first search builds + writes it, the SECOND search must run
    ZERO Lloyd jobs (pure parquet read) and return bit-identical
    results.  Pinned by making ivf_build_int8 raise after the first
    build: if the read path ever re-trains, this test explodes."""
    from wikihadoop_spark.operators import quantize as qz

    rows = [
        (0, [10, 0, 0]), (1, [-9, 1, 0]), (2, [0, 12, 0]),
        (3, [1, 11, -1]), (4, [0, 0, -8]), (5, [2, -1, -9]),
        (6, [9, 1, 1]), (7, [-1, 10, 2]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, q array<int>")
    qn = df.withColumn("n2", qz.int_norm2(df.q))
    idx = str(tmp_path / "ivf_idx")

    def search():
        tagged, cents = qz.ivf_build_or_read_int8(spark, qn, idx, k=3, iterations=2)
        res = qz.cosine_topk_int8_ivf(
            tagged, cents, qn.filter("vec_id < 2"),
            id_col="vec_id", q_col="q", n2_col="n2", k=3, nprobe=2,
        )
        key = lambda r: (r.query_id, r.neighbor_id, r.int_dot, r.qcos.hex(), r.rank)
        return sorted(map(key, res.collect()))

    first = search()
    assert first, "first search returned nothing"

    def boom(*a, **k):
        raise AssertionError("Lloyd ran on the read path")

    monkeypatch.setattr(qz, "ivf_build_int8", boom)
    assert search() == first  # zero Lloyd jobs, bit-identical results


def test_ivf_index_path_invalidates_on_corpus_change(spark, tmp_path):
    """A regenerated corpus (different size/mtime — mtime at NANOSECOND
    granularity, so even a same-second same-size rewrite re-keys) must
    key a DIFFERENT artifact path; ivf_index_path itself is pure (no
    filesystem side effects — the round-12 review moved the destructive
    cleanup into the build path), and _cleanup_stale_indexes removes
    only same-stem siblings."""
    import os

    from wikihadoop_spark.operators.quantize import (
        _cleanup_stale_indexes,
        ivf_index_path,
    )

    corpus = tmp_path / "emb.parquet"
    corpus.write_bytes(b"v1-bytes")
    base = str(tmp_path / "cache")
    os.makedirs(base)
    p1 = ivf_index_path(str(corpus), k=8, iterations=2, base=base)
    os.makedirs(p1)  # simulate a written index
    # same byte size, same second: mtime_ns still re-keys the path
    corpus.write_bytes(b"v2-bytes")
    p1b = ivf_index_path(str(corpus), k=8, iterations=2, base=base)
    assert p1b != p1
    corpus.write_bytes(b"v2-bytes-longer")
    p2 = ivf_index_path(str(corpus), k=8, iterations=2, base=base)
    assert p2 not in (p1, p1b)
    assert os.path.exists(p1)  # path computation is PURE — no deletes
    # different params key a different stem — untouched by cleanup
    p3 = ivf_index_path(str(corpus), k=4, iterations=2, base=base)
    assert p3 not in (p1, p1b, p2)
    os.makedirs(p3)
    _cleanup_stale_indexes(p2)  # what the build path runs
    assert not os.path.exists(p1)  # same-stem stale sibling removed
    assert os.path.exists(p3)  # other-stem index untouched


def test_ivf_index_append_then_search(spark, tmp_path, monkeypatch):
    """Index APPEND workflow (train-once/search-many, the write half):
    new vectors are tagged against the trained centroids with
    ivf_assign_int8 (no re-train) and appended to the written index;
    a subsequent search over the re-read index must (a) run zero Lloyd
    jobs, (b) return the appended vector as a neighbor where it ranks,
    and (c) leave all pre-append results intact (the centroids did not
    move, so old assignments and scores are untouched)."""
    from wikihadoop_spark.operators import quantize as qz

    rows = [
        (0, [10, 0, 0]), (1, [-9, 1, 0]), (2, [0, 12, 0]),
        (3, [1, 11, -1]), (4, [0, 0, -8]), (5, [2, -1, -9]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, q array<int>")
    qn = df.withColumn("n2", qz.int_norm2(df.q))
    idx = str(tmp_path / "ivf_idx_append")
    _, cents = qz.ivf_build_or_read_int8(spark, qn, idx, k=2, iterations=2)

    def search(k=10):
        tagged, cs = qz.ivf_read_int8(spark, idx)
        res = qz.cosine_topk_int8_ivf(
            tagged, cs, qn.filter("vec_id = 0"),
            id_col="vec_id", q_col="q", n2_col="n2", k=k, nprobe=2,
        )
        return {
            r.neighbor_id: (r.int_dot, r.qcos.hex(), r.rank)
            for r in res.collect()
        }

    before = search()
    assert 99 not in before

    # append: a near-copy of vector 0 — must become its top neighbor.
    # ivf_append_int8 is THE append path (assign to trained centroids,
    # land in the index's cluster-partitioned layout)
    new = spark.createDataFrame([(99, [10, 1, 0])], "vec_id bigint, q array<int>")
    monkeypatch.setattr(qz, "ivf_build_int8", lambda *a, **k: (_ for _ in ()).throw(
        AssertionError("Lloyd ran during append/search")))
    assert qz.ivf_append_int8(new, cents, idx, id_col="vec_id", q_col="q") == 1

    after = search()
    assert 99 in after and after[99][2] == 1  # appended vector ranks first
    for nid, row in before.items():
        got = after[nid]
        # same dot/cos; rank may shift down by the new arrival only
        assert (got[0], got[1]) == (row[0], row[1])
        assert got[2] in (row[2], row[2] + 1)


def test_ivf_overwrite_never_absent(spark, tmp_path):
    """Round-12 verdict item 3: a reader concurrent with an
    overwrite=True rewrite must never see the destination absent.  The
    publish is a symlink flip (os.rename of a link over a link —
    atomic on POSIX), so a poller hammering lexists/realpath during
    the overwrite must observe a complete index at every instant, and
    the content must be the NEW index afterwards."""
    import os
    import threading

    from wikihadoop_spark.operators import quantize as qz

    rows_a = [(0, [10, 0, 0]), (1, [-9, 1, 0]), (2, [0, 12, 0])]
    rows_b = [(7, [1, 2, 3]), (8, [3, 2, 1])]
    df_a = spark.createDataFrame(rows_a, "vec_id bigint, q array<int>")
    df_b = spark.createDataFrame(rows_b, "vec_id bigint, q array<int>")
    qn_a = df_a.withColumn("n2", qz.int_norm2(df_a.q))
    qn_b = df_b.withColumn("n2", qz.int_norm2(df_b.q))
    ta, ca = qz.ivf_build_int8(qn_a, k=2, iterations=1)
    tb, cb = qz.ivf_build_int8(qn_b, k=2, iterations=1)
    idx = str(tmp_path / "ivf_swap")

    qz.ivf_write_int8(ta, ca, idx, overwrite=True)
    assert os.path.islink(idx)  # published via the symlink layout
    first_target = os.path.realpath(idx)

    gaps: list[str] = []
    stop = threading.Event()

    def poll():
        while not stop.is_set():
            if not os.path.lexists(idx):
                gaps.append("lexists")
            elif not os.path.exists(os.path.join(idx, "vectors")):
                gaps.append("vectors")

    t = threading.Thread(target=poll)
    t.start()
    try:
        qz.ivf_write_int8(tb, cb, idx, overwrite=True)
    finally:
        stop.set()
        t.join()
    assert not gaps, f"destination observed absent during overwrite: {gaps}"
    # the superseded data dir was reaped; content is the new index
    assert not os.path.exists(first_target)
    got, cents = qz.ivf_read_int8(spark, idx)
    assert sorted(r.vec_id for r in got.collect()) == [7, 8]
    assert cents == cb


def test_ivf_overwrite_upgrades_legacy_real_dir(spark, tmp_path):
    """An index laid down as a REAL directory (pre-symlink layout)
    upgrades in place on the next overwrite, leaving no .old orphan."""
    import glob
    import os
    import shutil

    from wikihadoop_spark.operators import quantize as qz

    df = spark.createDataFrame([(0, [5, 0]), (1, [0, 5])],
                               "vec_id bigint, q array<int>")
    qn = df.withColumn("n2", qz.int_norm2(df.q))
    tagged, cents = qz.ivf_build_int8(qn, k=2, iterations=1)
    idx = str(tmp_path / "ivf_legacy")
    qz.ivf_write_int8(tagged, cents, idx, overwrite=True)
    # demote to the legacy layout: replace the symlink with a real dir
    target = os.path.realpath(idx)
    os.unlink(idx)
    shutil.move(target, idx)
    assert os.path.isdir(idx) and not os.path.islink(idx)

    qz.ivf_write_int8(tagged, cents, idx, overwrite=True)
    assert os.path.islink(idx)
    assert not glob.glob(idx + ".old*"), "legacy dir not reaped"
    got, _ = qz.ivf_read_int8(spark, idx)
    assert sorted(r.vec_id for r in got.collect()) == [0, 1]


def test_reap_dead_staging_and_live_exclusion(tmp_path):
    """Round-12 verdict item 4 + advisor: dead-pid staging leftovers
    (.tmp/.lnk/.old/.data of a crashed build) are reaped by the next
    write OR cleanup; staging owned by a LIVE pid survives; the
    published data dir survives even when its builder pid is dead; and
    _cleanup_stale_indexes spares a live pid's staging for an OLDER
    fingerprint sibling."""
    import os

    from wikihadoop_spark.operators.quantize import (
        _cleanup_stale_indexes,
        _reap_dead_staging,
    )

    base = tmp_path / "cache"
    base.mkdir()
    path = str(base / "wikihadoop_ivf8_aaaaaaaa_111111111111")
    live = os.getpid()
    # a pid that is certainly dead: fork and reap a child
    dead = os.fork()
    if dead == 0:
        os._exit(0)
    os.waitpid(dead, 0)

    # published index: symlink -> data dir owned by the dead pid
    data = f"{path}.data{dead}"
    os.makedirs(os.path.join(data, "vectors"))
    os.symlink(data, path)
    for suffix in (f".tmp{dead}", f".old{dead}", f".data{dead}-1"):
        os.makedirs(path + suffix)
    os.symlink(data, f"{path}.lnk{dead}")
    os.makedirs(f"{path}.tmp{live}")

    _reap_dead_staging(path)
    assert os.path.exists(os.path.join(path, "vectors"))  # artifact kept
    assert os.path.exists(data)  # current publish target kept
    for suffix in (f".tmp{dead}", f".old{dead}", f".data{dead}-1",
                   f".lnk{dead}"):
        assert not os.path.lexists(path + suffix), suffix
    assert os.path.exists(f"{path}.tmp{live}")  # live staging spared

    # stale-sibling cleanup: an older-fingerprint PUBLISHED sibling
    # goes; a live pid's staging for that sibling stays
    stale = str(base / "wikihadoop_ivf8_aaaaaaaa_000000000000")
    os.makedirs(stale)
    os.makedirs(f"{stale}.tmp{live}")
    os.makedirs(f"{stale}.tmp{dead}")
    _cleanup_stale_indexes(path)
    assert not os.path.exists(stale)
    assert os.path.exists(f"{stale}.tmp{live}")
    assert not os.path.exists(f"{stale}.tmp{dead}")
    assert os.path.exists(os.path.join(path, "vectors"))


def test_ivf_index_path_rekeys_on_content_change(tmp_path):
    """An mtime-preserving rewrite (rsync -t / cp -p shape) must still
    re-key the artifact path: the content fingerprint (head+tail
    64 KiB) joins the (size, mtime_ns) stat key."""
    import os

    from wikihadoop_spark.operators.quantize import ivf_index_path

    corpus = tmp_path / "emb.parquet"
    corpus.write_bytes(b"aaaa-bytes")
    st = os.stat(corpus)
    p1 = ivf_index_path(str(corpus), k=8, iterations=2, base=str(tmp_path))
    corpus.write_bytes(b"bbbb-bytes")  # same size
    os.utime(corpus, ns=(st.st_atime_ns, st.st_mtime_ns))  # same mtime_ns
    # expire the fingerprint memo's TTL so this exercises the REAL
    # long-lived-driver re-detection path (stat-identical rewrite
    # re-read once the TTL lapses), not a fresh-process simulation
    import wikihadoop_spark.operators.quantize as _qz
    _ttl, _qz._FP_TTL_SEC = _qz._FP_TTL_SEC, 0.0
    try:
        p2 = ivf_index_path(str(corpus), k=8, iterations=2, base=str(tmp_path))
    finally:
        _qz._FP_TTL_SEC = _ttl
    assert p1 != p2
    # variant distinguishes slices of the SAME file
    p3 = ivf_index_path(str(corpus), k=8, iterations=2, base=str(tmp_path),
                        variant="static-split")
    assert p3 not in (p1, p2)


def test_ivf_assign_int8_rejects_dim_mismatch(spark):
    """Appending a vector whose dimension differs from the trained
    centroids must raise LOUDLY at execution (advisor round-12): the
    old behavior NULL-padded the zip_with, silently appending rows no
    search could ever match."""
    import pytest

    from wikihadoop_spark.operators import quantize as qz

    cents = [[5, 0, 0], [0, 5, 0]]
    bad = spark.createDataFrame([(1, [1, 2])], "vec_id bigint, q array<int>")
    with pytest.raises(Exception, match="dimension"):
        qz.ivf_assign_int8(bad, cents, id_col="vec_id", q_col="q").collect()
    with pytest.raises(ValueError, match="empty centroid"):
        qz.ivf_assign_int8(bad, [], id_col="vec_id", q_col="q")
    good = spark.createDataFrame([(1, [1, 2, 3])],
                                 "vec_id bigint, q array<int>")
    out = qz.ivf_assign_int8(good, cents, id_col="vec_id", q_col="q").collect()
    assert out[0].cluster in (0, 1)


def test_ivf_write_no_overwrite_first_writer_wins(spark, tmp_path):
    """overwrite=False is the fingerprint-keyed cache path: if an index
    already exists at the destination, a second write must DROP its own
    copy and leave the existing index untouched (no-replace symlink
    publish — deleting-then-renaming would reopen the half-written
    window for a concurrent reader)."""
    import glob
    import os

    from wikihadoop_spark.operators import quantize as qz

    df_a = spark.createDataFrame([(0, [5, 0]), (1, [0, 5])],
                                 "vec_id bigint, q array<int>")
    df_b = spark.createDataFrame([(7, [1, 1])], "vec_id bigint, q array<int>")
    qn_a = df_a.withColumn("n2", qz.int_norm2(df_a.q))
    qn_b = df_b.withColumn("n2", qz.int_norm2(df_b.q))
    ta, ca = qz.ivf_build_int8(qn_a, k=2, iterations=1)
    tb, cb = qz.ivf_build_int8(qn_b, k=1, iterations=1)
    idx = str(tmp_path / "ivf_first_wins")

    qz.ivf_write_int8(ta, ca, idx, overwrite=False)
    target = os.path.realpath(idx)
    qz.ivf_write_int8(tb, cb, idx, overwrite=False)  # loser: drops its copy
    assert os.path.realpath(idx) == target  # existing index untouched
    got, cents = qz.ivf_read_int8(spark, idx)
    assert sorted(r.vec_id for r in got.collect()) == [0, 1]
    assert cents == ca
    # the loser's staging/data dirs are gone (same live pid cleans its own)
    leftovers = [p for p in glob.glob(idx + ".*")
                 if os.path.realpath(p) != target]
    assert not leftovers, leftovers


def test_ivf_index_layout_cluster_partitioned(spark, tmp_path):
    """The written index's vectors land in hive-style cluster=N
    directories (round 13): a static cluster filter must prune at
    PLANNING time (PartitionFilters on the scan, no cluster predicate
    left as a data filter) — the layout that lets a probe read only
    its nprobe clusters' files at 100 TB.  Appends must land in the
    same layout (same dirs, no stray flat files)."""
    import glob
    import os

    from wikihadoop_spark.operators import quantize as qz

    rows = [(0, [10, 0, 0]), (1, [-9, 1, 0]), (2, [0, 12, 0]),
            (3, [1, 11, -1]), (4, [0, 0, -8]), (5, [2, -1, -9])]
    df = spark.createDataFrame(rows, "vec_id bigint, q array<int>")
    qn = df.withColumn("n2", qz.int_norm2(df.q))
    idx = str(tmp_path / "ivf_layout")
    tagged, cents = qz.ivf_build_or_read_int8(spark, qn, idx, k=2, iterations=1)

    vec_root = os.path.join(os.path.realpath(idx), "vectors")
    part_dirs = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(vec_root, "cluster=*"))
    )
    assert part_dirs, "vectors not cluster-partitioned"
    stray = [p for p in glob.glob(os.path.join(vec_root, "*.parquet"))]
    assert not stray, f"flat files outside cluster dirs: {stray}"

    # static pruning: the cluster predicate is a PartitionFilter
    plan = (
        tagged.filter(F.col("cluster") == 0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [isnotnull(cluster" in plan or \
           "PartitionFilters: [(cluster" in plan, plan[:2000]

    # append joins the same layout
    new = spark.createDataFrame([(99, [10, 1, 0])], "vec_id bigint, q array<int>")
    qz.ivf_append_int8(new, cents, idx, id_col="vec_id", q_col="q")
    stray = [p for p in glob.glob(os.path.join(vec_root, "*.parquet"))]
    assert not stray
    got, _ = qz.ivf_read_int8(spark, idx)
    assert sorted(r.vec_id for r in got.collect()) == [0, 1, 2, 3, 4, 5, 99]


def test_reap_glob_metachars_do_not_cross_indexes(tmp_path):
    """A glob metacharacter in a user-supplied index path must not make
    the staging reaper match (and delete) an UNRELATED index's live
    published data — 'idx[v1].*' must not sweep 'idx1.data<pid>'
    (round-13 review finding; paths are glob-escaped now)."""
    import os

    from wikihadoop_spark.operators.quantize import (
        _cleanup_stale_indexes,
        _reap_dead_staging,
    )

    base = tmp_path / "d"
    base.mkdir()
    dead = os.fork()
    if dead == 0:
        os._exit(0)
    os.waitpid(dead, 0)
    # healthy published index idx1 whose builder pid has exited
    data = str(base / f"idx1.data{dead}")
    os.makedirs(os.path.join(data, "vectors"))
    os.symlink(data, str(base / "idx1"))

    weird = str(base / "idx[v1]")
    _reap_dead_staging(weird)
    _cleanup_stale_indexes(str(base / "wikihadoop_ivf8_aaaa[x]_bbbb"))
    assert os.path.exists(os.path.join(data, "vectors"))
    assert os.path.exists(os.path.join(str(base / "idx1"), "vectors"))


def test_ivf_write_repairs_dangling_symlink(spark, tmp_path):
    """A DANGLING symlink at the cache path (a crashed reaper's
    leftover) must not wedge the cache: overwrite=False used to treat
    any FileExistsError as a complete concurrent winner, discarding
    every rebuild forever while every read failed.  The publish now
    repairs the dangling link and installs the fresh index."""
    import os

    from wikihadoop_spark.operators import quantize as qz

    df = spark.createDataFrame([(0, [5, 0]), (1, [0, 5])],
                               "vec_id bigint, q array<int>")
    qn = df.withColumn("n2", qz.int_norm2(df.q))
    idx = str(tmp_path / "ivf_dangling")
    os.symlink(str(tmp_path / "gone"), idx)  # dangling
    assert not os.path.exists(idx) and os.path.lexists(idx)

    tagged, cents = qz.ivf_build_or_read_int8(spark, qn, idx, k=2, iterations=1)
    assert sorted(r.vec_id for r in tagged.collect()) == [0, 1]
    got, cs = qz.ivf_read_int8(spark, idx)
    assert sorted(r.vec_id for r in got.collect()) == [0, 1]
    assert cs == cents


def test_ivf_index_path_rekeys_on_dir_child_content_change(tmp_path):
    """A DIRECTORY corpus (Spark-written parquet dataset) must re-key
    on an mtime-preserving child-content rewrite — the fingerprint
    hashes head+tail bytes of every child, not just the (name, size,
    mtime) listing (round-13 review finding)."""
    import os

    from wikihadoop_spark.operators.quantize import ivf_index_path

    corpus = tmp_path / "emb.parquet"
    corpus.mkdir()
    part = corpus / "part-00000.parquet"
    part.write_bytes(b"aaaa-bytes")
    st = os.stat(part)
    p1 = ivf_index_path(str(corpus), k=8, iterations=2, base=str(tmp_path))
    part.write_bytes(b"bbbb-bytes")  # same size
    os.utime(part, ns=(st.st_atime_ns, st.st_mtime_ns))  # same mtime_ns
    os.utime(corpus, ns=(st.st_atime_ns, st.st_mtime_ns))
    # expire the fingerprint memo's TTL so this exercises the REAL
    # long-lived-driver re-detection path (stat-identical rewrite
    # re-read once the TTL lapses), not a fresh-process simulation
    import wikihadoop_spark.operators.quantize as _qz
    _ttl, _qz._FP_TTL_SEC = _qz._FP_TTL_SEC, 0.0
    try:
        p2 = ivf_index_path(str(corpus), k=8, iterations=2, base=str(tmp_path))
    finally:
        _qz._FP_TTL_SEC = _ttl
    assert p1 != p2


@pytest.mark.slow
def test_ivf_publish_lifecycle_state_machine(spark, tmp_path):
    """Seeded random walk over the artifact lifecycle — overwrite
    publishes, cache (no-replace) publishes, crashed-build leftovers
    (dead-pid .tmp/.lnk/.data, dangling links), reaps and cleanups in
    arbitrary order — asserting after EVERY step that (a) the
    published index at `path` stays complete and readable with exactly
    the content the model expects, and (b) a reap pass leaves no
    sibling except the live published target.  This is the durability
    contract the three round-13 review findings were violations of."""
    import glob
    import os
    import random

    from wikihadoop_spark.operators import quantize as qz

    def mk(ids):
        df = spark.createDataFrame(
            [(i, [int(i) + 1, 3, 0]) for i in ids], "vec_id bigint, q array<int>"
        )
        qn = df.withColumn("n2", qz.int_norm2(df.q))
        t, c = qz.ivf_build_int8(qn, k=1, iterations=1)
        return t.withColumn("n2", qz.int_norm2(F.col("q"))), c

    dead = os.fork()
    if dead == 0:
        os._exit(0)
    os.waitpid(dead, 0)

    base = tmp_path / "walk"
    base.mkdir()
    path = str(base / "wikihadoop_ivf8_feedface_000000000001")
    rng = random.Random(131)
    published: list[int] | None = None  # model: ids in the live index
    next_id = 0
    aged: list[str] = []  # model: age-expired litter awaiting a reaper
    foreign_aged: list[str] = []  # aged foreign indexes awaiting a clean

    def check():
        if published is None:
            return
        got, _ = qz.ivf_read_int8(spark, path)
        assert sorted(r.vec_id for r in got.collect()) == published

    def assert_aged_reaped():
        # round-14 age rules: expired staging dies whatever its pid
        # says (PID-reuse fallback) — except a live published target
        cur = os.path.realpath(path) if os.path.lexists(path) else None
        for p in list(aged):
            if cur is not None and os.path.realpath(p) == cur:
                continue
            assert not os.path.lexists(p), f"aged staging survived: {p}"
            aged.remove(p)

    for step in range(18):
        op = rng.choice(
            ("over", "cache", "litter", "reap", "clean", "old_litter",
             "foreign_aged")
        )
        if op == "over":
            ids = list(range(next_id, next_id + rng.randrange(1, 3)))
            next_id += len(ids)
            qz.ivf_write_int8(*mk(ids), path, overwrite=True)
            published = ids
        elif op == "cache":
            ids = list(range(next_id, next_id + 1))
            next_id += 1
            qz.ivf_write_int8(*mk(ids), path, overwrite=False)
            if published is None:
                published = ids  # first writer wins
        elif op == "litter":
            kind = rng.choice(("tmp", "lnk", "data", "dangle"))
            if kind == "dangle":
                if published is None and not os.path.lexists(path):
                    # a later cache write must repair this (model: absent)
                    os.symlink(str(base / "nowhere"), path)
            elif kind == "lnk":
                if not os.path.lexists(f"{path}.lnk{dead}"):
                    os.symlink(str(base / "nowhere2"), f"{path}.lnk{dead}")
            else:
                os.makedirs(f"{path}.{kind}{dead}", exist_ok=True)
        elif op == "old_litter":
            # LIVE-pid staging older than the staging horizon: the
            # PID-reuse scenario the round-14 age fallback exists for
            import time as _time

            kind = rng.choice(("tmp", "data", "old"))
            p = f"{path}.{kind}{os.getpid()}"
            if not os.path.lexists(p):
                os.makedirs(p)
                old_ts = _time.time() - qz._STAGING_MAX_AGE_SEC - 5
                os.utime(p, (old_ts, old_ts))
                aged.append(p)
        elif op == "foreign_aged":
            # a legacy-formula / foreign-corpus index past the
            # retirement horizon: only a CLEAN (build-time) sweeps it
            import time as _time

            p = str(base / f"wikihadoop_ivf8_deadd00d_{step:012d}")
            os.makedirs(p)
            old_ts = _time.time() - qz._IVF_MAX_AGE_SEC - 5
            os.utime(p, (old_ts, old_ts))
            foreign_aged.append(p)
        elif op == "reap":
            qz._reap_dead_staging(path)
            assert_aged_reaped()
        else:
            qz._cleanup_stale_indexes(path)
            assert_aged_reaped()
            for p in list(foreign_aged):
                assert not os.path.lexists(p), f"aged foreign index survived: {p}"
                foreign_aged.remove(p)
        check()

    # force a final publish + reap: only the live target may remain
    qz.ivf_write_int8(*mk([99]), path, overwrite=True)
    published = [99]
    qz._cleanup_stale_indexes(path)
    check()
    target = os.path.realpath(path)
    leftovers = [
        p for p in glob.glob(glob.escape(path) + ".*")
        if os.path.realpath(p) != target
    ]
    assert not leftovers, leftovers


def test_ivf_index_path_rekeys_on_nested_child_content_change(tmp_path):
    """A hive-partitioned directory corpus (files in NESTED subdirs)
    must re-key on an mtime-preserving rewrite of a nested part file —
    the fingerprint walks recursively, not just top-level children
    (round-13 second-review finding)."""
    import os

    from wikihadoop_spark.operators.quantize import ivf_index_path

    corpus = tmp_path / "emb.parquet"
    (corpus / "date=1").mkdir(parents=True)
    part = corpus / "date=1" / "part-0.parquet"
    part.write_bytes(b"aaaa-bytes")
    st = os.stat(part)
    dst = os.stat(corpus / "date=1")
    p1 = ivf_index_path(str(corpus), k=8, iterations=2, base=str(tmp_path))
    part.write_bytes(b"bbbb-bytes")  # same size
    os.utime(part, ns=(st.st_atime_ns, st.st_mtime_ns))
    os.utime(corpus / "date=1", ns=(dst.st_atime_ns, dst.st_mtime_ns))
    # expire the fingerprint memo's TTL so this exercises the REAL
    # long-lived-driver re-detection path (stat-identical rewrite
    # re-read once the TTL lapses), not a fresh-process simulation
    import wikihadoop_spark.operators.quantize as _qz
    _ttl, _qz._FP_TTL_SEC = _qz._FP_TTL_SEC, 0.0
    try:
        p2 = ivf_index_path(str(corpus), k=8, iterations=2, base=str(tmp_path))
    finally:
        _qz._FP_TTL_SEC = _ttl
    assert p1 != p2


def test_content_fingerprint_memoizes_on_unchanged_stats(tmp_path, monkeypatch):
    """A pure cache hit (unchanged corpus) must not re-read file bytes
    — the fingerprint is memoized on the recursive stat listing
    (round-13 second-review finding: ivf_index_path runs per query
    invocation, so byte reads on every call would cost ~128 KiB x
    part-files per search at scale)."""
    from wikihadoop_spark.operators import quantize as qz

    corpus = tmp_path / "emb.parquet"
    corpus.write_bytes(b"stable-bytes")
    qz._FP_CACHE.clear()
    fp1 = qz._content_fingerprint(str(corpus))
    reads = []
    real = qz._hash_head_tail
    monkeypatch.setattr(qz, "_hash_head_tail",
                        lambda h, p: (reads.append(p), real(h, p))[1])
    fp2 = qz._content_fingerprint(str(corpus))
    assert fp2 == fp1 and not reads  # hit: stats only, zero byte reads
    corpus.write_bytes(b"changed-bytes")
    fp3 = qz._content_fingerprint(str(corpus))
    assert reads and fp3 != fp1  # stat change: bytes re-read, re-keyed


def test_fingerprint_sidecar_survives_ttl_and_process(tmp_path, monkeypatch):
    """Round-13 verdict item 4: after a TTL lapse (or in a fresh
    process — the memo is per-process), an UNCHANGED corpus must cost
    stats only: the persistent .fp.json sidecar answers the listing
    hash with zero byte re-reads.  A changed corpus still re-reads and
    re-keys, and rewrites the sidecar for the new listing."""
    import os

    from wikihadoop_spark.operators import quantize as qz

    corpus = tmp_path / "emb.parquet"
    corpus.write_bytes(b"sidecar-bytes-v1")
    base = str(tmp_path / "cache")
    os.makedirs(base)
    qz._FP_CACHE.clear()
    p1 = ivf_index_path_ = qz.ivf_index_path(
        str(corpus), k=8, iterations=2, base=base
    )
    sidecars = [f for f in os.listdir(base) if f.endswith(".fp.json")]
    assert len(sidecars) == 1, sidecars

    # TTL lapse / fresh driver: memo gone, sidecar present
    qz._FP_CACHE.clear()
    reads = []
    real = qz._hash_head_tail
    monkeypatch.setattr(qz, "_hash_head_tail",
                        lambda h, p: (reads.append(p), real(h, p))[1])
    p2 = qz.ivf_index_path(str(corpus), k=8, iterations=2, base=base)
    assert p2 == p1 and not reads  # sidecar hit: stats only

    # content rewrite: listing changes -> bytes re-read -> new path,
    # and the sidecar now answers for the NEW listing
    corpus.write_bytes(b"sidecar-bytes-v2-longer")
    p3 = qz.ivf_index_path(str(corpus), k=8, iterations=2, base=base)
    assert p3 != p1 and reads
    qz._FP_CACHE.clear()
    reads.clear()
    p4 = qz.ivf_index_path(str(corpus), k=8, iterations=2, base=base)
    assert p4 == p3 and not reads

    # a corrupt sidecar is ignored, not fatal
    sc = os.path.join(base, sidecars[0])
    with open(sc, "w") as fh:
        fh.write("{not json")
    qz._FP_CACHE.clear()
    assert qz.ivf_index_path(str(corpus), k=8, iterations=2, base=base) == p3
    assert reads  # recomputed from bytes
    del ivf_index_path_


def test_fingerprint_memo_invalidates_on_ctime_bump(tmp_path, monkeypatch):
    """Round-13 review finding: a stat-preserving rewrite (rsync
    --inplace -t restores size+mtime) bumps ctime, which userland
    cannot restore — the listing key includes st_ctime_ns, so the memo
    and sidecar invalidate immediately instead of waiting out the TTL.
    A ctime-only change (chmod here) must re-read bytes but land on
    the SAME fingerprint — metadata churn never re-keys the index."""
    import os

    from wikihadoop_spark.operators import quantize as qz

    corpus = tmp_path / "emb.parquet"
    corpus.write_bytes(b"ctime-bytes")
    base = str(tmp_path / "cache")
    os.makedirs(base)
    qz._FP_CACHE.clear()
    p1 = qz.ivf_index_path(str(corpus), k=8, iterations=2, base=base)
    reads = []
    real = qz._hash_head_tail
    monkeypatch.setattr(qz, "_hash_head_tail",
                        lambda h, p: (reads.append(p), real(h, p))[1])
    st0 = os.stat(corpus)
    os.chmod(corpus, 0o600)  # bumps ctime, preserves size+mtime
    if os.stat(corpus).st_ctime_ns == st0.st_ctime_ns:
        import pytest

        pytest.skip("filesystem did not bump ctime on chmod")
    p2 = qz.ivf_index_path(str(corpus), k=8, iterations=2, base=base)
    assert reads  # memo+sidecar invalidated: bytes re-read NOW, no TTL wait
    assert p2 == p1  # ...but ctime is not in the digest: same index path


def test_legacy_ivf_artifacts_age_out(tmp_path):
    """Round-13 verdict item 5: wikihadoop_ivf8_* entries older than
    _IVF_MAX_AGE_SEC (legacy-formula artifacts, other corpora's
    abandoned indexes, orphaned sidecars) are retired deterministically
    when a build runs — not left for tmpwatch.  Fresh entries and the
    index being built survive."""
    import os
    import time

    from wikihadoop_spark.operators import quantize as qz

    base = tmp_path / "cache"
    base.mkdir()
    old = time.time() - qz._IVF_MAX_AGE_SEC - 60
    # legacy-formula artifact (pre-r13 stem, unknowable by name)
    legacy = base / "wikihadoop_ivf8_deadbeef_000000000000"
    legacy.mkdir()
    (legacy / "vectors").mkdir()
    os.utime(legacy, (old, old))
    # orphaned sidecar of a long-gone corpus
    orphan_sc = base / "wikihadoop_ivf8_cafebabe.fp.json"
    orphan_sc.write_text("{}")
    os.utime(orphan_sc, (old, old))
    # fresh foreign index: survives
    fresh = base / "wikihadoop_ivf8_11111111_222222222222"
    fresh.mkdir()

    corpus = tmp_path / "emb.parquet"
    corpus.write_bytes(b"age-sweep-bytes")
    qz._FP_CACHE.clear()
    path = qz.ivf_index_path(str(corpus), k=8, iterations=2, base=str(base))
    qz._cleanup_stale_indexes(path)
    assert not legacy.exists(), "legacy artifact not retired"
    assert not orphan_sc.exists(), "orphaned sidecar not retired"
    assert fresh.exists(), "fresh foreign index wrongly reaped"
    # the CURRENT corpus's sidecar was just (re)written: fresh, survives
    assert any(f.endswith(".fp.json") for f in os.listdir(base))


def test_staging_age_fallback_beats_pid_reuse(tmp_path):
    """Round-13 review finding: a crashed build's staging whose pid was
    recycled by a long-lived process looks alive forever.  The reaper's
    age fallback retires staging older than _STAGING_MAX_AGE_SEC even
    when the pid checks out as alive (faked here with OUR OWN pid)."""
    import os
    import time

    from wikihadoop_spark.operators.quantize import (
        _STAGING_MAX_AGE_SEC,
        _reap_dead_staging,
    )

    path = str(tmp_path / "idx")
    pid = os.getpid()  # alive by construction
    stale_tmp = f"{path}.tmp{pid}"
    os.makedirs(stale_tmp)
    old = time.time() - _STAGING_MAX_AGE_SEC - 60
    os.utime(stale_tmp, (old, old))
    fresh_tmp = f"{path}.data{pid}"
    os.makedirs(fresh_tmp)

    _reap_dead_staging(path)
    assert not os.path.exists(stale_tmp), "expired live-pid staging kept"
    assert os.path.exists(fresh_tmp), "fresh live-pid staging reaped"

    # the CURRENT publish target is protected even when expired
    os.symlink(fresh_tmp, path)
    os.utime(fresh_tmp, (old, old))
    _reap_dead_staging(path)
    assert os.path.exists(fresh_tmp), "published target reaped by age rule"


def test_ivf_overwrite_publish_failure_is_loud(spark, tmp_path, monkeypatch):
    """Round-13 review finding: if the overwrite=True symlink flip
    fails after the legacy real-dir index was renamed aside, the old
    index must be RESTORED and the failure re-raised — not silently
    swallowed with the overwrite misreported as success."""
    import os

    import pytest

    from wikihadoop_spark.operators import quantize as qz

    df = spark.createDataFrame(
        [(0, [5, 0], 25, 0), (1, [0, 5], 25, 1)],
        "vec_id bigint, q array<int>, n2 bigint, cluster int",
    )
    path = str(tmp_path / "idx")
    # fabricate a legacy REAL-DIRECTORY index (pre-symlink layout):
    # write normally, then replace the published link with its target
    qz.ivf_write_int8(df, [[5, 0], [0, 5]], path, overwrite=True)
    tgt = os.path.realpath(path)
    os.unlink(path)
    os.rename(tgt, path)
    assert os.path.isdir(path) and not os.path.islink(path)
    marker = os.path.join(path, "centroids")
    assert os.path.exists(marker)

    real_rename = os.rename

    def flaky_rename(src, dst, **kw):
        if src.endswith(f".lnk{os.getpid()}") and dst == path:
            raise OSError("injected publish failure")
        return real_rename(src, dst, **kw)

    monkeypatch.setattr(os, "rename", flaky_rename)
    with pytest.raises(OSError, match="injected publish failure"):
        qz.ivf_write_int8(df, [[5, 0], [0, 5]], path, overwrite=True)
    monkeypatch.setattr(os, "rename", real_rename)
    # the OLD index was restored at path — never absent, never half-gone
    assert os.path.isdir(path) and not os.path.islink(path)
    assert os.path.exists(marker)


def test_probe_dim_mismatch_raises_loudly(spark):
    """Round-13 review finding: the probe-side twin of the append
    path's dimension guard — a mis-dimensioned query vector must raise
    at execution, not zip_with-pad into a silently empty match set.
    nprobe_clusters is THE shared probe rule, so this covers the batch
    search and the streaming probe alike."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.sql import functions as SF

    from wikihadoop_spark.operators.quantize import nprobe_clusters

    cents = [[5, 0, 0], [0, 5, 0]]
    bad = spark.createDataFrame([(0, [1, 2])], "vec_id bigint, q array<int>")
    with pytest.raises((Py4JJavaError, Exception), match="dimension"):
        bad.select(nprobe_clusters(SF.col("q"), cents, 1)).collect()
    ok = spark.createDataFrame([(0, [1, 2, 3])], "vec_id bigint, q array<int>")
    got = ok.select(
        nprobe_clusters(SF.col("q"), cents, 2).alias("cl")
    ).collect()
    # [1,2,3]: d((5,0,0))=29, d((0,5,0))=19 -> nearest 1 then 0
    assert got[0].cl == [1, 0]
    with pytest.raises(ValueError, match="empty centroid"):
        nprobe_clusters(SF.col("q"), [], 1)


def test_ivf_append_detects_concurrent_flip(spark, tmp_path, monkeypatch):
    """Round-13 review finding: an append racing an overwrite=True
    re-publish would land its rows in the superseded .data target.
    The append pins the resolved target up front and verifies the link
    afterwards — a flip during the append raises loudly instead of
    silently losing the rows."""
    import os

    import pytest

    from wikihadoop_spark.operators import quantize as qz

    df = spark.createDataFrame(
        [(0, [5, 0], 25, 0), (1, [0, 5], 25, 1)],
        "vec_id bigint, q array<int>, n2 bigint, cluster int",
    )
    path = str(tmp_path / "idx")
    qz.ivf_write_int8(df, [[5, 0], [0, 5]], path, overwrite=True)
    assert os.path.islink(path)

    real_assign = qz.ivf_assign_int8

    def flip_then_assign(*a, **k):
        # simulate a concurrent publisher flipping the link mid-append
        other = str(tmp_path / "other.data")
        os.makedirs(os.path.join(other, "vectors"), exist_ok=True)
        lnk = path + ".race"
        os.symlink(other, lnk)
        os.rename(lnk, path)
        return real_assign(*a, **k)

    monkeypatch.setattr(qz, "ivf_assign_int8", flip_then_assign)
    new = spark.createDataFrame([(9, [4, 1])], "vec_id bigint, q array<int>")
    with pytest.raises(RuntimeError, match="re-published while appending"):
        qz.ivf_append_int8(new, [[5, 0], [0, 5]], path)


def test_fingerprint_sidecar_backfills_on_memo_hit(tmp_path):
    """A second (corpus, params) stem whose first call lands on a warm
    memo must still get ITS sidecar written — otherwise a fresh
    process would pay one byte re-read per stem forever."""
    import os

    from wikihadoop_spark.operators import quantize as qz

    corpus = tmp_path / "emb.parquet"
    corpus.write_bytes(b"backfill-bytes")
    base = str(tmp_path / "cache")
    os.makedirs(base)
    qz._FP_CACHE.clear()
    qz.ivf_index_path(str(corpus), k=8, iterations=2, base=base)
    # second stem, warm memo: sidecar must appear without byte reads
    qz.ivf_index_path(str(corpus), k=4, iterations=2, base=base)
    sidecars = [f for f in os.listdir(base) if f.endswith(".fp.json")]
    assert len(sidecars) == 2, sidecars


def test_age_sweep_escapes_glob_metachars_in_base(tmp_path):
    """Round-14 review finding: the age sweep must glob.escape the
    base dir — a metacharacter in a user-supplied base ('run[v1]')
    would otherwise match sibling directories ('runv', 'run1') and
    rmtree THEIR live aged indexes."""
    import os
    import time

    from wikihadoop_spark.operators import quantize as qz

    weird = tmp_path / "run[v1]"
    sibling = tmp_path / "runv"  # what the char-class would match
    weird.mkdir()
    sibling.mkdir()
    old = time.time() - qz._IVF_MAX_AGE_SEC - 60
    victim = sibling / "wikihadoop_ivf8_aaaaaaaa_bbbbbbbbbbbb"
    victim.mkdir()
    os.utime(victim, (old, old))

    corpus = tmp_path / "emb.parquet"
    corpus.write_bytes(b"metachar-base-bytes")
    qz._FP_CACHE.clear()
    path = qz.ivf_index_path(str(corpus), k=8, iterations=2, base=str(weird))
    qz._cleanup_stale_indexes(path)
    assert victim.exists(), "age sweep crossed into a sibling directory"


def test_sidecar_read_hit_refreshes_mtime(tmp_path):
    """Round-14 review finding: a live in-use sidecar must not age out
    of the 7-day sweep — a read HIT bumps its mtime, so only genuinely
    unused sidecars retire."""
    import os
    import time

    from wikihadoop_spark.operators import quantize as qz

    corpus = tmp_path / "emb.parquet"
    corpus.write_bytes(b"mtime-refresh-bytes")
    base = str(tmp_path / "cache")
    os.makedirs(base)
    qz._FP_CACHE.clear()
    path = qz.ivf_index_path(str(corpus), k=8, iterations=2, base=base)
    sc = next(
        os.path.join(base, f) for f in os.listdir(base)
        if f.endswith(".fp.json")
    )
    old = time.time() - qz._IVF_MAX_AGE_SEC - 60
    os.utime(sc, (old, old))
    qz._FP_CACHE.clear()  # fresh-process analog: forces the sidecar read
    assert qz.ivf_index_path(str(corpus), k=8, iterations=2, base=base) == path
    assert time.time() - os.lstat(sc).st_mtime < 3600, (
        "sidecar read hit did not refresh mtime"
    )
    qz._cleanup_stale_indexes(path)
    assert os.path.exists(sc), "freshly-used sidecar reaped by age sweep"


def test_append_tag_mismatch_rebuilds(spark, tmp_path):
    """Round-14 review finding: the append slice is part of the
    artifact's identity — a marker recording a DIFFERENT append_tag
    must force a rebuild with the new slice, never silently serve the
    other call's rows."""
    from wikihadoop_spark.operators import quantize as qz

    def qn(ids):
        df = spark.createDataFrame(
            [(i, [int(i) + 1, 3, 0]) for i in ids], "vec_id bigint, q array<int>"
        )
        return df.withColumn("n2", qz.int_norm2(df.q))

    corpus = qn(range(10, 16))
    idx = str(tmp_path / "idx_tagged")
    tagged_a, _ = qz.ivf_build_append_or_read_int8(
        spark, corpus, qn([1]), idx, k=2, iterations=1, append_tag="slice-a"
    )
    assert {r.vec_id for r in tagged_a.collect()} == {10, 11, 12, 13, 14, 15, 1}
    # same path, same params, DIFFERENT slice: must rebuild, not reuse
    tagged_b, _ = qz.ivf_build_append_or_read_int8(
        spark, corpus, qn([2]), idx, k=2, iterations=1, append_tag="slice-b"
    )
    assert {r.vec_id for r in tagged_b.collect()} == {10, 11, 12, 13, 14, 15, 2}
    # matching tag: pure read, no double append
    tagged_b2, _ = qz.ivf_build_append_or_read_int8(
        spark, corpus, qn([2]), idx, k=2, iterations=1, append_tag="slice-b"
    )
    rows = tagged_b2.collect()
    assert len(rows) == 7 and {r.vec_id for r in rows} == {10, 11, 12, 13, 14, 15, 2}


def test_probe_null_vector_matches_nothing_not_crash(spark):
    """Round-14 review finding: the dimension guard must not turn a
    NULL probe vector into a job abort — NULL probes nothing (the
    pre-guard behavior); only a present, mis-dimensioned vector is a
    loud error."""
    from pyspark.sql import functions as SF

    from wikihadoop_spark.operators.quantize import nprobe_clusters

    cents = [[5, 0, 0], [0, 5, 0]]
    df = spark.createDataFrame(
        [(0, None), (1, [1, 2, 3])], "vec_id bigint, q array<int>"
    )
    got = {
        r.vec_id: r.cl
        for r in df.select(
            "vec_id", nprobe_clusters(SF.col("q"), cents, 1).alias("cl")
        ).collect()
    }
    # the NULL row did NOT abort the job, and it probes NOTHING: the
    # result is a NULL array (not the pre-guard accident of probing
    # cluster 0 with NULL scores)
    assert got[0] is None
    assert got[1] == [1]
    # exploded (the probe join shape): the NULL row simply vanishes
    n = df.select(SF.explode(nprobe_clusters(SF.col("q"), cents, 1))).count()
    assert n == 1


def test_build_rejects_mis_dimensioned_corpus_vector(spark):
    """Round-14 review finding: the BUILD path needs the same
    dimension guard the append and probe paths have — a mis-sized
    corpus vector would otherwise tag as cluster NULL, land in the
    written artifact's hive default partition, and silently never
    match any search."""
    import pytest

    from wikihadoop_spark.operators import quantize as qz

    df = spark.createDataFrame(
        [(0, [5, 0, 0]), (1, [0, 5, 0]), (2, [1, 2])],  # row 2: 2-dim
        "vec_id bigint, q array<int>",
    )
    with pytest.raises(Exception, match="dimension"):
        tagged, _ = qz.ivf_build_int8(df, k=2, iterations=1)
        tagged.collect()


def test_append_dedupe_token_skips_replayed_epoch(spark, tmp_path):
    """Round-14 review finding: foreachBatch replays an epoch after a
    failure between the append and the checkpoint commit — a repeated
    dedupe_token must skip (return 0) instead of landing the same rows
    twice; a new token appends normally."""
    from wikihadoop_spark.operators import quantize as qz

    df = spark.createDataFrame(
        [(0, [5, 0], 25, 0), (1, [0, 5], 25, 1)],
        "vec_id bigint, q array<int>, n2 bigint, cluster int",
    )
    path = str(tmp_path / "idx_epochs")
    qz.ivf_write_int8(df, [[5, 0], [0, 5]], path, overwrite=True)
    new = spark.createDataFrame([(9, [4, 1])], "vec_id bigint, q array<int>")
    cents = [[5, 0], [0, 5]]
    assert qz.ivf_append_int8(new, cents, path, dedupe_token="epoch-7") == 1
    # replayed epoch: skipped, no duplicate rows
    assert qz.ivf_append_int8(new, cents, path, dedupe_token="epoch-7") == 0
    tagged, _ = qz.ivf_read_int8(spark, path)
    assert [r.vec_id for r in tagged.collect()].count(9) == 1
    # a fresh epoch appends
    new2 = spark.createDataFrame([(10, [1, 4])], "vec_id bigint, q array<int>")
    assert qz.ivf_append_int8(new2, cents, path, dedupe_token="epoch-8") == 1
    tagged, _ = qz.ivf_read_int8(spark, path)
    assert sorted(r.vec_id for r in tagged.collect()) == [0, 1, 9, 10]


def test_dir_corpus_path_ignores_toplevel_dir_mtime(tmp_path):
    """Round-14 review finding: namespace-neutral directory-mtime
    churn (a stray temp file created and deleted, `touch dir/`) must
    NOT re-key a directory corpus — the recursive listing + content
    fingerprint already cover every real change."""
    import os

    from wikihadoop_spark.operators import quantize as qz

    corpus = tmp_path / "emb.parquet"
    (corpus / "date=1").mkdir(parents=True)
    part = corpus / "date=1" / "part-0.parquet"
    part.write_bytes(b"dir-stable-bytes")
    base = str(tmp_path / "cache")
    os.makedirs(base)
    qz._FP_CACHE.clear()
    p1 = qz.ivf_index_path(str(corpus), k=8, iterations=2, base=base)
    # churn the top-level dir's mtime without touching any file
    stray = corpus / "_tmp_editor_file"
    stray.write_bytes(b"x")
    stray.unlink()
    qz._FP_CACHE.clear()
    p2 = qz.ivf_index_path(str(corpus), k=8, iterations=2, base=base)
    assert p2 == p1, "dir-mtime churn re-keyed a content-identical corpus"
    # a real nested content change still re-keys
    part.write_bytes(b"dir-changed-bytes!!")
    qz._FP_CACHE.clear()
    assert qz.ivf_index_path(str(corpus), k=8, iterations=2, base=base) != p1


def test_sidecar_backfill_heals_stale_content(tmp_path, monkeypatch):
    """Round-14 review finding: the memo-hit backfill must validate
    sidecar CONTENT, not bare existence — a stem whose sidecar records
    a superseded listing heals on the next warm-memo call, so a fresh
    process pays stats only."""
    import os

    from wikihadoop_spark.operators import quantize as qz

    corpus = tmp_path / "emb.parquet"
    corpus.write_bytes(b"heal-bytes-v1")
    base = str(tmp_path / "cache")
    os.makedirs(base)
    qz._FP_CACHE.clear()
    qz.ivf_index_path(str(corpus), k=8, iterations=2, base=base)  # stem A
    qz.ivf_index_path(str(corpus), k=4, iterations=2, base=base)  # stem B
    # corpus changes; stem A's call recomputes and rewrites ITS sidecar
    corpus.write_bytes(b"heal-bytes-v2-longer")
    qz.ivf_index_path(str(corpus), k=8, iterations=2, base=base)
    # stem B's next call hits the warm memo — it must HEAL B's sidecar
    pB = qz.ivf_index_path(str(corpus), k=4, iterations=2, base=base)
    # fresh process: B's sidecar must now answer with zero byte reads
    qz._FP_CACHE.clear()
    reads = []
    real = qz._hash_head_tail
    monkeypatch.setattr(qz, "_hash_head_tail",
                        lambda h, p: (reads.append(p), real(h, p))[1])
    assert qz.ivf_index_path(str(corpus), k=4, iterations=2, base=base) == pB
    assert not reads, "stale stem-B sidecar was not healed on the memo hit"


def test_multiprobe_cache_is_single_slot(spark):
    """Round-14 review finding: multiprobe_pairs_int8's persisted
    quantized frame is function-local and the returned frame is lazy,
    so the function can never unpersist its own cache — each call must
    release the PREVIOUS call's frame, bounding pinned storage at one
    corpus projection per process."""
    from pyspark import StorageLevel

    from wikihadoop_spark.operators import quantize as qz
    from wikihadoop_spark.relational import _INT8_LSH_PLANES, Tables

    t = Tables(spark, "/root/testdata/sf0.001")
    qz.multiprobe_pairs_int8(
        t.embeddings, [_INT8_LSH_PLANES], id_col="vec_id",
        vec_col="embedding", threshold=0.35, cap=1000,
    ).count()
    assert len(qz._MULTIPROBE_CACHE_SLOT) == 1
    first = qz._MULTIPROBE_CACHE_SLOT[0]
    # a semantically-identical repeat SHARES the cache entry — it must
    # NOT be released (CacheManager keys by analyzed plan, so
    # unpersisting the old handle would uncache the new call too)
    qz.multiprobe_pairs_int8(
        t.embeddings, [_INT8_LSH_PLANES], id_col="vec_id",
        vec_col="embedding", threshold=0.35, cap=1000,
    ).count()
    assert len(qz._MULTIPROBE_CACHE_SLOT) == 1
    assert first.storageLevel != StorageLevel.NONE
    # a DIFFERENT corpus releases the previous projection
    qz.multiprobe_pairs_int8(
        t.embeddings.filter("vec_id < 500"), [_INT8_LSH_PLANES],
        id_col="vec_id", vec_col="embedding", threshold=0.35, cap=1000,
    ).count()
    assert len(qz._MULTIPROBE_CACHE_SLOT) == 1
    assert first.storageLevel == StorageLevel.NONE, (
        "previous call's cache was not released"
    )
    qz._MULTIPROBE_CACHE_SLOT.pop().unpersist()  # leave the session clean


def test_hot_index_read_survives_age_sweep(spark, tmp_path):
    """Round-14 verdict item 2 / ADVICE: the 7-day age sweep retires a
    published index by its own lstat mtime, and reads used to refresh
    only the .fp.json sidecar — so an index SEARCHED daily but not
    rebuilt for a week was reaped by any co-located build.  Now a
    successful ivf_read_int8 touches the published entry itself: an
    index read after its mtime passed the horizon survives a sibling
    build's sweep; a genuinely idle one still retires."""
    import os
    import time

    from wikihadoop_spark.operators import quantize as qz

    df = spark.createDataFrame(
        [(0, [5, 0], 25, 0), (1, [0, 5], 25, 1)],
        "vec_id bigint, q array<int>, n2 bigint, cluster int",
    )
    base = tmp_path / "cache"
    base.mkdir()
    hot = str(base / "wikihadoop_ivf8_aaaaaaaa_111111111111")
    idle = str(base / "wikihadoop_ivf8_bbbbbbbb_222222222222")
    qz.ivf_write_int8(df, [[5, 0], [0, 5]], hot, overwrite=True)
    qz.ivf_write_int8(df, [[5, 0], [0, 5]], idle, overwrite=True)
    old = time.time() - qz._IVF_MAX_AGE_SEC - 60
    for p in (hot, idle):
        # age the published symlink AND its .data target: the sweep
        # lstats both independently, and the r15 review found a fresh
        # link over an aged target still lost its data
        os.utime(p, (old, old), follow_symlinks=False)
        os.utime(os.path.realpath(p), (old, old))
    # a daily search reads the hot index — the read refreshes its mtime
    tagged, cents = qz.ivf_read_int8(spark, hot)
    assert tagged.count() == 2 and len(cents) == 2
    assert time.time() - os.lstat(hot).st_mtime < 3600, (
        "read did not refresh the published entry's lstat mtime"
    )
    # a sibling build (different corpus, same base dir) runs the sweep
    corpus = tmp_path / "emb.parquet"
    corpus.write_bytes(b"hot-index-shield-bytes")
    qz._FP_CACHE.clear()
    sibling = qz.ivf_index_path(str(corpus), k=8, iterations=2, base=str(base))
    qz._cleanup_stale_indexes(sibling)
    assert os.path.lexists(hot), "hot (read-daily) index reaped by age sweep"
    assert not os.path.lexists(idle), "idle index not retired at the horizon"
    # the survivor is still fully readable after the sweep
    tagged, _ = qz.ivf_read_int8(spark, hot)
    assert tagged.count() == 2


def test_append_token_sanitization_cannot_collide(spark, tmp_path):
    """Round-14 ADVICE: marker names built from sanitization alone map
    distinct tokens ('epoch/1' vs 'epoch_1') to one marker, silently
    skipping a legitimate batch as a replay.  The sha256 suffix keeps
    them distinct: both batches must land."""
    from wikihadoop_spark.operators import quantize as qz

    df = spark.createDataFrame(
        [(0, [5, 0], 25, 0), (1, [0, 5], 25, 1)],
        "vec_id bigint, q array<int>, n2 bigint, cluster int",
    )
    path = str(tmp_path / "idx_tokens")
    qz.ivf_write_int8(df, [[5, 0], [0, 5]], path, overwrite=True)
    cents = [[5, 0], [0, 5]]
    a = spark.createDataFrame([(9, [4, 1])], "vec_id bigint, q array<int>")
    b = spark.createDataFrame([(10, [1, 4])], "vec_id bigint, q array<int>")
    assert qz.ivf_append_int8(a, cents, path, dedupe_token="epoch/1") == 1
    assert qz.ivf_append_int8(b, cents, path, dedupe_token="epoch_1") == 1, (
        "sanitization collision dropped a distinct token's batch"
    )
    # and each token individually still dedupes its own replay
    assert qz.ivf_append_int8(a, cents, path, dedupe_token="epoch/1") == 0
    tagged, _ = qz.ivf_read_int8(spark, path)
    assert sorted(r.vec_id for r in tagged.collect()) == [0, 1, 9, 10]


def test_append_reconciles_crash_between_land_and_marker(spark, tmp_path, monkeypatch):
    """Round-14 verdict item 3: the old protocol's unfixable window — a
    crash AFTER the rows landed but BEFORE the marker write — used to
    double-append on replay.  The two-phase landing reconciles it: the
    replay finds the intent, unlinks the listed files, and redoes the
    append — exactly-once, bit-identical to a crash-free run."""
    import os

    from wikihadoop_spark.operators import quantize as qz

    df = spark.createDataFrame(
        [(0, [5, 0], 25, 0), (1, [0, 5], 25, 1)],
        "vec_id bigint, q array<int>, n2 bigint, cluster int",
    )
    path = str(tmp_path / "idx_crash")
    qz.ivf_write_int8(df, [[5, 0], [0, 5]], path, overwrite=True)
    cents = [[5, 0], [0, 5]]
    new = spark.createDataFrame(
        [(9, [4, 1]), (10, [1, 4])], "vec_id bigint, q array<int>"
    )

    real_finalize = qz._finalize_append_marker

    def crash_at_marker(marker, intent, dests):
        raise RuntimeError("injected crash between landing and marker")

    monkeypatch.setattr(qz, "_finalize_append_marker", crash_at_marker)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="injected crash"):
        qz.ivf_append_int8(new, cents, path, dedupe_token="epoch-3")
    # the rows LANDED (the crash was after step 3) and the intent is
    # still present — exactly the unreconcilable old-protocol state
    resolved = os.path.realpath(path)
    marker, intent, stage, _sha = qz._append_marker_paths(resolved, "epoch-3")
    assert os.path.exists(intent) and not os.path.exists(marker)
    landed = [r.vec_id for r in qz.ivf_read_int8(spark, path)[0].collect()]
    assert sorted(landed) == [0, 1, 9, 10]

    # the replayed epoch reconciles: no duplicates, exactly one copy
    monkeypatch.setattr(qz, "_finalize_append_marker", real_finalize)
    assert qz.ivf_append_int8(new, cents, path, dedupe_token="epoch-3") == 2
    tagged, _ = qz.ivf_read_int8(spark, path)
    got = sorted(r.vec_id for r in tagged.collect())
    assert got == [0, 1, 9, 10], f"replay duplicated or dropped rows: {got}"
    assert os.path.exists(marker) and not os.path.exists(intent)
    # a further replay is a clean skip
    assert qz.ivf_append_int8(new, cents, path, dedupe_token="epoch-3") == 0
    # crash BEFORE the intent (between staging and step 2): nothing
    # visible landed, replay just redoes
    new2 = spark.createDataFrame([(11, [5, 1])], "vec_id bigint, q array<int>")

    def crash_at_land(rows, resolved, intent, stage, sha):
        rows.write.mode("overwrite").partitionBy("cluster").parquet(stage)
        raise RuntimeError("injected crash before intent")

    monkeypatch.setattr(qz, "_land_append_staged", crash_at_land)
    with _pytest.raises(RuntimeError, match="before intent"):
        qz.ivf_append_int8(new2, cents, path, dedupe_token="epoch-4")
    assert sorted(
        r.vec_id for r in qz.ivf_read_int8(spark, path)[0].collect()
    ) == [0, 1, 9, 10], "staged rows leaked into the readable index"
    monkeypatch.undo()
    assert qz.ivf_append_int8(new2, cents, path, dedupe_token="epoch-4") == 1
    assert sorted(
        r.vec_id for r in qz.ivf_read_int8(spark, path)[0].collect()
    ) == [0, 1, 9, 10, 11]


def test_reaped_index_read_fails_loudly(spark, tmp_path):
    """Round-14 verdict item 6: the documented failure mode for an
    index reaped while a reader holds an open scan is a LOUD job
    failure — never a silently-empty result that would masquerade as
    'no neighbors'.  Pin it: a collect over a just-reaped index
    raises."""
    import pytest as _pytest

    from wikihadoop_spark.operators import quantize as qz

    df = spark.createDataFrame(
        [(0, [5, 0], 25, 0), (1, [0, 5], 25, 1)],
        "vec_id bigint, q array<int>, n2 bigint, cluster int",
    )
    path = str(tmp_path / "idx_reaped")
    qz.ivf_write_int8(df, [[5, 0], [0, 5]], path, overwrite=True)
    tagged, cents = qz.ivf_read_int8(spark, path)  # open (lazy) scan
    assert tagged.count() == 2  # the scan works while the index lives
    qz._remove_index(path)  # what the age sweep does
    with _pytest.raises(Exception):
        tagged.count()


def test_int8_cosine_tracks_float_reference(spark):
    """The PRECISION-REFERENCE pin the float-twin retirement plan
    requires (rotation comment, relational.py: embedding_cosine_dedup
    may retire from the catalog only after an equivalent float-vs-int8
    agreement pin lives here).  On the fixed sf0.001 fixture:

    (a) the exact-int8 quantized cosine tracks the TRUE float cosine
        within 0.02 for every emitted dedup pair AND for 2000 seeded
        random pairs (observed max deviation on this fixture: 0.0073;
        trunc-to-127-levels theory bounds it near 0.016) — which also
        implies int8 ranking agrees with float ranking for any two
        pairs whose float cosines differ by more than 0.04;
    (b) threshold transfer, both directions with the 0.02 margin:
        every pair the int8 blocking emits at threshold 0.35 has float
        cosine >= 0.33, and every co-bucketed pair with float cosine
        >= 0.37 is emitted — so the int8 query is a faithful stand-in
        for the float multiprobe pass, not merely self-consistent."""
    import math
    import random

    from pyspark.sql import functions as F

    from wikihadoop_spark.relational import (
        _INT8_LSH_PLANES,
        _INT8_LSH_PLANES_B,
        QUERIES,
        Tables,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        (r.id_a, r.id_b): r.qcos
        for r in QUERIES["embedding_cosine_dedup_int8"](spark, sf).collect()
    }
    assert got

    t = Tables(spark, sf)
    vecs = {
        r.vec_id: list(r.embedding)
        for r in t.embeddings.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        ).collect()
    }

    def pyq(v):
        mx = max((abs(x) for x in v), default=0.0)
        if mx <= 0.0:
            return [0] * len(v)
        return [int(math.trunc(x * 127.0 / mx)) for x in v]

    q = {i: pyq(v) for i, v in vecs.items()}
    n2 = {i: sum(x * x for x in qq) for i, qq in q.items()}

    def fcos(a, b):
        va, vb = vecs[a], vecs[b]
        na = math.sqrt(sum(x * x for x in va))
        nb = math.sqrt(sum(x * x for x in vb))
        return sum(x * y for x, y in zip(va, vb)) / (na * nb)

    def qcos_py(a, b):
        return sum(x * y for x, y in zip(q[a], q[b])) / math.sqrt(
            float(n2[a] * n2[b])
        )

    # (a) agreement on the emitted pairs and on a seeded random sample
    for (a, b), qc in got.items():
        assert abs(qc - fcos(a, b)) <= 0.02, (a, b)
    ids = [i for i in vecs if n2[i] > 0]
    rng = random.Random(42)
    for _ in range(2000):
        a, b = rng.sample(ids, 2)
        assert abs(qcos_py(a, b) - fcos(a, b)) <= 0.02, (a, b)

    # (b) threshold transfer
    for (a, b) in got:
        assert fcos(a, b) >= 0.33, (a, b)

    def bucket(qq, planes):
        return sum(
            (1 << k)
            for k, p in enumerate(planes)
            if sum(x * y for x, y in zip(qq, p)) >= 0
        )

    by_bucket: dict[tuple[int, int], list[int]] = {}
    for fam_i, fam in enumerate((_INT8_LSH_PLANES, _INT8_LSH_PLANES_B)):
        for i in ids:
            by_bucket.setdefault((fam_i, bucket(q[i], fam)), []).append(i)
    missed = []
    for members in by_bucket.values():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                a, b = sorted((members[x], members[y]))
                if fcos(a, b) >= 0.37 and (a, b) not in got:
                    missed.append((a, b))
    assert not missed, f"co-bucketed strong pairs not emitted: {missed[:5]}"


def test_append_honors_legacy_pre_hash_marker(spark, tmp_path):
    """Round-15 review finding: the marker name gained a token-hash
    suffix, but an index written by the PREVIOUS protocol carries
    plain _append_<safe> markers — the first checkpoint-restart replay
    after an upgrade must still recognize them, or it double-appends
    an already-landed epoch."""
    import os

    from wikihadoop_spark.operators import quantize as qz

    df = spark.createDataFrame(
        [(0, [5, 0], 25, 0), (1, [0, 5], 25, 1)],
        "vec_id bigint, q array<int>, n2 bigint, cluster int",
    )
    path = str(tmp_path / "idx_legacy_marker")
    qz.ivf_write_int8(df, [[5, 0], [0, 5]], path, overwrite=True)
    cents = [[5, 0], [0, 5]]
    # simulate the pre-upgrade state: epoch 7's rows landed (plain
    # spark append) and the OLD-format marker was written
    landed = spark.createDataFrame([(9, [4, 1])], "vec_id bigint, q array<int>")
    assert qz.ivf_append_int8(landed, cents, path) == 1  # no token: plain
    with open(os.path.join(os.path.realpath(path), "_append_epoch-7"), "w"):
        pass
    # the upgraded code replays epoch 7: recognized, skipped
    assert qz.ivf_append_int8(landed, cents, path, dedupe_token="epoch-7") == 0
    tagged, _ = qz.ivf_read_int8(spark, path)
    assert sorted(r.vec_id for r in tagged.collect()) == [0, 1, 9]
    # a genuinely new epoch under the new protocol still lands
    new = spark.createDataFrame([(10, [1, 4])], "vec_id bigint, q array<int>")
    assert qz.ivf_append_int8(new, cents, path, dedupe_token="epoch-8") == 1


@pytest.mark.slow
def test_append_crash_state_enumeration(spark, tmp_path):
    """Exhaustive replay-reconciliation drill for the two-phase append
    landing (round 15): enumerate every on-disk state a crash can
    leave — staged-only, intent with no/some/all files landed, marker
    with stale intent, marker only — construct each state directly on
    disk, replay the epoch, and assert the index converges to exactly
    one copy of the slice with a durable marker and no residue.  The
    injected-crash drills cover two specific points; this pins the
    whole state machine."""
    import json
    import os
    import shutil

    from wikihadoop_spark.operators import quantize as qz

    base_rows = [(0, [5, 0], 25, 0), (1, [0, 5], 25, 1)]
    cents = [[5, 0], [0, 5]]
    slice_df = lambda: spark.createDataFrame(
        [(9, [4, 1]), (10, [1, 4])], "vec_id bigint, q array<int>"
    )

    def fresh_index(name):
        df = spark.createDataFrame(
            base_rows, "vec_id bigint, q array<int>, n2 bigint, cluster int"
        )
        p = str(tmp_path / name)
        qz.ivf_write_int8(df, cents, p, overwrite=True)
        return p

    # one clean append to learn the protocol's real artifacts
    ref = fresh_index("enum_ref_idx")
    assert qz.ivf_append_int8(slice_df(), cents, ref, dedupe_token="e1") == 2
    resolved = os.path.realpath(ref)
    marker, intent, stage, _sha = qz._append_marker_paths(resolved, "e1")
    dests = json.loads(open(marker).read())
    assert dests and all(
        os.path.exists(os.path.join(resolved, d)) for d in dests
    )

    def replay_and_check(path, label):
        n = qz.ivf_append_int8(slice_df(), cents, path, dedupe_token="e1")
        res = os.path.realpath(path)
        mk, it, st, _ = qz._append_marker_paths(res, "e1")
        tagged, _c = qz.ivf_read_int8(spark, path)
        got = sorted(r.vec_id for r in tagged.collect())
        assert got == [0, 1, 9, 10], f"{label}: rows {got} (appended {n})"
        assert os.path.exists(mk), f"{label}: no marker after replay"
        assert not os.path.exists(it), f"{label}: intent residue"
        assert not os.path.exists(st), f"{label}: stage residue"

    # State A: crash after staging, before intent — stage dir only
    p = fresh_index("enum_a_idx")
    res = os.path.realpath(p)
    mk, it, st, _ = qz._append_marker_paths(res, "e1")
    os.makedirs(os.path.join(st, "cluster=0"))
    with open(os.path.join(st, "cluster=0", "part-junk.parquet"), "w") as fh:
        fh.write("torn")
    replay_and_check(p, "staged-only")

    # States B/C: intent durable, {none, one, all} destination files
    # landed (copied bit-for-bit from the reference artifact)
    for label, n_landed in (("intent-none", 0), ("intent-some", 1),
                            ("intent-all", len(dests))):
        p = fresh_index(f"enum_{label}_idx")
        res = os.path.realpath(p)
        mk, it, st, _ = qz._append_marker_paths(res, "e1")
        with open(it, "w") as fh:
            json.dump(dests, fh)
        for d in dests[:n_landed]:
            dst = os.path.join(res, d)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.copy2(os.path.join(resolved, d), dst)
        replay_and_check(p, label)

    # State D: marker durable, intent not yet unlinked (and files
    # landed) — replay must SKIP, clear residue, keep exactly one copy
    p = fresh_index("enum_d_idx")
    res = os.path.realpath(p)
    mk, it, st, _ = qz._append_marker_paths(res, "e1")
    for d in dests:
        dst = os.path.join(res, d)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copy2(os.path.join(resolved, d), dst)
    with open(mk, "w") as fh:
        json.dump(dests, fh)
    with open(it, "w") as fh:
        json.dump(dests, fh)
    assert qz.ivf_append_int8(slice_df(), cents, p, dedupe_token="e1") == 0
    assert not os.path.exists(it), "marker+intent: residue not cleared"
    tagged, _c = qz.ivf_read_int8(spark, p)
    assert sorted(r.vec_id for r in tagged.collect()) == [0, 1, 9, 10]

    # State E: marker only (clean landing) — pure skip, still one copy
    assert qz.ivf_append_int8(slice_df(), cents, p, dedupe_token="e1") == 0
    tagged, _c = qz.ivf_read_int8(spark, p)
    assert sorted(r.vec_id for r in tagged.collect()) == [0, 1, 9, 10]


def test_legacy_marker_ignored_once_hashed_markers_exist(spark, tmp_path):
    """Round-15 ADVICE: a pre-upgrade marker '_append_epoch_1' (written
    for the DISTINCT token 'epoch_1') must not shadow a new token
    'epoch/1' whose sanitized form collides — once ANY hash-format
    marker exists, the index is post-upgrade and legacy names stop
    being honored, so the colliding batch LANDS instead of silently
    dropping."""
    import os

    from wikihadoop_spark.operators import quantize as qz

    df = spark.createDataFrame(
        [(0, [5, 0], 25, 0), (1, [0, 5], 25, 1)],
        "vec_id bigint, q array<int>, n2 bigint, cluster int",
    )
    path = str(tmp_path / "idx_legacy_collision")
    qz.ivf_write_int8(df, [[5, 0], [0, 5]], path, overwrite=True)
    cents = [[5, 0], [0, 5]]
    root = os.path.realpath(path)
    # pre-upgrade marker for token 'epoch_1' (its rows landed under
    # the old plain-append protocol)
    with open(os.path.join(root, "_append_epoch_1"), "w"):
        pass
    # a post-upgrade append has happened: hash-format marker exists
    first = spark.createDataFrame([(9, [4, 1])], "vec_id bigint, q array<int>")
    assert qz.ivf_append_int8(first, cents, path, dedupe_token="epoch-9") == 1
    # the colliding NEW token must land (1 row), not skip as a replay
    new = spark.createDataFrame([(10, [1, 4])], "vec_id bigint, q array<int>")
    assert qz.ivf_append_int8(new, cents, path, dedupe_token="epoch/1") == 1
    tagged, _ = qz.ivf_read_int8(spark, path)
    assert sorted(r.vec_id for r in tagged.collect()) == [0, 1, 9, 10]
    # and the legitimate replay of the NEW token still skips
    assert qz.ivf_append_int8(new, cents, path, dedupe_token="epoch/1") == 0


def test_append_protocol_sentinel_is_the_upgrade_fact(spark, tmp_path):
    """Round-16 review: the first hash-format landing writes a durable
    _append_protocol_v2 sentinel, and from then on legacy recognition
    is off as a FACT — even if the hash marker files themselves are
    gone (e.g. a very old index whose markers were hand-cleaned), the
    sentinel alone keeps a colliding legacy name from shadowing a new
    token."""
    import os

    from wikihadoop_spark.operators import quantize as qz

    df = spark.createDataFrame(
        [(0, [5, 0], 25, 0), (1, [0, 5], 25, 1)],
        "vec_id bigint, q array<int>, n2 bigint, cluster int",
    )
    path = str(tmp_path / "idx_sentinel")
    qz.ivf_write_int8(df, [[5, 0], [0, 5]], path, overwrite=True)
    cents = [[5, 0], [0, 5]]
    root = os.path.realpath(path)
    assert not qz._index_post_upgrade(root)
    first = spark.createDataFrame([(9, [4, 1])], "vec_id bigint, q array<int>")
    assert qz.ivf_append_int8(first, cents, path, dedupe_token="epoch-1") == 1
    assert os.path.exists(os.path.join(root, qz._PROTOCOL_SENTINEL))
    assert qz._index_post_upgrade(root)
    # remove every hash-format marker: the sentinel still carries the fact
    for n in os.listdir(root):
        if n.startswith("_append_") and n != qz._PROTOCOL_SENTINEL:
            os.unlink(os.path.join(root, n))
    assert qz._index_post_upgrade(root)
    with open(os.path.join(root, "_append_epoch_2"), "w"):
        pass  # colliding legacy name for the distinct token 'epoch_2'
    new = spark.createDataFrame([(10, [1, 4])], "vec_id bigint, q array<int>")
    assert qz.ivf_append_int8(new, cents, path, dedupe_token="epoch/2") == 1
