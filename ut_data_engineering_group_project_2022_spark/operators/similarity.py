"""Similarity search over embedding columns.

Two paths:
  * brute-force cosine top-k — the exact baseline. All math is composed
    left-to-right in doubles (`F.aggregate` over `F.zip_with`) so the
    DuckDB oracle (`list_dot_product` over DOUBLE[]) matches bit-for-bit.
  * LSH-bucketed ANN — the 100 TB path: deterministic pseudo-random
    hyperplanes (md5-derived, no RNG state to ship), sign-bit bucket key,
    candidates restricted to same-bucket rows. Sub-linear candidate sets;
    recall is tested against the brute-force baseline in tests/.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ut_data_engineering_group_project_2022_spark.functions.text import md5_int60
from ut_data_engineering_group_project_2022_spark.operators import bounded_small


def as_double(col: Column | str) -> Column:
    return F.col(col).cast("array<double>") if isinstance(col, str) else col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product (matches DuckDB list_dot_product)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def knn_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_rows: int | None = None,
    corpus_rows: int | None = None,
) -> DataFrame:
    """Exact cosine top-k of `corpus` rows for every `queries` row.

    Broadcast the query side (it is the small side by construction) so the
    corpus scan stays shuffle-free; the only shuffle is the per-query top-k
    window, partitioned by query id. ``query_rows``/``corpus_rows`` are
    optional caller-known upper bounds (footer counts) that skip the
    gate-count jobs (operators.bounded_small).
    """
    if bounded_small(queries, LOCAL_KNN_QUERIES, query_rows) and bounded_small(
        corpus, LOCAL_KNN_ROWS, corpus_rows
    ):
        return _knn_bruteforce_local(queries, corpus, k, id_col, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv")
    )
    scored = c.join(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("qv"), F.col("cv")).alias("score"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("score", 6).alias("score"), "rn")
    )


def lsh_bucket(
    vec: Column, dim: int, n_planes: int = 8, plane_offset: int = 0
) -> Column:
    """Sign-bit LSH bucket key from deterministic md5-derived hyperplanes.

    plane[p][d] = (md5_int60('p|d') mod 2001 - 1000) / 1000.0  in [-1, 1]
    bucket bit p = 1 iff dot(vec, plane[plane_offset + p]) > 0.
    """
    bucket = F.lit(0).cast("bigint")
    for p in range(n_planes):
        coeffs = F.array(
            *[
                (
                    (
                        md5_int60(F.lit(f"{plane_offset + p}|{d}"))
                        % F.lit(2001)
                        - F.lit(1000)
                    ).cast("double")
                    / F.lit(1000.0)
                )
                for d in range(dim)
            ]
        )
        proj = F.aggregate(
            F.zip_with(vec, coeffs, lambda x, c: x * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(0)
    return bucket


def knn_lsh(
    vectors: DataFrame,
    k: int,
    dim: int,
    n_tables: int = 8,
    n_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-table sign-bit LSH ANN: the scale path for pairwise similarity.

    ``n_tables`` independent hash tables of ``n_bits`` planes each
    (table t uses planes [t*n_bits, (t+1)*n_bits)); a pair is a candidate
    if it collides in ANY table, candidates are deduped and re-ranked with
    the exact cosine. A single fine-grained table (round-1 design: one
    8-bit key) had recall@5 = 0.02 against brute force — true neighbors
    almost never agree on all 8 sign bits; OR-ing several coarser tables
    is the standard fix (recall is test-gated in tests/test_graph.py).
    ``n_bits`` tunes bucket size against corpus scale; candidates-per-pair
    dedup keeps the exact re-rank linear in distinct candidates.

    Output schema matches `knn_bruteforce` (query_id, neighbor_id, score,
    rn) restricted to candidate pairs.
    """
    v = vectors.select(
        F.col(id_col).alias("vid"), as_double(vec_col).alias("vec")
    )
    tables = F.array(
        *[
            F.struct(
                F.lit(t).alias("t"),
                lsh_bucket(
                    F.col("vec"), dim, n_bits, plane_offset=t * n_bits
                ).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )
    hashed = v.select(
        "vid", F.explode(tables).alias("tb")
    ).select("vid", F.col("tb.t").alias("t"), F.col("tb.bucket").alias("bucket"))
    cand = (
        hashed.alias("a")
        .join(
            hashed.alias("b"),
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vid") != F.col("b.vid")),
        )
        .select(
            F.col("a.vid").alias("query_id"), F.col("b.vid").alias("neighbor_id")
        )
        .distinct()
    )
    scored = (
        cand.join(
            v.select(F.col("vid").alias("query_id"), F.col("vec").alias("qv")),
            "query_id",
        )
        .join(
            v.select(F.col("vid").alias("neighbor_id"), F.col("vec").alias("cv")),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("score"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("score", 6).alias("score"), "rn")
    )


def lsh_candidate_pairs(
    vectors: DataFrame,
    dim: int,
    n_tables: int = 8,
    n_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Unordered candidate pairs (id_a < id_b) colliding in ANY LSH table.

    The candidate half of the candidates->verify shape shared by
    MinHash-LSH and banded SimHash: sub-quadratic pair generation, exact
    scoring only on survivors."""
    v = vectors.select(
        F.col(id_col).alias("vid"), as_double(vec_col).alias("vec")
    )
    tables = F.array(
        *[
            F.struct(
                F.lit(t).alias("t"),
                lsh_bucket(
                    F.col("vec"), dim, n_bits, plane_offset=t * n_bits
                ).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )
    hashed = v.select("vid", F.explode(tables).alias("tb")).select(
        "vid", F.col("tb.t").alias("t"), F.col("tb.bucket").alias("bucket")
    )
    return (
        hashed.alias("a")
        .join(
            hashed.alias("b"),
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(F.col("a.vid").alias("id_a"), F.col("b.vid").alias("id_b"))
        .distinct()
    )


def cosine_neardup_lsh(
    emb: DataFrame,
    threshold: float,
    dim: int,
    n_tables: int = 8,
    n_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sub-quadratic embedding near-dup: LSH-bucketed candidates, exact
    cosine verify — the 100 TB path `cosine_neardup_pairs` documents.

    Same output schema as the all-pairs form restricted to candidate
    pairs; the registered oracle regenerates the hash tables in SQL, so
    the whole pipeline (not just the verify) is hash-checked."""
    cand = lsh_candidate_pairs(emb, dim, n_tables, n_bits, id_col, vec_col)
    v = emb.select(F.col(id_col).alias("vid"), as_double(vec_col).alias("vec"))
    return (
        cand.join(v.select(F.col("vid").alias("id_a"), F.col("vec").alias("va")), "id_a")
        .join(v.select(F.col("vid").alias("id_b"), F.col("vec").alias("vb")), "id_b")
        .select(
            "id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("raw")
        )
        .filter(F.col("raw") >= threshold)
        .select("id_a", "id_b", F.round("raw", 6).alias("cosine"))
    )


def cosine_neardup_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a, b) with a < b and
    cosine >= threshold — the embedding-space analog of MinHash near-dup.

    Exact all-pairs form (the verification baseline). The 100 TB path
    reuses `lsh_bucket` to restrict pairs to same-bucket candidates
    (sub-quadratic), then verifies with this exact cosine — same
    candidates->verify shape as dedup.minhash_lsh_dedup."""
    a = emb.select(F.col(id_col).alias("id_a"), as_double(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), as_double(vec_col).alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    score = cosine(F.col("va"), F.col("vb"))
    return (
        pairs.select("id_a", "id_b", score.alias("raw"))
        .filter(F.col("raw") >= threshold)
        .select("id_a", "id_b", F.round("raw", 6).alias("cosine"))
    )


def ivf_assign(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid cell (max cosine,
    centroid-id tiebreak). Returns (vec_id, v, cell_id).

    The centroid set is broadcast — at cluster scale cells partition the
    corpus so a query probes one partition instead of all of them."""
    c = centroids.select(
        F.col(id_col).alias("cell_id"), as_double(vec_col).alias("cv")
    )
    x = emb.select(F.col(id_col).alias(id_col), as_double(vec_col).alias("v"))
    scored = x.join(F.broadcast(c)).select(
        id_col, "v", "cell_id", cosine(F.col("v"), F.col("cv")).alias("s")
    )
    w = W.partitionBy(id_col).orderBy(F.desc("s"), F.asc("cell_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, "v", "cell_id")
    )


def knn_ivf(
    emb: DataFrame,
    k: int,
    n_cells: int = 8,
    n_queries: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: coarse-quantize into `n_cells` cells, search only the
    query's own cell (nprobe=1).

    Centroids here are the first `n_cells` vectors — a deterministic
    stand-in for a sampled k-means training step (which at scale would be
    a Pandas-UDF k-means over a sample; the in-plan search below is
    unchanged). Queries follow the bruteforce convention (vec_id <
    n_queries), corpus is the rest."""
    assigned = ivf_assign(
        emb, emb.filter(F.col(id_col) < n_cells), id_col, vec_col
    )
    q = assigned.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv"), "cell_id"
    )
    c = assigned.filter(F.col(id_col) >= n_queries).select(
        F.col(id_col).alias("neighbor_id"), F.col("v").alias("cv"), "cell_id"
    )
    scored = c.join(F.broadcast(q), "cell_id").select(
        "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("score")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("score", 6).alias("score"), "rn")
    )


def kmeans_fixed_point(
    emb: DataFrame,
    k: int = 10,
    iterations: int = 2,
    scale: int = 1_000_000,
    offset: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd k-means in fixed-point integer arithmetic; returns
    (vec_id, cluster, dist2).

    Floats make distributed k-means nondeterministic (double summation is
    partition-order dependent) and oracle-hostile. This formulation stays
    in exact integers end-to-end:

      * quantize: x_i = floor(v_i * scale) + offset  (offset makes every
        coordinate positive so integer division below is floor division
        in both engines — Spark `div` truncates, DuckDB `//` floors;
        they agree only on non-negatives);
      * seeds: the k vectors with the smallest salted md5 hash, fetched
        with orderBy+limit (TakeOrdered — never a corpus-wide window),
        cluster ids 0..k-1 in hash order;
      * assign: argmin of the exact integer squared distance, ties to the
        lower cluster id — `min(struct(d2, cluster))`, a plain aggregate;
      * update: per-(cluster, dim) integer sums (map-side combined; the
        shuffle carries k*dim keys, not the corpus), centroid = sum div
        count — centroids stay on the integer grid, so iteration 2
        compares exact integers again.

    Every iteration is one broadcast crossJoin (k centroid rows) + one
    aggregate; the oracle unrolls the same iterations as SQL CTEs.
    """
    x = F.transform(
        F.col(vec_col),
        lambda v: F.floor(v.cast("double") * scale).cast("bigint") + offset,
    )
    v = emb.select(F.col(id_col).alias("vec_id"), x.alias("x"))
    h = md5_int60(F.concat(F.lit("seed|"), F.col("vec_id").cast("string")))
    seeds = v.withColumn("h", h).orderBy("h").limit(k)
    centroids = (
        seeds.withColumn("cluster", F.row_number().over(W.orderBy("h")) - 1)
        .select("cluster", F.col("x").alias("c"))
    )
    d2 = F.aggregate(
        F.zip_with("x", "c", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, e: acc + e,
    )
    assigned = None
    for _ in range(iterations):
        assigned = (
            v.crossJoin(F.broadcast(centroids))
            .withColumn("d2", d2)
            .groupBy("vec_id")
            .agg(F.min(F.struct("d2", "cluster")).alias("m"), F.first("x").alias("x"))
            .select("vec_id", F.col("m.cluster").alias("cluster"),
                    F.col("m.d2").alias("d2"), "x")
        )
        centroids = (
            assigned.select("cluster", F.posexplode("x").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            # Exact integral division (Spark `div` == DuckDB `//` on
            # non-negatives); double `/`+cast would drift for clusters
            # past ~1e9 members.
            .select("cluster", "pos", F.expr("s div n").cast("bigint").alias("ci"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "ci"))),
                    lambda s: s.ci,
                ).alias("c")
            )
        )
    return assigned.select("vec_id", "cluster", F.col("d2").alias("dist2"))


#: Row ceiling for the single-task SemDeDup kernel: its within-cluster
#: pair scan is ~n^2/k, so the gate bounds one task's work at roughly
#: 20k^2/2/10 x dim float ops (~1-2 s) — far below that the distributed
#: plan is pure job-dispatch latency; far above it the cluster-bounded
#: pair join is the right shape (the 100 TB path, unchanged).
LOCAL_SEMDEDUP_ROWS = 20_000


def _semdedup_local(
    emb: DataFrame,
    k: int,
    iterations: int,
    threshold: float,
    scale: int,
    offset: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Single-task SemDeDup for a corpus known to fit one executor:
    the fixed-point integer k-means (same md5 seeds, exact int64
    distances, argmin ties to the lower cluster id, sum-div-count
    centroid updates) plus the within-cluster cosine pair scan, all in
    one ``mapInPandas`` job. Float parity with the distributed plan:
    every dot product is the LEFT FOLD the Spark/DuckDB expression
    computes, reproduced exactly by ``np.cumsum`` over the elementwise
    products (verified 0 mismatches in 40k pairs — ``np.dot`` diverges
    on 66%); norms and the threshold comparison use the identical
    operation order. Pinned bit-equal to the distributed path at
    sf0.001/0.01/0.1 by tests/test_local_kernels.py."""
    x = F.transform(
        F.col(vec_col),
        lambda v: F.floor(v.cast("double") * scale).cast("bigint") + offset,
    )
    v = emb.select(
        F.col(id_col).alias("vec_id"),
        x.alias("x"),
        as_double(vec_col).alias("e"),
    )
    idt = emb.schema[id_col].dataType.simpleString()

    def kernel(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        ids_l: list = []
        xs_l: list = []
        es_l: list = []
        for pdf in batches:
            ids_l.extend(int(i) for i in pdf["vec_id"])
            xs_l.extend(np.asarray(a, dtype=np.int64) for a in pdf["x"])
            es_l.extend(np.asarray(a, dtype=np.float64) for a in pdf["e"])
        if not ids_l:
            yield pd.DataFrame(
                {
                    "vec_id": pd.array([], dtype="Int64"),
                    "cluster": pd.array([], dtype="Int32"),
                    "keep": pd.array([], dtype="boolean"),
                    "dup_of": pd.array([], dtype="Int64"),
                }
            )
            return
        ids = np.asarray(ids_l, dtype=np.int64)
        X = np.stack(xs_l)
        E = np.stack(es_l)
        n = len(ids)
        # seeds: k smallest salted md5 hashes, cluster ids in hash order
        h = np.asarray(
            [
                int(hashlib.md5(f"seed|{i}".encode()).hexdigest()[:15], 16)
                for i in ids_l
            ],
            dtype=np.int64,
        )
        seed_idx = np.lexsort((ids, h))[: min(k, n)]
        cid = np.arange(len(seed_idx), dtype=np.int64)  # ascending ids
        C = X[seed_idx]
        x2 = np.einsum("ij,ij->i", X, X)
        assign = None
        for _ in range(iterations):
            # exact integer distances; centroid columns ordered by
            # ascending cluster id so argmin's first-min = lowest id
            c2 = np.einsum("ij,ij->i", C, C)
            d2 = x2[:, None] + c2[None, :] - 2 * (X @ C.T)
            assign = cid[np.argmin(d2, axis=1)]
            # update: per-cluster integer sums div counts; empty
            # clusters drop out (mirrors the groupBy)
            kc = int(cid.max()) + 1
            sums = np.zeros((kc, X.shape[1]), np.int64)
            np.add.at(sums, assign, X)
            counts = np.bincount(assign, minlength=kc)
            present = np.flatnonzero(counts > 0)
            C = sums[present] // counts[present, None]
            cid = present.astype(np.int64)
        # within-cluster pairs (id_a < id_b), exact left-fold cosine
        norm = np.sqrt(np.cumsum(E * E, axis=1)[:, -1])
        order = np.lexsort((ids,))  # pair generation in ascending id
        dup_of = np.full(n, np.iinfo(np.int64).max, np.int64)
        pos_of = np.empty(n, np.int64)
        pos_of[order] = np.arange(n)
        for c in np.unique(assign):
            members = order[np.sort(pos_of[np.flatnonzero(assign == c)])]
            nc = len(members)
            if nc < 2:
                continue
            ia, ib = np.triu_indices(nc, k=1)
            a_idx, b_idx = members[ia], members[ib]
            for lo in range(0, len(a_idx), 500_000):
                asl = a_idx[lo : lo + 500_000]
                bsl = b_idx[lo : lo + 500_000]
                dots = np.cumsum(E[asl] * E[bsl], axis=1)[:, -1]
                cos = dots / (norm[asl] * norm[bsl])
                hit = cos >= threshold
                np.minimum.at(dup_of, bsl[hit], ids[asl[hit]])
        has_dup = dup_of != np.iinfo(np.int64).max
        yield pd.DataFrame(
            {
                "vec_id": pd.array(ids, dtype="Int64"),
                "cluster": pd.array(assign, dtype="Int32"),
                "keep": pd.array(~has_dup, dtype="boolean"),
                "dup_of": pd.array(
                    [int(d) if f else None for d, f in zip(dup_of, has_dup)],
                    dtype="Int64",
                ),
            }
        )

    return v.coalesce(1).mapInPandas(
        kernel, f"vec_id {idt}, cluster int, keep boolean, dup_of {idt}"
    )


def semdedup(
    emb: DataFrame,
    k: int = 10,
    iterations: int = 2,
    threshold: float = 0.40,
    scale: int = 1_000_000,
    offset: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_rows: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster with the deterministic
    fixed-point k-means, drop all but the smallest id among
    within-cluster pairs with cosine >= ``threshold``. Size-dispatched
    (r19): one single-task kernel below ``LOCAL_SEMDEDUP_ROWS``
    (``corpus_rows`` footer bound or a bounded limit+count —
    operators.bounded_small), the cluster-bounded distributed pair
    join above it. Returns (vec_id, cluster, keep, dup_of)."""
    if bounded_small(emb, LOCAL_SEMDEDUP_ROWS, corpus_rows):
        return _semdedup_local(
            emb, k, iterations, threshold, scale, offset, id_col, vec_col
        )
    # Distributed path — verbatim the pre-r19 plan (see llm_semdedup's
    # registry doc for the scale adjudication).
    assign = (
        kmeans_fixed_point(
            emb, k=k, iterations=iterations, scale=scale, offset=offset,
            id_col=id_col, vec_col=vec_col,
        )
        .select("vec_id", "cluster")
        .localCheckpoint(eager=False)
    )
    e = emb.select(
        F.col(id_col).alias("vec_id"), as_double(vec_col).alias("e")
    )
    norm = F.sqrt(
        F.aggregate(
            F.zip_with("e", "e", lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    av = (
        assign.join(e, "vec_id")
        .withColumn("nrm", norm)
        .localCheckpoint(eager=False)
    )
    a = av.select(
        F.col("vec_id").alias("id_a"),
        "cluster",
        F.col("e").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = av.select(
        F.col("vec_id").alias("id_b"),
        F.col("cluster").alias("cluster_b"),
        F.col("e").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    dot_ab = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dups = (
        a.join(
            b,
            (F.col("cluster") == F.col("cluster_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .filter(dot_ab / (F.col("na") * F.col("nb")) >= threshold)
        .groupBy(F.col("id_b").alias("vec_id"))
        .agg(F.min("id_a").alias("dup_of"))
    )
    return assign.join(dups, "vec_id", "left").select(
        "vec_id",
        "cluster",
        F.col("dup_of").isNull().alias("keep"),
        "dup_of",
    )


def knn_pq(
    emb: DataFrame,
    k: int = 5,
    m: int = 8,
    n_codes: int = 16,
    n_queries: int = 10,
    scale: int = 1_000_000,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_rows: int | None = None,
) -> DataFrame:
    """Product-quantization ANN with an ADC scan (the Jégou et al. 2011
    PQ recipe, the standard memory-bounded retrieval path at corpus
    scale: 64 doubles compress to ``m`` one-byte codes).

    Everything is exact integer arithmetic on the fixed-point grid
    (floor(x*scale), the :func:`kmeans_fixed_point` convention), so the
    encoding, the distance tables, and the top-k are deterministic and
    bit-identical to the DuckDB oracle:

      * subspaces: ``dim`` splits into ``m`` contiguous blocks;
      * codebook: the first ``n_codes`` vectors' subvectors (the
        deterministic training stand-in, as in :func:`knn_ivf`; at
        scale the codebook comes from a sampled per-subspace k-means
        and the pipeline below is unchanged);
      * encode: per (vector, subspace), the code with minimal exact
        integer squared distance, ties to the lower code id — a
        struct-min aggregate over a broadcast codebook join; the
        encoded corpus is ``n*m`` narrow rows (the 8-byte compressed
        representation);
      * ADC: per query, a (subspace, code) -> distance lookup table
        (``m*n_codes`` rows, broadcast); the scan joins each code row
        to its table entry and sums per (query, vector) — never
        touching the original vectors.

    Top-k by ascending ADC distance, neighbor-id tiebreak. Returns
    (query_id, neighbor_id, dist2, rn). Recall vs the exact baseline is
    gated in tests/.

    PRECONDITION (r8 advisory): at least one row must have
    ``id_col < n_codes`` — the codebook is trained on those rows. With
    an EMPTY codebook every downstream join is empty and the result is
    silently empty, INCLUDING the corpus-side wrong-length/NULL
    embedding gate (it is folded into the encode aggregate, which is
    only reachable through the codebook join; the query-side per-row
    LUT gate is equally unreachable). Callers using non-contiguous ids
    must remap them first; the registered queries satisfy this by
    construction (dense 0-based vec_ids with n_codes ≤ corpus size,
    pinned by the non-empty-result assertions in tests/test_graph.py).
    """
    if dim % m != 0:
        raise ValueError(f"dim={dim} must divide into m={m} subspaces")
    # Size-gated single-task kernel (r19): a footer bound or one
    # bounded partial scan, then the whole encode/LUT/ADC/top-k chain
    # as one job.
    if bounded_small(emb, LOCAL_KNN_ROWS, corpus_rows):
        return _knn_pq_local(
            emb, k, m, n_codes, n_queries, scale, dim, id_col, vec_col
        )
    # Validate dim against the DATA, not just the parameter: a shorter
    # real embedding would make F.slice silently emit short/empty
    # subvectors and zero distances, degrading recall with no
    # diagnostic (r6 advisory). A NULL or wrong-length embedding
    # HARD-FAILS the job (documented contract; r7 advisory): the gate
    # is a per-GROUP check folded into the encode aggregate (min of
    # the carried array length — NULL sizes make the min NULL, which
    # also trips the gate) plus a per-row check on the query-side LUT,
    # which only ever holds n_queries*m*n_codes rows. The r7 per-row
    # assert_true on the base select defeated whole-stage codegen on
    # the corpus scan and cost ~0.4 s at sf0.1 (measured r8); this
    # form keeps the hot scan/explode/join stage branch-free.
    sub_d = dim // m

    def _dim_gate(out: Column, sz: Column) -> Column:
        return F.when(sz == dim, out).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"knn_pq: dim={dim} does not match embedding length "),
                    F.coalesce(sz.cast("string"), F.lit("NULL")),
                )
            )
        )

    x = emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            as_double(vec_col), lambda e: F.floor(e * scale).cast("bigint")
        ).alias("x"),
        F.size(vec_col).alias("sz"),
    )
    subs = x.select(
        "vec_id",
        "sz",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.struct(
                    s.alias("s"),
                    F.slice("x", s * sub_d + 1, sub_d).alias("xs"),
                ),
            )
        ).alias("e"),
    ).select("vec_id", "sz", F.col("e.s").alias("s"), F.col("e.xs").alias("xs"))
    cb = subs.filter(F.col("vec_id") < n_codes).select(
        F.col("vec_id").alias("code"), "s", F.col("xs").alias("cs")
    )
    d2 = F.aggregate(
        F.zip_with("xs", "cs", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, e: acc + e,
    )
    enc = (
        subs.filter(F.col("vec_id") >= n_queries)
        .join(F.broadcast(cb), "s")
        .withColumn("d2", d2)
        .groupBy("vec_id", "s")
        .agg(
            F.min(F.struct("d2", "code")).alias("mn"),
            # min over an all-NULL sz group is NULL -> gate trips; every
            # row in a (vec_id, s) group shares one source vector, so
            # min(sz) IS that vector's length.
            F.min("sz").alias("msz"),
        )
        .select("vec_id", "s", _dim_gate(F.col("mn.code"), F.col("msz")).alias("code"))
    )
    lut = (
        subs.filter(F.col("vec_id") < n_queries)
        .join(F.broadcast(cb), "s")
        .select(
            F.col("vec_id").alias("query_id"),
            "s",
            "code",
            _dim_gate(d2, F.col("sz")).alias("d2"),
        )
    )
    adc = (
        enc.join(F.broadcast(lut), ["s", "code"])
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("d2").alias("dist2"))
    )
    w = W.partitionBy("query_id").orderBy(F.asc("dist2"), F.asc("neighbor_id"))
    return (
        adc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "dist2", "rn")
    )


def knn_pq_rerank(
    emb: DataFrame,
    k: int = 5,
    shortlist: int = 100,
    m: int = 16,
    n_codes: int = 16,
    n_queries: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_rows: int | None = None,
) -> DataFrame:
    """PQ shortlist + exact re-rank (the production IVFADC recipe): the
    ADC scan of :func:`knn_pq` yields a ``shortlist``-sized candidate
    set per query from the COMPRESSED index alone; only those
    candidates' raw vectors are read back for an exact cosine top-k.
    At corpus scale the shortlist is a vanishing fraction of n, so the
    expensive exact math touches shortlist*q vectors, not n*q. The
    candidate set (q*shortlist rows) broadcasts into a single corpus
    pass — no shuffle of the vector table. Returns (query_id,
    neighbor_id, score, rn), ranked by unrounded cosine (the
    knn_bruteforce convention), rounded to 6 on output.
    """
    # Size-gated single-task kernel (r19): the ADC shortlist AND the
    # exact re-rank in one job (the distributed form below would pay
    # the ~10-job PQ chain plus the rerank join/window).
    if bounded_small(emb, LOCAL_KNN_ROWS, corpus_rows):
        return _knn_pq_local(
            emb,
            shortlist,
            m,
            n_codes,
            n_queries,
            1_000_000,
            64,
            id_col,
            vec_col,
            rerank_k=k,
        )
    cand = knn_pq(
        emb,
        k=shortlist,
        m=m,
        n_codes=n_codes,
        n_queries=n_queries,
        id_col=id_col,
        vec_col=vec_col,
    ).select("query_id", "neighbor_id")
    q = emb.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv")
    )
    c = emb.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv")
    )
    scored = c.join(F.broadcast(cand.join(q, "query_id")), "neighbor_id").select(
        "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("s")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("s"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "query_id", "neighbor_id", F.round("s", 6).alias("score"), "rn"
        )
    )


#: Size gates for the single-task knn kernels (r19, guide §1.2/§4.2).
#: The query ceiling bounds the exact-fold score matrix (queries x
#: corpus doubles: 128 x 100k = ~100 MB, ~1.6G flops worst case); above
#: either gate the distributed plans run unchanged (the 100 TB path).
LOCAL_KNN_QUERIES = 128
LOCAL_KNN_ROWS = 100_000


def _vec_matrix(col, dim=None, gate_msg=None):
    """Arrow list column -> (n x d) float64 matrix. With ``gate_msg``
    a NULL entry or a length != ``dim`` hard-fails the task with the
    distributed plan's dim-gate message (same contract, same trigger
    point: execution)."""
    import numpy as np
    import pyarrow.compute as pc

    col = col.combine_chunks()
    lengths = pc.list_value_length(col).to_numpy(zero_copy_only=False)
    if gate_msg is not None:
        bad = None
        if col.null_count:
            bad = "NULL"
        else:
            off = [int(x) for x in set(lengths.tolist()) if int(x) != dim]
            if off:
                bad = str(off[0])
        if bad is not None:
            raise ValueError(gate_msg + bad)
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    d = int(lengths[0]) if len(lengths) else 0
    return flat.reshape(len(col), d)


def _fold_scores(Q, C):
    """Exact left-fold cosine of every (query, corpus) pair: the
    accumulator adds one dimension's product at a time in index order,
    reproducing ``F.aggregate(zip_with(a, b, *), 0.0, +)`` bit-for-bit
    for every pair simultaneously (the np.dot/np.einsum orderings
    diverge in the last ulp; cf. the semdedup kernel's cumsum note)."""
    import numpy as np

    d = Q.shape[1]
    acc = np.zeros((Q.shape[0], C.shape[0]))
    qn = np.zeros(Q.shape[0])
    cn = np.zeros(C.shape[0])
    for j in range(d):
        acc += Q[:, j : j + 1] * C[:, j]
        qn += Q[:, j] * Q[:, j]
        cn += C[:, j] * C[:, j]
    return acc / (np.sqrt(qn)[:, None] * np.sqrt(cn)[None, :])


def _round_half_up6(x: float) -> float:
    """Spark ROUND(double, 6): BigDecimal(shortest-repr) HALF_UP —
    python's repr is the same shortest decimal form."""
    import decimal

    return float(
        decimal.Decimal(repr(x)).quantize(
            decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
        )
    )


def _knn_bruteforce_local(
    queries: DataFrame, corpus: DataFrame, k: int, id_col: str, vec_col: str
) -> DataFrame:
    """Single-task exact knn for a (queries, corpus) pair known to fit
    one executor (gated by :func:`knn_bruteforce`). One Spark job
    replaces the broadcast join + fold-expression scan + top-k window
    (~6 jobs of mostly dispatch latency at bench scale); the score is
    the identical left-fold cosine (:func:`_fold_scores`) with the
    identical (desc score, asc neighbor id) tie order, rounded with
    Spark's HALF_UP. Assumes the documented embedding contract
    (uniform-length, non-null vectors)."""
    idt = queries.schema[id_col].dataType.simpleString()
    tagged = queries.select(
        F.lit(True).alias("is_q"),
        F.col(id_col).alias("vid"),
        as_double(vec_col).alias("v"),
    ).unionByName(
        corpus.select(
            F.lit(False).alias("is_q"),
            F.col(id_col).alias("vid"),
            as_double(vec_col).alias("v"),
        )
    )

    def kernel(batches):
        import numpy as np
        import pyarrow as pa

        tabs = [pa.Table.from_batches([b]) for b in batches]
        out_schema = pa.schema(
            [
                pa.field("query_id", pa.int64()),
                pa.field("neighbor_id", pa.int64()),
                pa.field("score", pa.float64()),
                pa.field("rn", pa.int32()),
            ]
        )
        qids_o, nids_o, scores_o, rns_o = [], [], [], []
        if tabs:
            t = pa.concat_tables(tabs)
            is_q = t.column("is_q").to_numpy(zero_copy_only=False)
            vids = t.column("vid").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            V = _vec_matrix(t.column("v"))
            qm = np.flatnonzero(is_q)
            cm = np.flatnonzero(~is_q)
            if len(qm) and len(cm):
                scores = _fold_scores(V[qm], V[cm])
                cids = vids[cm]
                for qi, qid in enumerate(vids[qm]):
                    row = scores[qi]
                    order = np.lexsort((cids, -row))[:k]
                    for rn, j in enumerate(order, start=1):
                        qids_o.append(int(qid))
                        nids_o.append(int(cids[j]))
                        scores_o.append(_round_half_up6(float(row[j])))
                        rns_o.append(rn)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(qids_o, pa.int64()),
                pa.array(nids_o, pa.int64()),
                pa.array(scores_o, pa.float64()),
                pa.array(rns_o, pa.int32()),
            ],
            schema=out_schema,
        )

    return tagged.coalesce(1).mapInArrow(
        kernel, f"query_id {idt}, neighbor_id {idt}, score double, rn int"
    )


def _knn_pq_local(
    emb: DataFrame,
    k: int,
    m: int,
    n_codes: int,
    n_queries: int,
    scale: int,
    dim: int,
    id_col: str,
    vec_col: str,
    rerank_k: int | None = None,
) -> DataFrame:
    """Single-task PQ ADC scan (and, with ``rerank_k``, the exact
    cosine re-rank of the shortlist) for a corpus known to fit one
    executor (gated by :func:`knn_pq` / :func:`knn_pq_rerank`). One
    Spark job replaces the ~10-job encode/LUT/ADC/window/rerank chain.
    All PQ arithmetic is the same exact int64 fixed-point grid as the
    distributed plan (order-free sums), the re-rank cosine is the
    identical left fold (:func:`_fold_scores` per shortlist pair), and
    the dim gate fires with the distributed plan's message and timing
    (execution, not build)."""
    sub_d = dim // m
    idt = emb.schema[id_col].dataType.simpleString()
    v = emb.select(F.col(id_col).alias("vid"), as_double(vec_col).alias("v"))
    gate_msg = f"knn_pq: dim={dim} does not match embedding length "
    out_t = "double" if rerank_k is not None else "bigint"
    score_col = "score" if rerank_k is not None else "dist2"

    def kernel(batches):
        import numpy as np
        import pyarrow as pa

        tabs = [pa.Table.from_batches([b]) for b in batches]
        out_schema = pa.schema(
            [
                pa.field("query_id", pa.int64()),
                pa.field("neighbor_id", pa.int64()),
                pa.field(
                    score_col,
                    pa.float64() if rerank_k is not None else pa.int64(),
                ),
                pa.field("rn", pa.int32()),
            ]
        )
        qids_o, nids_o, sc_o, rns_o = [], [], [], []
        if tabs:
            t = pa.concat_tables(tabs)
            vids = t.column("vid").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            V = _vec_matrix(t.column("v"), dim=dim, gate_msg=gate_msg)
            X = np.floor(V * float(scale)).astype(np.int64)
            cb_m = np.flatnonzero(vids < n_codes)
            cb_m = cb_m[np.argsort(vids[cb_m], kind="stable")]
            q_m = np.flatnonzero(vids < n_queries)
            c_m = np.flatnonzero(vids >= n_queries)
            if len(cb_m) and len(q_m) and len(c_m):
                CB = X[cb_m].reshape(len(cb_m), m, sub_d)
                XC = X[c_m].reshape(len(c_m), m, sub_d)
                XQ = X[q_m].reshape(len(q_m), m, sub_d)
                # encode: per (corpus row, subspace) the argmin code;
                # codebook rows sorted by code id so first-min == lowest
                codes = np.empty((len(c_m), m), np.int64)
                lut = np.empty((len(q_m), m, len(cb_m)), np.int64)
                for s in range(m):
                    dc = XC[:, s, None, :] - CB[None, :, s, :]
                    codes[:, s] = np.argmin(
                        np.einsum("ijk,ijk->ij", dc, dc), axis=1
                    )
                    dq = XQ[:, s, None, :] - CB[None, :, s, :]
                    lut[:, s, :] = np.einsum("ijk,ijk->ij", dq, dq)
                adc = np.zeros((len(q_m), len(c_m)), np.int64)
                for s in range(m):
                    adc += lut[:, s, :][:, codes[:, s]]
                cids = vids[c_m]
                for qi, qrow in enumerate(q_m):
                    qid = int(vids[qrow])
                    order = np.lexsort((cids, adc[qi]))[:k]
                    if rerank_k is None:
                        for rn, j in enumerate(order, start=1):
                            qids_o.append(qid)
                            nids_o.append(int(cids[j]))
                            sc_o.append(int(adc[qi, j]))
                            rns_o.append(rn)
                    else:
                        cand = c_m[order]
                        scores = _fold_scores(
                            V[qrow : qrow + 1], V[cand]
                        )[0]
                        top = np.lexsort((vids[cand], -scores))[:rerank_k]
                        for rn, j in enumerate(top, start=1):
                            qids_o.append(qid)
                            nids_o.append(int(vids[cand[j]]))
                            sc_o.append(_round_half_up6(float(scores[j])))
                            rns_o.append(rn)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(qids_o, pa.int64()),
                pa.array(nids_o, pa.int64()),
                pa.array(
                    sc_o, pa.float64() if rerank_k is not None else pa.int64()
                ),
                pa.array(rns_o, pa.int32()),
            ],
            schema=out_schema,
        )

    return v.coalesce(1).mapInArrow(
        kernel,
        f"query_id {idt}, neighbor_id {idt}, {score_col} {out_t}, rn int",
    )


#: Row ceiling under which :func:`kcenter_greedy` runs its k selection
#: rounds as ONE single-task executor kernel instead of k sequential
#: TakeOrdered driver round-trips. 250k rows x 64 int64 dims is ~128 MB
#: of numpy — comfortably inside an executor; above it the distributed
#: per-round scan loop runs unchanged (the 100 TB path). The arithmetic
#: is exact int64 on the fixed-point grid either way, so the two paths
#: are equal by construction (pinned in tests/test_llm_ops.py).
LOCAL_KCENTER_ROWS = 250_000


def _kcenter_local(v: DataFrame, k: int) -> DataFrame:
    """Single-task greedy k-center over the quantized vector frame
    ``v = (vec_id bigint, x array<bigint>)`` — same seed (smallest
    salted md5, vec_id tiebreak), same exact-integer distances, same
    argmax tiebreaks as the distributed round loop in
    :func:`kcenter_greedy`; one Spark job instead of ``k`` driver
    round-trips whose cost at this size is job-dispatch latency
    (guide §1.2)."""

    def kernel(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        ids_l: list = []
        xs_l: list = []
        for pdf in batches:
            ids_l.extend(int(i) for i in pdf["vec_id"])
            xs_l.extend(np.asarray(x, dtype=np.int64) for x in pdf["x"])
        out: list[tuple[int, int, int]] = []
        if ids_l:
            ids = np.asarray(ids_l, dtype=np.int64)
            X = np.stack(xs_l)
            h = np.asarray(
                [
                    int(hashlib.md5(f"kc|{i}".encode()).hexdigest()[:15], 16)
                    for i in ids_l
                ],
                dtype=np.int64,
            )
            # seed: smallest (h, vec_id) — ORDER BY h, vec_id LIMIT 1
            s = int(np.lexsort((ids, h))[0])
            out.append((0, int(ids[s]), 0))
            alive = np.ones(len(ids), dtype=bool)
            alive[s] = False
            diff = X - X[s]
            mind = np.einsum("ij,ij->i", diff, diff)
            for r in range(1, k):
                if not alive.any():
                    break
                # argmax mind, ties to the smallest vec_id (DESC mind,
                # ASC vec_id LIMIT 1 over the not-picked pool)
                mx = mind[alive].max()
                cand = alive & (mind == mx)
                far = int(np.flatnonzero(cand)[np.argmin(ids[cand])])
                out.append((r, int(ids[far]), int(mind[far])))
                alive[far] = False
                diff = X - X[far]
                mind = np.minimum(mind, np.einsum("ij,ij->i", diff, diff))
        yield pd.DataFrame(
            out, columns=["sel_order", "vec_id", "radius2"]
        ).astype({"sel_order": "int32", "vec_id": "int64", "radius2": "int64"})

    return v.coalesce(1).mapInPandas(
        kernel, "sel_order INT, vec_id BIGINT, radius2 BIGINT"
    )


def kcenter_greedy(
    emb: DataFrame,
    k: int = 8,
    scale: int = 1_000_000,
    offset: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_rows: int | None = None,
) -> DataFrame:
    """Greedy k-center coreset selection (farthest-point traversal);
    returns the k selected rows as (sel_order, vec_id, radius2).

    The classic coreset / data-pruning recipe (Gonzalez 1985; Sener &
    Savarese 2018 for training-set selection): start from a seed, then
    repeatedly pick the point FARTHEST from the selected set — the
    resulting radius2 sequence is the (squared) covering radius after
    each pick, and the selected points are a 2-approximation of the
    optimal k-center cover.

    Cross-engine determinism follows `kmeans_fixed_point`'s recipe:
    fixed-point integer coordinates (floor(v*scale)+offset) so every
    distance is an exact BIGINT; seed = smallest salted md5; all
    argmax ties break on vec_id.

    Scale shape: k rounds, each one corpus scan with a pure
    column-expression distance chain (the <=k selected centers are
    embedded as dim-length array LITERALS — k*dim constants, no join,
    no shuffle) reduced by orderBy+limit(1) = TakeOrdered. No
    corpus-grain window, no corpus-sized collect — the driver holds
    only the k selected vectors. Total cost: k scans; at 100 TB the
    incremental min-distance would be persisted between rounds instead
    of recomputed, leaving one scan per round either way.
    """
    x = F.transform(
        F.col(vec_col),
        lambda v: F.floor(v.cast("double") * scale).cast("bigint") + offset,
    )
    v = emb.select(F.col(id_col).cast("bigint").alias("vec_id"), x.alias("x"))
    # Size-gated single-task path (r19): a footer bound skips the gate
    # job; otherwise limit+count stops scanning as soon as the pool is
    # provably larger than the gate (a bounded partial scan).
    if bounded_small(v, LOCAL_KCENTER_ROWS, corpus_rows):
        return _kcenter_local(v, k)

    def d2_to(center: list) -> Column:
        arr = F.array(*[F.lit(int(c)) for c in center])
        return F.aggregate(
            F.zip_with("x", arr, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("bigint"),
            lambda acc, e: acc + e,
        )

    h = md5_int60(F.concat(F.lit("kc|"), F.col("vec_id").cast("string")))
    seed_rows = v.withColumn("h", h).orderBy("h", "vec_id").limit(1).collect()
    picked: list[tuple[int, int, int]] = []
    if seed_rows:
        seed = seed_rows[0]
        picked.append((0, int(seed.vec_id), 0))
        mind = d2_to(list(seed.x))
        for r in range(1, k):
            # Exclude already-picked ids and stop when the pool runs dry
            # (k > number of vectors) — the unguarded argmax re-picked
            # centers with mind=0 forever (r6 advisory). The exclusion
            # list is <= k ids, a plan literal like the centers.
            far_rows = (
                v.filter(~F.col("vec_id").isin([p[1] for p in picked]))
                .select("vec_id", "x", mind.alias("mind"))
                .orderBy(F.desc("mind"), F.asc("vec_id"))
                .limit(1)
                .collect()
            )
            if not far_rows:
                break
            far = far_rows[0]
            picked.append((r, int(far.vec_id), int(far.mind)))
            mind = F.least(mind, d2_to(list(far.x)))
    return emb.sparkSession.createDataFrame(
        picked, "sel_order INT, vec_id BIGINT, radius2 BIGINT"
    )


def _mmr_rerank_local(
    emb: DataFrame,
    query_vec_id: int,
    k: int,
    pool: int,
    lam: float,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Single-task MMR re-rank for a corpus known to fit one executor
    (``<= LOCAL_KNN_ROWS`` rows — gated by :func:`mmr_rerank`, r20
    VERDICT item 5). One mapInArrow job replaces the knn stage, the
    pool checkpoint, and the k-round driver loop of
    ``orderBy().limit(1).collect()`` round trips (each a full pool scan
    — the exact shape kcenter_greedy shed in r19). Arithmetic mirrors
    the distributed form term-for-term: the identical left-fold cosine
    (:func:`_fold_scores`), HALF_UP 6dp rounding before every max-fold,
    ``lam*rel - (1-lam)*maxs`` on the rounded inputs, (desc, asc id)
    tiebreaks, and np.maximum == F.greatest (NaN wins in both). Above
    the gate the distributed knn + driver-loop plan runs unchanged —
    each pick there is a distributed top-1, so it is scale-valid.
    Equality is pinned by tests/test_local_kernels.py and the chained
    CTE oracle."""

    def kernel(batches):
        import numpy as np
        import pyarrow as pa

        schema = pa.schema(
            [
                pa.field("sel_order", pa.int32()),
                pa.field("vec_id", pa.int64()),
                pa.field("relevance", pa.float64()),
                pa.field("mmr", pa.float64()),
            ]
        )
        rows = []
        tabs = [pa.Table.from_batches([b]) for b in batches]
        if tabs:
            t = pa.concat_tables(tabs)
            vids = t.column("vid").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            V = _vec_matrix(t.column("v"))
            qm = np.flatnonzero(vids == query_vec_id)
            cm = np.flatnonzero(vids > query_vec_id)
            if len(qm) and len(cm):
                # candidate stage == knn_bruteforce: top-`pool` by the
                # UNROUNDED fold score (desc, asc id), rel = rounded
                scores = _fold_scores(V[qm][:1], V[cm])[0]
                cids = vids[cm]
                order = np.lexsort((cids, -scores))[:pool]
                ids = cids[order]
                rel = np.array(
                    [_round_half_up6(float(s)) for s in scores[order]]
                )
                X = V[cm][order]
                alive = np.ones(len(ids), bool)
                maxs = None
                for r in range(k):
                    if not alive.any():
                        break
                    mmr = (
                        rel
                        if r == 0
                        else lam * rel - (1.0 - lam) * maxs
                    )
                    ai = np.flatnonzero(alive)
                    pick = ai[np.lexsort((ids[ai], -mmr[ai]))[0]]
                    rows.append(
                        (r, int(ids[pick]), float(rel[pick]), float(mmr[pick]))
                    )
                    alive[pick] = False
                    sims = _fold_scores(X[pick][None, :], X)[0]
                    srnd = np.array(
                        [_round_half_up6(float(s)) for s in sims]
                    )
                    maxs = srnd if maxs is None else np.maximum(maxs, srnd)
        cols = list(zip(*rows)) if rows else ([], [], [], [])
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(list(cols[0]), pa.int32()),
                pa.array(list(cols[1]), pa.int64()),
                pa.array(list(cols[2]), pa.float64()),
                pa.array(list(cols[3]), pa.float64()),
            ],
            schema=schema,
        )

    feed = emb.select(
        F.col(id_col).alias("vid"), as_double(vec_col).alias("v")
    )
    return feed.coalesce(1).mapInArrow(
        kernel, "sel_order int, vec_id bigint, relevance double, mmr double"
    )


def mmr_rerank(
    emb: DataFrame,
    query_vec_id: int = 0,
    k: int = 5,
    pool: int = 20,
    lam: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_rows: int | None = None,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): greedily select k of the top-`pool` relevance candidates,
    each round maximizing lam*relevance - (1-lam)*max_sim_to_selected.
    Returns (sel_order, vec_id, relevance, mmr).

    The distributed stage is candidate generation — `knn_bruteforce`
    over the full corpus (one scan, per-query top-k window). The
    re-rank then runs over the pool-sized frame only: it is
    localCheckpoint'ed once (pool rows), and each of the k rounds is a
    TakeOrdered(1) over <= pool rows with the selected vectors embedded
    as array literals — O(k*pool) work regardless of corpus size.

    Determinism: relevance is the 6dp-rounded knn score; every
    similarity-to-selected is 6dp-rounded before the max-fold, so the
    mmr expression consumes only rounded inputs and both engines pick
    identical argmaxes (vec_id tiebreaks). The oracle chains the same
    rounds as CTEs with a cumulative exclusion per round.
    """
    # Size-gated single-task path (r20): below LOCAL_KNN_ROWS the whole
    # program — candidate knn, pool checkpoint, and the k driver-side
    # top-1 round trips — runs as one mapInArrow task. ``corpus_rows``
    # (e.g. a parquet footer count) proves smallness with zero jobs.
    if bounded_small(emb, LOCAL_KNN_ROWS, corpus_rows):
        return _mmr_rerank_local(
            emb, query_vec_id, k, pool, lam, id_col, vec_col
        )
    q = emb.filter(F.col(id_col) == query_vec_id)
    c = emb.filter(F.col(id_col) > query_vec_id)
    cand = knn_bruteforce(q, c, k=pool, id_col=id_col, vec_col=vec_col)
    px = emb.select(F.col(id_col).alias("vec_id"), as_double(vec_col).alias("x"))
    pool_df = (
        cand.select(F.col("neighbor_id").alias("vec_id"), F.col("score").alias("rel"))
        .join(px, "vec_id")
        .localCheckpoint(eager=True)
    )

    def lit_vec(vals: list) -> Column:
        return F.array(*[F.lit(float(v)) for v in vals])

    rows = []
    sel_ids: list = []
    maxs = None
    for r in range(k):
        if r == 0:
            scored = pool_df.select("vec_id", "rel", "x", F.col("rel").alias("mmr"))
        else:
            scored = pool_df.filter(~F.col("vec_id").isin(sel_ids)).select(
                "vec_id",
                "rel",
                "x",
                (F.lit(lam) * F.col("rel") - F.lit(1.0 - lam) * maxs).alias("mmr"),
            )
        top_rows = scored.orderBy(F.desc("mmr"), F.asc("vec_id")).limit(1).collect()
        if not top_rows:
            # pool exhausted (fewer candidates than k) — return the
            # shorter selection instead of IndexError (r6 advisory)
            break
        top = top_rows[0]
        rows.append((r, int(top.vec_id), float(top.rel), float(top.mmr)))
        sel_ids.append(int(top.vec_id))
        simr = F.round(cosine(lit_vec(list(top.x)), F.col("x")), 6)
        maxs = simr if maxs is None else F.greatest(maxs, simr)
    return emb.sparkSession.createDataFrame(
        rows, "sel_order INT, vec_id BIGINT, relevance DOUBLE, mmr DOUBLE"
    )
