"""r19 size-gated single-task kernels: local path == distributed path.

The optimization round routed whole small-graph executions of louvain,
connected_components, pagerank and kcenter_greedy through single-task
mapInPandas kernels (one Spark job instead of a per-round job chain,
guide §1.2). These tests force the distributed branch (monkeypatching
the gate to 0) and pin it bit-equal to the default local branch on the
same input — the gate picks a physical strategy, never a different
result — including on the registered sf0.001 configuration of each
bench row.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from ut_data_engineering_group_project_2022_spark.operators import (
    dedup,
    graph,
    similarity,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _cc_map(df):
    return {r.node_id: r.component for r in df.collect()}


def _pr_map(df):
    return {r.node_id: r.pagerank for r in df.collect()}


def test_cc_local_kernel_matches_distributed(spark, monkeypatch):
    pairs = [
        ("n1", "n2"), ("n2", "n3"), ("n3", "n4"),
        ("x1", "x2"), ("x2", "x3"), ("x3", "x1"), ("x2", "x1"),
        ("q", "q"),  # self-loop: dropped by normalization on both paths
        ("z9", "z8"), ("z8", "z7"),
    ]
    for rounds in (1, 2, 3, 5):
        local = _cc_map(
            graph.connected_components(_edges(spark, pairs), rounds=rounds)
        )
        monkeypatch.setattr(graph, "LOCAL_MOVE_EDGES", 0)
        dist = _cc_map(
            graph.connected_components(_edges(spark, pairs), rounds=rounds)
        )
        monkeypatch.undo()
        assert local == dist, f"rounds={rounds}"


def test_cc_local_kernel_matches_distributed_bench_config(spark, monkeypatch):
    # the registered graph_connected_components configuration at sf0.001
    edges = graph.customer_supplier_edges(spark, SF_DIR).filter(
        F.col("weight") >= 2
    )
    local = _cc_map(graph.connected_components(edges, rounds=5))
    monkeypatch.setattr(graph, "LOCAL_MOVE_EDGES", 0)
    dist = _cc_map(graph.connected_components(edges, rounds=5))
    assert local == dist


def test_pagerank_local_kernel_matches_distributed(spark):
    pairs = [
        ("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "a"),
        ("e", "a"),  # e has no in-edges: contrib-less node
    ]
    und = graph.undirect(_edges(spark, pairs))
    local = _pr_map(graph.pagerank_sized(und, 0, iterations=3, damping=0.85))
    dist = _pr_map(graph.pagerank(und, iterations=3, damping=0.85))
    assert local == dist


def test_pagerank_local_kernel_matches_distributed_bench_config(spark):
    # the registered graph_pagerank configuration at sf0.001
    ed = graph.materialized(graph.customer_supplier_edges(spark, SF_DIR))
    und = graph.undirect(ed)
    n = 2 * ed.count()
    assert n <= graph.LOCAL_MOVE_EDGES  # the bench SFs take the local path
    local = _pr_map(graph.pagerank_sized(und, n, iterations=3, damping=0.85))
    dist = _pr_map(graph.pagerank(und, iterations=3, damping=0.85))
    assert local == dist


def test_louvain_local_kernel_matches_distributed_bench_config(
    spark, monkeypatch
):
    # the registered graph_louvain configuration at sf0.001 (the tiny-
    # graph louvain local/distributed pins live in test_graph.py)
    edges = graph.customer_supplier_edges(spark, SF_DIR)
    local = {
        r.node_id: r.community
        for r in graph.louvain(edges, rounds=4, assume_simple=True).collect()
    }
    monkeypatch.setattr(graph, "LOCAL_MOVE_EDGES", 0)
    dist = {
        r.node_id: r.community
        for r in graph.louvain(edges, rounds=4, assume_simple=True).collect()
    }
    assert local == dist


def test_fused_pair_feeds_match_distributed_bench_config(spark, monkeypatch):
    """r20: the fused raw-pair kernels (projection-dedup + whole
    algorithm in ONE mapInArrow job) must be bit-equal to the
    distributed plans for all four gated graph rows. The plan builders
    dispatch on the lineitem footer bound, so monkeypatching the gate
    to 0 forces the distributed branch of the SAME builder."""
    from ut_data_engineering_group_project_2022_spark.plans import (
        graph_queries as gq,
    )

    for name in (
        "graph_louvain",
        "graph_louvain_weighted",
        "graph_pagerank",
        "graph_connected_components",
    ):
        build = getattr(gq, name)
        fused_df = build(spark, SF_DIR)
        assert "MapInArrow" in (
            fused_df._jdf.queryExecution().executedPlan().toString()
        ), name
        fused = sorted(map(tuple, fused_df.collect()))
        monkeypatch.setattr(graph, "LOCAL_MOVE_EDGES", 0)
        dist = sorted(map(tuple, build(spark, SF_DIR).collect()))
        monkeypatch.undo()
        assert fused == dist, name


def test_pairs_dedup_and_codes_edge_cases():
    """r20 synthetic edges for the fused feed's numpy groupBy twin:
    multiplicity counts, the lexsort fallback for unpackable key
    spaces, the NULL-key guard, and namespaced code order."""
    import numpy as np
    import pyarrow as pa
    import pytest

    # packed path: counts + ascending (custkey, suppkey) order
    t = pa.table({"o_custkey": [5, 2, 5, 2], "l_suppkey": [7, 1, 7, 9]})
    uc, us, w = graph._pairs_dedup(t)
    assert uc.tolist() == [2, 2, 5] and us.tolist() == [1, 9, 7]
    assert w.tolist() == [1, 1, 2]
    # lexsort fallback: negative and huge keys (unpackable in int64)
    t2 = pa.table(
        {"o_custkey": [-3, 2**40, -3], "l_suppkey": [1, 2**40, 1]}
    )
    uc2, us2, w2 = graph._pairs_dedup(t2)
    assert uc2.tolist() == [-3, 2**40] and us2.tolist() == [1, 2**40]
    assert w2.tolist() == [2, 1]
    # NULL keys refuse loudly (the projection would NULL-collapse them)
    with pytest.raises(ValueError, match="NULL"):
        graph._pairs_dedup(
            pa.table({"o_custkey": [1, None], "l_suppkey": [1, 2]})
        )
    # codes: lexicographic over the namespaced ids ('c10' < 'c2' < 's1')
    s, d, names = graph._pair_codes(
        np.array([2, 10]), np.array([1, 1])
    )
    assert names.tolist() == ["c10", "c2", "s1"]
    assert s.tolist() == [1, 0] and d.tolist() == [2, 2]


def test_cc_pairs_local_thinning_matches_distributed(spark, monkeypatch):
    """r20: the fused CC kernel's multiplicity thinning (min_weight)
    must drop pairs AND their thinning-isolated nodes exactly like the
    distributed filter-then-normalize base."""
    pairs = spark.createDataFrame(
        [(1, 10), (1, 10), (2, 20), (1, 30), (1, 30), (3, 10)],
        "o_custkey bigint, l_suppkey bigint",
    )
    fused = sorted(
        map(tuple, graph.cc_pairs_local(pairs, rounds=5, min_weight=2).collect())
    )
    edges = (
        pairs.groupBy("o_custkey", "l_suppkey")
        .agg(F.count(F.lit(1)).alias("weight"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
            "weight",
        )
        .filter(F.col("weight") >= 2)
    )
    monkeypatch.setattr(graph, "LOCAL_MOVE_EDGES", 0)
    dist = sorted(
        map(tuple, graph.connected_components(edges, rounds=5).collect())
    )
    assert fused == dist
    # (c2, s20) and (c3, s10) are thinning-isolated: absent on both paths
    assert ("c2", "c2") not in fused and ("s20", "s20") not in fused


def test_kcenter_local_kernel_matches_distributed(spark, monkeypatch):
    emb = spark.createDataFrame(
        [
            (0, [0.0, 0.0, 0.1, 0.0]),
            (1, [1.0, 0.9, 0.0, 0.0]),
            (2, [0.0, 0.1, 0.05, 0.0]),
            (3, [-1.0, -0.9, 0.0, 0.2]),
            (4, [1.0, 1.0, 0.0, 0.0]),
        ],
        "vec_id bigint, embedding array<float>",
    )
    local = similarity.kcenter_greedy(emb, k=3).collect()
    monkeypatch.setattr(similarity, "LOCAL_KCENTER_ROWS", 0)
    dist = similarity.kcenter_greedy(emb, k=3).collect()
    assert [tuple(r) for r in local] == [tuple(r) for r in dist]


def test_kcenter_local_kernel_matches_distributed_bench_config(
    spark, monkeypatch
):
    # the registered llm_coreset_kcenter configuration at sf0.001
    from ut_data_engineering_group_project_2022_spark.catalog import table

    emb = table(spark, SF_DIR, "embeddings")
    local = similarity.kcenter_greedy(emb, k=8).collect()
    monkeypatch.setattr(similarity, "LOCAL_KCENTER_ROWS", 0)
    dist = similarity.kcenter_greedy(emb, k=8).collect()
    assert [tuple(r) for r in local] == [tuple(r) for r in dist]


def _sd_map(df):
    return {r.vec_id: (r.cluster, r.keep, r.dup_of) for r in df.collect()}


def test_semdedup_local_kernel_matches_distributed(spark, monkeypatch):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.99, 0.01, 0.0]),   # near-dup of 0
            (2, [0.0, 1.0, 0.0]),
            (3, [0.0, 0.98, 0.02]),   # near-dup of 2
            (4, [-1.0, 0.0, 0.0]),
            (5, [0.5, 0.5, 0.0]),
        ],
        "vec_id bigint, embedding array<float>",
    )
    for k, thr in ((2, 0.9), (3, 0.4), (10, 0.99)):
        local = _sd_map(similarity.semdedup(emb, k=k, threshold=thr))
        monkeypatch.setattr(similarity, "LOCAL_SEMDEDUP_ROWS", 0)
        dist = _sd_map(similarity.semdedup(emb, k=k, threshold=thr))
        monkeypatch.undo()
        assert local == dist, f"k={k} thr={thr}"


def test_semdedup_local_kernel_matches_distributed_bench_config(
    spark, monkeypatch
):
    # the registered llm_semdedup configuration at sf0.001
    from ut_data_engineering_group_project_2022_spark.catalog import table

    emb = table(spark, SF_DIR, "embeddings")
    local = _sd_map(similarity.semdedup(emb, k=10, iterations=2, threshold=0.40))
    monkeypatch.setattr(similarity, "LOCAL_SEMDEDUP_ROWS", 0)
    dist = _sd_map(similarity.semdedup(emb, k=10, iterations=2, threshold=0.40))
    assert local == dist


def test_minhash_lsh_local_kernel_matches_distributed(spark, monkeypatch):
    # the registered llm_minhash_lsh configuration at sf0.001, plus a
    # whitespace-edge synthetic (leading tab, trailing newline, dup doc)
    from collections import Counter

    from ut_data_engineering_group_project_2022_spark.catalog import table

    def pairs(df):
        return Counter((r.doc_a, r.doc_b, r.jaccard) for r in df.collect())

    docs = table(spark, SF_DIR, "documents")
    syn = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "\tthe quick brown fox jumps over the lazy dog\n"),
            (4, "the quick brown fox jumps over the lazy dog"),
            (5, "completely different text with no shared shingles at all"),
            (6, "ab"),  # < k tokens: empty shingle set, never paired
        ],
        "doc_id bigint, text string",
    )
    for df in (docs, syn):
        local = pairs(dedup.minhash_lsh_dedup(df))
        monkeypatch.setattr(dedup, "LOCAL_DEDUP_DOCS", 0)
        dist = pairs(dedup.minhash_lsh_dedup(df))
        monkeypatch.undo()
        assert local == dist


def test_incremental_neardup_local_kernel_matches_distributed(
    spark, monkeypatch
):
    # the registered llm_incremental_dedup configuration at sf0.001
    from ut_data_engineering_group_project_2022_spark.catalog import table

    docs = table(spark, SF_DIR, "documents")
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)

    def res(df):
        return {
            r.doc_id: (r.is_dup, r.n_matches, r.match_id) for r in df.collect()
        }

    local = res(dedup.incremental_neardup(batch, corpus, min_jaccard=0.8))
    monkeypatch.setattr(dedup, "LOCAL_DEDUP_DOCS", 0)
    dist = res(dedup.incremental_neardup(batch, corpus, min_jaccard=0.8))
    assert local == dist


def test_kcenter_local_kernel_k_exceeding_pool(spark):
    emb = spark.createDataFrame(
        [(0, [0.0, 1.0]), (1, [1.0, 0.0])],
        "vec_id bigint, embedding array<float>",
    )
    got = similarity.kcenter_greedy(emb, k=5).collect()
    assert len(got) == 2
    assert sorted(r.vec_id for r in got) == [0, 1]


def _star_tables(state):
    from dataclasses import fields

    from ut_data_engineering_group_project_2022_spark.operators import star

    return {
        f.name: sorted(map(tuple, getattr(state, f.name).collect()))
        for f in fields(star.StarState)
    }


def test_star_local_kernel_matches_distributed(spark, monkeypatch):
    """First-batch star load: the single-task kernel == the distributed
    loader on fixture batch 1 (null year/type/doi sentinels, multi-author
    bridges) and on a carry-conflict batch (gender first-wins = min)."""
    from tests.fixtures import staging_batch_1
    from ut_data_engineering_group_project_2022_spark.operators import star
    from ut_data_engineering_group_project_2022_spark.schemas import (
        STAGING_AUTHORS,
        STAGING_MAIN,
    )

    m1, a1 = staging_batch_1(spark)
    a_conflict = spark.createDataFrame(
        [
            ("Zed", "Q", "X", "male", "Zed Q", "0701.0001"),
            ("Zed", "Q", "Y", "nonbinary", "Zed Q", "0701.0001"),
            ("Zed", "Q", None, "female", "Zed Q", "0701.0002"),
            # id with no matching paper: dim row with NULL h/g, no bridge
            ("Ann", "B", "Z", "female", "Ann B", "0799.9999"),
        ],
        STAGING_AUTHORS,
    )
    # versions edges: NULL -> latest_version_nr NULL; bare digits (no
    # 'v' prefix) parse as-is. (A non-numeric versions string is out of
    # contract: under ANSI sessions the distributed loader's cast throws
    # on it, under non-ANSI it yields NULL — the kernel matches the
    # tolerant non-ANSI behavior.)
    m_edge = spark.createDataFrame(
        [
            (2001, "A", "t", "V", "P", "e1", "d", "T", "12", 1),
            (2002, "B", "t", "V", "P", "e2", "d", "T", None, 0),
        ],
        STAGING_MAIN,
    )
    for m, a in [(m1, a1), (m1, a_conflict), (m_edge, a1)]:
        local = _star_tables(star.load_batch(star.empty_star(spark), m, a))
        monkeypatch.setattr(star, "LOCAL_STAR_ROWS", -1)
        dist = _star_tables(star.load_batch(star.empty_star(spark), m, a))
        monkeypatch.undo()
        assert local == dist


def test_star_local_kernel_matches_distributed_bench_config(
    spark, monkeypatch
):
    """The bench configuration: synthetic_staging at sf0.001 through the
    kernel vs the distributed loader — all nine tables bit-equal."""
    from ut_data_engineering_group_project_2022_spark.operators import star
    from ut_data_engineering_group_project_2022_spark.plans.star_queries import (
        synthetic_staging,
    )

    m, a = synthetic_staging(spark, SF_DIR)
    local = _star_tables(star.load_batch(star.empty_star(spark), m, a))
    monkeypatch.setattr(star, "LOCAL_STAR_ROWS", -1)
    dist = _star_tables(star.load_batch(star.empty_star(spark), m, a))
    assert local == dist


def test_star_load_footer_bound_proves_small_only(spark, monkeypatch):
    """r20 (VERDICT item 6): n_staging_rows is an upper BOUND — a bound
    under the gate takes the kernel with zero count jobs, a bound OVER
    the gate must fall back to the bounded count (and still take the
    kernel when the data is actually small), and a non-bootstrap state
    ignores the bound entirely."""
    from tests.fixtures import staging_batch_1
    from ut_data_engineering_group_project_2022_spark.operators import star

    m, a = staging_batch_1(spark)
    base = _star_tables(star.load_batch(star.empty_star(spark), m, a))
    # proven-small bound: same result
    bounded = _star_tables(
        star.load_batch(star.empty_star(spark), m, a, n_staging_rows=50)
    )
    assert bounded == base
    # over-estimate: can never force the distributed path — the count
    # fallback still proves the batch small and takes the kernel
    over = _star_tables(
        star.load_batch(
            star.empty_star(spark), m, a,
            n_staging_rows=star.LOCAL_STAR_ROWS + 1,
        )
    )
    assert over == base


def test_star_local_gate_skips_non_bootstrap_state(spark):
    """A state that already holds rows must NEVER take the first-batch
    kernel: batch 2 over a kernel-built state runs distributed and keys
    continue past max(existing)."""
    from tests.fixtures import staging_batch_1, staging_batch_2
    from ut_data_engineering_group_project_2022_spark.operators import star

    m1, a1 = staging_batch_1(spark)
    state = star.load_batch(star.empty_star(spark), m1, a1)
    assert not star._bootstrap_only(state)
    m2, a2 = staging_batch_2(spark)
    state2 = star.load_batch(state, m2, a2)
    keys = sorted(r.author_key for r in state2.dim_author.collect())
    assert keys == list(range(1, len(keys) + 1))


def test_knn_local_kernels_match_distributed_bench_config(spark, monkeypatch):
    """knn_bruteforce / knn_pq / knn_pq_rerank: the single-task kernels
    == the distributed plans on the registered bench configurations at
    sf0.001 — scores (left-fold cosine, HALF_UP round), exact int64 ADC
    distances, and (dist/score, neighbor_id) tie order all bit-equal."""
    from ut_data_engineering_group_project_2022_spark.catalog import table

    emb = table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    c = emb.filter(F.col("vec_id") >= 10)

    def rows(df):
        return sorted(map(tuple, df.collect()))

    local = [
        rows(similarity.knn_bruteforce(q, c, k=5)),
        rows(similarity.knn_pq(emb, k=5, m=16)),
        rows(similarity.knn_pq_rerank(emb, k=5, shortlist=100, m=16)),
    ]
    monkeypatch.setattr(similarity, "LOCAL_KNN_ROWS", -1)
    monkeypatch.setattr(similarity, "LOCAL_KNN_QUERIES", -1)
    dist = [
        rows(similarity.knn_bruteforce(q, c, k=5)),
        rows(similarity.knn_pq(emb, k=5, m=16)),
        rows(similarity.knn_pq_rerank(emb, k=5, shortlist=100, m=16)),
    ]
    assert local == dist


def test_global_dense_rank_gate_matches_two_phase_bench_config(
    spark, monkeypatch
):
    """The r19 size-gated single-window rank == the two-phase form on a
    registered bench configuration (bi_rank_customers_by_order_count at
    sf0.001)."""
    from ut_data_engineering_group_project_2022_spark.operators import star
    from ut_data_engineering_group_project_2022_spark.plans import get_query

    build = get_query("bi_rank_customers_by_order_count").spark
    local = sorted(map(tuple, build(spark, SF_DIR).collect()))
    monkeypatch.setattr(star, "LOCAL_RANK_ROWS", -1)
    dist = sorted(map(tuple, build(spark, SF_DIR).collect()))
    assert local == dist


def test_curation_local_kernel_matches_distributed(spark, monkeypatch):
    """llm_curation_pipeline's single-task kernel == the distributed
    composition on the registered sf0.001 config and on a synthetic
    covering every verdict branch (exact_dup, near_dup, low_quality,
    non_english, kept, NULL text -> NULL keep/quality)."""
    from ut_data_engineering_group_project_2022_spark.plans import get_query

    build = get_query("llm_curation_pipeline").spark

    def rows(df):
        return sorted(map(tuple, df.collect()))

    local = rows(build(spark, SF_DIR))
    syn = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and then the cat sat for a while"),
            (2, "the cat sat on the mat and then the cat sat for a while"),
            (3, "the cat sat on the mat and then the cat sat for a time"),
            (4, "1234 5678 !!!! ???? 0000 9999 8888 7777 6666 5555 4444"),
            (5, "a b a b a b a b a b a b a b a b a b a b a c a d a e a f"),
            (6, "tiny"),
            (7, None),
        ],
        "doc_id bigint, text string",
    )
    syn_local = rows(dedup.curation_local(syn))
    monkeypatch.setattr(dedup, "LOCAL_DEDUP_DOCS", -1)
    dist = rows(build(spark, SF_DIR))
    assert local == dist
    # the synthetic's distributed twin needs the full composition; the
    # branch coverage assertion below pins the kernel's verdict labels
    verdicts = {r[0]: r[1] for r in syn_local}
    assert verdicts[2] == "exact_dup" and verdicts[3] == "near_dup"
    assert verdicts[4] == "low_quality" and verdicts[5] == "non_english"
    assert verdicts[1] == "kept" and verdicts[7] == "kept"
    assert syn_local[6][2] is None and syn_local[6][3] is None


def _q1_rows(df):
    import math

    def tok(v):
        if isinstance(v, float):
            return ("f", math.copysign(1.0, v), repr(v))
        return v

    return sorted(tuple(tok(v) for v in r) for r in df.collect())


def test_tpch_q1_local_kernel_matches_distributed_bench_config(
    spark, monkeypatch
):
    from ut_data_engineering_group_project_2022_spark.operators import (
        relational,
    )
    from ut_data_engineering_group_project_2022_spark.plans.tpch_queries import (
        tpch_q1_pricing_summary as build,
    )

    local_df = build(spark, SF_DIR)
    local = _q1_rows(local_df)
    monkeypatch.setattr(relational, "LOCAL_TPCH_ROWS", 0)
    dist_df = build(spark, SF_DIR)
    dist = _q1_rows(dist_df)
    assert local == dist
    # names+types must match (nullability differs: mapInArrow output is
    # all-nullable, like the knn/star kernels — invisible to the driver)
    assert [(f.name, f.dataType) for f in local_df.schema] == [
        (f.name, f.dataType) for f in dist_df.schema
    ]


def test_tpch_q1_local_kernel_decimal_fallback_path(spark, monkeypatch, tmp_path):
    # values that are NOT 4-decimal money force _dec_scaled's per-element
    # Decimal path; parity must hold against the distributed aggregate
    from ut_data_engineering_group_project_2022_spark.operators import (
        relational,
    )
    from ut_data_engineering_group_project_2022_spark.plans.tpch_queries import (
        tpch_q1_pricing_summary as build,
    )

    rows = [
        (1, 1, 1, 1, 17.0, 36485.92, 0.05, 0.03, "N", "O", "1996-01-10"),
        (2, 1, 1, 1, 3.141592653589793, 0.000049999, 0.06999999, 0.00125,
         "N", "O", "1996-02-10"),
        (3, 1, 1, 1, 25.5, 123456789.123456789, 0.1, 0.08, "R", "F",
         "1995-06-01"),
        (4, 1, 1, 1, 50.0, 104949.5, 0.0, 0.0, "A", "F", "1999-01-01"),
        (5, 1, 1, 1, 1.0, 0.015, 0.025, 0.045, "R", "F", "1992-03-04"),
    ]
    df = spark.createDataFrame(
        rows,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, ship string",
    ).withColumn("l_shipdate", F.col("ship").cast("timestamp")).drop("ship")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    local = _q1_rows(build(spark, str(tmp_path)))
    monkeypatch.setattr(relational, "LOCAL_TPCH_ROWS", 0)
    dist = _q1_rows(build(spark, str(tmp_path)))
    assert local == dist
    # rows 1,2 -> (N,O); rows 3,5 -> (R,F); row 4 shipdate-filtered
    assert len(local) == 2


def test_mmr_rerank_local_matches_distributed(spark, monkeypatch):
    """r20 (VERDICT item 5): the single-task MMR kernel must be
    bit-equal to the distributed knn + k-round driver loop — bench
    config, a pool-exhaustion case (k > candidates), and a tie-heavy
    synthetic."""
    from ut_data_engineering_group_project_2022_spark.catalog import table

    def rows(df):
        return [tuple(r) for r in df.orderBy("sel_order").collect()]

    emb = table(spark, SF_DIR, "embeddings")
    local = rows(similarity.mmr_rerank(emb, query_vec_id=0, k=5, pool=20))
    monkeypatch.setattr(similarity, "LOCAL_KNN_ROWS", 0)
    dist = rows(similarity.mmr_rerank(emb, query_vec_id=0, k=5, pool=20))
    monkeypatch.undo()
    assert local == dist and len(local) == 5

    tiny = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [1.0, 0.0, 0.0]),   # identical to query: rel 1.0
            (2, [1.0, 0.0, 0.0]),   # tie with 1 -> id tiebreak
            (3, [0.0, 1.0, 0.0]),   # orthogonal
            (4, [0.5, 0.5, 0.0]),
        ],
        "vec_id bigint, embedding array<float>",
    )
    # k > pool candidates: both paths stop early with the same selection
    local = rows(similarity.mmr_rerank(tiny, query_vec_id=0, k=9, pool=3))
    monkeypatch.setattr(similarity, "LOCAL_KNN_ROWS", 0)
    dist = rows(similarity.mmr_rerank(tiny, query_vec_id=0, k=9, pool=3))
    monkeypatch.undo()
    assert local == dist and len(local) == 3


def test_supplier_revenue_rank_local_matches_distributed(spark, monkeypatch):
    """r20 (VERDICT item 4): the fused bi_rank_suppliers kernel
    (scaled-integer revenue sum + in-kernel dense rank, one mapInArrow
    job) must be bit-equal to the distributed groupBy + two-phase rank
    at the bench config, and must reproduce the groupBy/rank corner
    semantics on synthetics."""
    from ut_data_engineering_group_project_2022_spark.operators import (
        relational,
    )
    from ut_data_engineering_group_project_2022_spark.plans import (
        bi_queries as bq,
    )

    # all four gated bi rows (r20: the generalized grouped-measure
    # kernel covers disc_revenue, dec4_sum and count_nonnull)
    for name in (
        "bi_rank_suppliers_by_region_revenue",
        "bi_rank_customers_by_revenue",
        "bi_rank_customers_by_order_count",
        "bi_rank_parts_by_shipped_qty",
    ):
        build = getattr(bq, name)
        fused_df = build(spark, SF_DIR)
        assert "MapInArrow" in (
            fused_df._jdf.queryExecution().executedPlan().toString()
        ), name
        fused = sorted(map(tuple, fused_df.collect()))
        monkeypatch.setattr(relational, "LOCAL_TPCH_ROWS", 0)
        dist_df = build(spark, SF_DIR)
        dist = sorted(map(tuple, dist_df.collect()))
        monkeypatch.undo()
        assert fused == dist, name
        assert [(f.name, f.dataType) for f in fused_df.schema] == [
            (f.name, f.dataType) for f in dist_df.schema
        ], name
    # synthetics through the kernel directly: duplicate suppkey with two
    # names (two groups, same revenue, tied rank), NULL name (one
    # group), all-NULL revenue group (NULLS LAST under F.desc), ties
    feed = spark.createDataFrame(
        [
            (1, "alpha", 100.0, 0.1),
            (1, "alpha", 50.0, 0.0),
            (1, "beta", 100.0, 0.1),
            (1, "beta", 50.0, 0.0),
            (2, None, 140.0, 0.0),
            (3, "gamma", float("nan"), 0.0),
            (4, "delta", 140.0, 0.0),
        ],
        "s_suppkey bigint, s_name string, l_extendedprice double, "
        "l_discount double",
    )
    got = sorted(
        map(tuple, relational.supplier_revenue_rank_local(feed).collect()),
        key=lambda r: (r[0], r[1] or ""),
    )
    # exact revenues: 100*0.9 + 50 = 140.0 for both (1, alpha) and
    # (1, beta); NaN extendedprice -> NULL product -> NULL group sum
    assert got == [
        (1, "alpha", 140.0, 1),
        (1, "beta", 140.0, 1),
        (2, None, 140.0, 1),
        (3, "gamma", None, 2),
        (4, "delta", 140.0, 1),
    ]


def test_tpch_q1_magnitude_gate_falls_back_to_distributed(spark, tmp_path):
    """r20 (r19 ADVICE): decimal(18,4) in-type magnitudes can wrap the
    kernel's int64 scaled-integer multiplies while the distributed
    decimal plan stays exact — the gate must prove the Q1_SAFE_ABS
    bound from footer stats and otherwise take the distributed plan;
    the kernel itself must refuse loudly rather than wrap."""
    import pytest

    from ut_data_engineering_group_project_2022_spark.operators import (
        relational,
    )
    from ut_data_engineering_group_project_2022_spark.plans.tpch_queries import (
        _q1_magnitudes_safe,
        tpch_q1_pricing_summary as build,
    )

    # the real bench data is proven safe (the kernel path is unchanged)
    assert _q1_magnitudes_safe(SF_DIR) is True

    rows = [
        (1, 1, 1, 1, 17.0, 2.0e11, -150.0, 500.0, "N", "O", "1996-01-10"),
        (2, 1, 1, 1, 3.0, 36485.92, 0.05, 0.03, "N", "O", "1996-02-10"),
    ]
    df = spark.createDataFrame(
        rows,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, ship string",
    ).withColumn("l_shipdate", F.col("ship").cast("timestamp")).drop("ship")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    assert _q1_magnitudes_safe(str(tmp_path)) is False
    out = build(spark, str(tmp_path))
    # the magnitude gate routed around the kernel: distributed plan
    assert "MapInArrow" not in out._jdf.queryExecution().executedPlan().toString()
    assert len(_q1_rows(out)) == 1  # (N, O)
    # a caller bypassing the gate gets a loud error, never a wrapped sum
    li = df.filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    with pytest.raises(Exception, match="proven-safe"):
        relational.tpch_q1_local(li).collect()


def _rows_hex(df):
    import struct

    def tok(v):
        if isinstance(v, float):
            return struct.pack(">d", v).hex()
        return v

    return sorted(tuple(tok(v) for v in r) for r in df.collect())


def test_ccnet_buckets_local_kernel_matches_distributed_bench_config(
    spark, monkeypatch
):
    from ut_data_engineering_group_project_2022_spark.operators import textml
    from ut_data_engineering_group_project_2022_spark.plans.llm_ops import (
        llm_ccnet_buckets as build,
    )

    local = _rows_hex(build(spark, SF_DIR))
    monkeypatch.setattr(textml, "LOCAL_TEXT_DOCS", -1)
    dist = _rows_hex(build(spark, SF_DIR))
    assert local == dist and len(local) > 0


def test_span_dedup_local_kernel_matches_distributed_bench_config(
    spark, monkeypatch
):
    from ut_data_engineering_group_project_2022_spark.operators import textml
    from ut_data_engineering_group_project_2022_spark.plans.llm_ops import (
        llm_span_dedup_rebuild as build,
    )

    local = _rows_hex(build(spark, SF_DIR))
    monkeypatch.setattr(textml, "LOCAL_TEXT_DOCS", -1)
    dist = _rows_hex(build(spark, SF_DIR))
    assert local == dist and len(local) > 0


def test_text_kernels_whitespace_and_null_edges(spark, monkeypatch, tmp_path):
    # NULL text, empty text, trailing java-\s whitespace, shared spans,
    # a null lang: the parity traps the r19 minhash kernel documented
    from ut_data_engineering_group_project_2022_spark.operators import textml
    from ut_data_engineering_group_project_2022_spark.plans.llm_ops import (
        llm_ccnet_buckets,
        llm_span_dedup_rebuild,
    )

    long_a = " ".join(f"w{i}" for i in range(40))
    rows = [
        (1, "en", "the cat sat on the mat"),
        (2, "en", "the cat sat on the mat"),
        (3, "et", long_a + " tail one"),
        (4, "et", long_a + " tail two"),
        (5, None, "mixed lang doc\t\n"),
        (6, "en", ""),
        (7, "en", None),
        (8, "en", "  leading and trailing  "),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    sfd = str(tmp_path)
    for build in (llm_ccnet_buckets, llm_span_dedup_rebuild):
        monkeypatch.setattr(textml, "LOCAL_TEXT_DOCS", 20_000)
        local = _rows_hex(build(spark, sfd))
        monkeypatch.setattr(textml, "LOCAL_TEXT_DOCS", -1)
        dist = _rows_hex(build(spark, sfd))
        assert local == dist, build.__name__
    # NULL text: absent from ccnet (explode of NULL), present in span
    # output with NULL n_chunks / 0 kept / '' rebuild
    monkeypatch.setattr(textml, "LOCAL_TEXT_DOCS", 20_000)
    ccnet_ids = {r[0] for r in llm_ccnet_buckets(spark, sfd).collect()}
    assert 7 not in ccnet_ids and 6 in ccnet_ids
    span = {r[0]: r for r in llm_span_dedup_rebuild(spark, sfd).collect()}
    assert span[7][1] is None and span[7][2] == 0 and span[7][3] == ""
    # doc 2 duplicates doc 1's only span: fully deduped away
    assert span[2][2] == 0 and span[2][3] == ""


def test_covariance_local_kernel_matches_distributed_bench_config(
    spark, monkeypatch
):
    from ut_data_engineering_group_project_2022_spark.operators import stats
    from ut_data_engineering_group_project_2022_spark.plans.llm_ops import (
        llm_embedding_covariance as build,
    )

    local = _rows_hex(build(spark, SF_DIR))
    monkeypatch.setattr(stats, "LOCAL_MOMENT_ROWS", -1)
    dist = _rows_hex(build(spark, SF_DIR))
    assert local == dist and len(local) == 2080
