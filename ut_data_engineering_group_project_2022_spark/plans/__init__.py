"""The engine's query surface.

Importing this package populates the global query registry (see
``registry.py``): every module below registers its queries at import
time. ``all_queries()`` is what ``__spark_entry__.py``, the tests, and
``bench.py`` consume.
"""

from ut_data_engineering_group_project_2022_spark.plans.registry import (  # noqa: F401
    QuerySpec,
    all_queries,
    get_query,
    register,
    set_priority,
)

# Import for registration side effects. Module order here is alphabetical;
# the exposed ordering is curated by set_priority() below, which IS
# load-bearing: the driver's correctness gate checks only the first 50
# queries, so the 50-slot window is allocated explicitly.
from ut_data_engineering_group_project_2022_spark.plans import (  # noqa: F401,E402
    bi_queries,
    enrich_queries,
    graph_queries,
    llm_ops,
    metric_queries,
    operator_queries,
    star_queries,
    tpch_queries,
)

# Round-4 window: the 47 queries that have never received a driver-side
# correctness row (every llm_* stats/retrieval operator and every round-2
# op_* family), plus graph_betweenness_nations (whose only driver row is
# round 1's FAIL — it passes the identical DuckDB-oracle compare locally
# and must be re-proven at the driver), plus a re-confirmation slot for
# llm_simhash_fingerprints (the other r1 FAIL, re-greened r2/r3).
# Everything rotated out of the window stays registered and fully gated by
# tests/test_oracle_parity.py; rounds 1-3 already drove it green
# (CORRECTNESS_r01..r03 union covers 98/145).
_PRIORITY = [
    # -- llm_* text/retrieval/stats: never driver-checked --
    "llm_repetition_metrics",
    "llm_stratified_sample",
    "llm_token_topk",
    "llm_mixture_weights",
    "llm_tfidf_topterms",
    "llm_bm25_search",
    "llm_inverted_index",
    "llm_approx_distinct",
    "llm_bigram_lm_score",
    "llm_pii_scrub",
    "llm_pseudonymized_activity",
    "llm_embedding_covariance",
    "llm_length_filter",
    "llm_doc_chunks",
    "llm_sequence_packing",
    "llm_embedding_pca_whiten",  # rows-only: no SQL oracle by design
    "llm_embedding_outliers",
    "llm_incremental_dedup",
    # -- op_* single-operator queries: never driver-checked --
    "op_union_all",
    "op_explode_tokens",
    "op_collect_reassemble",
    "op_sequence_dim",
    "op_regex_filter",
    "op_length_filter",
    "op_running_total",
    "op_topk_per_group",
    "op_argmax_customer_per_nation",
    "op_sessionize",
    "op_tumbling_hourly",
    "op_pivot_event_counts",
    "op_json_extract",
    "op_clean_strings",
    "op_order_limit",
    "op_array_predicates",
    "op_failure_count",
    "op_salted_agg",
    "op_rollup_revenue",
    "op_lead_lag_delta",
    "op_intersect_except",
    "op_percentiles",
    "op_range_frame",
    "op_funnel",
    "op_retention_cohorts",
    "op_hopping_window",
    "op_scd2_user_state",
    "op_range_join_bucketed",
    "op_key_skew_profile",
    # -- re-proof slots --
    "graph_betweenness_nations",  # only driver row is r1 FAIL; green locally
    "graph_louvain",  # round-4 addition: modularity-gain community detection
    "llm_simhash_fingerprints",  # r1 FAIL -> r2/r3 green; keep one fresh row
]

set_priority(_PRIORITY)
