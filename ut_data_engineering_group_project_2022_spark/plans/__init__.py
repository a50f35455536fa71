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

# Round-2 window: the 45 queries round 1 never checked (all star_q*, all
# tpch_q*, the trailing 22 op_*), the two round-1 fixes (simhash oracle
# HUGEINT cast, de-vacuated node similarity), and the round-2 additions.
# Everything round 1 already drove green stays registered after the window
# and remains covered by tests/test_oracle_parity.py.
_PRIORITY = [
    "star_q01_authors_by_papers_in_domain",
    "star_q02_authors_by_citations_in_domain",
    "star_q03_authors_by_hindex",
    "star_q04_authors_by_gindex",
    "star_q05_papers_by_citations",
    "star_q06_affiliations_by_papers",
    "star_q07_affiliations_by_papers_this_century",
    "star_q08_affiliations_by_citations",
    "star_q09_affiliations_by_avg_citations",
    "star_q10_venues_by_papers",
    "star_q11_venues_by_citations",
    "star_q12_venues_by_avg_citations",
    "star_q13_math_venues",
    "star_q14_years_by_papers",
    "star_q15_domain_year_histogram",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q4_priority_check",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    "tpch_q14_promo_revenue",
    "tpch_q18_large_orders",
    "llm_simhash_fingerprints",
    "graph_node_similarity",
    "graph_author_rank",
    "graph_institution_rank",
    "llm_simhash_pairs_banded",
    "llm_train_val_split",
    "op_asof_join",
    "op_grouping_sets",
    "op_percentiles",
    "op_range_frame",
    "op_surrogate_keys",
    "op_explode_tokens",
    "op_collect_reassemble",
    "op_sequence_dim",
    # op_regex_filter / op_length_filter / op_order_limit / op_union_all /
    # op_clean_strings yield their window slots to the round-2 additions
    # above: trivial single-operator queries, fully gated by
    # tests/test_oracle_parity.py.
    "op_running_total",
    "op_topk_per_group",
    "op_argmax_customer_per_nation",
    "op_sessionize",
    "op_tumbling_hourly",
    "op_pivot_event_counts",
    "op_json_extract",
    "op_array_predicates",
    "op_failure_count",
    "op_salted_agg",
    "op_rollup_revenue",
    "op_lead_lag_delta",
    "op_intersect_except",
]

set_priority(_PRIORITY)
