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

# Round-2 window: the flagship surface (all 15 star_q*, the full TPC-H
# 22-query suite), the two round-1 fixes (simhash oracle HUGEINT cast,
# de-vacuated node similarity), and the round-2 additions. op_* micro
# queries yield their window slots to the completed TPC-H suite: each is a
# single-operator query fully gated by tests/test_oracle_parity.py, and
# everything round 1 already drove green stays registered after the window.
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
    "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority",
    "tpch_q4_priority_check",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q7_nation_volume",
    "tpch_q8_market_share",
    "tpch_q9_profit_by_nation",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q12_late_priority",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_counts",
    "tpch_q17_small_qty_revenue",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive_revenue",
    "tpch_q20_volume_suppliers",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_dormant_customers",
    "llm_simhash_fingerprints",
    "graph_node_similarity",
    "graph_author_rank",
    "graph_institution_rank",
    "llm_simhash_pairs_banded",
    "llm_embedding_neardup_lsh",
    "llm_train_val_split",
    "op_asof_join",
    "op_grouping_sets",
    "op_surrogate_keys",
    # op_percentiles / op_range_frame / op_sessionize yield their slots to
    # the round-2 flagship additions below; they stay fully gated by
    # tests/test_oracle_parity.py.
    "llm_kmeans_clusters",
    "graph_triangle_counts",
    "llm_contamination",
]

set_priority(_PRIORITY)
