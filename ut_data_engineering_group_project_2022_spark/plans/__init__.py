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
)

# Import for registration side effects — order is alphabetical, not load-bearing.
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
