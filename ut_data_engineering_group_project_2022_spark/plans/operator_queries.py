"""Operator-targeted queries — one per SURVEY §2 operator family.

Each query is the smallest realistic expression of an operator from the
reference's inventory (SURVEY.md §2, with reference file:line cited per
query) on the driver's tables, paired with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ut_data_engineering_group_project_2022_spark.catalog import table
from ut_data_engineering_group_project_2022_spark.plans.registry import register


# --- Dedup / distinct (SURVEY D1-D4) --------------------------------------


@register(
    "op_distinct_dims",
    oracle="""
    SELECT DISTINCT c_mktsegment AS segment FROM customer ORDER BY segment
    """,
    doc="SELECT DISTINCT before dim insert (SURVEY D3; ref pop_DWH.py:158-203).",
    tags=("dedup",),
)
def op_distinct_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.select(F.col("c_mktsegment").alias("segment")).distinct().orderBy("segment")


@register(
    "op_dedup_first_wins",
    oracle="""
    SELECT md5(lower(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g'))) AS norm_key,
           MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
    doc="Dedup on normalise(title+authors) derived key, first occurrence wins "
    "(SURVEY D1; ref transforms.py:5-21). Keyed by lowercased alnum-only md5.",
    tags=("dedup", "text"),
)
def op_dedup_first_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    norm = F.md5(F.regexp_replace(F.lower("text"), "[^a-z0-9]", ""))
    return d.groupBy(norm.alias("norm_key")).agg(
        F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    )


@register(
    "op_dedup_keep_last",
    oracle="""
    SELECT user_id, event_type, event_id, value
    FROM (
      SELECT user_id, event_type, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) t WHERE rn = 1
    """,
    doc="Keep-last dedup by recency (SURVEY D2; ref transformations_largejson "
    "notebook cell 14): latest event per (user, type).",
    tags=("dedup", "window"),
)
def op_dedup_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "value")
    )


# --- Joins (SURVEY J3-J7) -------------------------------------------------


@register(
    "op_lookup_join",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber,
           COALESCE(p.p_brand, 'Unknown') AS brand
    FROM lineitem l
    LEFT JOIN (SELECT * FROM part WHERE p_size < 25) p
      ON l.l_partkey = p.p_partkey
    """,
    doc="Key-lookup left join with 'Unknown' sentinel imputation on miss "
    "(SURVEY J3+F6; ref pop_DWH.py:150-155,62-63).",
    tags=("join", "sentinel"),
)
def op_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_size") < 25)
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left").select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce("p_brand", F.lit("Unknown")).alias("brand"),
    )


@register(
    "op_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Anti-join insert-if-absent (SURVEY J4/J5; ref pop_DWH.py:190-205): "
    "customers with no orders.",
    tags=("join",),
)
def op_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "op_semi_join_chain",
    oracle="""
    SELECT c.c_custkey, (SUM(l.l_quantity::DECIMAL(18,4)))::DOUBLE AS total_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY c.c_custkey
    """,
    doc="Nested IN-subquery chain rewritten as join chain + aggregate "
    "(SURVEY J7; ref pop_DWH.py:280-287).",
    tags=("join", "agg"),
)
def op_semi_join_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_qty")
        )
    )


@register(
    "op_surrogate_keys",
    oracle="""
    SELECT p_brand, ROW_NUMBER() OVER (ORDER BY p_brand) AS brand_key
    FROM (SELECT DISTINCT p_brand FROM part)
    """,
    doc="Dense deterministic surrogate keys: row_number over natural-key order "
    "(SURVEY §1.3/§7.4; replaces Postgres IDENTITY, ref DWH_tables.sql:12).",
    tags=("star", "window"),
)
def op_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return (
        p.select("p_brand")
        .distinct()
        .withColumn("brand_key", F.row_number().over(W.orderBy("p_brand")))
    )


# --- Set ops / unions (SURVEY U1/U2) --------------------------------------


@register(
    "op_union_all",
    oracle="""
    SELECT o_orderkey, o_orderpriority, 'urgent' AS bucket
    FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT o_orderkey, o_orderpriority, 'high' AS bucket
    FROM orders WHERE o_orderpriority = '2-HIGH'
    """,
    doc="UNION ALL row construction (SURVEY U1; ref pop_DWH.py:75-128) and "
    "boolean-mask complement split (U2; ref enrich.py:137-148).",
    tags=("setop",),
)
def op_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderpriority", F.lit("urgent").alias("bucket")
    )
    high = o.filter(F.col("o_orderpriority") == "2-HIGH").select(
        "o_orderkey", "o_orderpriority", F.lit("high").alias("bucket")
    )
    return urgent.unionAll(high)


# --- Nested / array restructuring (SURVEY N1/N3, F10-F12) -----------------


@register(
    "op_explode_tokens",
    oracle="""
    SELECT token, COUNT(*) AS cnt
    FROM (
      SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
      FROM documents
    ) t
    GROUP BY token
    HAVING COUNT(*) >= 10
    """,
    doc="Explode array to rows + count (SURVEY N1; ref api_to_neo4j.py:137-142): "
    "document token frequencies.",
    tags=("nested", "text"),
)
def op_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 10)
    )


@register(
    "op_collect_reassemble",
    oracle="""
    SELECT doc_id,
           array_to_string(list_sort(list_distinct(
             regexp_split_to_array(trim(text), '\\s+'))), ' ') AS vocab,
           regexp_split_to_array(trim(text), '\\s+')[1] AS first_tok,
           regexp_split_to_array(trim(text), '\\s+')[-1] AS last_tok
    FROM documents
    """,
    doc="Array reassembly round-trip (SURVEY N3 + F10/F11; ref "
    "api_to_neo4j.py:137-150, transforms.py:32-35): per-doc sorted distinct "
    "vocab + first/last token (element_at semantics).",
    tags=("nested", "text"),
)
def op_collect_reassemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")
    return d.select(
        "doc_id",
        F.array_join(F.array_sort(F.array_distinct(toks)), " ").alias("vocab"),
        F.try_element_at(toks, F.lit(1)).alias("first_tok"),
        F.try_element_at(toks, F.lit(-1)).alias("last_tok"),
    )


@register(
    "op_sequence_dim",
    oracle="""
    SELECT unnest(generate_series(1940, 2030)) AS year_key
    UNION ALL SELECT 0 AS year_key
    """,
    doc="Series-generated dimension seeding incl. sentinel 0 "
    "(SURVEY A9; ref DWH_tables.sql:87-88).",
    tags=("star",),
)
def op_sequence_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    years = spark.range(1940, 2031).select(F.col("id").cast("int").alias("year_key"))
    sentinel = spark.range(1).select(F.lit(0).cast("int").alias("year_key"))
    return years.unionAll(sentinel)


# --- Filters / predicates (SURVEY P1, P5) ---------------------------------


@register(
    "op_regex_filter",
    oracle="""
    SELECT doc_id, n_chars FROM documents
    WHERE NOT regexp_matches(text, '^\\s*(key|agg|data) ')
    """,
    doc="Anchored-regex predicate filter (SURVEY P1; ref transforms.py:8-16 "
    "withdrawn-paper filter): drop docs starting with given tokens.",
    tags=("filter", "regex"),
)
def op_regex_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.filter(~F.col("text").rlike(r"^\s*(key|agg|data) ")).select(
        "doc_id", "n_chars"
    )


@register(
    "op_length_filter",
    oracle="""
    SELECT doc_id, length(text) AS text_len FROM documents
    WHERE length(text) <= 300
    """,
    doc="Length predicate reject filter (SURVEY P5; ref api_to_neo4j.py:126-129).",
    tags=("filter",),
)
def op_length_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.filter(F.length("text") <= 300).select(
        "doc_id", F.length("text").alias("text_len")
    )


# --- Windows (SURVEY W3/W4, top-k) ----------------------------------------


@register(
    "op_running_total",
    oracle="""
    SELECT user_id, event_id,
           (SUM(value::DECIMAL(18,4)) OVER (
              PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE AS running_value
    FROM events
    """,
    doc="Running-total frame (SURVEY W3; g-index cumsum shape, ref metrics.py:93).",
    tags=("window",),
)
def op_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("running_value"),
    )


@register(
    "op_topk_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    ) t WHERE rn <= 3
    """,
    doc="Top-k per group via ranked window (SURVEY W4; argmax family O5).",
    tags=("window", "topk"),
)
def op_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "op_argmax_customer_per_nation",
    oracle="""
    SELECT n_name, top_customer, top_acctbal FROM (
      SELECT n.n_name, c.c_name AS top_customer, c.c_acctbal AS top_acctbal,
             ROW_NUMBER() OVER (PARTITION BY n.n_name
                                ORDER BY c.c_acctbal DESC, c.c_custkey ASC) AS rn
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    ) t WHERE rn = 1
    """,
    doc="argmax-by-score (SURVEY O5; ref openalex.py:97-105 concept argmax), "
    "deterministic tiebreak on custkey.",
    tags=("window", "argmax"),
)
def op_argmax_customer_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    w = W.partitionBy("n_name").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        joined.select(
            "n_name",
            F.col("c_name").alias("top_customer"),
            F.col("c_acctbal").alias("top_acctbal"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# --- Sessionization / event-time (SURVEY T1-T6 batch-equivalents) ---------


@register(
    "op_sessionize",
    oracle="""
    WITH gaps AS (
      SELECT user_id, event_id, ts,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, event_id,
             (SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING))::BIGINT
               AS session_id
      FROM gaps
    )
    SELECT user_id, session_id, COUNT(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
    doc="Sessionization: 30-min-gap lag + cumulative flag (guide 'common OLAP "
    "patterns'; micro-batch semantics SURVEY §2.11).",
    tags=("window", "sessionize"),
)
def op_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros("ts")
    new_session = F.when(
        (micros - F.lag(micros).over(w) > 1_800_000_000)
        | F.lag("ts").over(w).isNull(),
        1,
    ).otherwise(0)
    sess = e.select(
        "user_id",
        "event_id",
        "ts",
        new_session.alias("new_session"),
    ).select(
        "user_id",
        "event_id",
        F.sum("new_session")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("session_id"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )


@register(
    "op_tumbling_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n, (SUM(value::DECIMAL(18,4)))::DOUBLE AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling event-time window aggregate, batch form (streaming twin in "
    "streaming/windows.py; SURVEY §2.11 extension).",
    tags=("window", "events"),
)
def op_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_value"),
        )
    )


@register(
    "op_pivot_event_counts",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click') AS click,
           COUNT(*) FILTER (WHERE event_type = 'view') AS view,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
           COUNT(*) FILTER (WHERE event_type = 'error') AS error
    FROM events GROUP BY user_id
    """,
    doc="Pivot to wide per-type counts (guide pivot pattern).",
    tags=("pivot", "events"),
)
def op_pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    kinds = ["click", "view", "purchase", "signup", "error"]
    return (
        e.groupBy("user_id")
        .pivot("event_type", kinds)
        .count()
        .na.fill(0, kinds)
    )


@register(
    "op_json_extract",
    oracle="""
    SELECT event_type,
           (SUM(regexp_extract(props, '"k": (\\d+)', 1)::INT))::BIGINT AS k_sum
    FROM events GROUP BY event_type
    """,
    doc="JSON field extraction from string payload (SURVEY F23 flatten analog; "
    "ref api_to_neo4j.py:105).",
    tags=("json", "events"),
)
def op_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'"k": (\d+)', 1).cast("int")
    return e.groupBy("event_type").agg(F.sum(k).cast("bigint").alias("k_sum"))


# --- String cleaning functions (SURVEY F1/F3; F4/F5 deltas) ---------------


@register(
    "op_clean_strings",
    oracle="""
    SELECT doc_id,
           substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 40)
             AS norm_prefix,
           substr(regexp_replace(text, '[^A-Za-z0-9]', ' ', 'g'), 1, 40)
             AS clean_title_prefix
    FROM documents
    """,
    doc="String cleaning pair: F1 normalise (lowercase, [a-z0-9] only; ref "
    "transforms.py:5-6) and F3 clean_title (non-alnum -> space; ref "
    "openalex.py:4-9), both truncated to 40 chars. F4/F5 SQL/Cypher quote "
    "escaping is deliberately NOT replicated (SURVEY F5: an artifact of "
    "string-built SQL, not data semantics).",
    tags=("string",),
)
def op_clean_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ut_data_engineering_group_project_2022_spark.functions.text import normalise

    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.substring(normalise("text"), 1, 40).alias("norm_prefix"),
        F.substring(
            F.regexp_replace("text", "[^A-Za-z0-9]", " "), 1, 40
        ).alias("clean_title_prefix"),
    )


# --- Ordered output + limit (SURVEY O2/O4) --------------------------------


@register(
    "op_order_limit",
    oracle="""
    SELECT s_name, s_acctbal FROM supplier
    ORDER BY s_acctbal DESC, s_name ASC
    LIMIT 20
    """,
    doc="ORDER BY DESC with ASC name tiebreaker + LIMIT (SURVEY O2/O4; ref "
    "graph_queries.cyp:16,30 result ordering, enrich.py:88 limit=1). "
    "Deterministic because the tiebreak makes the sort total.",
    tags=("sort", "limit"),
)
def op_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    return (
        s.orderBy(F.desc("s_acctbal"), F.asc("s_name"))
        .select("s_name", "s_acctbal")
        .limit(20)
    )


# --- Array element predicates + array sort (SURVEY P6/P7/O3) --------------


@register(
    "op_array_predicates",
    oracle="""
    SELECT vec_id,
           len(list_filter(embedding, x -> x > 0))::INT AS n_pos,
           embedding[-1]::DOUBLE AS last_val,
           list_sort(embedding)[1]::DOUBLE AS arr_min,
           list_sort(embedding)[-1]::DOUBLE AS arr_max
    FROM embeddings
    """,
    doc="Array element predicate filter (SURVEY P6; ref enrich.py:132), "
    "last-element pick (P7; ref openalex.py:130-132), and array sort "
    "(O3; ref enrich.py:207-208) over the embedding vector column.",
    tags=("array", "embeddings"),
)
def op_array_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    srt = F.array_sort(emb)
    return e.select(
        "vec_id",
        F.size(F.filter(emb, lambda x: x > 0)).cast("int").alias("n_pos"),
        F.try_element_at(emb, F.lit(-1)).cast("double").alias("last_val"),
        F.try_element_at(srt, F.lit(1)).cast("double").alias("arr_min"),
        F.try_element_at(srt, F.lit(-1)).cast("double").alias("arr_max"),
    )


# --- Diagnostics aggregate (SURVEY A8) ------------------------------------


@register(
    "op_failure_count",
    oracle="""
    SELECT lang,
           COUNT(*) FILTER (WHERE n_chars > 800) AS n_failed,
           COUNT(*) AS n_total
    FROM documents GROUP BY lang
    """,
    doc="Failure-count diagnostics aggregate (SURVEY A8; ref "
    "enrich.py:137-139 sum(failed)): per-language count of docs failing "
    "a length gate, alongside the batch total (U2 mask-split shape).",
    tags=("agg", "diagnostics"),
)
def op_failure_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.when(F.col("n_chars") > 800, 1)).alias("n_failed"),
        F.count(F.lit(1)).alias("n_total"),
    )


# --- Skew-resistant two-phase (salted) aggregation ------------------------


@register(
    "op_salted_agg",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           (SUM(value::DECIMAL(18,4)))::DOUBLE AS total_value
    FROM events GROUP BY event_type
    """,
    doc="Two-phase salted aggregation for skewed keys (SURVEY §M7 scale "
    "path; guide skew pattern): phase 1 aggregates on (key, salt) so a "
    "hot key spreads over 16 reducers, phase 2 merges partials per key. "
    "Result is identical to the plain groupBy — the oracle IS the plain "
    "groupBy. events has ~5 distinct types over ~1e5 rows, the classic "
    "low-cardinality-hot-key shape.",
    tags=("agg", "skew"),
)
def op_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    salted = e.withColumn("_salt", F.pmod(F.hash("event_id"), F.lit(16)))
    partial = salted.groupBy("event_type", "_salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("pv"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        F.sum("pv").cast("double").alias("total_value"),
    )


# --- Hierarchical aggregates (extension beyond the reference) -------------


@register(
    "op_rollup_revenue",
    oracle="""
    SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
           COALESCE(o_orderstatus, 'ALL') AS status,
           (SUM(o_totalprice::DECIMAL(18,4)))::DOUBLE AS revenue,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
    doc="ROLLUP hierarchy (priority -> status -> grand total) in one pass "
    "— map-side partial-agg friendly hierarchical totals. The reference "
    "has no grouping sets (SURVEY §2.5 'not present'); this is the "
    "engine's additive OLAP surface.",
    tags=("agg", "rollup"),
)
def op_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "revenue",
            "n_orders",
        )
    )


# --- Analytic offsets + set operations (extensions beyond the reference) --


@register(
    "op_lead_lag_delta",
    oracle="""
    SELECT user_id, event_id,
           (value::DECIMAL(18,4)
            - COALESCE(LAG(value::DECIMAL(18,4))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id),
                       0::DECIMAL(18,4)))::DOUBLE AS delta,
           CASE WHEN LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     IS NULL THEN 1 ELSE 0 END AS is_last
    FROM events
    """,
    doc="LEAD/LAG analytic offsets (absent from the reference, SURVEY "
    "§2.6 'no LEAD/LAG'; additive surface): per-user value delta vs the "
    "previous event and a last-event flag.",
    tags=("window", "events"),
)
def op_lead_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    val = F.col("value").cast("decimal(18,4)")
    return e.select(
        "user_id",
        "event_id",
        (val - F.coalesce(F.lag(val).over(w), F.lit(0).cast("decimal(18,4)")))
        .cast("double")
        .alias("delta"),
        F.when(F.lead("ts").over(w).isNull(), 1).otherwise(0).alias("is_last"),
    )


@register(
    "op_intersect_except",
    oracle="""
    SELECT c_custkey, 'both' AS tag FROM (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    UNION ALL
    SELECT c_custkey, 'only_building' AS tag FROM (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      EXCEPT
      SELECT o_custkey FROM orders
    )
    """,
    doc="INTERSECT / EXCEPT set operations (absent from the reference, "
    "SURVEY §2.8; additive surface): BUILDING customers with an urgent "
    "order, and BUILDING customers with no orders at all.",
    tags=("setop",),
)
def op_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    any_order = o.select(F.col("o_custkey").alias("c_custkey"))
    both = building.intersect(urgent).select(
        "c_custkey", F.lit("both").alias("tag")
    )
    only_b = building.exceptAll(any_order).distinct().select(
        "c_custkey", F.lit("only_building").alias("tag")
    )
    return both.unionAll(only_b)


# --- Temporal / multi-set grouping (additive surface) ---------------------


@register(
    "op_asof_join",
    oracle="""
    WITH p0 AS (
      SELECT user_id, ts, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                ORDER BY event_id DESC) AS rn
      FROM events WHERE event_type = 'purchase'
    ),
    p AS (SELECT user_id, ts, event_id, value FROM p0 WHERE rn = 1),
    c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
    SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
           p.event_id AS purchase_id, p.value AS purchase_value
    FROM c ASOF JOIN p
      ON c.user_id = p.user_id AND p.ts <= c.ts
    """,
    doc="As-of (point-in-time) join: each click matched to the user's most "
    "recent purchase at-or-before it. Spark lacks ASOF JOIN; implemented "
    "as the union-and-carry window (operators/temporal.py — one shuffle, "
    "no range blow-up) and pinned against DuckDB's NATIVE ASOF JOIN, so "
    "the semantics are checked against an independent implementation.",
    tags=("join", "temporal"),
)
def op_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ut_data_engineering_group_project_2022_spark.operators.temporal import (
        asof_join,
    )

    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", "event_id", "value")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    return asof_join(
        clicks,
        purchases.select(
            "user_id",
            "ts",
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("purchase_value"),
        ),
        keys=["user_id"],
        ts_col="click_ts",
        right_payload=["purchase_id", "purchase_value"],
        right_ts_col="ts",
    ).filter(
        # Inner as-of form for the oracle gate: unmatched clicks would emit
        # NULL numerics, which the driver's pandas bridge renders NaN on the
        # DuckDB side only (same representation hazard as HUGEINT).
        F.col("purchase_id").isNotNull()
    ).select("click_id", "user_id", "click_ts", "purchase_id", "purchase_value")


@register(
    "op_grouping_sets",
    oracle="""
    SELECT n.n_name, o.o_orderpriority,
           (SUM(o.o_totalprice::DECIMAL(18,4)))::DOUBLE AS revenue,
           COUNT(*) AS n_orders
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY GROUPING SETS ((n.n_name), (o.o_orderpriority), ())
    """,
    doc="GROUPING SETS: revenue by nation, by priority, and grand total in "
    "one pass (SURVEY §2.5 additive surface; complements op_rollup_revenue). "
    "Spark side uses cube + grouping_id filter — the standard DataFrame "
    "encoding of arbitrary grouping sets; one shuffle, partial aggs intact.",
    tags=("agg", "groupingsets"),
)
def op_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    j = o.join(c, o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    # cube(gid): 0=(both) 1=(n_name) 2=(priority) 3=(); keep sets 1,2,3.
    return (
        j.cube("n_name", "o_orderpriority")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping_id().alias("gid"),
        )
        .filter(F.col("gid").isin(1, 2, 3))
        .select("n_name", "o_orderpriority", "revenue", "n_orders")
    )


@register(
    "op_percentiles",
    oracle="""
    SELECT l_returnflag,
           (quantile_cont(l_quantity, 0.5))::DOUBLE AS p50,
           (quantile_cont(l_quantity, 0.9))::DOUBLE AS p90,
           (quantile_cont(l_extendedprice, 0.99))::DOUBLE AS price_p99
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Exact linear-interpolated percentiles per group (SURVEY §2.5 "
    "additive surface): Spark `percentile` == DuckDB quantile_cont "
    "(probed bit-equal). At 100 TB the swap-in is percentile_approx "
    "(t-digest sketch, mergeable map-side) — same plan shape, bounded "
    "memory; the exact form is the verification baseline.",
    tags=("agg", "percentile"),
)
def op_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("p50"),
        F.expr("percentile(l_quantity, 0.9)").alias("p90"),
        F.expr("percentile(l_extendedprice, 0.99)").alias("price_p99"),
    )


@register(
    "op_range_frame",
    oracle="""
    SELECT event_id, user_id, ts,
           (SUM(value::DECIMAL(18,4)) OVER (
              PARTITION BY user_id ORDER BY ts
              RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ))::DOUBLE AS trailing_1h_value
    FROM events
    """,
    doc="Time-based RANGE window frame (SURVEY §2.6 additive surface): "
    "per-user trailing-1-hour value sum — the sliding-aggregate shape "
    "(rate limits, rolling spend) that ROWS frames can't express. Spark "
    "side ranges over unix_micros with the same inclusive bounds.",
    tags=("window", "events"),
)
def op_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("trailing_1h_value"),
    )


# --- Event-journey analytics (round-2 widening of SURVEY §2.11's
# event-time surface): funnel, cohort retention, hopping windows. These
# are the product-analytics queries an events table exists for; all
# three are user-keyed or hour-keyed shuffles with no global window.


@register(
    "op_funnel",
    oracle="""
    WITH v AS (SELECT user_id, MIN(ts) AS t0 FROM events
               WHERE event_type = 'view' GROUP BY 1),
    c AS (SELECT e.user_id, MIN(e.ts) AS t1 FROM events e
          JOIN v ON v.user_id = e.user_id
          WHERE e.event_type = 'click' AND e.ts > v.t0 GROUP BY 1),
    p AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
          JOIN c ON c.user_id = e.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.t1 GROUP BY 1)
    SELECT 1 AS stage_no, 'view' AS stage, COUNT(*) AS n_users FROM v
    UNION ALL SELECT 2 AS stage_no, 'click' AS stage, COUNT(*) AS n_users FROM c
    UNION ALL SELECT 3 AS stage_no, 'purchase' AS stage, COUNT(*) AS n_users FROM p
    """,
    doc="Ordered conversion funnel view -> click -> purchase: a user "
    "advances a stage only with an event strictly AFTER their first "
    "event of the previous stage. Three user-keyed min-aggregates, "
    "each joined to the prior stage on user_id (the natural co-"
    "partitioned key), then three 1-row counts unioned — no window "
    "over the whole event stream, so the plan is as wide as the "
    "user-id shuffle and nothing else.",
    tags=("events", "funnel"),
)
def op_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )

    def stage(df: DataFrame, no: int, name: str) -> DataFrame:
        return df.agg(
            F.lit(no).alias("stage_no"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_users"),
        )

    return stage(v, 1, "view").unionAll(stage(c, 2, "click")).unionAll(
        stage(p, 3, "purchase")
    )


@register(
    "op_retention_cohorts",
    oracle="""
    WITH f AS (SELECT user_id, MIN(ts::DATE) AS cohort FROM events GROUP BY 1),
    a AS (SELECT DISTINCT user_id, ts::DATE AS d FROM events)
    SELECT f.cohort AS cohort_date,
           COUNT(DISTINCT f.user_id) AS n_users,
           COUNT(DISTINCT CASE WHEN a.d = f.cohort + 1
                               THEN f.user_id END) AS retained_d1,
           COUNT(DISTINCT CASE WHEN a.d >= f.cohort + 7 AND a.d < f.cohort + 14
                               THEN f.user_id END) AS retained_w1,
           COUNT(DISTINCT CASE WHEN a.d >= f.cohort + 28
                               THEN f.user_id END) AS retained_w4
    FROM f JOIN a ON a.user_id = f.user_id
    GROUP BY 1
    """,
    doc="Cohort retention: users grouped by first-activity date; for each "
    "cohort, how many returned the next day / in week 1 (days 7-13) / "
    "at day 28+. First-touch and activity-day sets are both user-keyed "
    "aggregates, joined on user_id (co-partitioned — one shuffle key "
    "end-to-end), then a cohort-keyed count-distinct whose cardinality "
    "is bounded by distinct activity DATES per user, not raw events.",
    tags=("events", "retention"),
)
def op_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    day = F.to_date("ts")
    f = e.groupBy("user_id").agg(F.min(day).alias("cohort"))
    a = e.select("user_id", day.alias("d")).distinct()
    j = f.join(a, "user_id")
    return j.groupBy(F.col("cohort").alias("cohort_date")).agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(
            F.when(F.col("d") == F.date_add("cohort", 1), F.col("user_id"))
        ).alias("retained_d1"),
        F.countDistinct(
            F.when(
                (F.col("d") >= F.date_add("cohort", 7))
                & (F.col("d") < F.date_add("cohort", 14)),
                F.col("user_id"),
            )
        ).alias("retained_w1"),
        F.countDistinct(
            F.when(F.col("d") >= F.date_add("cohort", 28), F.col("user_id"))
        ).alias("retained_w4"),
    )


@register(
    "op_hopping_window",
    oracle="""
    SELECT date_trunc('hour', ts) - o.off * INTERVAL 1 HOUR AS win_start,
           event_type, COUNT(*) AS n,
           (SUM(value::DECIMAL(18,4)))::DOUBLE AS total_value
    FROM events CROSS JOIN (SELECT unnest([0, 1]) AS off) o
    GROUP BY 1, 2
    """,
    doc="Hopping (sliding) event-time window: 2-hour windows advancing "
    "every hour, so each event lands in exactly two windows. Spark side "
    "is the built-in F.window(ts, '2 hours', '1 hour') — the same "
    "construct Structured Streaming uses, so the batch query IS the "
    "streaming query minus the watermark; the oracle replicates each "
    "event to its two hop offsets. Money through DECIMAL(18,4) per the "
    "registry's determinism rule.",
    tags=("events", "window"),
)
def op_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "op_scd2_user_state",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    seg AS (
      SELECT user_id, event_type, ts,
             (SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING))::BIGINT AS segment
      FROM ordered),
    hist AS (
      SELECT user_id, segment, event_type AS state,
             MIN(ts) AS valid_from, COUNT(*) AS n_events
      FROM seg GROUP BY 1, 2, 3)
    SELECT user_id, segment, state, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY segment)
             AS valid_to,
           CASE WHEN LEAD(valid_from) OVER (PARTITION BY user_id
                                            ORDER BY segment) IS NULL
                THEN 1 ELSE 0 END AS is_current,
           n_events
    FROM hist
    """,
    doc="Type-2 slowly-changing-dimension history build (the Type-1 "
    "upsert's sibling — operators/star.py does Type-1; this derives "
    "the full validity-interval history): per-user event-type runs "
    "become [valid_from, valid_to) intervals via a change-flag lag, a "
    "cumulative segment id, and a lead over the collapsed segments. "
    "All three windows partition by user_id — the history build "
    "shuffles once on the natural key and never globally sorts.",
    tags=("events", "scd"),
    bench=True,
)
def op_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    chg = F.when(
        ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
    ).otherwise(0)
    seg = e.select(
        "user_id",
        "event_type",
        "ts",
        F.sum(chg.cast("bigint"))
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("segment"),
    )
    hist = seg.groupBy("user_id", "segment", F.col("event_type").alias("state")).agg(
        F.min("ts").alias("valid_from"), F.count(F.lit(1)).alias("n_events")
    )
    w2 = W.partitionBy("user_id").orderBy("segment")
    lead = F.lead("valid_from").over(w2)
    return hist.select(
        "user_id",
        "segment",
        "state",
        "valid_from",
        lead.alias("valid_to"),
        F.when(lead.isNull(), 1).otherwise(0).alias("is_current"),
        "n_events",
    )


@register(
    "op_range_join_bucketed",
    oracle="""
    SELECT e.event_id AS error_id, e.user_id,
           COUNT(*) AS n_prior_clicks,
           MAX(c.ts) AS last_click_ts
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'error') e
    JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
      ON c.user_id = e.user_id
     AND c.ts >= e.ts - INTERVAL 30 MINUTE
     AND c.ts < e.ts
    GROUP BY 1, 2
    """,
    doc="Bounded range (interval) join: for each error event, the user's "
    "clicks in the preceding 30 minutes. Spark plans a raw ts-inequality "
    "join as a nested-loop cross product; operators/temporal.py:"
    "range_join_bucketed discretizes time into window-width buckets so "
    "the range predicate becomes an EQUI-join on (user_id, bucket) with "
    "a 2x bounded left-side explode and an exact post-filter — hash "
    "shuffle, AQE-skew-eligible, no quadratic blow-up. The oracle is "
    "DuckDB's native inequality join over the same predicate, i.e. an "
    "independent implementation of the range semantics.",
    tags=("join", "temporal", "events"),
)
def op_range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ut_data_engineering_group_project_2022_spark.operators.temporal import (
        range_join_bucketed,
    )

    e = table(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    pairs = range_join_bucketed(
        errors,
        clicks,
        keys=["user_id"],
        left_ts="ts",
        right_ts="ts",
        window_seconds=1800,
    )
    return pairs.groupBy("error_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_prior_clicks"),
        F.max("r_ts").alias("last_click_ts"),
    )


@register(
    "op_key_skew_profile",
    oracle="""
    WITH per_key AS (
      SELECT user_id, COUNT(*) AS n_events,
             (SUM(value::DECIMAL(18,4)))::DOUBLE AS total_value
      FROM events GROUP BY user_id
    ),
    ranked AS (
      SELECT user_id, n_events, total_value,
             ROW_NUMBER() OVER (ORDER BY n_events DESC, user_id) AS rk,
             SUM(n_events) OVER () AS total_n
      FROM per_key
    )
    SELECT user_id, n_events, total_value, rk,
           ROUND(n_events / total_n, 6) AS share,
           ROUND(SUM(n_events) OVER (ORDER BY rk
                                     ROWS UNBOUNDED PRECEDING) / total_n, 6)
             AS cum_share
    FROM ranked
    WHERE rk <= 20
    """,
    doc="Key-skew profiler — the diagnostic you run BEFORE choosing a "
    "partitioning/salting strategy at 100 TB: per-key counts, global "
    "share, and cumulative share of the top-20 heaviest keys. user_id "
    "is a FACT-scale key (10^8+ distinct at 100 TB), so nothing "
    "key-count-sized may cross a global window: the grand total is a "
    "1-row agg broadcast back via crossJoin, the top-20 is "
    "orderBy+limit (TakeOrderedAndProject — per-partition top-k merged "
    "on the driver), and the rank/cum-share windows run over the "
    "20-row result only. Pairs with op_salted_agg, which is the "
    "remediation this profiler motivates.",
    tags=("agg", "diagnostics", "events"),
)
def op_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    per_key = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("double")
        .alias("total_value"),
    )
    total = per_key.agg(F.sum("n_events").alias("total_n"))
    top = (
        per_key.orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(20)
        .crossJoin(F.broadcast(total))
    )
    w_rank = W.orderBy(F.desc("n_events"), F.asc("user_id"))
    w_cum = w_rank.rowsBetween(W.unboundedPreceding, W.currentRow)
    return top.select(
        "user_id",
        "n_events",
        "total_value",
        F.row_number().over(w_rank).alias("rk"),
        F.round(F.col("n_events") / F.col("total_n"), 6).alias("share"),
        F.round(F.sum("n_events").over(w_cum) / F.col("total_n"), 6).alias(
            "cum_share"
        ),
    )


@register(
    "op_percentiles_approx",
    oracle=None,  # rows-only by design: DuckDB's approx_quantile is a
    # different sketch, so cross-engine value hashes can never match;
    # the band-gate vs the exact percentiles lives in tests/.
    doc="The 100 TB swap-in for op_percentiles, run for real: "
    "percentile_approx (t-digest-style sketch, accuracy 10000) per "
    "group — mergeable map-side, bounded memory regardless of group "
    "size, where the exact percentile aggregate must buffer/sort each "
    "group. No SQL oracle by design: DuckDB's approx_quantile is a "
    "different sketch, so cross-engine hashes cannot match; instead "
    "tests/test_scale_plans.py gates the approximation against the "
    "exact form (rank error within the sketch's accuracy contract).",
    tags=("op", "agg", "approx"),
)
def op_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", 0.5, 10000).alias("p50"),
        F.percentile_approx("l_quantity", 0.9, 10000).alias("p90"),
        F.percentile_approx(
            "l_extendedprice", 0.99, 10000
        ).alias("price_p99"),
    )


@register(
    "op_user_burstiness",
    oracle="""
    WITH g AS (
      SELECT user_id,
             (epoch_us(ts) - LAG(epoch_us(ts))
                OVER (PARTITION BY user_id ORDER BY ts, event_id))
               // 1000000 AS gap_s
      FROM events),
    m AS (
      SELECT user_id,
             COUNT(gap_s)::BIGINT AS n,
             SUM(gap_s)::BIGINT AS s1,
             SUM(gap_s * gap_s)::BIGINT AS s2
      FROM g WHERE gap_s IS NOT NULL GROUP BY 1),
    s AS (
      SELECT user_id, n,
             s1::DOUBLE / n AS mean_s,
             sqrt(greatest(0, n::DOUBLE * s2::DOUBLE - s1::DOUBLE * s1::DOUBLE)
                  / (n::DOUBLE * n::DOUBLE)) AS std_s
      FROM m WHERE n >= 2)
    SELECT user_id, n AS n_gaps,
           ROUND(mean_s, 6) AS mean_gap_s,
           ROUND((std_s - mean_s) / (std_s + mean_s), 6) AS burstiness
    FROM s WHERE (std_s + mean_s) > 0
    """,
    doc="Per-user burstiness coefficient B = (sigma - mu)/(sigma + mu) "
    "of inter-event gaps (Goh & Barabasi 2008) — the automation/bot "
    "signal a training-data pipeline uses to down-weight machine "
    "traffic before behavioral data enters a corpus: B -> -1 is "
    "metronomic (scripted), B ~ 0 Poisson-random, B -> 1 heavy-tailed "
    "human bursts. Gaps are exact integer seconds (epoch-microsecond "
    "difference, floor `div` — both engines floor non-negatives "
    "identically); mean/variance come from exact integer (n, sum, "
    "sum-of-squares) moments per user, so the only float ops are the "
    "final division/sqrt with identical expression shapes. One "
    "user-partitioned lag window + one keyed aggregate — no "
    "corpus-grain window, shuffle carries (user x 3) moments.",
    tags=("op", "events", "stats", "diagnostics"),
)
def op_user_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    gap = F.expr("(__us - __prev) div 1000000")
    g = (
        e.select(
            "user_id",
            us.alias("__us"),
            F.lag(us).over(w).alias("__prev"),
        )
        .filter(F.col("__prev").isNotNull())
        .select("user_id", gap.alias("gap_s"))
    )
    m = g.groupBy("user_id").agg(
        F.count("gap_s").cast("bigint").alias("n"),
        F.sum("gap_s").cast("bigint").alias("s1"),
        F.sum(F.col("gap_s") * F.col("gap_s")).cast("bigint").alias("s2"),
    )
    mean_s = F.col("s1").cast("double") / F.col("n")
    # Factors cast to double BEFORE multiplying (the PMI advisory's bug
    # class): s1*s1 in BIGINT wraps silently in Spark around per-user
    # second-sums of ~3e9 where DuckDB would raise instead.
    nd = F.col("n").cast("double")
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    # greatest(0, ...) clamp, mirrored in the oracle: the double form of
    # n*s2 - s1^2 can cancel to a tiny negative for near-constant gaps
    # with large sums, which would be NaN under sqrt (r7 advisory).
    std_s = F.sqrt(F.greatest(F.lit(0.0), nd * s2d - s1d * s1d) / (nd * nd))
    s = m.filter(F.col("n") >= 2).select(
        "user_id", F.col("n").alias("n_gaps"), mean_s.alias("mean_s"), std_s.alias("std_s")
    )
    return s.filter((F.col("std_s") + F.col("mean_s")) > 0).select(
        "user_id",
        "n_gaps",
        F.round("mean_s", 6).alias("mean_gap_s"),
        F.round(
            (F.col("std_s") - F.col("mean_s")) / (F.col("std_s") + F.col("mean_s")), 6
        ).alias("burstiness"),
    )
