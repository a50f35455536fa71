"""The reference's cleaning/transform layer (ref dags/transforms.py:37-48)
as pure DataFrame stages — SURVEY M1: P1/P2/P5, F1/F2/F11-F13, D1/D2, N1.

Each function is a DataFrame -> DataFrame stage; `clean_dataframe`
composes them in the reference's order (withdrawn filter -> column drop
-> latest version -> newline strip -> dedup -> author extraction).

Reference deltas implemented as *intent* (SURVEY §7.4):
  * the reference's no-op dropna (ref transforms.py:41, result discarded)
    is implemented for real via `drop_null_authors`;
  * D1 keeps the first duplicate in file order — made explicit here with
    an `order_col` argument instead of relying on pandas row order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ut_data_engineering_group_project_2022_spark.functions.text import normalise

# Anchored withdrawn-abstract pattern (ref transforms.py:10-15; Python
# re.match anchors at start, hence the leading ^).
WITHDRAWN_RE = (
    r"^\s+(This|The) (paper|submission|manuscript|work) "
    r"(has been|is being|is) withdrawn"
)

DROP_COLS = ("comments", "abstract", "license", "update_date", "report-no")


def filter_withdrawn(df: DataFrame, col: str = "abstract") -> DataFrame:
    """P1: drop withdrawn papers by anchored regex on the abstract."""
    return df.filter(~F.coalesce(F.col(col), F.lit("")).rlike(WITHDRAWN_RE))


def drop_unused_columns(df: DataFrame, cols: tuple[str, ...] = DROP_COLS) -> DataFrame:
    """P2: early projection (ref transforms.py:39)."""
    return df.drop(*cols)


def latest_version(df: DataFrame) -> DataFrame:
    """F11: last element of the versions list -> its version string
    (ref transforms.py:32-35), e.g. 'v3'."""
    return df.withColumn(
        "latest_version", F.try_element_at("versions", F.lit(-1))["version"]
    )


def strip_newlines(df: DataFrame, cols: tuple[str, ...] = ("title", "authors", "journal-ref")) -> DataFrame:
    """F2: remove newlines from display strings (ref transforms.py:42-44)."""
    out = df
    for c in cols:
        if c in df.columns:
            out = out.withColumn(c, F.regexp_replace(F.col(c), "\n", ""))
    return out


def dedup_first_wins(
    df: DataFrame,
    key_cols: tuple[str, ...] = ("title", "authors"),
    order_col: str = "id",
) -> DataFrame:
    """D1: duplicate iff concat(normalise(cols)) repeats; keep the first
    occurrence in `order_col` order (ref transforms.py:5-6,19-21 — pandas
    kept file order; Spark needs the order made explicit)."""
    key = F.concat(*[normalise(c) for c in key_cols])
    w = W.partitionBy(key).orderBy(order_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def dedup_keep_last(
    df: DataFrame,
    key_cols: tuple[str, ...] = ("title", "authors"),
    recency_col: str = "update_date",
) -> DataFrame:
    """D2: notebook variant — keep the most recent duplicate
    (ref transformations_largejson.ipynb cell 14)."""
    w = W.partitionBy(*key_cols).orderBy(F.desc(recency_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def drop_null_authors(df: DataFrame) -> DataFrame:
    """P4 *intent*: the reference's dropna was a silent no-op
    (ref transforms.py:41, not reassigned); implemented for real."""
    return df.na.drop(subset=["authors"])


def _extract_author(a: Column) -> Column:
    """F12: [family, given, *affils] -> struct, empty-string affils removed
    (ref transforms.py:23-27)."""
    affils = F.filter(F.slice(a, 3, 100), lambda x: F.length(x) > 0)
    return F.struct(
        F.try_element_at(a, F.lit(1)).alias("family"),
        F.try_element_at(a, F.lit(2)).alias("given"),
        affils.alias("affiliation"),
    )


def extract_authors(df: DataFrame, src: str = "authors_parsed") -> DataFrame:
    """F13: map F12 over the parsed-author array (ref transforms.py:29-30)."""
    return df.withColumn(
        "authors_extracted", F.transform(F.col(src), _extract_author)
    )


def reject_overlong_titles(
    df: DataFrame, max_len: int = 1000
) -> tuple[DataFrame, DataFrame]:
    """P5 + U2: split one batch into (accepted, rejected) on title length
    (ref api_to_neo4j.py:126-135); rejected rows feed the dead-letter sink."""
    ok = F.length(F.coalesce(F.col("title"), F.lit(""))) <= max_len
    return df.filter(ok), df.filter(~ok)


def explode_authors(df: DataFrame, src: str = "authors_merged") -> DataFrame:
    """N1: one row per (paper, author), struct fields as columns
    (ref api_to_neo4j.py:137-142)."""
    return df.select("id", F.explode(src).alias("_a")).select("id", "_a.*")


def prepare_for_staging(enriched: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The reference's prepare_for_staging task (ref api_to_neo4j.py:121-150):
    split one enriched batch into the two staging shapes — the 10-column
    main table (P3 projection) and the exploded per-author table (N1),
    with the affiliation flattened to its first element (N2 *intent*;
    the reference's iterrows write-back was a no-op, SURVEY §7.4)."""
    main = enriched.select(
        F.col("published-year"),
        "subject",
        "type",
        F.col("container-title"),
        "publisher",
        "id",
        "doi",
        "title",
        F.col("latest_version").alias("versions"),
        F.col("is-referenced-by-count"),
    )
    authors = explode_authors(enriched).select(
        "given",
        "family",
        # try_element_at: empty affiliation list -> null (ANSI-safe; the
        # reference's `lst[0] if list` intent, ref api_to_neo4j.py:144-146)
        F.try_element_at("affiliation", F.lit(1)).alias("affiliation"),
        "gender",
        "full_name",
        "id",
    )
    return main, authors


def clean_dataframe(df: DataFrame) -> DataFrame:
    """The reference's clean_dataframe task (ref transforms.py:37-48):
    withdrawn filter -> drop cols -> latest_version -> newline strip ->
    dedup(first) -> author struct extraction."""
    out = filter_withdrawn(df)
    out = latest_version(out)
    out = drop_unused_columns(out)
    out = strip_newlines(out)
    out = dedup_first_wins(out)
    out = drop_null_authors(out)
    out = extract_authors(out)
    return out
