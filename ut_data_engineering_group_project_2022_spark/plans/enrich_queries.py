"""Enrichment-layer queries — the reference's clean -> enrich -> merge ->
gender pipeline (ref dags/transforms.py, dags/enrich.py, dags/openalex.py)
run end to end through the REAL operators (operators/transforms.py,
operators/enrich.py) over deterministic arXiv-shaped records synthesized
from `documents.doc_id`, each with a full DuckDB oracle that replays the
same pipeline in SQL.

Covers the SURVEY §2 rows that have library code but had no registry
entry: J9 (zip-merge of author lists), F14 (gender UDF), F15/F16 (name
and affiliation merge scoring), F17/F18 (API field extraction), F19
(display-name heuristics), F20 (reference-DOI collection), F21 (domain
mapping), P1/P2/P6 (withdrawn/projection/array-element predicates),
F2/F11/F12/F13, D1 first-wins dedup — all as oracle-checked queries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ut_data_engineering_group_project_2022_spark.catalog import table
from ut_data_engineering_group_project_2022_spark.functions.gender import join_gender
from ut_data_engineering_group_project_2022_spark.functions.name_gender_data import (
    NAME_GENDER,
)
from ut_data_engineering_group_project_2022_spark.operators import enrich, transforms
from ut_data_engineering_group_project_2022_spark.plans.registry import register

# --------------------------------------------------------------------------
# deterministic raw-record synthesis (identical expressions on both engines)
# --------------------------------------------------------------------------

GIVEN_POOL = ("John", "Maria", "Kim", "Andrea", "Zyx", "David", "Anna", "Robert")
# expected folded labels for the GIVEN_POOL under the vendored
# name_gender_data table (Kim is androgynous, Zyx absent -> unknown);
# pinned by tests/test_enrich.py
GENDER_OF = {
    "John": "male",
    "Maria": "female",
    "Kim": "unknown",
    "Andrea": "female",
    "Zyx": "unknown",
    "David": "male",
    "Anna": "female",
    "Robert": "male",
}


def synthetic_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arXiv-shaped raw batch (ref api_to_neo4j.py:104-108 shape): id,
    title (some with embedded newlines, duplicate pairs), abstract (some
    withdrawn), authors display string, authors_parsed
    array<array<string>> ([family, given, affiliation]), versions
    list-of-structs. All derived from doc_id so the DuckDB oracle can
    regenerate the identical batch."""
    doc = table(spark, sf_dir, "documents").select("doc_id")
    di = F.col("doc_id")
    pair = di - di % 2  # consecutive ids form duplicate pairs (D1 food)

    title = F.concat(
        F.lit("Paper "),
        F.when(di % 7 == 0, F.concat(F.lit("X"), F.lit("\n"), F.lit("Y ")))
        .otherwise(F.lit("")),
        pair.cast("string"),
    )
    abstract = F.when(
        di % 31 == 0, F.lit("  This paper has been withdrawn by the authors")
    ).otherwise(F.concat(F.lit("Abstract "), di.cast("string")))
    a0 = (pair * 7) % 60
    authors = F.concat(F.lit("G"), a0.cast("string"), F.lit(" F"), a0.cast("string"))

    j = F.sequence(F.lit(0), (di % 3).cast("int"))
    aid = lambda jj: (di * 7 + jj * 13) % 60  # noqa: E731
    authors_parsed = F.transform(
        j,
        lambda jj: F.array(
            F.concat(F.lit("F"), aid(jj).cast("string")),
            F.concat(F.lit("G"), aid(jj).cast("string")),
            F.when(aid(jj) % 9 == 0, F.lit("")).otherwise(
                F.concat(F.lit("Institute "), (aid(jj) % 12).cast("string"))
            ),
        ),
    )
    versions = F.transform(
        F.sequence(F.lit(0), (di % 5).cast("int")),
        lambda k: F.struct(
            F.concat(F.lit("v"), (k + 1).cast("string")).alias("version"),
            F.concat(F.lit("2020-01-0"), (k + 1).cast("string")).alias("created"),
        ),
    )
    return doc.select(
        F.format_string("A%06d", di).alias("id"),
        F.col("doc_id"),
        title.alias("title"),
        abstract.alias("abstract"),
        authors.alias("authors"),
        authors_parsed.alias("authors_parsed"),
        versions.alias("versions"),
        F.lit("c").alias("comments"),
        F.lit("l").alias("license"),
        F.lit("u").alias("update_date"),
    )


# DuckDB twin of synthetic_raw, as a CTE body. list_transform over
# range(n) mirrors F.transform over F.sequence (range(n) = [0..n-1],
# sequence(0, n-1) likewise).
_RAW_SQL = """
  SELECT printf('A%06d', doc_id) AS id,
         doc_id,
         'Paper ' || CASE WHEN doc_id % 7 = 0 THEN 'X' || chr(10) || 'Y ' ELSE '' END
                  || (doc_id - doc_id % 2) AS title,
         CASE WHEN doc_id % 31 = 0
              THEN '  This paper has been withdrawn by the authors'
              ELSE 'Abstract ' || doc_id END AS abstract,
         'G' || ((doc_id - doc_id % 2) * 7) % 60
             || ' F' || ((doc_id - doc_id % 2) * 7) % 60 AS authors
  FROM documents
"""

_WITHDRAWN_DUCK = (
    "^[ \\t\\r\\n]+(This|The) (paper|submission|manuscript|work) "
    "(has been|is being|is) withdrawn"
)


@register(
    "enrich_clean_pipeline",
    oracle=f"""
    WITH raw AS ({_RAW_SQL}),
    kept AS (
      SELECT *,
             replace(title, chr(10), '') AS title_clean,
             ROW_NUMBER() OVER (
               PARTITION BY regexp_replace(lower(replace(title, chr(10), '')),
                                           '[^a-z0-9]', '', 'g')
                         || regexp_replace(lower(authors), '[^a-z0-9]', '', 'g')
               ORDER BY id) AS rn
      FROM raw
      WHERE NOT regexp_matches(abstract, '{_WITHDRAWN_DUCK}')
    )
    SELECT id,
           title_clean AS title,
           'v' || (doc_id % 5 + 1) AS latest_version,
           (doc_id % 3 + 1)::INT AS n_authors,
           array_to_string(
             list_transform(range(doc_id % 3 + 1),
                            j -> 'F' || (doc_id * 7 + j * 13) % 60), ',') AS families,
           len(list_filter(range(doc_id % 3 + 1),
                           j -> ((doc_id * 7 + j * 13) % 60) % 9 != 0))::INT
             AS n_with_affiliation
    FROM kept WHERE rn = 1
    """,
    doc="The reference's full clean_dataframe task end to end (ref "
    "transforms.py:37-48): withdrawn regex filter (P1) -> latest_version "
    "(F11) -> column drop (P2) -> newline strip (F2) -> first-wins dedup "
    "on normalise(title)+normalise(authors) (D1/F1) -> author struct "
    "extraction (F12/F13) with empty-affiliation removal (P6). Oracle "
    "replays every stage in SQL.",
    tags=("enrich", "pipeline"),
)
def enrich_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = synthetic_raw(spark, sf_dir)
    cleaned = transforms.clean_dataframe(raw)
    ae = F.col("authors_extracted")
    return cleaned.select(
        "id",
        "title",
        "latest_version",
        F.size(ae).cast("int").alias("n_authors"),
        F.array_join(F.transform(ae, lambda a: a["family"]), ",").alias("families"),
        F.size(F.filter(ae, lambda a: F.size(a["affiliation"]) > 0))
        .cast("int")
        .alias("n_with_affiliation"),
    )


# --------------------------------------------------------------------------
# J9 author-list zip merge + F15/F16 scoring
# --------------------------------------------------------------------------


def _author_struct(aid: Column, flavor: str) -> Column:
    """One synthetic author struct. API flavor: given sometimes empty
    (exercises F15's more-parts-wins), affiliation sometimes missing;
    arXiv flavor: short given, longer affiliations on even aids."""
    if flavor == "api":
        given = F.when(aid % 4 == 0, F.lit("")).otherwise(
            F.concat(F.lit("Given"), aid.cast("string"))
        )
        affil = F.when(aid % 5 == 0, F.array().cast("array<string>")).otherwise(
            F.array(F.concat(F.lit("ApiInst "), aid.cast("string")))
        )
    else:
        given = F.concat(F.lit("G"), aid.cast("string"))
        affil = F.when(aid % 2 == 0,
                       F.array(F.concat(F.lit("ArxInst number "), aid.cast("string")))
                       ).otherwise(F.array().cast("array<string>"))
    return F.struct(
        F.concat(F.lit("F"), aid.cast("string")).alias("family"),
        given.alias("given"),
        affil.alias("affiliation"),
    )


def _synthetic_authorlists(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = table(spark, sf_dir, "documents").select("doc_id")
    di = F.col("doc_id")
    aid = lambda jj: (di * 5 + jj * 11) % 50  # noqa: E731
    api = F.transform(
        F.sequence(F.lit(0), (di % 4).cast("int")),
        lambda jj: _author_struct(aid(jj), "api"),
    )
    arx = F.transform(
        F.sequence(F.lit(0), (di % 3).cast("int")),
        lambda jj: _author_struct(aid(jj), "arx"),
    )
    return doc.select(
        F.format_string("A%06d", di).alias("id"),
        api.alias("authors_api"),
        arx.alias("authors_extracted"),
    )


# DuckDB twin: same structs; struct field order (family, given,
# affiliation) makes list_sort ≡ Spark's sort-by-family comparator
# (families are distinct within each list).
_AUTHORLISTS_SQL = """
  SELECT printf('A%06d', doc_id) AS id, doc_id,
         list_sort(list_transform(range(doc_id % 4 + 1), j -> {
           'family': 'F' || (doc_id * 5 + j * 11) % 50,
           'given': CASE WHEN ((doc_id * 5 + j * 11) % 50) % 4 = 0 THEN ''
                         ELSE 'Given' || (doc_id * 5 + j * 11) % 50 END,
           'affiliation': CASE WHEN ((doc_id * 5 + j * 11) % 50) % 5 = 0
                               THEN []::VARCHAR[]
                               ELSE ['ApiInst ' || (doc_id * 5 + j * 11) % 50] END
         })) AS api,
         list_sort(list_transform(range(doc_id % 3 + 1), j -> {
           'family': 'F' || (doc_id * 5 + j * 11) % 50,
           'given': 'G' || (doc_id * 5 + j * 11) % 50,
           'affiliation': CASE WHEN ((doc_id * 5 + j * 11) % 50) % 2 = 0
                               THEN ['ArxInst number ' || (doc_id * 5 + j * 11) % 50]
                               ELSE []::VARCHAR[] END
         })) AS arx
  FROM documents
"""


@register(
    "enrich_author_merge",
    oracle=f"""
    WITH lists AS ({_AUTHORLISTS_SQL}),
    pairs AS (
      SELECT id, k,
             api[k + 1] AS a, arx[k + 1] AS b
      FROM lists, LATERAL unnest(range(least(len(api), len(arx)))) AS t(k)
    ),
    scored AS (
      SELECT id, k, a, b,
             (CASE WHEN a.family IS NOT NULL AND len(a.family) > 0 THEN 1 ELSE 0 END
              + CASE WHEN a.given IS NOT NULL AND len(a.given) > 0 THEN 1 ELSE 0 END)
               * 1000
              + length(concat_ws(' ', coalesce(a.family, ''), coalesce(a.given, '')))
               AS score_a,
             (CASE WHEN b.family IS NOT NULL AND len(b.family) > 0 THEN 1 ELSE 0 END
              + CASE WHEN b.given IS NOT NULL AND len(b.given) > 0 THEN 1 ELSE 0 END)
               * 1000
              + length(concat_ws(' ', coalesce(b.family, ''), coalesce(b.given, '')))
               AS score_b,
             coalesce(a.affiliation[1], '') AS aff_a,
             coalesce(b.affiliation[1], '') AS aff_b
      FROM pairs
    )
    SELECT id, k::INT AS pos,
           CASE WHEN score_a >= score_b THEN a.family ELSE b.family END AS family,
           CASE WHEN score_a >= score_b THEN a.given ELSE b.given END AS given,
           concat_ws(' ',
             CASE WHEN score_a >= score_b THEN a.given ELSE b.given END,
             CASE WHEN score_a >= score_b THEN a.family ELSE b.family END) AS full_name,
           CASE WHEN length(aff_b) > length(aff_a)
                THEN (CASE WHEN length(aff_b) > 0 THEN aff_b END)
                ELSE (CASE WHEN length(aff_a) > 0 THEN aff_a END) END AS affiliation
    FROM scored
    """,
    doc="J9 zip-merge of sorted author lists with pandas-zip TRUNCATION "
    "semantics (ref enrich.py:194-216), F15 name scoring (more non-empty "
    "parts wins, byte-length tiebreak; ref enrich.py:151-170), F16 "
    "affiliation merge (longer first-affiliation wins; ref "
    "enrich.py:172-190), F9 full-name concat. Runs operators/enrich.py's "
    "merge_authorlists; oracle replays sort+zip+score in SQL.",
    tags=("enrich", "join", "nested"),
)
def enrich_author_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    lists = _synthetic_authorlists(spark, sf_dir)
    merged = enrich.merge_authorlists(
        lists, api_col="authors_api", arxiv_col="authors_extracted"
    )
    return merged.select(
        "id", F.posexplode("authors_merged").alias("pos", "a")
    ).select(
        "id",
        "pos",
        F.col("a.family").alias("family"),
        F.col("a.given").alias("given"),
        F.col("a.full_name").alias("full_name"),
        F.try_element_at(F.col("a.affiliation"), F.lit(1)).alias("affiliation"),
    )


# --------------------------------------------------------------------------
# F14 gender UDF (the designated Python-UDF extension point)
# --------------------------------------------------------------------------

# The vendored table as a VALUES relation, so the oracle replays the
# broadcast-join path (lookup on the lowercased first token + 6->3
# fold) over the exact same few-hundred-row data.
_GENDER_VALUES = ", ".join(
    f"('{n}', '{g}')" for n, g in sorted(NAME_GENDER.items())
)


@register(
    "enrich_gender_assign",
    oracle=f"""
    WITH authors AS (
      SELECT printf('A%06d', doc_id) AS id, k::INT AS pos,
             ['John', 'Maria', 'Kim', 'Andrea', 'Zyx', 'David', 'Anna', 'Robert']
               [(doc_id * 7 + k * 13) % 60 % 8 + 1] AS given
      FROM documents, LATERAL unnest(range(doc_id % 3 + 1)) AS t(k)
    ),
    gt(name, label) AS (VALUES {_GENDER_VALUES})
    SELECT a.id, a.pos, a.given,
           CASE WHEN gt.label IN ('male', 'mostly_male') THEN 'male'
                WHEN gt.label IN ('female', 'mostly_female') THEN 'female'
                ELSE 'unknown' END AS gender
    FROM authors a
    LEFT JOIN gt ON gt.name = lower(split_part(a.given, ' ', 1))
    """,
    doc="F14 gender inference over exploded author rows (ref "
    "enrich.py:44-71, README.md:186: 6 labels folded to 3). r7: the "
    "registered query runs the TABLE-BACKED broadcast-join path "
    "(functions/gender.py:join_gender over the vendored public "
    "name_gender_data table — zero per-row Python, the 100 TB shape); "
    "the Arrow-batched pandas UDF remains the documented extension "
    "point for a real gender_guesser install, pinned equal to the "
    "join path by tests/test_enrich.py. The oracle replays the same "
    "table as a VALUES join with the same fold CASE.",
    tags=("enrich", "udf"),
)
def enrich_gender_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = table(spark, sf_dir, "documents").select("doc_id")
    di = F.col("doc_id")
    pool = F.array(*[F.lit(n) for n in GIVEN_POOL])
    exploded = doc.select(
        F.format_string("A%06d", di).alias("id"),
        "doc_id",
        F.posexplode(F.sequence(F.lit(0), (di % 3).cast("int"))).alias("pos", "k"),
    ).select(
        "id",
        "pos",
        F.element_at(
            pool,
            ((F.col("doc_id") * 7 + F.col("k") * 13) % 60 % 8 + 1).cast("int"),
        ).alias("given"),
    )
    return join_gender(exploded, "given", out_col="gender")


# --------------------------------------------------------------------------
# F17/F18 API field extraction + F19 display-name heuristics + O5 argmax
# --------------------------------------------------------------------------


@register(
    "enrich_field_extract",
    oracle="""
    WITH work AS (
      SELECT printf('A%06d', doc_id) AS id, doc_id,
             CASE WHEN doc_id % 9 = 0 THEN []::VARCHAR[]
                  ELSE ['Journal ' || doc_id % 9] END AS container_title,
             [[1990 + doc_id % 30, doc_id % 12 + 1]] AS date_parts,
             list_transform(range(doc_id % 4 + 1), c -> {
               'name': 'C' || (doc_id + c * 3) % 11,
               'score': ((doc_id * 13 + c * 7) % 100) / 100.0,
               'level': c % 2
             }) AS concepts,
             CASE WHEN (doc_id * 7) % 60 % 2 = 0
                  THEN 'F' || (doc_id * 7) % 60 || ', G' || (doc_id * 7) % 60
                  ELSE 'G' || (doc_id * 7) % 60 || ' M. F' || (doc_id * 7) % 60
             END AS display_name
      FROM documents
    ),
    lvl1 AS (
      SELECT id, list_sort(list_transform(
               list_filter(concepts, c -> c.level = 1),
               c -> {'negscore': -c.score, 'name': c.name})) AS ranked
      FROM work
    )
    SELECT w.id,
           w.container_title[1] AS venue,
           w.date_parts[1][1]::INT AS pub_year,
           w.date_parts[1][2]::INT AS pub_month,
           l.ranked[1].name AS subject,
           CASE WHEN strpos(w.display_name, ',') > 0
                THEN trim(string_split(w.display_name, ',')[1])
                ELSE string_split(w.display_name, ' ')[-1] END AS family,
           CASE WHEN strpos(w.display_name, ',') > 0
                THEN trim(string_split(w.display_name, ',')[2])
                ELSE array_to_string(string_split(w.display_name, ' ')
                       [:len(string_split(w.display_name, ' ')) - 1], ' ')
           END AS given
    FROM work w JOIN lvl1 l USING (id)
    """,
    doc="F17/F18 API-payload field extraction (ref enrich.py:12-41, "
    "openalex.py:85-121): first element of container-title, "
    "published.date-parts -> year/month, level-1 concept argmax -> "
    "subject (O5, ref openalex.py:97-105; tie-break name asc), plus F19 "
    "display-name heuristics (comma form 'family, given' vs space form "
    "'given middle family'; ref openalex.py:63-82).",
    tags=("enrich", "nested"),
)
def enrich_field_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = table(spark, sf_dir, "documents").select("doc_id")
    di = F.col("doc_id")
    container = F.when(di % 9 == 0, F.array().cast("array<string>")).otherwise(
        F.array(F.concat(F.lit("Journal "), (di % 9).cast("string")))
    )
    date_parts = F.array(
        F.array((F.lit(1990) + di % 30).cast("int"), (di % 12 + 1).cast("int"))
    )
    concepts = F.transform(
        F.sequence(F.lit(0), (di % 4).cast("int")),
        lambda c: F.struct(
            F.concat(F.lit("C"), ((di + c * 3) % 11).cast("string")).alias("name"),
            (((di * 13 + c * 7) % 100) / F.lit(100.0)).alias("score"),
            (c % 2).cast("int").alias("level"),
        ),
    )
    a0 = (di * 7) % 60
    display_name = F.when(
        a0 % 2 == 0,
        F.concat(F.lit("F"), a0.cast("string"), F.lit(", G"), a0.cast("string")),
    ).otherwise(
        F.concat(F.lit("G"), a0.cast("string"), F.lit(" M. F"), a0.cast("string"))
    )
    work = doc.select(
        F.format_string("A%06d", di).alias("id"),
        container.alias("container_title"),
        date_parts.alias("date_parts"),
        concepts.alias("concepts"),
        display_name.alias("display_name"),
    )

    # O5 argmax: sort level-1 concepts by (-score, name), take the head.
    lvl1 = F.filter(F.col("concepts"), lambda c: c["level"] == 1)
    ranked = F.array_sort(
        F.transform(
            lvl1,
            lambda c: F.struct((-c["score"]).alias("negscore"), c["name"].alias("name")),
        )
    )
    dn = F.col("display_name")
    comma = F.instr(dn, ",") > 0
    toks = F.split(dn, " ")
    family = F.when(comma, F.trim(F.split(dn, ",")[0])).otherwise(
        F.element_at(toks, -1)
    )
    given = F.when(comma, F.trim(F.split(dn, ",")[1])).otherwise(
        F.array_join(F.slice(toks, 1, F.size(toks) - 1), " ")
    )
    return work.select(
        "id",
        F.try_element_at("container_title", F.lit(1)).alias("venue"),
        F.col("date_parts")[0][0].alias("pub_year"),
        F.col("date_parts")[0][1].alias("pub_month"),
        F.try_element_at(ranked, F.lit(1))["name"].alias("subject"),
        family.alias("family"),
        given.alias("given"),
    )


# --------------------------------------------------------------------------
# F20 reference-DOI collection + P7 non-null array predicate
# --------------------------------------------------------------------------


@register(
    "enrich_reference_dois",
    oracle="""
    WITH refs AS (
      SELECT printf('A%06d', doc_id) AS id, doc_id,
             list_transform(range(doc_id % 5 + 1), r -> CASE
               WHEN (doc_id + r) % 3 = 0 THEN NULL
               ELSE '10.' || (doc_id + r) END) AS dois
      FROM documents
    )
    SELECT id,
           len(list_filter(dois, d -> d IS NOT NULL))::INT AS n_dois,
           -- DuckDB array_to_string([]) is NULL; Spark array_join([]) is ''
           coalesce(array_to_string(list_filter(dois, d -> d IS NOT NULL), ','), '')
             AS doi_list,
           list_filter(dois, d -> d IS NOT NULL)[-1] AS last_doi
    FROM refs
    """,
    doc="F20 collect non-null DOIs from the reference list (ref "
    "enrich.py:74-80, get_references.py:6-12) + P7 non-null element "
    "predicate with last-element pick (ref openalex.py:130-132).",
    tags=("enrich", "nested"),
)
def enrich_reference_dois(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = table(spark, sf_dir, "documents").select("doc_id")
    di = F.col("doc_id")
    refs = doc.select(
        F.format_string("A%06d", di).alias("id"),
        F.transform(
            F.sequence(F.lit(0), (di % 5).cast("int")),
            lambda r: F.struct(
                F.when((di + r) % 3 == 0, F.lit(None).cast("string"))
                .otherwise(F.concat(F.lit("10."), (di + r).cast("string")))
                .alias("doi"),
                F.lit("T").alias("title"),
            ),
        ).alias("reference"),
    )
    collected = enrich.collect_reference_dois(refs)
    dois = F.col("reference_dois")
    return collected.select(
        "id",
        F.size(dois).cast("int").alias("n_dois"),
        F.array_join(dois, ",").alias("doi_list"),
        F.try_element_at(dois, F.lit(-1)).alias("last_doi"),
    )


# --------------------------------------------------------------------------
# F21 domain mapping (lookup join of a literal map)
# --------------------------------------------------------------------------

_DOMAIN_MAP = {
    "click": "engagement",
    "view": "engagement",
    "purchase": "commerce",
    "signup": "growth",
    "error": "reliability",
}


@register(
    "enrich_domain_map",
    oracle="""
    SELECT CASE event_type
             WHEN 'click' THEN 'engagement'
             WHEN 'view' THEN 'engagement'
             WHEN 'purchase' THEN 'commerce'
             WHEN 'signup' THEN 'growth'
             WHEN 'error' THEN 'reliability'
             ELSE 'Unknown' END AS domain,
           COUNT(*) AS n
    FROM events GROUP BY 1
    """,
    doc="F21 category->domain dict mapping as a literal create_map lookup "
    "with 'Unknown' sentinel default (ref old_domain_maps.ipynb cells "
    "0-1; F6 sentinel semantics pop_DWH.py:62-63).",
    tags=("enrich", "map"),
)
def enrich_domain_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    pairs = [x for kv in _DOMAIN_MAP.items() for x in kv]
    m = F.create_map(*[F.lit(x) for x in pairs])
    return (
        e.select(
            F.coalesce(m[F.col("event_type")], F.lit("Unknown")).alias("domain")
        )
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n"))
    )
