"""F14 gender paths: the vendored-table broadcast join (the registered
query's path) must be name-for-name equal to the Arrow pandas-UDF
extension point, which applies the same 6->3 fold over the same table
(VERDICT r6 'Next round' #5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ut_data_engineering_group_project_2022_spark.functions import gender
from ut_data_engineering_group_project_2022_spark.functions.name_gender_data import (
    NAME_GENDER,
)

_FOLD = {
    "male": "male",
    "mostly_male": "male",
    "female": "female",
    "mostly_female": "female",
    "andy": "unknown",
}


def test_table_labels_are_valid_and_lowercase():
    assert NAME_GENDER, "vendored table must not be empty"
    assert len(NAME_GENDER) >= 300, "curated subset should be a few hundred rows"
    for name, label in NAME_GENDER.items():
        assert name == name.lower(), name
        assert " " not in name, name
        assert label in _FOLD, (name, label)


def test_udf_python_kernel_folds_table_labels():
    # the UDF's python kernel applies exactly the documented fold over
    # the vendored table (plus unknown for absent / empty / None)
    for name, label in NAME_GENDER.items():
        assert gender.infer_gender_py(name) == _FOLD[label], name
        # capitalization and trailing tokens are irrelevant
        assert gender.infer_gender_py(name.capitalize() + " Xyz") == _FOLD[label]
    assert gender.infer_gender_py("zzz-not-a-name") == "unknown"
    assert gender.infer_gender_py("") == "unknown"
    assert gender.infer_gender_py(None) == "unknown"


def test_broadcast_join_path_matches_udf_path(spark):
    # every table name + an unknown + empty + NULL + multi-token forms,
    # through BOTH paths on the same frame
    names = (
        sorted(NAME_GENDER)
        + [n.capitalize() + " Q. Public" for n in list(sorted(NAME_GENDER))[:25]]
        + ["Zyx", "", None]
    )
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "i int, given string"
    )
    joined = {
        r["i"]: r["gender"]
        for r in gender.join_gender(df, "given").collect()
    }
    udfed = {
        r["i"]: r["g"]
        for r in df.select(
            "i", gender.with_gender("given").alias("g")
        ).collect()
    }
    assert joined == udfed
    assert joined[len(names) - 3] == "unknown"  # Zyx
    assert joined[len(names) - 2] == "unknown"  # empty
    assert joined[len(names) - 1] == "unknown"  # NULL


def test_given_pool_expected_labels_match_table():
    # the star/enrich oracles bake GENDER_OF into their expectations;
    # pin it against the vendored table's fold-down
    from ut_data_engineering_group_project_2022_spark.plans.enrich_queries import (
        GENDER_OF,
    )

    for name, expect in GENDER_OF.items():
        assert gender.infer_gender_py(name) == expect, name


def test_join_gender_broadcasts_the_lookup(spark):
    df = spark.createDataFrame([(1, "John")], "i int, given string")
    plan = gender.join_gender(df, "given")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan
