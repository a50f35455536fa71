"""Text ML operators: distributed train+score programs over document
frames (the statistical siblings of the heuristic signals in
functions/text.py). Reusable DataFrame-to-DataFrame transforms — the
query registry wires them to the `documents` table in plans/llm_ops.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def langid_trigram(d: DataFrame) -> DataFrame:
    """Train per-language char-trigram profiles on ``d`` (doc_id, text,
    lang) and classify every row; see llm_langid_trigram. Exposed
    separately so closed-form tests can run it on hand-built corpora
    with real language separation (the synthetic documents table
    shares one vocabulary across langs, capping in-corpus accuracy)."""
    from pyspark.sql import Window as W

    low = F.lower("text")
    tg = F.when(
        F.length(low) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.length(low) - 2),
            lambda i: F.substr(low, i, F.lit(3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    occ = d.select("doc_id", "lang", F.explode(tg).alias("g"))
    model = occ.groupBy(F.col("lang").alias("m_lang"), "g").agg(
        F.count(F.lit(1)).alias("c")
    )
    nl = model.groupBy("m_lang").agg(F.sum("c").alias("n"))
    v = model.agg(F.countDistinct("g").alias("v"))
    lp = (
        model.join(F.broadcast(nl), "m_lang")
        .crossJoin(F.broadcast(v))
        .select(
            "m_lang",
            "g",
            F.round(
                F.log((F.col("c") + 1).cast("double") / (F.col("n") + F.col("v"))),
                6,
            )
            .cast("decimal(18,6)")
            .alias("logp"),
        )
    )
    floors = nl.crossJoin(F.broadcast(v)).select(
        "m_lang",
        F.round(F.log(F.lit(1.0) / (F.col("n") + F.col("v"))), 6)
        .cast("decimal(18,6)")
        .alias("fl"),
    )
    matched = (
        occ.join(lp, "g")
        .groupBy("doc_id", "lang", "m_lang")
        .agg(F.sum("logp").alias("sm"), F.count(F.lit(1)).alias("m"))
    )
    dt = occ.groupBy("doc_id", "lang").agg(F.count(F.lit(1)).alias("t"))
    # Unseen trigrams score the smoothing FLOOR ln(1/(n_l+V)) — without
    # this the argmax inverts (fewer matched terms = less negative sum).
    scored = (
        dt.crossJoin(F.broadcast(floors))
        .join(matched, ["doc_id", "m_lang"], "left")
        .select(
            "doc_id",
            dt["lang"].alias("lang"),
            "m_lang",
            (
                F.coalesce("sm", F.lit(0).cast("decimal(18,6)"))
                + (F.col("t") - F.coalesce("m", F.lit(0))) * F.col("fl")
            ).alias("s"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("s"), F.asc("m_lang"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "lang",
            F.col("m_lang").alias("predicted"),
            (F.col("m_lang") == F.col("lang")).alias("correct"),
        )
    )
