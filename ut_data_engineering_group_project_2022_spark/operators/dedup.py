"""Document deduplication operators for large-scale training-data pipelines.

Four families, all pure DataFrame compositions (no Python UDFs, no
driver-side loops — every stage is a distributed shuffle/join):

  * exact:    hash-groupBy on raw text (one shuffle on a 128-bit key);
  * n-gram Jaccard: exact pairwise similarity on k-word shingles — the
    quadratic *baseline* used to verify the sub-quadratic paths;
  * MinHash + LSH: shingle -> 32 minhash permutations -> 8 bands x 4 rows
    -> band-bucket self-join. At 100 TB the band join only pairs documents
    sharing a bucket, replacing the O(n^2) cross join with a skew-aware
    equi-join on (band, signature);
  * SimHash: 48-bit fingerprints; near-dup = small Hamming distance.

All hashing is the md5-based 60-bit primitive (functions/text.py) so the
DuckDB oracle can replicate results bit-for-bit. Permutation params are
(a_i, b_i) = (2i+3, 1000003*i mod p), p = 2^31 - 1; products stay within
int64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ut_data_engineering_group_project_2022_spark.functions.text import (
    HASH_P,
    md5_int60,
    tokens,
    word_shingles,
)

N_PERM = 32
BAND_ROWS = 4
SIMHASH_BITS = 48


def shingle_docs(docs: DataFrame, k: int = 3) -> DataFrame:
    """doc_id + distinct k-word shingle array."""
    return docs.select("doc_id", word_shingles("text", k).alias("shingles"))


def exact_dup_groups(docs: DataFrame) -> DataFrame:
    """Exact dedup: one row per distinct text with keeper id + copy count."""
    return docs.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    )


def pairwise_jaccard(shingled: DataFrame, min_jaccard: float) -> DataFrame:
    """Exact all-pairs shingle Jaccard (quadratic baseline; verification oracle)."""
    a = shingled.select(
        F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")
    )
    b = shingled.select(
        F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")
    )
    pairs = a.join(b, F.col("doc_a") < F.col("doc_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter.cast("double") / union
    return (
        pairs.filter((F.size("sh_a") > 0) & (F.size("sh_b") > 0))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= min_jaccard)
    )


def minhash_signatures(shingled: DataFrame, n_perm: int = N_PERM) -> DataFrame:
    """(doc_id, perm, minh): minimum permuted hash per document per permutation."""
    spark = shingled.sparkSession
    perms = spark.range(n_perm).select(
        F.col("id").alias("perm"),
        (F.lit(2) * F.col("id") + F.lit(3)).alias("a"),
        ((F.col("id") * F.lit(1_000_003)) % F.lit(HASH_P)).alias("b"),
    )
    exploded = shingled.select(
        "doc_id", F.explode("shingles").alias("s")
    ).withColumn("h", md5_int60("s") % F.lit(HASH_P))
    return (
        exploded.join(F.broadcast(perms))
        .groupBy("doc_id", "perm")
        .agg(F.min((F.col("a") * F.col("h") + F.col("b")) % F.lit(HASH_P)).alias("minh"))
    )


def lsh_candidate_pairs(signatures: DataFrame, band_rows: int = BAND_ROWS) -> DataFrame:
    """Band the signature matrix; candidate pairs share any (band, band-sig)."""
    banded = signatures.withColumn(
        "band", F.floor(F.col("perm") / F.lit(band_rows)).cast("bigint")
    )
    bandsig = banded.groupBy("doc_id", "band").agg(
        F.concat_ws(
            "-",
            F.transform(
                F.array_sort(F.collect_list(F.struct("perm", "minh"))),
                lambda x: x["minh"].cast("string"),
            ),
        ).alias("bsig")
    )
    a = bandsig.select(
        F.col("doc_id").alias("doc_a"), "band", F.col("bsig").alias("bsig_a")
    )
    b = bandsig.select(
        F.col("doc_id").alias("doc_b"), F.col("band").alias("band_b"), F.col("bsig").alias("bsig_b")
    )
    return (
        a.join(
            b,
            (F.col("band") == F.col("band_b"))
            & (F.col("bsig_a") == F.col("bsig_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_lsh_dedup(docs: DataFrame, k: int = 3) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: candidates + exact-Jaccard verify."""
    shingled = shingle_docs(docs, k)
    cands = lsh_candidate_pairs(minhash_signatures(shingled))
    sh_a = shingled.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sh_b = shingled.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cands.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .select(
            "doc_a", "doc_b", (inter.cast("double") / union).alias("jaccard")
        )
    )


def simhash_fingerprints(docs: DataFrame, n_bits: int = SIMHASH_BITS) -> DataFrame:
    """48-bit SimHash per document over distinct whitespace tokens."""
    spark = docs.sparkSession
    tok = (
        docs.select("doc_id", F.explode(tokens("text")).alias("t"))
        .distinct()
        .withColumn("h", md5_int60("t"))
    )
    bits = spark.range(n_bits).select(F.col("id").cast("int").alias("i"))
    bitsum = (
        tok.join(F.broadcast(bits))
        .groupBy("doc_id", "i")
        .agg(
            F.sum(
                F.when(F.expr("(h >> i) & 1") == 1, 1).otherwise(-1)
            ).alias("s")
        )
    )
    return bitsum.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("CAST(1 AS BIGINT) << i")).otherwise(0)
        ).alias("simhash48")
    )


def simhash_pairs(fingerprints: DataFrame, max_hamming: int) -> DataFrame:
    """Near-dup pairs by Hamming distance over SimHash fingerprints."""
    a = fingerprints.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash48").alias("fa")
    )
    b = fingerprints.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash48").alias("fb")
    )
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.bit_count(F.expr("fa ^ fb")).cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
