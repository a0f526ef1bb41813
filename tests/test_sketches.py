"""Semantic invariants for the CMS / TF-IDF / edit-distance batch —
properties the oracle diff can't express (one-sided sketch error,
mergeability, DP ground truth)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mspr2_back_spark.operators.dedup import edit_distance_pairs
from mspr2_back_spark.operators.sketches import (
    CMS_WIDTH,
    cms_build,
    cms_estimate,
)
from mspr2_back_spark.plans.sketches import (
    EDIT_MAX_DIST,
    EDIT_PREFIX_LEN,
    TFIDF_TOP_PER_DOC,
    cms_heavy_hitters,
    tfidf_top_terms,
)
from mspr2_back_spark.sources.readers import load_table


def test_cms_estimate_is_one_sided_and_bounded(spark, sf_dir):
    """CMS guarantee: est ≥ exact ALWAYS; and on this corpus the
    average overcount stays within a few times N/width (the
    per-cell expected collision mass)."""
    ev = load_table(spark, sf_dir, "events")
    n_total = ev.count()
    sketch = cms_build(ev, "user_id")
    est = cms_estimate(ev.select("user_id").distinct(), sketch, "user_id")
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact"))
    rows = est.join(exact, "user_id").collect()
    assert rows
    overs = [r.est_count - r.exact for r in rows]
    assert all(o >= 0 for o in overs), "CMS undercounted — hash/min broken"
    assert sum(overs) / len(overs) <= 3 * n_total / CMS_WIDTH


def test_cms_sketches_merge_by_cell_sum(spark, sf_dir):
    """Mergeability: sketch(full) == cell-wise sum of sketches built
    on disjoint halves — the property that makes the operator
    distributable / streamable."""
    ev = load_table(spark, sf_dir, "events")
    full = {(r.h, r.bucket): r.cnt for r in cms_build(ev, "user_id").collect()}
    lo = cms_build(ev.filter(F.col("event_id") % 2 == 0), "user_id").collect()
    hi = cms_build(ev.filter(F.col("event_id") % 2 == 1), "user_id").collect()
    merged: dict = {}
    for r in [*lo, *hi]:
        merged[(r.h, r.bucket)] = merged.get((r.h, r.bucket), 0) + r.cnt
    assert merged == full


def test_tfidf_ranks_are_contiguous_and_monotone(spark, sf_dir):
    out = tfidf_top_terms(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # every doc with tokens appears (corpus texts are non-empty)
    assert len(by_doc) == n_docs
    for rows in by_doc.values():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= TFIDF_TOP_PER_DOC
        scores = [r.tfidf for r in rows]
        assert scores == sorted(scores, reverse=True)
        for r in rows:
            assert r.tfidf > 0 and r.tf >= 1


def test_tfidf_score_formula_spot_check(spark, sf_dir):
    """Recompute one document's top term score from raw tf/df/N."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    top = tfidf_top_terms(spark, sf_dir).filter(F.col("rank") == 1).first()
    toks = docs.select(
        "doc_id", F.explode(F.expr("array_remove(split(text, ' '), '')")).alias("w")
    )
    tf = toks.filter(
        (F.col("doc_id") == top.doc_id) & (F.col("w") == top.word)
    ).count()
    dfc = (
        toks.filter(F.col("w") == top.word).select("doc_id").distinct().count()
    )
    expect = tf * (math.log((n_docs + 1.0) / (dfc + 1.0)) + 1.0)
    assert math.isclose(top.tfidf, expect, rel_tol=0, abs_tol=5e-7)
    assert top.tf == tf


def _dp_levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_edit_distance_matches_dp_and_threshold_binds(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pairs = edit_distance_pairs(
        docs, prefix_len=EDIT_PREFIX_LEN, max_dist=EDIT_MAX_DIST
    ).collect()
    assert pairs, "no near-dup pairs found at this SF"
    texts = {r.doc_id: r.text for r in docs.collect()}
    for r in pairs:
        assert 0 <= r.edit_dist <= EDIT_MAX_DIST
        assert r.doc_id_1 < r.doc_id_2
        assert r.edit_dist == _dp_levenshtein(
            texts[r.doc_id_1], texts[r.doc_id_2]
        )
    # the bound binds: relaxing it admits pairs this query excluded
    wider = edit_distance_pairs(
        docs, prefix_len=EDIT_PREFIX_LEN, max_dist=EDIT_MAX_DIST * 4
    ).collect()
    assert len(wider) > len(pairs), (
        "max_dist never excluded anything — vacuous threshold"
    )


def test_bloom_no_false_negatives_and_fp_visible(spark):
    """Bloom guarantee: every true member passes (no false
    negatives, any SF); at sf0.01 the grid produces at least one
    false positive, so the FP accounting is exercised by real data."""
    from pyspark.sql import functions as F

    from mspr2_back_spark.operators.bloomfilter import bloom_build, bloom_flag
    from mspr2_back_spark.plans.sketches import bloom_prefilter_audit

    sf01 = "/root/testdata/sf0.01"
    c = load_table(spark, sf01, "customer")
    risk = c.filter(F.col("c_acctbal") < 0).select(
        F.col("c_custkey").alias("key")
    )
    bits = bloom_build(risk, "key")
    flagged = bloom_flag(risk, bits, "key").collect()
    assert flagged and all(r.pass_bloom for r in flagged), (
        "a true member failed the filter — broken hash grid"
    )
    audit = bloom_prefilter_audit(spark, sf01).first()
    assert audit.n_false_positive > 0, (
        "no false positive at sf0.01 — FP accounting untested"
    )
    assert audit.n_pass_bloom == audit.n_true_match + audit.n_false_positive
    assert audit.n_true_match <= audit.n_pass_bloom <= audit.n_probe


def test_weighted_sample_exact_k_and_quality_biased(spark, sf_dir):
    """A-ES sampling: exactly K rows, deterministic across reruns,
    and quality-BIASED — the sampled mean quality exceeds the corpus
    mean (that is the point of weighting)."""
    from mspr2_back_spark.functions.text import quality_score_col
    from mspr2_back_spark.plans.sketches import (
        WS_SAMPLE_K,
        weighted_sample_fixed_k,
    )

    a = weighted_sample_fixed_k(spark, sf_dir).collect()
    b = weighted_sample_fixed_k(spark, sf_dir).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == WS_SAMPLE_K
    assert len({r.doc_id for r in a}) == WS_SAMPLE_K  # without replacement
    corpus_mean = (
        load_table(spark, sf_dir, "documents")
        .select(quality_score_col().alias("q"))
        .agg(F.avg("q"))
        .first()[0]
    )
    sample_mean = sum(r.quality_score for r in a) / len(a)
    assert sample_mean > corpus_mean, (
        f"sample mean {sample_mean} not above corpus mean {corpus_mean}"
    )
    # keys are valid u^(1/w) values in (0, 1]
    assert all(0.0 < r.sample_key <= 1.0 for r in a)


def test_surprisal_matches_python_and_separates_rarity(spark, sf_dir):
    """Recompute one document's mean surprisal from raw counts, and
    check the score actually separates: a doc made of rare tokens
    scores above one made of common tokens."""
    from mspr2_back_spark.plans.sketches import unigram_surprisal

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.expr("array_remove(split(text, ' '), '')")).alias("w")
    ).collect()
    vocab: dict[str, int] = {}
    per_doc: dict[int, list] = {}
    for r in toks:
        vocab[r.w] = vocab.get(r.w, 0) + 1
        per_doc.setdefault(r.doc_id, []).append(r.w)
    total = sum(vocab.values())
    out = {r.doc_id: r for r in unigram_surprisal(spark, sf_dir).collect()}
    assert set(out) == set(per_doc)
    expected = {}
    for doc_id, words in per_doc.items():
        terms = [round(-math.log(vocab[w] / total), 6) for w in words]
        expected[doc_id] = sum(terms) / len(terms)
        assert out[doc_id].n_tokens == len(words)
    for doc_id, e in expected.items():
        assert math.isclose(
            out[doc_id].mean_surprisal, e, rel_tol=0, abs_tol=5e-6
        )
    # separation: the most surprising doc really contains rarer tokens
    hi = max(out.values(), key=lambda r: r.mean_surprisal)
    lo = min(out.values(), key=lambda r: r.mean_surprisal)
    mean_c = lambda d: sum(vocab[w] for w in per_doc[d]) / len(per_doc[d])
    assert mean_c(hi.doc_id) < mean_c(lo.doc_id)


def test_datacard_accounting_is_consistent(spark, sf_dir):
    from mspr2_back_spark.plans.sketches import corpus_datacard

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    out = corpus_datacard(spark, sf_dir).collect()
    assert out
    assert sum(r.n_docs for r in out) == n_docs
    # dup-candidate docs across sources == docs in >1-copy
    # prefix-digest groups (non-vacuous at every SF, unlike
    # md5-of-full-text which is zero below sf0.1)
    from mspr2_back_spark.plans.sketches import EDIT_PREFIX_LEN

    h_counts = (
        docs.groupBy(
            F.md5(F.substring("text", 1, EDIT_PREFIX_LEN)).alias("h")
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.sum("c"))
        .first()[0]
    ) or 0
    dup_docs = sum(round(r.dup_candidate_rate * r.n_docs) for r in out)
    assert dup_docs == h_counts
    assert any(r.dup_candidate_rate > 0 for r in out), (
        "no dup-candidate source at this SF — rate column untested"
    )
    for r in out:
        assert 0.0 < r.mean_quality <= 1.0
        assert 0.0 < r.top_lang_share <= 1.0
        assert 0.0 <= r.dup_candidate_rate <= 1.0
        assert r.median_tokens > 0 and r.total_tokens >= r.median_tokens


def test_hll_registers_match_reference_python(spark, sf_dir):
    """The Spark HLL register fold reproduces a straightforward
    Python HLL (md5 → register/rho → max) register-for-register:
    sum_scaled and zero_regs are exact integers, and the estimate
    column applies the shared template to them."""
    import hashlib
    import math

    from mspr2_back_spark.plans.sketches import (
        HLL_M,
        HLL_RHO_MAX,
        HLL_SCALE,
        HLL_SUFFIX_NIBBLES,
        hll_distinct_users,
    )

    out = {r.event_type: r for r in hll_distinct_users(spark, sf_dir).collect()}
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("event_type", "user_id")
        .distinct()
        .collect()
    )
    regs: dict[str, dict[int, int]] = {}
    exact: dict[str, set] = {}
    for r in ev:
        h = hashlib.md5(str(r.user_id).encode()).hexdigest()
        reg = int(h[:2], 16)
        sfx = h[2 : 2 + HLL_SUFFIX_NIBBLES]
        v = int(sfx, 16)
        rho = (
            HLL_RHO_MAX
            if v == 0
            else 4 * HLL_SUFFIX_NIBBLES - v.bit_length() + 1
        )
        by = regs.setdefault(r.event_type, {})
        by[reg] = max(by.get(reg, 0), rho)
        exact.setdefault(r.event_type, set()).add(r.user_id)
    assert set(out) == set(regs)
    for et, by in regs.items():
        zero = HLL_M - len(by)
        sum_scaled = (
            sum(1 << (HLL_RHO_MAX - mj) for mj in by.values())
            + zero * HLL_SCALE
        )
        row = out[et]
        assert row.zero_regs == zero
        assert row.sum_scaled == sum_scaled
        assert row.exact_users == len(exact[et])
        alpha = 0.7213 / (1 + 1.079 / 256)
        raw = alpha * 65536.0 * float(HLL_SCALE) / float(sum_scaled)
        est = 256.0 * math.log(256.0 / zero) if (raw <= 640.0 and zero > 0) else raw
        assert abs(row.hll_estimate - round(est, 3)) < 1e-9
        # m=256 ⇒ RSE ≈ 6.5%; assert a loose 4-sigma envelope so the
        # estimate is demonstrably an estimate OF the exact count
        assert abs(row.hll_estimate - row.exact_users) < 0.26 * row.exact_users + 3


def test_hll_sketch_only_drops_per_user_agg_and_matches_twin(spark, sf_dir):
    """r9 (VERDICT r8 task 3): the registered sketch-only variant is
    the 100 TB shape AS CODE. Spark plans the exact countDistinct
    companion as a two-level aggregate KEYED ON (event_type, user_id)
    — the per-user shuffle shape the sketch exists to avoid (no
    Expand node appears in either plan, so asserting on Expand would
    be vacuous). The differential pin: the full query's plan MUST
    carry a user_id-keyed aggregate and the sketch-only plan MUST
    NOT; sketch columns must equal the full query's
    register-for-register."""
    from mspr2_back_spark.plans.sketches import (
        hll_distinct_users,
        hll_distinct_users_sketch_only,
    )

    def agg_key_lines(df):
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        return [
            line.strip()
            for line in plan.splitlines()
            if line.strip().startswith("Keys") and "user_id" in line
        ]

    full = hll_distinct_users(spark, sf_dir)
    sketch = hll_distinct_users_sketch_only(spark, sf_dir)
    assert agg_key_lines(full), (
        "expected the with_exact companion to plan a (event_type, "
        "user_id)-keyed aggregate — if this disappeared, the "
        "differential below proves nothing"
    )
    assert not agg_key_lines(sketch)
    assert sketch.columns == [
        "event_type",
        "zero_regs",
        "sum_scaled",
        "hll_estimate",
    ]
    full_rows = {
        r.event_type: (r.zero_regs, r.sum_scaled, r.hll_estimate)
        for r in full.collect()
    }
    sketch_rows = {
        r.event_type: (r.zero_regs, r.sum_scaled, r.hll_estimate)
        for r in sketch.collect()
    }
    assert sketch_rows == full_rows


def test_ngram_count_joins_flip_to_shuffle_on_aggregation_key(spark, sf_dir):
    """r10 (VERDICT r9 "What's wrong" #1): the n-gram count joins in
    tfidf_top_terms / unigram_surprisal / bigram_surprisal carry NO
    explicit broadcast hint — a hinted broadcast never flips, and the
    distinct-n-gram relation is a driver OOM at open-vocab 100 TB.
    With broadcasting disabled (the open-vocab stand-in), each count
    join must plan as a genuine shuffle join on the count key; the
    only BroadcastExchange left is the non-foldable-key scalar attach
    (corpus-size/V — 1 row by construction at any scale).

    r19 (VERDICT r18 task 3): tfidf's tf relation and
    bigram_surprisal's bigram-count relation are now MATERIALIZED
    once (persist) because ReuseExchange never fires on this surface —
    each consumer used to re-run its own corpus explode. The pin
    therefore also asserts the single-materialization shape where it
    was ADOPTED: the count relation reaches the plan through
    InMemoryTableScans, and the number of DISTINCT parquet scan nodes
    equals the irreducible corpus-pass count (tfidf 2: tf fill +
    n_docs count; bigram 3: pair fill + pair probe + vocabulary
    scalar). unigram_surprisal keeps its unpersisted 3-scan shape —
    the same persist was measured 0.89x at the 64x corpus and
    rejected (see the docstring at the query). The cached relation's
    consumer-side re-exchange, when EnsureRequirements adds one, is on
    the count-bounded relation — never on the corpus probe side."""
    import re

    from mspr2_back_spark.plans.sketches import (
        bigram_surprisal,
        tfidf_top_terms,
        unigram_surprisal,
    )

    def plan_of(fn):
        df = fn(spark, sf_dir)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        spark.catalog.clearCache()
        return plan

    def pin_count_join(plan: str, key: str) -> None:
        # the count join on `key` plans as a genuine shuffle join …
        shuffle_joins = re.findall(
            rf"\(\d+\) SortMergeJoin[^\n]*\n"
            rf"Left keys \[1\]: \[{key}#\d+\]",
            plan,
        )
        assert len(shuffle_joins) == 1, (
            f"expected exactly one shuffle join keyed on {key}"
        )
        # … and never as a broadcast join (no hint crept back in)
        assert not re.search(
            rf"\(\d+\) BroadcastHashJoin[^\n]*\n"
            rf"Left keys \[1\]: \[{key}#\d+\]",
            plan,
        ), f"the {key} count join must not broadcast at open-vocab scale"

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        old_aqe = spark.conf.get(
            "spark.sql.adaptive.autoBroadcastJoinThreshold"
        )
    except Exception:
        old_aqe = None  # unset: falls back to the non-adaptive conf
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        for fn, keys, n_scans, cached in (
            (tfidf_top_terms, ["word"], 2, True),
            (unigram_surprisal, ["word"], 3, False),
            (bigram_surprisal, ["bigram", "head"], 3, True),
        ):
            plan = plan_of(fn)
            for key in keys:
                pin_count_join(plan, key)
            assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 1, (
                "only the 1-row scalar attach may broadcast when "
                "broadcasting is disabled — a count-relation "
                "BroadcastExchange here means a hint crept back in"
            )
            if cached:
                # single materialization: the count relation is cached
                # and consumed at least twice (fill once, read
                # everywhere)
                its = re.findall(r"\(\d+\) InMemoryTableScan", plan)
                assert len(its) >= 2, (
                    f"{fn.__name__}: expected the materialized count "
                    f"relation to have >= 2 InMemoryTableScan consumers"
                )
            # irreducible corpus passes: DISTINCT scan nodes (the same
            # cached-fill subtree prints once per consumer but shares
            # one node id — it executes once)
            scan_ids = set(re.findall(r"\((\d+)\) Scan parquet", plan))
            assert len(scan_ids) == n_scans, (
                f"{fn.__name__}: expected {n_scans} distinct parquet "
                f"scans, got {len(scan_ids)} — a consumer is re-running "
                "a corpus pass it should read from the cache"
            )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        if old_aqe is not None:
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe
            )
        else:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
