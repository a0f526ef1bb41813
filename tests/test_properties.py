"""Property-based tests (hypothesis) for the semantic traps in
SURVEY §5.4 / §7.4: lag-diff reconstruction, bucketed totals
preservation, explode cardinality, dedup/upsert algebra.

Each property runs a real Spark plan on generated data — examples are
capped small because every example is a Spark job; the properties,
not the data volume, carry the coverage.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from mspr2_back_spark.operators.crud import upsert
from mspr2_back_spark.operators.dedup import exact_duplicates

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

series = st.lists(
    st.integers(min_value=0, max_value=10**6), min_size=1, max_size=30
)


@given(cumulative=series.map(sorted))
@_settings
def test_lag_diff_reconstructs_cumulative(spark, cumulative):
    """W1 (ref app/etl.py:122-131): daily = cum - lag(cum); the sum of
    derived dailies (with the first value as seed) equals the last
    cumulative — no counts invented or lost."""
    rows = [(i, int(c)) for i, c in enumerate(cumulative)]
    df = spark.createDataFrame(rows, "day int, cum long")
    win = W.orderBy("day")
    daily = df.select(
        F.coalesce(F.col("cum") - F.lag("cum").over(win), F.col("cum")).alias("daily")
    )
    total = daily.agg(F.sum("daily")).first()[0]
    assert total == cumulative[-1]


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=365 * 3),  # day offset
            st.integers(min_value=-1000, max_value=1000),
        ),
        min_size=1,
        max_size=40,
    )
)
@_settings
def test_week_buckets_preserve_grand_total(spark, rows):
    """A2/F2 (ref app/etl.py:111-117): rebucketing by date_trunc(week)
    must preserve the grand total exactly."""
    df = spark.createDataFrame(rows, "day_offset int, v long").select(
        F.date_add(F.lit("2020-01-01").cast("date"), F.col("day_offset")).alias("d"),
        "v",
    )
    weekly = df.groupBy(F.date_trunc("week", "d").alias("w")).agg(
        F.sum("v").alias("wv")
    )
    assert weekly.agg(F.sum("wv")).first()[0] == sum(v for _, v in rows)


@given(
    arrays=st.lists(
        st.lists(st.text(alphabet="abc", max_size=3), max_size=5),
        min_size=1,
        max_size=15,
    )
)
@_settings
def test_explode_preserves_element_count(spark, arrays):
    """F7 (ref app/etl.py:137): explode emits exactly one row per
    array element."""
    df = spark.createDataFrame([(a,) for a in arrays], "arr array<string>")
    n = df.select(F.explode("arr")).count()
    assert n == sum(len(a) for a in arrays)


@given(
    base=st.dictionaries(
        st.integers(min_value=0, max_value=20),
        st.integers(min_value=-(2**62), max_value=2**62),
        max_size=15,
    ),
    updates=st.dictionaries(
        st.integers(min_value=0, max_value=20),
        st.integers(min_value=-(2**62), max_value=2**62),
        max_size=15,
    ),
)
@_settings
def test_upsert_is_dict_merge(spark, base, updates):
    """upsert == dict-merge semantics, and applying the same updates
    twice is idempotent."""
    if not base and not updates:
        return
    bdf = spark.createDataFrame(list(base.items()) or [(None, None)], "k int, v long").filter(
        F.col("k").isNotNull()
    )
    udf_ = spark.createDataFrame(list(updates.items()) or [(None, None)], "k int, v long").filter(
        F.col("k").isNotNull()
    )
    once = upsert(bdf, udf_, ["k"])
    twice = upsert(once, udf_, ["k"])
    expected = {**base, **updates}
    assert {r.k: r.v for r in once.collect()} == expected
    assert {r.k: r.v for r in twice.collect()} == expected


@given(
    texts=st.lists(st.text(alphabet="xy ", min_size=0, max_size=8), min_size=1, max_size=20)
)
@_settings
def test_exact_dedup_partitions_corpus(spark, texts):
    """exact_duplicates: the multiplicity column sums to the corpus
    size and every group's keeper is one of its members."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    groups = exact_duplicates(df).collect()
    assert sum(g.n_copies for g in groups) == len(texts)
    assert len(groups) == len(set(texts))


# As-of join vs pandas merge_asof: independent reference semantics.
_asof_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),        # key
        st.integers(min_value=0, max_value=500),      # minute offset
    ),
    min_size=1,
    max_size=15,
)


@given(left_rows=_asof_rows, right_rows=_asof_rows, values=st.data())
@_settings
def test_asof_join_matches_pandas_merge_asof(spark, left_rows, right_rows, values):
    """asof_join (union + ordered-carry composition) must agree with
    pandas merge_asof(direction='backward') under the tolerance shift
    right.ts + tol <= left.ts, including NULL right values (carried,
    not skipped) and the unique-(key, ts) precondition."""
    import pandas as pd

    from mspr2_back_spark.operators.asof import asof_join

    base = pd.Timestamp("2024-01-01 00:00:00")
    left_pd = pd.DataFrame(
        {
            "k": [k for k, _ in left_rows],
            "ts": [base + pd.Timedelta(minutes=m) for _, m in left_rows],
        }
    ).drop_duplicates(["k", "ts"])
    right_unique = {(k, m) for k, m in right_rows}
    right_pd = pd.DataFrame(
        {
            "k": [k for k, _ in sorted(right_unique)],
            "ts": [base + pd.Timedelta(minutes=m) for _, m in sorted(right_unique)],
            "v": [
                values.draw(st.one_of(st.none(), st.floats(0, 100, allow_nan=False)))
                for _ in right_unique
            ],
        }
    )
    tol = pd.Timedelta(minutes=10)

    left = spark.createDataFrame(left_pd)
    right = spark.createDataFrame(right_pd, "k long, ts timestamp, v double")
    got = {
        (r.k, pd.Timestamp(r.ts)): r.asof_value
        for r in asof_join(left, right, "k", "ts", "v", "10 minutes").collect()
    }

    shifted = right_pd.assign(ts=right_pd["ts"] + tol).sort_values(["ts", "k"])
    expected_df = pd.merge_asof(
        left_pd.sort_values(["ts", "k"]),
        shifted,
        on="ts",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    )
    expected = {
        (r.k, pd.Timestamp(r.ts)): (None if pd.isna(r.v) else r.v)
        for r in expected_df.itertuples()
    }
    assert got == expected


@given(
    docs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # source id
            st.lists(
                st.sampled_from("aa bb cc dd ee ff gg hh".split()),
                min_size=0,
                max_size=12,
            ),
        ),
        min_size=1,
        max_size=25,
    ),
    budget=st.integers(min_value=1, max_value=60),
)
@_settings
def test_token_budget_sample_properties(spark, docs, budget):
    """token_budget_sample (r4): kept tokens per source never exceed
    the budget; membership is deterministic and a subset of the
    corpus; empty-text docs cost 0 tokens and never break adherence."""
    from mspr2_back_spark.operators.sampling import token_budget_sample

    rows = [
        (i, f"src{s}", " ".join(words)) for i, (s, words) in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    kept = token_budget_sample(df, budget).collect()
    per_source: dict[str, int] = {}
    ids = set()
    for r in kept:
        per_source[r.source] = per_source.get(r.source, 0) + r.n_tokens
        ids.add(r.doc_id)
    assert ids <= {r[0] for r in rows}
    for source, total in per_source.items():
        assert total <= budget, (source, total)
    again = {r.doc_id for r in token_budget_sample(df, budget).collect()}
    assert again == ids


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from("w1 w2 w3 w4 w5 w6".split()),
            min_size=0,
            max_size=10,
        ),
        min_size=2,
        max_size=12,
    ),
    cap=st.integers(min_value=1, max_value=20),
)
@_settings
def test_ngram_jaccard_cap_subset_property(spark, texts, cap):
    """ngram_jaccard_pairs (r4 rework): for ANY cap, every emitted
    pair carries the exact uncapped Jaccard value (the hot-set
    correction), and a cap >= n_docs (no shingle can exceed it) is a
    strict no-op — including the empty-hot-set broadcast edge."""
    from mspr2_back_spark.operators.dedup import ngram_jaccard_pairs

    rows = [(i, " ".join(ws)) for i, ws in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {
        (r.doc_id_1, r.doc_id_2): r.jaccard
        for r in ngram_jaccard_pairs(df, 0.3).collect()
    }
    capped = {
        (r.doc_id_1, r.doc_id_2): r.jaccard
        for r in ngram_jaccard_pairs(df, 0.3, max_doc_freq=cap).collect()
    }
    for pair, j in capped.items():
        assert pair in exact and abs(j - exact[pair]) < 1e-12, pair
    generous = {
        (r.doc_id_1, r.doc_id_2): r.jaccard
        for r in ngram_jaccard_pairs(
            df, 0.3, max_doc_freq=len(rows)
        ).collect()
    }
    assert generous == exact


values6 = st.lists(
    st.integers(min_value=-10**6, max_value=10**6).map(lambda v: v / 100.0),
    min_size=2,
    max_size=25,
)


@given(ys=values6)
@_settings
def test_ewma_template_matches_python_fold(spark, ys):
    """The shared EWMA step template, folded by Spark's aggregate()
    over an arbitrary series, equals the python recursion — the
    template is correct for ANY input, not just the corpus."""
    import math

    from mspr2_back_spark.plans.timeseries import EWMA_ALPHA, ewma_step_sql

    df = spark.createDataFrame([(ys,)], "ys array<double>")
    got = df.select(
        F.expr(
            "aggregate(slice(ys, 2, greatest(size(ys) - 1, 0)),"
            f" get(ys, 0), (acc, x) -> {ewma_step_sql()})"
        ).alias("e")
    ).first()[0]
    acc = ys[0]
    for y in ys[1:]:
        acc = acc * (1 - EWMA_ALPHA) + y * EWMA_ALPHA
    assert math.isclose(got, acc, rel_tol=1e-12, abs_tol=1e-12)


@given(ys=values6)
@_settings
def test_trend_templates_match_numpy_ols(spark, ys):
    """The OLS slope/intercept templates over moment columns equal
    numpy.polyfit for arbitrary series (x = 0..n-1)."""
    import math

    import numpy as np

    from mspr2_back_spark.plans.timeseries import (
        trend_intercept_sql,
        trend_slope_sql,
    )

    n = len(ys)
    xs = list(range(n))
    rows = [(float(x), float(y)) for x, y in zip(xs, ys)]
    df = spark.createDataFrame(rows, "x double, y double")
    moments = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    r = moments.select(
        F.expr(trend_slope_sql()).alias("slope"),
        F.expr(trend_intercept_sql()).alias("icept"),
    ).first()
    if n * sum(x * x for x in xs) - sum(xs) ** 2 == 0:
        return  # degenerate x spread (n < 2 never happens here)
    slope, icept = np.polyfit(np.array(xs, float), np.array(ys, float), 1)
    assert math.isclose(r.slope, slope, rel_tol=1e-6, abs_tol=1e-6)
    assert math.isclose(r.icept, icept, rel_tol=1e-6, abs_tol=1e-4)


@given(
    counts=st.lists(
        st.integers(min_value=0, max_value=10**6), min_size=8, max_size=8
    )
)
@_settings
def test_zscore_template_matches_numpy(spark, counts):
    """The trailing-window z template over integer window sums equals
    numpy's (x - mean)/std (ddof=1) for any 7-day history."""
    import math

    import numpy as np

    from mspr2_back_spark.plans.timeseries import zscore_sql

    *window, x = counts
    sd = float(np.std(window, ddof=1))
    df = spark.createDataFrame(
        [(int(x), int(sum(window)), int(sum(v * v for v in window)))],
        "n_events long, sum_w long, ss_w long",
    )
    got = df.select(F.expr(zscore_sql()).alias("z")).first()[0]
    if sd == 0.0:
        assert got is None  # NULLIF guard
    else:
        expect = (x - float(np.mean(window))) / sd
        assert math.isclose(got, round(expect, 6), rel_tol=0, abs_tol=2e-6)


@given(
    members=st.sets(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=40),
    probes=st.sets(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=40),
)
@_settings
def test_bloom_filter_properties(spark, members, probes):
    """For ANY key sets: no member is rejected (zero false
    negatives), and a filter built on a union equals the
    union().distinct() merge of per-half filters."""
    from mspr2_back_spark.operators.bloomfilter import bloom_build, bloom_flag

    mdf = spark.createDataFrame([(k,) for k in members], "key long")
    pdf = spark.createDataFrame(
        [(k,) for k in members | probes], "key long"
    )
    bits = bloom_build(mdf, "key")
    flags = {r.key: r.pass_bloom for r in bloom_flag(pdf, bits, "key").collect()}
    for k in members:
        assert flags[k], f"member {k} rejected — false negative"
    # mergeability: union-of-halves == filter-of-union
    ms = sorted(members)
    half = len(ms) // 2
    lo = spark.createDataFrame([(k,) for k in ms[:half]] or [(None,)], "key long").dropna()
    hi = spark.createDataFrame([(k,) for k in ms[half:]], "key long")
    merged = sorted(
        map(tuple, bloom_build(lo, "key").union(bloom_build(hi, "key")).distinct().collect())
    )
    direct = sorted(map(tuple, bits.collect()))
    assert merged == direct


# --- codec round-trip properties (r7) -------------------------------------
# pure-Python/numpy — no Spark job per example, so examples are cheap

_img_shapes = st.tuples(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
)


@settings(max_examples=40, deadline=None)
@given(shape=_img_shapes, seed=st.integers(0, 2**31 - 1),
       ftype=st.integers(0, 4))
def test_png_roundtrip_property(shape, seed, ftype):
    """encode_png(filter_type=f) ∘ decode_png is the IDENTITY for any
    image shape and any scanline filter — PNG is lossless, so this is
    bit-equality, not a bound."""
    import numpy as np

    from mspr2_back_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
    px, meta = decode_png(encode_png(img, filter_type=ftype))
    assert meta["width"] == shape[1] and meta["height"] == shape[0]
    assert np.array_equal(px, img)


@settings(max_examples=25, deadline=None)
@given(shape=_img_shapes, seed=st.integers(0, 2**31 - 1))
def test_bmp_roundtrip_property(shape, seed):
    import numpy as np

    from mspr2_back_spark.operators.multimodal import decode_bmp, encode_bmp

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
    px, meta = decode_bmp(encode_bmp(img))
    assert (meta["width"], meta["height"]) == (shape[1], shape[0])
    assert np.array_equal(px, img)


@settings(max_examples=15, deadline=None)
@given(shape=_img_shapes, seed=st.integers(0, 2**31 - 1),
       sub=st.sampled_from(["444", "420"]))
def test_jpeg_q100_bounded_error_property(shape, seed, sub):
    """JPEG at quality=100 (all-ones quant tables) must reconstruct
    ANY image within the DCT + YCbCr rounding floor — a lossy codec's
    strongest checkable property. 4:2:0 averages chroma 2×2, so only
    the luma-ish bound holds there; check the exact bound for 4:4:4
    and a luma-projected bound for 4:2:0."""
    import numpy as np

    from mspr2_back_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    if sub == "444":
        img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
        px, meta = decode_jpeg(encode_jpeg(img, quality=100, subsampling=sub))
        assert (meta["width"], meta["height"]) == (shape[1], shape[0])
        assert np.abs(px.astype(int) - img.astype(int)).max() <= 4
    else:
        # 4:2:0 averages chroma 2×2, so per-pixel RGB is NOT preserved
        # on noise; what IS preserved is luma — but only away from the
        # gamut boundary (clipping of out-of-gamut RGB after chroma
        # averaging distorts the luma projection), so generate
        # in-gamut pixels and check the Rec.601 projection bound
        img = rng.integers(64, 192, size=(*shape, 3), dtype=np.uint8)
        px, meta = decode_jpeg(encode_jpeg(img, quality=100, subsampling=sub))
        assert (meta["width"], meta["height"]) == (shape[1], shape[0])

        def luma(a):
            return (
                0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]
            )

        assert np.abs(luma(px.astype(float)) - luma(img.astype(float))).max() <= 6


@given(
    dtype_i=st.integers(min_value=0, max_value=3),
    n=st.integers(min_value=1, max_value=40),
    channels=st.integers(min_value=1, max_value=3),
    rate=st.sampled_from([8000, 16000, 44100]),
    pre=st.lists(st.integers(min_value=0, max_value=9), max_size=3),
    post=st.lists(st.integers(min_value=0, max_value=9), max_size=3),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    extensible=st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip_identity_any_chunk_layout(
    dtype_i, n, channels, rate, pre, post, seed, extensible
):
    """Property (r10; r11 adds the EXTENSIBLE axis): encode_wav ->
    decode_wav is the identity for EVERY dtype (8/16/32-bit PCM and
    IEEE float32), any channel count, ANY surrounding chunk layout —
    arbitrary pre-fmt and post-data chunks of arbitrary (odd or even)
    sizes, so every word-align pad path the RIFF walk owns is fuzzed,
    not just the handful of fixture layouts — and with or without the
    WAVE_FORMAT_EXTENSIBLE wrapper (the unwrap must be sample- and
    metadata-invisible)."""
    import numpy as np

    from mspr2_back_spark.operators.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(seed)
    dtype = [np.uint8, np.int16, np.int32, np.float32][dtype_i]
    if dtype == np.uint8:
        samples = rng.integers(0, 256, (n, channels)).astype(dtype)
    elif dtype == np.float32:
        samples = rng.standard_normal((n, channels)).astype(dtype)
    else:
        info = np.iinfo(dtype)
        samples = rng.integers(
            info.min, int(info.max) + 1, (n, channels)
        ).astype(dtype)
    pre_chunks = [(b"JUNK", bytes(sz)) for sz in pre]
    post_chunks = [(b"LIST", bytes(sz)) for sz in post]
    enc = encode_wav(
        samples, rate, pre_chunks=pre_chunks, post_chunks=post_chunks,
        extensible=extensible,
    )
    # RIFF declared size covers every chunk including pad bytes
    import struct

    assert struct.unpack_from("<I", enc, 4)[0] == len(enc) - 8
    assert len(enc) % 2 == 0  # the file itself ends word-aligned
    arr, meta = decode_wav(enc)
    assert meta["n_samples"] == n
    assert meta["channels"] == channels
    assert meta["sample_rate"] == rate
    # the EXTENSIBLE unwrap must report the INNER format
    kind = "float" if dtype == np.float32 else "pcm"
    assert meta["format"] == f"wav/{kind}{samples.dtype.itemsize * 8}"
    assert np.array_equal(arr, samples)


@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    h=st.integers(min_value=1, max_value=28),
    w=st.integers(min_value=1, max_value=28),
    n_bands=st.integers(min_value=1, max_value=4),
    dc_al=st.integers(min_value=0, max_value=2),
    restart=st.sampled_from([0, 1, 3]),
)
@settings(max_examples=25, deadline=None)
def test_jpeg_progressive_random_scan_scripts(
    seed, h, w, n_bands, dc_al, restart
):
    """Property (r11): ANY valid progressive scan script — random
    contiguous spectral bands, per-band successive-approximation
    depth, randomly interleaved scan order (subject only to the
    T.81 rules: first scan before refinements, one bit per
    refinement) — decodes to pixels bit-identical to the BASELINE
    decode of the same image, because a scan script is just a
    partition of the same quantized coefficient bits."""
    import numpy as np

    from mspr2_back_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)

    # random contiguous bands over 1..63
    cuts = sorted(rng.choice(np.arange(2, 63), size=n_bands - 1,
                             replace=False).tolist()) if n_bands > 1 else []
    bounds = [1] + cuts + [64]
    # DC chain: first scan at Al=dc_al, then one-bit refinements
    chains = [
        [(0, 0, 0, dc_al)]
        + [(0, 0, a + 1, a) for a in range(dc_al - 1, -1, -1)]
    ]
    for i in range(n_bands):
        ss, se = bounds[i], bounds[i + 1] - 1
        al_max = int(rng.integers(0, 3))
        chains.append(
            [(ss, se, 0, al_max)]
            + [(ss, se, a + 1, a) for a in range(al_max - 1, -1, -1)]
        )
    # random interleave preserving each chain's internal order
    scans = []
    idx = [0] * len(chains)
    while any(idx[i] < len(chains[i]) for i in range(len(chains))):
        live = [i for i in range(len(chains)) if idx[i] < len(chains[i])]
        i = int(rng.choice(live))
        scans.append(chains[i][idx[i]])
        idx[i] += 1

    base, _ = decode_jpeg(encode_jpeg(img, quality=70))
    prog, _ = decode_jpeg(
        encode_jpeg_progressive(
            img, quality=70, scans=tuple(scans), restart_interval=restart
        )
    )
    assert np.array_equal(base, prog), scans


@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    channels=st.integers(min_value=1, max_value=4),
    data_units=st.integers(min_value=1, max_value=16),
    n_blocks=st.integers(min_value=1, max_value=5),
    custom_coef=st.booleans(),
    trim=st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_ms_adpcm_decode_matches_scalar_reference(
    seed, channels, data_units, n_blocks, custom_coef, trim
):
    """Property (r12): for ANY MS-ADPCM geometry — channel count,
    block size, block count, standard or extended coefficient table,
    fact-trimmed or not — the vectorized-across-blocks decoder must
    equal a scalar per-sample implementation of the published
    pseudocode on every channel. Generalizes the fixed-seed unit pin
    (the same role the stdlib cross-check plays for IMA)."""
    import struct

    import numpy as np

    from mspr2_back_spark.operators.multimodal import decode_wav

    STD_C1 = [256, 512, 0, 192, 240, 460, 392]
    STD_C2 = [0, -256, 0, 64, 0, -208, -232]
    ADAPT = [230, 230, 230, 230, 307, 409, 512, 614,
             768, 614, 512, 409, 307, 230, 230, 230]

    rng = np.random.default_rng(seed)
    c1, c2 = list(STD_C1), list(STD_C2)
    if custom_coef:
        c1.append(int(rng.integers(-500, 500)))
        c2.append(int(rng.integers(-500, 500)))

    # data bytes per block: nibble count must divide evenly across
    # channels -> data_per_block = data_units * channels nibble pairs
    data_per_block = data_units * channels
    block_align = 7 * channels + data_per_block
    spb = data_per_block * 2 // channels + 2

    blocks = b""
    state = []  # per block: (pred_i[ch], delta[ch], s1[ch], s2[ch], nibs)
    for _ in range(n_blocks):
        pred_i = [int(rng.integers(0, len(c1))) for _ in range(channels)]
        # range includes delta 0 and sub-16 values: the adaptation
        # floor must recover, never divide-by-zero or stall
        delta = [int(rng.integers(0, 4000)) for _ in range(channels)]
        s1 = [int(rng.integers(-32768, 32768)) for _ in range(channels)]
        s2 = [int(rng.integers(-32768, 32768)) for _ in range(channels)]
        body = bytes(rng.integers(0, 256, data_per_block, dtype=np.uint8))
        blocks += (
            bytes(pred_i)
            + b"".join(struct.pack("<h", d) for d in delta)
            + b"".join(struct.pack("<h", v) for v in s1)
            + b"".join(struct.pack("<h", v) for v in s2)
            + body
        )
        nibs = [x for b in body for x in (b >> 4, b & 0xF)]
        state.append((pred_i, delta, s1, s2, nibs))

    ext = struct.pack("<HH", spb, len(c1)) + b"".join(
        struct.pack("<hh", a, b) for a, b in zip(c1, c2)
    )
    fmt = struct.pack(
        "<HHIIHHH", 2, channels, 8000, 8000 * block_align // spb,
        block_align, 4, len(ext),
    ) + ext

    def chunk(cid, body):
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    total = n_blocks * spb
    fact = int(rng.integers(1, total + 1)) if trim else None
    payload = chunk(b"fmt ", fmt)
    if fact is not None:
        payload += chunk(b"fact", struct.pack("<I", fact))
    payload += chunk(b"data", blocks)
    wav = b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"WAVE" + payload

    def ref_channel(nibbles, a, b, delta, s1, s2):
        out = [s2, s1]
        for nib in nibbles:
            snib = nib - 16 if nib & 8 else nib
            pred = (s1 * a + s2 * b) >> 8
            pred += snib * delta
            pred = max(-32768, min(32767, pred))
            s2, s1 = s1, pred
            delta = max((ADAPT[nib] * delta) >> 8, 16)
            out.append(pred)
        return out

    arr, meta = decode_wav(wav)
    assert meta["format"] == "wav/ms-adpcm4"
    assert meta["n_samples"] == (fact if fact is not None else total)
    for ch in range(channels):
        want = []
        for pred_i, delta, s1, s2, nibs in state:
            want += ref_channel(
                nibs[ch::channels], c1[pred_i[ch]], c2[pred_i[ch]],
                delta[ch], s1[ch], s2[ch],
            )
        want = want[: meta["n_samples"]]
        assert arr[:, ch].tolist() == want


@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    mode=st.sampled_from(["mutate", "truncate", "garbage"]),
    n_hits=st.integers(min_value=1, max_value=4),
)
@settings(max_examples=60, deadline=None)
def test_codec_dispatch_total_under_corruption(seed, mode, n_hits):
    """Property (r11 — the net for the OverflowError/MemoryError
    class both review passes caught): the codec dispatch is TOTAL.
    For any corruption of any valid payload across every codec
    family (byte mutations reach deep parse states, truncations hit
    every length check, magic-prefixed garbage hits the header
    parsers), decode_image_batch must return a well-formed row —
    real decode or deterministic fake — and never let any exception
    class escape into the Arrow batch."""
    import struct

    import numpy as np
    import pandas as pd

    from mspr2_back_spark.operators.jpeg import (
        encode_jpeg,
        encode_jpeg_progressive,
    )
    from mspr2_back_spark.operators.multimodal import (
        _PNG_MAGIC,
        audio_feature_row,
        decode_image,
        decode_image_batch,
        encode_bmp,
        encode_png,
        encode_wav,
        encode_wav_ima_adpcm,
        encode_wav_ms_adpcm,
    )

    rng = np.random.default_rng(seed)
    img_g = rng.integers(0, 256, (9, 11), dtype=np.uint8)
    img_c = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    pcm = rng.integers(-1000, 1000, (40, 2)).astype(np.int16)

    # a valid mono MS-ADPCM WAV (r12): 2 blocks of block_align=16 —
    # corrupting it reaches the format-2 header/coefficient parses
    ms_blocks = b"".join(
        struct.pack(
            "<Bhhh",
            int(rng.integers(0, 7)),
            int(rng.integers(16, 4000)),
            int(rng.integers(-32768, 32768)),
            int(rng.integers(-32768, 32768)),
        )
        + bytes(rng.integers(0, 256, 9, dtype=np.uint8))
        for _ in range(2)
    )
    ms_fmt = struct.pack("<HHIIHHHH", 2, 1, 8000, 4000, 16, 4, 4, 20)
    ms_body = (
        b"fmt " + struct.pack("<I", len(ms_fmt)) + ms_fmt
        + b"data" + struct.pack("<I", len(ms_blocks)) + ms_blocks
    )
    ms_wav = b"RIFF" + struct.pack("<I", 4 + len(ms_body)) + b"WAVE" + ms_body

    seeds = [
        encode_jpeg(img_c, quality=80, subsampling="420", restart_interval=2),
        encode_jpeg_progressive(img_g, quality=80),
        encode_jpeg_progressive(img_c, quality=80, restart_interval=3),
        encode_png(img_c, filter_type=4),
        encode_png(img_c, filter_type=2, interlace=True),
        encode_bmp(img_c),
        encode_wav(pcm, 8000),
        encode_wav(pcm, 8000, extensible=True),
        encode_wav(pcm, 8000, codec="ulaw"),  # r12: G.711 encode seam
        encode_wav_ima_adpcm(pcm, 8000, block_align=16),  # r12
        ms_wav,
        encode_wav_ms_adpcm(pcm, 8000, block_align=18),  # r13 encoder
        encode_wav_ms_adpcm(pcm, 8000, block_align=18, extensible=True),
    ]
    base = seeds[int(rng.integers(0, len(seeds)))]
    if mode == "mutate":
        buf = bytearray(base)
        for _ in range(n_hits):
            buf[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
        payload = bytes(buf)
    elif mode == "truncate":
        payload = base[: int(rng.integers(1, len(base)))]
    else:
        payload = base[:12] + bytes(
            rng.integers(0, 256, int(rng.integers(0, 64)), dtype=np.uint8)
        )

    out = decode_image_batch(pd.Series([payload, base]))
    assert len(out) == 2
    assert out.loc[0, "n_bytes"] == len(payload)
    assert out.loc[0, "format"]  # some format string, real or fake
    # the intact twin must still really decode (no shared-state bleed)
    assert out.loc[1, "format"] != "fake/deterministic"
    decode_image(payload)  # None or a decode — never an exception
    # the audio seam must be equally total (r11 ADVICE: a zeroed
    # sample-rate field slipped past because only the image path was
    # fuzzed) — a row dict or None for EVERY corrupted payload,
    # WAV-seeded or not, never an exception
    row = audio_feature_row(payload)
    assert row is None or row["sample_rate"] >= 1
