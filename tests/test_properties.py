"""Property-based tests (SURVEY §5.4): flatten name stability, schema-merge
commutativity, dedup idempotency — hypothesis-generated inputs."""

import json

from hypothesis import HealthCheck, given, settings, strategies as st

from league_of_legends_data_pipeline_spark.functions.flatten import flatten

# nested JSON objects: scalar leaves, dict/list nodes, json-safe keys
keys = st.text(alphabet="abcdefgh", min_size=1, max_size=6)
scalars = st.one_of(st.integers(-2**40, 2**40), st.booleans(),
                    st.text(alphabet="xyz ", max_size=8))
# lists hold homogeneous scalars only: JSON inference unifies heterogeneous
# list elements (e.g. [1, "x"] nulls / restrings them), which changes values
# by design — homogeneous lists still exercise index naming
homogeneous_list = st.one_of(
    st.lists(st.integers(-2**40, 2**40), min_size=1, max_size=3),
    st.lists(st.booleans(), min_size=1, max_size=3),
    st.lists(st.text(alphabet="xyz ", max_size=8), min_size=1, max_size=3),
)
nested = st.recursive(
    scalars,
    lambda inner: st.one_of(
        st.dictionaries(keys, inner, min_size=1, max_size=4),
        homogeneous_list,
    ),
    max_leaves=12,
)
docs = st.dictionaries(keys, nested, min_size=1, max_size=5)

SLOW = settings(max_examples=12, deadline=None,
                suppress_health_check=list(HealthCheck))


def py_flatten(node, sep="_"):
    out = {}

    def walk(n, name):
        if isinstance(n, dict):
            # sorted: Spark's JSON inference orders fields alphabetically,
            # which decides first-wins on name collisions
            for k, v in sorted(n.items()):
                walk(v, f"{name}{sep}{k}" if name else k)
        elif isinstance(n, list):
            for i, v in enumerate(n):
                walk(v, f"{name}{sep}{i}" if name else str(i))
        else:
            out.setdefault(name, n)
    walk(node, "")
    return out


@given(doc=docs)
@SLOW
def test_flatten_names_match_python_oracle(spark, doc):
    """Flatten column names (and values) equal the reference-semantics
    python flatten, for arbitrary nested shapes."""
    df = spark.read.json(spark.sparkContext.parallelize([json.dumps(doc)]))
    got = flatten(df, blacklist=(), max_array=5).collect()[0].asDict()
    want = py_flatten(doc)
    # positional array expansion pads to max_array with NULL columns (the
    # schema-union view of the reference's null-pad row align); every
    # python-flatten name must exist with an equal value, and any extra
    # Spark column must be a NULL pad slot
    assert set(want) <= set(got)
    for k, v in want.items():
        g = got[k]
        assert g == v or str(g) == str(v) or (
            isinstance(v, bool) and str(g).lower() == str(v).lower()
        ), (k, g, v)
    for k in set(got) - set(want):
        assert got[k] is None, (k, got[k])


@given(rows=st.lists(
    st.fixed_dictionaries(
        {"id": st.integers(0, 5)},
        optional={"a": st.integers(0, 9), "b": st.text(alphabet="ab", max_size=3)},
    ), min_size=1, max_size=6))
@SLOW
def test_schema_merge_commutative(spark, rows, tmp_path_factory):
    """evolve_append(b1);evolve_append(b2) and the reverse read back the
    same row multiset (schema union is order-insensitive)."""
    from league_of_legends_data_pipeline_spark.sinks import evolve_append, read_evolved

    half = max(len(rows) // 2, 1)
    b1 = spark.read.json(spark.sparkContext.parallelize(
        [json.dumps(r) for r in rows[:half]]))
    b2 = spark.read.json(spark.sparkContext.parallelize(
        [json.dumps(r) for r in rows[half:] or rows[:1]]))

    outs = []
    for order in ((b1, b2), (b2, b1)):
        path = str(tmp_path_factory.mktemp("merge"))
        for b in order:
            evolve_append(spark, b, path)
        df = read_evolved(spark, path)
        outs.append(sorted(
            tuple(repr(r.asDict().get(c)) for c in sorted(df.columns))
            for r in df.collect()))
    assert outs[0] == outs[1]


@given(ids=st.lists(st.integers(0, 20), min_size=1, max_size=30))
@SLOW
def test_exact_dedup_idempotent(spark, ids):
    from league_of_legends_data_pipeline_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame([(i, f"text-{i % 7}") for i in ids], ["doc_id", "text"])
    once = exact_dedup(df, ["text"], "doc_id").drop("n_dups")
    twice = exact_dedup(once, ["text"], "doc_id").drop("n_dups")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    # keeps exactly one per distinct content, the min id
    want = {}
    for i in ids:
        want.setdefault(f"text-{i % 7}", set()).add(i)
    assert sorted(r["doc_id"] for r in once.collect()) == \
        sorted(min(v) for v in want.values())


@given(
    tgt=st.lists(st.tuples(st.integers(0, 15), st.integers(0, 99)),
                 min_size=0, max_size=20, unique_by=lambda t: t[0]),
    upd=st.lists(st.tuples(st.integers(0, 15), st.integers(100, 199),
                           st.booleans()),
                 min_size=0, max_size=20, unique_by=lambda t: t[0]),
)
@SLOW
def test_merge_frames_set_semantics(spark, tgt, upd):
    """MERGE laws: keys partition into (kept from target) ∪ (upserted) minus
    (deleted); applying the same updates twice equals once (idempotent)."""
    from league_of_legends_data_pipeline_spark.sinks import merge_frames

    target = spark.createDataFrame(tgt or [(999, 0)], ["k", "v"])
    updates = spark.createDataFrame(upd or [(998, 100, True)],
                                    ["k", "v", "_deleted"])
    once = merge_frames(target, updates, ["k"], delete_col="_deleted")
    twice = merge_frames(once, updates, ["k"], delete_col="_deleted")

    got = {r["k"]: r["v"] for r in once.collect()}
    tgt_d = dict(tgt or [(999, 0)])
    upd_d = {k: (v, d) for k, v, d in (upd or [(998, 100, True)])}
    want = {k: v for k, v in tgt_d.items() if k not in upd_d}
    want.update({k: v for k, (v, d) in upd_d.items() if not d})
    assert got == want
    assert {r["k"]: r["v"] for r in twice.collect()} == want


@given(ops=st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(0, 99)),
        st.tuples(st.just("overwrite"), st.integers(0, 99)),
        st.tuples(st.just("rollback"), st.integers(0, 5)),
    ), min_size=1, max_size=6))
@SLOW
def test_snapshot_model(spark, tmp_path_factory, ops):
    """Model-based check: a random append/overwrite/rollback sequence must
    match a pure-python model of the version history, and every historic
    version must stay exactly readable afterward."""
    from league_of_legends_data_pipeline_spark.snapshots import (
        snapshot_read, snapshot_rollback, snapshot_write,
    )

    tbl = str(tmp_path_factory.mktemp("snap") / "tbl")
    model: list[list[int]] = []   # contents per version
    for op, arg in ops:
        if op == "rollback":
            if not model:
                continue
            v = arg % len(model)
            snapshot_rollback(tbl, v)
            model.append(list(model[v]))
        else:
            df = spark.createDataFrame([(arg,)], ["x"])
            snapshot_write(df, tbl, mode=op)
            base = model[-1] if (model and op == "append") else []
            model.append(base + [arg])
    for v, want in enumerate(model):
        if not want:
            continue  # empty snapshots refuse to read (no schema)
        got = sorted(r["x"] for r in snapshot_read(spark, tbl, v).collect())
        assert got == sorted(want), (v, got, want)


@given(member_ids=st.sets(st.integers(0, 10_000), min_size=1, max_size=60),
       probe_ids=st.sets(st.integers(0, 10_000), min_size=1, max_size=60))
@SLOW
def test_bloom_never_false_negative(spark, member_ids, probe_ids):
    """For arbitrary key sets, every member must pass the filter — the
    guarantee the q104 pruning plan relies on."""
    from pyspark.sql import functions as F

    from league_of_legends_data_pipeline_spark.operators.bloom import (
        bloom_bitmap, bloom_prune,
    )

    m, k = 1 << 12, 4
    keys = spark.createDataFrame([(str(i),) for i in sorted(member_ids)],
                                 ["key"])
    bm = bloom_bitmap(keys, "key", m, k)
    probe = spark.createDataFrame(
        [(str(i),) for i in sorted(member_ids | probe_ids)], ["key"])
    passed = {r["key"] for r in
              bloom_prune(probe, F.col("key"), bm, m, k).collect()}
    assert {str(i) for i in member_ids} <= passed


@given(sizes=st.dictionaries(st.sampled_from(["a", "b", "c"]),
                             st.integers(1, 80), min_size=2, max_size=3),
       parts=st.dictionaries(st.sampled_from(["a", "b", "c"]),
                             st.integers(1, 7), min_size=2, max_size=3))
@SLOW
def test_mixture_sample_hits_integer_quotas(spark, sizes, parts):
    """For arbitrary group sizes and ratios, exact mode must return
    exactly floor(w_g*T/W) rows per listed group, T = min floor(n_g*W/w_g)."""
    from league_of_legends_data_pipeline_spark.operators.sampling import (
        mixture_sample,
    )

    parts = {g: w for g, w in parts.items() if g in sizes}
    if not parts:
        return
    rows, nxt = [], 0
    for g, n in sorted(sizes.items()):
        rows += [(i, g) for i in range(nxt, nxt + n)]
        nxt += n
    df = spark.createDataFrame(rows, ["doc_id", "grp"])
    out = mixture_sample(df, "grp", parts, "doc_id")
    got = {r["grp"]: r["count"] for r in out.groupBy("grp").count().collect()}
    W = sum(parts.values())
    T = min(sizes[g] * W // w for g, w in parts.items())
    expect = {g: w * T // W for g, w in parts.items()}
    assert got == {g: n for g, n in expect.items() if n > 0}


@given(payloads=st.lists(st.binary(min_size=0, max_size=400),
                         min_size=2, max_size=10, unique=True))
@SLOW
def test_ahash_matches_python_oracle(spark, payloads):
    """The vectorized signature equals a direct per-definition python
    computation for arbitrary byte strings."""
    from league_of_legends_data_pipeline_spark.operators.multimodal import (
        AHASH_BITS, ahash_signature_table,
    )

    def py_ahash(raw: bytes) -> int:
        n = len(raw)
        if n == 0:
            return 0
        total = sum(raw)
        sig = 0
        for kbit in range(AHASH_BITS):
            lo, hi = kbit * n // AHASH_BITS, (kbit + 1) * n // AHASH_BITS
            if sum(raw[lo:hi]) * n > total * (hi - lo):
                sig |= 1 << kbit
        return sig

    df = spark.createDataFrame(list(enumerate(payloads)),
                               ["media_id", "payload"])
    got = {r["media_id"]: r["sig"]
           for r in ahash_signature_table(df, "media_id", "payload").collect()}
    assert got == {i: py_ahash(p) for i, p in enumerate(payloads)}


@given(sigs=st.lists(st.integers(0, (1 << 60) - 1), min_size=2,
                     max_size=24, unique=True))
@SLOW
def test_hamming_pairs_lossless_vs_bruteforce(spark, sigs):
    """For arbitrary 60-bit signatures, the banded join must return
    EXACTLY the pairs an all-pairs hamming scan finds (pigeonhole
    losslessness at hamming <= chunks-1)."""
    import itertools

    from league_of_legends_data_pipeline_spark.operators.dedup import (
        hamming_pairs,
    )

    df = spark.createDataFrame(list(enumerate(sigs)), ["sid", "sig"])
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in hamming_pairs(df, "sid", "sig", bits=60, chunks=6,
                                  max_hamming=5).collect()}
    expect = {}
    for (i, a), (j, b) in itertools.combinations(enumerate(sigs), 2):
        h = bin(a ^ b).count("1")
        if h <= 5:
            expect[(i, j)] = h
    assert got == expect


def test_cdc_boundary_stability_under_random_edits(spark):
    """CDC's contract under edits, asserted at its deterministic bound:
    after inserting (or deleting) m chars at position p, every original
    chunk that ends at/before p keeps its digest, and every original
    chunk that starts at/after p + window (+ m for deletions) keeps its
    digest — only the chunks overlapping the edit's window-extended
    footprint may change. Checked for BOTH the md5 (oracle) mode and the
    Rabin-Karp rolling mode, one Spark run per mode over a seeded corpus
    of 40 (original, edited) pairs."""
    import random

    from league_of_legends_data_pipeline_spark.operators.dedup import (
        cdc_chunks,
    )

    rng = random.Random(0xCDC)
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789 .,"  # ASCII: char == byte
    w, m_mod = 16, 24
    docs, edits = [], {}
    for i in range(40):
        n = rng.randrange(200, 900)
        text = "".join(rng.choice(alpha) for _ in range(n))
        if i % 2 == 0:
            p, m = rng.randrange(0, n), rng.randrange(1, 21)
            edited = text[:p] + "".join(rng.choice(alpha)
                                        for _ in range(m)) + text[p:]
            edits[i] = ("ins", p, m)
        else:
            m = rng.randrange(1, 21)
            p = rng.randrange(0, n - m)
            edited = text[:p] + text[p + m:]
            edits[i] = ("del", p, m)
        docs.append((i, text))
        docs.append((i + 1000, edited))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for mode in ("md5", "rolling"):
        rows = cdc_chunks(df, "doc_id", "text", window=w, modulus=m_mod,
                          mode=mode).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(
                (r["chunk_idx"], r["chunk_len"], r["chunk_digest"]))
        n_guaranteed = 0
        for i, (kind, p, m) in edits.items():
            spans, pos = [], 0
            for _, ln, dg in sorted(by_doc[i]):
                spans.append((pos, pos + ln, dg))
                pos += ln
            after = p + w + (m if kind == "del" else 0)
            edited_digests = {dg for _, _, dg in by_doc[i + 1000]}
            for a, b, dg in spans:
                if b <= p or a >= after:
                    n_guaranteed += 1
                    assert dg in edited_digests, \
                        f"{mode} doc {i} {kind}@{p} m={m} chunk [{a},{b})"
        assert n_guaranteed > 200  # the bound was actually exercised


@given(st.lists(st.text(alphabet=" \t\nAbZz09!?.,-éα", max_size=60),
                max_size=12))
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_normalize_text_idempotent(spark, texts):
    """normalize(normalize(x)) == normalize(x): the dedup digest is a
    fixed point, so re-normalizing an already-clean corpus cannot split
    or merge digest groups."""
    from pyspark.sql import functions as F

    from league_of_legends_data_pipeline_spark.operators.text import (
        normalize_text,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    if not rows:
        return
    df = spark.createDataFrame(rows, "i long, t string")
    out = df.select(
        normalize_text("t").alias("once"),
        normalize_text(normalize_text("t")).alias("twice")).collect()
    for r in out:
        assert r["once"] == r["twice"]


@given(st.integers(1, 12), st.integers(1, 10),
       st.sampled_from(["L", "RGB", "RGBA"]), st.data())
@SLOW
def test_png_roundtrip_lossless_any_pixels(w, h, mode, data):
    """PNG is lossless: decode(encode(px)) == px for ARBITRARY pixel
    bytes at any small dimension/mode — the invariant hypothesis can
    hit with byte patterns (0x00/0xFF runs, filter-edge values) that
    fixed fixtures never cover."""
    from league_of_legends_data_pipeline_spark.operators.multimodal import (
        _decode_image_native, encode_png,
    )
    nch = {"L": 1, "RGB": 3, "RGBA": 4}[mode]
    px = bytes(data.draw(st.binary(min_size=w * h * nch,
                                   max_size=w * h * nch)))
    assert _decode_image_native(encode_png(px, w, h, mode),
                                want_pixels=True) == (w, h, mode, px)


@given(st.integers(1, 10), st.integers(1, 8), st.data())
@SLOW
def test_bmp_roundtrip_lossless_any_pixels(w, h, data):
    """BMP24 roundtrip over arbitrary bytes: row flip + BGR swap +
    padding strip must be exact inverses at every width mod 4."""
    from league_of_legends_data_pipeline_spark.operators.multimodal import (
        _decode_image_native, encode_bmp24,
    )
    px = bytes(data.draw(st.binary(min_size=w * h * 3,
                                   max_size=w * h * 3)))
    assert _decode_image_native(encode_bmp24(px, w, h),
                                want_pixels=True) == (w, h, "RGB", px)


@given(st.integers(1, 2), st.integers(1, 60),
       st.sampled_from([8000, 16000, 44100]), st.data())
@SLOW
def test_wav_roundtrip_lossless_any_samples(nch, nfr, rate, data):
    """PCM WAV is lossless for arbitrary int16 frames, mono or stereo."""
    import numpy as np

    from league_of_legends_data_pipeline_spark.operators.audio import (
        decode_wav_pcm16, encode_wav_pcm16,
    )
    vals = data.draw(st.lists(st.integers(-32768, 32767),
                              min_size=nch * nfr, max_size=nch * nfr))
    samples = np.array(vals, dtype="<i2")
    got = decode_wav_pcm16(encode_wav_pcm16(samples, rate, channels=nch))
    assert got[:3] == (rate, nch, nfr)
    assert np.array_equal(got[3], samples)


@given(st.integers(1, 4096), st.integers(1, 2160),
       st.integers(0, 10**7), st.sampled_from([600, 1000, 90000]),
       st.sampled_from([b"isom", b"mp42", b"avc1"]))
@SLOW
def test_mp4_metadata_roundtrip(w, h, ms, ts, brand):
    """MP4 metadata roundtrip: parsed fields equal encoded fields, with
    duration passing through the documented ms->ticks->ms floor-div."""
    from league_of_legends_data_pipeline_spark.operators.video import (
        encode_mp4_stub, parse_mp4_metadata,
    )
    m = parse_mp4_metadata(encode_mp4_stub(w, h, ms, timescale=ts,
                                           major_brand=brand))
    assert (m["major_brand"], m["timescale"], m["n_tracks"],
            m["width"], m["height"]) == (brand.decode(), ts, 1, w, h)
    assert m["duration_ms"] == (ms * ts // 1000) * 1000 // ts


@given(st.integers(1, 20), st.integers(1, 16), st.integers(0, 127))
@SLOW
def test_jpeg_flat_even_exactness_window(w, h, half):
    """The q156 oracle window as a PROPERTY: every flat greyscale image
    with an even value round-trips bit-exactly through the lossy codec,
    at every dimension (block-boundary crossings included)."""
    from league_of_legends_data_pipeline_spark.operators.jpeg import (
        decode_jpeg_baseline, encode_jpeg_baseline,
    )
    v = 2 * half
    px = bytes([v]) * (w * h)
    assert decode_jpeg_baseline(encode_jpeg_baseline(px, w, h, "L")) == \
        (w, h, "L", px)


@SLOW
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=12)
        .map(lambda chars: " ".join(chars)),
        min_size=2, max_size=14),
    threshold=st.sampled_from([0.25, 0.4, 0.5, 0.7, 1.0]),
)
def test_prefix_filter_pairs_lossless_property(spark, docs, threshold):
    """Prefix filtering must equal brute-force all-pairs Jaccard for ANY
    corpus and ANY threshold — the losslessness claim is an algebraic
    guarantee, not a tuning outcome. Single-letter tokens from a tiny
    alphabet maximize saturation/tie pathologies (shared rare tokens,
    equal-size sets, thresholds landing exactly on achievable Jaccards,
    float dust in ceil(t*|T|))."""
    from itertools import combinations

    from league_of_legends_data_pipeline_spark.operators.dedup import (
        prefix_filter_pairs,
    )

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r.id_a, r.id_b): r.jaccard
           for r in prefix_filter_pairs(df, "doc_id", "text",
                                        threshold=threshold).collect()}
    sets = {i: set(t.split()) for i, t in rows if t.split()}
    exp = {}
    for a, b in combinations(sorted(sets), 2):
        i = len(sets[a] & sets[b])
        j = i / (len(sets[a]) + len(sets[b]) - i)
        if j >= threshold:
            exp[(a, b)] = round(j, 6)
    assert got == exp


@given(rows=st.lists(
    st.tuples(st.one_of(st.none(), st.integers(-1000, 1000)),
              st.one_of(st.none(),
                        st.floats(-100, 100, allow_nan=False).map(
                            lambda x: round(x, 3))),
              st.one_of(st.none(), st.text(alphabet="abc", max_size=4))),
    min_size=1, max_size=25))
@SLOW
def test_profile_ndv_modes_agree(spark, rows):
    """The pruned and expand exact-NDV plans are different physical
    strategies for the SAME function — every profiled field must match
    row-for-row, on any mix of nulls/dups/kinds."""
    from league_of_legends_data_pipeline_spark.operators.profile import (
        profile_columns,
    )

    df = spark.createDataFrame(rows, "k int, v double, s string")
    pruned = sorted(map(tuple, profile_columns(df).collect()))
    expand = sorted(map(tuple,
                        profile_columns(df, ndv_mode="exact_expand")
                        .collect()))
    assert pruned == expand


# ---------------------------------------------------------------------------
# timeseries estimators (q246/q248)
# ---------------------------------------------------------------------------

@given(st.lists(st.integers(0, 1000), min_size=3, max_size=12),
       st.integers(1, 50))
@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
def test_theil_sen_slope_is_shift_invariant(spark, vals, shift):
    """Shifting the time axis must leave the Theil-Sen slope unchanged
    and move the intercept by exactly slope*shift (its defining
    affine-equivariance property)."""
    from league_of_legends_data_pipeline_spark.operators.timeseries import (
        theil_sen_trend,
    )
    base = spark.createDataFrame(
        [("g", t, float(v)) for t, v in enumerate(vals)], ["g", "t", "v"])
    moved = spark.createDataFrame(
        [("g", t + shift, float(v)) for t, v in enumerate(vals)],
        ["g", "t", "v"])
    r0 = theil_sen_trend(base, "g", "t", "v").collect()[0]
    r1 = theil_sen_trend(moved, "g", "t", "v").collect()[0]
    assert r1.theil_slope == r0.theil_slope
    assert abs(r1.intercept - (r0.intercept - r0.theil_slope * shift)) < 1e-4


@given(st.lists(st.integers(0, 500), min_size=2, max_size=10))
@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
def test_ewma_stays_inside_series_hull(spark, vals):
    """Every EWMA value is a convex combination of the series mean and
    observed points, so it can never leave [min(xs + mu), max(xs + mu)];
    with lam=0.2 the first value is exactly 0.2*x1 + 0.8*mu."""
    from league_of_legends_data_pipeline_spark.operators.timeseries import (
        ewma_chart,
    )
    daily = spark.createDataFrame(
        [("g", f"2024-01-{i+1:02d}", float(v)) for i, v in enumerate(vals)],
        ["g", "day", "x"])
    rows = ewma_chart(daily, "g", "day", "x").collect()
    mu = sum(vals) / len(vals)
    lo, hi = min(list(vals) + [mu]), max(list(vals) + [mu])
    for r in rows:
        assert lo - 1e-6 <= r.ewma <= hi + 1e-6
    assert abs(rows[0].ewma - round(0.2 * vals[0] + 0.8 * mu, 6)) < 1e-6


@given(st.lists(st.tuples(st.integers(1, 40), st.integers(0, 500)),
                min_size=2, max_size=15))
@SLOW
def test_jackknife_se_matches_python_replay(spark, days):
    """q262's engine-side jackknife SE equals the direct python replay
    for arbitrary (distinct-users, revenue-cents) day panels — the
    pseudo-estimate fold and the (D-1)/D variance are pure arithmetic
    on exact integers, so the replay must agree to rounding."""
    import math

    from league_of_legends_data_pipeline_spark.operators import (  # noqa: F401
        timeseries,
    )
    from pyspark.sql import functions as F

    daily = spark.createDataFrame(
        [(f"2024-02-{i+1:02d}", int(x), int(n) + 1)
         for i, (n, x) in enumerate(days)],
        "day string, x long, n long").localCheckpoint(eager=True)
    tot = daily.agg(F.sum("x").alias("sx"), F.sum("n").alias("sn"),
                    F.count(F.lit(1)).alias("d"))
    pseudo = (daily.crossJoin(F.broadcast(tot))
              .select(((F.col("sx") - F.col("x"))
                       / (1.0 * (F.col("sn") - F.col("n")))).alias("rj")))
    m = pseudo.agg(F.avg("rj").alias("mbar"))
    got = (pseudo.crossJoin(F.broadcast(m))
           .agg(F.sum((F.col("rj") - F.col("mbar"))
                      * (F.col("rj") - F.col("mbar"))).alias("ss"))
           .crossJoin(F.broadcast(tot))
           .select(F.sqrt((F.col("d") - 1.0) / F.col("d")
                          * F.col("ss")).alias("se"))
           ).collect()[0].se

    xs = [int(x) for _, x in days]
    ns = [int(n) + 1 for n, _ in days]
    sx, sn, d = sum(xs), sum(ns), len(days)
    rj = [(sx - x) / (sn - n) for x, n in zip(xs, ns)]
    mbar = sum(rj) / d
    want = math.sqrt((d - 1) / d * sum((r - mbar) ** 2 for r in rj))
    assert abs(got - want) < 1e-9 * max(1.0, want)


@given(st.lists(st.tuples(st.sampled_from("AB"), st.integers(1, 30)),
                min_size=2, max_size=40).filter(
                    lambda xs: {a for a, _ in xs} == {"A", "B"}))
@SLOW
def test_ks_w1_match_python_replay(spark, samples):
    """q265's KS sup and W1 step integral over the value-domain ECDF
    panel equal the direct python computation for arbitrary two-sample
    integer data."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window as W

    df = spark.createDataFrame([(a, v) for a, v in samples],
                               "arm string, cents long")
    support = (df.groupBy("cents")
               .agg(F.sum(F.when(F.col("arm") == "A", 1).otherwise(0))
                    .alias("ca"),
                    F.sum(F.when(F.col("arm") == "B", 1).otherwise(0))
                    .alias("cb")).localCheckpoint(eager=True))
    tot = support.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    w = W.orderBy("cents").rowsBetween(W.unboundedPreceding, W.currentRow)
    ecdf = support.select(
        "cents", F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
        F.lead("cents").over(W.orderBy("cents")).alias("nx"))
    got = (ecdf.crossJoin(F.broadcast(tot))
           .select(F.abs(F.col("cum_a") / (1.0 * F.col("na"))
                         - F.col("cum_b") / (1.0 * F.col("nb")))
                   .alias("adiff"), "cents", "nx")
           .agg(F.max("adiff").alias("ks"),
                F.sum(F.when(F.col("nx").isNull(), F.lit(0.0))
                      .otherwise(F.col("adiff")
                                 * (F.col("nx") - F.col("cents"))))
                .alias("w1")).collect()[0])

    a = sorted(v for g, v in samples if g == "A")
    b = sorted(v for g, v in samples if g == "B")
    grid = sorted(set(a) | set(b))
    ks = w1 = 0.0
    for i, c in enumerate(grid):
        fa = sum(1 for v in a if v <= c) / len(a)
        fb = sum(1 for v in b if v <= c) / len(b)
        d = abs(fa - fb)
        ks = max(ks, d)
        if i + 1 < len(grid):
            w1 += d * (grid[i + 1] - c)
    assert abs(got.ks - ks) < 1e-12
    assert abs(got.w1 - w1) < 1e-9


@given(st.lists(st.integers(0, 40), min_size=16, max_size=16))
@SLOW
def test_shapley_attribution_matches_permutation_replay(spark, convs):
    """q280's lattice-sum Shapley (in integer 24ths) equals the direct
    all-permutations definition computed in python for arbitrary
    conversion counts per mask, and satisfies the efficiency axiom
    (values sum to v(full) - v(empty)) EXACTLY — integer arithmetic
    end-to-end."""
    from itertools import permutations

    from pyspark.sql import functions as F

    mk = spark.createDataFrame(
        [(m, c) for m, c in enumerate(convs)],
        "mask long, conv long").localCheckpoint(eager=True)
    subs = spark.range(16).select(F.col("id").alias("s"))
    v = (subs.crossJoin(F.broadcast(mk))
         .groupBy("s")
         .agg(F.coalesce(
             F.sum(F.when(F.col("mask").bitwiseAND(F.col("s"))
                          == F.col("mask"), F.col("conv"))
                   .otherwise(0)), F.lit(0)).alias("v"))
         .localCheckpoint(eager=True))
    channels = spark.createDataFrame(
        [(1, "c1"), (2, "c2"), (4, "c3"), (8, "c4")], ["bit", "channel"])
    w24 = (F.when(F.bit_count(F.col("s0")) == 0, 6)
           .when(F.bit_count(F.col("s0")) == 1, 2)
           .when(F.bit_count(F.col("s0")) == 2, 2).otherwise(6))
    v0 = v.select(F.col("s").alias("s0"), F.col("v").alias("va"))
    v1 = v.select(F.col("s").alias("s1"), F.col("v").alias("vb"))
    got = {r.channel: r.s24 for r in
           (channels.join(F.broadcast(v0),
                          v0.s0.bitwiseAND(F.col("bit")) == 0)
            .join(F.broadcast(v1),
                  F.col("s1") == F.col("s0") + F.col("bit"))
            .groupBy("channel")
            .agg(F.sum(w24 * (F.col("vb") - F.col("va"))).alias("s24"))
            ).collect()}

    def vf(s):
        return sum(c for m, c in enumerate(convs) if (m & s) == m)

    bits = {"c1": 1, "c2": 2, "c3": 4, "c4": 8}
    want = {ch: 0 for ch in bits}
    for perm in permutations(bits.values()):
        s = 0
        for b in perm:
            gain = vf(s | b) - vf(s)
            ch = next(k for k, v_ in bits.items() if v_ == b)
            want[ch] += gain
            s |= b
    assert got == want
    assert sum(got.values()) == 24 * (vf(15) - vf(0))


@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 3),
                          st.integers(1, 50)),
                min_size=2, max_size=20).filter(
                    lambda xs: len({(i, j) for i, j, _ in xs})
                    == len(xs)))
@SLOW
def test_markov_stationary_matches_integer_replay(spark, trans_rows):
    """q277's nano-unit power iteration equals the direct python
    integer replay for arbitrary transition-count panels — every term
    is round(v*c/r) on exact integers, so the engine and the replay
    must agree EXACTLY after 3 rounds."""
    from pyspark.sql import functions as F

    tr = spark.createDataFrame(trans_rows, "i long, j long, c long")
    trans = tr.groupBy("i", "j").agg(F.sum("c").alias("c")) \
        .localCheckpoint(eager=True)
    r = trans.groupBy("i").agg(F.sum("c").alias("r"))
    trr = trans.join(F.broadcast(r), "i").localCheckpoint(eager=True)
    states = sorted({i for i, _, _ in trans_rows})
    n = len(states)
    v0 = (1_000_000_000 // n
          + (1 if 2 * (1_000_000_000 % n) >= n else 0))
    v = spark.createDataFrame([(s, v0) for s in states], "s long, v long")
    for _ in range(3):
        v = (trr.join(F.broadcast(v.withColumnRenamed("s", "i")), "i")
             .groupBy(F.col("j").alias("s"))
             .agg(F.sum(F.round(F.col("v") * F.col("c")
                                / (1.0 * F.col("r"))).cast("long"))
                  .alias("v")).localCheckpoint(eager=True))
    got = {r_.s: r_.v for r_ in v.collect()}

    # python replay with identical integer scheme (round-half-even on
    # the same double values — both sides round the same IEEE double)
    from collections import defaultdict
    cnt = defaultdict(int)
    for i, j, c in trans_rows:
        cnt[(i, j)] += c
    rr = defaultdict(int)
    for (i, _), c in cnt.items():
        rr[i] += c
    vv = {s: v0 for s in states}
    for _ in range(3):
        nxt = defaultdict(int)
        for (i, j), c in cnt.items():
            if i in vv:
                # Spark F.round is HALF_UP on the double value
                x = vv[i] * c / rr[i]
                import math
                nxt[j] += int(math.floor(x + 0.5))
        vv = dict(nxt)
    assert got == {s: vv.get(s, 0) for s in got}


def _a2akn_python(pairs):
    """Direct Scholz-Stephens (1987) A2akN (eq. 7, midrank/ties form) in
    plain floats over (arm, value) pairs — an independent code path from
    q329's doubled-integer contingency formulation."""
    arms = sorted({a for a, _ in pairs})
    ns = {a: sum(1 for g, _ in pairs if g == a) for a in arms}
    big_n = len(pairs)
    grid = sorted({v for _, v in pairs})
    a2 = 0.0
    cum = {a: 0 for a in arms}
    cum_all = 0
    for v in grid:
        lj = sum(1 for _, x in pairs if x == v)
        fij = {a: sum(1 for g, x in pairs if g == a and x == v)
               for a in arms}
        bbar = cum_all + lj / 2.0
        denom = bbar * (big_n - bbar) - big_n * lj / 4.0
        if denom > 0:
            for a in arms:
                mbar = cum[a] + fij[a] / 2.0
                num = big_n * mbar - ns[a] * bbar
                a2 += (1.0 / ns[a]) * (lj / big_n) * num * num / denom
        for a in arms:
            cum[a] += fij[a]
        cum_all += lj
    return (big_n - 1.0) / big_n * a2


def test_anderson_darling_matches_python_replay(spark, tmp_path):
    """q329's doubled-integer / nano-summed A2akN equals the float
    midrank formula computed directly in python (independent code path),
    for several deterministic arm/value data sets."""
    import hashlib

    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    def arm_of(user_id: int) -> str:
        h = hashlib.md5(f"ab:{user_id}".encode()).hexdigest()
        return "A" if int(h[:15], 16) % 2 == 0 else "B"

    for seed in (1, 2, 3):
        users = list(range(seed * 7, seed * 7 + 40))
        cents = [((u * 2654435761 + seed) % 900) + 100 for u in users]
        sf_dir = tmp_path / f"sf_{seed}"
        sf_dir.mkdir()
        pd.DataFrame({
            "event_id": range(len(users)),
            "ts": pd.to_datetime("2024-01-01"),
            "user_id": users,
            "event_type": "purchase",
            "value": [c / 100.0 for c in cents],
            "props": "{}",
        }).to_parquet(sf_dir / "events.parquet")
        got = QUERIES["q329_anderson_darling"].spark(
            spark, str(sf_dir)).collect()[0]
        pairs = [(arm_of(u), c) for u, c in zip(users, cents)]
        want = _a2akn_python(pairs)
        assert got.na == sum(1 for a, _ in pairs if a == "A")
        assert got.nb == sum(1 for a, _ in pairs if a == "B")
        # nano quantization bounds the error at ~n_values * 1e-9 / n_arm
        assert abs(got.a2 - round(want, 6)) < 1e-4, (seed, got.a2, want)


def test_phi_approximation_accuracy_python_replay():
    """The q336 BH-FDR battery computes p-values from the shared-literal
    A&S 26.2.17 normal-CDF polynomial (_PHI_SQL / _phi_col). Both
    engines share the SAME approximation, so a formula bug is invisible
    to the oracle parity check — this replay pins it against Python's
    exact erf: |Phi_approx - Phi_exact| < 7.5e-8 (the published bound)
    over the z range any real battery produces."""
    import math

    def phi_approx(az: float) -> float:
        t = 1.0 / (1.0 + 0.2316419 * az)
        return (1.0 - math.exp(-(az * az) / 2.0) / 2.5066282746310002
                * (0.319381530 * t - 0.356563782 * t ** 2
                   + 1.781477937 * t ** 3 - 1.821255978 * t ** 4
                   + 1.330274429 * t ** 5))

    for i in range(0, 801):
        az = i / 100.0  # 0.00 .. 8.00
        exact = 0.5 * (1.0 + math.erf(az / math.sqrt(2.0)))
        assert abs(phi_approx(az) - exact) < 7.5e-8, az
