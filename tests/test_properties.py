"""Property-based tests (hypothesis) for the scalar expression library and
the SimHash kernel. Each property generates a BATCH of examples and evaluates
it in one Spark job, so hypothesis explores the input space without paying
per-example job overhead."""

from __future__ import annotations

import string

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from quantms_utils_spark.functions.core import (
    extract_scan_id,
    file_stem,
    mods_position,
    normalize_ws,
)
from quantms_utils_spark.operators.dedup import simhash

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

RESIDUES = string.ascii_uppercase
words = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8)


@SETTINGS
@given(st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=30))
def test_extract_scan_id_roundtrip(spark, scan_numbers):
    """spectrum=<n> / scan=<n> always extracts exactly <n>."""
    rows = [(f"controllerType=0 spectrum={n}",) for n in scan_numbers] + [
        (f"scan={n}",) for n in scan_numbers
    ]
    df = spark.createDataFrame(rows, "native_id string")
    got = [r[0] for r in df.select(extract_scan_id("native_id")).collect()]
    assert got == [str(n) for n in scan_numbers] * 2


@SETTINGS
@given(st.lists(st.text(alphabet=string.ascii_letters + string.digits + "_-",
                        min_size=1, max_size=12), min_size=1, max_size=20))
def test_file_stem_strips_one_extension(spark, stems):
    rows = [(f"/data/{s}.mzML",) for s in stems] + [(f"{s}.d.zip",) for s in stems]
    df = spark.createDataFrame(rows, "p string")
    got = [r[0] for r in df.select(file_stem("p")).collect()]
    assert got == stems * 2


@SETTINGS
@given(
    st.lists(
        st.tuples(
            st.text(alphabet=RESIDUES, min_size=1, max_size=15),  # prefix residues
            st.sampled_from(["Oxidation", "Carbamidomethyl", "Phospho"]),
            st.text(alphabet=RESIDUES, min_size=0, max_size=15),  # suffix residues
        ),
        min_size=1,
        max_size=20,
    )
)
def test_mods_position_counts_residues(spark, cases):
    """For PREFIX(Mod)SUFFIX the reported position is len(PREFIX)."""
    rows = [(f"{pre}({mod}){suf}",) for pre, mod, suf in cases]
    df = spark.createDataFrame(rows, "peptidoform string")
    got = [r[0] for r in df.select(mods_position("peptidoform")).collect()]
    assert got == [[f"{len(pre)}-{mod}"] for pre, mod, suf in cases]


@SETTINGS
@given(st.lists(words, min_size=1, max_size=25))
def test_simhash_is_token_order_invariant(spark, tokens):
    """SimHash sums per-token contributions, so token order cannot change the
    fingerprint; identical text always collides."""
    forward = " ".join(tokens)
    backward = " ".join(reversed(tokens))
    df = spark.createDataFrame(
        [(forward,), (backward,), (forward,)], "text string"
    ).select(simhash(F.col("text")).alias("h"))
    a, b, c = [r["h"] for r in df.collect()]
    assert a == b == c


@SETTINGS
@given(st.lists(st.text(alphabet=string.ascii_lowercase + " \t\n",
                        min_size=0, max_size=40), min_size=1, max_size=20))
def test_normalize_ws_idempotent(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    once = [r[0] for r in df.select(normalize_ws("t").alias("n")).collect()]
    twice = [
        r[0]
        for r in df.select(normalize_ws(normalize_ws("t")).alias("n")).collect()
    ]
    assert once == twice
    assert all("  " not in (x or "") for x in once)


# --- MS-Numpress codecs (pure Python, no Spark needed) -----------------------


@given(
    st.lists(
        st.floats(min_value=0.001, max_value=5000.0,
                  allow_nan=False, allow_infinity=False),
        min_size=0, max_size=200,
    )
)
@settings(deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_numpress_linear_roundtrip_property(values):
    import numpy as np
    from quantms_utils_spark.sources.numpress import (
        decode_linear, encode_linear, optimal_linear_fixed_point,
    )

    arr = np.sort(np.asarray(values, dtype=np.float64))
    out = decode_linear(encode_linear(arr))
    assert len(out) == len(arr)
    if len(arr):
        fp = optimal_linear_fixed_point(arr)
        assert np.max(np.abs(out - arr)) <= 0.5 / fp + 1e-12


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**32 - 2),
        min_size=0, max_size=200,
    )
)
@settings(deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_numpress_pic_roundtrip_property(counts):
    from quantms_utils_spark.sources.numpress import decode_pic, encode_pic

    out = decode_pic(encode_pic([float(c) for c in counts]))
    assert out.tolist() == [float(c) for c in counts]


@given(
    st.lists(
        st.floats(min_value=0.0, max_value=1e9,
                  allow_nan=False, allow_infinity=False),
        min_size=0, max_size=200,
    )
)
@settings(deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_numpress_slof_relative_error_property(values):
    import numpy as np
    from quantms_utils_spark.sources.numpress import (
        decode_slof, encode_slof, optimal_slof_fixed_point,
    )

    arr = np.asarray(values, dtype=np.float64)
    out = decode_slof(encode_slof(arr))
    assert len(out) == len(arr)
    if len(arr):
        fp = optimal_slof_fixed_point(arr)
        rel = np.exp(0.5 / fp) - 1.0
        assert np.all(np.abs(out - arr) <= (arr + 1.0) * rel + 1e-9)


@SETTINGS
@given(
    st.lists(words, min_size=5, max_size=60),
    st.lists(words, min_size=5, max_size=60),
)
def test_bloom_membership_properties(spark, members, probes):
    """For ANY value sets: every member probes true (no false negatives),
    and with a roomy filter no non-member probes true."""
    from quantms_utils_spark.operators.sketches import (
        bloom_bit_positions,
        bloom_probe,
    )

    mdf = spark.createDataFrame([(m,) for m in set(members)], "g string")
    bloom = bloom_bit_positions(mdf, "g", n_hashes=3, n_bits=1 << 20)
    probe_vals = set(members) | {p + "-out" for p in probes}
    pdf = spark.createDataFrame([(p,) for p in probe_vals], "g string")
    hits = {
        r["g"]: r["bloom_hit"]
        for r in bloom_probe(pdf, bloom, ["g"], "g", 3, 1 << 20).collect()
    }
    for m in set(members):
        assert hits[m], f"false negative for member {m!r}"
    # 2^20 bits vs <=60 members: P(any fp) ~ 1e-7 per probe — treat as exact
    for p in probe_vals - set(members):
        assert not hits[p], f"false positive for non-member {p!r}"


@SETTINGS
@given(st.lists(words, min_size=1, max_size=200))
def test_cms_never_undercounts(spark, tokens):
    """For ANY token multiset: every estimate >= the exact count and the
    cell table stays within depth x width."""
    from collections import Counter

    from quantms_utils_spark.operators.sketches import cms_build, cms_estimate

    depth, width = 3, 64
    tdf = spark.createDataFrame([(t,) for t in tokens], "tok string")
    sketch = cms_build(tdf, "tok", depth, width)
    assert sketch.count() <= depth * width
    est = {
        r["tok"]: r["cms_est"]
        for r in cms_estimate(
            sketch, tdf.distinct(), "tok", depth, width
        ).collect()
    }
    exact = Counter(tokens)
    for tok, cnt in exact.items():
        assert est[tok] >= cnt


def test_fuzzy_name_pairs_basic(spark):
    from pyspark.sql import functions as F

    from quantms_utils_spark.operators.linkage import fuzzy_name_pairs

    df = spark.createDataFrame(
        [
            (1, "small ring"),
            (2, "small ring"),   # exact dup of 1 -> same entity, no pair
            (3, "small rings"),  # distance 1 from "small ring"
            (4, "small wing"),   # distance 2 from "small ring"
            (5, "large bolt"),   # different block
            (6, "small completely-different"),  # same block, too far
        ],
        "id long, name string",
    )
    got = {
        (r.name_a, r.name_b, r.distance, r.n_a, r.n_b)
        for r in fuzzy_name_pairs(
            df, "name", F.split("name", " ").getItem(0), max_distance=2
        ).collect()
    }
    assert got == {
        ("small ring", "small rings", 1, 2, 1),
        ("small ring", "small wing", 1, 2, 1),
        ("small rings", "small wing", 2, 1, 1),
    }


def test_fuzzy_name_pairs_max_block_guard(spark):
    from pyspark.sql import functions as F

    from quantms_utils_spark.operators.linkage import fuzzy_name_pairs

    df = spark.createDataFrame(
        [(i, f"blk name{i}") for i in range(5)] + [(9, "ok pear"), (10, "ok bear")],
        "id long, name string",
    )
    got = fuzzy_name_pairs(
        df, "name", F.split("name", " ").getItem(0), max_distance=2,
        max_block=3,
    ).collect()
    assert {(r.name_a, r.name_b) for r in got} == {("ok bear", "ok pear")}


def test_check_expectations_kinds(spark):
    from quantms_utils_spark.operators.expectations import (
        Expectation,
        check_expectations,
    )

    df = spark.createDataFrame(
        [
            (1, "a", 5.0),
            (2, "b", -1.0),
            (2, None, 50.0),
            (3, "zz", 7.0),
        ],
        "k long, s string, v double",
    )
    rules = [
        Expectation("s_not_null", "not_null", "s"),
        Expectation("k_unique", "unique", "k"),
        Expectation("v_min", "min", "v", (0.0,)),
        Expectation("v_max", "max", "v", (10.0,)),
        Expectation("s_vocab", "accepted", "s", ("a", "b")),
        Expectation("s_shape", "matches", "s", (r"^[a-z]$",)),
        Expectation("enough", "row_count_min", None, (10,)),
    ]
    got = {
        r.rule: (r.n_checked, r.n_violations, r.passed)
        for r in check_expectations(df, rules).collect()
    }
    assert got == {
        "s_not_null": (4, 1, False),
        "k_unique": (4, 1, False),   # k=2 twice -> 1 surplus duplicate
        "v_min": (4, 1, False),
        "v_max": (4, 1, False),
        "s_vocab": (4, 1, False),    # "zz" not accepted; NULL not counted
        "s_shape": (4, 1, False),    # "zz" fails regex; NULL not counted
        "enough": (4, 6, False),     # shortfall of 6 rows
    }


def test_check_expectations_all_pass_and_validation(spark):
    import pytest as _pytest

    from quantms_utils_spark.operators.expectations import (
        Expectation,
        check_expectations,
    )

    df = spark.createDataFrame([(1, "a")], "k long, s string")
    out = check_expectations(
        df,
        [
            Expectation("nn", "not_null", "k"),
            Expectation("rc", "row_count_min", None, (1,)),
        ],
    ).collect()
    assert all(r.passed for r in out)
    with _pytest.raises(ValueError, match="unknown expectation kind"):
        Expectation("x", "nope", "k")
    with _pytest.raises(ValueError, match="needs a column"):
        Expectation("x", "min", None, (0,))
    with _pytest.raises(ValueError, match="non-empty"):
        check_expectations(df, [])
    with _pytest.raises(ValueError, match="unique"):
        check_expectations(
            df,
            [
                Expectation("dup", "not_null", "k"),
                Expectation("dup", "not_null", "s"),
            ],
        )


def test_edit_distance_pairs_short_strings_complete(spark):
    """Short strings (len <= q-1+d*q) may share ZERO q-grams while being
    within edit distance — the brute-force branch must still find them,
    and names shorter than q must not be dropped (they have no grams at
    all)."""
    from quantms_utils_spark.operators.linkage import edit_distance_pairs

    df = spark.createDataFrame(
        [
            (1, "ab"),    # shares no 2-gram with "cd" yet distance 2
            (2, "cd"),
            (3, "a"),     # shorter than q=2: zero grams
            (4, "b"),     # distance 1 from "a"
            (5, "abcdefgh"),  # long: gram branch only
            (6, "abcdefgx"),  # distance 1 from above
        ],
        "id long, name string",
    )
    got = {
        (r.name_a, r.name_b, r.distance)
        for r in edit_distance_pairs(df, "name", max_distance=2, q=2).collect()
    }
    assert ("ab", "cd", 2) in got           # zero shared grams, short branch
    assert ("a", "b", 1) in got             # below-q names kept
    assert ("a", "ab", 1) in got
    assert ("ab", "b", 1) in got
    assert ("abcdefgh", "abcdefgx", 1) in got  # gram branch intact
    # no cross-branch pair can be in range: "ab" vs "abcdefgh" is distance 6
    assert all(d <= 2 for (_, _, d) in got)


def test_edit_distance_pairs_no_duplicate_across_branches(spark):
    """A pair must be emitted by exactly one branch (threshold split is a
    partition, not an overlap)."""
    from quantms_utils_spark.operators.linkage import edit_distance_pairs

    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(["abc", "abd", "abcdef", "abcdeg"])],
        "id long, name string",
    )
    rows = edit_distance_pairs(df, "name", max_distance=1, q=2).collect()
    pairs = [(r.name_a, r.name_b) for r in rows]
    assert len(pairs) == len(set(pairs))
    assert set(pairs) == {("abc", "abd"), ("abcdef", "abcdeg")}


@SETTINGS
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=(1 << 8) - 1),
            st.integers(min_value=0, max_value=(1 << 8) - 1),
            st.integers(min_value=0, max_value=(1 << 8) - 1),
        ),
        min_size=1,
        max_size=24,
    )
)
def test_zorder_key_deinterleave_roundtrip(spark, pts):
    """Morton interleaving is a bijection on masked coordinates: decoding
    bit i*ndims+d of the key recovers dimension d exactly, for 2-D and
    3-D, over the whole batch in one job. Injectivity follows (distinct
    coordinate tuples -> distinct keys)."""
    from quantms_utils_spark.operators.layout import zorder_key

    bits = 8
    df = spark.createDataFrame(pts, "x int, y int, z int")
    got = df.select(
        "x", "y", "z",
        zorder_key([F.col("x"), F.col("y")], bits=bits).alias("k2"),
        zorder_key([F.col("x"), F.col("y"), F.col("z")], bits=bits).alias("k3"),
    ).collect()

    def dec(key, ndims, d):
        return sum(((key >> (i * ndims + d)) & 1) << i for i in range(bits))

    for r in got:
        assert (dec(r["k2"], 2, 0), dec(r["k2"], 2, 1)) == (r["x"], r["y"])
        assert (
            dec(r["k3"], 3, 0), dec(r["k3"], 3, 1), dec(r["k3"], 3, 2)
        ) == (r["x"], r["y"], r["z"])
    assert len({(r["x"], r["y"], r["z"]) for r in got}) == len(
        {r["k3"] for r in got}
    )


# ---------------------------------------------------------------------------
# round-10 properties: codec roundtrips + null-safe diff semantics


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=400
    ),
    st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_property(samples, rate):
    """encode_wav -> decode_wav_samples is the identity on int16 PCM, and
    decode_wav's rms matches the direct numpy computation."""
    import numpy as np

    from quantms_utils_spark.functions.media_codecs import (
        decode_wav,
        decode_wav_samples,
        encode_wav,
    )

    x = np.asarray(samples, dtype=np.int16)
    payload = encode_wav(x, rate)
    got_rate, got = decode_wav_samples(payload)
    assert got_rate == rate
    assert np.array_equal(got, x.astype(np.int64))
    sr, n, dur, rms = decode_wav(payload)
    assert (sr, n) == (rate, len(x))
    want_rms = round(float(np.sqrt(((x / 32768.0) ** 2).mean())), 6)
    assert abs(rms - want_rms) <= 1e-6


@settings(max_examples=20, deadline=None)
@given(
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=1, max_value=9),
    st.sampled_from([1, 3, 4]),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_png_roundtrip_property(h, w, c, seed):
    """encode_png -> decode_png is the identity on random uint8 pixel
    arrays for gray/RGB/RGBA."""
    import numpy as np

    from quantms_utils_spark.functions.media_codecs import (
        decode_png,
        encode_png,
    )

    rng = np.random.RandomState(seed % (2**31 - 1))
    px = rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)
    got = decode_png(encode_png(px))
    assert np.array_equal(got, px.reshape(h, w, c))


_diff_keys = st.one_of(st.none(), st.integers(min_value=0, max_value=5))
_diff_vals = st.one_of(st.none(), st.integers(min_value=0, max_value=3))


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.dictionaries(_diff_keys, _diff_vals, max_size=6),
    st.dictionaries(_diff_keys, _diff_vals, max_size=6),
)
def test_table_diff_matches_null_safe_reference(spark, old_map, new_map):
    """table_diff (hash and exact modes) agrees with a brute-force
    null-safe dict reference on random snapshots, NULL keys and NULL
    values included (round-10 null-safe key contract)."""
    from quantms_utils_spark.operators.diff import table_diff

    old = spark.createDataFrame(
        [(k, v) for k, v in old_map.items()] or [(99, 99)], "k int, v int"
    )
    new = spark.createDataFrame(
        [(k, v) for k, v in new_map.items()] or [(99, 99)], "k int, v int"
    )
    om = old_map or {99: 99}
    nm = new_map or {99: 99}
    want = {}
    for k in set(om) | set(nm):
        if k not in nm:
            want[k] = "deleted"
        elif k not in om:
            want[k] = "inserted"
        elif om[k] != nm[k]:
            want[k] = "updated"
        else:
            want[k] = "unchanged"
    for exact in (False, True):
        got = {
            r["k"]: r["status"]
            for r in table_diff(
                old, new, keys=["k"], exact=exact, include_unchanged=True
            ).collect()
        }
        assert got == want


@settings(max_examples=20, deadline=None)
@given(
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=0, max_value=2**31 - 2),
)
def test_bmp_ppm_roundtrip_property(h, w, seed):
    """encode/decode are identities for 24-bit BMP (incl. the bottom-up row
    order + stride padding) and P6 PPM on random RGB arrays."""
    import numpy as np

    from quantms_utils_spark.functions.media_codecs import (
        decode_bmp,
        decode_ppm,
        encode_bmp,
        encode_ppm,
    )

    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)
    assert np.array_equal(decode_ppm(encode_ppm(px)), px)


@settings(max_examples=15, deadline=None)
@given(
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=1, max_value=5),
    st.sampled_from([(30, 1), (24, 1), (30000, 1001)]),
    st.integers(min_value=0, max_value=2**31 - 2),
)
def test_y4m_roundtrip_property(h, w, n_frames, fps, seed):
    """encode_y4m_mono -> decode_y4m returns every Y plane byte-exact with
    the declared geometry and frame rate."""
    import numpy as np

    from quantms_utils_spark.functions.media_codecs import (
        decode_y4m,
        encode_y4m_mono,
    )

    rng = np.random.RandomState(seed)
    frames = [
        rng.randint(0, 256, size=(h, w), dtype=np.uint8)
        for _ in range(n_frames)
    ]
    num, den = fps
    gw, gh, gfps, got = decode_y4m(encode_y4m_mono(frames, num, den))
    assert (gw, gh) == (w, h)
    assert abs(gfps - num / den) < 1e-12
    assert len(got) == n_frames
    assert all(bytes(f.tobytes()) == g for f, g in zip(frames, got))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.dictionaries(
        st.one_of(st.none(), st.integers(min_value=0, max_value=7)),
        st.tuples(st.sampled_from(["a", "b"]),
                  st.integers(min_value=0, max_value=50)),
        max_size=8,
    ),
    st.dictionaries(
        st.one_of(st.none(), st.integers(min_value=0, max_value=7)),
        st.tuples(st.sampled_from(["a", "b"]),
                  st.integers(min_value=0, max_value=50)),
        max_size=8,
    ),
)
def test_maintain_count_sum_equals_fresh_rebuild(spark, old_map, new_map):
    """The incremental (count, sum) view refresh equals a fresh rebuild of
    the new snapshot on random old/new snapshots — group moves, NULL keys,
    inserts, deletes, and updates all included."""
    from pyspark.sql import functions as F

    from quantms_utils_spark.operators.diff import maintain_count_sum

    if not old_map or not new_map:
        return  # empty frames need explicit schemas; covered by unit tests
    old = spark.createDataFrame(
        [(k, g, float(v)) for k, (g, v) in old_map.items()],
        "k int, g string, v double",
    )
    new = spark.createDataFrame(
        [(k, g, float(v)) for k, (g, v) in new_map.items()],
        "k int, g string, v double",
    )
    got = {
        (r["g"], r["n_rows"], float(r["total"]))
        for r in maintain_count_sum(old, new, ["k"], "g", "v").collect()
    }
    want = {
        (r["g"], r["n_rows"], float(r["total"]))
        for r in new.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("v").cast("decimal(18,2)")).alias("total"),
        )
        .collect()
    }
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["red", "blue", "fox", "jumps", "lazy", "dog"]),
            min_size=3,
            max_size=8,
        ),
        min_size=2,
        max_size=12,
    )
)
def test_lsh_max_bucket_guard_path_equivalence(spark, docs_tokens):
    """The round-10 count pre-pass path (max_bucket set) emits exactly the
    plain path's pairs whenever no bucket exceeds the cap (cap = corpus
    size makes the guard a semantic no-op), and is always a subset of the
    plain path's pairs for any smaller cap — on random corpora."""
    from quantms_utils_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs_tokens)],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(
        docs, "doc_id", "text", n_hashes=8, shingle_n=3,
        hash_family="xxhash64",
    )
    plain = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(sigs, "doc_id", 8, 2).collect()
    }
    noop = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(
            sigs, "doc_id", 8, 2, max_bucket=len(docs_tokens)
        ).collect()
    }
    assert noop == plain
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(
            sigs, "doc_id", 8, 2, max_bucket=3
        ).collect()
    }
    assert capped <= plain


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["http", "https", "HTTP", "HTTPS"]),
            st.sampled_from(["Host.Example", "a.b.c", "X.org"]),
            st.sampled_from(["", ":80", ":443", ":8080"]),
            st.sampled_from(["", "/p", "/p/q"]),
            st.sampled_from(["", "?b=2&a=1", "?z=9"]),
            st.sampled_from(["", "#frag"]),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_normalize_url_idempotent_property(spark, parts):
    """normalize_url is idempotent — canonical output re-normalizes to
    itself — across scheme/host case, default and non-default ports,
    query order, and fragments."""
    from quantms_utils_spark.operators.web import normalize_url

    urls = [f"{s}://{h}{port}{path}{q}{frag}"
            for s, h, port, path, q, frag in parts]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    once = df.select(normalize_url(F.col("u")).alias("n1"))
    twice = once.select(
        F.col("n1"), normalize_url(F.col("n1")).alias("n2")
    ).collect()
    for r in twice:
        assert r["n1"] == r["n2"]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 100)),
        min_size=1, max_size=10, unique=True,
    ),
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 100),
                  st.integers(0, 999)),
        min_size=0, max_size=10,
        unique_by=lambda t: (t[0], t[1]),
    ),
)
def test_asof_join_matches_bruteforce(spark, lefts, rights):
    """asof_join (union+window form) equals the brute-force backward-
    inclusive lookup: for each left row, the right row with the greatest
    right_ts <= left_ts within the same key."""
    from quantms_utils_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(k, t) for k, t in lefts], "k int, lt int"
    )
    right = spark.createDataFrame(
        [(k, t, v) for k, t, v in rights] or [(99, 0, 0)],
        "k int, rt int, v int",
    )
    rmap = {}
    rrows = rights or [(99, 0, 0)]
    got = {
        (r["k"], r["lt"]): r["v"]
        for r in asof_join(
            left, right, on=["k"], left_ts="lt", right_ts="rt",
            right_value_cols=["v"],
        ).collect()
    }
    for k, lt in lefts:
        cand = [(rt, v) for rk, rt, v in rrows if rk == k and rt <= lt]
        want = max(cand)[1] if cand else None
        assert got[(k, lt)] == want, (k, lt, want, got[(k, lt)])


# ---------------------------------------------------------------------------
# Round-11 property program: the relational core (VERDICT r10 item 2) —
# two-phase global rank, binned range join, weighted quantile, chunked
# EWMA, and gap-islands, each against a brute-force / single-partition
# reference on random frames.
# ---------------------------------------------------------------------------


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(st.integers(-1000, 1000), min_size=1, max_size=60),
    st.integers(min_value=2, max_value=9),
)
def test_global_row_number_matches_single_partition_window(spark, vals, nparts):
    """Two-phase rank (range partition → local index → offset map) must
    reproduce the single-partition row_number exactly — including at
    partition boundaries, with duplicate sort values (id tiebreak), and
    when num_partitions exceeds the row count."""
    from pyspark.sql import Window

    from quantms_utils_spark.operators.rank import (
        global_ntile,
        global_row_number,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long"
    )
    got = {
        (r["id"], r["rnk"])
        for r in global_row_number(
            df, [F.col("v"), F.col("id")], num_partitions=nparts
        ).collect()
    }
    w = Window.orderBy("v", "id")
    want = {
        (r["id"], r["rnk"])
        for r in df.withColumn("rnk", F.row_number().over(w)).collect()
    }
    assert got == want

    n_buckets = 4
    got_nt = {
        (r["id"], r["bucket"])
        for r in global_ntile(
            df, [F.col("v"), F.col("id")], n_buckets, num_partitions=nparts
        ).collect()
    }
    want_nt = {
        (r["id"], r["bucket"])
        for r in df.withColumn(
            "bucket", F.ntile(n_buckets).over(w)
        ).collect()
    }
    assert got_nt == want_nt


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(-50, 50), st.integers(0, 20)
        ),  # (lo, width) — width 0 = zero-width interval on a bin edge
        min_size=1,
        max_size=15,
    ),
    st.lists(st.integers(-60, 80), min_size=1, max_size=25),
    st.sampled_from([0.5, 1.0, 3.0, 7.5, 100.0]),
)
def test_range_join_binned_matches_naive_theta(spark, intervals, points, width):
    """The binned range join must emit exactly the naive theta join's
    pairs for any bin width — intervals touching bin edges, zero-width
    intervals, and bins far wider than the data included."""
    from quantms_utils_spark.operators.joins import range_join_binned

    iv = spark.createDataFrame(
        [(i, float(lo), float(lo + w)) for i, (lo, w) in enumerate(intervals)],
        "iid long, lo double, hi double",
    )
    pt = spark.createDataFrame(
        [(j, float(p)) for j, p in enumerate(points)], "pid long, p double"
    )
    got = {
        (r["iid"], r["pid"])
        for r in range_join_binned(
            iv, pt, lo_col="lo", hi_col="hi", point_col="p", bin_width=width
        ).collect()
    }
    want = {
        (i, j)
        for i, (lo, w) in enumerate(intervals)
        for j, p in enumerate(points)
        if lo <= p <= lo + w
    }
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.integers(-100, 100), st.integers(1, 9)),
        min_size=1,
        max_size=30,
    ),
    st.sampled_from([0.25, 0.5, 0.75, 1.0]),
)
def test_weighted_quantile_matches_sorted_list_reference(spark, rows, q):
    """weighted_quantile == the sorted-list definition: smallest value
    whose running weight reaches q·total (integer weights and dyadic q so
    the threshold compare is float-exact on both sides)."""
    from quantms_utils_spark.operators.windows import weighted_quantile

    df = spark.createDataFrame(
        [(i, float(v), float(w)) for i, (v, w) in enumerate(rows)],
        "id long, v double, w double",
    )
    got = weighted_quantile(
        df, [], "v", "w", q=q, order_tiebreak=["id"]
    ).collect()[0]

    ordered = sorted((v, i, w) for i, (v, w) in enumerate(rows))
    total = sum(w for _, _, w in ordered)
    cum, want = 0.0, None
    for v, _, w in ordered:
        cum += w
        if cum >= q * total:
            want = float(v)
            break
    assert got["v_q"] == want
    assert float(got["total_weight"]) == total


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.floats(
            min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=40,
    ),
    st.sampled_from([2, 3, 8]),
)
def test_ewma_chunked_matches_sequential_fold_property(spark, vals, chunk):
    """ewma_chunked (two-level affine-map fold) == the sequential fold
    s1=v1, s_i=αv_i+(1−α)s_{i−1}, to float re-association tolerance, for
    random values and chunk sizes that force multi-chunk merges."""
    from quantms_utils_spark.operators.windows import ewma_chunked

    df = spark.createDataFrame(
        [("u", i, float(v)) for i, v in enumerate(vals)],
        "k string, seq long, v double",
    )
    got = ewma_chunked(
        df, ["k"], ["seq"], "v", alpha=0.3, chunk_size=chunk
    ).collect()[0]

    s = vals[0]
    for v in vals[1:]:
        s = 0.3 * v + 0.7 * s
    assert got["n_events"] == len(vals)
    assert got["ewma"] == pytest.approx(s, rel=1e-9, abs=1e-9)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.sets(st.integers(0, 200), min_size=1, max_size=60))
def test_gap_islands_shape_matches_brute_force(spark, keys):
    """The gaps-and-islands shape (key − global row_number constant per
    contiguous run) must recover exactly the brute-force runs of any
    sparse key set."""
    from quantms_utils_spark.operators.rank import global_row_number

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    ranked = global_row_number(df, [F.col("k")], rank_col="rn")
    got = {
        (r["s"], r["e"], r["n"])
        for r in ranked.withColumn("island", F.col("k") - F.col("rn"))
        .groupBy("island")
        .agg(
            F.min("k").alias("s"), F.max("k").alias("e"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    want, run = set(), []
    for k in sorted(keys):
        if run and k != run[-1] + 1:
            want.add((run[0], run[-1], len(run)))
            run = []
        run.append(k)
    want.add((run[0], run[-1], len(run)))
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 20000)),
        min_size=1,
        max_size=40,
    )
)
def test_sessionize_lag_flag_matches_brute_force(spark, events):
    """The lag + cumulative-flag sessionization (30-min gap) must produce
    the same per-session event counts as a sequential brute-force walk of
    each user's ordered timestamps."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(u, i, float(t)) for i, (u, t) in enumerate(events)],
        "user_id int, event_id long, ts double",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    flag = F.when(prev.isNull() | ((F.col("ts") - prev) > 1800), 1).otherwise(0)
    sess = df.withColumn(
        "sess_id",
        F.sum(flag).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    got = sorted(
        (r["user_id"], r["sess_id"], r["n"])
        for r in sess.groupBy("user_id", "sess_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )

    by_user: dict[int, list[tuple[float, int]]] = {}
    for i, (u, t) in enumerate(events):
        by_user.setdefault(u, []).append((float(t), i))
    want = []
    for u, ts in by_user.items():
        ts.sort()
        sid, n, last = 1, 0, None
        for t, _ in ts:
            if last is not None and t - last > 1800:
                want.append((u, sid, n))
                sid, n = sid + 1, 0
            n += 1
            last = t
        want.append((u, sid, n))
    assert got == sorted(want)


# ---------------------------------------------------------------------------
# Round-11 batch 2: join-family exactness properties — pigeonhole SimHash
# banding, the interval-overlap ownership trick, as-of with NULLs, salted
# join row-identity, and tie-group rank — each vs brute force.
# ---------------------------------------------------------------------------


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=2,
        max_size=20,
    ),
    st.integers(min_value=0, max_value=3),
)
def test_simhash_pairs_pigeonhole_exactness(spark, fps_vals, max_h):
    """Banded SimHash candidate generation is EXACT (no false negatives)
    whenever max_hamming < n_bands: the output must equal the brute-force
    set of pairs within Hamming distance max_h, for random 64-bit
    fingerprints including negatives."""
    from quantms_utils_spark.operators.dedup import simhash_pairs

    fps = spark.createDataFrame(
        [(i, v) for i, v in enumerate(fps_vals)], "doc_id long, fp long"
    )
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_pairs(
            fps, "doc_id", "fp", max_hamming=max_h, n_bands=4
        ).collect()
    }
    want = set()
    for i, a in enumerate(fps_vals):
        for j, b in enumerate(fps_vals):
            if i < j:
                h = bin((a ^ b) & ((1 << 64) - 1)).count("1")
                if h <= max_h:
                    want.add((i, j, h))
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.integers(-40, 40), st.integers(0, 15)),
        min_size=1,
        max_size=12,
    ),
    st.lists(
        st.tuples(st.integers(-40, 40), st.integers(0, 15)),
        min_size=1,
        max_size=12,
    ),
    st.sampled_from([1.0, 4.0, 13.0]),
)
def test_interval_overlap_join_ownership_exactly_once(spark, ls, rs, width):
    """The bin-OWNERSHIP trick must emit every overlapping pair EXACTLY
    once (no distinct pass exists to hide duplicates) — including pairs
    sharing many bins, touching at a single point, and zero-width
    intervals sitting on bin edges."""
    from quantms_utils_spark.operators.joins import interval_overlap_join

    left = spark.createDataFrame(
        [(i, float(lo), float(lo + w)) for i, (lo, w) in enumerate(ls)],
        "lid long, lo double, hi double",
    )
    right = spark.createDataFrame(
        [(j, float(lo), float(lo + w)) for j, (lo, w) in enumerate(rs)],
        "rid long, lo double, hi double",
    )
    rows = interval_overlap_join(
        left, right, lo_col="lo", hi_col="hi", bin_width=width
    ).collect()
    got = sorted((r["lid"], r["rid_r"]) for r in rows)
    want = sorted(
        (i, j)
        for i, (llo, lw) in enumerate(ls)
        for j, (rlo, rw) in enumerate(rs)
        if llo <= rlo + rw and rlo <= llo + lw
    )
    assert got == want  # sorted-with-duplicates compare: exactly-once


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", None]),
            st.one_of(st.none(), st.integers(0, 50)),
        ),
        min_size=1,
        max_size=15,
    ),
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", None]),
            st.one_of(st.none(), st.integers(0, 50)),
            st.integers(0, 9),
        ),
        min_size=0,
        max_size=15,
    ),
)
def test_asof_join_matches_brute_force_with_nulls(spark, lrows, rrows):
    """asof_join == the SQL definition (greatest right_ts <= left_ts per
    key; NULL keys/ts never match) on random frames WITH NULL keys and
    NULL timestamps on both sides. Right payloads are de-tied by taking
    the max payload at the winning timestamp, mirroring a deterministic
    brute force."""
    from quantms_utils_spark.operators.joins import asof_join

    # de-dup right (key, ts) so the as-of pick is deterministic
    seen = {}
    for k, t, p in rrows:
        seen[(k, t)] = max(seen.get((k, t), -1), p)
    rr = [(k, t, p) for (k, t), p in seen.items()]

    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lrows)],
        "id long, k string, ts int",
    )
    right = spark.createDataFrame(rr, "k string, ts int, payload int") if rr \
        else spark.createDataFrame([], "k string, ts int, payload int")
    got = {
        r["id"]: r["payload"]
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts",
            right_value_cols=["payload"],
        ).collect()
    }
    for i, (k, t) in enumerate(lrows):
        cands = [
            (rt, p) for rk, rt, p in rr
            if rk is not None and rt is not None
            and k is not None and t is not None
            and rk == k and rt <= t
        ]
        want = max(cands)[1] if cands else None
        assert got[i] == want, (i, k, t, got[i], want)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.sampled_from(["hot", "warm", "cold", None]),
        min_size=1,
        max_size=60,
    ),
    st.sampled_from(["inner", "left"]),
)
def test_salted_join_row_identical_to_plain(spark, keys, how):
    """salted_join == the plain join row-for-row — under a hot key
    (most rows share one value), NULL keys (never match, survive only
    under 'left'), and both supported join types."""
    from quantms_utils_spark.operators.skew import salted_join

    big = spark.createDataFrame(
        [(i, k) for i, k in enumerate(keys)], "id long, k string"
    )
    small = spark.createDataFrame(
        [("hot", 1), ("cold", 2)], "k string, w int"
    )
    got = sorted(
        (r["id"], r["w"])
        for r in salted_join(big, small, on=["k"], n_salts=4, how=how).collect()
    )
    plain = sorted(
        (r["id"], r["w"]) for r in big.join(small, ["k"], how).collect()
    )
    assert got == plain


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.one_of(st.none(), st.integers(-5, 5)),
        min_size=1,
        max_size=40,
    )
)
def test_global_rank_matches_window_rank_with_ties_and_nulls(spark, vals):
    """Two-phase global_rank (min aggregate over tie groups, null-safe
    merge join) == rank() over the global window — ties share a rank,
    gaps follow, NULL tie values rank as one group."""
    from pyspark.sql import Window

    from quantms_utils_spark.operators.rank import global_rank

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v int"
    )
    got = {
        (r["id"], r["rnk"])
        for r in global_rank(
            df, [F.col("v"), F.col("id")], tie_cols=["v"], num_partitions=3
        ).collect()
    }
    w = Window.orderBy("v")
    want = {
        (r["id"], r["rnk"])
        for r in df.withColumn("rnk", F.rank().over(w)).collect()
    }
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.sampled_from(["g1", "g2"]), st.integers(-100, 100)),
        min_size=1,
        max_size=30,
    )
)
def test_exclusive_prefix_sum_matches_brute_force(spark, rows):
    """exclusive_prefix_sum == the running sum of everything strictly
    before the row, per partition (first row 0.0)."""
    from quantms_utils_spark.operators.windows import exclusive_prefix_sum

    df = spark.createDataFrame(
        [(g, i, float(v)) for i, (g, v) in enumerate(rows)],
        "g string, seq long, v double",
    )
    got = {
        (r["g"], r["seq"]): r["prefix_sum"]
        for r in exclusive_prefix_sum(df, "v", ["g"], ["seq"]).collect()
    }
    acc: dict[str, float] = {}
    for i, (g, v) in enumerate(rows):
        assert got[(g, i)] == pytest.approx(acc.get(g, 0.0))
        acc[g] = acc.get(g, 0.0) + float(v)


# ---------------------------------------------------------------------------
# Round-11 batch 3: iterative graph operators vs brute force — pointer
# doubling (tree_depths), frontier BFS, k-core peeling, and the two-join
# triangle census on random graphs.
# ---------------------------------------------------------------------------


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(st.integers(1, 25), min_size=1, max_size=25, unique=True))
def test_tree_depths_matches_sequential_walk(spark, nodes):
    """Pointer doubling == a sequential parent walk on random forests
    (each node's parent drawn below it, so chains can approach the node
    count and exercise multi-round doubling)."""
    from quantms_utils_spark.operators.graph import tree_depths

    # parent of node n = the largest smaller member (deep chains) for odd
    # nodes, the root for even ones — deterministic, data-derived shape
    ordered = sorted(nodes)
    parent = {}
    for i, n in enumerate(ordered):
        if i == 0 or n % 2 == 0:
            parent[n] = 0
        else:
            parent[n] = ordered[i - 1]
    rows = [(n, p) for n, p in parent.items()] + [(0, 0)]
    df = spark.createDataFrame(rows, "node long, parent long")
    got = {
        r["node"]: r["depth"]
        for r in tree_depths(df, root=0, max_rounds=6).collect()
    }

    def walk(n):
        d = 0
        while n != 0:
            n = parent[n]
            d += 1
        return d

    want = {n: walk(n) for n in parent} | {0: 0}
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=40,
    ),
    st.booleans(),
)
def test_bfs_hops_matches_brute_force(spark, pairs, directed):
    """Frontier BFS == a brute-force level walk from source 0, for random
    (multi-)edge lists with self-loops, both directed and undirected."""
    from quantms_utils_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame(pairs, "src long, dst long")
    sources = spark.createDataFrame([(0,)], "id long")
    got = {
        r["v"]: r["hop"]
        for r in bfs_hops(
            edges, sources, max_hops=6, directed=directed
        ).collect()
    }

    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        if a != b:
            adj.setdefault(a, set()).add(b)
            if not directed:
                adj.setdefault(b, set()).add(a)
    want, frontier = {0: 0}, {0}
    for hop in range(1, 7):
        nxt = set()
        for v in frontier:
            for u in adj.get(v, ()):
                if u not in want:
                    want[u] = hop
                    nxt.add(u)
        frontier = nxt
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 10), st.integers(0, 10)),
        min_size=1,
        max_size=35,
    ),
    st.integers(1, 4),
)
def test_k_core_matches_brute_force_peeling(spark, pairs, k):
    """Iterative k-core == brute-force peeling (repeatedly delete
    vertices of degree < k in the simple undirected graph)."""
    from quantms_utils_spark.operators.graph import k_core

    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = {r["v"] for r in k_core(edges, k=k).collect()}

    simple = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    verts = {v for e in simple for v in e}
    while True:
        deg: dict[int, int] = {v: 0 for v in verts}
        for a, b in simple:
            if a in verts and b in verts:
                deg[a] += 1
                deg[b] += 1
        drop = {v for v, d in deg.items() if d < k}
        if not drop:
            break
        verts -= drop
        simple = {e for e in simple if e[0] in verts and e[1] in verts}
    assert got == verts


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1,
        max_size=30,
    )
)
def test_triangle_count_matches_brute_force(spark, pairs):
    """Two-join triangle census == brute-force enumeration over the
    simple undirected graph (duplicates/orientations/self-loops in the
    input collapse first)."""
    from itertools import combinations

    from quantms_utils_spark.operators.graph import triangle_count

    edges = spark.createDataFrame(pairs, "src long, dst long")
    row = triangle_count(edges).collect()[0]

    simple = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    verts = {v for e in simple for v in e}
    deg = {v: sum(1 for e in simple if v in e) for v in verts}
    n_wedges = sum(d * (d - 1) // 2 for d in deg.values())
    n_tri = sum(
        1
        for a, b, c in combinations(sorted(verts), 3)
        if ((a, b) in simple and (a, c) in simple and (b, c) in simple)
    )
    assert row["n_edges"] == len(simple)
    assert row["n_wedges"] == n_wedges
    assert row["n_triangles"] == n_tri


# ---------------------------------------------------------------------------
# Round-11 batch 4: distributed-ML operators vs pure-Python references —
# full-batch logreg GD, PSI, and the whale-safe chunked EWMA's affine
# composition under adversarial chunk boundaries.
# ---------------------------------------------------------------------------


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.floats(
                min_value=-5, max_value=5,
                allow_nan=False, allow_infinity=False,
            ),
            st.floats(
                min_value=-5, max_value=5,
                allow_nan=False, allow_infinity=False,
            ),
            st.integers(0, 1),
        ),
        min_size=2,
        max_size=25,
    ),
    st.integers(1, 3),
)
def test_logreg_train_matches_python_gd(spark, rows, n_iter):
    """Distributed full-batch GD == the sequential Python replica: same
    zero init, same per-update rounding, bit-identical weights (the
    rounding absorbs partial-sum re-association)."""
    import math

    from quantms_utils_spark.operators.ml import logreg_train

    df = spark.createDataFrame(rows, "x0 double, x1 double, y int")
    got = logreg_train(df, ["x0", "x1"], "y", n_iter=n_iter, lr=0.5)

    w = [0.0, 0.0]
    n = len(rows)
    for _ in range(n_iter):
        g = [0.0, 0.0]
        for x0, x1, y in rows:
            p = 1.0 / (1.0 + math.exp(-(w[0] * x0 + w[1] * x1)))
            err = p - y
            g[0] += err * x0
            g[1] += err * x1
        w = [round(w[i] - 0.5 * g[i] / n, 6) for i in range(2)]
    # per-update rounding to 1e-6 makes the trajectory engine-stable, but
    # the PRE-round partial sums can re-associate across partitions — a
    # value landing within half an ulp of a .5e-6 boundary may round the
    # other way, so compare at the rounding quantum, not bit-exactly
    assert got == pytest.approx(w, abs=2e-6)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(st.integers(0, 4), min_size=1, max_size=40),
    st.lists(st.integers(0, 4), min_size=1, max_size=40),
)
def test_population_stability_matches_python_reference(spark, xs, ys):
    """PSI == the textbook formula with Laplace smoothing over the union
    bin set, including bins present on only one side."""
    import math
    from collections import Counter

    from quantms_utils_spark.operators.ml import population_stability

    a = spark.createDataFrame([(x,) for x in xs], "bin int")
    b = spark.createDataFrame([(y,) for y in ys], "bin int")
    out = population_stability(a, b, smoothing=1.0).collect()
    got = {r["bin"]: r["psi_term"] for r in out}

    ca, cb = Counter(xs), Counter(ys)
    bins = sorted(set(ca) | set(cb))
    ta, tb, k = len(xs), len(ys), len(bins)
    for bn in bins:
        pa = (ca.get(bn, 0) + 1.0) / (ta + k)
        pb = (cb.get(bn, 0) + 1.0) / (tb + k)
        want = (pa - pb) * math.log(pa / pb)
        assert got[bn] == pytest.approx(want, rel=1e-12, abs=1e-15), bn
    assert set(got) == set(bins)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.integers(2, 5),  # chunk_size
    st.integers(1, 4),  # n_chunks-ish multiplier
    st.integers(0, 4),  # remainder
)
def test_ewma_chunked_exact_chunk_boundary_composition(
    spark, chunk, mult, rem
):
    """Affine-map composition at EXACT chunk boundaries: n = chunk·mult +
    rem rows, so the last chunk is full, empty-remainder, or partial —
    the three boundary shapes of the two-level fold — always equals the
    sequential recursion."""
    from quantms_utils_spark.operators.windows import ewma_chunked

    n = chunk * mult + rem
    if n == 0:
        return
    vals = [float((i * 37 % 19) - 9) for i in range(n)]
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(vals)],
        "k string, seq long, v double",
    )
    got = ewma_chunked(
        df, ["k"], ["seq"], "v", alpha=0.25, chunk_size=chunk
    ).collect()[0]
    s = vals[0]
    for v in vals[1:]:
        s = 0.25 * v + 0.75 * s
    assert got["n_events"] == n
    assert got["ewma"] == pytest.approx(s, rel=1e-9, abs=1e-12)


# ---------------------------------------------------------------------------
# Round-11 batch 5: retrieval — BM25 vs a pure-Python Okapi reference on
# random corpora and queries (bag semantics, matching-docs-only contract).
# ---------------------------------------------------------------------------


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["fox", "dog", "red", "blue", "runs", "sky"]),
            min_size=1,
            max_size=10,
        ),
        min_size=1,
        max_size=12,
    ),
    st.lists(
        st.sampled_from(["fox", "dog", "red", "missing"]),
        min_size=1,
        max_size=4,
    ),
)
def test_bm25_scores_match_python_reference(spark, docs_tokens, query):
    """bm25_scores == the textbook Okapi BM25 with the BM25+ idf and bag
    query semantics, computed sequentially in Python — including repeated
    query terms and terms absent from the corpus; docs matching no term
    must be absent."""
    import math
    from collections import Counter

    from quantms_utils_spark.operators.retrieval import bm25_scores

    k1, b = 1.2, 0.75
    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs_tokens)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(docs, query, k1=k1, b=b).collect()
    }

    n = len(docs_tokens)
    avgdl = sum(len(t) for t in docs_tokens) / n
    qcounts = Counter(query)
    dfreq = {
        t: sum(1 for toks in docs_tokens if t in toks) for t in qcounts
    }
    want = {}
    for i, toks in enumerate(docs_tokens):
        tf = Counter(toks)
        s = 0.0
        for t, qf in qcounts.items():
            if tf.get(t, 0) == 0:
                continue
            idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            denom = tf[t] + k1 * (1.0 - b + b * len(toks) / avgdl)
            s += qf * idf * tf[t] * (k1 + 1.0) / denom
        if s > 0.0:
            want[i] = s
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], rel=1e-9), i


# ---------------------------------------------------------------------------
# Round 12 (VERDICT item 2): sketch estimate-error bounds, zone-map/Bloom
# manifest prune-safety, and streaming-vs-batch sessionizer equivalence.


@SETTINGS
@given(
    st.lists(
        st.integers(min_value=0, max_value=10**6), min_size=1, max_size=400
    ),
    st.integers(min_value=2, max_value=5),
)
def test_hll_shard_union_equals_direct_and_error_bound(spark, vals, n_shards):
    """Spark's HLL (Datasketches) registers are max-merged, so
    `hll_union_agg` over per-shard sketches is REGISTER-IDENTICAL to one
    global `hll_sketch_agg` — the estimate must match exactly (this is the
    rollup contract `event_hll_rollup` rests on). And the estimate stays
    within a generous multiple of the default-lgConfigK standard error of
    the exact distinct count (bound ~12 sigma; a systematic bias would
    trip it, sampling noise never will)."""
    rows = [(i % n_shards, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "shard int, v long")
    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("v")).alias("e")
    ).collect()[0]["e"]
    merged = (
        df.groupBy("shard")
        .agg(F.hll_sketch_agg("v").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .collect()[0]["e"]
    )
    exact = len(set(vals))
    assert merged == direct
    assert abs(direct - exact) <= max(3, 0.2 * exact)


@SETTINGS
@given(
    st.lists(
        st.integers(min_value=-(10**9), max_value=10**9),
        min_size=1,
        max_size=500,
    )
)
def test_kmv_estimate_error_bound_and_shard_merge_identity(spark, vals):
    """KMV contract on random sets (k=64): UNSATURATED sketches (fewer
    distinct values than k) estimate EXACTLY; saturated ones stay within
    a factor of 2 of the exact count (k=64 RSE is ~12.7%, so factor 2 is
    far outside sampling noise — only an estimator-formula bug trips it).
    And merging per-shard sketches (`kmv_merge`) is BIT-IDENTICAL to the
    direct sketch of the union — the k smallest of a union are always
    among the union of each side's k smallest."""
    from quantms_utils_spark.operators.sketches import (
        kmv_distinct_estimate,
        kmv_merge,
        kmv_sketch,
    )

    k = 64
    df = spark.createDataFrame(
        [(i % 3, v) for i, v in enumerate(vals)], "g int, v long"
    )
    whole = df.select(F.lit(0).alias("g"), "v")
    sk_all = kmv_sketch(whole, ["g"], "v", k=k, n_buckets=4)
    row = sk_all.select(
        F.col("kmv"), kmv_distinct_estimate(F.col("kmv"), k)
    ).collect()[0]
    exact = len(set(vals))
    if exact < k:
        assert row["kmv_distinct"] == exact
    else:
        assert exact / 2 <= row["kmv_distinct"] <= exact * 2
    shards = kmv_sketch(df, ["g"], "v", k=k, n_buckets=4)
    merged = kmv_merge(
        shards.select(F.lit(0).alias("g"), "kmv"), ["g"], k=k
    ).collect()[0]["kmv"]
    assert list(merged) == list(row["kmv"])


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=100),
            st.sampled_from(["alpha", "beta", "gamma", "delta"]),
        ),
        min_size=1,
        max_size=200,
    ),
    st.integers(min_value=-10, max_value=110),
    st.integers(min_value=0, max_value=60),
)
def test_manifest_prune_safety_zone_and_bloom(spark, rows_, lo, span):
    """Prune-safety on random data and random predicates: a zone-map-pruned
    range read and a Bloom-pruned equality read, each with the exact
    row-level filter applied on top, must equal the same filter over the
    FULL unpruned scan — pruning is a superset guarantee, and a manifest
    that ever drops a qualifying file is silently wrong at any scale."""
    import shutil
    import tempfile

    from quantms_utils_spark.operators.layout import (
        bloom_pruned_read,
        file_bloom_manifest,
        file_zone_map,
        zone_pruned_read,
    )

    hi = lo + span
    base = tempfile.mkdtemp(prefix="prune_prop_")
    path = base + "/t"
    try:
        df = spark.createDataFrame(
            [(i, x, s) for i, (x, s) in enumerate(rows_)],
            "id long, x long, s string",
        )
        df.repartition(4).write.mode("overwrite").parquet(path)

        zm = file_zone_map(spark, path, ["x"])
        got = sorted(
            map(
                tuple,
                zone_pruned_read(spark, path, zm, "x", lo, hi)
                .filter(F.col("x").between(lo, hi))
                .collect(),
            )
        )
        want = sorted(
            map(
                tuple,
                spark.read.parquet(path)
                .filter(F.col("x").between(lo, hi))
                .collect(),
            )
        )
        assert got == want

        bm = file_bloom_manifest(spark, path, "s", m_bits=256, k=3)
        for v in ("alpha", "no_such_value"):
            got_b = sorted(
                map(
                    tuple,
                    bloom_pruned_read(
                        spark, path, bm, "s", v, m_bits=256, k=3
                    )
                    .filter(F.col("s") == v)
                    .collect(),
                )
            )
            want_b = sorted(
                map(
                    tuple,
                    spark.read.parquet(path).filter(F.col("s") == v).collect(),
                )
            )
            assert got_b == want_b, v
    finally:
        shutil.rmtree(base, ignore_errors=True)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=3),
        st.lists(
            st.integers(min_value=0, max_value=4 * 3600),
            min_size=1,
            max_size=20,
        ),
        min_size=1,
        max_size=4,
    )
)
def test_sessionize_stateful_matches_brute_force_sessions(spark, user_offsets):
    """The STREAMING gap-sessionizer (applyInPandasWithState,
    streaming/events.py) on a random event stream closes exactly the
    sessions a sequential brute force computes with the same strict
    gap rule (t - last > 1800 s starts a new session) — the same contract
    the batch `sessionize` twin is pinned to by
    test_sessionize_lag_flag_matches_brute_force, so streaming == batch
    transitively. Real events arrive in batch 1; batch 2 delivers one
    far-future sentinel per user, whose gap closes every open real
    session data-driven (no timeout reliance). Sentinel-started sessions
    stay open in state and are excluded."""
    import json as _json
    import shutil
    import tempfile
    from datetime import datetime, timedelta, timezone

    from quantms_utils_spark.streaming.events import (
        read_event_stream,
        sessionize_stateful,
    )

    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    sentinel = datetime(2024, 6, 1, tzinfo=timezone.utc)

    def iso(dt):
        return dt.strftime("%Y-%m-%dT%H:%M:%S.000Z")

    base = tempfile.mkdtemp(prefix="sess_prop_")
    src = base + "/src"
    ckpt = base + "/ckpt"
    import os

    os.makedirs(src)
    try:
        rows, eid = [], 0
        for u, offs in sorted(user_offsets.items()):
            for o in offs:
                rows.append(
                    {
                        "event_id": eid,
                        "ts": iso(t0 + timedelta(seconds=o)),
                        "user_id": u,
                        "event_type": "view",
                        "value": float(eid + 1),
                        "props": "{}",
                    }
                )
                eid += 1
        with open(src + "/batch_0.json", "w") as f:
            f.write("\n".join(_json.dumps(r) for r in rows))

        collected = []

        def run_once():
            stream = read_event_stream(spark, src)
            q = (
                sessionize_stateful(stream, gap_seconds=1800)
                .writeStream.foreachBatch(
                    lambda df, _id: collected.extend(df.collect())
                )
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            q.stop()

        run_once()
        sentinels = [
            {
                "event_id": 10**6 + u,
                "ts": iso(sentinel),
                "user_id": u,
                "event_type": "view",
                "value": 0.0,
                "props": "{}",
            }
            for u in sorted(user_offsets)
        ]
        with open(src + "/batch_1.json", "w") as f:
            f.write("\n".join(_json.dumps(r) for r in sentinels))
        run_once()

        got = sorted(
            (
                r["user_id"],
                r["session_start"].replace(tzinfo=timezone.utc),
                r["session_end"].replace(tzinfo=timezone.utc),
                r["n_events"],
                round(r["total_value"], 6),
            )
            for r in collected
            if r["session_start"].replace(tzinfo=timezone.utc) < sentinel
        )

        want, eid = [], 0
        for u, offs in sorted(user_offsets.items()):
            evs = sorted(
                (o, float(eid_ + 1))
                for eid_, o in [(eid + i, o) for i, o in enumerate(offs)]
            )
            eid += len(offs)
            sessions, cur = [], None
            for o, v in evs:
                if cur is None or o - cur["last"] > 1800:
                    if cur is not None:
                        sessions.append(cur)
                    cur = {"start": o, "last": o, "n": 1, "tot": v}
                else:
                    cur["last"] = max(cur["last"], o)
                    cur["n"] += 1
                    cur["tot"] += v
            if cur is not None:
                sessions.append(cur)
            for s in sessions:
                want.append(
                    (
                        u,
                        t0 + timedelta(seconds=s["start"]),
                        t0 + timedelta(seconds=s["last"]),
                        s["n"],
                        round(s["tot"], 6),
                    )
                )
        assert got == sorted(want)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@SETTINGS
@given(
    st.text(alphabet=string.ascii_lowercase, min_size=8, max_size=40),
    st.lists(
        st.tuples(
            st.text(alphabet=string.ascii_lowercase, min_size=0, max_size=30),
            st.text(alphabet=string.ascii_lowercase, min_size=0, max_size=30),
        ),
        min_size=2,
        max_size=6,
    ),
)
def test_winnowing_shared_substring_guarantee(spark, shared, wraps):
    """The MOSS guarantee winnow_candidate_pairs rests on: any two
    documents sharing a substring of length >= k + w - 1 (= 8 at the
    defaults k=5, w=4) MUST share at least one winnowing fingerprint —
    a window of w consecutive k-grams fits entirely inside the shared
    span, its hashes are identical in both documents, so its minimum is
    the same value in both fingerprint sets. Both hash families."""
    from quantms_utils_spark.operators.text import winnow_fingerprints

    docs = [(i, pre + shared + suf) for i, (pre, suf) in enumerate(wraps)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for fam in ("md5", "xxhash64"):
        fps = {
            r["doc_id"]: set(r["fp"])
            for r in df.select(
                "doc_id",
                winnow_fingerprints(F.col("text"), hash_family=fam).alias(
                    "fp"
                ),
            ).collect()
        }
        base = fps[0]
        for i in range(1, len(docs)):
            assert base & fps[i], (fam, docs[0][1], docs[i][1])


@SETTINGS
@given(
    st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=400),
    st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=400),
)
def test_kmv_jaccard_exact_unsaturated_bounded_saturated(spark, xs, ys):
    """kmv_jaccard contract on random sets (k=128): when the UNION fits in
    the sketch (|A ∪ B| <= k) the merged k-minimum sample IS the union, so
    the estimate equals the true Jaccard EXACTLY; when saturated the
    estimate stays within 0.3 absolute of the truth (std ≈ 0.04 at k=128 —
    only a formula/merge bug trips the bound, never sampling noise)."""
    from quantms_utils_spark.operators.sketches import kmv_jaccard, kmv_sketch

    k = 128
    a_set, b_set = set(xs), set(ys)
    true_j = len(a_set & b_set) / len(a_set | b_set)
    df = spark.createDataFrame(
        [("a", v) for v in xs] + [("b", v) for v in ys], "g string, v long"
    )
    sk = kmv_sketch(df, ["g"], "v", k=k, n_buckets=4)
    row = (
        sk.groupBy()
        .pivot("g", ["a", "b"])
        .agg(F.first("kmv"))
        .select(kmv_jaccard(F.col("a"), F.col("b"), k).alias("j"))
        .collect()[0]
    )
    est = row["j"]
    if len(a_set | b_set) <= k:
        assert est == pytest.approx(true_j, abs=1e-12)
    else:
        assert abs(est - true_j) <= 0.3, (est, true_j)


@SETTINGS
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1),  # block
            st.integers(min_value=0, max_value=3),  # vector family
        ),
        min_size=2,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=4),  # n_buckets
)
def test_knn_self_join_matches_brute_force_with_ties(spark, rows, nb):
    """knn_self_join == brute-force (round-6 cosine desc, neighbor id)
    ranking, on inputs DESIGNED to tie: vectors drawn from 4 families so
    duplicate embeddings (exact cosine-1.0 clusters bigger than any
    emission margin) are the norm, not the exception. Pins the round-12
    fix: the old k+8 argpartition margin emitted an arbitrary candidate
    subset inside a tie cluster and broke the id tie-break contract."""
    import math

    from quantms_utils_spark.operators.similarity import knn_self_join

    fams = [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [1.0, 1.0, 0.0, 0.0],
        [1.0, 0.0, 1.0, 0.5],
    ]
    data = [(i, b, fams[f]) for i, (b, f) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "vec_id long, label int, embedding array<double>"
    )
    k = 3
    out = knn_self_join(
        df, "vec_id", "embedding", "label", k=k, n_buckets=nb
    )
    got = {}
    for r in out.collect():
        got.setdefault(r["vec_id"], []).append(
            (r["rank"], r["neighbor_id"], r["cos_sim"])
        )

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v] if n > 0 else v

    want = {}
    for i, bi, vi in data:
        ui = unit(vi)
        cands = []
        for j, bj, vj in data:
            if j == i or bj != bi:
                continue
            uj = unit(vj)
            cos = round(sum(a * b for a, b in zip(ui, uj)), 6)
            cands.append((-cos, j))
        cands.sort()
        if cands:
            want[i] = [
                (rk + 1, j, -negc) for rk, (negc, j) in enumerate(cands[:k])
            ]
    got = {i: sorted(v) for i, v in got.items()}
    for i in want:
        assert got.get(i, []) == [
            (rk, j, pytest.approx(c, abs=1e-9)) for rk, j, c in want[i]
        ], i
    assert set(got) == set(want)


@SETTINGS
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(min_value=0, max_value=5)),
            st.integers(min_value=0, max_value=99),
        ),
        min_size=0,
        max_size=12,
    ),
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(min_value=0, max_value=5)),
            st.integers(min_value=100, max_value=199),
            st.booleans(),
        ),
        min_size=0,
        max_size=12,
        unique_by=lambda r: r[0],
    ),
)
def test_merge_upsert_matches_sql_merge_reference(spark, tgt, src):
    """merge_upsert == a sequential SQL-MERGE reference, including the
    documented NULL-key semantics (NULL never matches: NULL-key source
    rows always insert, NULL-key target rows always survive) and the
    delete-flag path (matched + flag deletes; flagged rows never
    insert). Source is key-unique by construction (the MERGE
    precondition)."""
    from quantms_utils_spark.operators.diff import merge_upsert

    target = spark.createDataFrame(tgt, "k int, v int") if tgt else (
        spark.createDataFrame([], "k int, v int")
    )
    source = spark.createDataFrame(src, "k int, v int, del boolean") if src else (
        spark.createDataFrame([], "k int, v int, del boolean")
    )
    merged = merge_upsert(target, source, ["k"], delete_col="del").collect()
    got = sorted(
        [(r["k"], r["v"]) for r in merged], key=lambda t: (t[0] is None, t)
    )

    src_keys = {k for k, _, _ in src if k is not None}
    want = [(k, v) for k, v in tgt if k is None or k not in src_keys]
    want += [(k, v) for k, v, d in src if not d]
    want = sorted(want, key=lambda t: (t[0] is None, t))
    assert got == want


# ---------------------------------------------------------------------------
# Round-13 properties: ANN round-before-rank — sub-quantum tie clusters must
# cut the top-k by (round-6 score, id), never by raw float order.  Vectors
# are [c, sqrt(1-c^2)] so cosine-to-[1,0] is exactly c; clusters share a
# coarse base cosine and members differ by j*1e-7 (< half the 1e-6 rounding
# quantum), with ids assigned in an order hypothesis permutes — ranking by
# the RAW score would order cluster members by the offset, the contract
# orders them by id.

def _tie_corpus(clusters):
    """clusters: list of (base_idx, perm) -> (rows, ref) where rows are
    (vec_id, [c, s]) and ref is the (rounded6, id)-sorted id/cos list."""
    import math

    rows = []
    vid = 1
    for base_idx, perm in clusters:
        base = 0.1 + 0.08 * base_idx  # 0.1 .. 0.9, round-6 exact
        ids = list(range(vid, vid + len(perm)))
        vid += len(perm)
        # perm decides which member id gets which sub-quantum offset
        for member_id, j in zip(ids, perm):
            c = base + j * 1e-7
            rows.append((member_id, [c, math.sqrt(1.0 - c * c)]))
    ref = sorted(rows, key=lambda r: (-round(r[1][0], 6), r[0]))
    return rows, ref


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.permutations(list(range(4))),
        ),
        min_size=1,
        max_size=6,
        unique_by=lambda c: c[0],
    ),
    st.integers(min_value=1, max_value=12),
)
def test_ann_topk_family_ties_cut_by_rounded_score_then_id(spark, clusters, k):
    """ann_bruteforce, ivf_search (all cells probed) and ann_batch_topk all
    emit exactly the reference prefix under sub-round-6 tie clusters."""
    from quantms_utils_spark.operators.similarity import (
        ann_batch_topk,
        ann_bruteforce,
        ivf_search,
    )

    rows, ref = _tie_corpus(clusters)
    want = [(r[0], round(r[1][0], 4)) for r in ref[:k]]

    corpus = spark.createDataFrame(
        [(i, v) for i, v in rows], "vec_id long, embedding array<double>"
    )
    query = spark.createDataFrame([([1.0, 0.0],)], "q_emb array<double>")

    bf = ann_bruteforce(corpus, query, k=k).collect()
    assert [(r["vec_id"], r["cos_sim"]) for r in bf] == want

    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    ivf = ivf_search(corpus, query, cents, nprobe=2, k=k).collect()
    assert [(r["vec_id"], r["cos_sim"]) for r in ivf] == want

    qs = spark.createDataFrame(
        [(0, [1.0, 0.0])], "q_id long, q_emb array<double>"
    )
    batch = ann_batch_topk(corpus, qs, k=k).collect()
    got = [
        (r["vec_id"], r["cos_sim"])
        for r in sorted(batch, key=lambda r: r["rank"])
    ]
    assert got == want


# ---------------------------------------------------------------------------
# Round-13 properties: the last two example-tested-only streaming twins.
# (1) continuous drift monitor == batch PSI on the concatenated stream
# (epoch-merge associativity is the whole state design), with replay
# idempotence; (2) the stateful CEP journey counter over a real 2-batch
# stream (checkpoint-carried state) == the batch regex scan.


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=7), min_size=0, max_size=30),
        min_size=1,
        max_size=4,
    ),
    st.dictionaries(
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=1, max_value=50),
        min_size=1,
        max_size=8,
    ),
)
def test_streaming_drift_equals_batch_psi(spark, batches, baseline):
    """bins_batch epochs merged by standing_bins == one groupBy over the
    concatenated stream (EXACT — counts merge by addition), drift_report
    == population_stability_from_counts over those counts, and replaying
    an epoch is a no-op."""
    import shutil
    import tempfile

    from quantms_utils_spark.operators.ml import (
        population_stability_from_counts,
    )
    from quantms_utils_spark.streaming.drift import (
        bins_batch,
        drift_report,
        standing_bins,
    )

    state = tempfile.mkdtemp(prefix="drift_prop_")
    try:
        for epoch, bins in enumerate(batches):
            bdf = spark.createDataFrame([(b,) for b in bins], "bin_idx int")
            bins_batch(bdf, epoch, bin_col="bin_idx", state_dir=state)
        # replay the FIRST epoch (at-least-once delivery): must not change
        bins_batch(
            spark.createDataFrame([(b,) for b in batches[0]], "bin_idx int"),
            0,
            bin_col="bin_idx",
            state_dir=state,
        )
        got_bins = {
            r["bin"]: r["n"] for r in standing_bins(spark, state).collect()
        }
        from collections import Counter

        want_bins = Counter(b for bins in batches for b in bins)
        assert got_bins == dict(want_bins)

        base = spark.createDataFrame(
            sorted(baseline.items()), "bin long, n long"
        )
        got = {
            r["bin"]: (r["n_a"], r["n_b"], round(r["psi_term"], 12))
            for r in drift_report(spark, state, base).collect()
        }
        all_counts = spark.createDataFrame(
            [(k, v) for k, v in sorted(want_bins.items())], "bin long, n_a long"
        )
        want = {
            r["bin"]: (r["n_a"], r["n_b"], round(r["psi_term"], 12))
            for r in population_stability_from_counts(
                all_counts, base.withColumnRenamed("n", "n_b")
            ).collect()
        }
        assert got == want
    finally:
        shutil.rmtree(state, ignore_errors=True)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=3),
        st.tuples(
            st.lists(
                st.sampled_from(["view", "click", "purchase", "other"]),
                min_size=1,
                max_size=24,
            ),
            st.integers(min_value=0, max_value=24),  # batch split point
        ),
        min_size=1,
        max_size=4,
    )
)
def test_detect_journeys_stateful_matches_batch_regex(spark, user_events):
    """The STREAMING CEP journey counter (applyInPandasWithState, state =
    two ints) over a real two-batch stream with checkpoint-carried state
    counts exactly the leftmost non-overlapping `v[^p]*c[^p]*p` matches
    of each user's full ordered event string — the batch
    `event_pattern_match` semantics. The split point lands anywhere, so
    journeys STRADDLE the batch boundary."""
    import json as _json
    import os
    import re
    import shutil
    import tempfile

    from quantms_utils_spark.streaming.events import (
        detect_journeys_stateful,
        read_event_stream,
    )

    base = tempfile.mkdtemp(prefix="cep_prop_")
    src, ckpt = base + "/src", base + "/ckpt"
    os.makedirs(src)
    try:
        def iso(sec):
            return "2024-01-01T%02d:%02d:%02d.000Z" % (
                sec // 3600, (sec // 60) % 60, sec % 60
            )

        b0, b1, eid = [], [], 0
        for u, (types, split) in sorted(user_events.items()):
            for i, t in enumerate(types):
                row = {
                    "event_id": eid, "ts": iso(i), "user_id": u,
                    "event_type": t, "value": 1.0, "props": "{}",
                }
                (b0 if i < split else b1).append(row)
                eid += 1
        for name, rows in (("batch_0.json", b0), ("batch_1.json", b1)):
            with open(f"{src}/{name}", "w") as f:
                f.write("\n".join(_json.dumps(r) for r in rows))
            if name == "batch_0.json":
                collected = []

                def run_once():
                    q = (
                        detect_journeys_stateful(read_event_stream(spark, src))
                        .writeStream.foreachBatch(
                            lambda df, _id: collected.extend(df.collect())
                        )
                        .option("checkpointLocation", ckpt)
                        .outputMode("update")
                        .trigger(availableNow=True)
                        .start()
                    )
                    q.awaitTermination(120)
                    q.stop()

                run_once()
        run_once()

        got = {}
        for r in collected:  # n_journeys is cumulative: the max is final
            got[r["user_id"]] = max(got.get(r["user_id"], 0), r["n_journeys"])

        want = {}
        for u, (types, _split) in user_events.items():
            s = "".join(t[0] for t in types)
            want[u] = len(re.findall(r"v[^p]*c[^p]*p", s))
        # users emitting zero journeys still emit an update row with n=0
        assert got == want
    finally:
        shutil.rmtree(base, ignore_errors=True)
