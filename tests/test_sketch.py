"""Relational HyperLogLog (functions/sketch.py): pure-python reference
parity, the merge property, estimator accuracy, and the JVM-only plan."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from fscrawler_spark.functions.sketch import (
    M_BUCKETS,
    hll_distinct,
    hll_finalize,
    hll_merge,
    hll_sketch,
)


def _ref_hll(keys):
    """Pure-python HLL over md5, same bucket/substream split."""
    rmax = {}
    for k in keys:
        h = hashlib.md5(str(k).encode()).hexdigest()
        b = int(h[0:2], 16)
        v = int(h[2:10], 16)
        rho = 33 - v.bit_length()
        rmax[b] = max(rmax.get(b, 0), rho)
    s = (M_BUCKETS - len(rmax)) * (1 << 33) + sum(
        1 << (33 - r) for r in rmax.values()
    )
    est = (0.7213 / (1.0 + 1.079 / 256.0)) * 562949953421312.0 / float(s)
    return len(rmax), s, est


def _df(spark, keys, grp="g"):
    return spark.createDataFrame([(grp, k) for k in keys], "g string, k long")


def test_hll_matches_pure_python(spark):
    keys = list(range(1, 501))
    row = hll_distinct(_df(spark, keys), ["g"], "k").collect()[0]
    n_hit, s, est = _ref_hll(keys)
    assert (row["n_hit"], row["s_scaled"]) == (n_hit, s)
    assert row["est_distinct"] == est


def test_hll_merge_equals_sketch_of_union(spark):
    a, b = list(range(1, 300)), list(range(150, 700))
    sa = hll_sketch(_df(spark, a), ["g"], "k")
    sb = hll_sketch(_df(spark, b), ["g"], "k")
    merged = hll_finalize(hll_merge(sa, sb, ["g"]), ["g"]).collect()[0]
    union = hll_distinct(_df(spark, sorted(set(a) | set(b))), ["g"], "k").collect()[0]
    assert (merged["n_hit"], merged["s_scaled"], merged["est_distinct"]) == (
        union["n_hit"],
        union["s_scaled"],
        union["est_distinct"],
    )


def test_hll_estimate_accuracy(spark):
    # m=256 -> relative standard error ~1.04/sqrt(256) = 6.5%; allow 4 sigma.
    # Below the 2.5*m raw-estimator regime the documented caller-side
    # linear-counting correction applies, computed from the returned
    # n_hit component (the module docstring's contract: ln() is
    # libm-dependent, so the correction lives outside the exact part).
    for n in (200, 1000, 5000):
        row = hll_distinct(_df(spark, range(n)), ["g"], "k").collect()[0]
        est = row["est_distinct"]
        if est <= 2.5 * M_BUCKETS and row["n_hit"] < M_BUCKETS:
            est = M_BUCKETS * math.log(M_BUCKETS / (M_BUCKETS - row["n_hit"]))
        assert abs(est - n) / n < 0.26, (n, est)


def test_hll_partitioning_invariance(spark):
    keys = list(range(1, 2000, 3))
    one = hll_distinct(_df(spark, keys).repartition(1), ["g"], "k").collect()[0]
    many = hll_distinct(_df(spark, keys).repartition(16), ["g"], "k").collect()[0]
    assert (one["s_scaled"], one["est_distinct"]) == (
        many["s_scaled"],
        many["est_distinct"],
    )


def test_hll_grouped(spark):
    rows = [("a", k) for k in range(100)] + [("b", k) for k in range(40)]
    df = spark.createDataFrame(rows, "g string, k long")
    got = {r["g"]: r for r in hll_distinct(df, ["g"], "k").collect()}
    for grp, keys in (("a", range(100)), ("b", range(40))):
        n_hit, s, est = _ref_hll(keys)
        assert (got[grp]["n_hit"], got[grp]["s_scaled"], got[grp]["est_distinct"]) == (
            n_hit,
            s,
            est,
        )


def test_hll_plan_is_jvm_only(spark):
    plan = (
        hll_distinct(_df(spark, range(50)), ["g"], "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "BatchEvalPython" not in plan


# --- Count-Min sketch ------------------------------------------------------

from fscrawler_spark.functions.sketch import (  # noqa: E402
    CMS_D,
    CMS_W,
    cms_build,
    cms_estimate,
    cms_merge,
)


def _ref_cms(keys):
    """Pure-python CMS with the same d hashes."""
    counters = {}
    for k in keys:
        for j in range(CMS_D):
            h = hashlib.md5(f"{j}:{k}".encode()).hexdigest()
            idx = int(h[0:8], 16) % CMS_W
            counters[(j, idx)] = counters.get((j, idx), 0) + 1
    return counters


def _ref_cms_est(counters, k):
    return min(
        counters.get(
            (j, int(hashlib.md5(f"{j}:{k}".encode()).hexdigest()[0:8], 16) % CMS_W),
            0,
        )
        for j in range(CMS_D)
    )


def test_cms_matches_pure_python(spark):
    keys = [i % 37 for i in range(500)] + [7] * 50  # skewed multiset
    df = _df(spark, keys)
    sketch = cms_build(df, "k")
    got = {(r["row_j"], r["idx"]): r["c"] for r in sketch.collect()}
    assert got == _ref_cms(keys)
    qk = spark.createDataFrame([(k,) for k in range(40)], "k long")
    est = {r["k"]: r["cms_n"] for r in cms_estimate(sketch, qk, "k").collect()}
    ref = _ref_cms(keys)
    for k in range(40):
        assert est[k] == _ref_cms_est(ref, k)


def test_cms_never_underestimates(spark):
    from collections import Counter

    keys = [i % 101 for i in range(3000)]
    true = Counter(keys)
    sketch = cms_build(_df(spark, keys), "k")
    qk = spark.createDataFrame([(k,) for k in true], "k long")
    for r in cms_estimate(sketch, qk, "k").collect():
        assert r["cms_n"] >= true[r["k"]]


def test_cms_merge_equals_build_of_concat(spark):
    a, b = [i % 11 for i in range(200)], [i % 17 for i in range(300)]
    merged = cms_merge(cms_build(_df(spark, a), "k"), cms_build(_df(spark, b), "k"))
    whole = cms_build(_df(spark, a + b), "k")
    got = {(r["row_j"], r["idx"]): r["c"] for r in merged.collect()}
    want = {(r["row_j"], r["idx"]): r["c"] for r in whole.collect()}
    assert got == want


def test_cms_plan_is_jvm_only(spark):
    df = _df(spark, range(50))
    sketch = cms_build(df, "k")
    plan = (
        cms_estimate(sketch, df.select("k").distinct(), "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "BatchEvalPython" not in plan


# --- Bloom filter ----------------------------------------------------------

from fscrawler_spark.functions.sketch import (  # noqa: E402
    BLOOM_BITS,
    BLOOM_K,
    bloom_build,
    bloom_contains,
    bloom_merge,
)


def _ref_bloom(keys):
    words = {}
    for k in keys:
        for j in range(BLOOM_K):
            h = hashlib.md5(f"b{j}:{k}".encode()).hexdigest()
            pos = int(h[0:8], 16) % BLOOM_BITS
            words[pos // 32] = words.get(pos // 32, 0) | (1 << (pos % 32))
    return words


def _ref_contains(words, k):
    for j in range(BLOOM_K):
        h = hashlib.md5(f"b{j}:{k}".encode()).hexdigest()
        pos = int(h[0:8], 16) % BLOOM_BITS
        if not words.get(pos // 32, 0) & (1 << (pos % 32)):
            return False
    return True


def test_bloom_bit_pattern_matches_pure_python(spark):
    keys = list(range(0, 900, 3))
    got = {r["word"]: r["bits"] for r in bloom_build(_df(spark, keys), "k").collect()}
    assert got == _ref_bloom(keys)


def test_bloom_no_false_negatives_and_fp_parity(spark):
    present = list(range(500))
    bloom = bloom_build(_df(spark, present), "k")
    probe = spark.createDataFrame([(k,) for k in range(2500)], "k long")
    got = {r["k"]: r["maybe_present"] for r in bloom_contains(bloom, probe, "k").collect()}
    for k in present:
        assert got[k] is True  # no false negatives, ever
    # Verdicts — including every false positive — match the reference
    # bit-for-bit, because the bit pattern is deterministic.
    ref = _ref_bloom(present)
    for k in range(2500):
        assert got[k] == _ref_contains(ref, k)
    fp = sum(1 for k in range(500, 2500) if got[k])
    # n=500, m=65536, k=4 -> theoretical fp ~ (1 - e^(-4*500/65536))^4 ~ 8e-7
    assert fp / 2000 < 0.01, fp


def test_bloom_merge_equals_build_of_union(spark):
    a, b = list(range(300)), list(range(200, 600))
    merged = bloom_merge(
        bloom_build(_df(spark, a), "k"), bloom_build(_df(spark, b), "k")
    )
    whole = bloom_build(_df(spark, sorted(set(a) | set(b))), "k")
    got = {r["word"]: r["bits"] for r in merged.collect()}
    want = {r["word"]: r["bits"] for r in whole.collect()}
    assert got == want


def test_bloom_plan_is_jvm_only(spark):
    df = _df(spark, range(50))
    plan = (
        bloom_contains(bloom_build(df, "k"), df.select("k").distinct(), "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "BatchEvalPython" not in plan


# --- Property-based parity (hypothesis) ------------------------------------
# Small example counts: each example runs Spark jobs; the fixed-seed
# tests above carry the bulk, hypothesis hunts the edges (negative
# keys, duplicates-only multisets, single-element inputs).

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_keys = st.lists(
    st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=60
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(keys=_keys)
def test_hll_property_parity(spark, keys):
    row = hll_distinct(_df(spark, keys), ["g"], "k").collect()[0]
    n_hit, s, est = _ref_hll(set(keys))
    assert (row["n_hit"], row["s_scaled"], row["est_distinct"]) == (n_hit, s, est)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(keys=_keys)
def test_cms_property_parity(spark, keys):
    got = {
        (r["row_j"], r["idx"]): r["c"]
        for r in cms_build(_df(spark, keys), "k").collect()
    }
    assert got == _ref_cms(keys)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(keys=_keys)
def test_bloom_property_parity(spark, keys):
    got = {
        r["word"]: r["bits"] for r in bloom_build(_df(spark, keys), "k").collect()
    }
    assert got == _ref_bloom(set(keys))
