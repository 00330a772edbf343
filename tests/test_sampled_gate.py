"""Wilson-certified sampled gate (C71, operators/infer): the interval
must match an independent pure-python reference, the verdict classes
must follow the certification semantics (PASS/FAIL only when the
interval clears/exceeds the tolerance entirely), min_n_to_certify must
be the exact k=0 boundary, and the decode_rate suite family must
certify a sampled decode end-to-end."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from bigdime_spark.operators.infer import (
    Z_95,
    min_n_to_certify,
    sampled_rate_gate,
    wilson_bounds,
)
from bigdime_spark.operators.sampling import SAMPLE_SPACE


def _wilson_ref(k: int, n: int, z: float) -> tuple[float, float]:
    phat = k / n
    denom = 1.0 + z * z / n
    center = (phat + z * z / (2.0 * n)) / denom
    half = z * math.sqrt(phat * (1.0 - phat) / n + z * z / (4.0 * n * n)) / denom
    return max(0.0, center - half), min(1.0, center + half)


def test_wilson_matches_python_reference(spark):
    cases = [(0, 10), (1, 10), (5, 10), (10, 10), (0, 1000), (3, 1000),
             (997, 1000), (1, 2), (0, 385), (7, 50)]
    df = spark.createDataFrame(cases, "k long, n long")
    lo, hi = wilson_bounds(F.col("k"), F.col("n"), Z_95)
    got = {
        (r["k"], r["n"]): (r["lo"], r["hi"])
        for r in df.select("k", "n", lo.alias("lo"), hi.alias("hi")).collect()
    }
    for k, n in cases:
        want = _wilson_ref(k, n, Z_95)
        assert got[(k, n)][0] == pytest.approx(want[0], abs=1e-12)
        assert got[(k, n)][1] == pytest.approx(want[1], abs=1e-12)


def test_verdict_classes(spark):
    # tolerance 0.1: certified-under, certified-over, straddling, and
    # the two unreadiness shapes (n=0, n NULL)
    rows = [
        ("pass", 10_000, 100),      # phat 0.01, ci well under 0.1
        ("fail", 10_000, 5_000),    # phat 0.5, ci well over 0.1
        ("straddle", 30, 3),        # phat 0.1, ci straddles 0.1
        ("empty", 0, 0),
        ("nulln", None, 0),
    ]
    df = spark.createDataFrame(rows, "part string, n long, k long")
    got = {r["part"]: r for r in sampled_rate_gate(df, 0.1).collect()}
    assert got["pass"]["verdict"] == "PASS"
    assert got["fail"]["verdict"] == "FAIL"
    assert got["straddle"]["verdict"] == "NOT_READY"
    assert got["empty"]["verdict"] == "NOT_READY"
    assert got["nulln"]["verdict"] == "NOT_READY"
    for p in ("empty", "nulln"):
        assert got[p]["ci_lo"] is None and got[p]["ci_hi"] is None
        assert got[p]["rate_hat"] is None
    # PASS/FAIL carry real intervals
    assert got["pass"]["ci_hi"] <= 0.1
    assert got["fail"]["ci_lo"] > 0.1


def test_min_n_to_certify_is_the_exact_k0_boundary(spark):
    for max_rate in (0.01, 0.05, 0.2):
        n0 = min_n_to_certify(max_rate, Z_95)
        df = spark.createDataFrame(
            [("at", n0, 0), ("under", n0 - 1, 0)], "part string, n long, k long"
        )
        got = {r["part"]: r["verdict"] for r in sampled_rate_gate(df, max_rate).collect()}
        assert got["at"] == "PASS"
        assert got["under"] == "NOT_READY"


def test_guards(spark):
    df = spark.createDataFrame([("p", 10, 0)], "part string, n long, k long")
    for bad in (0.0, 1.0, -0.1, 1.5):
        with pytest.raises(ValueError, match="max_rate"):
            sampled_rate_gate(df, bad)
        with pytest.raises(ValueError, match="max_rate"):
            min_n_to_certify(bad)
    with pytest.raises(ValueError, match="z must be"):
        sampled_rate_gate(df, 0.1, z=0.0)
    with pytest.raises(ValueError, match="z must be"):
        min_n_to_certify(0.1, z=-1.0)


RATE = 0.5
SEED = "decode-sample"


def _in_sample(image_id: str) -> bool:
    h = int(hashlib.md5(f"{image_id}:{SEED}".encode()).hexdigest()[:10], 16)
    return h < int(RATE * SAMPLE_SPACE)


def test_decode_rate_gate_certifies_suite_parts(spark):
    """Corrupt EVERY in-sample payload of part p0000 (k = n there) and
    leave p0001 clean: at tolerance 0.2 the gate must certify p0000
    OVER (FAIL) and p0001 UNDER (PASS) from the sample alone."""
    from bigdime_spark.plans.suite import StatsProfile, ValidationSuite
    from bigdime_spark.sources.synth import InjectionSpec, build_fixture

    n_rows = 96
    ids = [f"img-{i:012d}" for i in range(n_rows)]
    bad = tuple(i for j, i in enumerate(ids) if j % 2 == 0 and _in_sample(i))
    assert len(bad) >= 10  # the fixture must give the gate real k
    clean_n = sum(1 for j, i in enumerate(ids) if j % 2 == 1 and _in_sample(i))
    fx = build_fixture(
        spark, n_rows=n_rows, n_parts=2, spec=InjectionSpec(bitflip_bytes=bad)
    )
    suite = ValidationSuite(
        not_null=(),
        check_record_count=False,
        check_checksum=False,
        check_uniqueness=False,
        check_referential=False,
        check_caption=False,
        check_drift=False,
        check_domains=False,
        stats=StatsProfile(columns=[]),
        check_decode=True,
        decode_seed=42,
        decode_snapshots=("raw",),
        decode_sample_rate=RATE,
        decode_rate_gate=(0.2, Z_95),
    )
    res = suite.run(spark, fx.raw, run_id="rgate")
    got = {
        r["part"]: r
        for r in res.verdicts.filter(F.col("constraint") == "decode_rate").collect()
    }
    assert set(got) == {"p0000", "p0001"}
    assert got["p0000"]["verdict"] == "FAIL"
    assert got["p0001"]["verdict"] == "PASS"
    # observed carries (k, n): p0000's k equals its sampled count, the
    # clean part's k is 0 with the hash-predicted n
    assert got["p0000"]["observed"].startswith(f"k={len(bad)},n={len(bad)}")
    assert got["p0001"]["observed"].startswith(f"k=0,n={clean_n}")
    res.release()


def test_decode_rate_gate_requires_decode(spark):
    from bigdime_spark.plans.suite import ValidationSuite
    from bigdime_spark.sources.synth import build_fixture

    fx = build_fixture(spark, n_rows=8, n_parts=2)
    suite = ValidationSuite(check_decode=False, decode_rate_gate=(0.1, 1.96))
    with pytest.raises(ValueError, match="requires check_decode"):
        suite.run(spark, fx.raw, run_id="x")


def test_decode_rate_gate_geometry_refused():
    from bigdime_spark.operators.decode import DecodeIntegrity

    with pytest.raises(ValueError, match="max_rate"):
        DecodeIntegrity(rate_gate=(0.0, 1.96))
    with pytest.raises(ValueError, match="z must be"):
        DecodeIntegrity(rate_gate=(0.1, 0.0))
    # k counts raw-snapshot bad rows — a gate over a decode pass that
    # never decodes raw would certify corruption it cannot see
    with pytest.raises(ValueError, match="raw snapshot"):
        DecodeIntegrity(snapshots=("curated",), rate_gate=(0.1, 1.96))


# --------------------------- C77: stratified decode sampling + gate


def test_stratified_thresholds_boost_rare_strata(spark):
    from bigdime_spark.operators.infer import (
        stratified_sample_frame,
        stratified_thresholds,
    )
    from bigdime_spark.operators.sampling import SAMPLE_SPACE

    rows = [("p", "big", f"b{i}") for i in range(1000)] + [
        ("p", "tiny", f"t{i}") for i in range(5)
    ]
    df = spark.createDataFrame(rows, "part string, fmt string, image_id string")
    thr = {
        r["fmt"]: r
        for r in stratified_thresholds(df, "fmt", base_rate=0.1, min_n=50).collect()
    }
    # big stratum stays at the base rate; tiny is clamped to keep-all
    assert thr["big"]["threshold"] == int(0.1 * SAMPLE_SPACE)
    assert thr["tiny"]["threshold"] == SAMPLE_SPACE
    assert thr["big"]["n_pop"] == 1000 and thr["tiny"]["n_pop"] == 5
    # a mid stratum gets the exact ceil arithmetic
    import math

    mid = spark.createDataFrame(
        [("p", "mid", f"m{i}") for i in range(200)],
        "part string, fmt string, image_id string",
    )
    t = stratified_thresholds(mid, "fmt", base_rate=0.1, min_n=50).first()
    assert t["threshold"] == math.ceil(SAMPLE_SPACE * 50.0 / 200)

    # the whole tiny stratum is in the sample; selection is invariant
    # under repartitioning
    sampled = stratified_sample_frame(
        df, "fmt", stratified_thresholds(df, "fmt", 0.1, 50), "s77"
    )
    got = sorted(
        r["image_id"] for r in sampled.filter("fmt = 'tiny'").collect()
    )
    assert got == [f"t{i}" for i in range(5)]
    re_got = sorted(
        r["image_id"]
        for r in stratified_sample_frame(
            df.repartition(7), "fmt", stratified_thresholds(df, "fmt", 0.1, 50), "s77"
        ).collect()
    )
    assert re_got == sorted(r["image_id"] for r in sampled.collect())


def test_stratified_guards(spark):
    from bigdime_spark.operators.decode import DecodeIntegrity
    from bigdime_spark.operators.infer import stratified_thresholds

    df = spark.createDataFrame([("p", "x", "a")], "part string, fmt string, image_id string")
    with pytest.raises(ValueError, match="base_rate"):
        stratified_thresholds(df, "fmt", base_rate=0.0, min_n=1)
    with pytest.raises(ValueError, match="min_n"):
        stratified_thresholds(df, "fmt", base_rate=0.5, min_n=-1)
    with pytest.raises(ValueError, match="requires sample_rate < 1"):
        DecodeIntegrity(sample_stratify="fmt")
    with pytest.raises(ValueError, match="sample_min_n"):
        DecodeIntegrity(sample_rate=0.5, sample_stratify="fmt", sample_min_n=-1)


def test_stratified_decode_catches_rare_stratum_corruption(spark):
    """The C77 story end-to-end: a 3-row ppm stratum with 2 truncated
    payloads chosen OUTSIDE the 5% uniform hash sample. Uniform
    sampled decode provably misses them; stratified sampling with a
    min-n floor decodes the whole stratum, flags both, and the
    per-stratum gate names ppm."""
    from pyspark.sql import functions as F

    from bigdime_spark.plans.suite import StatsProfile, ValidationSuite
    from bigdime_spark.sources.synth import build_fixture

    fx = build_fixture(spark, n_rows=400, n_parts=2)  # seed matches decode_seed
    ppm_ids = sorted(
        r["image_id"] for r in fx.raw.filter("fmt = 'ppm'").collect()
    )
    keep_ppm = ppm_ids[:3]
    # corrupt two kept ppm rows that the 5% uniform sample would skip
    outside = [
        i for i in keep_ppm
        if int(hashlib.md5(f"{i}:{SEED}".encode()).hexdigest()[:10], 16)
        >= int(0.05 * SAMPLE_SPACE)
    ][:2]
    assert len(outside) == 2
    raw = fx.raw.filter(
        (F.col("fmt") != "ppm") | F.col("image_id").isin(keep_ppm)
    ).withColumn(
        "bytes",
        F.when(
            F.col("image_id").isin(outside),
            F.expr("substring(bytes, 1, length(bytes) - 1)"),
        ).otherwise(F.col("bytes")),
    )

    def run_suite(**kw):
        suite = ValidationSuite(
            not_null=(),
            check_record_count=False,
            check_checksum=False,
            check_uniqueness=False,
            check_referential=False,
            check_caption=False,
            check_drift=False,
            check_domains=False,
            stats=StatsProfile(columns=[]),
            check_decode=True,
            decode_seed=42,
            decode_snapshots=("raw",),
            decode_sample_rate=0.05,
            **kw,
        )
        res = suite.run(spark, raw, run_id="c77")
        out = {
            "viol": res.violations.filter(
                F.col("constraint") == "decode"
            ).count(),
            "rate": {
                r["part"]: r
                for r in res.verdicts.filter(
                    F.col("constraint") == "decode_rate"
                ).collect()
            },
        }
        res.release()
        return out

    uniform = run_suite(decode_rate_gate=(0.1, 1.96))
    assert uniform["viol"] == 0  # provably outside the uniform sample

    strat = run_suite(
        decode_rate_gate=(0.1, 1.96),
        decode_sample_stratify="fmt",
        decode_sample_min_n=50,
    )
    assert strat["viol"] == 2  # the whole ppm stratum decoded
    bad_part = {
        p: r for p, r in strat["rate"].items() if r["verdict"] != "PASS"
    }
    assert bad_part  # at least one part's gate reacts
    assert all("ppm" in r["observed"] for r in bad_part.values())
    assert all("per fmt" in r["expected"] for r in strat["rate"].values())


def test_stratified_null_stratum_kept(spark):
    """A NULL stratum is a real segment (the C72 convention): the
    null-safe threshold join must keep NULL-fmt rows in the sample
    instead of equi-join-dropping them — the exact coverage loss the
    stratified sampler exists to prevent."""
    from bigdime_spark.operators.infer import (
        stratified_sample_frame,
        stratified_thresholds,
    )

    rows = [("p", "big", f"b{i}") for i in range(200)] + [
        ("p", None, f"n{i}") for i in range(4)
    ]
    df = spark.createDataFrame(rows, "part string, fmt string, image_id string")
    thr = stratified_thresholds(df, "fmt", base_rate=0.1, min_n=50)
    null_thr = [r for r in thr.collect() if r["fmt"] is None]
    assert null_thr and null_thr[0]["n_pop"] == 4
    sampled = stratified_sample_frame(df, "fmt", thr, "ns")
    got = sorted(
        r["image_id"] for r in sampled.filter(F.col("fmt").isNull()).collect()
    )
    assert got == [f"n{i}" for i in range(4)]  # min_n ≥ size → all kept


def test_stratified_gate_does_not_misattribute_duplicate_ids(spark):
    """A duplicated image_id whose copy in ANOTHER part is healthy
    must not inherit the corrupt copy's failure: k is keyed by
    (image_id, part), not image_id alone."""
    from pyspark.sql import functions as F

    from bigdime_spark.plans.suite import StatsProfile, ValidationSuite
    from bigdime_spark.sources.synth import build_fixture

    fx = build_fixture(spark, n_rows=80, n_parts=2)
    x = fx.raw.filter("part = 'p0000'").limit(1).collect()[0]["image_id"]
    pristine_copy = fx.raw.filter(F.col("image_id") == x).withColumn(
        "part", F.lit("p0001")
    )
    raw = fx.raw.withColumn(
        "bytes",
        F.when(
            F.col("image_id") == x,
            F.expr("substring(bytes, 1, length(bytes) - 1)"),
        ).otherwise(F.col("bytes")),
    ).unionByName(pristine_copy)

    suite = ValidationSuite(
        not_null=(),
        check_record_count=False,
        check_checksum=False,
        check_uniqueness=False,
        check_referential=False,
        check_caption=False,
        check_drift=False,
        check_domains=False,
        stats=StatsProfile(columns=[]),
        check_decode=True,
        decode_seed=42,
        decode_snapshots=("raw",),
        decode_sample_rate=0.5,
        decode_sample_stratify="fmt",
        decode_sample_min_n=1000,  # ≥ part size → every row sampled
        decode_rate_gate=(0.001, 1.96),
    )
    res = suite.run(spark, raw, run_id="dup77")
    got = {
        r["part"]: r["observed"]
        for r in res.verdicts.filter(
            F.col("constraint") == "decode_rate"
        ).collect()
    }
    assert "fail=1" in got["p0000"]  # the corrupt copy's stratum pages
    assert "fail=0" in got["p0001"]  # the healthy copy does not
    res.release()


def test_sample_min_without_stratify_refused():
    from bigdime_spark.operators.decode import DecodeIntegrity

    with pytest.raises(ValueError, match="requires sample_stratify"):
        DecodeIntegrity(sample_rate=0.5, sample_min_n=10)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_strata = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c", None]), st.integers(0, 40)),
    min_size=1,
    max_size=4,
    unique_by=lambda t: t[0],
)


@given(strata=_strata, base=st.sampled_from([0.05, 0.3, 1.0]),
       min_n=st.integers(0, 30))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_stratified_selection_matches_python_reference(
    spark, strata, base, min_n
):
    """Thresholds AND the selected id set must equal an independent
    pure-python replay (md5 hashing, ceil arithmetic, clamps, NULL
    stratum) on randomized strata shapes."""
    from bigdime_spark.operators.infer import (
        stratified_sample_frame,
        stratified_thresholds,
    )

    rows = [
        ("p", fmt, f"{fmt}-{i}") for fmt, n in strata for i in range(n)
    ]
    if not rows:
        return
    df = spark.createDataFrame(rows, "part string, fmt string, image_id string")
    thr = stratified_thresholds(df, "fmt", base_rate=base, min_n=min_n)
    got_thr = {r["fmt"]: r["threshold"] for r in thr.collect()}
    want_thr = {}
    for fmt, n in strata:
        if n == 0:
            continue
        boosted = math.ceil(SAMPLE_SPACE * float(min_n) / n)
        want_thr[fmt] = min(
            SAMPLE_SPACE, max(int(base * SAMPLE_SPACE), boosted)
        )
    assert got_thr == want_thr

    got_ids = sorted(
        r["image_id"]
        for r in stratified_sample_frame(df, "fmt", thr, "prop").collect()
    )
    want_ids = sorted(
        i
        for _, fmt, i in rows
        if int(hashlib.md5(f"{i}:prop".encode()).hexdigest()[:10], 16)
        < want_thr[fmt]
    )
    assert got_ids == want_ids
