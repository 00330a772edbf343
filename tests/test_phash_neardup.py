"""phash hamming≤k near-dup over the image table (round-2 verdict
item 2): the generic int64 pigeonhole band join handles the FULL
signed 64-bit range (sign-bit chunks never leak), and the optional
suite constraint flags exactly the planted near-dup images with
cross-partition attribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdime_spark.operators.dedup import hamming_pairs_on_column
from bigdime_spark.plans.suite import ValidationSuite
from bigdime_spark.sources.synth import build_fixture


def _x64(a: int, b: int) -> int:
    """Two's-complement int64 xor (python ints are unbounded)."""
    v = (a ^ b) & ((1 << 64) - 1)
    return v - (1 << 64) if v >= (1 << 63) else v


def test_int64_hamming_pairs_with_sign_bit(spark):
    base = -4611686018427387905  # high bits set: exercises arithmetic shiftright
    rows = [
        ("a", base),
        ("b", _x64(base, 1)),          # hamming 1 (low chunk)
        ("c", _x64(base, 1 << 63)),    # hamming 1 (sign bit — top chunk)
        ("d", 12345),                  # far away
    ]
    df = spark.createDataFrame(rows, "id string, fp long")
    got = {
        (r["id1"], r["id2"], r["hamming"])
        for r in hamming_pairs_on_column(df, "id", "fp", bits=64, k=2).collect()
    }
    assert got == {("a", "b", 1), ("a", "c", 1), ("b", "c", 2)}


def test_carry_cols_ride_the_band_join(spark):
    rows = [("a", 7, "p0"), ("b", 7 ^ 1, "p1"), ("c", 999999, "p2")]
    df = spark.createDataFrame(rows, "id string, fp long, part string")
    got = hamming_pairs_on_column(
        df, "id", "fp", bits=64, k=1, carry_cols=("part",)
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["id1"], r["id2"], r["part_1"], r["part_2"]) == ("a", "b", "p0", "p1")


def test_suite_flags_planted_near_dup_images(spark):
    fx = build_fixture(spark, n_rows=200, n_parts=4)
    first_per_part = {
        r["part"]: r
        for r in fx.raw.groupBy("part")
        .agg(F.min("image_id").alias("image_id"))
        .join(fx.raw.select("image_id", "part", "phash"), ["part", "image_id"])
        .collect()
    }
    a = first_per_part["p0000"]
    b = first_per_part["p0001"]
    planted = fx.raw.withColumn(
        "phash",
        F.when(
            F.col("image_id") == b["image_id"],
            F.lit(_x64(a["phash"], 2)).cast("long"),  # hamming 1 from a, cross-part
        ).otherwise(F.col("phash")),
    )
    suite = ValidationSuite(
        check_record_count=False,
        check_checksum=False,
        check_uniqueness=False,
        check_referential=False,
        check_caption=False,
        check_drift=False,
        check_domains=False,
        not_null=(),
        check_phash_dedup=True,
        phash_k=2,
    )
    res = suite.run(spark, planted, run_id="phash-plant")
    pv = {
        r["part"]: r["verdict"]
        for r in res.verdicts.filter(
            F.col("constraint") == "phash_near_dup.k2"
        ).collect()
    }
    assert pv == {"p0000": "FAIL", "p0001": "FAIL", "p0002": "PASS", "p0003": "PASS"}
    viol = res.violations.filter(F.col("constraint") == "phash_near_dup.k2")
    flagged = {(r["image_id"], r["part"]) for r in viol.collect()}
    assert flagged == {(a["image_id"], "p0000"), (b["image_id"], "p0001")}
    detail = viol.filter(F.col("image_id") == a["image_id"]).first()["detail"]
    assert b["image_id"] in detail and "hamming=1" in detail
    # cluster annotation: component = min member id, n = exact size
    comp = min(a["image_id"], b["image_id"])
    assert f"cluster={comp} n=2" in detail
    res.release()


# ------------------------------ completeness property (hypothesis)

from hypothesis import given, settings, strategies as st  # noqa: E402

_MASK64 = (1 << 64) - 1

# clustered small ints make hamming<=k pairs common; the occasional
# full-range value exercises sign/chunk boundaries
_fp = st.one_of(
    st.integers(min_value=0, max_value=255),
    st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
)


@settings(max_examples=8, deadline=None)
@given(fps=st.lists(_fp, min_size=2, max_size=20, unique=True), k=st.integers(1, 3))
def test_hamming_band_join_is_exactly_brute_force(spark, fps, k):
    """Pigeonhole guarantee: the band join must find EXACTLY the
    brute-force hamming<=k pairs — no candidate within distance k can
    be lost by chunking (completeness), and the bit_count verify kills
    every false candidate (soundness)."""
    rows = [(str(i), v) for i, v in enumerate(fps)]
    df = spark.createDataFrame(rows, "id string, fp long")
    got = {
        (r["id1"], r["id2"], r["hamming"])
        for r in hamming_pairs_on_column(df, "id", "fp", bits=64, k=k).collect()
    }
    want = set()
    for i in range(len(fps)):
        for j in range(i + 1, len(fps)):
            d = bin((fps[i] ^ fps[j]) & _MASK64).count("1")
            if d <= k:
                a, b = str(i), str(j)
                want.add((min(a, b), max(a, b), d))
    assert got == want


def test_cluster_nonconvergence_degrades_to_pair_detail(spark):
    """PhashNearDup with an unreachable max_iter must NOT abort the
    suite (round-5 review finding): the clustering annotation degrades
    to pair-level detail, exactly the pre-clustering output."""
    from bigdime_spark.operators.base import SuiteContext
    from bigdime_spark.operators.dedup import PhashNearDup

    rows = [("a", 7, "p0"), ("b", 7 ^ 1, "p0"), ("c", 999_999, "p1")]
    df = spark.createDataFrame(rows, "image_id string, phash long, part string")
    ctx = SuiteContext(spark=spark, raw=df, curated=df, parts=df.select("part").distinct())
    failed, violations = PhashNearDup(k=1, cluster=True, max_iter=0).run(ctx)
    details = [r["detail"] for r in violations.collect()]
    assert len(details) == 2
    assert all("hamming=1" in d and "cluster=" not in d for d in details)
    for frame in ctx.extras.get("persisted", []):
        frame.unpersist()
