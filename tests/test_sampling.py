"""C23/C24: deterministic sampling, mix planning, shard packing.

Properties under test (operators/sampling.py):
* hash sampling is deterministic, repartition-invariant, and lands
  within a statistical tolerance of the requested rate;
* the mix plan yields exact integer thresholds, caps rates at 1,
  surfaces under-supplied and missing domains, rejects bad weights;
* shard packing is a true global prefix sum — invariant to
  n_buckets, every shard within budget ± max row, matches a pandas
  sequential reference exactly;
* plan shapes: sampling is a scan-local filter (no exchange);
  shard packing never uses a single-partition global window.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdime_spark.operators.sampling import (
    SAMPLE_SPACE,
    mix_plan,
    normalized_weights,
    sample_hash,
    shard_pack,
    stratified_sample,
    threshold_for_rate,
    uniform_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    """600 synthetic docs over 3 domains with deterministic token counts."""
    rows = [
        (i, f"dom{i % 3}", " ".join(f"w{j}" for j in range((i * 7) % 40 + 1)))
        for i in range(600)
    ]
    return spark.createDataFrame(rows, "doc_id bigint, source string, text string")


# ---------------------------------------------------------------- uniform

def test_uniform_sample_rate_and_determinism(docs):
    out1 = uniform_sample(docs, "doc_id", 0.3, "s1")
    out2 = uniform_sample(docs, "doc_id", 0.3, "s1")
    ids1 = {r["doc_id"] for r in out1.select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in out2.select("doc_id").collect()}
    assert ids1 == ids2
    # 600 Bernoulli(0.3) draws: mean 180, sd ~11.2 — 5 sd tolerance
    assert 124 <= len(ids1) <= 236


def test_uniform_sample_repartition_invariant(docs):
    base = {r["doc_id"] for r in uniform_sample(docs, "doc_id", 0.5, "s2").collect()}
    shuffled = {
        r["doc_id"]
        for r in uniform_sample(docs.repartition(17), "doc_id", 0.5, "s2").collect()
    }
    assert base == shuffled


def test_uniform_sample_seeds_independent(docs):
    a = {r["doc_id"] for r in uniform_sample(docs, "doc_id", 0.5, "sa").collect()}
    b = {r["doc_id"] for r in uniform_sample(docs, "doc_id", 0.5, "sb").collect()}
    assert a != b
    # overlap ~ rate^2 * n = 150 expected; must not be all-or-nothing
    assert 0 < len(a & b) < min(len(a), len(b))


def test_uniform_sample_rate_edges(docs):
    assert uniform_sample(docs, "doc_id", 0.0, "s").count() == 0
    assert uniform_sample(docs, "doc_id", 1.0, "s").count() == 600
    with pytest.raises(ValueError, match="rate"):
        threshold_for_rate(1.5)


def test_uniform_sample_is_scan_local(docs):
    """The predicate must not introduce an exchange."""
    plan = uniform_sample(docs, "doc_id", 0.3, "s")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------- mix plan

def test_normalized_weights_validation():
    assert normalized_weights({"a": 1, "b": 3}) == {"a": 0.25, "b": 0.75}
    with pytest.raises(ValueError, match="non-empty"):
        normalized_weights({})
    with pytest.raises(ValueError, match="negative"):
        normalized_weights({"a": -1, "b": 2})
    with pytest.raises(ValueError, match="positive"):
        normalized_weights({"a": 0.0})


def test_mix_plan_thresholds(docs):
    # dom0/dom1/dom2 have 200 docs each; weights 2:1:1 at target 200
    # → quotas 100/50/50 → rates 0.5/0.25/0.25
    plan = {
        r["source"]: r.asDict()
        for r in mix_plan(docs, "source", {"dom0": 2, "dom1": 1, "dom2": 1}, 200).collect()
    }
    assert plan["dom0"]["quota"] == 100 and plan["dom0"]["n_rows"] == 200
    assert plan["dom0"]["threshold"] == int(0.5 * SAMPLE_SPACE)
    assert plan["dom1"]["threshold"] == int(0.25 * SAMPLE_SPACE)


def test_mix_plan_caps_rate_and_flags_missing(docs):
    # dom0 quota 1000 > 200 available → rate capped at 1 (threshold = SPACE);
    # ghost domain absent from data → n_rows 0, threshold 0 (visible under-supply)
    plan = {
        r["source"]: r.asDict()
        for r in mix_plan(docs, "source", {"dom0": 1, "ghost": 1}, 2000).collect()
    }
    assert plan["dom0"]["threshold"] == SAMPLE_SPACE
    assert plan["ghost"]["n_rows"] == 0 and plan["ghost"]["threshold"] == 0


def test_stratified_sample_hits_mix(docs):
    out = stratified_sample(
        docs, "source", "doc_id", {"dom0": 2, "dom1": 1, "dom2": 1}, 200, "mix-seed"
    )
    got = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # 200 draws at 0.5 (sd 7.1) / 0.25 (sd 6.1): 5-sd windows
    assert 65 <= got["dom0"] <= 135
    assert 20 <= got.get("dom1", 0) <= 81
    assert 20 <= got.get("dom2", 0) <= 81
    # unweighted domains would be excluded entirely
    out2 = stratified_sample(docs, "source", "doc_id", {"dom0": 1}, 100, "s")
    assert out2.select("source").distinct().collect()[0]["source"] == "dom0"


def test_stratified_sample_excludes_only_corpus_count_exchange(docs):
    """The corpus side must not shuffle: the ONLY aggregate exchange is
    the domains-sized count inside the plan; the plan joins back as a
    broadcast."""
    out = stratified_sample(docs, "source", "doc_id", {"dom0": 1}, 100, "s")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------- shard pack

def _pandas_reference(pdf, budget):
    pdf = pdf.sort_values("doc_id").reset_index(drop=True)
    cum = pdf["n_tokens"].cumsum() - pdf["n_tokens"]
    return dict(zip(pdf["doc_id"], (cum // budget).astype(int)))


def test_shard_pack_matches_sequential_reference(docs):
    out = shard_pack(docs, "doc_id", F.size(F.split("text", " ")), 500, n_buckets=8)
    got = {r["doc_id"]: r["shard_id"] for r in out.collect()}
    ref = _pandas_reference(
        docs.select("doc_id", F.size(F.split("text", " ")).alias("n_tokens")).toPandas(),
        500,
    )
    assert got == ref


def test_shard_pack_invariant_to_bucket_count(docs):
    tok = F.size(F.split("text", " "))
    one = {r["doc_id"]: r["shard_id"] for r in shard_pack(docs, "doc_id", tok, 700, n_buckets=1).collect()}
    many = {r["doc_id"]: r["shard_id"] for r in shard_pack(docs, "doc_id", tok, 700, n_buckets=23).collect()}
    assert one == many


def test_shard_pack_budget_respected(docs):
    tok = F.size(F.split("text", " "))
    out = shard_pack(docs, "doc_id", tok, 500, n_buckets=8)
    sums = {
        r["shard_id"]: r["tok"]
        for r in out.groupBy("shard_id").agg(F.sum("n_tokens").alias("tok")).collect()
    }
    max_doc = 40
    last = max(sums)
    for sid, s in sums.items():
        assert s <= 500 + max_doc
        if sid != last:
            assert s >= 500 - max_doc


def test_shard_pack_empty_and_validation(docs, spark):
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    out = shard_pack(empty, "doc_id", F.lit(1), 100)
    assert out.count() == 0
    assert out.columns == ["doc_id", "n_tokens", "shard_id"]
    with pytest.raises(ValueError, match="budget"):
        shard_pack(docs, "doc_id", F.lit(1), 0)
    with pytest.raises(ValueError, match="n_buckets"):
        shard_pack(docs, "doc_id", F.lit(1), 10, n_buckets=0)


def test_shard_pack_no_global_window(docs):
    """The prefix sum must never collapse to a single partition: the
    window is partitioned by bucket, so the plan's Window node sits on
    a hashpartitioning exchange, not SinglePartition."""
    out = shard_pack(docs, "doc_id", F.size(F.split("text", " ")), 500, n_buckets=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert "SinglePartition" not in plan


def test_sample_hash_range(docs):
    row = docs.select(
        F.min(sample_hash(F.col("doc_id"), "s")).alias("lo"),
        F.max(sample_hash(F.col("doc_id"), "s")).alias("hi"),
    ).collect()[0]
    assert 0 <= row["lo"] <= row["hi"] < SAMPLE_SPACE


# ---------------------------------------------------------------- weighted

def _wdocs(docs):
    """Weight column spanning the clamp range plus NULL and NaN rows:
    doc_id 0-99 → 0.0..~2.0 ramp (clamp engages above 1.0), %101==0 →
    NULL, %103==0 → NaN."""
    return docs.withColumn(
        "wgt",
        F.when(F.col("doc_id") % 101 == 0, F.lit(None).cast("double"))
        .when(F.col("doc_id") % 103 == 0, F.lit(float("nan")))
        .otherwise(F.col("doc_id") / F.lit(300.0)),
    )


def test_weighted_sample_determinism_and_repartition(docs):
    from bigdime_spark.operators.sampling import weighted_sample

    wd = _wdocs(docs)
    a = {r["doc_id"] for r in weighted_sample(wd, "doc_id", "wgt", "w1").collect()}
    b = {
        r["doc_id"]
        for r in weighted_sample(wd.repartition(13), "doc_id", "wgt", "w1").collect()
    }
    assert a == b and len(a) > 0


def test_weighted_sample_excludes_null_and_nan(docs):
    from bigdime_spark.operators.sampling import weighted_sample

    wd = _wdocs(docs)
    kept = {r["doc_id"] for r in weighted_sample(wd, "doc_id", "wgt", "w2").collect()}
    assert not any(i % 101 == 0 or i % 103 == 0 for i in kept)
    # zero weight is a real (never-kept) preference, not an exclusion bug
    assert 0 not in kept


def test_weighted_sample_probability_monotone(docs):
    """Clamped weight 1.0 keeps everything at rate 1.0; the kept set at
    rate r is a SUBSET of the kept set at any higher rate (thresholds
    scale monotonically against the same hash)."""
    from bigdime_spark.operators.sampling import weighted_sample

    wd = _wdocs(docs)
    full = weighted_sample(
        wd.filter(F.col("doc_id") >= 300), "doc_id", "wgt", "w3"
    )  # weights >= 1.0 → clamp → keep-all at rate 1
    eligible = wd.filter(
        (F.col("doc_id") >= 300)
        & (F.col("doc_id") % 101 != 0)
        & (F.col("doc_id") % 103 != 0)
    ).count()
    assert full.count() == eligible
    lo = {r["doc_id"] for r in weighted_sample(wd, "doc_id", "wgt", "w4", rate=0.2).collect()}
    hi = {r["doc_id"] for r in weighted_sample(wd, "doc_id", "wgt", "w4", rate=0.8).collect()}
    assert lo <= hi


def test_weighted_sample_degrades_to_uniform(docs):
    """Constant weight 1.0 at rate r == uniform_sample(r): same hash,
    same integer threshold arithmetic."""
    from bigdime_spark.operators.sampling import weighted_sample

    wd = docs.withColumn("wgt", F.lit(1.0))
    w = {r["doc_id"] for r in weighted_sample(wd, "doc_id", "wgt", "s9", rate=0.4).collect()}
    u = {r["doc_id"] for r in uniform_sample(docs, "doc_id", 0.4, "s9").collect()}
    assert w == u


def test_weighted_sample_is_scan_local(docs):
    from bigdime_spark.operators.sampling import weighted_sample

    plan = weighted_sample(_wdocs(docs), "doc_id", "wgt", "w5")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_weighted_sample_rate_validation(docs):
    from bigdime_spark.operators.sampling import weighted_sample

    with pytest.raises(ValueError, match="rate"):
        weighted_sample(_wdocs(docs), "doc_id", "wgt", "w6", rate=1.5)
