"""Format-mask profile (C47) — translation, squeeze, NULL-group
retention, deterministic top-k cap with visible truncation, per-part
mode, and the CLI surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdime_spark.operators.stats import mask_col, mask_profile


def test_mask_translation_and_squeeze(spark):
    rows = [
        ("Clerk#000000001", "Aaaaa#999999999", "Aa#9"),
        ("ORD-42x", "AAA-99a", "A-9a"),
        ("1-URGENT", "9-AAAAAA", "9-A"),
        ("  ", "  ", " "),
        (None, None, None),
    ]
    df = spark.createDataFrame([(v,) for v, _, _ in rows], "v string")
    got = df.select(
        "v",
        mask_col(F.col("v")).alias("raw"),
        mask_col(F.col("v"), squeeze=True).alias("sq"),
    ).collect()
    want = {v: (r, s) for v, r, s in rows}
    for r in got:
        assert (r["raw"], r["sq"]) == want[r["v"]], r


def test_profile_null_group_and_exact_counts(spark):
    df = spark.createDataFrame(
        [("A1",), ("B2",), ("c3",), (None,), (None,)], "v string"
    )
    rows = mask_profile(df, ["v"]).collect()
    m = {r["mask"]: r for r in rows}
    assert m["A9"]["n"] == 2 and m["a9"]["n"] == 1 and m[None]["n"] == 2
    assert all(r["n_rows"] == 5 and r["n_masks"] == 3 for r in rows)
    assert m["A9"]["frac"] == 0.4
    # NULLS FIRST tie-break: the null mask (n=2) ranks before A9 (n=2)
    assert m[None]["rank"] == 1 and m["A9"]["rank"] == 2


def test_top_k_cap_truncates_visibly(spark):
    # six width-distinct masks, cap at 3: ranks 1-3 survive, n_masks
    # still says 6, and ordering is (n desc, mask asc)
    vals = ["1"] * 5 + ["22"] * 4 + ["333"] * 3 + ["4444"] * 2 + ["55555", "666666"]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    rows = mask_profile(df, ["v"], top_k=3).collect()
    assert len(rows) == 3
    assert [r["mask"] for r in sorted(rows, key=lambda r: r["rank"])] == [
        "9", "99", "999"
    ]
    assert all(r["n_masks"] == 6 and r["n_rows"] == 16 for r in rows)


def test_profile_per_part(spark):
    df = spark.createDataFrame(
        [("p0", "X1"), ("p0", "Y2"), ("p1", "zz")],
        "part string, v string",
    )
    rows = mask_profile(df, ["v"], part_col="part").collect()
    by = {(r["part"], r["mask"]): r for r in rows}
    assert by[("p0", "A9")]["n"] == 2 and by[("p0", "A9")]["n_rows"] == 2
    assert by[("p1", "aa")]["n"] == 1 and by[("p1", "aa")]["n_masks"] == 1


def test_mask_drift_catches_scheme_switch(spark):
    """High-cardinality ids: every value is unique on both sides (raw
    categorical drift would see nothing but support churn), yet the
    MASK distribution pins the scheme switch to the changed part."""
    from bigdime_spark.operators.drift import mask_drift

    raw = spark.range(200).select(
        F.concat(F.lit("p"), (F.col("id") % 2).cast("string")).alias("part"),
        F.concat(F.lit("OLD-"), F.lpad(F.col("id").cast("string"), 6, "0")).alias(
            "doc_id"
        ),
    )
    cur = spark.range(200).select(
        F.concat(F.lit("p"), (F.col("id") % 2).cast("string")).alias("part"),
        F.when(
            F.col("id") % 2 == 0,  # p0: half switch to the new scheme
            F.when(
                F.col("id") % 4 == 0,
                F.concat(F.lit("new_"), F.col("id").cast("string")),
            ).otherwise(
                F.concat(F.lit("OLD-"), F.lpad(F.col("id").cast("string"), 6, "0"))
            ),
        ).otherwise(  # p1: unchanged scheme
            F.concat(F.lit("OLD-"), F.lpad(F.col("id").cast("string"), 6, "0"))
        ).alias("doc_id"),
    )
    got = {r["part"]: r for r in mask_drift(raw, cur, ["doc_id"]).collect()}
    assert got["p1"]["js"] == 0.0 and got["p1"]["n_cats"] == 1
    assert got["p0"]["js"] > 0.1 and got["p0"]["n_cats"] >= 2
    assert got["p0"]["psi"] > got["p1"]["psi"]


def test_mask_drift_suite_and_config(spark):
    """drift_mask.<col> in the suite: the part whose curated ids
    switched scheme FAILs PSI, the unchanged part PASSes; and
    mask_drift_cols round-trips through plain config."""
    from bigdime_spark.plans.config import suite_from_config
    from bigdime_spark.plans.suite import StatsProfile, ValidationSuite
    from bigdime_spark.schema import FAIL, PASS

    def ids(switch_part: str | None):
        rows = []
        for p in ("p0", "p1"):
            for k in range(40):
                if p == switch_part:
                    v = f"new_{k}xx"  # one mask: aaa_9aa / aaa_99aa
                else:
                    v = f"OLD-{k:06d}"
                rows.append((p, f"{p}-{k}", v))
        return spark.createDataFrame(
            rows, "part string, image_id string, doc_id string"
        )

    raw, cur = ids(None), ids("p0")
    suite = ValidationSuite(
        declared_schema=raw.schema,
        not_null=(),
        check_record_count=False,
        check_checksum=False,
        check_uniqueness=False,
        check_referential=False,
        check_caption=False,
        check_drift=False,
        check_domains=False,
        stats=StatsProfile(columns=[]),
        mask_drift_cols=("doc_id",),
    )
    res = suite.run(spark, raw, cur, run_id="mask-drift")
    v = {
        r["part"]: r["verdict"]
        for r in res.verdicts.filter(
            F.col("constraint") == "drift_mask.doc_id"
        ).collect()
    }
    assert v == {"p0": FAIL, "p1": PASS}
    res.release()

    cfg_suite = suite_from_config({"mask_drift_cols": ["doc_id", "image_id"]})
    assert cfg_suite.mask_drift_cols == ("doc_id", "image_id")


def test_cli_profile_masks(spark, tmp_path):
    import duckdb

    from bigdime_spark import cli

    df = spark.range(100).select(
        F.lit("p0").alias("part"),
        F.when(
            F.col("id") % 4 == 0,
            F.concat(F.lit("new_"), F.col("id").cast("string")),
        )
        .otherwise(F.concat(F.lit("OLD-"), F.lpad(F.col("id").cast("string"), 5, "0")))
        .alias("doc_id"),
    )
    src = str(tmp_path / "tbl")
    df.write.parquet(src)
    out = str(tmp_path / "prof")
    rc = cli.main(
        ["profile", "--input", src, "--masks", "doc_id", "--out", out,
         "--master", "local[2]"]
    )
    assert rc == 0
    got = duckdb.sql(
        f"select mask, n from read_parquet('{out}/masks/*.parquet') order by n desc"
    ).fetchall()
    assert got[0] == ("AAA-99999", 75)  # the dominant legacy scheme
    assert sum(n for _, n in got) == 100
