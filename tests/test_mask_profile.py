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
