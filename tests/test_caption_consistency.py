"""Within-corpus caption<->image consistency (C62,
operators/caption.conflicting_caption_groups / stock_caption_groups).
SQL-oracle twins: `caption_conflicts` / `caption_stock` in the driver
contract."""

from __future__ import annotations

import pytest

from bigdime_spark.operators.caption import (
    conflicting_caption_groups,
    stock_caption_groups,
)

SCHEMA = "image_id long, phash long, caption string"


def test_conflicting_caption_groups(spark):
    rows = [
        (1, 10, "a cat"), (2, 10, "a dog"),        # conflict: two labels
        (3, 20, "same"), (4, 20, "same"),          # clean dup group
        (5, 30, "labeled"), (6, 30, None),         # NULL label IS a conflict
        (7, 40, "alone"),                          # singleton: excluded
        (8, None, "x"), (9, None, "y"),            # NULL phash: no identity
    ]
    got = {
        r["phash"]: r
        for r in conflicting_caption_groups(
            spark.createDataFrame(rows, SCHEMA)
        ).collect()
    }
    assert set(got) == {10, 30}
    assert got[10]["n_captions"] == 2 and got[10]["sample_ids"] == [1, 2]
    assert got[30]["n_captions"] == 2  # 1 distinct + 1 for the NULL
    assert got[30]["n_rows"] == 2


def test_conflicting_sample_bounded_counts_exact(spark):
    rows = [(i, 7, f"cap{i % 4}") for i in range(12)]
    r = conflicting_caption_groups(
        spark.createDataFrame(rows, SCHEMA), max_ids=3
    ).collect()[0]
    assert r["n_rows"] == 12 and r["n_captions"] == 4
    assert r["sample_ids"] == [0, 1, 2]  # bounded, deterministic


def test_stock_caption_groups(spark):
    rows = [
        (1, 100, "a photo"), (2, 101, "a photo"), (3, 102, "a photo"),
        (4, 200, "reupload"), (5, 200, "reupload"), (6, 200, "reupload"),
        (7, 300, None), (8, 301, None), (9, 302, None),
        (10, 400, "unique caption"),
    ]
    got = stock_caption_groups(
        spark.createDataFrame(rows, SCHEMA), min_images=3
    ).collect()
    # 'reupload' is 3 rows but ONE phash; NULL captions never stock
    assert [(r["caption"], r["n_rows"], r["n_images"]) for r in got] == [
        ("a photo", 3, 3)
    ]


def test_stock_refusal(spark):
    df = spark.createDataFrame([(1, 1, "c")], SCHEMA)
    with pytest.raises(ValueError, match="min_images"):
        stock_caption_groups(df, min_images=1)
