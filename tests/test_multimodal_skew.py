"""Oracles for the multimodal Arrow passes (image metadata / resize,
PCM16 audio features, packed-raw video frame sampling — codecs absent
from the container are stubbed, the Spark plumbing is real) and the
deterministic skew helpers.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdime_spark.functions import skew
from bigdime_spark.operators import multimodal as mm
from bigdime_spark.sources import synth


@pytest.fixture(scope="module")
def images(spark):
    rows = []
    for i in range(20):
        image_id = f"m-{i:04d}"
        px = synth.make_pixels(7, image_id, 32, 16)
        fmt = ["raw", "ppm", "pngz"][i % 3]
        rows.append((image_id, synth.encode(px, fmt), 32, 16, fmt))
    rows.append(("m-bad", b"\x00\x01", 32, 16, "pngz"))  # corrupt
    rows.append(("m-jpeg", b"\xff\xd8\xff", 32, 16, "jpeg"))  # stubbed codec
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )


def test_image_metadata(images):
    out = {r["image_id"]: r for r in mm.image_metadata(images).collect()}
    assert len(out) == 22
    assert out["m-0000"]["ok"] and out["m-0000"]["w"] == 32 and out["m-0000"]["h"] == 16
    assert 0 < out["m-0000"]["mean_luma"] < 255
    assert not out["m-bad"]["ok"]
    assert not out["m-jpeg"]["ok"] and "NotImplementedError" in out["m-jpeg"]["reason"]


def test_resize_images_exact_nn(images, spark):
    out = {r["image_id"]: r for r in mm.resize_images(images, 8, 8).collect()}
    assert "m-bad" not in out and "m-jpeg" not in out  # undecodable dropped
    r = out["m-0000"]
    assert (r["w"], r["h"], len(r["bytes"])) == (8, 8, 8 * 8 * 3)
    # exact nearest-neighbor oracle recomputed in-process
    px = synth.make_pixels(7, "m-0000", 32, 16)
    ys = np.arange(8) * 16 // 8
    xs = np.arange(8) * 32 // 8
    assert r["bytes"] == px[ys][:, xs].tobytes()


def test_audio_features_pcm16(spark):
    t = np.arange(16000, dtype=np.float64)
    sine = (np.sin(2 * np.pi * 440 * t / 16000) * 20000).astype("<i2")
    rows = [
        ("a-sine", sine.tobytes(), "pcm16"),
        ("a-silence", np.zeros(8000, dtype="<i2").tobytes(), "pcm16"),
        ("a-mp3", b"ID3", "mp3"),
    ]
    df = spark.createDataFrame(rows, "audio_id string, bytes binary, fmt string")
    out = {r["audio_id"]: r for r in mm.audio_features(df).collect()}
    assert out["a-sine"]["ok"] and out["a-sine"]["n_samples"] == 16000
    assert out["a-sine"]["duration_s"] == 1.0
    assert abs(out["a-sine"]["rms"] - (20000 / 32768) / np.sqrt(2)) < 0.01
    assert 870 <= out["a-sine"]["zero_crossings"] <= 890  # 2 × 440 Hz ± edge
    assert out["a-silence"]["rms"] == 0.0
    assert not out["a-mp3"]["ok"] and "NotImplementedError" in out["a-mp3"]["reason"]


def test_video_frame_sampling(spark):
    frames = [synth.make_pixels(11, f"v0/{i}", 8, 4) for i in range(25)]
    payload = mm.pack_raw_video(frames)
    df = spark.createDataFrame(
        [("v0", payload, 8, 4, 25, "rawpack")],
        "video_id string, bytes binary, w int, h int, n_frames int, fmt string",
    )
    out = sorted(mm.sample_video_frames(df, every_n=10).collect(), key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in out] == [0, 10, 20]
    assert out[1]["frame"] == frames[10].tobytes()  # byte-exact frame slice


def test_salted_count_equals_plain(spark):
    # hot key: 70% of rows share one key
    rows = [(i, "hot" if i % 10 < 7 else f"k{i % 97}") for i in range(5000)]
    df = spark.createDataFrame(rows, "i long, key string")
    salted = {r["key"]: r["n"] for r in skew.salted_count(df, "key", ("i",)).collect()}
    plain = {r["key"]: r["n"] for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert salted == plain


def test_hot_keys_detects_the_hot_key(spark):
    rows = [(i, "hot" if i % 10 < 7 else f"k{i % 97}") for i in range(5000)]
    df = spark.createDataFrame(rows, "i long, key string")
    hot = {r["key"]: r["ratio"] for r in skew.hot_keys(df, "key", 0.05).collect()}
    assert set(hot) == {"hot"}
    assert abs(hot["hot"] - 0.7) < 0.01


def test_salted_agg_general(spark):
    rows = [(i, "hot" if i % 2 == 0 else "cold", float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "i long, key string, v double")
    out = {
        r["key"]: (r["n"], r["mx"])
        for r in skew.salted_agg(
            df,
            "key",
            ("i",),
            partials=[
                (F.count(F.lit(1)).alias("_n"), F.sum("_n").alias("n")),
                (F.max("v").alias("_mx"), F.max("_mx").alias("mx")),
            ],
        ).collect()
    }
    assert out["hot"] == (500, 998.0)
    assert out["cold"] == (500, 999.0)
