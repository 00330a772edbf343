"""Deterministic synthetic image+caption table generator (SURVEY M0).

Schema fixed by BASELINE.json:15: (image_id, bytes, w, h, fmt,
caption, phash) + partition column ``part``. Every attribute of a row
is a pure function of ``(seed, image_id)`` so generation is
reproducible regardless of parallelism/partitioning — the generator
runs *distributed* via ``mapInArrow`` over an id range (no driver-side
materialization; at bench scale the bytes never touch the driver).

Codecs are numpy-only (no PIL in this environment — SURVEY §7 M0):

- ``raw``    packed RGB, h*w*3 bytes
- ``ppm``    P6 header + packed RGB
- ``pngz``   zlib-deflated packed RGB ("PNG-like" without filters)
- ``rawq{k}`` k-bit-quantised packed RGB — the deterministic stand-in
  for lossy codecs (no JPEG available offline). Analytic PSNR of
  truncation to k bits ≈ 10·log10(255²/(Δ²/3)), Δ=2^(8-k):
  k=7→~47 dB PASS, k=6→~41 dB PASS, k=5→~35 dB FAIL, k=4→~29 dB FAIL
  against the 40 dB threshold of BASELINE.json:15.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdime_spark.schema import IMAGE_SCHEMA_PARTITIONED

SIZES = (32, 48, 64, 96, 128)
DRIFT_SIZES = (64, 96, 128, 160, 192)  # shifted w/h distribution for drift fixtures
#: default mix — only formats whose analytic PSNR clears 40 dB
#: (rawq6 ≈ 41 dB, rawq7 ≈ 47 dB); rawq4/rawq5 exist for FAIL fixtures.
FMTS = ("raw", "ppm", "pngz", "rawq7", "rawq6")
ALL_FMTS = FMTS + ("rawq5", "rawq4")
NOUNS = (
    "a red bicycle", "two dogs on a beach", "a snowy mountain", "a bowl of ramen",
    "an old typewriter", "a city at night", "a paper lantern", "a wooden bridge",
    "a field of tulips", "a vintage car", "a lighthouse", "a stack of books",
)

ARROW_SCHEMA = pa.schema(
    [
        pa.field("image_id", pa.string(), False),
        pa.field("bytes", pa.binary()),
        pa.field("w", pa.int32()),
        pa.field("h", pa.int32()),
        pa.field("fmt", pa.string()),
        pa.field("caption", pa.string()),
        pa.field("phash", pa.int64()),
        pa.field("part", pa.string(), False),
    ]
)


# ---------------------------------------------------------------- codecs


def rng_for(seed: int, image_id: str) -> np.random.Generator:
    """Stable per-image PRNG: blake2b(seed:image_id) → PCG64."""
    digest = hashlib.blake2b(f"{seed}:{image_id}".encode(), digest_size=8).digest()
    return np.random.Generator(np.random.PCG64(int.from_bytes(digest, "big")))


def make_pixels(seed: int, image_id: str, w: int, h: int) -> np.ndarray:
    """Reference pixels for an image — (h, w, 3) uint8.

    ``rng.bytes`` consumes the identical PCG64 bit stream as
    ``rng.integers(0, 256, dtype=uint8)`` (verified bit-for-bit) and is
    ~30% cheaper — this function runs once per image in the decode
    reference-regen pass, so it is throughput-critical."""
    rng = rng_for(seed, image_id)
    return np.frombuffer(rng.bytes(h * w * 3), dtype=np.uint8).reshape(h, w, 3)


def quantize(pixels: np.ndarray, k: int) -> np.ndarray:
    shift = 8 - k
    return ((pixels >> shift) << shift).astype(np.uint8)


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    h, w, _ = pixels.shape
    if fmt == "raw":
        return pixels.tobytes()
    if fmt == "ppm":
        return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()
    if fmt == "pngz":
        return zlib.compress(pixels.tobytes(), 6)
    if fmt.startswith("rawq"):
        return quantize(pixels, int(fmt[4:])).tobytes()
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    """Decode payload → (h, w, 3) uint8; raises on any corruption."""
    n = w * h * 3
    if fmt in ("raw",) or fmt.startswith("rawq"):
        if len(data) != n:
            raise ValueError(f"{fmt}: expected {n} bytes, got {len(data)}")
        return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)
    if fmt == "ppm":
        header = b"P6\n%d %d\n255\n" % (w, h)
        if not data.startswith(b"P6") or len(data) != len(header) + n:
            raise ValueError("ppm: bad header or length")
        return np.frombuffer(data[len(header):], dtype=np.uint8).reshape(h, w, 3)
    if fmt == "pngz":
        raw = zlib.decompress(data)
        if len(raw) != n:
            raise ValueError(f"pngz: expected {n} bytes, got {len(raw)}")
        return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
    raise ValueError(f"unknown fmt {fmt!r}")


def phash64(pixels: np.ndarray) -> int:
    """8×8 average-hash → signed int64 (block-mean works because all
    SIZES are multiples of 8)."""
    gray = pixels.mean(axis=2)
    h, w = gray.shape
    blocks = gray.reshape(8, h // 8, 8, w // 8).mean(axis=(1, 3))
    bits = (blocks > blocks.mean()).flatten()
    val = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return int(np.uint64(val).astype(np.int64))


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    # int16 diff + int32 squares + float64-accumulated mean is exact for
    # uint8 inputs (every intermediate < 2^53) and ~2x cheaper than the
    # all-float64 formulation.
    d = a.astype(np.int16) - b.astype(np.int16)
    mse = float(np.mean(np.square(d, dtype=np.int32)))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


# ---------------------------------------------------------- generation


def _gen_row(
    seed: int,
    i: int,
    n_parts: int,
    sizes: tuple[int, ...],
    drift_parts: frozenset[int],
    fmts: tuple[str, ...],
):
    image_id = f"img-{i:012d}"
    part_idx = i % n_parts
    use_sizes = DRIFT_SIZES if part_idx in drift_parts else sizes
    rng = rng_for(seed, image_id)
    w = int(use_sizes[rng.integers(0, len(use_sizes))])
    h = int(use_sizes[rng.integers(0, len(use_sizes))])
    fmt = fmts[int(rng.integers(0, len(fmts)))]
    pixels = make_pixels(seed, image_id, w, h)
    payload = encode(pixels, fmt)
    # phash is computed over the *decodable* pixels (quantised for lossy)
    stored = quantize(pixels, int(fmt[4:])) if fmt.startswith("rawq") else pixels
    return (
        image_id,
        payload,
        w,
        h,
        fmt,
        f"a photo of {NOUNS[i % len(NOUNS)]} ({i})",
        phash64(stored),
        f"p{part_idx:04d}",
    )


def generate_images(
    spark: SparkSession,
    n_rows: int,
    n_parts: int = 8,
    seed: int = 42,
    drift_parts: tuple[int, ...] = (),
    sizes: tuple[int, ...] = SIZES,
    fmts: tuple[str, ...] = FMTS,
) -> DataFrame:
    """Distributed deterministic generation: spark.range → mapInArrow.

    Row content depends only on (seed, i), never on batch/partition
    layout, so `local[8]` and `local[32]` produce identical tables
    (the determinism requirement of SURVEY §5.4).
    """
    dparts = frozenset(drift_parts)

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("id").to_numpy()
            rows = [_gen_row(seed, int(i), n_parts, sizes, dparts, fmts) for i in ids]
            cols = list(zip(*rows)) if rows else [[] for _ in ARROW_SCHEMA]
            yield pa.RecordBatch.from_arrays(
                [pa.array(c, type=f.type) for c, f in zip(cols, ARROW_SCHEMA)],
                schema=ARROW_SCHEMA,
            )

    # cap rows per task so image payloads stream in bounded batches
    n_tasks = max(1, min(n_rows // 512 + 1, 256))
    ids = spark.range(0, n_rows, numPartitions=n_tasks)
    return ids.mapInArrow(gen, IMAGE_SCHEMA_PARTITIONED)


# ------------------------------------------------- violation injection


@dataclass
class InjectionSpec:
    """Declarative fixture violations (FIXTURES.md F1). Every field is a
    deterministic selector; the pytest oracle asserts the engine reports
    exactly this set."""

    null_caption: tuple[str, ...] = ()
    null_w: tuple[str, ...] = ()
    dup_image_id: tuple[tuple[str, str], ...] = ()  # (image_id, target_part)
    bitflip_bytes: tuple[str, ...] = ()  # payload corruption (truncate last byte)
    bad_fmt: tuple[str, ...] = ()
    # curated-side
    orphan_raw: tuple[str, ...] = ()  # dropped from curated
    spurious_curated: int = 0  # N extra rows present only in curated (ids "xtr-…")
    caption_edit: tuple[str, ...] = ()
    # manifest-side
    count_mismatch: tuple[str, ...] = ()  # parts with expected_rows off by one
    missing_manifest: tuple[str, ...] = ()  # parts absent from manifest
    # phash-side: (id_a, id_b) pairs whose phash is REPLACED by a
    # deterministic literal pair at hamming distance 1 — plants a
    # near-duplicate image pair for the PhashNearDup constraint without
    # needing to know the generated phash values driver-side
    phash_near_pair: tuple[tuple[str, str], ...] = ()

    def all_raw_ids(self) -> set[str]:
        return set(self.null_caption) | set(self.null_w) | set(self.bitflip_bytes) | set(self.bad_fmt)


def _isin(col: str, ids: tuple[str, ...]):
    return F.col(col).isin(list(ids))


def near_pair_ids(n_pairs: int) -> tuple[tuple[str, str], ...]:
    """Pair j links the consecutive generated ids (img-{2j}, img-{2j+1})
    — consecutive i land in consecutive partitions (part = i mod
    n_parts), so every planted pair is CROSS-partition whenever
    n_parts > 1."""
    return tuple(
        (f"img-{2 * j:012d}", f"img-{2 * j + 1:012d}") for j in range(n_pairs)
    )


def planted_phash(pair_idx: int, side: int) -> int:
    """Deterministic phash literal for planted near-dup pairs: the two
    sides of a pair differ ONLY in bit 0 (hamming 1); the per-pair base
    is md5-derived, so DISTINCT pairs sit ~32 bits apart (they must not
    cross-match at small k) and a small-hamming collision with a
    generated phash is vanishingly unlikely at fixture scale. Positive
    63-bit so int64 signedness never matters."""
    base = int.from_bytes(
        hashlib.md5(f"phash-plant-{pair_idx}".encode()).digest()[:8], "big"
    ) >> 1
    return (base & ~1) | side


def apply_raw_violations(df: DataFrame, spec: InjectionSpec) -> DataFrame:
    out = df
    if spec.null_caption:
        out = out.withColumn(
            "caption", F.when(_isin("image_id", spec.null_caption), F.lit(None)).otherwise(F.col("caption"))
        )
    if spec.null_w:
        out = out.withColumn(
            "w", F.when(_isin("image_id", spec.null_w), F.lit(None)).otherwise(F.col("w"))
        )
    if spec.bad_fmt:
        out = out.withColumn(
            "fmt", F.when(_isin("image_id", spec.bad_fmt), F.lit("bogus")).otherwise(F.col("fmt"))
        )
    if spec.bitflip_bytes:
        out = out.withColumn(
            "bytes",
            F.when(
                _isin("image_id", spec.bitflip_bytes),
                F.expr("substring(bytes, 1, octet_length(bytes)-1)"),
            ).otherwise(F.col("bytes")),
        )
    if spec.phash_near_pair:
        expr = F.col("phash")
        for j, (a, b) in enumerate(spec.phash_near_pair):
            expr = (
                F.when(F.col("image_id") == a, F.lit(planted_phash(j, 0)))
                .when(F.col("image_id") == b, F.lit(planted_phash(j, 1)))
                .otherwise(expr)
            )
        out = out.withColumn("phash", expr)
    if spec.dup_image_id:
        for image_id, target_part in spec.dup_image_id:
            dup = df.filter(F.col("image_id") == image_id).withColumn("part", F.lit(target_part))
            out = out.unionByName(dup)
    return out


def apply_curated_violations(curated: DataFrame, spec: InjectionSpec) -> DataFrame:
    out = curated
    if spec.orphan_raw:
        out = out.filter(~_isin("image_id", spec.orphan_raw))
    if spec.caption_edit:
        out = out.withColumn(
            "caption",
            F.when(_isin("image_id", spec.caption_edit), F.concat(F.col("caption"), F.lit(" ~edited"))).otherwise(
                F.col("caption")
            ),
        )
    return out


@dataclass
class Fixture:
    """A complete test fixture: raw + curated snapshots + manifest."""

    raw: DataFrame
    curated: DataFrame
    manifest: DataFrame
    spec: InjectionSpec = field(default_factory=InjectionSpec)


def build_fixture(
    spark: SparkSession,
    n_rows: int = 256,
    n_parts: int = 4,
    seed: int = 42,
    spec: InjectionSpec | None = None,
    drift_parts: tuple[int, ...] = (),
    n_spurious: int = 0,
) -> Fixture:
    """Pristine table → manifest (from pristine) → inject violations →
    (raw, curated). The manifest always describes the *pristine* state,
    mirroring the reference where source-side headers carry the
    expected count/checksum stamped before landing."""
    from bigdime_spark.functions.hashes import row_checksum_col
    from bigdime_spark.schema import MANIFEST_SCHEMA

    spec = spec or InjectionSpec()
    pristine = generate_images(spark, n_rows, n_parts, seed=seed)
    manifest = (
        pristine.withColumn("_h", row_checksum_col())
        .groupBy("part")
        .agg(
            F.count(F.lit(1)).alias("expected_rows"),
            F.bit_xor("_h").alias("expected_xor"),
            F.sum(F.col("_h").cast("decimal(38,0)")).alias("expected_sum"),
        )
    )
    if spec.count_mismatch:
        manifest = manifest.withColumn(
            "expected_rows",
            F.when(_isin("part", spec.count_mismatch), F.col("expected_rows") + 1).otherwise(
                F.col("expected_rows")
            ),
        )
    if spec.missing_manifest:
        manifest = manifest.filter(~_isin("part", spec.missing_manifest))
    manifest = manifest.select(*[f.name for f in MANIFEST_SCHEMA.fields])

    raw = apply_raw_violations(pristine, spec)

    curated_base = (
        generate_images(spark, n_rows, n_parts, seed=seed, drift_parts=drift_parts)
        if drift_parts
        else pristine
    )
    curated = apply_curated_violations(curated_base, spec)
    if n_spurious or spec.spurious_curated:
        n_extra = max(n_spurious, spec.spurious_curated)
        extra = generate_images(spark, n_extra, n_parts, seed=seed + 1).withColumn(
            "image_id", F.concat(F.lit("xtr-"), F.col("image_id"))
        )
        curated = curated.unionByName(extra)
    return Fixture(raw=raw, curated=curated, manifest=manifest, spec=spec)
