"""Fused cross-snapshot keyed pass: uniqueness (B16) + referential
(B17) + caption equality (B21) from ONE shuffle on the key.

Run separately, those three constraints shuffle the full key set of
both snapshots ~6 times (a groupBy, two anti-joins, an inner join).
At 10^12 rows the shuffle IS the cost, so this pass restructures them
around a single co-partitioned aggregate-join:

    ragg = raw.groupBy(key).agg(n, copies[(part, caption)...])
    cagg = curated.groupBy(key).agg(n, copies)
    j    = ragg FULL OUTER JOIN cagg ON key

Both aggregates hash-partition their output on the key, so Catalyst
executes the join without any additional exchange — two map-side-
combined shuffles total, and every constraint below is a narrow
projection of ``j``:

- uniqueness:  n_r > 1            → every copy's partition FAILs
- referential: cagg side NULL     → orphan_raw (lost rows)
               ragg side NULL     → spurious_curated
- caption:     explode both copy lists (m×n pairs — identical
               semantics to the inner join it replaces) and compare
               null-safely

Verdict/violation rows are bit-identical to the standalone operators
in uniqueness.py / referential.py / caption.py (which remain the
single-constraint API).

Bounded state (scale safety): the per-key copy arrays are capped at
``max_copies`` via ``slice(sort_array(collect_list(...)))`` — a
pathological ingestion bug that duplicates one image_id millions of
times must not materialize every copy in a single aggregation row
(executor OOM precisely when the check should fail loudly). The
counts ``n_r``/``n_c`` stay EXACT (they drive every PASS/FAIL
verdict); only violation *detail* beyond the first ``max_copies``
copies per key degrades to deterministic top-K sampling — the same
bound B25 applies to violation output. sort_array orders the sample
by (part, caption), so it is reproducible across runs/parallelism.
For a key whose copies span more than ``max_copies`` partitions, FAIL
attribution lands on the first ``max_copies`` partitions in sorted
order (the key-level failure itself is never lost).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdime_spark.operators.base import (
    SuiteContext,
    violation_rows,
)
from bigdime_spark.schema import FAIL


class KeyedSnapshotPass:
    """Returns per-constraint (verdicts, violations) pairs computed
    from one shared keyed join plan. The joined frame is lazily built
    once; Spark's plan reuse + the single exchange keep the physical
    cost at two shuffles regardless of how many constraints run."""

    def __init__(
        self,
        key: str = "image_id",
        caption_col: str = "caption",
        check_uniqueness: bool = True,
        check_referential: bool = True,
        check_caption: bool = True,
        max_copies: int = 100,
    ):
        self.key = key
        self.caption_col = caption_col
        self.check_uniqueness = check_uniqueness
        self.check_referential = check_referential
        self.check_caption = check_caption
        #: per-key copy-array bound (module docstring: dup-storm safety)
        self.max_copies = max_copies

    # ------------------------------------------------------------ plan

    def _joined(self, ctx: SuiteContext) -> DataFrame:
        need_caption = self.check_caption and ctx.curated is not None
        copy_struct = (
            F.struct(F.col("part"), F.col(self.caption_col).alias("cap"))
            if need_caption
            else F.struct(F.col("part"))
        )
        cols = [self.key, "part"] + ([self.caption_col] if need_caption else [])

        def capped(alias: str):
            # exact count + bounded deterministic copy sample (docstring)
            return F.slice(
                F.sort_array(F.collect_list(copy_struct)), 1, self.max_copies
            ).alias(alias)

        ragg = (
            ctx.raw.select(*cols)
            .groupBy(self.key)
            .agg(
                F.count(F.lit(1)).alias("n_r"),
                capped("copies_r"),
            )
        )
        if ctx.curated is None:
            return ragg
        cagg = (
            ctx.curated.select(*cols)
            .groupBy(self.key)
            .agg(
                F.count(F.lit(1)).alias("n_c"),
                capped("copies_c"),
            )
        )
        return ragg.join(cagg, self.key, "full_outer")

    # ------------------------------------------------------------- run

    def _rare(self, ctx: SuiteContext) -> DataFrame:
        """Filter the keyed join down to the rows ANY enabled
        constraint cares about (dup groups, orphans, caption
        mismatches — rare by construction), persist, and materialize
        eagerly. The expensive keyed shuffle therefore executes
        exactly once; every constraint below is a filter over a tiny
        cached frame."""
        j = self._joined(ctx)
        has_cur = ctx.curated is not None
        preds = []
        if self.check_uniqueness:
            preds.append(F.col("n_r") > 1)
        if has_cur and self.check_referential:
            preds.append(F.col("n_r").isNull() | F.col("n_c").isNull())
        if has_cur and self.check_caption:
            preds.append(
                F.col("n_r").isNotNull()
                & F.col("n_c").isNotNull()
                & F.exists(
                    "copies_r",
                    lambda r: F.exists(
                        "copies_c", lambda c: ~r["cap"].eqNullSafe(c["cap"])
                    ),
                )
            )
        interesting = preds[0]
        for p in preds[1:]:
            interesting = interesting | p
        rare = j.filter(interesting).persist()
        ctx.extras.setdefault("persisted", []).append(rare)
        rare.count()  # eager: one job, one keyed shuffle
        return rare

    def run(self, ctx: SuiteContext) -> list[tuple[str, DataFrame, DataFrame | None]]:
        """→ [(constraint_name, FAIL-verdict rows, violations|None), ...]

        Verdict frames contain ONLY failing (part, verdict, observed,
        expected) rows — the suite completes the (part × constraint)
        grid with PASS rows in one shared join (suite pass 6), instead
        of one broadcast join per constraint."""
        j = self._rare(ctx)
        out: list[tuple[str, DataFrame, DataFrame | None]] = []

        if self.check_uniqueness:
            out.append(self._uniqueness(ctx, j))
        if self.check_referential and ctx.curated is not None:
            out.append(self._referential(ctx, j))
        if self.check_caption and ctx.curated is not None:
            out.append(self._caption(ctx, j))
        return out

    def _uniqueness(self, ctx: SuiteContext, j: DataFrame):
        name = f"uniqueness.{self.key}"
        copies = (
            j.filter(F.col("n_r") > 1)
            .select(
                F.col(self.key).alias("image_id"),
                F.col("n_r").alias("n"),
                F.explode("copies_r").alias("c"),
            )
            .select("image_id", "n", F.col("c.part").alias("part"))
        )
        violations = violation_rows(
            copies,
            name,
            self.key,
            F.concat(F.lit("duplicate key ("), F.col("n").cast("string"), F.lit(" copies)")),
            "raw",
        )
        failed = (
            copies.groupBy("part")
            .agg(F.count(F.lit(1)).alias("dup_copies"))
            .select(
                "part",
                F.lit(name).alias("constraint"),
                F.lit(FAIL).alias("verdict"),
                F.concat(F.lit("dup_copies="), F.col("dup_copies").cast("string")).alias("observed"),
                F.lit("dup_copies=0").alias("expected"),
            )
        )
        return name, failed, violations

    def _referential(self, ctx: SuiteContext, j: DataFrame):
        name = "referential"
        lost = (
            j.filter(F.col("n_c").isNull() & F.col("n_r").isNotNull())
            .select(F.col(self.key), F.explode("copies_r").alias("c"))
            .select(self.key, F.col("c.part").alias("part"))
        )
        spurious = (
            j.filter(F.col("n_r").isNull() & F.col("n_c").isNotNull())
            .select(F.col(self.key), F.explode("copies_c").alias("c"))
            .select(self.key, F.col("c.part").alias("part"))
        )
        v_lost = violation_rows(
            lost, name, self.key, F.lit("orphan_raw: key missing from curated"), "raw",
            image_id_col=self.key,
        )
        v_spur = violation_rows(
            spurious, name, self.key, F.lit("spurious_curated: key missing from raw"), "curated",
            image_id_col=self.key,
        )
        violations = v_lost.unionByName(v_spur)
        failed = (
            violations.groupBy("part")
            .agg(F.count(F.lit(1)).alias("orphans"))
            .select(
                "part",
                F.lit(name).alias("constraint"),
                F.lit(FAIL).alias("verdict"),
                F.concat(F.lit("orphans="), F.col("orphans").cast("string")).alias("observed"),
                F.lit("orphans=0").alias("expected"),
            )
        )
        return name, failed, violations

    def _caption(self, ctx: SuiteContext, j: DataFrame):
        name = "caption_equality"
        pairs = (
            j.filter(F.col("n_r").isNotNull() & F.col("n_c").isNotNull())
            .select(F.col(self.key), F.explode("copies_r").alias("rc"), F.col("copies_c"))
            .select(
                self.key,
                F.col("rc.part").alias("part"),
                F.col("rc.cap").alias("_raw_val"),
                F.explode("copies_c").alias("cc"),
            )
            .select(
                self.key,
                "part",
                "_raw_val",
                F.col("cc.cap").alias("_cur_val"),
            )
        )
        mism = pairs.filter(~F.col("_raw_val").eqNullSafe(F.col("_cur_val")))
        violations = violation_rows(
            mism,
            name,
            self.caption_col,
            F.concat_ws(
                " != ",
                F.coalesce(F.col("_raw_val"), F.lit("∅")),
                F.coalesce(F.col("_cur_val"), F.lit("∅")),
            ),
            "curated",
            image_id_col=self.key,
        )
        failed = (
            mism.groupBy("part")
            .agg(F.count(F.lit(1)).alias("mismatches"))
            .select(
                "part",
                F.lit(name).alias("constraint"),
                F.lit(FAIL).alias("verdict"),
                F.concat(F.lit("mismatches="), F.col("mismatches").cast("string")).alias("observed"),
                F.lit("mismatches=0").alias("expected"),
            )
        )
        return name, failed, violations
