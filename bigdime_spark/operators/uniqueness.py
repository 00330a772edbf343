"""Uniqueness on image_id (SURVEY B16; BASELINE.json:6,14).

Global (cross-partition!) key uniqueness with per-partition verdict
attribution: every partition containing a copy of a duplicated key
FAILs, with EXACT per-part copy counts — a documented extension of
the reference, which only ever validated one input unit at a time
[public knowledge, SURVEY §7].

Plan shape (bounded state): ``repartition(key)`` is the only
exchange; a (key, part) count aggregation (counters only — a key
duplicated 10^7 times in one partition costs ONE aggregation row)
feeds a per-key roll-up whose collected part list is one small struct
per DISTINCT involved partition, inherently bounded by the table's
partition count and capped at ``max_parts``. No join against the
full table is needed for verdicts or violations; violation detail is
one row per (key, part) with the exact global copy count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdime_spark.operators.base import (
    SuiteContext,
    TableConstraint,
    fill_pass_for_missing_parts,
    violation_rows,
)
from bigdime_spark.schema import FAIL


class Uniqueness(TableConstraint):
    def __init__(self, key: str = "image_id", snapshot: str = "raw", max_parts: int = 100_000):
        self.key = key
        self.snapshot = snapshot
        self.name = f"uniqueness.{key}"
        #: bound on the per-key collected distinct-part structs (module
        #: docstring) — counts stay exact regardless.
        self.max_parts = max_parts

    def run(self, ctx: SuiteContext) -> tuple[DataFrame, DataFrame]:
        df = ctx.raw if self.snapshot == "raw" else ctx.curated
        kp = (
            df.select(self.key, "part")
            .repartition(self.key)
            .groupBy(self.key, "part")
            .agg(F.count(F.lit(1)).alias("n_kp"))
        )
        dups = (
            kp.groupBy(self.key)
            .agg(
                F.sum("n_kp").alias("n"),
                F.slice(
                    F.sort_array(F.collect_list(F.struct("part", "n_kp"))),
                    1,
                    self.max_parts,
                ).alias("parts"),
            )
            .filter(F.col("n") > 1)
        )
        # one violation row per (duplicate key × involved partition),
        # each carrying the exact global copy count
        entries = dups.select(
            F.col(self.key).alias("image_id"),
            F.col("n"),
            F.explode("parts").alias("c"),
        ).select(
            "image_id", "n", F.col("c.part").alias("part"), F.col("c.n_kp").alias("n_kp")
        )
        violations = violation_rows(
            entries,
            self.name,
            self.key,
            F.concat(F.lit("duplicate key ("), F.col("n").cast("string"), F.lit(" copies)")),
            self.snapshot,
        )
        failed_parts = (
            entries.groupBy("part")
            .agg(F.sum("n_kp").alias("dup_copies"))  # EXACT copies per part
            .select(
                "part",
                F.lit(FAIL).alias("verdict"),
                F.concat(F.lit("dup_copies="), F.col("dup_copies").cast("string")).alias("observed"),
                F.lit("dup_copies=0").alias("expected"),
            )
        )
        return fill_pass_for_missing_parts(failed_parts, ctx.parts, self.name), violations
