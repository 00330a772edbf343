"""Uniqueness on image_id (SURVEY B16; BASELINE.json:6,14).

Global (cross-partition!) key uniqueness with per-partition verdict
attribution: duplicate groups carry ``collect_list(part)``, and every
partition containing a copy FAILs — a documented extension of the
reference, which only ever validated one input unit at a time
[public knowledge, SURVEY §7].

Plan shape: one hash aggregation on the key (partial+final; the key
is high-cardinality and near-unique, so per-group state is tiny),
then an explode of the (rare) duplicate groups. No join against the
full table is needed for verdicts or violations.
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
    def __init__(self, key: str = "image_id", snapshot: str = "raw", max_copies: int = 100):
        self.key = key
        self.snapshot = snapshot
        self.name = f"uniqueness.{key}"
        #: bound on the per-key collected part list — a dup storm (one
        #: key duplicated millions of times by an ingestion bug) must
        #: not materialize every copy in one aggregation row. ``n``
        #: stays exact; violation detail beyond the cap is top-K
        #: sampled (deterministic: sort_array order), same bound as B25.
        self.max_copies = max_copies

    def run(self, ctx: SuiteContext) -> tuple[DataFrame, DataFrame]:
        df = ctx.raw if self.snapshot == "raw" else ctx.curated
        dups = (
            df.groupBy(self.key)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.slice(
                    F.sort_array(F.collect_list("part")), 1, self.max_copies
                ).alias("parts"),
            )
            .filter(F.col("n") > 1)
        )
        # one violation row per duplicate *copy*, each with its partition
        copies = dups.select(
            F.col(self.key).alias("image_id"),
            F.col("n"),
            F.explode("parts").alias("part"),
        )
        violations = violation_rows(
            copies,
            self.name,
            self.key,
            F.concat(F.lit("duplicate key ("), F.col("n").cast("string"), F.lit(" copies)")),
            self.snapshot,
        )
        failed_parts = (
            copies.groupBy("part")
            .agg(F.count(F.lit(1)).alias("dup_copies"))
            .select(
                "part",
                F.lit(FAIL).alias("verdict"),
                F.concat(F.lit("dup_copies="), F.col("dup_copies").cast("string")).alias("observed"),
                F.lit("dup_copies=0").alias("expected"),
            )
        )
        return fill_pass_for_missing_parts(failed_parts, ctx.parts, self.name), violations
