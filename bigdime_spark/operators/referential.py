"""Referential raw ↔ curated checks (SURVEY B17; BASELINE.json:6,14).

Both directions as anti-joins on the key:
- ``orphan_raw``: raw rows whose key is absent from curated (lost data)
- ``spurious_curated``: curated rows whose key is absent from raw

Anti-join is null-safe and key-based (preferred over exceptAll —
SURVEY §2.6 set-ops row); AQE picks broadcast/SMJ/skew-split at
runtime. Partition attribution: the violating row's own partition.
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


class Referential(TableConstraint):
    name = "referential"

    def __init__(self, key: str = "image_id"):
        self.key = key

    def run(self, ctx: SuiteContext) -> tuple[DataFrame, DataFrame]:
        raw_keys = ctx.raw.select(self.key, "part")
        cur_keys = ctx.curated.select(self.key, "part")
        lost = raw_keys.join(cur_keys.select(self.key), self.key, "left_anti")
        spurious = cur_keys.join(raw_keys.select(self.key), self.key, "left_anti")

        v_lost = violation_rows(
            lost, self.name, self.key, F.lit("orphan_raw: key missing from curated"), "raw",
            image_id_col=self.key,
        )
        v_spur = violation_rows(
            spurious, self.name, self.key, F.lit("spurious_curated: key missing from raw"), "curated",
            image_id_col=self.key,
        )
        violations = v_lost.unionByName(v_spur)
        failed_parts = (
            violations.groupBy("part")
            .agg(F.count(F.lit(1)).alias("orphans"))
            .select(
                "part",
                F.lit(FAIL).alias("verdict"),
                F.concat(F.lit("orphans="), F.col("orphans").cast("string")).alias("observed"),
                F.lit("orphans=0").alias("expected"),
            )
        )
        return fill_pass_for_missing_parts(failed_parts, ctx.parts, self.name), violations
