"""Row-predicate constraints: not-null (B15) and domain/range (B22).

The reference's null validators reject batches containing NULLs in
required columns (BASELINE.json:6 "null validators"); DomainCheck
generalises them to arbitrary data-quality predicates, all evaluated
JVM-side inside the fused aggregation (whole-stage codegen — no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdime_spark.operators.base import AggConstraint, violation_rows
from bigdime_spark.schema import FAIL, PASS


class NotNull(AggConstraint):
    def __init__(self, column: str):
        self.column = column
        self.name = f"not_null.{column}"
        self._agg = f"nn_{column}__nulls"

    def agg_exprs(self) -> list[Column]:
        return [F.count_if(F.col(self.column).isNull()).alias(self._agg)]

    def verdict_col(self) -> Column:
        return F.when(F.col(self._agg) == 0, F.lit(PASS)).otherwise(F.lit(FAIL))

    def observed_col(self) -> Column:
        return F.concat(F.lit("nulls="), F.col(self._agg).cast("string"))

    def expected_col(self) -> Column:
        return F.lit("nulls=0")

    def violations(self, df: DataFrame, snapshot: str) -> DataFrame:
        return violation_rows(
            df.filter(F.col(self.column).isNull()),
            self.name,
            self.column,
            F.lit("null in required column"),
            snapshot,
        )

    def violation_spec(self):
        return (F.col(self.column).isNull(), self.column, F.lit("null in required column"))

    def violation_count_col(self):
        return self._agg


class DomainCheck(AggConstraint):
    """PASS iff no row strictly violates ``predicate`` (NULL inputs are
    the not-null validator's business, not this one's)."""

    def __init__(self, name: str, predicate: Column, column: str, detail: str | None = None):
        self.name = f"domain.{name}"
        self.predicate = predicate
        self.column = column
        self.detail = detail or f"violates {name}"
        self._agg = f"dom_{name}__bad"

    def agg_exprs(self) -> list[Column]:
        return [F.count_if(~self.predicate).alias(self._agg)]

    def verdict_col(self) -> Column:
        return F.when(F.col(self._agg) == 0, F.lit(PASS)).otherwise(F.lit(FAIL))

    def observed_col(self) -> Column:
        return F.concat(F.lit("bad_rows="), F.col(self._agg).cast("string"))

    def expected_col(self) -> Column:
        return F.lit("bad_rows=0")

    def violations(self, df: DataFrame, snapshot: str) -> DataFrame:
        return violation_rows(
            df.filter(~self.predicate),
            self.name,
            self.column,
            F.lit(self.detail),
            snapshot,
        )

    def violation_spec(self):
        return (~self.predicate, self.column, F.lit(self.detail))

    def violation_count_col(self):
        return self._agg


class TypeConformance(AggConstraint):
    """B11 type-conformance validator (the reference's column-type
    validators generalised to data: does every non-NULL value of a
    string-typed ingest column actually parse as the declared type?).

    A value fails iff ``try_cast(column AS dtype)`` is NULL while the
    raw value is NOT NULL — NULLs themselves are the not-null
    validator's business. Pure ANSI ``try_cast``, so the check is
    JVM-side codegen in Spark and value-exact against a DuckDB
    TRY_CAST oracle."""

    def __init__(self, column: str, dtype: str = "int"):
        self.column = column
        self.dtype = dtype
        self.name = f"type_conformance.{column}"
        self._agg = f"tc_{column}__bad"
        self._bad = F.expr(
            f"try_cast({column} AS {dtype}) IS NULL AND {column} IS NOT NULL"
        )

    def agg_exprs(self) -> list[Column]:
        return [F.count_if(self._bad).alias(self._agg)]

    def verdict_col(self) -> Column:
        return F.when(F.col(self._agg) == 0, F.lit(PASS)).otherwise(F.lit(FAIL))

    def observed_col(self) -> Column:
        return F.concat(F.lit("nonconforming="), F.col(self._agg).cast("string"))

    def expected_col(self) -> Column:
        return F.lit("nonconforming=0")

    def violations(self, df: DataFrame, snapshot: str) -> DataFrame:
        return violation_rows(
            df.filter(self._bad),
            self.name,
            self.column,
            F.concat(F.lit("not castable to "), F.lit(self.dtype)),
            snapshot,
        )

    def violation_spec(self):
        return (
            self._bad,
            self.column,
            F.concat(F.lit("not castable to "), F.lit(self.dtype)),
        )

    def violation_count_col(self):
        return self._agg


class Compliance(AggConstraint):
    """Tolerance-bounded predicate constraint (deequ's Compliance
    analyzer, C55): PASS iff the fraction of the partition's rows
    satisfying ``predicate`` is ≥ ``min_fraction``.

    DomainCheck (B22) is ZERO-tolerance — one bad row fails the part.
    Real corpora carry known dirt: "≥ 99.5% of captions are non-empty
    after trim" is a reviewable, enforceable contract where "no empty
    captions ever" would page someone nightly at 10^12 rows. The two
    are different constraint families, not a parameterization of each
    other — Compliance deliberately emits NO row-level violations
    (inside the declared tolerance a failing row is expected dirt, not
    a violation; the part-level verdict is the whole contract).

    NULL predicate results count as non-satisfying (explicit
    ``coalesce(pred, false)``, matching deequ's three-valued-logic
    collapse) — a row the predicate cannot even evaluate must not
    count toward compliance. Fraction is over ALL rows of the part;
    empty parts never reach the fused agg (groupBy emits no row).

    Fuses into the suite's single stats pass: one ``count_if`` +
    shared row count, whole-stage codegen, no extra scan.
    """

    def __init__(
        self,
        name: str,
        predicate: Column,
        column: str,
        min_fraction: float,
        detail: str | None = None,
    ):
        if not (0.0 <= float(min_fraction) <= 1.0):
            raise ValueError(
                f"compliance {name!r}: min_fraction must be in [0, 1], "
                f"got {min_fraction}"
            )
        self.name = f"compliance.{name}"
        self.predicate = predicate
        self.column = column
        self.min_fraction = float(min_fraction)
        self.detail = detail or f"compliance below {min_fraction}"
        self._ok = f"comp_{name}__ok"
        #: one per-part row counter serves EVERY Compliance bound (the
        #: fused-agg assembler dedupes shared aliases)
        self._n = "comp__n"

    def agg_exprs(self) -> list[Column]:
        return [
            F.count_if(F.coalesce(self.predicate, F.lit(False))).alias(self._ok),
        ]

    def shared_agg_exprs(self) -> dict[str, Column]:
        return {self._n: F.count(F.lit(1))}

    def _frac(self) -> Column:
        return F.try_divide(F.col(self._ok), F.col(self._n))

    def verdict_col(self) -> Column:
        return (
            F.when(self._frac() >= self.min_fraction, F.lit(PASS))
            .otherwise(F.lit(FAIL))
        )

    def observed_col(self) -> Column:
        return F.concat(
            F.lit("frac="), F.round(self._frac(), 6).cast("string")
        )

    def expected_col(self) -> Column:
        return F.lit(f"frac>={self.min_fraction}")


def default_image_domain_checks() -> list[DomainCheck]:
    """Domain constraints for the BASELINE.json:15 image schema."""
    from bigdime_spark.sources.synth import ALL_FMTS

    return [
        DomainCheck("w_positive", F.col("w") > 0, "w", "w must be > 0"),
        DomainCheck("h_positive", F.col("h") > 0, "h", "h must be > 0"),
        DomainCheck(
            "fmt_known",
            F.col("fmt").isin(list(ALL_FMTS)),
            "fmt",
            "unknown encoding format",
        ),
    ]
