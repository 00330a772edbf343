"""bigdime_spark — a from-scratch PySpark-native data-validation engine.

Reproduces the semantics of the reference's Data Validation Service
(per-column stats, record-count / checksum / column-type / null
validators, uniqueness, referential raw↔curated checks, KS/PSI
distribution drift, pixel-decode invariants) as *declarative Spark
DataFrame plans*: one fused aggregation pass per table, vectorized
Arrow UDFs for the only Python-side work (image decode), broadcast
joins for manifests, AQE + deterministic salting for skew, and a
parquet/Iceberg lineage table for per-partition checkpoint/resume.

Reference citations: the reference mount was empty at survey time
(SURVEY.md §0); semantics are pinned by BASELINE.json:6,14,15 and
public knowledge of the upstream BigDime project (validators
RecordCountValidator / RawChecksumValidator / column-type & null
validators in module ``bigdime-data-validation``, verdict enum in
``io.bigdime.core.validation``, checkpoint in
``io.bigdime.core.runtimeinfo`` — no line numbers available).
"""

from bigdime_spark.session import get_spark  # noqa: F401
from bigdime_spark.plans.suite import ValidationSuite  # noqa: F401

__version__ = "0.1.0"
