"""faang_pydantics_validation_spark — a from-scratch PySpark-native schema +
constraint validation engine.

Re-expresses the semantics of the reference validator
(yroochun/faang-pydantics-validation — a per-record, network-bound Pydantic
loop, see /root/reference/app/organism_validation.py) as declarative Column
constraints, broadcast dimension joins, and single-fused-pass aggregations
over partitioned tables. Designed for Iceberg/parquet tables of
(repo, path, commit, lang, content) at 10^12-file scale:

* all per-record rules compile to native Column expressions fused into ONE
  scan (whole-stage codegen; no per-row Python),
* referential checks are broadcast / shuffle-hash joins against
  pre-materialized dimension tables (no network at executors),
* uniqueness is a salted two-stage aggregation (skew-proof on hot repos),
* distribution drift is scored from per-partition sketches built with
  Arrow-batched applyInPandas,
* runs resume from a checkpoint manifest with per-partition lineage.
"""

from faang_pydantics_validation_spark.rules import Rule, RuleSet
from faang_pydantics_validation_spark.engine import ValidationEngine, ValidationOutput

__version__ = "0.1.0"

__all__ = ["Rule", "RuleSet", "ValidationEngine", "ValidationOutput", "__version__"]
