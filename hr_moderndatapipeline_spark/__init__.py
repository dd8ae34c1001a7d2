"""hr_moderndatapipeline_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark re-expression of the query and
data-processing capabilities of the reference lakehouse pipeline
(ctriz/HR_ModernDataPipeline): batch CDC with high-water-mark
incremental extraction, upsert + two-phase SCD2 apply, soft-delete /
attrition fact derivation, a YAML-driven data-quality rules engine
with quarantine, streaming schema-validation DLQ routing, and the
gold SQL aggregate layer — plus large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal
columns) built for 100 TB posture.

Everything is stock PySpark DataFrame/SQL (Catalyst-optimized); no
custom execution engine. Storage is Parquet (the environment ships
no Delta jars; operators that would use Delta MERGE are implemented
as equivalent pure-DataFrame two-phase merges behind the same API).
"""

__version__ = "0.1.0"

from hr_moderndatapipeline_spark.session import get_spark  # noqa: F401
