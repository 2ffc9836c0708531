"""data_engineer_project_spark — a PySpark-native analytics engine.

A brand-new Spark-first engine with the query and data-processing
capabilities of the reference healthcare data-warehouse project
(PrathyushaGangisetty/Data-Engineer-Project): 50 source tables across 5
domains, star + snowflake DW layers with surrogate keys and Unknown-row
fallback, the full relational operator surface its ~40 queries exercise,
and its validation regime — plus large-scale training-data pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing)
designed for 100 TB operation.

Architecture: everything is the PySpark DataFrame / Spark SQL API so that
Catalyst + Tungsten own optimization and physical execution. No RDDs in
the hot path; Python UDFs only where built-ins cannot express the
semantics (and then Arrow-batched pandas UDFs).
"""

__version__ = "0.1.0"

from data_engineer_project_spark.session import get_spark  # noqa: F401
