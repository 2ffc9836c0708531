from data_engineer_project_spark.operators import dedup, similarity  # noqa: F401
