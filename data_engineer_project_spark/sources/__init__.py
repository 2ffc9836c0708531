from data_engineer_project_spark.sources.registry import (  # noqa: F401
    TABLE_NAMES,
    load_tables,
    read_table,
)
