from data_engineer_project_spark.plans import quality, snowflake, star  # noqa: F401
