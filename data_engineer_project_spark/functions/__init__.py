from data_engineer_project_spark.functions.numeric import (  # noqa: F401
    avg_money,
    money,
    sum_money,
)
