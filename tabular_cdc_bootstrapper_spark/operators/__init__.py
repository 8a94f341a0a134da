from tabular_cdc_bootstrapper_spark.operators.cdc import (  # noqa: F401
    apply_changelog,
    latest_by_key,
)
