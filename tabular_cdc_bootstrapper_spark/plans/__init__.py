from tabular_cdc_bootstrapper_spark.plans.inspect import (  # noqa: F401
    broadcast_join_count,
    exchange_count,
    has_pushed_filters,
    physical_plan,
    scan_read_columns,
    wholestage_codegen_spans,
)
