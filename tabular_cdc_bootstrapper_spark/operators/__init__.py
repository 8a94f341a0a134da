from tabular_cdc_bootstrapper_spark.operators.asof import as_of_join  # noqa: F401
from tabular_cdc_bootstrapper_spark.operators.cdc import (  # noqa: F401
    apply_changelog,
    latest_by_key,
)
from tabular_cdc_bootstrapper_spark.operators.diff import table_diff  # noqa: F401
from tabular_cdc_bootstrapper_spark.operators.rangejoin import (  # noqa: F401
    banded_range_join,
)
