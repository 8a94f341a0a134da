from tabular_cdc_bootstrapper_spark.sources.files import (  # noqa: F401
    exclude_glob_filter,
    list_files,
    read_with_exclusion,
)
