from tabular_cdc_bootstrapper_spark.streaming.pipeline import (  # noqa: F401
    CommitConflict,
    ParquetStateTable,
    run_cdc_pipeline_available_now,
    start_changelog_ingest,
)
