"""Sources & sinks beyond the parquet fixtures (SURVEY.md §2.1 S3)."""
