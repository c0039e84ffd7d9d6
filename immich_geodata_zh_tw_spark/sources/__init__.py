"""Sources & sinks: GeoNames-format readers, parquet/Iceberg-style tables,
checkpoint manifests (SURVEY.md §2.1, §2.10)."""
