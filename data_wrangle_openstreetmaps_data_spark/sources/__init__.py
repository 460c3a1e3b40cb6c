"""Sources & sinks: OSM XML ingestion, parquet tables, JSON-lines sink."""
