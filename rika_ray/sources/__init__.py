"""Sources: parquet web_pages tables, loose-file ingest, target
classification (SURVEY.md §2.1)."""
