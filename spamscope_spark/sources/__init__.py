"""Sources: batch parquet tables + streaming file source for turns."""
